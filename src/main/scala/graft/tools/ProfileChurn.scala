package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Snapshot

/** Wall-clock split of the q193/q194-shaped churn protocol (append +
  * delete + incremental MV refresh + routed read) — diagnostic only,
  * mirrors the LayoutPack fixtures. Run with
  * `spark.graft.mv.profile=true` to see the refresh-internal split too.
  *
  * Usage: runMain graft.tools.ProfileChurn [sfDir]
  */
object ProfileChurn {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.graft.mv.profile", "true")
    spark.conf.set("spark.graft.dml.profile", "true")
    val tab = graft.Tables(spark, sfDir)
    def prof[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[churn] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    tab.orders.count()
    val cut97 = lit("1997-01-01").cast("timestamp")
    // two passes: pass 1 warms codegen/JIT, pass 2 is steady state
    (1 to 2).foreach { pass =>
      println(s"[churn] === q193 shape, pass $pass ===")
      val root = java.nio.file.Files.createTempDirectory(s"graft_churn$pass").toString
      val srcP = s"$root/src"
      val cols = Seq("o_orderkey", "o_totalprice", "o_orderdate")
      prof("fixture: create src")(Snapshot.create(spark, srcP,
        tab.orders.where(col("o_orderdate") < cut97).select(cols.map(col): _*)))
      val reg = Map("src" -> srcP, "mv" -> s"$root/mv")
      prof("fixture: create mv")(Snapshot.sql(spark,
        """CREATE MATERIALIZED VIEW mv AS
          |SELECT date_trunc('day', o_orderdate) AS dia, COUNT(*) AS n,
          |  SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total,
          |  MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
          |FROM src GROUP BY date_trunc('day', o_orderdate)""".stripMargin, reg))
      prof("measured: append")(Snapshot.append(spark, srcP,
        tab.orders.where(col("o_orderdate") >= cut97).select(cols.map(col): _*)))
      prof("measured: delete")(Snapshot.delete(spark, srcP,
        col("o_orderkey") % 100 < 5))
      prof("measured: refresh")(Snapshot.sql(spark,
        "REFRESH MATERIALIZED VIEW mv", reg))
      prof("measured: read")(Snapshot.read(spark, s"$root/mv").collect())
    }
    spark.stop()
  }
}
