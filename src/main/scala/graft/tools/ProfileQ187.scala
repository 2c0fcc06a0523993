package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of q187's measured region (band delete +
  * incremental distinct-tier refresh) — diagnostic only, mirrors the
  * LayoutPack fixture. Usage: runMain graft.tools.ProfileQ187 [sfDir]
  */
object ProfileQ187 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.graft.mv.profile", "true")
    import graft.operators.Snapshot
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val tab = graft.Tables(spark, sfDir)
    val root = java.nio.file.Files.createTempDirectory("graft_prof187").toString
    val srcP = s"$root/src"
    val cut97 = lit("1997-01-01").cast("timestamp")
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    t("fixture: create")(Snapshot.create(spark, srcP,
      tab.orders.where(col("o_orderdate") < cut97).select(cols.map(col): _*)))
    val reg = Map("src" -> srcP, "mv" -> s"$root/mv")
    t("fixture: create mv")(Snapshot.sql(spark,
      """CREATE MATERIALIZED VIEW mv AS
        |SELECT o_orderstatus, COUNT(*) AS n,
        |  COUNT(DISTINCT o_orderpriority) AS np,
        |  COUNT(DISTINCT o_custkey) AS nc,
        |  SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total
        |FROM src GROUP BY o_orderstatus""".stripMargin, reg))
    t("fixture: append")(Snapshot.append(spark, srcP,
      tab.orders.where(col("o_orderdate") >= cut97).select(cols.map(col): _*)))
    t("fixture: refresh 1")(Snapshot.sql(spark, "REFRESH MATERIALIZED VIEW mv", reg))
    t("measured: delete")(Snapshot.delete(spark, srcP,
      col("o_orderstatus") === "F" && col("o_orderpriority") === "5-LOW"))
    t("measured: refresh 2")(Snapshot.sql(spark, "REFRESH MATERIALIZED VIEW mv", reg))
    t("measured: read")(Snapshot.read(spark, s"$root/mv").collect())
    spark.stop()
  }
}
