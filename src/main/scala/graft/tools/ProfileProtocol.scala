package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Snapshot

/** Wall-clock split of the snapshot protocol verbs the DML-cluster
  * bench queries time (create / append / delete dv-tier / delete
  * rewrite-tier / update / compact / vacuum / read) — diagnostic only.
  *
  * Usage: runMain graft.tools.ProfileProtocol [sfDir]
  */
object ProfileProtocol {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.graft.dml.profile", "true")
    val t = graft.Tables(spark, sfDir)
    def prof[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pprof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    t.orders.count() // warm the scan
    val base = t.orders.select("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    // run the whole battery twice: pass 1 warms codegen/JIT, pass 2 is
    // the steady-state figure the bench sees
    (1 to 2).foreach { pass =>
      println(s"[pprof] --- pass $pass ---")
      val root = java.nio.file.Files.createTempDirectory(s"graft_pprof$pass").toString
      val p = s"$root/t"
      prof("create (unpartitioned)")(Snapshot.create(spark, p, base))
      prof("append")(Snapshot.append(spark, p,
        base.where(col("o_orderkey") % 100 === 0)))
      prof("delete point (dv tier)")(Snapshot.delete(spark, p,
        col("o_orderkey") % 50 === 3))
      prof("delete band (rewrite)")(Snapshot.delete(spark, p,
        col("o_orderstatus") === "F" && col("o_orderpriority") <= "3-MEDIUM"))
      prof("update point")(Snapshot.update(spark, p,
        col("o_orderkey") % 50 === 7,
        Map("o_totalprice" -> (col("o_totalprice") * 2))))
      prof("compact")(Snapshot.compact(spark, p))
      prof("vacuum")(Snapshot.vacuum(spark, p, keepVersions = 1, orphanGraceMs = 0L))
      prof("read+agg")(Snapshot.read(spark, p)
        .groupBy("o_orderstatus").count().collect())
      val p2 = s"$root/tp"
      prof("create (partitioned)")(Snapshot.create(spark, p2, base,
        Seq("o_orderpriority")))
      prof("merge by id (partitioned)")(
        graft.operators.Writers.mergeByIdWritePartitioned(spark, p2,
          base.where(col("o_orderkey") % 10 === 1)
            .withColumn("o_totalprice", col("o_totalprice") * 2),
          "o_orderkey", "o_orderpriority", assertIdsLocal = true))
    }
    spark.stop()
  }
}
