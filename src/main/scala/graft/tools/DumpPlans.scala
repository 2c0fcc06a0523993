package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.{SparkEntry, Tables}

/** Dump `.explain("formatted")` for declared queries — the plan-shape
  * evidence the optimization rounds commit under plans/rNN/. Session
  * config mirrors [[graft.Bench]] (same master, shuffle partitions,
  * extensions) so the captured plans are the ones the bench executes.
  *
  * Usage: runMain graft.tools.DumpPlans <sfDir> <outDir> [namePrefixes]
  *
  * Staged queries run their fixture setup first (untimed scaffolding),
  * then explain the measured body. Bodies with eager protocol work
  * (DML + refresh) execute it — this is a diagnostic, not a bench.
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse("/tmp/graft_plans")
    val only = args.lift(2).map(_.split(",").map(_.trim).toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    SparkEntry.queryDefs.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
      .foreach { case (name, qd) =>
        try {
          val t = Tables(spark, sfDir)
          val state = qd.setup.map(_(t)).orNull
          val df = qd.buildPrepared(t, state)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.write(Paths.get(outDir, s"$name.txt"),
            plan.getBytes("UTF-8"))
          println(s"[plans] $name ok")
        } catch {
          case e: Throwable =>
            println(s"[plans] $name FAILED: ${e.getClass.getSimpleName}: " +
              String.valueOf(e.getMessage).take(200))
        }
      }
    spark.stop()
  }
}
