package graft.pipelines

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Dependency-ordered multi-pipeline runner with per-stage success
  * flags — the reference's hourly DAG shape (descarga_hora.py:17-60
  * chains 4 pipelines; consumo_detalle.py:384-391 sets/clears a success
  * flag per run; email_seguimiento.py:38-56 is the sentinel that reads
  * them).
  *
  * Contract, mirroring the reference:
  *  - a stage CLEARS its flag before running and sets it only on
  *    success, so a crash mid-stage leaves the flag off;
  *  - a stage whose dependency did not succeed is BLOCKED (not run);
  *  - on rerun with resume=true, stages whose flag is already set are
  *    skipped — combined with the K2/K3 writers' idempotency this gives
  *    rerun-from-failed semantics: fix the broken stage, rerun the DAG,
  *    only the failed suffix executes.
  *
  * Flags are zero-byte marker files under `flagDir` via the Hadoop
  * filesystem API — the same mechanism works on HDFS/object stores at
  * cluster scale, and the sentinel (a driver-side report, like the
  * reference's email) just lists a dimension-sized directory.
  */
object Runner {

  /** One pipeline stage: `run` is the side-effecting body (typically a
    * transform ending in a Writers.* publication).
    */
  final case class Stage(name: String, deps: Seq[String] = Nil)(val run: () => Unit)

  sealed trait Outcome { def ok: Boolean }
  /** Ran this invocation and succeeded. */
  case object Ran extends Outcome { val ok = true }
  /** Flag already set from a previous successful run; not re-executed. */
  case object Resumed extends Outcome { val ok = true }
  /** Body threw; flag left off. */
  final case class Failed(error: Throwable) extends Outcome { val ok = false }
  /** An upstream dependency did not succeed; not run, flag cleared. */
  final case class Blocked(dep: String) extends Outcome { val ok = false }

  private def flagPath(flagDir: String, stage: String) =
    new Path(flagDir, s"${stage}._SUCCESS")

  def flagSet(spark: SparkSession, flagDir: String, stage: String): Boolean =
    fsFor(spark, flagDir).exists(flagPath(flagDir, stage))

  /** FS resolved from the flag dir's scheme, not the default FS — flag
    * dirs on an object store must work when the default FS is HDFS.
    */
  private def fsFor(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Topologically order `stages` (stable: ready stages keep their
    * declaration order, like the reference's sequential DAG file).
    * Unknown or cyclic deps are a caller bug — fail loudly.
    */
  private def topoSort(stages: Seq[Stage]): Seq[Stage] = {
    val byName = stages.map(s => s.name -> s).toMap
    require(byName.size == stages.size, "duplicate stage names")
    stages.foreach(s => s.deps.foreach(d =>
      require(byName.contains(d), s"stage '${s.name}' depends on unknown stage '$d'")))
    val done = scala.collection.mutable.LinkedHashSet.empty[String]
    val remaining = scala.collection.mutable.ArrayBuffer(stages: _*)
    while (remaining.nonEmpty) {
      val ready = remaining.filter(_.deps.forall(done.contains))
      require(ready.nonEmpty, s"dependency cycle among: ${remaining.map(_.name).mkString(", ")}")
      ready.foreach(s => { done += s.name; remaining -= s })
    }
    done.toSeq.map(byName)
  }

  /** Run the DAG; returns each stage's outcome in execution order. */
  def run(spark: SparkSession, stages: Seq[Stage], flagDir: String,
          resume: Boolean = true): Map[String, Outcome] = {
    val hfs = fsFor(spark, flagDir)
    hfs.mkdirs(new Path(flagDir))
    val outcomes = scala.collection.mutable.LinkedHashMap.empty[String, Outcome]
    topoSort(stages).foreach { s =>
      val flag = flagPath(flagDir, s.name)
      val failedDep = s.deps.find(d => !outcomes(d).ok)
      val outcome: Outcome = failedDep match {
        case Some(d) =>
          hfs.delete(flag, false) // a blocked stage's old flag is stale
          Blocked(d)
        case None if resume && hfs.exists(flag) => Resumed
        case None =>
          hfs.delete(flag, false) // clear BEFORE running: crash = flag off
          // NonFatal only: an OOM or interrupt aborts the whole DAG run
          // instead of being recorded as a routine stage failure
          try { s.run(); hfs.create(flag, true).close(); Ran }
          catch { case scala.util.control.NonFatal(e) => Failed(e) }
      }
      outcomes += s.name -> outcome
    }
    // ListMap keeps execution order (the documented contract) for DAGs
    // of any size — plain Map only happens to preserve it up to 4 keys
    scala.collection.immutable.ListMap(outcomes.toSeq: _*)
  }

  /** Backfill/catchup over an ordered period list — the Airflow
    * behavior the reference's DAGs rely on (catchup over missed
    * execution dates; descarga_hora.py is re-run per missed hour, and
    * the writers' delete-and-replace windows make each period's rerun
    * idempotent). Each period gets its OWN flag namespace
    * (`flagDir/<period>`), so a completed period costs one directory
    * listing on re-catchup (every stage Resumed, nothing re-executed)
    * and a crashed period resumes from its failed stage.
    *
    * `dependsOnPast = false` (Airflow's default): periods are
    * independent — a broken period is recorded and the rest of the
    * backfill continues. `dependsOnPast = true`: a failure stops the
    * catch-up — later periods' stages are marked Blocked on the failed
    * period and their bodies never run (the incremental-load contract,
    * where period N+1 reads period N's published output).
    *
    * Periods are caller-enumerated strings (dates, hours): the clock
    * stays outside, so backfills are deterministic and testable — same
    * seam as the reference's execution_date.
    */
  def backfill(spark: SparkSession, periods: Seq[String], mkStages: String => Seq[Stage],
               flagDir: String, dependsOnPast: Boolean = false,
               resume: Boolean = true): scala.collection.immutable.ListMap[String, Map[String, Outcome]] = {
    require(periods.distinct.size == periods.size, "duplicate backfill periods")
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Map[String, Outcome]]
    var failedPeriod: Option[String] = None
    periods.foreach { p =>
      failedPeriod match {
        case Some(fp) if dependsOnPast =>
          out += p -> mkStages(p).map(s => s.name -> (Blocked(s"period:$fp"): Outcome)).toMap
        case _ =>
          val r = run(spark, mkStages(p), new Path(flagDir, p).toString, resume)
          out += p -> r
          if (r.exists(!_._2.ok) && failedPeriod.isEmpty) failedPeriod = Some(p)
      }
    }
    scala.collection.immutable.ListMap(out.toSeq: _*)
  }

  /** The sentinel's view (the reference's seguimiento email body): one
    * (stage, ok) row per flag — dimension-sized, driver-side.
    */
  def report(spark: SparkSession, flagDir: String, stages: Seq[Stage]): Seq[(String, Boolean)] =
    stages.map(s => s.name -> flagSet(spark, flagDir, s.name))

  /** Clear every flag — the reference's start-of-day reset. */
  def reset(spark: SparkSession, flagDir: String, stages: Seq[Stage]): Unit =
    stages.foreach(s => { fsFor(spark, flagDir).delete(flagPath(flagDir, s.name), false); () })
}
