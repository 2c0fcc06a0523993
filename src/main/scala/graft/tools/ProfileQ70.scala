package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns
import graft.operators.Dedup

/** Stage-level timing of q70_pipeline_survivors at one scale — the
  * probe-tail diagnosis tool (SURVEY round-12). Not part of any gate.
  *
  * Usage: runMain graft.tools.ProfileQ70 <sfDir>
  */
object ProfileQ70 {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, dir)

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q70prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val quality = TextFns.qualityScore(col("text"), TextFns.tokens(col("text")))
    val q = t.documents
      .select(col("doc_id"), col("lang"), col("source"), col("text"), quality.as("quality"))
      .where(col("quality") >= 0.5)
    val s = timed("gate+exact (checkpoint)") {
      Dedup.exact(q, "text", "doc_id").localCheckpoint(true)
    }
    println(s"[q70prof] survivors after exact: ${s.count()}")
    val pairs = timed("jaccardPairs (materialize)") {
      Dedup.jaccardPairs(s, "doc_id", "text", k = 3, minJaccard = 0.5)
        .localCheckpoint(true)
    }
    println(s"[q70prof] near-dup pairs: ${pairs.count()}")
    val survivors = timed("canonicalize") {
      Dedup.canonicalize(s.select("doc_id"), "doc_id", pairs)
        .where(col("id") === col("canonical_id"))
        .select(col("id").as("doc_id"))
        .localCheckpoint(true)
    }
    println(s"[q70prof] survivors after CC: ${survivors.count()}")
    timed("redact+split+join (final)") {
      val redacted = regexp_replace(
        regexp_replace(col("text"),
          "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
        "\\+?[0-9][0-9 -]{7,}[0-9]", "<PHONE>")
      val bucketCol = TextFns.hash32(
        concat(lit("split:"), col("doc_id").cast("string"))) % 100
      s.join(survivors, "doc_id")
        .select(col("doc_id"), col("lang"), col("source"),
          when(bucketCol < 80, "train").when(bucketCol < 90, "val")
            .otherwise("test").as("split"),
          col("quality"),
          size(TextFns.tokens(redacted)).as("n_tokens"))
        .orderBy("doc_id")
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
