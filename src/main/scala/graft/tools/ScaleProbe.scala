package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic scale-up: synthesize an sf1.0-SHAPED dataset from the
  * sf0.1 fixtures (10 key-shifted copies per table) so the heaviest
  * queries can be probed one decade above the bench scale — the
  * "would this still be linear at 10×?" check the 100 TB design
  * claims rest on. NOT a correctness fixture (the driver's testdata
  * stays the oracle input); output goes under /tmp.
  *
  * Faithfulness choices: key spaces shift per copy so join fan-outs
  * and group cardinalities scale linearly (referential integrity
  * preserved copy-locally); the fixed dims (nation/region) stay 1× as
  * TPC-H defines them; document text is vowel-rotated per copy so the
  * DUPLICATE RATE stays constant (verbatim copies would square the
  * near-dup pair counts and probe a different workload); embeddings
  * rotate component-wise per copy for the same reason.
  *
  * Usage: runMain graft.tools.ScaleProbe [srcDir] [dstDir] [copies]
  */
object ScaleProbe {

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/graft_sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def maxOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head().getLong(0) + 1L

    val orders = read("orders"); val customer = read("customer")
    val part = read("part"); val supplier = read("supplier")
    val lineitem = read("lineitem"); val events = read("events")
    val documents = read("documents"); val embeddings = read("embeddings")

    val ok = maxOf(orders, "o_orderkey"); val ck = maxOf(customer, "c_custkey")
    val pk = maxOf(part, "p_partkey"); val sk = maxOf(supplier, "s_suppkey")
    val ek = maxOf(events, "event_id"); val uk = maxOf(events, "user_id")
    val dk = maxOf(documents, "doc_id"); val vk = maxOf(embeddings, "vec_id")

    // full-period alphabet (10 letters, one rotation per copy): a
    // shorter cycle would hand copies i and i+cycle IDENTICAL text —
    // exact twins that square the near-dup pair counts and probe a
    // different workload
    val letters = "aeiousrtln"
    def rot(s: String, i: Int): String = {
      val k = i % s.length; s.drop(k) + s.take(k)
    }
    // entity names must also be copy-distinct at EDIT DISTANCE > 1 (a
    // 1-char copy tag would leave cross-copy names one substitution
    // apart — fuzzy joins would then match 10 copies of every
    // neighbor, an artifact): a doubled-letter prefix costs 2 edits
    def nameTag(i: Int): String = { val c = ('a' + i % 26).toChar; s"$c${c}_" }

    def scaled(df: DataFrame, shifts: Map[String, Long],
               extra: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until copies).map { i =>
        val shifted = shifts.foldLeft(df) { case (d, (c, space)) =>
          d.withColumn(c, col(c) + lit(i * space))
        }
        extra(shifted, i)
      }.reduce(_.unionByName(_))

    def write(df: DataFrame, t: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite").parquet(s"$dst/$t.parquet")

    write(scaled(orders, Map("o_orderkey" -> ok, "o_custkey" -> ck)), "orders", 16)
    write(scaled(customer, Map("c_custkey" -> ck), (d, i) =>
      d.withColumn("c_name", concat(lit(nameTag(i)), col("c_name")))), "customer", 4)
    write(scaled(part, Map("p_partkey" -> pk), (d, i) =>
      d.withColumn("p_name", concat(lit(nameTag(i)), col("p_name")))), "part", 4)
    write(scaled(supplier, Map("s_suppkey" -> sk), (d, i) =>
      d.withColumn("s_name", concat(lit(nameTag(i)), col("s_name")))), "supplier", 2)
    write(scaled(lineitem,
      Map("l_orderkey" -> ok, "l_partkey" -> pk, "l_suppkey" -> sk)), "lineitem", 32)
    write(scaled(events, Map("event_id" -> ek, "user_id" -> uk)), "events", 16)
    write(scaled(documents, Map("doc_id" -> dk), (d, i) =>
      d.withColumn("text", translate(col("text"), letters, rot(letters, i)))), "documents", 16)
    write(scaled(embeddings, Map("vec_id" -> vk), (d, i) => {
      val dim = 16 // rotate within the leading window; cheap, direction-changing
      val r = i % dim
      d.withColumn("embedding",
        concat(slice(col("embedding"), lit(r + 1), size(col("embedding")) - lit(r)),
          slice(col("embedding"), lit(1), lit(r))).cast("array<float>"))
    }), "embeddings", 8)
    read("nation").write.mode("overwrite").parquet(s"$dst/nation.parquet")
    read("region").write.mode("overwrite").parquet(s"$dst/region.parquet")
    println(s"""{"scaled":"$dst","copies":$copies}""")
    spark.stop()
  }
}
