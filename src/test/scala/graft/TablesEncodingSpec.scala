package graft

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** The physical-encoding seam ([[Tables.apply]] + [[Tables.normalizeTs]]):
  * whatever timestamp encoding a producer writes — TIMESTAMP(NANOS)
  * adjusted or not (which Spark's reader can't even scan natively),
  * TIMESTAMP_NTZ, plain TIMESTAMP — every engine query downstream sees
  * the same normalized types and the same values. Round 7's fixture
  * regeneration flipped events.ts NANOS → NTZ and broke the streak;
  * this suite makes any such flip a non-event.
  */
class TablesEncodingSpec extends SparkSpec {

  private val microsAt10 = 1704103200000000L // 2024-01-01T10:00:00Z

  /** A table whose footer mixes plain INT64, adjusted NANOS and
    * unadjusted NANOS columns.
    */
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_enc_fixture")
    d.toFile.deleteOnExit()
    val schema = Types.buildMessage()
      .required(INT64).named("id")
      .required(INT64).as(LogicalTypeAnnotation.timestampType(true, TimeUnit.NANOS)).named("ts")
      .required(INT64).as(LogicalTypeAnnotation.timestampType(false, TimeUnit.NANOS)).named("local_ts")
      .required(INT64).named("plain_long")
      .named("events")
    val w = ExampleParquetWriter.builder(new Path(s"$d/events.parquet"))
      .withType(schema).build()
    val gf = new SimpleGroupFactory(schema)
    (0 until 100).foreach { i =>
      val g = gf.newGroup()
      g.add("id", i.toLong)
      g.add("ts", (microsAt10 + i * 1000000L) * 1000L)
      g.add("local_ts", (microsAt10 + i * 1000000L) * 1000L)
      g.add("plain_long", (microsAt10 + i) * 1000L) // big value, NOT a timestamp
      w.write(g)
    }
    w.close()
    d.toString
  }

  test("NANOS columns surface as timestamps by footer type; plain longs stay longs") {
    val df = Tables(spark, dir).events // events goes through normalizeTs too
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.schema("local_ts").dataType == TimestampNTZType,
      "unadjusted NANOS means local semantics -> NTZ")
    assert(df.schema("plain_long").dataType == LongType,
      "a long with no timestamp annotation must never be reinterpreted")
    val row = df.orderBy("id").select("ts", "local_ts", "plain_long").limit(1).collect().head
    assert(row.getTimestamp(0).getTime == microsAt10 / 1000)
    assert(row.getAs[java.time.LocalDateTime](1) ==
      java.time.LocalDateTime.parse("2024-01-01T10:00:00"))
    assert(row.getLong(2) == microsAt10 * 1000L)
  }

  test("the same query answers identically over NANOS and NTZ encodings") {
    import spark.implicits._
    // twin fixture: same values, NTZ-µs encoding (what the current
    // generator produces) written by Spark itself
    val d2 = java.nio.file.Files.createTempDirectory("graft_enc_ntz").toString
    (0 until 100).map { i =>
      (i.toLong, java.time.LocalDateTime.parse("2024-01-01T10:00:00").plusSeconds(i))
    }.toDF("id", "ts").write.parquet(s"$d2/events.parquet")

    def answer(t: Tables): Seq[(Long, Long)] = {
      val ev = t.events
      ev.where(org.apache.spark.sql.functions.col("ts") >=
          org.apache.spark.sql.functions.lit("2024-01-01 10:00:30").cast("timestamp"))
        .groupBy().agg(
          org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)),
          org.apache.spark.sql.functions.sum($"id"))
        .as[(Long, Long)].collect().toSeq
    }
    assert(answer(Tables(spark, dir)) == answer(Tables(spark, d2)))
  }
}
