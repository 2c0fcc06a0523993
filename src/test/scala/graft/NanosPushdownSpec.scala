package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import graft.plans.NanosTsPushdown

/** NanosTsPushdown: time-window filters over a TIMESTAMP(NANOS)
  * events table must reach the parquet scan as raw-long bounds — and
  * must never change results.
  *
  * Self-fixturing: the suite writes its OWN nanos-encoded parquet via
  * the parquet-java API (Spark cannot produce TIMESTAMP(NANOS) output),
  * so the rule stays pinned regardless of which physical encoding the
  * shared testdata generator happens to emit — the round-7 fixture
  * regeneration switched events.ts to TIMESTAMP_NTZ and silently
  * un-pinned the old shared-fixture version of this suite.
  */
class NanosPushdownSpec extends SparkSpec {
  import spark.implicits._

  /** A tiny events table physically encoded as TIMESTAMP(NANOS), exactly
    * the encoding the rule exists for: µs-precision instants over
    * January 2024 (so the spec's window literals cut through the data),
    * stored as nanos.
    */
  private def writeNanosFixture(adjustedToUtc: Boolean): org.apache.spark.sql.DataFrame = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val dir = java.nio.file.Files.createTempDirectory("graft_nanos_fixture")
    dir.toFile.deleteOnExit()
    val schema = Types.buildMessage()
      .required(INT64).named("event_id")
      .required(INT64).as(LogicalTypeAnnotation.timestampType(adjustedToUtc, TimeUnit.NANOS)).named("ts")
      .required(INT64).named("user_id")
      .required(DOUBLE).named("value")
      .named("events")
    val w = ExampleParquetWriter.builder(new Path(s"$dir/events.parquet"))
      .withType(schema).build()
    val gf = new SimpleGroupFactory(schema)
    val rnd = new scala.util.Random(42)
    val jan1Micros = 1704067200000000L // 2024-01-01T00:00:00Z
    (0 until 5000).foreach { i =>
      val micros = jan1Micros + math.abs(rnd.nextLong() % (31L * 86400 * 1000000))
      val g = gf.newGroup()
      g.add("event_id", i.toLong)
      g.add("ts", micros * 1000L)
      g.add("user_id", (rnd.nextInt(100)).toLong)
      g.add("value", rnd.nextDouble() * 60)
      w.write(g)
    }
    w.close()
    Tables(spark, dir.toString).events
  }

  private lazy val nanosEvents = writeNanosFixture(adjustedToUtc = true)
  private lazy val ntzNanosEvents = writeNanosFixture(adjustedToUtc = false)

  private def withRule[T](f: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ NanosTsPushdown(spark)
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_.isInstanceOf[NanosTsPushdown])
  }

  private def pushed(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      .linesIterator.filter(_.contains("PushedFilters")).mkString("\n")

  test("window filters on the converted ts push raw nanosecond bounds to the scan") {
    val ev = nanosEvents
    val cut = lit("2024-01-15 00:00:00").cast("timestamp")
    withRule {
      val ge = ev.where($"ts" >= cut)
      // 2024-01-15T00:00:00Z = 1705276800 s -> nanos
      assert(pushed(ge).contains("GreaterThanOrEqual(ts,1705276800000000000)"), pushed(ge))
      val lt = ev.where($"ts" < cut)
      assert(pushed(lt).contains("LessThan(ts,1705276800000000000)"), pushed(lt))
      val band = ev.where($"ts" > cut && $"ts" <= lit("2024-01-20 00:00:00").cast("timestamp"))
      assert(pushed(band).contains("GreaterThanOrEqual(ts,1705276800000001000)"), pushed(band))
      assert(pushed(band).contains("LessThan(ts,1705708800000001000)"), pushed(band))
      // literal-first spelling mirrors
      val mirr = ev.where(cut <= $"ts")
      assert(pushed(mirr).contains("GreaterThanOrEqual(ts,1705276800000000000)"), pushed(mirr))
    }
  }

  test("the rule never changes results, including on exact boundary timestamps") {
    val ev = nanosEvents
    // an exact event timestamp makes >=/</boundary semantics observable
    val boundary = ev.select(max($"ts")).as[java.sql.Timestamp].head()
    val cuts = Seq(
      lit("2024-01-15 00:00:00").cast("timestamp"),
      lit(boundary),
      lit("2024-01-10 12:34:56.789").cast("timestamp"))
    cuts.foreach { cut =>
      Seq[(String, org.apache.spark.sql.Column)](
        (">=", $"ts" >= cut), (">", $"ts" > cut),
        ("<", $"ts" < cut), ("<=", $"ts" <= cut)).foreach { case (op, cond) =>
        val without = ev.where(cond).count()
        val with_ = withRule(ev.where(cond).count())
        assert(with_ == without, s"op $op at $cut: $with_ != $without")
      }
    }
  }

  test("UNADJUSTED NANOS (the pandas timestamp[ns] shape) also pushes raw bounds") {
    // the seam surfaces these as cast(timestamp_micros(..) as ntz) and
    // normalizeTs adds the TZ cast — the rule must see through the
    // value-preserving cast chain (UTC session) or a years-deep table
    // written by a pandas ingest scans every row group
    val ev = ntzNanosEvents
    val cut = lit("2024-01-15 00:00:00").cast("timestamp")
    withRule {
      val ge = ev.where($"ts" >= cut)
      assert(pushed(ge).contains("GreaterThanOrEqual(ts,1705276800000000000)"), pushed(ge))
      val lt = ev.where($"ts" < cut)
      assert(pushed(lt).contains("LessThan(ts,1705276800000000000)"), pushed(lt))
    }
    // and identical answers to the adjusted twin, rule on or off
    Seq($"ts" >= cut, $"ts" < cut).foreach { cond =>
      val plain = ntzNanosEvents.where(cond).count()
      assert(plain == nanosEvents.where(cond).count())
      assert(withRule(ntzNanosEvents.where(cond).count()) == plain)
    }
  }

  test("the truncation algebra is exact for randomized nanos, including negatives") {
    // pure check of the four inversions the rule emits: for any long
    // nanos a and post-epoch micros m, the raw-long bound must be
    // EQUIVALENT to the original comparison on a div 1000 (truncating
    // division, like Spark's `div` and Scala's /)
    val rnd = new scala.util.Random(7)
    (1 to 20000).foreach { _ =>
      val a = rnd.nextLong()
      val m = math.abs(rnd.nextLong() % 4102444800000000L) + 1 // (0, year-2100] micros
      val d = a / 1000
      assert((d >= m) == (a >= m * 1000), s"a=$a m=$m >=")
      assert((d > m) == (a >= (m + 1) * 1000), s"a=$a m=$m >")
      assert((d < m) == (a < m * 1000), s"a=$a m=$m <")
      assert((d <= m) == (a < (m + 1) * 1000), s"a=$a m=$m <=")
    }
  }

  test("filters with no converted-ts comparison are left untouched") {
    val ev = nanosEvents
    withRule {
      val plain = ev.where($"user_id" >= 10)
      assert(pushed(plain).contains("GreaterThanOrEqual(user_id,10)"))
      assert(!plain.queryExecution.optimizedPlan.toString.contains("1705"))
    }
  }
}
