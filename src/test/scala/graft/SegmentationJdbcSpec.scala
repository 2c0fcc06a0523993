package graft

import java.sql.DriverManager
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Segmentation
import graft.sources.Readers

/** The reference's actual mailing-segmentation dataflow, end to end:
  * rules live in a Postgres table (Update_function_for_Mailing_
  * segmentation.ipynb:98-100 — here embedded Derby over the same Spark
  * JDBC surface), drive the one-scan rules engine (q56), cross-segment
  * exclusivity keeps each member in their first-priority segment only
  * (Bigquery_to_csv_2.ipynb:66-90), and the result exports one file
  * tree per segment.
  */
class SegmentationJdbcSpec extends SparkSpec {
  import spark.implicits._

  private def withDb[T](name: String)(f: String => T): T = {
    val url = s"jdbc:derby:memory:$name;create=true"
    try f(url)
    finally {
      try { DriverManager.getConnection(s"jdbc:derby:memory:$name;drop=true"); () }
      catch { case _: java.sql.SQLException => () }
    }
  }

  /** The reference's chained-anti-join semantics, written naively (one
    * left-anti per earlier segment) as the test oracle for `exclusive`.
    */
  private def chained(memberships: DataFrame, priorities: Seq[String]): Map[String, Set[String]] = {
    var claimed = Set.empty[String]
    priorities.map { tag =>
      val mine = memberships.where(col("tag") === tag)
        .select("member").as[String].collect().toSet -- claimed
      claimed ++= mine
      tag -> mine
    }.toMap
  }

  test("Derby rules -> one-scan engine -> exclusivity -> per-segment export") {
    withDb("graft_rules") { url =>
      // the rules table as the reference stores it (tag, key, op, value)
      val conn = DriverManager.getConnection(url)
      conn.createStatement().execute(
        "CREATE TABLE reglas (tag VARCHAR(40) NOT NULL, tkey VARCHAR(40) NOT NULL, " +
          "op VARCHAR(10) NOT NULL, tvalue VARCHAR(200))")
      val ps = conn.prepareStatement("INSERT INTO reglas VALUES (?, ?, ?, ?)")
      Seq(
        ("rutasecreta", "c_custkey", "in", (1 to 40).mkString(",")),
        ("historiafreak", "c_mktsegment", "eq", "BUILDING"),
        ("cocavi", "c_mktsegment", "eq", "AUTOMOBILE"),
        ("sin_comentario", "comentario", "null", null)
      ).foreach { case (t, k, o, v) =>
        ps.setString(1, t); ps.setString(2, k); ps.setString(3, o); ps.setString(4, v)
        ps.addBatch()
      }
      ps.executeBatch(); conn.close()

      val priorities = Seq("rutasecreta", "historiafreak", "cocavi", "sin_comentario")
      val rules = Readers.jdbc(spark, url, "reglas")
        .select(col("tag"), col("tkey").as("key"), col("op"), col("tvalue").as("value"))
      val users = sf("sf0.01").customer
        .withColumn("email", concat(col("c_name"), lit("@example.test")))
        .withColumn("comentario",
          when(col("c_custkey") % 10 === 0, lit(null).cast("string"))
            .otherwise(col("c_mktsegment")))

      val memberships = Segmentation.applyRules(users, rules, "email")
      val excl = Segmentation.exclusive(memberships, priorities)

      // exclusivity: one segment per member, and exactly the reference's
      // chained anti-join assignment
      val got = excl.as[(String, String)].collect()
      assert(got.map(_._2).distinct.length == got.length, "a member landed in two segments")
      val expected = chained(memberships, priorities)
      assert(got.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap ==
        expected.filter(_._2.nonEmpty))
      // overlap really existed upstream, or exclusivity tested nothing
      val overlaps = memberships.groupBy("member").count().where(col("count") > 1).count()
      assert(overlaps > 0, "fixture produced no cross-segment members")

      // per-segment export: one directory per tag (the reference writes
      // one CSV per segment for the mailing platform)
      val outDir = Files.createTempDirectory("graft-segexport").toString + "/segments"
      excl.write.partitionBy("tag").option("header", "true").csv(outDir)
      val dirs = new java.io.File(outDir).listFiles().filter(_.isDirectory)
        .map(_.getName).toSet
      assert(dirs == expected.filter(_._2.nonEmpty).keySet.map(t => s"tag=$t"))
      val back = spark.read.option("header", "true").csv(outDir)
      assert(back.count() == got.length)
    }
  }
}
