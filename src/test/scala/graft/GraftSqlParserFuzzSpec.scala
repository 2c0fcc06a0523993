package graft.plans

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Crash-freedom net for the maintenance dialect: `parseMaintenance`
  * over arbitrary token soup must always answer — Some(plan), None
  * (delegate), or an `IllegalArgumentException` with the dialect's own
  * message — never an index-out-of-bounds, match error or NPE. The
  * round-10 `DESCRIBE history` bug (a table named like a dialect
  * keyword walking the tokenizer off the end) is exactly the class
  * this pins shut.
  */
class GraftSqlParserFuzzSpec extends SparkSpec {

  private val vocab: Gen[String] = Gen.oneOf(
    "VACUUM", "OPTIMIZE", "DESCRIBE", "RESTORE", "HISTORY", "DETAIL",
    "RETAIN", "DRY", "RUN", "ZORDER", "BY", "WHERE", "TO", "VERSION",
    "TIMESTAMP", "AS", "OF", "TABLE", "vacuum", "describe", "history",
    "detail", "t", "g", "db", ".", ",", "(", ")", ";", "=", "`q`",
    "'x'", "'it''s'", "7", "1996", "DAYS", "HOURS", "VERSIONS", "v",
    "`", "'", "%",
    // round-10 CREATE dialect forms + FULL
    "CREATE", "SHALLOW", "CLONE", "FROM", "PARQUET", "PARTITIONED", "FULL",
    "create", "shallow", "clone", "'/tmp/x'",
    // round-12 verbs: rebase, materialized views
    "REBASE", "BRANCH", "MERGE", "MATERIALIZED", "VIEW", "REFRESH",
    "SELECT", "GROUP", "COUNT", "SUM", "*", "refresh", "materialized")

  private val statement: Gen[String] =
    Gen.chooseNum(1, 10).flatMap(n => Gen.listOfN(n, vocab)).map(_.mkString(" "))

  test("parseMaintenance never crashes on arbitrary token soup") {
    val delegate = spark.sessionState.sqlParser
    var some = 0; var none = 0; var refused = 0
    (1 to 1500).foreach { i =>
      val text = statement.apply(Gen.Parameters.default, Seed(i.toLong)).getOrElse("")
      try {
        GraftSqlParser.parseMaintenance(text, delegate) match {
          case Some(_) => some += 1
          case None    => none += 1
        }
      } catch {
        // the dialect's own refusals, and the session parser's for the
        // free-text OPTIMIZE WHERE / RESTORE tails it delegates
        case _: IllegalArgumentException => refused += 1
        case _: IllegalStateException => refused += 1 // CREATE-dialect loud refusal
        case _: org.apache.spark.sql.AnalysisException => refused += 1
        case e: Throwable =>
          fail(s"parseMaintenance crashed on <$text>: ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    // the generator must actually exercise all three outcomes
    assert(some > 0 && none > 0 && refused > 0,
      s"degenerate fuzz distribution: some=$some none=$none refused=$refused")
  }

  test("well-formed statements of every verb still parse") {
    val delegate = spark.sessionState.sqlParser
    val good = Seq(
      "VACUUM g.db.t",
      "VACUUM t RETAIN 7 DAYS",
      "VACUUM t RETAIN 3 VERSIONS DRY RUN",
      "OPTIMIZE t",
      "OPTIMIZE g.db.t WHERE p = 'x' ZORDER BY (a, b)",
      "DESCRIBE HISTORY g.db.t",
      "DESCRIBE DETAIL t",
      "RESTORE TABLE t TO VERSION AS OF 3",
      "RESTORE t TO TIMESTAMP AS OF '2026-01-01 00:00:00'",
      "OPTIMIZE g.db.t FULL",
      "CREATE TABLE g.db.a SHALLOW CLONE g.db.b",
      "CREATE TABLE a SHALLOW CLONE b VERSION AS OF 4",
      "CREATE TABLE g.db.a DEEP CLONE g.db.b",
      "CREATE TABLE a DEEP CLONE b VERSION AS OF 'pin'",
      "ALTER TABLE g.db.t CREATE BRANCH dev",
      "ALTER TABLE t DROP BRANCH IF EXISTS dev",
      "ALTER TABLE t MERGE BRANCH nightly-2026.08",
      "CREATE TABLE t FROM PARQUET '/tmp/x'",
      "CREATE TABLE t FROM PARQUET '/tmp/x' PARTITIONED BY (p, q)",
      "ALTER TABLE g.db.t REBASE BRANCH dev",
      "ALTER TABLE t REBASE BRANCH nightly-2026.08",
      "CREATE MATERIALIZED VIEW g.db.mv AS SELECT k, COUNT(*) AS n FROM g.db.src GROUP BY k",
      "CREATE MATERIALIZED VIEW mv AS SELECT 1 AS one",
      "REFRESH MATERIALIZED VIEW g.db.mv",
      "REFRESH MATERIALIZED VIEW mv")
    good.foreach(s => assert(GraftSqlParser.parseMaintenance(s, delegate).isDefined,
      s"must parse as maintenance: $s"))
    // and vanilla statements starting with a shared verb delegate
    Seq("DESCRIBE history", "DESCRIBE history.orders", "DESCRIBE TABLE t",
      // vanilla CREATE delegates even with dialect hint words in
      // literals or comments the dialect lexer cannot tokenize
      "CREATE TABLE t (id INT)",
      "CREATE TABLE t AS SELECT 'shallow clone from parquet' AS s",
      "CREATE TABLE t (id INT) -- don't shallow clone this",
      // vanilla ALTERs with branch-ish identifiers delegate too
      "ALTER TABLE t ADD COLUMNS (merge_branch INT)",
      "ALTER TABLE t RENAME COLUMN a TO create_branch",
      // vanilla REFRESH forms delegate; MV hint words in literals too
      "REFRESH TABLE t",
      "REFRESH FUNCTION f",
      "CREATE TABLE t AS SELECT 'materialized view' AS s")
      .foreach(s => assert(GraftSqlParser.parseMaintenance(s, delegate).isEmpty,
        s"must delegate to the session parser: $s"))
  }
}
