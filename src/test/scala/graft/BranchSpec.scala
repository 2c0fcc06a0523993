package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Snapshot

/** Writable BRANCHES: named forks on the tag/version machinery —
  * `CREATE BRANCH dev` is a branch record on the parent (base pinned
  * against vacuum like a tag) plus a zero-copy shallow fork that is a
  * full snapshot table; writes land under the branch root; `MERGE
  * BRANCH dev` fast-forwards the parent to the branch head with the
  * parent's history intact, refusing loudly when the parent diverged.
  * The staging workflow a corpus team runs before promoting a nightly
  * build.
  */
class BranchSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-branch-$tag").toString + "/t"

  private def rows(df: DataFrame): Set[(Long, String, Long)] =
    df.select("id", "p", "v").as[(Long, String, Long)].collect().toSet

  private def fixture(ids: Range): DataFrame =
    ids.map(i => (i.toLong, if (i % 2 == 0) "even" else "odd", i.toLong * 10))
      .toDF("id", "p", "v")

  test("branch, diverge, fast-forward merge back — parent history intact") {
    val path = tmp("ff")
    Snapshot.create(spark, path, fixture(0 until 20), partitionCols = Seq("p"))
    val preBranch = Snapshot.latestVersion(spark, path).get
    Snapshot.createBranch(spark, path, "dev")
    val bPath = Snapshot.branchPath(path, "dev")
    // the fork is zero-copy and reads the branch point exactly
    assert(rows(Snapshot.read(spark, bPath)) == rows(fixture(0 until 20)))
    // the branch takes real writes — append AND row-level DML
    Snapshot.append(spark, bPath, fixture(100 until 104))
    Snapshot.delete(spark, bPath, col("id") === 3)
    Snapshot.update(spark, bPath, col("id") === 2, Map("v" -> lit(999L)))
    val want = (rows(fixture(0 until 20)) ++ rows(fixture(100 until 104)))
      .filterNot(_._1 == 3L).map { case (i, p, v) => if (i == 2L) (i, p, 999L) else (i, p, v) }
    assert(rows(Snapshot.read(spark, bPath)) == want)
    // the PARENT saw none of it
    assert(rows(Snapshot.read(spark, path)) == rows(fixture(0 until 20)))
    // metadata-only parent commits do not block a fast-forward
    Snapshot.createTag(spark, path, "mid-branch")
    val merged = Snapshot.mergeBranch(spark, path, "dev")
    assert(rows(Snapshot.read(spark, path)) == want)
    // history intact: the pre-branch version still reads, the merge is
    // a forward commit
    assert(rows(Snapshot.readVersion(spark, path, preBranch)) == rows(fixture(0 until 20)))
    val m = Snapshot.latestManifest(spark, path).get
    assert(m.version == merged && m.operation == "MERGE BRANCH dev")
    assert(m.branches.isEmpty, "the record retires with the merge")
    assert(m.tags.contains("mid-branch"), "parent tags survive the merge")
    // local refs only — the branch's files were MOVED, not re-aliased
    assert((m.files ++ m.dvs.values.map(_.file)).forall(!_.startsWith("@")),
      s"merge must land local refs, got ${m.files.filter(_.startsWith("@")).take(3)}")
    // the branch table is gone
    assert(Snapshot.latestVersion(spark, bPath).isEmpty)
    // and the merged state keeps working as a table (compaction, reads)
    Snapshot.compact(spark, path, minFiles = 1)
    assert(rows(Snapshot.read(spark, path)) == want)
  }

  test("a diverged parent refuses the merge; the branch survives the refusal") {
    val path = tmp("diverge")
    Snapshot.create(spark, path, fixture(0 until 10), partitionCols = Seq("p"))
    Snapshot.createBranch(spark, path, "dev")
    Snapshot.append(spark, Snapshot.branchPath(path, "dev"), fixture(50 until 52))
    // CONTENT moves on the parent after the branch point
    Snapshot.append(spark, path, fixture(90 until 92))
    val e = intercept[IllegalArgumentException](Snapshot.mergeBranch(spark, path, "dev"))
    assert(e.getMessage.contains("diverged"), e.getMessage)
    // nothing half-merged: parent still has its own state, branch its own
    assert(Snapshot.read(spark, path).count() == 12)
    assert(Snapshot.read(spark, Snapshot.branchPath(path, "dev")).count() == 12)
    // drop discards the unmerged fork and releases the pin
    Snapshot.dropBranch(spark, path, "dev")
    assert(Snapshot.latestManifest(spark, path).get.branches.isEmpty)
    assert(Snapshot.latestVersion(spark, Snapshot.branchPath(path, "dev")).isEmpty)
  }

  test("vacuum retains a branch base as an island until the branch drops") {
    val path = tmp("vacuum")
    Snapshot.create(spark, path, fixture(0 until 30), partitionCols = Seq("p"))
    Snapshot.createBranch(spark, path, "hold")
    val bPath = Snapshot.branchPath(path, "hold")
    // heavy churn on the parent: every pre-branch file leaves the live set
    Snapshot.overwrite(spark, path, fixture(200 until 210))
    Snapshot.overwrite(spark, path, fixture(300 until 310))
    Snapshot.vacuum(spark, path, keepVersions = 1, orphanGraceMs = 0L)
    // the branch still reads its base exactly — the base was an island
    assert(rows(Snapshot.read(spark, bPath)) == rows(fixture(0 until 30)))
    // dropping the branch releases the pin; the next vacuum reclaims
    Snapshot.dropBranch(spark, path, "hold")
    Snapshot.vacuum(spark, path, keepVersions = 1, orphanGraceMs = 0L)
    assert(rows(Snapshot.read(spark, path)) == rows(fixture(300 until 310)))
  }

  test("branch verbs as SQL text on both front ends") {
    // registry route
    val root = Files.createTempDirectory("graft-branch-sql").toString
    val path = s"$root/t"
    Snapshot.create(spark, path, fixture(0 until 8), partitionCols = Seq("p"))
    val reg = Map("t" -> path, "t_dev" -> Snapshot.branchPath(path, "dev"))
    Snapshot.sql(spark, "ALTER TABLE t CREATE BRANCH dev", reg)
    Snapshot.sql(spark, "INSERT INTO t_dev VALUES (100, 'even', 1000)", reg)
    assert(Snapshot.sqlQuery(spark, "SELECT count(*) AS n FROM t_dev", reg)
      .as[Long].head() == 9L)
    assert(Snapshot.sqlQuery(spark, "SELECT count(*) AS n FROM t", reg)
      .as[Long].head() == 8L)
    Snapshot.sql(spark, "ALTER TABLE t MERGE BRANCH dev", reg)
    assert(Snapshot.sqlQuery(spark, "SELECT count(*) AS n FROM t", reg)
      .as[Long].head() == 9L)
    intercept[Exception](Snapshot.sql(spark, "ALTER TABLE t DROP BRANCH dev", reg))
    Snapshot.sql(spark, "ALTER TABLE t DROP BRANCH IF EXISTS dev", reg)

    // catalog route (dialect parser) + DESCRIBE DETAIL surfacing
    val wh = Files.createTempDirectory("graft-branch-wh").toString
    spark.conf.set("spark.sql.catalog.gb", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gb.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gb.db")
    spark.sql("CREATE TABLE gb.db.t (id BIGINT, p STRING, v BIGINT) PARTITIONED BY (p)")
    spark.sql("INSERT INTO gb.db.t VALUES (1, 'even', 10)")
    spark.sql("ALTER TABLE gb.db.t CREATE BRANCH nightly")
    val detail = spark.sql("DESCRIBE DETAIL gb.db.t").select("branches").as[String].head()
    assert(detail.startsWith("nightly@v"), detail)
    Snapshot.append(spark, Snapshot.branchPath(s"$wh/db/t", "nightly"),
      Seq((2L, "odd", 20L)).toDF("id", "p", "v"))
    spark.sql("ALTER TABLE gb.db.t MERGE BRANCH nightly")
    assert(spark.sql("SELECT count(*) AS n FROM gb.db.t").as[Long].head() == 2L)
    spark.sql("ALTER TABLE gb.db.t CREATE BRANCH dead")
    spark.sql("ALTER TABLE gb.db.t DROP BRANCH dead")
    assert(Snapshot.latestManifest(spark, s"$wh/db/t").get.branches.isEmpty)
  }

  test("branch over a vectored, column-mapped, constrained table round-trips whole") {
    val path = tmp("meta")
    Snapshot.create(spark, path, fixture(0 until 30), partitionCols = Seq("p"))
    // table state with every metadata dimension active: a deletion
    // vector, a renamed column (active mapping), a CHECK constraint
    Snapshot.delete(spark, path, col("id") === 4, dvMaxFraction = 0.9)
    Snapshot.renameColumn(spark, path, "v", "val")
    Snapshot.addConstraint(spark, path, "val_nonneg", "val >= 0")
    val preBranch = Snapshot.read(spark, path)
      .select("id", "p", "val").as[(Long, String, Long)].collect().toSet
    Snapshot.createBranch(spark, path, "dev")
    val bPath = Snapshot.branchPath(path, "dev")
    // branch sees the same state THROUGH the vector and the mapping
    assert(Snapshot.read(spark, bPath).select("id", "p", "val")
      .as[(Long, String, Long)].collect().toSet == preBranch)
    // the branch enforces the inherited constraint
    intercept[IllegalArgumentException](Snapshot.append(spark, bPath,
      Seq((99L, "odd", -1L)).toDF("id", "p", "val")))
    // branch-side DML: a DV delete + an update on the RENAMED column
    Snapshot.delete(spark, bPath, col("id") === 6, dvMaxFraction = 0.9)
    Snapshot.update(spark, bPath, col("id") === 7, Map("val" -> lit(777L)))
    val want = preBranch.filterNot(_._1 == 6L)
      .map { case (i, p, v) => if (i == 7L) (i, p, 777L) else (i, p, v) }
    Snapshot.mergeBranch(spark, path, "dev")
    // the merged parent carries the branch's DVs, mapping, constraint
    assert(Snapshot.read(spark, path).select("id", "p", "val")
      .as[(Long, String, Long)].collect().toSet == want)
    val m = Snapshot.latestManifest(spark, path).get
    assert(m.constraints.contains("val_nonneg") && m.colMap.nonEmpty)
    intercept[IllegalArgumentException](Snapshot.append(spark, path,
      Seq((99L, "odd", -1L)).toDF("id", "p", "val")))
    // and maintenance on the merged parent still works (folds DVs in)
    Snapshot.compact(spark, path, minFiles = 1)
    assert(Snapshot.read(spark, path).select("id", "p", "val")
      .as[(Long, String, Long)].collect().toSet == want)
  }

  test("the change feed across a MERGE BRANCH carries exactly the branch's net changes") {
    val path = tmp("cdf")
    Snapshot.create(spark, path, fixture(0 until 12), partitionCols = Seq("p"))
    val vPre = Snapshot.latestVersion(spark, path).get
    Snapshot.createBranch(spark, path, "dev")
    val bPath = Snapshot.branchPath(path, "dev")
    Snapshot.delete(spark, bPath, col("id") === 3)
    Snapshot.append(spark, bPath, fixture(50 until 52))
    Snapshot.mergeBranch(spark, path, "dev")
    val vPost = Snapshot.latestVersion(spark, path).get
    // unchanged parent files keep their rel paths through the merge, so
    // the reconciled feed is the branch's TRUE row deltas — a nightly
    // consumer of the parent sees a staged promotion as an ordinary
    // incremental window, never a full-table rewrite
    val feed = Snapshot.readChanges(spark, path, vPre, vPost, net = true)
    val ins = feed.where(col("_change_type") === "insert")
      .select("id", "p", "v").as[(Long, String, Long)].collect().toSet
    val del = feed.where(col("_change_type") === "delete")
      .select("id", "p", "v").as[(Long, String, Long)].collect().toSet
    assert(ins == rows(fixture(50 until 52)), s"inserts: $ins")
    assert(del == Set((3L, "odd", 30L)), s"deletes: $del")
  }

  test("VERSION AS OF 'branch' reads the branch head on both routes") {
    val path = tmp("read")
    Snapshot.create(spark, path, fixture(0 until 5), partitionCols = Seq("p"))
    Snapshot.createBranch(spark, path, "dev")
    Snapshot.append(spark, Snapshot.branchPath(path, "dev"), fixture(50 until 53))
    // registry route
    val reg = Map("t" -> path)
    assert(Snapshot.sqlQuery(spark,
      "SELECT count(*) AS n FROM t VERSION AS OF 'dev'", reg).as[Long].head() == 8L)
    assert(Snapshot.sqlQuery(spark, "SELECT count(*) AS n FROM t", reg)
      .as[Long].head() == 5L)
    // a TAG with the same resolution funnel still resolves as a tag
    Snapshot.createTag(spark, path, "pin")
    assert(Snapshot.sqlQuery(spark,
      "SELECT count(*) AS n FROM t VERSION AS OF 'pin'", reg).as[Long].head() == 5L)

    // catalog route
    val wh = Files.createTempDirectory("graft-branch-read-wh").toString
    spark.conf.set("spark.sql.catalog.gbr", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gbr.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gbr.db")
    spark.sql("CREATE TABLE gbr.db.t (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO gbr.db.t VALUES (1, 10)")
    spark.sql("ALTER TABLE gbr.db.t CREATE BRANCH exp")
    Snapshot.append(spark, Snapshot.branchPath(s"$wh/db/t", "exp"),
      Seq((2L, 20L), (3L, 30L)).toDF("id", "v"))
    assert(spark.sql("SELECT count(*) AS n FROM gbr.db.t VERSION AS OF 'exp'")
      .as[Long].head() == 3L)
    assert(spark.sql("SELECT count(*) AS n FROM gbr.db.t").as[Long].head() == 1L)
  }

  test("a concurrent parent vacuum inside the merge window cannot reclaim moved branch files") {
    val path = tmp("vacuum-window")
    Snapshot.create(spark, path, fixture(0 until 10), partitionCols = Seq("p"))
    Snapshot.createBranch(spark, path, "dev")
    val bPath = Snapshot.branchPath(path, "dev")
    Snapshot.append(spark, bPath, fixture(50 until 55))
    // age every branch file past the vacuum grace window — rename
    // preserves mtimes, so without the merge-time freshening the moved
    // dirs would sit under the parent looking like hour-old orphans
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 2 * 3600 * 1000L)
    java.nio.file.Files.walk(java.nio.file.Paths.get(bPath)).forEach(p =>
      java.nio.file.Files.setLastModifiedTime(p, old))
    // inject a parent vacuum EXACTLY in the move→commit window; its
    // live-set snapshot predates the merge commit, so only the grace
    // window protects the moved files
    var fired = false
    Snapshot.faultHook = stage => if (stage == "merge-branch-moved" && !fired) {
      fired = true
      Snapshot.vacuum(spark, path, keepVersions = 10, orphanGraceMs = 3600 * 1000L)
    }
    try Snapshot.mergeBranch(spark, path, "dev")
    finally Snapshot.faultHook = _ => ()
    assert(fired, "the injected vacuum must have run inside the window")
    // every branch row survived the in-window sweep
    assert(rows(Snapshot.read(spark, path)) ==
      rows(fixture(0 until 10)) ++ rows(fixture(50 until 55)))
  }

  test("an in-window parent divergence refuses AND leaves the branch fully readable") {
    val path = tmp("window-refusal")
    Snapshot.create(spark, path, fixture(0 until 10), partitionCols = Seq("p"))
    Snapshot.createBranch(spark, path, "dev")
    val bPath = Snapshot.branchPath(path, "dev")
    Snapshot.append(spark, bPath, fixture(50 until 55))
    // parent CONTENT moves between the pre-check and the commit: the
    // merge must refuse, and the refusal must move the dirs back
    var fired = false
    Snapshot.faultHook = stage => if (stage == "merge-branch-moved" && !fired) {
      fired = true
      Snapshot.append(spark, path, fixture(90 until 92))
    }
    val e = try intercept[IllegalArgumentException](Snapshot.mergeBranch(spark, path, "dev"))
    finally Snapshot.faultHook = _ => ()
    assert(fired && e.getMessage.contains("diverged"), e.getMessage)
    // the branch is fully intact and READABLE after the refusal (the
    // moved dirs were renamed back, not left stranded under the parent)
    assert(rows(Snapshot.read(spark, bPath)) ==
      rows(fixture(0 until 10)) ++ rows(fixture(50 until 55)))
    assert(rows(Snapshot.read(spark, path)) ==
      rows(fixture(0 until 10)) ++ rows(fixture(90 until 92)))
    // and the refusal is recoverable: re-branch-free retry path — drop
    // and the parent's state stands
    Snapshot.dropBranch(spark, path, "dev")
    assert(Snapshot.latestManifest(spark, path).get.branches.isEmpty)
  }

  test("parent metadata-only commits since the branch point survive the merge") {
    val path = tmp("meta-merge")
    Snapshot.create(spark, path, fixture(0 until 10), partitionCols = Seq("p"))
    Snapshot.setProperties(spark, path, Map("team.owner" -> "corpus"))
    Snapshot.createBranch(spark, path, "dev")
    val bPath = Snapshot.branchPath(path, "dev")
    Snapshot.append(spark, bPath, fixture(50 until 52))
    // metadata-only commits on the PARENT after the branch point
    Snapshot.addConstraint(spark, path, "v_nonneg", "v >= 0")
    Snapshot.setProperties(spark, path, Map("retention.days" -> "30"))
    // and a branch-side property change on a DIFFERENT key
    Snapshot.setProperties(spark, bPath, Map("build.note" -> "nightly-42"))
    Snapshot.mergeBranch(spark, path, "dev")
    val m = Snapshot.latestManifest(spark, path).get
    assert(m.constraints.get("v_nonneg").contains("v >= 0"),
      "parent's post-branch CHECK constraint must survive the merge")
    assert(m.properties.get("retention.days").contains("30"),
      "parent's post-branch property must survive the merge")
    assert(m.properties.get("build.note").contains("nightly-42"),
      "branch-side property must survive too")
    assert(m.properties.get("team.owner").contains("corpus"))
    // the carried-through constraint ENFORCES on the merged table
    intercept[IllegalArgumentException](Snapshot.append(spark, path,
      Seq((99L, "odd", -1L)).toDF("id", "p", "v")))
  }

  test("the same metadata key changed differently on both sides refuses loudly") {
    val path = tmp("meta-conflict")
    Snapshot.create(spark, path, fixture(0 until 6), partitionCols = Seq("p"))
    Snapshot.setProperties(spark, path, Map("quality.bar" -> "baseline"))
    Snapshot.createBranch(spark, path, "dev")
    val bPath = Snapshot.branchPath(path, "dev")
    Snapshot.append(spark, bPath, fixture(50 until 52))
    Snapshot.setProperties(spark, path, Map("quality.bar" -> "strict"))
    Snapshot.setProperties(spark, bPath, Map("quality.bar" -> "lenient"))
    val e = intercept[IllegalArgumentException](Snapshot.mergeBranch(spark, path, "dev"))
    assert(e.getMessage.contains("quality.bar") && e.getMessage.contains("BOTH"),
      e.getMessage)
    // the refusal left both sides readable (dirs moved back)
    assert(Snapshot.read(spark, bPath).count() == 8)
    assert(Snapshot.read(spark, path).count() == 6)
    // resolving ON THE BRANCH (adopting the parent's value) unblocks
    Snapshot.setProperties(spark, bPath, Map("quality.bar" -> "strict"))
    Snapshot.mergeBranch(spark, path, "dev")
    assert(Snapshot.latestManifest(spark, path).get
      .properties.get("quality.bar").contains("strict"))
  }

  test("a failure AFTER the merge commit must not rename the moved dirs back") {
    val path = tmp("post-commit-fail")
    Snapshot.create(spark, path, fixture(0 until 10), partitionCols = Seq("p"))
    Snapshot.createBranch(spark, path, "dev")
    val bPath = Snapshot.branchPath(path, "dev")
    Snapshot.append(spark, bPath, fixture(50 until 55))
    // inject a crash in the commit→cleanup window (stands in for the
    // branch-dir delete throwing): the parent manifest has ALREADY
    // committed referencing the moved dirs under the parent root, so
    // the catch-all undo renaming them back would strand a committed
    // table with unreadable file refs
    var fired = false
    Snapshot.faultHook = stage => if (stage == "merge-branch-committed" && !fired) {
      fired = true
      throw new RuntimeException("injected post-commit failure")
    }
    val e = try intercept[RuntimeException](Snapshot.mergeBranch(spark, path, "dev"))
    finally Snapshot.faultHook = _ => ()
    assert(fired && e.getMessage.contains("injected"), e.getMessage)
    // the COMMITTED parent stays fully readable — branch rows included
    assert(rows(Snapshot.read(spark, path)) ==
      rows(fixture(0 until 10)) ++ rows(fixture(50 until 55)))
    // the branch record retired with the commit; the leftover branch
    // husk (the delete never ran) is invisible to the parent
    assert(Snapshot.latestManifest(spark, path).get.branches.isEmpty)
  }
}
