package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{CommitGroup, Snapshot}
import graft.operators.CommitGroup.GroupWrite

/** Multi-table atomic publish: a commit group stages every table's
  * manifest invisibly, then ONE marker commit flips the whole tick —
  * readers resolve all-old before the marker and all-new after it,
  * never a mixed tick, whatever instant the coordinator dies at.
  */
class CommitGroupSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-group-$tag").toString

  private def n(path: String): Long = Snapshot.read(spark, path).count()

  test("a two-table tick publishes atomically; both advance exactly one version") {
    val root = tmp("basic")
    val (t1, t2) = (s"$root/t1", s"$root/t2")
    Snapshot.create(spark, t1, Seq((1L, 10L)).toDF("id", "v"))
    Snapshot.create(spark, t2, Seq((1L, "a")).toDF("id", "s"))
    val v1 = Snapshot.latestVersion(spark, t1).get
    val v2 = Snapshot.latestVersion(spark, t2).get
    CommitGroup.publish(spark, root, Seq(
      GroupWrite(t1, sp => Snapshot.append(sp, t1, Seq((2L, 20L)).toDF("id", "v"))),
      GroupWrite(t2, sp => Snapshot.overwrite(sp, t2,
        Seq((1L, "a"), (2L, "b")).toDF("id", "s")))))
    assert(n(t1) == 2 && n(t2) == 2)
    assert(Snapshot.latestVersion(spark, t1).get == v1 + 1)
    assert(Snapshot.latestVersion(spark, t2).get == v2 + 1)
    // the published manifests read like any other commit (history, ops)
    assert(Snapshot.latestManifest(spark, t1).get.operation.nonEmpty)
    // normal writes keep working after the group
    Snapshot.append(spark, t1, Seq((3L, 30L)).toDF("id", "v"))
    assert(n(t1) == 3)
  }

  test("a crash BEFORE the marker publishes NOTHING; the slot frees after grace") {
    val root = tmp("pre-marker")
    val (t1, t2) = (s"$root/t1", s"$root/t2")
    Snapshot.create(spark, t1, Seq((1L, 10L)).toDF("id", "v"))
    Snapshot.create(spark, t2, Seq((1L, 10L)).toDF("id", "v"))
    // hard coordinator death AFTER both stages, BEFORE the marker (the
    // seam sits outside the abort-on-stage-failure catch, so no abort
    // marker is written — exactly a process kill)
    Snapshot.faultHook = stage =>
      if (stage == "group-staged") throw new RuntimeException("killed")
    val e = try intercept[RuntimeException](CommitGroup.publish(spark, root, Seq(
      GroupWrite(t1, sp => Snapshot.append(sp, t1, Seq((2L, 20L)).toDF("id", "v"))),
      GroupWrite(t2, sp => Snapshot.append(sp, t2, Seq((2L, 20L)).toDF("id", "v"))))))
    finally Snapshot.faultHook = _ => ()
    assert(e.getMessage == "killed")
    // ALL-OLD: neither table shows the tick
    assert(n(t1) == 1 && n(t2) == 1)
    // within the grace window the staged slots hold: a writer conflicts
    spark.conf.set("spark.graft.group.pendingGraceMs", Long.MaxValue.toString)
    try intercept[Snapshot.CommitConflictException](
      Snapshot.append(spark, t1, Seq((9L, 90L)).toDF("id", "v")))
    finally spark.conf.unset("spark.graft.group.pendingGraceMs")
    // past the grace window the first writer ABORTS the crashed group
    // and proceeds; the tick's rows never appear
    spark.conf.set("spark.graft.group.pendingGraceMs", "0")
    try {
      Snapshot.append(spark, t1, Seq((3L, 30L)).toDF("id", "v"))
      Snapshot.append(spark, t2, Seq((3L, 30L)).toDF("id", "v"))
    } finally spark.conf.unset("spark.graft.group.pendingGraceMs")
    assert(Snapshot.read(spark, t1).select("id").as[Long].collect().toSet == Set(1L, 3L))
    assert(Snapshot.read(spark, t2).select("id").as[Long].collect().toSet == Set(1L, 3L))
  }

  test("a crash AFTER the marker publishes EVERYTHING: readers roll the tick forward lazily") {
    val root = tmp("post-marker")
    val (t1, t2) = (s"$root/t1", s"$root/t2")
    Snapshot.create(spark, t1, Seq((1L, 10L)).toDF("id", "v"))
    Snapshot.create(spark, t2, Seq((1L, 10L)).toDF("id", "v"))
    Snapshot.faultHook = stage =>
      if (stage == "group-marker-committed") throw new RuntimeException("killed")
    val e = try intercept[RuntimeException](CommitGroup.publish(spark, root, Seq(
      GroupWrite(t1, sp => Snapshot.append(sp, t1, Seq((2L, 20L)).toDF("id", "v"))),
      GroupWrite(t2, sp => Snapshot.append(sp, t2, Seq((2L, 20L)).toDF("id", "v"))))))
    finally Snapshot.faultHook = _ => ()
    assert(e.getMessage == "killed")
    // ALL-NEW: the marker is the commit point; no coordinator needed
    // for visibility — plain reads resolve the staged slots
    assert(n(t2) == 2, "second table must read NEW without any coordinator help")
    assert(n(t1) == 2)
    // and history is ordinary afterwards
    assert(Snapshot.latestManifest(spark, t1).get.version == 2)
    Snapshot.append(spark, t2, Seq((3L, 30L)).toDF("id", "v"))
    assert(n(t2) == 3)
  }

  test("a stage failure aborts the group eagerly; staged siblings vanish at once") {
    val root = tmp("stage-fail")
    val (t1, t2) = (s"$root/t1", s"$root/t2")
    Snapshot.create(spark, t1, Seq((1L, 10L)).toDF("id", "v"))
    Snapshot.create(spark, t2, Seq((1L, 5L)).toDF("id", "v"))
    Snapshot.addConstraint(spark, t2, "v_pos", "v >= 0") // second write will refuse
    intercept[Exception](CommitGroup.publish(spark, root, Seq(
      GroupWrite(t1, sp => Snapshot.append(sp, t1, Seq((2L, 20L)).toDF("id", "v"))),
      GroupWrite(t2, sp => Snapshot.append(sp, t2, Seq((2L, -20L)).toDF("id", "v"))))))
    // nothing published, and t1's staged slot was aborted EAGERLY —
    // the very next write takes the slot with no grace wait
    assert(n(t1) == 1 && Snapshot.read(spark, t2).count() == 1)
    Snapshot.append(spark, t1, Seq((3L, 30L)).toDF("id", "v"))
    assert(Snapshot.read(spark, t1).select("id").as[Long].collect().toSet == Set(1L, 3L))
  }

  test("catalog-route SQL writes participate in a commit group") {
    val wh = tmp("catalog")
    spark.conf.set("spark.sql.catalog.gcg", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcg.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcg.db")
    spark.sql("CREATE TABLE gcg.db.t1 (id BIGINT, v BIGINT)")
    spark.sql("CREATE TABLE gcg.db.t2 (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO gcg.db.t1 VALUES (1, 10)")
    spark.sql("INSERT INTO gcg.db.t2 VALUES (1, 10)")
    // the tick: plain spark.sql DML against catalog names, grouped —
    // commits stage on the driver thread through the one manifest
    // funnel, so ANY writer family can ride a group
    CommitGroup.publish(spark, wh, Seq(
      GroupWrite(s"$wh/db/t1", sp => { sp.sql("INSERT INTO gcg.db.t1 VALUES (2, 20)"); () }),
      GroupWrite(s"$wh/db/t2", sp => { sp.sql("UPDATE gcg.db.t2 SET v = 99 WHERE id = 1"); () })))
    assert(spark.sql("SELECT count(*) AS n FROM gcg.db.t1").as[Long].head() == 2L)
    assert(spark.sql("SELECT v FROM gcg.db.t2 WHERE id = 1").as[Long].head() == 99L)
    // and a killed grouped SQL tick stays invisible on BOTH tables
    Snapshot.faultHook = stage =>
      if (stage == "group-staged") throw new RuntimeException("killed")
    try intercept[RuntimeException](CommitGroup.publish(spark, wh, Seq(
      GroupWrite(s"$wh/db/t1", sp => { sp.sql("INSERT INTO gcg.db.t1 VALUES (3, 30)"); () }),
      GroupWrite(s"$wh/db/t2", sp => { sp.sql("UPDATE gcg.db.t2 SET v = 7 WHERE id = 1"); () }))))
    finally Snapshot.faultHook = _ => ()
    assert(spark.sql("SELECT count(*) AS n FROM gcg.db.t1").as[Long].head() == 2L)
    assert(spark.sql("SELECT v FROM gcg.db.t2 WHERE id = 1").as[Long].head() == 99L)
  }

  test("multi-commit maintenance refuses inside a group instead of wedging half-staged") {
    val root = tmp("guard")
    val t1 = s"$root/t1"
    Snapshot.create(spark, t1, Seq((1L, 10L)).toDF("id", "v"))
    // each of these commits more than once (or reads back its own
    // commit) — inside a group their follow-up reads would not see
    // their own staged commits, so they refuse up front
    def refused(w: org.apache.spark.sql.SparkSession => Unit): Unit = {
      val e = intercept[IllegalArgumentException](
        CommitGroup.publish(spark, root, Seq(GroupWrite(t1, w))))
      assert(e.getMessage.contains("commit group"), e.getMessage)
      // the failed group aborted eagerly: a plain write proceeds at once
      Snapshot.append(spark, t1, Seq((99L, 1L)).toDF("id", "v"))
    }
    refused(sp => Snapshot.createBranch(sp, t1, "dev"))
    refused(sp => Snapshot.vacuum(sp, t1, keepVersions = 1))
    refused(sp => graft.operators.MatView.create(sp, s"$root/mv",
      "SELECT v, COUNT(*) AS n FROM t GROUP BY v", _ => t1))
    // single-commit writers (append, overwrite, DML, compact) still group
    CommitGroup.publish(spark, root, Seq(
      GroupWrite(t1, sp => { Snapshot.compact(sp, t1, minFiles = 1); () })))
    assert(Snapshot.latestManifest(spark, t1).get.operation.nonEmpty)
  }

  test("vacuum resolves stranded staged slots on its sweep") {
    val root = tmp("vacuum")
    val t1 = s"$root/t1"
    Snapshot.create(spark, t1, Seq((1L, 10L)).toDF("id", "v"))
    Snapshot.faultHook = stage =>
      if (stage == "group-staged") throw new RuntimeException("killed")
    try intercept[RuntimeException](CommitGroup.publish(spark, root, Seq(
      GroupWrite(t1, sp => Snapshot.append(sp, t1, Seq((2L, 20L)).toDF("id", "v"))))))
    finally Snapshot.faultHook = _ => ()
    spark.conf.set("spark.graft.group.pendingGraceMs", "0")
    try Snapshot.vacuum(spark, t1, keepVersions = 10, orphanGraceMs = Long.MaxValue / 2)
    finally spark.conf.unset("spark.graft.group.pendingGraceMs")
    // the stranded slot is gone: the next writer lands immediately even
    // under an infinite grace window
    spark.conf.set("spark.graft.group.pendingGraceMs", Long.MaxValue.toString)
    try Snapshot.append(spark, t1, Seq((3L, 30L)).toDF("id", "v"))
    finally spark.conf.unset("spark.graft.group.pendingGraceMs")
    assert(Snapshot.read(spark, t1).select("id").as[Long].collect().toSet == Set(1L, 3L))
  }

  test("tick-pinned reads resolve every member through one marker; non-members refuse") {
    val root = tmp("tick-read")
    val (a, b, c) = (s"$root/a", s"$root/b", s"$root/c")
    Snapshot.create(spark, a, Seq((1L, 0L)).toDF("id", "tick"))
    Snapshot.create(spark, b, Seq((1L, 0L)).toDF("id", "tick"))
    Snapshot.create(spark, c, Seq((1L, 0L)).toDF("id", "tick"))
    def tickWrite(t: String, i: Long) = GroupWrite(t,
      sp => Snapshot.overwrite(sp, t, Seq((1L, i)).toDF("id", "tick")))
    val mk1 = CommitGroup.publish(spark, root, Seq(tickWrite(a, 1), tickWrite(b, 1)))
    val mk2 = CommitGroup.publish(spark, root, Seq(tickWrite(a, 2), tickWrite(b, 2)))
    // newest committed tick (latest returns the qualified form)
    assert(CommitGroup.latest(spark, root).exists(_.endsWith(mk2)))
    // readAt pins BOTH members to the older tick even though HEAD moved
    assert(CommitGroup.readAt(spark, mk1, a).select("tick").as[Long].head() == 1L)
    assert(CommitGroup.readAt(spark, mk1, b).select("tick").as[Long].head() == 1L)
    // the SQL spelling rides the one version-spec funnel on the
    // registry route: a two-table join pinned to one tick
    val reg = Map("ta" -> a, "tb" -> b)
    val joined = Snapshot.sqlQuery(spark,
      s"""SELECT ta.tick AS at, tb.tick AS bt
         |FROM ta VERSION AS OF 'tick:$mk1' ta
         |JOIN tb VERSION AS OF 'tick:$mk1' tb ON ta.id = tb.id""".stripMargin, reg)
    assert(joined.as[(Long, Long)].head() == ((1L, 1L)))
    // tick-latest resolves through the NEWEST committed marker
    assert(Snapshot.sqlQuery(spark,
      s"SELECT tick FROM ta VERSION AS OF 'tick-latest:$root' ta", reg)
      .as[Long].head() == 2L)
    // a table the tick never wrote refuses loudly — resolving it
    // through this marker would silently mix ticks
    val e = intercept[IllegalArgumentException](CommitGroup.readAt(spark, mk1, c))
    assert(e.getMessage.contains("not a member"), e.getMessage)
  }

  test("a mid-read tick flip mixes unpinned sequential reads; the pinned read never mixes") {
    val root = tmp("tick-flip")
    val (a, b) = (s"$root/a", s"$root/b")
    Snapshot.create(spark, a, Seq((1L, 0L)).toDF("id", "tick"))
    Snapshot.create(spark, b, Seq((1L, 0L)).toDF("id", "tick"))
    def tick(i: Long) = Seq(
      GroupWrite(a, sp => Snapshot.overwrite(sp, a, Seq((1L, i)).toDF("id", "tick"))),
      GroupWrite(b, sp => Snapshot.overwrite(sp, b, Seq((1L, i)).toDF("id", "tick"))))
    CommitGroup.publish(spark, root, tick(1))
    // the consumer shape: read A, then B — with a tick landing BETWEEN
    // the two reads (deterministic interleave, no sleeps)
    val unpinnedA = Snapshot.read(spark, a).select("tick").as[Long].head()
    val mkPin = CommitGroup.latest(spark, root).get
    val pinnedA = CommitGroup.readAt(spark, mkPin, a).select("tick").as[Long].head()
    CommitGroup.publish(spark, root, tick(2)) // the flip
    val unpinnedB = Snapshot.read(spark, b).select("tick").as[Long].head()
    val pinnedB = CommitGroup.readAt(spark, mkPin, b).select("tick").as[Long].head()
    // the hazard is REAL: unpinned sequential reads straddle the ticks
    assert(unpinnedA == 1L && unpinnedB == 2L, "expected the unpinned mix")
    // the pinned read never mixes, whatever lands between its reads
    assert(pinnedA == 1L && pinnedB == 1L)
  }

  test("tick reads survive a coordinator crash before roll-forward") {
    val root = tmp("tick-crash")
    val (a, b) = (s"$root/a", s"$root/b")
    Snapshot.create(spark, a, Seq((1L, 0L)).toDF("id", "tick"))
    Snapshot.create(spark, b, Seq((1L, 0L)).toDF("id", "tick"))
    Snapshot.faultHook = stage =>
      if (stage == "group-marker-committed") throw new RuntimeException("killed")
    try intercept[RuntimeException](CommitGroup.publish(spark, root, Seq(
      GroupWrite(a, sp => Snapshot.overwrite(sp, a, Seq((1L, 1L)).toDF("id", "tick"))),
      GroupWrite(b, sp => Snapshot.overwrite(sp, b, Seq((1L, 1L)).toDF("id", "tick"))))))
    finally Snapshot.faultHook = _ => ()
    // the marker landed, so the tick IS committed: a consumer that
    // finds it must read both members at the new versions even though
    // nothing rolled the staged slots forward yet
    val mk = CommitGroup.latest(spark, root).get
    assert(CommitGroup.readAt(spark, mk, a).select("tick").as[Long].head() == 1L)
    assert(CommitGroup.readAt(spark, mk, b).select("tick").as[Long].head() == 1L)
  }

  test("a reader's roll-forward racing a plain commit never loses the committed group") {
    // the local-FS hazard: rename OVERWRITES, so a resolver flipping a
    // committed `.grp` to the plain name in the window between a plain
    // committer's exists checks and its rename would be silently
    // clobbered — a torn tick. Both now hold the same per-table lock;
    // this hammers the window and asserts no group row is ever lost.
    val root = tmp("race")
    val t1 = s"$root/t1"
    Snapshot.create(spark, t1, Seq((0L, 0L)).toDF("id", "v"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      (1 to 8).foreach { i =>
        // stage a committed-but-unresolved group (crash after marker)
        Snapshot.faultHook = stage =>
          if (stage == "group-marker-committed") throw new RuntimeException("killed")
        try intercept[RuntimeException](CommitGroup.publish(spark, root, Seq(
          GroupWrite(t1, sp => Snapshot.append(sp, t1,
            Seq((1000L + i, 1L)).toDF("id", "v"))))))
        finally Snapshot.faultHook = _ => ()
        // race: a reader resolving the staged slot vs a plain append
        val read = pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = Snapshot.read(spark, t1).count()
        })
        val write = pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = Snapshot.append(spark, t1,
            Seq((2000L + i, 2L)).toDF("id", "v"))
        })
        read.get(); write.get()
        val ids = Snapshot.read(spark, t1).select("id")
          .as[Long].collect().toSet
        assert(ids.contains(1000L + i), s"round $i: group row lost — torn tick")
        assert(ids.contains(2000L + i), s"round $i: plain append lost")
      }
    } finally pool.shutdown()
  }
}
