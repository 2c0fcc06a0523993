package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.operators.Dedup

class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  test("hash32 matches the md5-prefix contract") {
    // md5('hello') = 5d41402a... → 0x5d41402a = 1564557354
    val v = spark.range(1).select(TextFns.hash32(lit("hello"))).as[Long].head()
    assert(v == 1564557354L)
  }

  test("fused token-hash pass equals the composed split+hash32 path, multiset preserved") {
    graft.expressions.GraftFunctions.register(spark)
    val docs = Seq("a b c", "a a b", "", "solo", "x  y") // repeats + empty tokens
    val df = docs.toDF("text")
    val fused = df.select(call_function("graft_token_hashes", $"text")).as[Seq[Long]].collect()
    val composed = df.select(transform(TextFns.tokens($"text"), t => TextFns.hash32(t)))
      .as[Seq[Long]].collect()
    assert(fused.toSeq == composed.toSeq)
    // and simhashText equals simhash32(tokens(...)) on the real corpus
    val d = sf().documents.limit(200)
    val both = d.select(
      TextFns.simhashText($"text").as("a"),
      TextFns.simhash32(TextFns.tokens($"text")).as("b"))
    assert(both.where($"a" =!= $"b").isEmpty)
  }

  test("wordShingles: distinct k-grams, short docs collapse to one shingle") {
    val df = Seq("a b c d", "a b").toDF("text")
    val out = df.select(TextFns.wordShingles(TextFns.tokens($"text"), 3)).as[Seq[String]].collect()
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1) == Seq("a b"))
  }

  test("exact dedup keeps the min-id row per content") {
    val df = Seq((3L, "same"), (1L, "same"), (2L, "other")).toDF("doc_id", "text")
    val kept = Dedup.exact(df, "text", "doc_id").select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 2L))
  }

  test("exact dedup is deterministic when (text, id) ties differ in other columns") {
    // two rows share (text, doc_id) but carry different payloads: the
    // keeper must be the SAME row across runs and partitionings (the
    // full-row fingerprint tiebreak), never an arbitrary tied row
    val rows = Seq((1L, "same", "alpha"), (1L, "same", "beta"),
      (1L, "same", "gamma"), (2L, "other", "x"))
    def run(parts: Int): Set[(Long, String, String)] =
      Dedup.exact(rows.toDF("doc_id", "text", "payload").repartition(parts),
        "text", "doc_id")
        .as[(Long, String, String)].collect().toSet
    val a = run(1)
    assert(a == run(7) && a == run(32), "keeper must not depend on partitioning")
    assert(a.count(_._2 == "same") == 1 && a.contains((2L, "other", "x")))
  }

  test("chunkDedup: first corpus-wide occurrence wins, boundaries exact, short docs whole") {
    // doc 1: 5 tokens (one short chunk); doc 2 repeats doc 1's chunk
    // INSIDE a longer doc at a chunk boundary; doc 3 repeats its own
    // first chunk as its second
    val df = Seq(
      (1L, "a b c"),
      (2L, "a b c x y z"),                    // chunk0 = "a b c x y z"... (6 tokens, one chunk at k=3? no)
      (3L, "p q r p q r")
    ).toDF("doc_id", "text")
    val out = Dedup.chunkDedup(df, "doc_id", "text", chunkTokens = 3)
      .select("id", "chunk_no", "chunk", "n_tokens", "keep")
      .as[(Long, Long, String, Int, Boolean)].collect()
      .sortBy(r => (r._1, r._2))
    assert(out.map(r => (r._1, r._2, r._3)).toSeq == Seq(
      (1L, 0L, "a b c"),
      (2L, 0L, "a b c"), (2L, 1L, "x y z"),
      (3L, 0L, "p q r"), (3L, 1L, "p q r")))
    // keepers: doc1 chunk0 beats doc2 chunk0 (same text, smaller id);
    // doc3's self-repeat keeps only the first occurrence
    assert(out.map(r => (r._1, r._2) -> ((r._4, r._5))).toMap == Map(
      (1L, 0L) -> ((3, true)),
      (2L, 0L) -> ((3, false)), (2L, 1L) -> ((3, true)),
      (3L, 0L) -> ((3, true)), (3L, 1L) -> ((3, false))))
    // a trailing short chunk carries its true token count
    val short = Dedup.chunkDedup(Seq((9L, "one two three four")).toDF("doc_id", "text"),
      "doc_id", "text", chunkTokens = 3)
      .select("chunk_no", "n_tokens").as[(Long, Int)].collect().sortBy(_._1)
    assert(short.toSeq == Seq((0L, 3), (1L, 1)))
  }

  test("cdcChunkDedup catches an offset-shifted passage that fixed windows provably miss") {
    // doc 1 is a 40-token passage P; doc 2 carries a 3-token banner
    // BEFORE the same P. Fixed 10-token windows: P's windows in doc 2
    // start 3 tokens later, so (all tokens being position-distinct) NO
    // window text repeats across docs. Content-defined boundaries
    // depend only on adjacent-token 2-grams, so P's interior
    // boundaries are identical in both docs and its interior chunks
    // dedup across them.
    val p = (0 until 40).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, p), (2L, s"ban0 ban1 ban2 $p")).toDF("doc_id", "text")
    def crossDocDups(out: org.apache.spark.sql.DataFrame): Long =
      out.where(!col("keep")).join(
        out.where(col("keep")).select(col("chunk"), col("id").as("keep_id")), "chunk")
        .where(col("id") =!= col("keep_id")).count()
    val fixed = Dedup.chunkDedup(docs, "doc_id", "text", chunkTokens = 10)
    assert(crossDocDups(fixed) == 0,
      "fixed windows must miss the shifted passage (the failure mode under test)")
    val cdc = Dedup.cdcChunkDedup(docs, "doc_id", "text", divisor = 4)
    assert(crossDocDups(cdc) > 0,
      "content-defined boundaries must catch the shifted passage's interior chunks")
    // rebuild invariant: per doc, chunks re-concatenate to the text
    val rebuilt = cdc.groupBy("id")
      .agg(concat_ws(" ", array_sort(collect_list(struct(col("chunk_no"), col("chunk"))))
        .getField("chunk")).as("re"))
      .join(docs, col("id") === col("doc_id"))
    assert(rebuilt.where(col("re") =!= col("text")).isEmpty,
      "CDC chunks must partition the document exactly")
  }

  test("cdcChunkNearDupPairs catches an EDITED shifted passage exact chunk dedup misses") {
    // doc 1 is a 40-token passage P; doc 2 carries a banner before P
    // with ONE interior token edited. The exact tier (cdcChunkDedup)
    // dedups P's unedited interior chunks across the docs, but the
    // chunk containing the edit survives in BOTH docs as distinct
    // text — only the fuzzy tier can pair it. bands=16 × rows=1 makes
    // the LSH catch probability 1-(1-J)^16 (fixture-deterministic).
    val p = (0 until 40).map(i => s"tok$i").mkString(" ")
    val edited = p.replace("tok20", "EDITED")
    val docs = Seq((1L, p), (2L, s"ban0 ban1 ban2 $edited"),
      (3L, (100 until 140).map(i => s"other$i").mkString(" "))).toDF("doc_id", "text")
    val pairs = Dedup.cdcChunkNearDupPairs(docs, "doc_id", "text",
      divisor = 16, minTokens = 4, k = 3, bands = 16, rowsPerBand = 1,
      minJaccard = 0.5).collect()
    // invariants: verified threshold, unpacked ids ordered, no self-pairs
    assert(pairs.forall(r => r.getDouble(4) >= 0.5 && r.getDouble(4) <= 1.0))
    assert(pairs.forall(r =>
      r.getLong(0) * 128 + r.getLong(1) < r.getLong(2) * 128 + r.getLong(3)))
    // the edited chunk pairs doc 1 against doc 2 at jaccard < 1
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(2) == 2L &&
      r.getDouble(4) < 1.0),
      s"expected a (1,2) near-dup chunk pair, got ${pairs.mkString("; ")}")
    // the unrelated doc 3 pairs with nothing
    assert(!pairs.exists(r => r.getLong(0) == 3L || r.getLong(2) == 3L))
  }

  test("minhashLshPairs maxBucket valve drops only the hot bucket's candidates") {
    // 6 identical docs form a 6-member bucket in EVERY band (the
    // boilerplate-skew shape); a 2-member planted pair stays under any
    // reasonable cap. Identical texts make every LSH catch
    // deterministic.
    val hot = (1L to 6L).map(i => (i, "same same same text here okay fine"))
    val planted = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"),
      (11L, "alpha beta gamma delta epsilon zeta"))
    val docs = (hot ++ planted).toDF("doc_id", "text")
    def pairs(cap: Long) =
      Dedup.minhashLshPairs(docs, "doc_id", "text", k = 3, bands = 4,
        rowsPerBand = 4, minJaccard = 0.9, maxBucket = cap)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val open = pairs(Long.MaxValue)
    assert(open.count(p => p._1 <= 6 && p._2 <= 6) == 15, s"15 hot pairs: $open")
    assert(open.contains((10L, 11L)))
    val capped = pairs(5L)
    assert(capped == Set((10L, 11L)),
      s"the cap must drop exactly the hot bucket's pairs: $capped")
  }

  test("jaccardPairs finds near-identical docs and scores them correctly") {
    val df = Seq(
      (1L, "w1 w2 w3 w4 w5 w6"),
      (2L, "w1 w2 w3 w4 w5 w7"),  // shares 3 of the union's 5+... shingles
      (3L, "x1 x2 x3 x4 x5 x6")).toDF("doc_id", "text")
    val pairs = Dedup.jaccardPairs(df, "doc_id", "text", k = 3, minJaccard = 0.3)
      .as[(Long, Long, Double)].collect()
    assert(pairs.length == 1)
    val (a, b, j) = pairs.head
    assert((a, b) == (1L, 2L))
    // shingles: doc1 {123,234,345,456}, doc2 {123,234,345,457} → 3/5
    assert(math.abs(j - 0.6) < 1e-12)
  }

  test("simhash byte banding finds exactly the pairs a cross join would") {
    val docs = sf().documents.limit(200)
    val viaBands = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sig = docs.select($"doc_id", TextFns.simhash32(TextFns.tokens($"text")).as("sim"))
    val naive = sig.as("a").join(sig.as("b"), $"a.doc_id" < $"b.doc_id")
      .where(bit_count($"a.sim".bitwiseXOR($"b.sim")) <= 3)
      .select($"a.doc_id", $"b.doc_id").as[(Long, Long)].collect().toSet
    assert(viaBands == naive)
  }

  test("minhash LSH recovers the planted near-dup pairs of the corpus") {
    val truth = Dedup.jaccardPairs(sf().documents, "doc_id", "text", 3, 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLshPairs(sf().documents, "doc_id", "text", 3,
        bands = 4, rowsPerBand = 4, minJaccard = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty)
    assert(lsh == truth) // at j>=0.9, P(no band collision) ≈ (1-0.9^4)^4 < 2%o per pair
  }

  test("langId picks the language with most marker hits, und when none") {
    val df = Seq("the cat and the dog", "der hund und die katze", "xyzzy plugh").toDF("text")
    val out = df.select(TextFns.langId(TextFns.tokens($"text"))).as[String].collect()
    assert(out.toSeq == Seq("en", "de", "und"))
  }

  test("jaccardPairs inverted index equals naive all-pairs on random corpora") {
    val words = Vector("a","b","c","d","e","f","g","h")
    val rng = new scala.util.Random(7)
    val docs = (0L until 60L).map { i =>
      (i, Seq.fill(4 + rng.nextInt(12))(words(rng.nextInt(words.size))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val fast = Dedup.jaccardPairs(df, "doc_id", "text", k = 2, minJaccard = 0.3)
      .as[(Long, Long, Double)].collect().map { case (a, b, j) => (a, b, math.round(j * 1e9)) }.toSet
    // naive reference: all pairs over shingle sets computed in Scala
    def sh(t: String): Set[String] = {
      val toks = t.split(" ", -1)
      if (toks.length >= 2) toks.sliding(2).map(_.mkString(" ")).toSet else Set(t)
    }
    val naive = (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      sa = sh(ta); sb = sh(tb)
      inter = (sa & sb).size
      j = inter.toDouble / (sa.size + sb.size - inter)
      if j >= 0.3
    } yield (ia, ib, math.round(j * 1e9))).toSet
    assert(fast == naive)
    assert(naive.nonEmpty)
  }

  test("containmentPairs finds a short doc subsumed in a long one where jaccard cannot") {
    import spark.implicits._
    val fragment = "the quick brown fox jumps over the lazy dog"
    val article = (1 to 40).map(i => s"filler sentence number $i with unique words w$i x$i")
      .mkString(" ") + " " + fragment
    val df = Seq((1L, fragment), (2L, article), (3L, "entirely different text about ships"))
      .toDF("doc_id", "text")
    val cont = graft.operators.Dedup.containmentPairs(df, "doc_id", "text", k = 3,
      minContainment = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(cont == Set((1L, 2L)), s"fragment must be found contained: $cont")
    // the same pair is invisible to a jaccard threshold: union ≈ article
    val jac = graft.operators.Dedup.jaccardPairs(df, "doc_id", "text", k = 3,
      minJaccard = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(jac.isEmpty, s"jaccard should miss the subsumed fragment: $jac")
  }
}
