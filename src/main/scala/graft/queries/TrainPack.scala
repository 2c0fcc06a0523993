package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFns

/** Training-corpus preparation operators beyond cleaning: PII
  * redaction, deterministic dataset splits, per-source token budgets,
  * multi-grain rollups.
  */
object TrainPack extends QueryPack {

  private[queries] val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[queries] val phoneRe = "\\+?[0-9][0-9 -]{7,}[0-9]"

  val q45 = QueryDef(
    "q45_pii_redaction",
    Some(s"""SELECT doc_id,
            |  regexp_replace(regexp_replace(text, '$emailRe', '<EMAIL>', 'g'),
            |                 '$phoneRe', '<PHONE>', 'g') AS redacted,
            |  length(text) - length(regexp_replace(text, '$emailRe', '<EMAIL>', 'g'))
            |    AS delta_email
            |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin)) { t =>
    // PII scrubbing: email/phone patterns → typed placeholder tokens —
    // the standard pre-training redaction pass (regex-only: synthetic
    // corpus has no PII, the operator and its determinism are under
    // test).
    t.documents.where(col("doc_id") < 100)
      .select(
        col("doc_id"),
        regexp_replace(regexp_replace(col("text"), emailRe, "<EMAIL>"), phoneRe, "<PHONE>")
          .as("redacted"),
        (length(col("text")) -
          length(regexp_replace(col("text"), emailRe, "<EMAIL>"))).as("delta_email"))
      .orderBy("doc_id")
  }

  val q46 = QueryDef(
    "q46_train_split",
    Some(s"""WITH b AS (
            |  SELECT doc_id, lang,
            |    CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 AS bucket
            |  FROM documents
            |)
            |SELECT CASE WHEN bucket < 80 THEN 'train'
            |            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
            |       lang, COUNT(*) AS n
            |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)) { t =>
    // Deterministic 80/10/10 split by content-stable hash — rerunnable,
    // join-free, and identical on any engine (vs rand() splits that
    // shuffle membership every run).
    val bucket = TextFns.hash32(concat(lit("split:"), col("doc_id").cast("string"))) % 100
    t.documents.select(
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").as("split"),
        col("lang"))
      .groupBy("split", "lang").agg(count(lit(1)).as("n"))
      .orderBy("split", "lang")
  }

  val q47 = QueryDef(
    "q47_token_budget_cap",
    Some("""WITH toks AS (
           |  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens FROM documents
           |), ranked AS (
           |  SELECT doc_id, source, n_tokens,
           |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
           |                        ROWS UNBOUNDED PRECEDING) AS cum_tokens
           |  FROM toks
           |)
           |SELECT source, COUNT(*) AS docs_kept, CAST(SUM(n_tokens) AS BIGINT) AS tokens_kept
           |FROM ranked WHERE cum_tokens <= 800
           |GROUP BY source ORDER BY source""".stripMargin)) { t =>
    // Per-source token budget: keep docs (in deterministic id order)
    // until the source's running token count exceeds the cap — the
    // corpus-mixing operator of LLM data pipelines, as a cumulative
    // window.
    val toks = t.documents.select(col("doc_id"), col("source"),
      size(TextFns.tokens(col("text"))).as("n_tokens"))
    val w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    toks.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .where(col("cum_tokens") <= 800)
      .groupBy("source")
      .agg(count(lit(1)).as("docs_kept"), sum(col("n_tokens")).as("tokens_kept"))
      .orderBy("source")
  }

  val q48 = QueryDef(
    "q48_rollup_grains",
    Some("""SELECT coalesce(lang, 'ALL') AS lang, coalesce(source, 'ALL') AS source,
           |       COUNT(*) AS docs, CAST(SUM(n_chars) AS BIGINT) AS chars
           |FROM documents
           |GROUP BY ROLLUP(lang, source)
           |ORDER BY lang, source""".stripMargin)) { t =>
    // Multi-grain aggregation in ONE pass via ROLLUP — the Spark-first
    // collapse of the reference's parameterized periodo re-runs
    // (SURVEY.md §2.5 note): (lang, source), (lang), () grains together.
    t.documents
      .rollup("lang", "source")
      .agg(count(lit(1)).as("docs"), sum(col("n_chars")).as("chars"))
      .select(
        coalesce(col("lang"), lit("ALL")).as("lang"),
        coalesce(col("source"), lit("ALL")).as("source"),
        col("docs"), col("chars"))
      .orderBy("lang", "source")
  }

  /** Shared KMV sketch: bottom-16 hashed user ids per event_type with
    * the (k-1)·2³²/h_k estimator (q49 exposes the sketch, q61 compares
    * it to exact). NULL user_ids are excluded on BOTH engines — BottomK
    * skips nulls while DuckDB's DISTINCT would keep a NULL row, so the
    * guard keeps the two definitions aligned (and an all-null group
    * can't produce an empty sketch).
    */
  private def kmvSketch(t: graft.Tables) = {
    graft.expressions.GraftFunctions.register(t.spark)
    val h = TextFns.hash32(col("user_id").cast("string"))
    t.events.where(col("user_id").isNotNull)
      .select(col("event_type"), h.as("hv"))
      .groupBy("event_type")
      .agg(call_function("graft_bottomk", col("hv"), lit(16)).as("bottomk"))
  }
  private def kmvEstimate(bk: org.apache.spark.sql.Column) =
    ((size(bk) - 1).cast("double") * 4294967296.0) / element_at(bk, size(bk))
  private val kmvSketchSql =
    """h AS (
      |  SELECT DISTINCT event_type,
      |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT) AS hv
      |  FROM events WHERE user_id IS NOT NULL
      |)""".stripMargin

  val q49 = QueryDef(
    "q49_kmv_distinct_sketch",
    Some(s"""WITH $kmvSketchSql, r AS (
           |  SELECT event_type, hv,
           |    row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
           |  FROM h
           |)
           |SELECT event_type, min(hv) AS h_min, max(hv) AS h_k,
           |  (CAST(count(*) - 1 AS DOUBLE) * 4294967296.0) / max(hv) AS est_users
           |FROM r WHERE rn <= 16
           |GROUP BY event_type ORDER BY event_type""".stripMargin)) { t =>
    // KMV distinct sketch (expressions.BottomK, a TypedImperativeAggregate):
    // constant-space approximate distinct users whose bottom-k state is
    // exactly reproducible — the oracle recomputes the same k minima.
    // Estimate = (k-1) * 2^32 / kth_min.
    kmvSketch(t)
      .select(col("event_type"),
        element_at(col("bottomk"), 1).as("h_min"),
        element_at(col("bottomk"), size(col("bottomk"))).as("h_k"),
        kmvEstimate(col("bottomk")).as("est_users"))
      .orderBy("event_type")
  }

  val q50 = QueryDef(
    "q50_asof_join",
    Some("""WITH clicks AS (
           |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
           |), compras AS (
           |  SELECT user_id, ts, max(value) AS compra_valor FROM events
           |  WHERE event_type = 'purchase' GROUP BY 1, 2
           |)
           |SELECT c.event_id, c.user_id, c.ts, p.ts AS asof_ts, p.compra_valor AS asof_compra_valor
           |FROM clicks c ASOF LEFT JOIN compras p
           |  ON c.user_id = p.user_id AND p.ts <= c.ts
           |ORDER BY c.event_id""".stripMargin)) { t =>
    // As-of join (operators.AsOfJoin): each click gets the user's most
    // recent prior purchase — one shuffle via union + last-non-null
    // window, vs DuckDB's native ASOF LEFT JOIN as the oracle.
    val clicks = t.events.where(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val compras = t.events.where(col("event_type") === "purchase")
      .groupBy("user_id", "ts").agg(max(col("value")).as("compra_valor"))
    graft.operators.AsOfJoin.latestPriorTo(
        clicks, compras, key = "user_id", leftTs = "ts", rightTs = "ts",
        payload = Seq("compra_valor"))
      .select("event_id", "user_id", "ts", "asof_ts", "asof_compra_valor")
      .orderBy("event_id")
  }

  val q61 = QueryDef(
    "q61_kmv_vs_exact",
    Some(s"""WITH $kmvSketchSql, r AS (
           |  SELECT event_type, hv,
           |    row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
           |  FROM h
           |), sk AS (
           |  SELECT event_type,
           |    (CAST(count(*) - 1 AS DOUBLE) * 4294967296.0) / max(hv) AS est_users
           |  FROM r WHERE rn <= 16 GROUP BY 1
           |), ex AS (
           |  SELECT event_type, COUNT(DISTINCT user_id) AS users_exact FROM events
           |  WHERE user_id IS NOT NULL GROUP BY 1
           |)
           |SELECT ex.event_type AS event_type, users_exact, est_users,
           |       abs(est_users / users_exact - 1) < 0.5 AS dentro_margen
           |FROM ex JOIN sk ON ex.event_type = sk.event_type
           |ORDER BY 1""".stripMargin)) { t =>
    // A2's 100 TB opt-in, side by side with the exact it replaces: exact
    // COUNT(DISTINCT) shuffles every distinct user per group; the
    // constant-space KMV sketch (graft_bottomk) shuffles at most k
    // values per group and lands within its expected error — both
    // engines rebuild the identical sketch, so even the estimate
    // hash-matches.
    val sk = kmvSketch(t)
      .select(col("event_type"), kmvEstimate(col("bottomk")).as("est_users"))
    val ex = t.events.where(col("user_id").isNotNull).groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("users_exact"))
    ex.join(sk, "event_type")
      .select(col("event_type"), col("users_exact"), col("est_users"),
        (abs(col("est_users") / col("users_exact") - 1) < 0.5).as("dentro_margen"))
      .orderBy("event_type")
  }

  val q86 = QueryDef(
    "q86_incremental_rollup",
    Some("""WITH h AS (
           |  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mes,
           |    CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8) AS BIGINT) AS hv,
           |    o_totalprice
           |  FROM orders
           |), scal AS (
           |  SELECT mes, COUNT(*) AS n,
           |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
           |    min(o_totalprice) AS mn, max(o_totalprice) AS mx
           |  FROM h GROUP BY 1
           |), d AS (SELECT DISTINCT mes, hv FROM h),
           |r AS (SELECT mes, hv, row_number() OVER (PARTITION BY mes ORDER BY hv) AS rn FROM d),
           |sk AS (
           |  SELECT mes, (CAST(count(*) - 1 AS DOUBLE) * 4294967296.0) / max(hv) AS est_cust
           |  FROM r WHERE rn <= 16 GROUP BY mes
           |)
           |SELECT s.mes, s.n, s.total, s.mn, s.mx, k.est_cust
           |FROM scal s JOIN sk k USING (mes) ORDER BY mes""".stripMargin)) { t =>
    // Incremental aggregation: the nightly pattern where per-key rollup
    // STATES are stored and only the delta is scanned — history rows
    // are never touched again. Every statistic here is mergeable:
    // count/sum/min/max trivially, the DECIMAL sum keeps the merge
    // exact regardless of how the data was split, and distinct-count
    // rides the KMV sketch, whose merge (bottom-k of unioned bottom-ks
    // = bottom-k of the union, exactly) is why a sketch replaces exact
    // COUNT(DISTINCT) the moment aggregation goes incremental. The
    // oracle recomputes everything from the full fact: merged state ==
    // full recompute, bit for bit — including the sketch estimate.
    graft.expressions.GraftFunctions.register(t.spark)
    val cutoff = lit("1999-01-01 00:00:00").cast("timestamp")
    def state(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(date_trunc("month", col("o_orderdate")).as("mes"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("sum_d"),
          min(col("o_totalprice")).as("mn"), max(col("o_totalprice")).as("mx"),
          call_function("graft_bottomk",
            TextFns.hash32(col("o_custkey").cast("string")), lit(16)).as("sk"))
    val states = state(t.orders.where(col("o_orderdate") < cutoff))
      .unionByName(state(t.orders.where(col("o_orderdate") >= cutoff)))
    val scalars = states.groupBy("mes").agg(
      sum(col("n")).as("n"), sum(col("sum_d")).as("sum_d"),
      min(col("mn")).as("mn"), max(col("mx")).as("mx"))
    val sketches = states.select(col("mes"), explode(col("sk")).as("hv"))
      .groupBy("mes").agg(call_function("graft_bottomk", col("hv"), lit(16)).as("sk"))
    scalars.join(sketches, "mes")
      .select(col("mes"), col("n"), col("sum_d").cast("double").as("total"),
        col("mn"), col("mx"), kmvEstimate(col("sk")).as("est_cust"))
      .orderBy("mes")
  }

  /** Greedy-BPE per-doc token counts as a DuckDB CTE chain ending in
    * `bpe(doc_id, n_bpe)` — the recursive CTE replays exactly the
    * merges [[graft.expressions.Bpe.Merges]] pins: per word, rank every
    * adjacent symbol pair via list_position into the merge list, merge
    * the leftmost lowest-rank pair, recurse until none ranks; the
    * fixpoint row per word is the one with minimal symbol count (each
    * step shrinks the list by exactly one).
    */
  private[queries] val bpeCte: String = {
    val mp = graft.expressions.Bpe.mergesSqlList
    s"""WITH RECURSIVE
       |tok AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |w AS (SELECT doc_id, i.n AS wn, ws[CAST(i.n AS BIGINT)] AS w
       |      FROM tok, range(1, 101) i(n) WHERE i.n <= len(ws)),
       |init AS (SELECT doc_id, wn,
       |           [substr(w, CAST(j AS BIGINT), 1) for j in range(1, len(w)+1)] AS syms
       |         FROM w),
       |r AS (
       |  SELECT doc_id, wn, syms FROM init
       |  UNION ALL
  SELECT doc_id, wn,
    list_concat(list_concat(
      syms[1:CAST(bi-1 AS BIGINT)],
      [syms[CAST(bi AS BIGINT)] || syms[CAST(bi+1 AS BIGINT)]]),
      syms[CAST(bi+2 AS BIGINT):])
  FROM (
       |    SELECT doc_id, wn, syms,
       |      list_position(rks, list_min(list_filter(rks, x -> x IS NOT NULL))) AS bi
       |    FROM (
       |      SELECT doc_id, wn, syms,
       |        [nullif(list_position($mp,
       |           syms[CAST(i AS BIGINT)] || ' ' || syms[CAST(i+1 AS BIGINT)]), 0)
       |         for i in range(1, len(syms))] AS rks
       |      FROM r) ranked
       |    WHERE len(list_filter(rks, x -> x IS NOT NULL)) > 0) best
       |),
       |fixpt AS (SELECT doc_id, wn, MIN(len(syms)) AS m FROM r GROUP BY 1, 2),
       |bpe AS (SELECT doc_id, CAST(SUM(m) AS BIGINT) AS n_bpe FROM fixpt GROUP BY 1)""".stripMargin
  }

  val q175 = QueryDef(
    "q175_bpe_token_count",
    // oracle: the recursive-CTE replay of the SAME pinned greedy
    // merges — any divergence in pair ranking, leftmost choice, or
    // termination shows as a count mismatch on some doc.
    Some(s"""$bpeCte
            |SELECT d.doc_id,
            |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_ws,
            |  b.n_bpe
            |FROM documents d JOIN bpe b ON d.doc_id = b.doc_id
            |ORDER BY d.doc_id""".stripMargin)) { t =>
    // REAL subword token counting: whitespace counts under-charge long
    // words; budgets/packing are denominated in tokenizer tokens. One
    // native codegen'd expression per row (graft_bpe_tokens), no UDF,
    // no per-word explode — the merge loop runs inside the scan.
    graft.expressions.GraftFunctions.register(t.spark)
    t.documents.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_ws"),
      size(call_function("graft_bpe_tokens", col("text"))).cast("long").as("n_bpe"))
      .orderBy("doc_id")
  }

  val q176 = QueryDef(
    "q176_bpe_budget_cap",
    // q47's per-source token budget, denominated in BPE tokens — the
    // unit a training mix is actually capped in.
    Some(s"""$bpeCte,
            |toks AS (
            |  SELECT d.doc_id, d.source, b.n_bpe AS n_tokens
            |  FROM documents d JOIN bpe b ON d.doc_id = b.doc_id
            |), ranked AS (
            |  SELECT doc_id, source, n_tokens,
            |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
            |                        ROWS UNBOUNDED PRECEDING) AS cum_tokens
            |  FROM toks
            |)
            |SELECT source, COUNT(*) AS docs_kept, CAST(SUM(n_tokens) AS BIGINT) AS tokens_kept
            |FROM ranked WHERE cum_tokens <= 2000
            |GROUP BY source ORDER BY source""".stripMargin)) { t =>
    graft.expressions.GraftFunctions.register(t.spark)
    val toks = t.documents.select(col("doc_id"), col("source"),
      size(call_function("graft_bpe_tokens", col("text"))).cast("long").as("n_tokens"))
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    toks.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .where(col("cum_tokens") <= 2000)
      .groupBy("source")
      .agg(count(lit(1)).as("docs_kept"), sum(col("n_tokens")).as("tokens_kept"))
      .orderBy("source")
  }

  /** The DuckDB replay of BPE TRAINING, generated per round: pair
    * counts over the round k-1 state, deterministic argmax (count
    * desc, pair asc), then a recursive leftmost-merge until the pair
    * is absent (repeated-leftmost ≡ the trainer's left-to-right sweep:
    * a merge only creates LONGER symbols, so it can never form a new
    * occurrence of the same pair to its left). State is incremental
    * on BOTH sides — see operators.BpeTrain for why greedy re-apply
    * from scratch is NOT an equivalent oracle.
    */
  private def bpeTrainCtes(n: Int): String = {
    val rounds = (1 to n).map { k =>
      val prev = s"s${k - 1}"
      s"""p$k AS (
         |  SELECT pr, SUM(cnt) AS c FROM (
         |    SELECT cnt, unnest([syms[CAST(i AS BIGINT)] || ' ' || syms[CAST(i+1 AS BIGINT)]
         |                        for i in range(1, len(syms))]) AS pr
         |    FROM $prev) GROUP BY 1
         |),
         |m$k AS (SELECT pr FROM p$k ORDER BY c DESC, pr ASC LIMIT 1),
         |r$k AS (
         |  SELECT wid, cnt, syms FROM $prev
         |  UNION ALL
         |  SELECT wid, cnt,
         |    list_concat(list_concat(syms[1:CAST(bi-1 AS BIGINT)],
         |      [syms[CAST(bi AS BIGINT)] || syms[CAST(bi+1 AS BIGINT)]]),
         |      syms[CAST(bi+2 AS BIGINT):]) AS syms
         |  FROM (
         |    SELECT wid, cnt, syms,
         |      [CAST(i AS BIGINT) for i in range(1, len(syms))
         |         if syms[i] || ' ' || syms[i+1] = pr][1] AS bi
         |    FROM r$k, m$k) x
         |  WHERE bi IS NOT NULL
         |),
         |s$k AS (
         |  SELECT wid, cnt, syms FROM r$k
         |  QUALIFY row_number() OVER (PARTITION BY wid ORDER BY len(syms)) = 1
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH RECURSIVE
       |w0 AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
       |wt AS (SELECT w AS wid, CAST(COUNT(*) AS BIGINT) AS cnt
       |       FROM w0 WHERE w <> '' GROUP BY 1),
       |s0 AS (SELECT wid, cnt,
       |         [substr(wid, CAST(j AS BIGINT), 1) for j in range(1, len(wid)+1)] AS syms
       |       FROM wt),
       |$rounds""".stripMargin
  }

  private def bpeTrainSql(n: Int): String =
    // pair IS NULL marks a round past pair exhaustion (the scalar
    // subquery over an empty m_k): the trainer STOPS there and returns
    // fewer rows, so the oracle must drop those rounds to match
    s"""${bpeTrainCtes(n)}
       |SELECT * FROM (
       |  ${(1 to n).map(k =>
            s"SELECT CAST($k AS BIGINT) AS rank, (SELECT pr FROM m$k) AS pair")
            .mkString(" UNION ALL ")}
       |) WHERE pair IS NOT NULL ORDER BY rank""".stripMargin

  val q183 = QueryDef(
    "q183_bpe_train",
    Some(bpeTrainSql(8))) { t =>
    // TOKENIZER TRAINING at corpus scale — learning the merge table
    // the pinned-table apply (q175-q177) consumes. One corpus-wide
    // aggregation builds the word-TYPE frequency table; each of the 8
    // rounds is one vocabulary-sized aggregation plus a 1-row argmax,
    // never a corpus pass. See operators.BpeTrain.
    graft.operators.BpeTrain.train(t.documents, "text", 8).orderBy("rank")
  }

  val q185 = QueryDef(
    "q185_learned_token_count",
    // oracle: the final vocabulary state s8 of the training replay
    // carries each word type's learned split — corpus accounting is
    // one join of exploded words against it
    Some(s"""${bpeTrainCtes(8)}
            |SELECT d.source,
            |  CAST(COUNT(*) AS BIGINT) AS n_words,
            |  CAST(SUM(len(s.syms)) AS BIGINT) AS n_tokens
            |FROM (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents) d
            |JOIN s8 s ON d.w = s.wid
            |WHERE d.w <> ''
            |GROUP BY 1 ORDER BY 1""".stripMargin)) { t =>
    // TRAIN → ACCOUNT end-to-end: per-source corpus token counts under
    // the tokenizer LEARNED from this corpus (q183's merges). The
    // trainer's final vocabulary state already carries each word
    // type's subword split, so accounting is one word-level join —
    // the merge loop never runs per document row. At 100 TB: one
    // corpus pass to words, one vocabulary-sized join (AQE broadcasts
    // it when it fits).
    val (_, vocab) = graft.operators.BpeTrain.trainState(t.documents, "text", 8)
    t.documents
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .where(col("w") =!= "")
      .join(vocab.select(col("w"), size(col("syms")).cast("long").as("n_sub")), "w")
      .groupBy("source")
      .agg(count(lit(1)).as("n_words"), sum(col("n_sub")).as("n_tokens"))
      .orderBy("source")
  }

  /** TRAIN → APPLY CLOSURE — q183 learns the merge table, q175-q177
    * apply a PINNED one; this closes the loop: the corpus is tokenized
    * under the tokenizer LEARNED from it, end to end. The engine
    * trains (one corpus pass + vocab-sized rounds), collects the
    * nMerges-row table (the one declared vocab-sized collect), and
    * applies it through the native graft_bpe_tokens_with expression —
    * greedy lowest-rank/leftmost, inside whole-stage codegen. The
    * oracle replays BOTH stages in one recursive-CTE chain: the 8
    * training rounds rebuild the merge list from first principles,
    * then the greedy apply replays under that list — any divergence in
    * learning order OR application shows as a per-doc count mismatch.
    * NOTE the two stages are intentionally DIFFERENT algorithms:
    * training state is incremental (see BpeTrain), application is
    * greedy — tokenizing with a learned table is greedy by definition.
    */
  val q189 = QueryDef(
    "q189_bpe_train_apply",
    Some(s"""${bpeTrainCtes(8)},
            |mraw AS (SELECT [${(1 to 8).map(k => s"(SELECT pr FROM m$k)").mkString(", ")}] AS mp0),
            |mlist AS (SELECT list_filter(mp0, x -> x IS NOT NULL) AS mp FROM mraw),
            |tok AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
            |w AS (SELECT doc_id, i.n AS wn, ws[CAST(i.n AS BIGINT)] AS w
            |      FROM tok, range(1, 101) i(n) WHERE i.n <= len(ws)),
            |init AS (SELECT doc_id, wn,
            |           [substr(w, CAST(j AS BIGINT), 1) for j in range(1, len(w)+1)] AS syms
            |         FROM w),
            |r AS (
            |  SELECT doc_id, wn, syms FROM init
            |  UNION ALL
            |  SELECT doc_id, wn,
            |    list_concat(list_concat(
            |      syms[1:CAST(bi-1 AS BIGINT)],
            |      [syms[CAST(bi AS BIGINT)] || syms[CAST(bi+1 AS BIGINT)]]),
            |      syms[CAST(bi+2 AS BIGINT):])
            |  FROM (
            |    SELECT doc_id, wn, syms,
            |      list_position(rks, list_min(list_filter(rks, x -> x IS NOT NULL))) AS bi
            |    FROM (
            |      SELECT doc_id, wn, syms,
            |        [nullif(list_position(mp,
            |           syms[CAST(i AS BIGINT)] || ' ' || syms[CAST(i+1 AS BIGINT)]), 0)
            |         for i in range(1, len(syms))] AS rks
            |      FROM r, mlist) ranked
            |    WHERE len(list_filter(rks, x -> x IS NOT NULL)) > 0) best
            |),
            |fixpt AS (SELECT doc_id, wn, MIN(len(syms)) AS m FROM r GROUP BY 1, 2),
            |bpe AS (SELECT doc_id, CAST(SUM(m) AS BIGINT) AS n_bpe FROM fixpt GROUP BY 1)
            |SELECT d.doc_id,
            |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_ws,
            |  b.n_bpe
            |FROM documents d JOIN bpe b ON d.doc_id = b.doc_id
            |ORDER BY d.doc_id""".stripMargin)) { t =>
    graft.expressions.GraftFunctions.register(t.spark)
    val merges = graft.operators.BpeTrain.train(t.documents, "text", 8)
      .orderBy("rank").collect().map(_.getString(1))
    t.documents.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_ws"),
      size(call_function("graft_bpe_tokens_with", col("text"), lit(merges)))
        .cast("long").as("n_bpe"))
      .orderBy("doc_id")
  }

  override def queries: Seq[QueryDef] = Seq(q45, q46, q47, q48, q49, q50, q61, q86, q175, q176, q183, q185, q189)
}
