package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Round-6 wave-30 text-operations: winnowing fingerprint selection
  * (the MOSS/local-minima alternative to MinHash — positional, so it
  * also powers plagiarism-style overlap localization), block-similarity
  * topic segmentation (TextTiling-lite), a sentence segmentation
  * profile, and blocklist screening (the safety-filter stage every
  * production corpus pipeline runs).
  *
  * Oracle conventions as the sibling modules: exact integers
  * end-to-end, identical aliases both sides, ORDER BY a unique key.
  */
object TextOpsQueries {

  // ------------------------------------------------------- X232 winnowing

  /** Winnowing parameters: gram size (tokens), window w, df cap, pair
    * floor and report depth. Positions are bounded per DOC (< 2²⁰ grams
    * per doc for the packed key) — a per-document bound, not a corpus
    * bound, same class as the reference's per-document size limits. */
  val WinnowN = 3
  val WinnowW = 4
  val WinnowMaxDf = 1000
  val WinnowMinShared = 3L
  val WinnowTopK = 50

  /** X232 — winnowing fingerprint near-dup pairs: each doc's positional
    * token-3-gram hash sequence is WINNOWED (Schleimer/Wilkerson/Aiken:
    * from every window of [[WinnowW]] consecutive grams keep the
    * minimum hash, ties → rightmost), and docs are paired on shared
    * selected fingerprints through a df-capped inverted index. Unlike
    * MinHash (q17) the guarantee is positional: any shared run of
    * ≥ w+n−1 tokens shares ≥1 fingerprint, which is why this is the
    * plagiarism/exact-passage screen next to the probabilistic band
    * screen.
    *
    * The winnow itself is windowed per doc: a gram at position p is
    * selected iff it is the (hash, rightmost)-minimum of SOME full
    * window containing it — expressed as [[WinnowW]] frame-minima over
    * one per-doc ordered pass (short docs keep their global argmin).
    * The packed key `hash·2²¹ + (2²⁰ − p)` makes "min hash, ties →
    * rightmost" one BIGINT min.
    *
    * Scale: per-doc windows (corpus parallelism = docs), fingerprint
    * index is df-capped like q16's, pairs shuffle on the fingerprint —
    * never all-pairs. */
  /** Packing base for (doc_id, nfp) → one BIGINT: id·2³¹ + nfp.
    * Envelope (round-9, the KsDrift bound-comment discipline): nfp <
    * 2³¹ is structural — a doc needs ≥ 2³¹ grams (≈ 8 GiB of text in
    * ONE document) to overflow the low bits; doc_id must stay < 2³²,
    * i.e. 4 B documents per corpus snapshot. Past either bound, revert
    * to the unpacked sizes-join form this replaced (git: round-8). */
  val WinnowPackBase = 2147483648L // 2^31

  /** Pack envelope on the id side: doc_id ∈ [0, 2³²) keeps id·2³¹ + nfp
    * inside a signed BIGINT. Guarded at runtime in q211 (ADVICE r9): an
    * out-of-envelope corpus fails loudly instead of silently corrupting
    * pair identities. */
  val WinnowPackIdMax = 4294967296L // 2^32

  def q211_winnow_pairs(spark: SparkSession, dir: String): DataFrame = {
    // Per-doc fingerprint count is known IN-ROW (it's the winnow
    // array's size), so pack (doc_id, nfp) into the posting id and the
    // whole sizes subtree — one groupBy(doc_id) shuffle plus two joins
    // of round-8's form — disappears, along with the cache the extra
    // consumers needed. Packed ids sort exactly like doc ids (distinct
    // docs ⇒ the nfp low bits never decide an order), so
    // cappedPostingPairs' id_a < id_b contract carries over.
    graft.expressions.GraftFunctions.register(spark)
    val fps = graft.ops.Dedup.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), wsTokens(normalizeText(col("text"))).as("t"))
      .select(col("doc_id"), call_function(
        graft.expressions.GraftFunctions.WinnowFpsName,
        col("t"), lit(WinnowN), lit(WinnowW)).as("hs"))
      // envelope guard (ADVICE r9): a doc_id ≥ 2³² or < 0 would silently
      // corrupt packed pair identities — fail the job instead. One codegen'd
      // comparison per row; nfp < 2³¹ stays structural (see WinnowPackBase).
      .select((when(col("doc_id") < 0 || col("doc_id") >= WinnowPackIdMax,
          raise_error(concat(
            lit(s"q211: doc_id outside the [0, $WinnowPackIdMax) pack envelope: "),
            col("doc_id").cast("string"))).cast("long"))
        .otherwise(col("doc_id") * WinnowPackBase + size(col("hs")))).as("pid"),
        explode(col("hs")).as("h"))
    // in-row pair generation off the df-capped posting lists
    // (Dedup.cappedPostingPairs): the capped collector prunes hot
    // fingerprints inside the aggregate, bounded sorted lists, pairs
    // walked in-row with id_a < id_b by construction
    val shared = graft.ops.Dedup.cappedPostingPairs(fps, "h", "pid", WinnowMaxDf)
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= WinnowMinShared)
      .select(expr(s"id_a div ${WinnowPackBase}L").as("id_a"),
        (col("id_a") % WinnowPackBase).as("fp_a"),
        expr(s"id_b div ${WinnowPackBase}L").as("id_b"),
        (col("id_b") % WinnowPackBase).as("fp_b"),
        col("n_shared"))
    shared.orderBy(col("n_shared").desc, col("id_a"), col("id_b")).limit(WinnowTopK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_shared").desc, col("id_a"), col("id_b"))).cast("long"))
      .select("rank", "id_a", "id_b", "n_shared", "fp_a", "fp_b")
      .orderBy("rank")
  }

  /** The winnowed fingerprint set `(doc_id, h)` of a (doc_id, text)
    * frame — split out so WinnowSpec can pin the positional guarantee
    * (any shared token run of length ≥ w+n−1 yields a shared
    * fingerprint) against planted runs. */
  private[queries] def winnowFingerprints(docs: DataFrame): DataFrame = {
    // FUSED form (round-9): the whole per-doc subtree below — gram md5
    // keys, sliding-min selection, decode, dedup — is one
    // [[graft.expressions.WinnowFps]] pass (incremental digest, no hex
    // round-trip, no interpreted HOF lambda per gram). The composed SQL
    // form it replaced stays in [[winnowFingerprintsReference]] and
    // WaveThirtySpec pins the A/B bit-identical.
    graft.expressions.GraftFunctions.register(docs.sparkSession)
    docs
      .select(col("doc_id"), wsTokens(normalizeText(col("text"))).as("t"))
      .select(col("doc_id"), explode(call_function(
        graft.expressions.GraftFunctions.WinnowFpsName,
        col("t"), lit(WinnowN), lit(WinnowW))).as("h"))
  }

  /** The pre-fusion composed form of [[winnowFingerprints]] — kept as
    * the executable spec the fused expression is pinned against. */
  private[queries] def winnowFingerprintsReference(docs: DataFrame): DataFrame = {
    // IN-ROW winnow (round-7): the packed keys live in one per-doc array
    // and "selected = distinct of per-full-window minima" is a transform
    // over window starts — no gram explode, no per-doc sort shuffle, no
    // W-frame WindowExec (the round-6 form; measured 2.8 s → 1.1 s at
    // sf0.1 with a bit-identical fingerprint set — the profiled A/B kept
    // fps.except(sel) empty both ways). Short docs (< w full windows)
    // keep their global argmin, gramless docs emit nothing — exactly the
    // windowed form's semantics, WinnowSpec-pinned.
    val toksT = docs
      .select(col("doc_id"), wsTokens(normalizeText(col("text"))).as("t"))
    val gram = (0 until WinnowN).map(j => s"element_at(t, i + $j)").mkString(", ")
    // Packed key = h·2²¹ + position, position ∈ [0, 2²¹): h dominates the
    // min only while the position component can't borrow — the round-7
    // form's (2²⁰ − i) went NEGATIVE past i = 2²⁰, so `k div 2²¹` decoded
    // h−1 for grams beyond ~1M tokens (round-7 ADVICE). least(i−1, 2²¹−1)
    // caps the component instead; the decoded h is invariant to WHICH
    // equal-h gram a window's min lands on, so the fingerprint set is
    // bit-identical for short docs and now correct for arbitrarily long
    // ones (ties now resolve to the leftmost gram rather than rightmost —
    // both decode to the same h).
    val karr = expr(
      s"""CASE WHEN size(t) < $WinnowN THEN CAST(array() AS array<bigint>)
         |ELSE transform(sequence(1, size(t) - ${WinnowN - 1}),
         |  i -> CAST(conv(substring(md5(concat_ws(' ', $gram)), 1, 8), 16, 10) AS BIGINT)
         |       * 2097152L + least(CAST(i AS BIGINT) - 1L, 2097151L))
         |END""".stripMargin)
    // selection via the O(n) monotonic-deque expression (round-8): the
    // HOF form (array_min over a slice PER WINDOW START) was O(n·W)
    // copying and the board's last >2× query vs the oracle — same value
    // set (empty / global-argmin / distinct window minima), WinnowSpec
    // pins the A/B
    graft.expressions.GraftFunctions.register(docs.sparkSession)
    // h-dedup stays IN-ROW (array_distinct over the per-doc minima after
    // decoding) — the expression already dedups packed keys per doc, so
    // the only residual dupes are same-h-different-position picks within
    // ONE doc's array; deduping there makes the whole fingerprint pass
    // map-only, no distinct() exchange
    toksT.select(col("doc_id"), karr.as("ka"))
      .select(col("doc_id"), explode(expr(
        s"""array_distinct(transform(
           |  ${graft.expressions.GraftFunctions.SlidingMinName}(ka, $WinnowW),
           |  k -> k div 2097152))""".stripMargin)).as("h"))
  }

  // ------------------------------------------------ X233 topic segmentation

  /** Tiling parameters: tokens per block and the boundary threshold. */
  val TileBlock = 30
  val TileTauX10k = 1500L

  /** X233 — block-similarity topic segmentation (TextTiling-lite): each
    * doc's token stream splits into fixed [[TileBlock]]-token blocks;
    * adjacent blocks score their vocabulary Jaccard ×10⁴; a boundary is
    * any adjacency below [[TileTauX10k]]. Per doc: block count,
    * adjacency count, boundaries, mean and min similarity — the
    * chunk-at-topic-shift signal a context-window splitter (X31) uses
    * to cut at semantic seams instead of fixed offsets, and a
    * topical-coherence quality score (many low-similarity seams in a
    * short doc = concatenated boilerplate).
    *
    * Scale: one positional token pass, per-(doc, block) vocabulary
    * aggregate, adjacency equijoin on (doc, block+1) — all doc-local,
    * corpus parallelism = docs. */
  def q212_text_tiling(spark: SparkSession, dir: String): DataFrame = {
    val tk = graft.ops.Dedup.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), posexplode(wsTokens(normalizeText(col("text")))).as(Seq("p0", "token")))
      .select(col("doc_id"), expr(s"CAST(p0 div $TileBlock AS BIGINT)").as("block"), col("token"))
    val vocab = tk.distinct()
    val sizes = vocab.groupBy("doc_id", "block").agg(count(lit(1)).as("sz"))
    val inter = vocab.as("x")
      .join(vocab.as("y"),
        col("x.doc_id") === col("y.doc_id") && col("x.token") === col("y.token") &&
          col("y.block") === col("x.block") + 1L)
      .groupBy(col("x.doc_id").as("doc_id"), col("x.block").as("block"))
      .agg(count(lit(1)).as("n_common"))
    val adj = sizes.as("a")
      .join(sizes.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("b.block") === col("a.block") + 1L)
      .select(col("a.doc_id").as("doc_id"), col("a.block").as("block"),
        col("a.sz").as("sa"), col("b.sz").as("sb"))
      .join(inter, Seq("doc_id", "block"), "left")
      .withColumn("n_common", coalesce(col("n_common"), lit(0L)))
      .withColumn("sim_x10k",
        expr("(10000 * n_common) div (sa + sb - n_common)"))
    val perDoc = adj.groupBy("doc_id").agg(
      count(lit(1)).as("n_pairs"),
      sum((col("sim_x10k") < TileTauX10k).cast("long")).as("n_boundaries"),
      sum("sim_x10k").as("sim_sum"),
      min("sim_x10k").as("min_sim_x10k"))
    val blocks = sizes.groupBy("doc_id").agg(count(lit(1)).as("n_blocks"))
    Tables.documents(spark, dir).select(col("doc_id"))
      .join(blocks, Seq("doc_id"), "left")
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_blocks"), lit(0L)).as("n_blocks"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_boundaries"), lit(0L)).as("n_boundaries"),
        expr("CASE WHEN n_pairs IS NULL OR n_pairs = 0 THEN 10000 ELSE sim_sum div n_pairs END")
          .as("mean_sim_x10k"),
        coalesce(col("min_sim_x10k"), lit(10000L)).as("min_sim_x10k"))
      .orderBy("doc_id")
  }

  // --------------------------------------------- X234 sentence segmentation

  /** X234 — sentence segmentation profile: segments on terminal
    * punctuation runs `[.!?]+`, keeps segments containing a letter, and
    * reports per doc the sentence count, token stats per sentence,
    * uppercase-start share and ALL-CAPS token share — the structural
    * quality layer readability (q159: syllables) and the punct/stopword
    * ratios (q13) don't see: fragment dumps segment into one huge
    * "sentence", shouting and list boilerplate surface as caps share.
    *
    * Scale: one segment explode + one token pass, both doc-local. */
  def q213_sentence_profile(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.ops.Dedup.spread(Tables.documents(spark, dir))
    val segs = docs
      .select(col("doc_id"), explode(split(col("text"), "[.!?]+")).as("seg0"))
      .select(col("doc_id"), trim(col("seg0")).as("seg"))
      .filter(col("seg").rlike("[A-Za-z]"))
      .select(col("doc_id"),
        size(wsTokens(col("seg"))).cast("long").as("stok"),
        substring(col("seg"), 1, 1).rlike("^[A-Z]").cast("long").as("up"))
    val sent = segs.groupBy("doc_id").agg(
      count(lit(1)).as("n_sentences"),
      sum("stok").as("tok_sum"),
      max("stok").as("max_sent_tokens"),
      sum("up").as("up_sum"))
    val caps = docs
      .select(col("doc_id"), explode(wsTokens(col("text"))).as("tok0"))
      .select(col("doc_id"), regexp_replace(col("tok0"), "[^A-Za-z0-9]", "").as("tok"))
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_raw_tokens"),
        sum(col("tok").rlike("^[A-Z]{2,}$").cast("long")).as("caps_sum"))
    docs.select(col("doc_id"))
      .join(sent, Seq("doc_id"), "left")
      .join(caps, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_sentences"), lit(0L)).as("n_sentences"),
        expr("CASE WHEN n_sentences IS NULL OR n_sentences = 0 THEN 0 ELSE (100 * tok_sum) div n_sentences END")
          .as("mean_sent_tokens_x100"),
        coalesce(col("max_sent_tokens"), lit(0L)).as("max_sent_tokens"),
        expr("CASE WHEN n_sentences IS NULL OR n_sentences = 0 THEN 0 ELSE (10000 * up_sum) div n_sentences END")
          .as("upper_start_x10k"),
        expr("CASE WHEN n_raw_tokens IS NULL OR n_raw_tokens = 0 THEN 0 ELSE (10000 * caps_sum) div n_raw_tokens END")
          .as("caps_x10k"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------- X235 blocklist screen

  /** The screening lists: single terms and 2-token phrases per
    * category, chosen from the corpus vocabulary so the screen
    * exercises both match paths. Real deployments swap these for their
    * policy lists — the PLAN is the operator (an in-row pass over the
    * literal lists: `filter(tokens, ...)` term counts + an adjacent-pair
    * scan for phrases), not the words. */
  val BlockTerms: Seq[(String, String)] = Seq(
    "latency" -> "slow", "latency" -> "fast",
    "engine" -> "spark", "engine" -> "scan",
    "storage" -> "table")
  val BlockPhrases: Seq[(String, String, String)] = Seq(
    ("latency", "scan", "slow"), ("storage", "big", "table"))
  val BlockFlagAt = 5L

  /** X235 — blocklist screening: per (doc, category) the term-hit and
    * phrase-hit counts against the literal policy lists, plus the flag
    * verdict at [[BlockFlagAt]] total hits — the safety/compliance
    * filter stage of a corpus pipeline. Both match paths run IN-ROW
    * over the tokenized document (see [[screenDocs]]): term hits as a
    * `filter(tokens, ...)` size, 2-token phrase hits as an
    * adjacent-pair scan — no token explode, no pattern join, zero
    * corpus shuffles (plan-pinned in RoundTenPlanSpec).
    *
    * Scale: the screen is a map-side pass over documents; a
    * 10⁴+-pattern production list would graduate to the broadcast
    * pattern-table + positional-equijoin form this replaced
    * (git: round-9). */
  def q214_blocklist_screen(spark: SparkSession, dir: String): DataFrame =
    screenDocs(graft.ops.Dedup.spread(Tables.documents(spark, dir)))
      .orderBy("doc_id", "category")

  /** Core of q214 over any (doc_id, text) frame — split out so the
    * streaming twin ([[graft.streaming.BlocklistStream]]) screens each
    * micro-batch through the identical plan. Unordered.
    *
    * ONE map-side pass (round-10; was tokenize ×3 + a positional
    * self-equijoin + two aggregates): the policy lists are FIXED literals
    * (a handful of terms/phrases per category), so per (doc, category)
    * the term-hit count is an in-row `filter(tokens, ...)` size and the
    * 2-token phrase-hit count an in-row adjacent-pair scan — no token
    * explode, no corpus shuffle anywhere (the per-doc rollup the explode
    * form needed no longer exists). A policy list too large to inline
    * (thousands of patterns) would return to the broadcast-join form —
    * that boundary is the same plan-literal discipline as q274. */
  private[graft] def screenDocs(docs: DataFrame): DataFrame = {
    val cats = (BlockTerms.map(_._1) ++ BlockPhrases.map(_._1)).distinct.sorted
    val perCat = cats.map { c =>
      val terms = BlockTerms.filter(_._1 == c).map(_._2)
      val phrases = BlockPhrases.collect { case (`c`, a, b) => (a, b) }
      val termCnt =
        if (terms.isEmpty) lit(0L)
        else size(filter(col("t"),
          x => terms.map(x === lit(_)).reduce(_ || _))).cast("long")
      val phraseCnt =
        if (phrases.isEmpty) lit(0L)
        // sequence(1, 0) DESCENDS in Spark — guard the 0/1-token doc
        else when(size(col("t")) < 2, lit(0L)).otherwise(
          size(filter(sequence(lit(1), size(col("t")) - 1), i =>
            phrases.map { case (a, b) =>
              element_at(col("t"), i) === lit(a) &&
                element_at(col("t"), i + 1) === lit(b)
            }.reduce(_ || _))).cast("long"))
      struct(lit(c).as("category"), termCnt.as("n_term_hits"),
        phraseCnt.as("n_phrase_hits"))
    }
    docs
      .select(col("doc_id"), wsTokens(normalizeText(col("text"))).as("t"))
      .select(col("doc_id"), explode(array(perCat: _*)).as("h"))
      .select(col("doc_id"), col("h.category").as("category"),
        col("h.n_term_hits").as("n_term_hits"),
        col("h.n_phrase_hits").as("n_phrase_hits"))
      // the explode-form emitted only (doc, category) pairs with ≥1 hit
      // on either side — identical to sum > 0 here
      .filter(col("n_term_hits") + col("n_phrase_hits") > 0)
      .withColumn("n_hits", col("n_term_hits") + col("n_phrase_hits"))
      .withColumn("flagged", (col("n_hits") >= BlockFlagAt).cast("int"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q211_winnow_pairs" -> q211_winnow_pairs,
    "q212_text_tiling" -> q212_text_tiling,
    "q213_sentence_profile" -> q213_sentence_profile,
    "q214_blocklist_screen" -> q214_blocklist_screen
  )

  // ---------------------------------------------------------------- oracles

  import DataPrepQueries.normToks

  private def winnowGramSql: String = {
    val gram = (0 until WinnowN).map(j => s"t[i + $j]").mkString("concat_ws(' ', ", ", ", ")")
    s"""CASE WHEN len(t) < $WinnowN THEN []
       |     ELSE list_transform(generate_series(1, len(t) - ${WinnowN - 1}), i -> $gram) END"""
      .stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q211_winnow_pairs" -> {
      val winMins = (0 until WinnowW).map(j =>
        s"min(k) OVER (PARTITION BY doc_id ORDER BY p ROWS BETWEEN $j PRECEDING AND ${WinnowW - 1 - j} FOLLOWING) AS m$j")
        .mkString(",\n         ")
      val hit = (0 until WinnowW).map(j =>
        s"(p - $j >= 1 AND p + ${WinnowW - 1 - j} <= gcnt AND m$j = k)").mkString(" OR ")
      s"""WITH d AS (SELECT doc_id, $normToks AS t FROM documents),
         |g0 AS (SELECT doc_id, $winnowGramSql AS g FROM d),
         |g AS (SELECT doc_id,
         |             CAST(unnest(generate_series(1, len(g))) AS BIGINT) AS p,
         |             CAST(len(g) AS BIGINT) AS gcnt,
         |             unnest(g) AS gram
         |      FROM g0),
         |h AS (SELECT doc_id, p, gcnt,
         |             CAST(concat('0x', substr(md5(gram), 1, 8)) AS BIGINT) AS hh
         |      FROM g),
         |kk AS (SELECT doc_id, p, gcnt, hh,
         |              hh * 2097152 + least(p - 1, 2097151) AS k FROM h),
         |m AS (SELECT doc_id, p, gcnt, hh, k,
         |         min(k) OVER (PARTITION BY doc_id) AS mall,
         |         $winMins
         |      FROM kk),
         |fp AS (SELECT DISTINCT doc_id, hh FROM m
         |       WHERE CASE WHEN gcnt < $WinnowW THEN k = mall ELSE ($hit) END),
         |cap AS (SELECT fp.* FROM fp JOIN (
         |          SELECT hh FROM fp GROUP BY hh HAVING count(*) <= $WinnowMaxDf) ok
         |        USING (hh)),
         |sh AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |              CAST(count(*) AS BIGINT) AS n_shared
         |       FROM cap a JOIN cap b ON a.hh = b.hh AND a.doc_id < b.doc_id
         |       GROUP BY a.doc_id, b.doc_id
         |       HAVING count(*) >= $WinnowMinShared),
         |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nfp FROM fp GROUP BY doc_id),
         |sc AS (SELECT sh.id_a, sh.id_b, sh.n_shared, sa.nfp AS fp_a, sb.nfp AS fp_b
         |       FROM sh JOIN sz sa ON sa.doc_id = sh.id_a
         |               JOIN sz sb ON sb.doc_id = sh.id_b),
         |rk AS (SELECT *, CAST(row_number() OVER
         |         (ORDER BY n_shared DESC, id_a, id_b) AS BIGINT) AS rank FROM sc)
         |SELECT rank, id_a, id_b, n_shared, fp_a, fp_b
         |FROM rk WHERE rank <= $WinnowTopK ORDER BY rank""".stripMargin
    },
    "q212_text_tiling" ->
      s"""WITH d AS (SELECT doc_id, $normToks AS t FROM documents),
         |tk AS (SELECT doc_id,
         |              CAST((unnest(generate_series(1, len(t))) - 1) // $TileBlock AS BIGINT) AS block,
         |              unnest(t) AS token
         |       FROM d),
         |v AS (SELECT DISTINCT doc_id, block, token FROM tk),
         |sz AS (SELECT doc_id, block, CAST(count(*) AS BIGINT) AS sz
         |       FROM v GROUP BY doc_id, block),
         |ic AS (SELECT x.doc_id, x.block, CAST(count(*) AS BIGINT) AS n_common
         |       FROM v x JOIN v y ON x.doc_id = y.doc_id AND x.token = y.token
         |                        AND y.block = x.block + 1
         |       GROUP BY x.doc_id, x.block),
         |adj AS (SELECT a.doc_id, a.block, a.sz AS sa, b.sz AS sb,
         |               coalesce(ic.n_common, 0) AS n_common
         |        FROM sz a JOIN sz b ON a.doc_id = b.doc_id AND b.block = a.block + 1
         |        LEFT JOIN ic ON ic.doc_id = a.doc_id AND ic.block = a.block),
         |sim AS (SELECT doc_id, block,
         |               CAST((10000 * n_common) // (sa + sb - n_common) AS BIGINT) AS sim_x10k
         |        FROM adj),
         |pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
         |              CAST(sum(CASE WHEN sim_x10k < $TileTauX10k THEN 1 ELSE 0 END) AS BIGINT) AS n_boundaries,
         |              CAST(sum(sim_x10k) AS BIGINT) AS sim_sum,
         |              CAST(min(sim_x10k) AS BIGINT) AS min_sim_x10k
         |       FROM sim GROUP BY doc_id),
         |bl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_blocks FROM sz GROUP BY doc_id)
         |SELECT dd.doc_id,
         |       coalesce(bl.n_blocks, 0) AS n_blocks,
         |       coalesce(pd.n_pairs, 0) AS n_pairs,
         |       coalesce(pd.n_boundaries, 0) AS n_boundaries,
         |       CAST(CASE WHEN pd.n_pairs IS NULL OR pd.n_pairs = 0 THEN 10000
         |            ELSE pd.sim_sum // pd.n_pairs END AS BIGINT) AS mean_sim_x10k,
         |       coalesce(pd.min_sim_x10k, 10000) AS min_sim_x10k
         |FROM documents dd LEFT JOIN bl USING (doc_id) LEFT JOIN pd USING (doc_id)
         |ORDER BY dd.doc_id""".stripMargin,
    "q213_sentence_profile" ->
      s"""WITH sg0 AS (SELECT doc_id, trim(unnest(regexp_split_to_array(text, '[.!?]+'))) AS seg
         |             FROM documents),
         |sg AS (SELECT doc_id,
         |              CAST(len(CASE WHEN len(trim(seg)) = 0 THEN []
         |                        ELSE regexp_split_to_array(trim(seg), '\\s+') END) AS BIGINT) AS stok,
         |              CAST(regexp_matches(substr(seg, 1, 1), '^[A-Z]') AS BIGINT) AS up
         |       FROM sg0 WHERE regexp_matches(seg, '[A-Za-z]')),
         |st AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sentences,
         |              CAST(sum(stok) AS BIGINT) AS tok_sum,
         |              CAST(max(stok) AS BIGINT) AS max_sent_tokens,
         |              CAST(sum(up) AS BIGINT) AS up_sum
         |       FROM sg GROUP BY doc_id),
         |cp0 AS (SELECT doc_id,
         |               regexp_replace(unnest(CASE WHEN len(trim(text)) = 0 THEN []
         |                 ELSE regexp_split_to_array(trim(text), '\\s+') END),
         |                 '[^A-Za-z0-9]', '', 'g') AS tok
         |        FROM documents),
         |cp AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_raw_tokens,
         |              CAST(sum(CASE WHEN regexp_matches(tok, '^[A-Z]{2,}$$') THEN 1 ELSE 0 END) AS BIGINT) AS caps_sum
         |       FROM cp0 GROUP BY doc_id)
         |SELECT d.doc_id,
         |       coalesce(st.n_sentences, 0) AS n_sentences,
         |       CAST(CASE WHEN st.n_sentences IS NULL OR st.n_sentences = 0 THEN 0
         |            ELSE (100 * st.tok_sum) // st.n_sentences END AS BIGINT) AS mean_sent_tokens_x100,
         |       coalesce(st.max_sent_tokens, 0) AS max_sent_tokens,
         |       CAST(CASE WHEN st.n_sentences IS NULL OR st.n_sentences = 0 THEN 0
         |            ELSE (10000 * st.up_sum) // st.n_sentences END AS BIGINT) AS upper_start_x10k,
         |       CAST(CASE WHEN cp.n_raw_tokens IS NULL OR cp.n_raw_tokens = 0 THEN 0
         |            ELSE (10000 * cp.caps_sum) // cp.n_raw_tokens END AS BIGINT) AS caps_x10k
         |FROM documents d LEFT JOIN st USING (doc_id) LEFT JOIN cp USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    "q214_blocklist_screen" -> {
      val termVals = BlockTerms.map { case (c, t) => s"('$c', '$t')" }.mkString(", ")
      val phraseVals = BlockPhrases.map { case (c, a, b) => s"('$c', '$a', '$b')" }.mkString(", ")
      s"""WITH d AS (SELECT doc_id, $normToks AS t FROM documents),
         |tk AS (SELECT doc_id, CAST(unnest(generate_series(1, len(t))) AS BIGINT) AS p,
         |              unnest(t) AS token FROM d),
         |bt(category, term) AS (VALUES $termVals),
         |bp(category, w1, w2) AS (VALUES $phraseVals),
         |th AS (SELECT tk.doc_id, bt.category, CAST(count(*) AS BIGINT) AS n_term_hits
         |       FROM tk JOIN bt ON tk.token = bt.term GROUP BY tk.doc_id, bt.category),
         |ph AS (SELECT x.doc_id, bp.category, CAST(count(*) AS BIGINT) AS n_phrase_hits
         |       FROM tk x JOIN tk y ON x.doc_id = y.doc_id AND y.p = x.p + 1
         |       JOIN bp ON x.token = bp.w1 AND y.token = bp.w2
         |       GROUP BY x.doc_id, bp.category),
         |u AS (SELECT coalesce(th.doc_id, ph.doc_id) AS doc_id,
         |             coalesce(th.category, ph.category) AS category,
         |             coalesce(th.n_term_hits, 0) AS n_term_hits,
         |             coalesce(ph.n_phrase_hits, 0) AS n_phrase_hits
         |      FROM th FULL JOIN ph ON th.doc_id = ph.doc_id AND th.category = ph.category)
         |SELECT doc_id, category, n_term_hits, n_phrase_hits,
         |       CAST(n_term_hits + n_phrase_hits AS BIGINT) AS n_hits,
         |       CAST(CASE WHEN n_term_hits + n_phrase_hits >= $BlockFlagAt THEN 1 ELSE 0 END AS INT) AS flagged
         |FROM u ORDER BY doc_id, category""".stripMargin
    }
  )
}
