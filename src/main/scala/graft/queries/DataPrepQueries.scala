package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions
import graft.functions.TextFunctions._
import graft.ops.{Ann, Dedup, Graph, Relational}
import graft.multimodal.Multimodal

/** Training-data-pipeline queries (builder prompt: dedup / similarity /
  * multimodal / text analysis as first-class operators) over the
  * `documents` and `embeddings` testdata tables. Each query has an exact
  * DuckDB oracle unless marked rows-only; all ratios/similarities are
  * integer-quantized so value hashes match across engines (see
  * [[graft.functions.TextFunctions]] / [[graft.functions.VectorFunctions]]).
  */
object DataPrepQueries {

  // shared knobs — referenced by both the Spark queries and the SQL oracles
  val ShingleN = 3
  val JaccardMinX10k = 8000L
  val JaccardMaxDf = 1000
  val MinhashBands = 4
  val MinhashRows = 4
  val SimhashMaxDist = 3
  val AnnK = 10
  val AnnQueryMod = 5L // vec_id % 5 == 0 → query set
  val IvfCentroids = 16
  val IvfProbe = 4
  val IvfTrainRounds = 1
  val CosMinX100 = 40L
  val CosSampleMod = 5L

  // ---------------------------------------------------------------- text

  def q11_token_counts(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      tokenCountWs(col("text")).cast("long").as("n_tokens_ws"),
      tokenCountBpe(col("text")).cast("long").as("n_tokens_bpe"))
      .orderBy("doc_id")

  def q12_lang_id(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      langId(col("text")).as("lang_pred"))
      .orderBy("doc_id")

  def q13_quality(spark: SparkSession, dir: String): DataFrame = {
    val metrics = qualityMetrics(col("text")).map { case (n, c) => c.as(n) }
    Tables.documents(spark, dir)
      .select(col("doc_id") +: metrics: _*)
      .orderBy("doc_id")
  }

  def q14_fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      fingerprint(col("text")).as("fingerprint"))
      .orderBy("doc_id")

  // ---------------------------------------------------------------- dedup

  def q15_exact_dedup(spark: SparkSession, dir: String): DataFrame =
    Dedup.exact(Tables.documents(spark, dir))
      .select("doc_id", "fingerprint", "canonical_id", "group_size", "is_dup")
      .orderBy("doc_id")

  def q16_jaccard_pairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPairsPinned(spark, dir,
      n = ShingleN, minJaccardX10k = JaccardMinX10k, maxDf = JaccardMaxDf)
      .orderBy("id_a", "id_b")

  /** Session-pinned LSH candidate pairs (board params) — shared by
    * q17/q358/q386: the candidate set is a staged table at corpus
    * scale, not an artifact rebuilt per consumer. */
  private val lshPairsMemo = new graft.ops.PinnedCoreMemo[String]
  private[graft] def lshPairsPinned(spark: SparkSession, dir: String): DataFrame =
    lshPairsMemo.getOrBuild(spark, dir)(
      Dedup.minhashLshPairs(Tables.documents(spark, dir),
        n = ShingleN, bands = MinhashBands, rowsPerBand = MinhashRows))

  /** Session-pinned SimHash pigeonhole pairs (board params) — shared
    * by q19/q358/q386. */
  private val simhashPairsMemo = new graft.ops.PinnedCoreMemo[String]
  private[graft] def simhashPairsPinned(spark: SparkSession, dir: String): DataFrame =
    simhashPairsMemo.getOrBuild(spark, dir)(
      Dedup.simhashPairs(Tables.documents(spark, dir), maxDist = SimhashMaxDist))

  def q17_minhash_lsh_pairs(spark: SparkSession, dir: String): DataFrame =
    lshPairsPinned(spark, dir)
      .orderBy("id_a", "id_b")

  def q18_simhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhash64(Tables.documents(spark, dir))
      .select(col("id").as("doc_id"), col("simhash"))
      .orderBy("doc_id")

  def q19_simhash_pairs(spark: SparkSession, dir: String): DataFrame =
    simhashPairsPinned(spark, dir)
      .orderBy("id_a", "id_b")

  // ----------------------------------------------------------- similarity

  def q20_ann_brute_topk(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Ann.bruteForceTopK(
      emb.filter(pmod(col("vec_id"), lit(AnnQueryMod)) === 0), emb, AnnK)
      .orderBy("query_id", "rank")
  }

  /** LSH-bucketed ANN with MD5-parity hyperplanes ([[Ann.mdLshTopK]]):
    * same bucket-equijoin scale shape as the xxhash64 variant
    * ([[Ann.lshTopK]], recall-pinned in AnnSpec), but the plane signs are
    * reproducible in DuckDB, so the approximate result is hash-exact
    * oracle-verified — candidate generation AND rerank, end to end. */
  /** Embedding dimensionality per dir — a 1-row probe job per call
    * otherwise (the dimension is a property of the dataset, so one probe
    * per session suffices; round-11 job audit). */
  private val dimMemo = new java.util.concurrent.ConcurrentHashMap[String, Int]
  def q21_ann_lsh_topk(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    // plane-table width from the data's fixed dimensionality (1-row probe;
    // any positive width works when the table is empty)
    val dim = dimMemo.computeIfAbsent(dir, _ =>
      emb.select(size(col("embedding"))).head(1)
        .headOption.map(_.getInt(0)).getOrElse(1))
    Ann.mdLshTopK(
      emb.filter(pmod(col("vec_id"), lit(AnnQueryMod)) === 0), emb, AnnK,
      dim = dim, nBits = LshBits, probes = LshProbes, tables = LshTables)
      .orderBy("query_id", "rank")
  }
  val LshBits = 4
  val LshProbes = 3
  val LshTables = 2

  /** IVF ANN with a k-means-TRAINED coarse quantizer (`IvfTrainRounds`
    * Lloyd rounds from the deterministic lowest-id seed), nProbe-list
    * search, exact rerank. Every training step is integer/IEEE-double
    * exact, so the trained index — not just a static sample — is
    * oracle-verified exactly (the [[lloydCentSql]] replay). */
  def q31_ann_ivf_topk(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Ann.ivfTopK(
      emb.filter(pmod(col("vec_id"), lit(AnnQueryMod)) === 0), emb, AnnK,
      nCentroids = IvfCentroids, nProbe = IvfProbe, trainRounds = IvfTrainRounds)
      .orderBy("query_id", "rank")
  }

  def q22_cosine_pairs(spark: SparkSession, dir: String): DataFrame =
    Ann.cosineNearDupPairs(Tables.embeddings(spark, dir),
      minCosX100 = CosMinX100, sampleMod = CosSampleMod)
      .orderBy("id_a", "id_b")

  // ------------------------------------------------- corpus statistics

  /** Vocabulary extraction: term + document frequency over normalized
    * tokens, thresholded — the classic first pass of corpus curation.
    * One explode + one groupBy(token) shuffle; partial aggregation makes
    * the hot-token skew a non-issue. */
  val VocabMinTf = 5L
  def q24_vocabulary(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(wsTokens(normalizeText(col("text")))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      .filter(col("tf") >= VocabMinTf)
      .orderBy("token")

  /** Deterministic stratified take: first `StratTakeN` docs per language
    * by doc_id — the reproducible form of per-stratum sampling (a random
    * sample keyed by a seeded hash has the same shape: window or
    * rank-within-stratum, one shuffle on the stratum). */
  val StratTakeN = 10
  def q25_stratified_take(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), row_number().over(w).cast("long").as("rn"))
      .filter(col("rn") <= StratTakeN)
      .orderBy("lang", "rn")
  }

  /** Quality keep/drop decision from the integer-quantized metrics —
    * the filter stage of a training-data pipeline. */
  def q26_quality_filter(spark: SparkSession, dir: String): DataFrame = {
    val metrics = qualityMetrics(col("text")).map { case (n, c) => c.as(n) }
    Tables.documents(spark, dir)
      .select(col("doc_id") +: metrics: _*)
      .withColumn("keep",
        (col("n_tokens") >= 10 && col("n_tokens") <= 500 &&
          col("stop_per_10k") <= 3000 &&
          col("mean_tok_len_x100") >= 200 && col("mean_tok_len_x100") <= 800)
          .cast("int"))
      .select("doc_id", "n_tokens", "stop_per_10k", "mean_tok_len_x100", "keep")
      .orderBy("doc_id")
  }

  /** Top-k terms per language: grouped count + ranking window — corpus
    * reporting. Shuffles on (lang, token) then on lang; both tiny after
    * partial aggregation. */
  val TopTermsK = 10
  def q27_top_terms_per_lang(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.documents(spark, dir)
      .select(col("lang"), explode(wsTokens(normalizeText(col("text")))).as("token"))
      .groupBy("lang", "token").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("lang")).orderBy(col("cnt").desc, col("token").asc)
    counts
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TopTermsK)
      .orderBy("lang", "rank")
  }

  /** Cross-modal agreement: text near-dup pairs (q16 semantics) joined to
    * the embedding table on both ends, with the quantized embedding dot —
    * do lexical duplicates also agree in embedding space? A two-table
    * equijoin per side; the embedding side is broadcast-size per pair
    * batch at any corpus scale (pairs ≪ corpus). */
  def q30_crossmodal_pairs(spark: SparkSession, dir: String): DataFrame = {
    import graft.expressions.GraftFunctions
    GraftFunctions.register(spark)
    val pairs = Dedup.jaccardPairsPinned(spark, dir,
      n = ShingleN, minJaccardX10k = JaccardMinX10k, maxDf = JaccardMaxDf)
      .select("id_a", "id_b", "jaccard_x10k")
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), graft.functions.VectorFunctions.quantize(col("embedding")).as("qv"))
    pairs
      .join(emb.select(col("vec_id").as("id_a"), col("qv").as("qv_a")), "id_a")
      .join(emb.select(col("vec_id").as("id_b"), col("qv").as("qv_b")), "id_b")
      .select(col("id_a"), col("id_b"), col("jaccard_x10k"),
        call_function(GraftFunctions.DotLong, col("qv_a"), col("qv_b")).as("emb_dot"))
      .orderBy("id_a", "id_b")
  }

  /** Duplicate-cluster resolution: LSH near-dup pairs (q17 semantics) →
    * connected components → one canonical doc per cluster. The second half
    * of dedup that pair queries alone don't give you — see
    * [[graft.ops.Graph]] for the iterative min-label propagation. */
  def q33_dup_clusters(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val pairs = Dedup.minhashLshPairs(docs,
      n = ShingleN, bands = MinhashBands, rowsPerBand = MinhashRows)
    Graph.dupClusters(docs, pairs).orderBy("doc_id")
  }

  /** Sequence packing: assign docs (in doc_id order) to fixed token-budget
    * training windows — pack k = docs whose preceding cumulative token
    * count lands in [k*B, (k+1)*B). The global running sum uses
    * [[Relational.globalCumSum]]'s two-phase shape, NOT a single-partition
    * window, so the assignment parallelizes at any corpus size. */
  val PackBudget = 512L
  def q34_pack_sequences(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables.documents(spark, dir)
      .select(col("doc_id"), tokenCountWs(col("text")).cast("long").as("n_tokens"))
    Relational.globalCumSum(t, Seq(col("doc_id")), col("n_tokens"), "cum_tokens")
      .withColumn("pack_id",
        floor((col("cum_tokens") - col("n_tokens")) / lit(PackBudget)).cast("long"))
      .select("doc_id", "n_tokens", "cum_tokens", "pack_id")
      .orderBy("doc_id")
  }

  /** Repetition analysis (the Gopher-style quality signals): distinct-token
    * ratio and the share of the doc's bigrams taken by its most repeated
    * bigram. Per-doc explode + two partial-aggregated groupBys — shuffles
    * only on doc_id. */
  def q35_repetition(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), wsTokens(normalizeText(col("text"))).as("t"))
    val base = toks.select(col("doc_id"),
      size(col("t")).cast("long").as("n_tokens"),
      size(array_distinct(col("t"))).cast("long").as("n_distinct"))
    val gcnt = toks
      .select(col("doc_id"), explode(TextFunctions.ngramsAll(col("t"), 2)).as("gram"))
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id").agg(max("cnt").as("mx"), sum("cnt").as("nb"))
    base.join(gcnt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        when(col("n_tokens") > 0, floor(lit(10000L) * col("n_distinct") / col("n_tokens")))
          .otherwise(0L).cast("long").as("distinct_per_10k"),
        coalesce(col("mx"), lit(0L)).as("max_bigram_cnt"),
        when(coalesce(col("nb"), lit(0L)) > 0, floor(lit(10000L) * col("mx") / col("nb")))
          .otherwise(0L).cast("long").as("rep_per_10k"))
      .orderBy("doc_id")
  }

  /** Unigram corpus-frequency score — the integer-exact skeleton of
    * unigram-LM quality scoring: per-token commonness = floor(1e8 *
    * tf/corpus_tokens), per-doc mean over its token occurrences. Two-pass
    * (vocab aggregate, then a vocab→tokens join); the join side is left
    * unhinted so the optimizer/AQE broadcasts the vocab while it fits the
    * threshold and falls back to a shuffle join on token when a real
    * corpus vocabulary outgrows it (a forced broadcast would OOM the
    * driver instead of degrading). */
  val CommonScale = 100000000L
  def q36_unigram_score(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val toks = docs.select(col("doc_id"),
      explode(wsTokens(normalizeText(col("text")))).as("token"))
    val vocab = toks.groupBy("token").agg(count(lit(1)).as("tf"))
    val total = vocab.agg(sum("tf").as("n_total"))
    val scored = vocab.crossJoin(broadcast(total))
      .withColumn("tok_common",
        floor(lit(CommonScale) * col("tf") / col("n_total")).cast("long"))
    val agg = toks.join(scored.select("token", "tok_common"), "token")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("tok_common").as("common_sum"))
    docs.select("doc_id").join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("common_sum"), lit(0L)).as("common_sum"))
      .withColumn("mean_common_x1e8",
        when(col("n_tokens") > 0, floor(col("common_sum") / col("n_tokens")))
          .otherwise(0L).cast("long"))
      .orderBy("doc_id")
  }

  /** Cross-source contamination matrix: near-dup pairs (q17 LSH semantics)
    * bucketed by the source pair — the decontamination report a training
    * pipeline runs before a train/eval split (how many near-dups leak
    * across source boundaries?). Pairs ≪ corpus, so the source joins are
    * broadcast-size per batch at any scale. */
  def q37_contamination(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val pairs = Dedup.minhashLshPairs(docs,
      n = ShingleN, bands = MinhashBands, rowsPerBand = MinhashRows)
    val src = docs.select(col("doc_id"), col("source"))
    pairs
      .join(src.select(col("doc_id").as("id_a"), col("source").as("source_a")), "id_a")
      .join(src.select(col("doc_id").as("id_b"), col("source").as("source_b")), "id_b")
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("is_cross", (col("source_a") =!= col("source_b")).cast("int"))
      .orderBy("source_a", "source_b")
  }

  /** TF-IDF-shaped top terms per doc, integer-quantized: score =
    * floor(1e4 * tf / df) — rarity-weighted term relevance without the
    * floating-point log. tf/df aggregates are both partial-aggregable;
    * the ranking window partitions by doc (no global sort). */
  val TfidfK = 3
  def q38_tfidf_terms(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(wsTokens(normalizeText(col("text")))).as("token"))
    val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = toks.groupBy("token").agg(countDistinct(col("doc_id")).as("df"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score_x10k").desc, col("token").asc)
    tf.join(df, "token")
      .withColumn("score_x10k", floor(lit(10000L) * col("tf") / col("df")).cast("long"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TfidfK)
      .select("doc_id", "rank", "token", "tf", "df", "score_x10k")
      .orderBy("doc_id", "rank")
  }

  /** Per-group embedding centroids (element-wise integer mean of the
    * quantized vectors), grouped by language — the vector AGGREGATE a
    * semantic-dedup / cluster-summary stage needs. Shape: posexplode to
    * (group, dim) rows → one partial-aggregated groupBy — dim fan-out is
    * a constant (×64), the shuffle carries only (group, dim) partials, so
    * this survives any corpus size. Exploded output (one row per group ×
    * dim) keeps the oracle compare scalar-exact. */
  def q40_lang_centroids(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("lang"))
    val emb = Tables.embeddings(spark, dir).select(
      col("vec_id").as("doc_id"),
      graft.functions.VectorFunctions.quantize(col("embedding")).as("qv"))
    docs.join(emb, "doc_id")
      .select(col("lang"), posexplode(col("qv")).as(Seq("pos", "v")))
      .groupBy(col("lang"), col("pos").cast("long").as("pos"))
      .agg(count(lit(1)).as("n_docs"), sum("v").as("sum_v"))
      .withColumn("centroid_v", floor(col("sum_v") / col("n_docs")).cast("long"))
      .select("lang", "pos", "n_docs", "sum_v", "centroid_v")
      .orderBy("lang", "pos")
  }

  /** Context-window chunking: split docs into overlapping fixed-size
    * character chunks (size 200, stride 150) — one `transform(sequence)`
    * + explode, embarrassingly parallel, no shuffle before the output
    * sort. Chunk text is reported as md5 so the oracle compare stays
    * scalar and the result stays narrow. */
  val ChunkSize = 200
  val ChunkStride = 150
  def q46_chunking(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(TextFunctions.charChunks(col("text"), ChunkSize, ChunkStride)).as("c"))
      .select(col("doc_id"), col("c.chunk_idx").as("chunk_idx"),
        col("c.chunk_start").as("chunk_start"),
        length(col("c.chunk_text")).cast("long").as("chunk_len"),
        md5(col("c.chunk_text")).as("chunk_md5"))
      .orderBy("doc_id", "chunk_idx")

  /** Reproducible pseudo-random sampling: keep a doc iff the first 16 bits
    * of md5(seed:doc_id) land under the rate threshold — the deterministic
    * form of `sample()` a data pipeline actually wants (same subset on
    * every run/engine/retry, seed-switchable, no RNG state). Pure scalar
    * filter, embarrassingly parallel. */
  val SampleSeed = "s1"
  val SampleKeep = 6554L // of 65536 ≈ 10%
  def q51_hash_sample(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("h",
        conv(substring(md5(concat(lit(SampleSeed), lit(":"), col("doc_id").cast("string"))), 1, 4),
          16, 10).cast("long"))
      .filter(col("h") < SampleKeep)
      .select(col("doc_id"), col("h").as("sample_hash"))
      .orderBy("doc_id")

  /** End-to-end corpus curation in ONE DataFrame program — the composition
    * the individual operators exist for: drop exact duplicates (keep-first
    * canonical), resolve near-dup clusters (LSH → connected components)
    * and keep one doc per cluster, apply the quality gate, and report the
    * surviving corpus per language. Each stage is the already-verified
    * operator (q15/q33/q26 semantics); the value here is that the whole
    * pass composes into one lazy plan — no materialization between
    * stages — and still oracle-matches. */
  def q52_corpus_curation(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val exactCanonical = Dedup.exact(docs)
      .filter(col("is_dup") === 0).select("doc_id")
    val clusterCanonical = Graph.dupClusters(docs,
      Dedup.minhashLshPairs(docs, n = ShingleN, bands = MinhashBands, rowsPerBand = MinhashRows))
      .filter(col("is_canonical") === 1).select("doc_id")
    val metrics = qualityMetrics(col("text")).map { case (n, c) => c.as(n) }
    val qualityPass = docs.select(col("doc_id") +: metrics: _*)
      .filter(col("n_tokens") >= 10 && col("n_tokens") <= 500 &&
        col("stop_per_10k") <= 3000 &&
        col("mean_tok_len_x100") >= 200 && col("mean_tok_len_x100") <= 800)
      .select("doc_id")
    docs
      .join(exactCanonical, "doc_id")
      .join(clusterCanonical, "doc_id")
      .join(qualityPass, "doc_id")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCountWs(col("text")).cast("long")).as("total_tokens"))
      .orderBy("lang")
  }

  /** Eval-set decontamination — the train/eval hygiene pass: drop every
    * training doc whose MinHash band signature collides with ANY eval-set
    * doc (catches exact AND near duplicates of eval items in one screen).
    * The eval set here is the deterministic doc_id % `EvalMod` == 0 slice
    * (stand-in for a held-out benchmark). Shape: band keys both sides,
    * eval side reduced to DISTINCT keys (≪ corpus, broadcastable), then a
    * LEFT ANTI join — the corpus is filtered in one pass, no pair
    * materialization. */
  val EvalMod = 20L
  def q53_decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // persist (tracked): the banded table feeds BOTH the eval-keys branch
    // and the contaminated branch — uncached, the full shingle→MinHash
    // signature subtree would execute twice (the same measured 2× cost
    // minhashLshPairs persists against)
    val banded = Dedup.checkpointTracked(Dedup.minhashBands(docs,
      n = ShingleN, bands = MinhashBands, rowsPerBand = MinhashRows))
    val evalKeys = banded.filter(pmod(col("id"), lit(EvalMod)) === 0)
      .select("band", "band_key").distinct()
    val contaminated = banded.filter(pmod(col("id"), lit(EvalMod)) =!= 0)
      .join(broadcast(evalKeys), Seq("band", "band_key"))
      .select(col("id").as("doc_id")).distinct()
    docs.filter(pmod(col("doc_id"), lit(EvalMod)) =!= 0)
      .join(contaminated, Seq("doc_id"), "left_anti")
      .select("doc_id", "lang")
      .orderBy("doc_id")
  }

  // ----------------------------------------------------------- multimodal

  def q23_multimodal_stats(spark: SparkSession, dir: String): DataFrame =
    Multimodal.assetStats(
      Multimodal.ingestFromDocuments(Tables.documents(spark, dir)))
      .orderBy("asset_id")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q11_token_counts" -> q11_token_counts,
    "q12_lang_id" -> q12_lang_id,
    "q13_quality" -> q13_quality,
    "q14_fingerprint" -> q14_fingerprint,
    "q15_exact_dedup" -> q15_exact_dedup,
    "q16_jaccard_pairs" -> q16_jaccard_pairs,
    "q17_minhash_lsh_pairs" -> q17_minhash_lsh_pairs,
    "q18_simhash" -> q18_simhash,
    "q19_simhash_pairs" -> q19_simhash_pairs,
    "q20_ann_brute_topk" -> q20_ann_brute_topk,
    "q21_ann_lsh_topk" -> q21_ann_lsh_topk,
    "q22_cosine_pairs" -> q22_cosine_pairs,
    "q31_ann_ivf_topk" -> q31_ann_ivf_topk,
    "q23_multimodal_stats" -> q23_multimodal_stats,
    "q24_vocabulary" -> q24_vocabulary,
    "q25_stratified_take" -> q25_stratified_take,
    "q26_quality_filter" -> q26_quality_filter,
    "q27_top_terms_per_lang" -> q27_top_terms_per_lang,
    "q30_crossmodal_pairs" -> q30_crossmodal_pairs,
    "q33_dup_clusters" -> q33_dup_clusters,
    "q34_pack_sequences" -> q34_pack_sequences,
    "q35_repetition" -> q35_repetition,
    "q36_unigram_score" -> q36_unigram_score,
    "q37_contamination" -> q37_contamination,
    "q38_tfidf_terms" -> q38_tfidf_terms,
    "q40_lang_centroids" -> q40_lang_centroids,
    "q46_chunking" -> q46_chunking,
    "q51_hash_sample" -> q51_hash_sample,
    "q52_corpus_curation" -> q52_corpus_curation,
    "q53_decontaminate" -> q53_decontaminate
  )

  // ---------------------------------------------------------------- oracles

  /** DuckDB SQL fragments mirroring TextFunctions exactly. */
  private[queries] val toks =
    "CASE WHEN len(trim(text)) = 0 THEN [] ELSE regexp_split_to_array(trim(text), '\\s+') END"
  private val toksLower =
    "CASE WHEN len(trim(lower(text))) = 0 THEN [] ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END"
  private[queries] val norm =
    "trim(regexp_replace(regexp_replace(lower(text), '[[:punct:]]', '', 'g'), '\\s+', ' ', 'g'))"
  private[queries] val normToks =
    s"CASE WHEN len(trim($norm)) = 0 THEN [] ELSE regexp_split_to_array(trim($norm), '\\s+') END"

  private def stopList(lang: String): String =
    TextFunctions.Stopwords.toMap.apply(lang).map(w => s"'$w'").mkString("[", ", ", "]")

  private[queries] def hitsSql(lang: String): String =
    s"len(list_filter($toksLower, t -> list_contains(${stopList(lang)}, t)))"

  /** Shingle list SQL (word n-grams over the token-list column `t`). */
  private[queries] def shinglesSql(n: Int): String = {
    val gram = (0 until n).map(j => s"t[i + $j]").mkString("concat_ws(' ', ", ", ", ")")
    s"""CASE WHEN len(t) - ${n - 1} <= 0 THEN []
       |     ELSE list_distinct(list_transform(generate_series(1, len(t) - ${n - 1}), i -> $gram)) END"""
      .stripMargin
  }

  /** Common CTE: one row per (doc, distinct shingle). */
  private[queries] def shingleCte: String =
    s"""docs AS (SELECT doc_id, $normToks AS t FROM documents),
       |sh AS (
       |  SELECT doc_id AS id, unnest(${shinglesSql(ShingleN)}) AS shingle FROM docs)""".stripMargin

  private[queries] val quantVec =
    "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))"

  /** CTE chain replaying [[graft.ops.KMeans.lloydCentroids]] over a CTE
    * `v (vec_id, qv)`: hash-spread TRAINING SAMPLE (`vt` = first `cap`
    * rows in `(md5(id), id)` order — the bounded training set Lloyd
    * iterates at any corpus size), hash-spread seed (first k of the
    * sample), then `rounds` Lloyd update rounds (argmin-L2 assignment
    * with lower-cluster tiebreak, mean-floor update, empty clusters
    * dropped), ending in `cent (cent_id, centv)` — the exact SQL twin of
    * the TRAINED IVF coarse quantizer, shared by the q31/q91 oracles. */
  private[queries] def lloydCentSql(k: Int, rounds: Int,
      cap: Int = Ann.TrainSampleCap): String = {
    val seed =
      s"""kvt AS (SELECT vec_id, qv FROM v
         |        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $cap),
         |kc0 AS (SELECT CAST(row_number() OVER
         |                 (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS BIGINT)
         |               AS cluster, qv AS cvq
         |        FROM (SELECT vec_id, qv FROM kvt
         |              ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $k))""".stripMargin
    val steps = (1 to rounds).map { i =>
      s"""kp$i AS (SELECT t.vec_id AS id, c.cluster, unnest(t.qv) AS a, unnest(c.cvq) AS b
         |        FROM kvt t, kc${i - 1} c),
         |kd$i AS (SELECT id, cluster, CAST(sum((a-b)*(a-b)) AS BIGINT) AS d2
         |        FROM kp$i GROUP BY id, cluster),
         |ka$i AS (SELECT id, cluster FROM (
         |          SELECT id, cluster,
         |                 row_number() OVER (PARTITION BY id ORDER BY d2, cluster) AS rn
         |          FROM kd$i) WHERE rn = 1),
         |ke$i AS (SELECT ka$i.cluster, unnest(generate_series(1, len(t.qv))) AS pos,
         |               unnest(t.qv) AS x
         |        FROM kvt t JOIN ka$i ON t.vec_id = ka$i.id),
         |km$i AS (SELECT cluster, pos,
         |               CAST(floor(CAST(sum(x) AS DOUBLE) / count(*)) AS BIGINT) AS cv
         |        FROM ke$i GROUP BY cluster, pos),
         |kc$i AS (SELECT cluster, list(cv ORDER BY pos) AS cvq FROM km$i GROUP BY cluster)""".stripMargin
    }
    (seed +: steps).mkString(",\n") +
      s",\ncent AS (SELECT cluster AS cent_id, cvq AS centv FROM kc$rounds)"
  }

  private[queries] val minhashCols = (0 until MinhashBands * MinhashRows)
    .map(i => s"min(md5(concat('$i', ':', shingle))) AS mh$i").mkString(",\n         ")

  private[queries] val bandRows = (0 until MinhashBands).map { b =>
    val key = (0 until MinhashRows).map(r => s"mh${b * MinhashRows + r}")
      .mkString("concat_ws('|', ", ", ", ")")
    s"SELECT id, $b AS band, md5($key) AS band_key FROM mh"
  }.mkString("\n  UNION ALL ")

  // 64-bit simhash: nibble p = value of hex digit p of md5(token) (the
  // first 64 digest bits); bit j = bit (j%4) of nibble (j/4). Nibbles are
  // materialized once in their own CTE, mirroring the Spark projection.
  private val simhashNibbles = (0 until 16).map { p =>
    s"strpos('0123456789abcdef', substr(h, ${p + 1}, 1)) - 1 AS v$p"
  }.mkString(",\n         ")

  private val simhashBitSums = (0 until 64).map { j =>
    s"sum(CASE WHEN (v${j / 4} & ${1 << (j % 4)}) > 0 THEN 1 ELSE -1 END) AS s$j"
  }.mkString(",\n         ")

  // bit-63 term = -2^63 (the BIGINT sign bit): both engines build the same
  // two's-complement 64-bit pattern
  private val simhashFromBits = (0 until 64)
    .map { j =>
      val term = if (j == 63) Long.MinValue.toString else (1L << j).toString
      s"CASE WHEN s$j >= 0 THEN CAST($term AS BIGINT) ELSE 0 END"
    }.mkString(" + ")

  private[queries] val simhashCte =
    s"""docs AS (SELECT doc_id, $normToks AS t FROM docs0),
       |tok AS (SELECT doc_id AS id, md5(unnest(t)) AS h FROM docs),
       |nib AS (
       |  SELECT id,
       |         $simhashNibbles
       |  FROM tok),
       |bits AS (
       |  SELECT id,
       |         $simhashBitSums
       |  FROM nib GROUP BY id),
       |sig AS (SELECT id, CAST($simhashFromBits AS BIGINT) AS simhash FROM bits)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q11_token_counts" ->
      s"""SELECT doc_id,
         |       CAST(len($toks) AS BIGINT) AS n_tokens_ws,
         |       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT)
         |         AS n_tokens_bpe
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q12_lang_id" ->
      s"""WITH s AS (
         |  SELECT doc_id,
         |         ${TextFunctions.Stopwords.map { case (l, _) => s"${hitsSql(l)} AS s_$l" }.mkString(",\n         ")}
         |  FROM documents),
         |b AS (SELECT *, greatest(${TextFunctions.Stopwords.map(p => s"s_${p._1}").mkString(", ")}) AS best FROM s)
         |SELECT doc_id,
         |       CASE ${TextFunctions.Stopwords.map { case (l, _) => s"WHEN s_$l = best AND s_$l > 0 THEN '$l'" }.mkString(" ")}
         |            ELSE 'und' END AS lang_pred
         |FROM b ORDER BY doc_id""".stripMargin,
    "q13_quality" ->
      s"""SELECT doc_id,
         |  CAST(length(text) AS BIGINT) AS n_chars,
         |  CAST(len($toks) AS BIGINT) AS n_tokens,
         |  CAST(CASE WHEN length(text) > 0 THEN floor(10000 * (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g'))) / length(text)) ELSE 0 END AS BIGINT) AS punct_per_10k,
         |  CAST(CASE WHEN len($toks) > 0 THEN floor(10000 * ${hitsSql("en")} / len($toks)) ELSE 0 END AS BIGINT) AS stop_per_10k,
         |  CAST(CASE WHEN len($toks) > 0 THEN floor(100 * length(regexp_replace(text, '[^A-Za-z]', '', 'g')) / len($toks)) ELSE 0 END AS BIGINT) AS mean_tok_len_x100
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q14_fingerprint" ->
      s"""SELECT doc_id, md5($norm) AS fingerprint
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q15_exact_dedup" ->
      s"""WITH fp AS (SELECT doc_id, md5($norm) AS fingerprint FROM documents),
         |g AS (SELECT fingerprint, min(doc_id) AS canonical_id, count(*) AS group_size
         |      FROM fp GROUP BY fingerprint)
         |SELECT fp.doc_id, fp.fingerprint, g.canonical_id, g.group_size,
         |       CAST(fp.doc_id <> g.canonical_id AS INT) AS is_dup
         |FROM fp JOIN g USING (fingerprint) ORDER BY fp.doc_id""".stripMargin,
    "q16_jaccard_pairs" ->
      s"""WITH $shingleCte,
         |sizes AS (SELECT id, count(*) AS set_size FROM sh GROUP BY id),
         |capped AS (
         |  SELECT sh.* FROM sh
         |  JOIN (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= $JaccardMaxDf) ok
         |    USING (shingle)),
         |inter AS (
         |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
         |  FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.id < b.id
         |  GROUP BY a.id, b.id)
         |SELECT i.id_a, i.id_b, i.n_common, sa.set_size AS size_a, sb.set_size AS size_b,
         |       CAST(floor(10000 * i.n_common / (sa.set_size + sb.set_size - i.n_common)) AS BIGINT)
         |         AS jaccard_x10k
         |FROM inter i
         |JOIN sizes sa ON sa.id = i.id_a
         |JOIN sizes sb ON sb.id = i.id_b
         |WHERE floor(10000 * i.n_common / (sa.set_size + sb.set_size - i.n_common)) >= $JaccardMinX10k
         |ORDER BY id_a, id_b""".stripMargin,
    "q17_minhash_lsh_pairs" ->
      s"""WITH $shingleCte,
         |mh AS (
         |  SELECT id,
         |         $minhashCols
         |  FROM sh GROUP BY id),
         |banded AS (
         |  $bandRows)
         |SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |FROM banded a
         |JOIN banded b ON a.band = b.band AND a.band_key = b.band_key AND a.id < b.id
         |ORDER BY id_a, id_b""".stripMargin,
    "q18_simhash" ->
      s"""WITH docs0 AS (SELECT * FROM documents),
         |$simhashCte
         |SELECT id AS doc_id, simhash FROM sig ORDER BY doc_id""".stripMargin,
    "q19_simhash_pairs" ->
      s"""WITH docs0 AS (SELECT * FROM documents),
         |$simhashCte,
         |seg AS (
         |  ${(0 until 4).map(s => s"SELECT id, simhash, $s AS seg, (simhash >> ${16 * s}) & 65535 AS key FROM sig").mkString("\n         |  UNION ALL ")}),
         |cand AS (
         |  SELECT DISTINCT a.id AS id_a, a.simhash AS sim_a, b.id AS id_b, b.simhash AS sim_b
         |  FROM seg a JOIN seg b ON a.seg = b.seg AND a.key = b.key AND a.id < b.id)
         |SELECT id_a, id_b, CAST(bit_count(xor(sim_a, sim_b)) AS BIGINT) AS hamming
         |FROM cand
         |WHERE bit_count(xor(sim_a, sim_b)) <= $SimhashMaxDist
         |ORDER BY id_a, id_b""".stripMargin,
    "q20_ann_brute_topk" ->
      s"""WITH q AS (SELECT vec_id AS query_id, $quantVec AS qv FROM embeddings
         |           WHERE vec_id % $AnnQueryMod = 0),
         |c AS (SELECT vec_id AS neighbor_id, $quantVec AS cv FROM embeddings),
         |s AS (
         |  SELECT query_id, neighbor_id,
         |         CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * cv[i])) AS BIGINT) AS dot
         |  FROM q, c WHERE query_id <> neighbor_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id ASC) AS rank
         |      FROM s)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, dot
         |FROM r WHERE rank <= $AnnK ORDER BY query_id, rank""".stripMargin,
    "q31_ann_ivf_topk" ->
      s"""WITH v AS (SELECT vec_id, $quantVec AS qv FROM embeddings),
         |${lloydCentSql(IvfCentroids, IvfTrainRounds)},
         |ca AS (
         |  SELECT v.vec_id AS neighbor_id, v.qv AS cv, c.cent_id,
         |         CAST(list_sum(list_transform(generate_series(1, len(v.qv)), i -> v.qv[i] * c.centv[i])) AS BIGINT) AS cdot
         |  FROM v, cent c),
         |ar AS (SELECT *, row_number() OVER (PARTITION BY neighbor_id ORDER BY cdot DESC, cent_id ASC) AS rn FROM ca),
         |assigned AS (SELECT neighbor_id, cv, cent_id AS bucket FROM ar WHERE rn = 1),
         |qs AS (SELECT vec_id AS query_id, qv FROM v WHERE vec_id % $AnnQueryMod = 0),
         |qa AS (
         |  SELECT q.query_id, q.qv, c.cent_id,
         |         CAST(list_sum(list_transform(generate_series(1, len(q.qv)), i -> q.qv[i] * c.centv[i])) AS BIGINT) AS cdot
         |  FROM qs q, cent c),
         |qr AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cdot DESC, cent_id ASC) AS pr FROM qa),
         |probes AS (SELECT query_id, qv, cent_id AS bucket FROM qr WHERE pr <= $IvfProbe),
         |s AS (
         |  SELECT p.query_id, a.neighbor_id,
         |         CAST(list_sum(list_transform(generate_series(1, len(p.qv)), i -> p.qv[i] * a.cv[i])) AS BIGINT) AS dot
         |  FROM probes p JOIN assigned a ON p.bucket = a.bucket
         |  WHERE p.query_id <> a.neighbor_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id ASC) AS rank FROM s)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, dot
         |FROM r WHERE rank <= $AnnK ORDER BY query_id, rank""".stripMargin,
    "q22_cosine_pairs" ->
      s"""WITH base AS (
         |  SELECT vec_id AS id, $quantVec AS qv FROM embeddings WHERE vec_id % $CosSampleMod = 0),
         |n AS (SELECT id, qv,
         |        CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS n2 FROM base),
         |p AS (
         |  SELECT a.id AS id_a, b.id AS id_b,
         |         CAST(list_sum(list_transform(generate_series(1, len(a.qv)), i -> a.qv[i] * b.qv[i])) AS BIGINT) AS dot,
         |         a.n2 AS n2_a, b.n2 AS n2_b
         |  FROM n a JOIN n b ON a.id < b.id)
         |SELECT id_a, id_b, dot, n2_a, n2_b FROM p
         |WHERE dot > 0 AND dot * dot * 10000 >= $CosMinX100 * $CosMinX100 * n2_a * n2_b
         |ORDER BY id_a, id_b""".stripMargin,
    "q23_multimodal_stats" ->
      """SELECT doc_id AS asset_id,
        |       ['image', 'audio', 'video'][(doc_id % 3) + 1] AS modality,
        |       CAST(strlen(text) AS BIGINT) AS n_bytes,
        |       md5(text) AS payload_md5
        |FROM documents ORDER BY asset_id""".stripMargin,
    "q24_vocabulary" ->
      s"""WITH tok AS (SELECT doc_id, unnest($normToks) AS token FROM documents)
         |SELECT token, count(*) AS tf, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
         |FROM tok GROUP BY token HAVING count(*) >= $VocabMinTf
         |ORDER BY token""".stripMargin,
    "q25_stratified_take" ->
      s"""SELECT doc_id, lang, rn FROM (
         |  SELECT doc_id, lang,
         |         row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
         |  FROM documents)
         |WHERE rn <= $StratTakeN ORDER BY lang, rn""".stripMargin,
    "q26_quality_filter" ->
      s"""WITH m AS (
         |  SELECT doc_id,
         |    CAST(len($toks) AS BIGINT) AS n_tokens,
         |    CAST(CASE WHEN len($toks) > 0 THEN floor(10000 * ${hitsSql("en")} / len($toks)) ELSE 0 END AS BIGINT) AS stop_per_10k,
         |    CAST(CASE WHEN len($toks) > 0 THEN floor(100 * length(regexp_replace(text, '[^A-Za-z]', '', 'g')) / len($toks)) ELSE 0 END AS BIGINT) AS mean_tok_len_x100
         |  FROM documents)
         |SELECT doc_id, n_tokens, stop_per_10k, mean_tok_len_x100,
         |       CAST(n_tokens >= 10 AND n_tokens <= 500 AND stop_per_10k <= 3000
         |            AND mean_tok_len_x100 >= 200 AND mean_tok_len_x100 <= 800 AS INT) AS keep
         |FROM m ORDER BY doc_id""".stripMargin,
    "q27_top_terms_per_lang" ->
      s"""WITH tok AS (SELECT lang, unnest($normToks) AS token FROM documents),
         |c AS (SELECT lang, token, count(*) AS cnt FROM tok GROUP BY lang, token),
         |r AS (SELECT *, row_number() OVER
         |        (PARTITION BY lang ORDER BY cnt DESC, token ASC) AS rank FROM c)
         |SELECT lang, rank, token, cnt FROM r
         |WHERE rank <= $TopTermsK ORDER BY lang, rank""".stripMargin,
    "q30_crossmodal_pairs" ->
      s"""WITH $shingleCte,
         |sizes AS (SELECT id, count(*) AS set_size FROM sh GROUP BY id),
         |capped AS (
         |  SELECT sh.* FROM sh
         |  JOIN (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= $JaccardMaxDf) ok
         |    USING (shingle)),
         |inter AS (
         |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
         |  FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.id < b.id
         |  GROUP BY a.id, b.id),
         |pairs AS (
         |  SELECT i.id_a, i.id_b,
         |         CAST(floor(10000 * i.n_common / (sa.set_size + sb.set_size - i.n_common)) AS BIGINT)
         |           AS jaccard_x10k
         |  FROM inter i
         |  JOIN sizes sa ON sa.id = i.id_a
         |  JOIN sizes sb ON sb.id = i.id_b
         |  WHERE floor(10000 * i.n_common / (sa.set_size + sb.set_size - i.n_common)) >= $JaccardMinX10k),
         |emb AS (SELECT vec_id, $quantVec AS qv FROM embeddings)
         |SELECT p.id_a, p.id_b, p.jaccard_x10k,
         |       CAST(list_sum(list_transform(generate_series(1, len(ea.qv)), i -> ea.qv[i] * eb.qv[i])) AS BIGINT)
         |         AS emb_dot
         |FROM pairs p
         |JOIN emb ea ON ea.vec_id = p.id_a
         |JOIN emb eb ON eb.vec_id = p.id_b
         |ORDER BY p.id_a, p.id_b""".stripMargin,
    "q33_dup_clusters" ->
      s"""WITH RECURSIVE $shingleCte,
         |mh AS (
         |  SELECT id,
         |         $minhashCols
         |  FROM sh GROUP BY id),
         |banded AS (
         |  $bandRows),
         |pairs AS (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.band_key = b.band_key AND a.id < b.id),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         |reach AS (
         |  SELECT doc_id AS id, doc_id AS comp FROM documents
         |  UNION
         |  SELECT e.dst AS id, r.comp FROM reach r JOIN edges e ON e.src = r.id),
         |lab AS (SELECT id AS doc_id, min(comp) AS component_id FROM reach GROUP BY id),
         |cs AS (SELECT component_id, count(*) AS cluster_size FROM lab GROUP BY component_id)
         |SELECT l.doc_id, l.component_id, cs.cluster_size,
         |       CAST(l.doc_id = l.component_id AS INT) AS is_canonical
         |FROM lab l JOIN cs USING (component_id) ORDER BY doc_id""".stripMargin,
    "q34_pack_sequences" ->
      s"""WITH t AS (SELECT doc_id, CAST(len($toks) AS BIGINT) AS n_tokens FROM documents),
         |c AS (SELECT doc_id, n_tokens,
         |        sum(n_tokens) OVER (ORDER BY doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |      FROM t)
         |SELECT doc_id, n_tokens, CAST(cum AS BIGINT) AS cum_tokens,
         |       CAST(floor((cum - n_tokens) / $PackBudget) AS BIGINT) AS pack_id
         |FROM c ORDER BY doc_id""".stripMargin,
    "q35_repetition" ->
      s"""WITH d AS (SELECT doc_id, $normToks AS t FROM documents),
         |base AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
         |                CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct FROM d),
         |grams AS (
         |  SELECT doc_id,
         |         unnest(CASE WHEN len(t) - 1 <= 0 THEN []
         |                ELSE list_transform(generate_series(1, len(t) - 1),
         |                                    i -> concat_ws(' ', t[i], t[i+1])) END) AS gram
         |  FROM d),
         |gc AS (SELECT doc_id, gram, count(*) AS cnt FROM grams GROUP BY doc_id, gram),
         |ag AS (SELECT doc_id, max(cnt) AS mx, sum(cnt) AS nb FROM gc GROUP BY doc_id)
         |SELECT b.doc_id, b.n_tokens,
         |  CAST(CASE WHEN b.n_tokens > 0 THEN floor(10000 * b.n_distinct / b.n_tokens) ELSE 0 END AS BIGINT) AS distinct_per_10k,
         |  CAST(coalesce(ag.mx, 0) AS BIGINT) AS max_bigram_cnt,
         |  CAST(CASE WHEN coalesce(ag.nb, 0) > 0 THEN floor(10000 * ag.mx / ag.nb) ELSE 0 END AS BIGINT) AS rep_per_10k
         |FROM base b LEFT JOIN ag USING (doc_id) ORDER BY doc_id""".stripMargin,
    "q36_unigram_score" ->
      s"""WITH tok AS (SELECT doc_id, unnest($normToks) AS token FROM documents),
         |v AS (SELECT token, count(*) AS tf FROM tok GROUP BY token),
         |t AS (SELECT sum(tf) AS n_total FROM v),
         |s AS (SELECT token, CAST(floor($CommonScale * tf / n_total) AS BIGINT) AS tok_common FROM v, t),
         |a AS (SELECT doc_id, count(*) AS n_tokens, sum(tok_common) AS cs
         |      FROM tok JOIN s USING (token) GROUP BY doc_id)
         |SELECT d.doc_id,
         |       CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
         |       CAST(coalesce(a.cs, 0) AS BIGINT) AS common_sum,
         |       CAST(CASE WHEN coalesce(a.n_tokens, 0) > 0 THEN floor(a.cs / a.n_tokens) ELSE 0 END AS BIGINT) AS mean_common_x1e8
         |FROM documents d LEFT JOIN a USING (doc_id) ORDER BY doc_id""".stripMargin,
    "q37_contamination" ->
      s"""WITH $shingleCte,
         |mh AS (
         |  SELECT id,
         |         $minhashCols
         |  FROM sh GROUP BY id),
         |banded AS (
         |  $bandRows),
         |pairs AS (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.band_key = b.band_key AND a.id < b.id)
         |SELECT da.source AS source_a, db.source AS source_b,
         |       count(*) AS n_pairs,
         |       CAST(da.source <> db.source AS INT) AS is_cross
         |FROM pairs p
         |JOIN documents da ON da.doc_id = p.id_a
         |JOIN documents db ON db.doc_id = p.id_b
         |GROUP BY da.source, db.source
         |ORDER BY source_a, source_b""".stripMargin,
    "q38_tfidf_terms" ->
      s"""WITH tok AS (SELECT doc_id, unnest($normToks) AS token FROM documents),
         |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
         |df AS (SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tok GROUP BY token),
         |s AS (SELECT tf.doc_id, tf.token, tf.tf, df.df,
         |             CAST(floor(10000 * tf.tf / df.df) AS BIGINT) AS score_x10k
         |      FROM tf JOIN df USING (token)),
         |r AS (SELECT *, row_number() OVER
         |        (PARTITION BY doc_id ORDER BY score_x10k DESC, token ASC) AS rank FROM s)
         |SELECT doc_id, CAST(rank AS BIGINT) AS rank, token, tf, df, score_x10k
         |FROM r WHERE rank <= $TfidfK ORDER BY doc_id, rank""".stripMargin,
    "q40_lang_centroids" ->
      s"""WITH emb AS (SELECT vec_id AS doc_id, $quantVec AS qv FROM embeddings),
         |j AS (SELECT d.lang, e.qv FROM documents d JOIN emb e USING (doc_id)),
         |x AS (SELECT lang, CAST(unnest(generate_series(1, len(qv))) - 1 AS BIGINT) AS pos,
         |             unnest(qv) AS v
         |      FROM j)
         |SELECT lang, pos, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(v) AS BIGINT) AS sum_v,
         |       CAST(floor(sum(v) / count(*)) AS BIGINT) AS centroid_v
         |FROM x GROUP BY lang, pos ORDER BY lang, pos""".stripMargin,
    "q46_chunking" ->
      s"""WITH d AS (
         |  SELECT doc_id, text,
         |         CASE WHEN length(text) <= $ChunkSize THEN 1
         |              ELSE CAST(floor((length(text) - $ChunkSize + $ChunkStride - 1) / $ChunkStride) AS INT) + 1
         |         END AS n_chunks
         |  FROM documents),
         |c AS (SELECT doc_id, text, unnest(generate_series(0, n_chunks - 1)) AS i FROM d)
         |SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
         |       CAST(i * $ChunkStride AS BIGINT) AS chunk_start,
         |       CAST(length(substr(text, i * $ChunkStride + 1, $ChunkSize)) AS BIGINT) AS chunk_len,
         |       md5(substr(text, i * $ChunkStride + 1, $ChunkSize)) AS chunk_md5
         |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    "q51_hash_sample" ->
      s"""SELECT doc_id,
         |       CAST(CAST(concat('0x', substr(md5(concat('$SampleSeed', ':', CAST(doc_id AS VARCHAR))), 1, 4)) AS INT) AS BIGINT) AS sample_hash
         |FROM documents
         |WHERE CAST(concat('0x', substr(md5(concat('$SampleSeed', ':', CAST(doc_id AS VARCHAR))), 1, 4)) AS INT) < $SampleKeep
         |ORDER BY doc_id""".stripMargin,
    "q52_corpus_curation" ->
      s"""WITH RECURSIVE $shingleCte,
         |mh AS (
         |  SELECT id,
         |         $minhashCols
         |  FROM sh GROUP BY id),
         |banded AS (
         |  $bandRows),
         |pairs AS (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.band_key = b.band_key AND a.id < b.id),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         |reach AS (
         |  SELECT doc_id AS id, doc_id AS comp FROM documents
         |  UNION
         |  SELECT e.dst AS id, r.comp FROM reach r JOIN edges e ON e.src = r.id),
         |lab AS (SELECT id AS doc_id, min(comp) AS component_id FROM reach GROUP BY id),
         |fp AS (SELECT doc_id, md5($norm) AS fingerprint FROM documents),
         |fg AS (SELECT fingerprint, min(doc_id) AS canonical_id FROM fp GROUP BY fingerprint),
         |exd AS (SELECT fp.doc_id FROM fp JOIN fg USING (fingerprint)
         |        WHERE fp.doc_id = fg.canonical_id),
         |qm AS (
         |  SELECT doc_id,
         |    CAST(len($toks) AS BIGINT) AS n_tokens,
         |    CAST(CASE WHEN len($toks) > 0 THEN floor(10000 * ${hitsSql("en")} / len($toks)) ELSE 0 END AS BIGINT) AS stop_per_10k,
         |    CAST(CASE WHEN len($toks) > 0 THEN floor(100 * length(regexp_replace(text, '[^A-Za-z]', '', 'g')) / len($toks)) ELSE 0 END AS BIGINT) AS mean_tok_len_x100
         |  FROM documents),
         |keepq AS (SELECT doc_id FROM qm
         |          WHERE n_tokens >= 10 AND n_tokens <= 500 AND stop_per_10k <= 3000
         |            AND mean_tok_len_x100 >= 200 AND mean_tok_len_x100 <= 800)
         |SELECT d.lang, count(*) AS n_docs, CAST(sum(len($toks)) AS BIGINT) AS total_tokens
         |FROM documents d
         |JOIN lab ON lab.doc_id = d.doc_id AND lab.component_id = d.doc_id
         |JOIN exd ON exd.doc_id = d.doc_id
         |JOIN keepq ON keepq.doc_id = d.doc_id
         |GROUP BY d.lang ORDER BY d.lang""".stripMargin,
    "q53_decontaminate" ->
      s"""WITH $shingleCte,
         |mh AS (
         |  SELECT id,
         |         $minhashCols
         |  FROM sh GROUP BY id),
         |banded AS (
         |  $bandRows),
         |eb AS (SELECT DISTINCT band, band_key FROM banded WHERE id % $EvalMod = 0),
         |cont AS (
         |  SELECT DISTINCT b.id FROM banded b JOIN eb USING (band, band_key)
         |  WHERE b.id % $EvalMod <> 0)
         |SELECT d.doc_id, d.lang FROM documents d
         |WHERE d.doc_id % $EvalMod <> 0
         |  AND NOT EXISTS (SELECT 1 FROM cont WHERE cont.id = d.doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    "q21_ann_lsh_topk" -> {
      // MD5-parity hyperplane bucket of column `qv` for hash table t:
      // bit j set iff the signed projection on plane t*nBits+j is >= 0,
      // plane coefficient on 0-based coordinate i = +1 iff the first hex
      // nibble of md5("<plane>:<i>") is even — the exact SQL twin of
      // VectorFunctions.md5PlaneSigns/md5RhpBucket.
      def bucketSql(t: Int): String = (0 until LshBits).map { j =>
        val p = t * LshBits + j
        s"""(CASE WHEN list_sum(list_transform(generate_series(1, len(qv)),
           |   i -> qv[i] * (CASE WHEN strpos('02468ace',
           |        substr(md5('$p:' || CAST(i - 1 AS VARCHAR)), 1, 1)) > 0
           |      THEN 1 ELSE -1 END))) >= 0 THEN ${1L << j} ELSE 0 END)""".stripMargin
      }.mkString("(", " + ", ")")
      def perTable(sel: String => String): String =
        (0 until LshTables).map(t => sel(bucketSql(t)).replace("__TBL__", t.toString))
          .mkString("\n         |  UNION ALL ")
      val probeUnion = (0 until LshProbes).map(b =>
        s"UNION ALL SELECT tbl, query_id, xor(home, ${1L << b}) AS bucket FROM qh")
        .mkString("\n         |  ")
      s"""WITH v AS (SELECT vec_id, $quantVec AS qv FROM embeddings),
         |cb AS (
         |  ${perTable(b => s"SELECT __TBL__ AS tbl, vec_id AS neighbor_id, $b AS bucket FROM v")}),
         |qs AS (SELECT vec_id AS query_id, qv FROM v WHERE vec_id % $AnnQueryMod = 0),
         |qh AS (
         |  ${perTable(b => s"SELECT __TBL__ AS tbl, query_id, $b AS home FROM qs")}),
         |qp AS (
         |  SELECT tbl, query_id, home AS bucket FROM qh
         |  $probeUnion),
         |cand AS (
         |  SELECT DISTINCT q.query_id, c.neighbor_id
         |  FROM qp q JOIN cb c ON q.tbl = c.tbl AND q.bucket = c.bucket
         |  WHERE q.query_id <> c.neighbor_id),
         |s AS (
         |  SELECT cand.query_id, cand.neighbor_id,
         |         CAST(list_sum(list_transform(generate_series(1, len(a.qv)),
         |              i -> a.qv[i] * b.qv[i])) AS BIGINT) AS dot
         |  FROM cand JOIN v a ON a.vec_id = cand.query_id
         |            JOIN v b ON b.vec_id = cand.neighbor_id),
         |r AS (SELECT *, row_number() OVER
         |        (PARTITION BY query_id ORDER BY dot DESC, neighbor_id ASC) AS rank
         |      FROM s)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, dot
         |FROM r WHERE rank <= $AnnK ORDER BY query_id, rank""".stripMargin
    }
  )
}
