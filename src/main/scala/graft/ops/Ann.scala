package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expressions.GraftFunctions
import graft.functions.VectorFunctions._

/** Similarity search over an embedding column (`array<float>`): exact
  * brute-force top-k as the correctness baseline, and an LSH-bucketed
  * approximate variant as the 100 TB scale path.
  *
  * Similarity metric: exact BIGINT dot product of 1e-3-quantized vectors
  * (see [[graft.functions.VectorFunctions]]) — deterministic across
  * engines, so the brute-force variant is fully DuckDB-oracle-verifiable.
  */
object Ann {

  /** Rank a scored candidate table `(query_id, neighbor_id, dot)` to
    * top-k per query via the bounded-heap aggregate
    * [[graft.expressions.TopKDot]]: the heap runs map-side, so only
    * ≤ k rows per (query, task) reach the shuffle — NOT the full scored
    * set (that was VERDICT r1's q20 scale-killer). Output best-first with
    * a dense 1-based rank. */
  private[ops] def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy("query_id")
      .agg(call_function(GraftFunctions.TopKDotName,
        col("dot"), col("neighbor_id"), lit(k)).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "s")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("s.neighbor_id").as("neighbor_id"), col("s.dot").as("dot"))

  /** Exact top-k: queries × corpus crossjoin → quantized dot → bounded-heap
    * rank. The query side is broadcast (it's small by construction); the
    * corpus side streams — one pass over the corpus with no shuffle of the
    * big side, partial top-k per task, then ≤ |Q|·k·tasks rows shuffle on
    * query_id. Deterministic tiebreak: higher dot first, then lower id. */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    GraftFunctions.register(queries.sparkSession)
    val q = queries.select(col(idCol).as("query_id"), quantize(col(vecCol)).as("qv"))
    // spread: the per-candidate dot products run in the corpus SCAN stage
    // (broadcast join — no shuffle of the big side), so a single-file
    // corpus would score every pair on one task. Scale-aware no-op once
    // the scan has ≥ parallelism splits (round 11; q20 profile).
    val c = Dedup.spread(corpus)
      .select(col(idCol).as("neighbor_id"), quantize(col(vecCol)).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("dot", call_function(GraftFunctions.DotLong, col("qv"), col("cv")))
    rankTopK(scored.select("query_id", "neighbor_id", "dot"), k)
  }

  /** Shared shape of the hyperplane-LSH family: bucket explode on both
    * sides (queries additionally probe `probes` single-bit-flip neighbor
    * buckets per table), (table, bucket) equijoin, exact rerank through
    * the bounded heap. Turns O(|Q|·|C|) into a bucket-equijoin — the
    * shape that survives a billion-vector corpus (shuffle on (table,
    * bucket), per-bucket candidate sets). Recall is tuned by (tables,
    * nBits, probes); candidates touched scale as tables·(1+probes)/2^nBits
    * of the corpus. `homeBucket(vecCol, table)` supplies the geometry. */
  private def bucketedTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      nBits: Int,
      probes: Int,
      tables: Int,
      idCol: String,
      vecCol: String)(homeBucket: (Column, Int) => Column): DataFrame = {
    GraftFunctions.register(queries.sparkSession)
    def buckets(df: DataFrame, vec: String, probe: Boolean) =
      df.select(col("*"), explode(array((0 until tables).flatMap { t =>
        val home = homeBucket(col(vec), t)
        val probed = if (probe) (0 until probes).map(b =>
          home.bitwiseXOR(lit(1L << b))) else Seq.empty
        (home +: probed).map(b => struct(lit(t).as("t"), b.as("b")))
      }: _*)).as("tb"))
        .withColumn("tbl", col("tb.t")).withColumn("bucket", col("tb.b"))
        .drop("tb")
    // spread: bucket hashing (nBits × tables HOF projections per vector)
    // and the joined candidates' dot products all run in the corpus scan
    // stage — a single-file corpus serializes them on one task (round-11
    // q21 profile: a 0.6-1.2 s 1-task stage). Scale-aware no-op on real
    // multi-split corpora.
    val c = buckets(
      Dedup.spread(corpus)
        .select(col(idCol).as("neighbor_id"), quantize(col(vecCol)).as("cv")),
      "cv", probe = false)
    val q = buckets(
      queries.select(col(idCol).as("query_id"), quantize(col(vecCol)).as("qv")),
      "qv", probe = true)
    val scored = c.join(broadcast(q), Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("dot", call_function(GraftFunctions.DotLong, col("qv"), col("cv")))
      .select("query_id", "neighbor_id", "dot").distinct()
    rankTopK(scored, k)
  }

  /** LSH-bucketed approximate top-k with xxhash64 random hyperplanes.
    * Not oracle-SQL-expressible (xxhash64 planes); correctness =
    * recall@k against [[bruteForceTopK]] in `AnnSpec`. */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      nBits: Int = 8,
      probes: Int = 3,
      tables: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    bucketedTopK(queries, corpus, k, nBits, probes, tables, idCol, vecCol)(
      (v, t) => rhpBucket(v, nBits, t))

  /** [[lshTopK]] with MD5-parity hyperplanes ([[md5RhpBucket]]) instead of
    * xxhash64 ones: identical scale shape, but the plane coefficients are
    * reproducible in plain SQL, so THIS variant is hash-exact
    * DuckDB-oracle-verifiable end to end — approximation from bucketing,
    * zero approximation in the arithmetic. `dim` is the embedding
    * dimensionality (plane-table width); pass it from the data's fixed
    * dimension. */
  def mdLshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      dim: Int,
      nBits: Int = 8,
      probes: Int = 3,
      tables: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    bucketedTopK(queries, corpus, k, nBits, probes, tables, idCol, vecCol)(
      (v, t) => md5RhpBucket(v, nBits, t, dim))

  /** Training-set bound for the coarse quantizer: Lloyd iterates over at
    * most this many (hash-spread-sampled) vectors however large the
    * corpus — see [[KMeans.lloydCentroids]]. 1024 covers every test SF
    * corpus entirely (cap ≥ n ⇒ sample = corpus, bit-identical to
    * uncapped) while bounding training cost at real scale. */
  val TrainSampleCap = 1024

  /** IVF coarse-quantizer table `(cent_id, centv)` — k-means-trained when
    * `trainRounds > 0` (cent_id = cluster index), the raw lowest-id sample
    * otherwise (cent_id = vec_id). Tiny either way; callers broadcast it. */
  private[ops] def coarseQuantizer(
      corpus: DataFrame,
      nCentroids: Int,
      trainRounds: Int,
      idCol: String,
      vecCol: String): DataFrame =
    if (trainRounds > 0)
      KMeans.lloydCentroids(corpus, nCentroids, trainRounds, idCol, vecCol,
        sampleCap = TrainSampleCap)
        .select(col("cluster").as("cent_id"), col("cvq").as("centv"))
    else
      corpus.orderBy(col(idCol).asc).limit(nCentroids)
        .select(col(idCol).as("cent_id"), quantize(col(vecCol)).as("centv"))

  /** Embedding-cosine near-duplicate pairs over one table: all pairs with
    * quantized cosine >= `minCosX100`/100, restricted to a deterministic
    * sample when `sampleMod > 1` (bounds the oracle's quadratic cost).
    *
    * EXACT/ORACLE FORM ONLY: the broadcast self-join is O(N²) and exists
    * to give the DuckDB oracle something it can replicate on a bounded
    * sample. The production operator is [[cosineNearDupPairsLsh]] — same
    * exact threshold test, but candidate generation through hyperplane
    * buckets instead of all pairs.
    *
    * Threshold check is integer-exact and overflow-safe for unit-norm
    * vectors up to dim ~1e3 at 1e-3 quantization: dot <= 1e6 so
    * dot²·1e4 <= 1e16 < 2^63, and t²·n2a·n2b <= 1e4·1e6·1e6 = 1e16. */
  def cosineNearDupPairs(
      embeddings: DataFrame,
      minCosX100: Long = 90L,
      sampleMod: Long = 1L,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    val base = embeddings
      .filter(pmod(col(idCol), lit(sampleMod)) === 0)
      .select(col(idCol).as("id"), quantize(col(vecCol)).as("qv"))
      .withColumn("n2", call_function(GraftFunctions.DotLong, col("qv"), col("qv")))
    val pairs = base.as("a").join(broadcast(base.as("b")), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        call_function(GraftFunctions.DotLong, col("a.qv"), col("b.qv")).as("dot"),
        col("a.n2").as("n2_a"), col("b.n2").as("n2_b"))
    // cos >= t/100  ⇔  dot > 0 ∧ dot² * 1e4 >= t² * n2a * n2b
    pairs
      .filter(col("dot") > 0)
      .filter(col("dot") * col("dot") * lit(10000L) >=
        lit(minCosX100) * lit(minCosX100) * col("n2_a") * col("n2_b"))
      .select("id_a", "id_b", "dot", "n2_a", "n2_b")
  }

  /** IVF (inverted-file) approximate top-k: the classic two-level ANN —
    * a coarse quantizer assigns every corpus vector to its nearest
    * centroid's list; a query probes only the `nProbe` lists whose
    * centroids score highest, then reranks candidates exactly.
    *
    * The coarse quantizer is [[KMeans.lloydCentroids]]-TRAINED from the
    * deterministic lowest-id seed (`trainRounds` Lloyd update rounds;
    * `trainRounds = 0` degenerates to the raw seed sample). Training puts
    * centroids at cluster means, so a skewed corpus still yields balanced
    * inverted lists — the hot-list scan cost an untrained quantizer pays
    * at scale — while the deterministic seed keeps every step (assign →
    * mean-floor → re-assign) exactly replayable in SQL, so even the
    * TRAINED index keeps an exact DuckDB oracle.
    *
    * Scale shape: centroid table is tiny and broadcast everywhere; corpus
    * assignment is one broadcast-nested-loop pass + a partial-aggregated
    * argmax (one shuffle of (id, bucket) pairs); search joins the probe
    * lists on bucket — each query touches ~nProbe/nCentroids of the
    * corpus — and the final ranking goes through the same map-side
    * bounded-heap [[graft.expressions.TopKDot]] as brute force.
    * All integer math with fixed tiebreaks (higher dot first, lower id),
    * so Spark and DuckDB agree bit-for-bit. */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      trainRounds: Int = 1,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    GraftFunctions.register(queries.sparkSession)
    val cent = coarseQuantizer(corpus, nCentroids, trainRounds, idCol, vecCol)
    def scoredAgainstCentroids(df: DataFrame, id: String, qv: String) =
      df.crossJoin(broadcast(cent))
        .withColumn("cdot", call_function(GraftFunctions.DotLong, col(qv), col("centv")))
        .drop("centv")
    // corpus → nearest centroid (argmax dot, tie → lower cent_id);
    // max(struct) partial-aggregates, so only one row per vector shuffles.
    // spread: the |C|·K centroid dots run in the scan stage (round 11).
    val c = Dedup.spread(corpus)
      .select(col(idCol).as("neighbor_id"), quantize(col(vecCol)).as("cv"))
    val assigned = scoredAgainstCentroids(c, "neighbor_id", "cv")
      .groupBy("neighbor_id")
      .agg(
        max(struct(col("cdot").as("d"), (-col("cent_id")).as("nc"))).as("m"),
        first(col("cv")).as("cv"))
      .withColumn("bucket", -col("m.nc"))
      .select("neighbor_id", "bucket", "cv")
    // query → its nProbe best centroid lists (window over |Q|·K rows only)
    val q = queries.select(col(idCol).as("query_id"), quantize(col(vecCol)).as("qv"))
    val probeW = Window.partitionBy("query_id")
      .orderBy(col("cdot").desc, col("cent_id").asc)
    val probes = scoredAgainstCentroids(q, "query_id", "qv")
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= nProbe)
      .select(col("query_id"), col("qv"), col("cent_id").as("bucket"))
    val scored = assigned.join(broadcast(probes), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("dot", call_function(GraftFunctions.DotLong, col("qv"), col("cv")))
      .select("query_id", "neighbor_id", "dot")
    rankTopK(scored, k)
  }

  /** Scale path for cosine near-dup pairs: candidate pairs from `tables`
    * independent random-hyperplane bucketings (equijoin on (table,
    * bucket) — sub-quadratic, ~|N|²·tables/2^nBits comparisons on random
    * data), then the SAME exact integer threshold test as
    * [[cosineNearDupPairs]]. Every emitted pair is a true pair (the
    * rerank is exact); recall is tuned by (nBits, tables) — a pair at
    * angle θ collides in one table with prob (1−θ/π)^nBits, in any of
    * the tables with prob 1−(1−(1−θ/π)^nBits)^tables. Near-identical
    * duplicates (cos→1) collide in every table, so dedup-grade recall
    * ≈ 1 by construction.
    *
    * Shape at 100 TB: bucket explode (tables× row inflation of ids only),
    * one shuffle on (table, bucket), pair distinct, then two id-equijoins
    * to re-fetch vectors for the exact rerank — pairs ≪ corpus, so the
    * rerank joins are cheap. Not oracle-SQL-expressible (xxhash64
    * hyperplanes); AnnSpec pins subset-of-brute + planted-dup recall. */
  def cosineNearDupPairsLsh(
      embeddings: DataFrame,
      minCosX100: Long = 90L,
      nBits: Int = 8,
      tables: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    val base = embeddings
      .select(col(idCol).as("id"), quantize(col(vecCol)).as("qv"))
      .withColumn("n2", call_function(GraftFunctions.DotLong, col("qv"), col("qv")))
    val bucketed = base.select(col("id"), explode(array((0 until tables).map { t =>
      struct(lit(t).as("t"), rhpBucket(col("qv"), nBits, t).as("b"))
    }: _*)).as("tb"))
      .select(col("id"), col("tb.t").as("tbl"), col("tb.b").as("bucket"))
    val candidates = bucketed.as("a").join(bucketed.as("b"), Seq("tbl", "bucket"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val withVecs = candidates
      .join(base.select(col("id").as("id_a"), col("qv").as("qv_a"), col("n2").as("n2_a")), "id_a")
      .join(base.select(col("id").as("id_b"), col("qv").as("qv_b"), col("n2").as("n2_b")), "id_b")
      .withColumn("dot", call_function(GraftFunctions.DotLong, col("qv_a"), col("qv_b")))
    withVecs
      .filter(col("dot") > 0)
      .filter(col("dot") * col("dot") * lit(10000L) >=
        lit(minCosX100) * lit(minCosX100) * col("n2_a") * col("n2_b"))
      .select("id_a", "id_b", "dot", "n2_a", "n2_b")
  }

  /** IVF recall sweep: exact recall@k of the IVF index (same geometry as
    * [[ivfTopK]]) against the brute-force ground truth, at every probe
    * depth in `probeDepths` — the operator that answers "what nProbe do I
    * need", which is THE tuning question for an IVF index before a
    * corpus-scale rollout.
    *
    * Shape: one centroid assignment of the corpus, one query×centroid
    * ranking kept to max(probeDepths) rows per query, ONE candidate
    * scoring pass tagged with the probe rank `pr` of each candidate's
    * bucket; each depth then re-ranks the SAME candidate frame filtered to
    * `pr <= depth` through the bounded-heap top-k — ReuseExchange dedups
    * the shared scoring subtree across depths, so the sweep costs one
    * candidate pass plus |depths| heap reductions, never |depths| index
    * scans. Ground truth is [[bruteForceTopK]] (broadcast query side).
    * All-integer output: hits, n_brute, recall_x1k = 1000·hits/n_brute. */
  def recallSweep(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      nCentroids: Int = 16,
      probeDepths: Seq[Int] = Seq(1, 2, 4, 8),
      trainRounds: Int = 1,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(probeDepths.nonEmpty && probeDepths == probeDepths.sorted)
    GraftFunctions.register(queries.sparkSession)
    val cent = coarseQuantizer(corpus, nCentroids, trainRounds, idCol, vecCol)
    def scoredAgainstCentroids(df: DataFrame, qv: String) =
      df.crossJoin(broadcast(cent))
        .withColumn("cdot", call_function(GraftFunctions.DotLong, col(qv), col("centv")))
        .drop("centv")
    val c = corpus.select(col(idCol).as("neighbor_id"), quantize(col(vecCol)).as("cv"))
    val assigned = scoredAgainstCentroids(c, "cv")
      .groupBy("neighbor_id")
      .agg(
        max(struct(col("cdot").as("d"), (-col("cent_id")).as("nc"))).as("m"),
        first(col("cv")).as("cv"))
      .withColumn("bucket", -col("m.nc"))
      .select("neighbor_id", "bucket", "cv")
    val q = queries.select(col(idCol).as("query_id"), quantize(col(vecCol)).as("qv"))
    val probeW = Window.partitionBy("query_id")
      .orderBy(col("cdot").desc, col("cent_id").asc)
    val probes = scoredAgainstCentroids(q, "qv")
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= probeDepths.max)
      .select(col("query_id"), col("qv"), col("cent_id").as("bucket"), col("pr"))
    // checkpointTracked (round 12): cand feeds one rerank arm per probe
    // depth and truth joins every arm plus the denominator — uncached,
    // each arm re-ran the full candidate scoring scan and the brute-force
    // pass (AQE re-executes shared subtrees per consuming stage; the
    // round-12 JobProfile finding). Both frames are (query × bounded
    // candidates)-sized, never corpus².
    val cand = Dedup.checkpointTracked(assigned.join(broadcast(probes), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("dot", call_function(GraftFunctions.DotLong, col("qv"), col("cv")))
      .select("query_id", "neighbor_id", "dot", "pr"))
    val truth = Dedup.checkpointTracked(bruteForceTopK(queries, corpus, k, idCol, vecCol)
      .select("query_id", "neighbor_id"))
    val denom = truth.agg(count(lit(1)).as("n_brute"))
    val perDepth = probeDepths.map { np =>
      rankTopK(cand.filter(col("pr") <= np)
          .select("query_id", "neighbor_id", "dot"), k)
        .select("query_id", "neighbor_id")
        .join(truth, Seq("query_id", "neighbor_id"))
        .agg(count(lit(1)).as("hits"))
        .select(lit(np.toLong).as("nprobe"), col("hits"))
    }.reduce(_ unionAll _)
    perDepth.crossJoin(broadcast(denom))
      .select(col("nprobe"), col("hits"), col("n_brute"),
        expr("CASE WHEN n_brute = 0 THEN 0L ELSE (1000 * hits) div n_brute END")
          .as("recall_x1k"))
      .orderBy("nprobe")
  }
}
