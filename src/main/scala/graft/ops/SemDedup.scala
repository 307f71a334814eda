package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.expressions.GraftFunctions
import graft.functions.VectorFunctions._

/** SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster the
  * embedding space with k-means, then search for near-duplicate pairs ONLY
  * within each cluster — the cluster assignment bounds the quadratic
  * pair search that makes corpus-wide cosine dedup infeasible (the same
  * role LSH bands play for [[Dedup]]'s MinHash path, but driven by the
  * semantic geometry an embedding model already paid for). Near-duplicate
  * pairs that straddle a cluster boundary are missed — the recall/cost
  * trade the SemDeDup design accepts (identical vectors can never split:
  * assignment is a pure function of the vector).
  *
  * Decision rule (deterministic): a vector is DROPPED iff some lower-id
  * vector in its cluster has cosine ≥ threshold with it — the keep-first
  * tie-break every dedup operator in this engine uses (q15/q33/q86), so
  * redelivery/retry cannot flap a verdict. Cosine is compared in exact
  * integer arithmetic on quantized vectors (`dot² · 10⁴ ≥ t² · |a|²·|b|²`,
  * see [[Ann.cosineNearDupPairs]]) — no float ever crosses an engine
  * boundary, which is what keeps the k-means + pair search + verdict
  * pipeline hash-exact against the driver's SQL oracle.
  *
  * Scale shape: one Lloyd training pass ([[KMeans.lloydAssign]] — corpus
  * never shuffles, centroids broadcast), then ONE equi-join on `cluster`.
  * Pair work is Σ|cluster|², so k is a scale knob: SemDeDup at corpus
  * scale runs k ∝ N/target-cluster-size (the paper uses ~100k clusters
  * for web-scale corpora); the per-cluster quadratic then stays bounded
  * regardless of N. Skewed clusters are the AQE skew-join case (both
  * sides of the self-join shuffle on the same key).
  */
object SemDedup {

  /** Per-vector verdict: `(vec_id, cluster, n_close_lower, dup_of, kept)`
    * — `dup_of` = the lowest-id close neighbor below it (−1 if none),
    * `kept` = 1 iff no lower-id close neighbor exists. */
  def semDeDup(
      embeddings: DataFrame,
      k: Int,
      iters: Int,
      minCosX100: Long,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    val assign = KMeans.lloydAssign(embeddings, k, iters, idCol, vecCol)
    val base = embeddings
      .select(col(idCol).as("id"), quantize(col(vecCol)).as("qv"))
      .withColumn("n2", call_function(GraftFunctions.DotLong, col("qv"), col("qv")))
      .join(assign, "id")
    val lo = base.select(col("cluster"), col("id").as("id_a"),
      col("qv").as("qv_a"), col("n2").as("n2_a"))
    val hi = base.select(col("cluster"), col("id").as("id_b"),
      col("qv").as("qv_b"), col("n2").as("n2_b"))
    val close = lo.join(hi, "cluster")
      .filter(col("id_a") < col("id_b"))
      .withColumn("dot",
        call_function(GraftFunctions.DotLong, col("qv_a"), col("qv_b")))
      // cos ≥ t/100 ⇔ dot > 0 ∧ dot²·10⁴ ≥ t²·n2a·n2b (exact integers)
      .filter(col("dot") > 0 &&
        col("dot") * col("dot") * lit(10000L) >=
          lit(minCosX100 * minCosX100) * col("n2_a") * col("n2_b"))
    val drops = close.groupBy(col("id_b").as("id"))
      .agg(count(lit(1)).as("n_close_lower"), min("id_a").as("dup_of"))
    base.join(drops, Seq("id"), "left")
      .select(col("id").as("vec_id"), col("cluster"),
        coalesce(col("n_close_lower"), lit(0L)).as("n_close_lower"),
        coalesce(col("dup_of"), lit(-1L)).as("dup_of"),
        col("n_close_lower").isNull.cast("int").as("kept"))
  }
}
