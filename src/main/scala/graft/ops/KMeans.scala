package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Deterministic Lloyd's k-means over integer-quantized embeddings — the
  * clustering step an embedding pipeline runs to TRAIN an IVF coarse
  * quantizer (the [[Ann]] IVF path samples its centroids; this refines
  * them) or to build topic/domain buckets for mixture weighting.
  *
  * Everything is exact integer / IEEE-double arithmetic on quantized
  * vectors, so the result is reproducible across engines and the driver's
  * SQL oracle can verify an iterative ML loop end-to-end:
  *   - init: the k first vectors in `(md5(id), id)` order — a
  *     deterministic hash-spread sample (see [[lloydCentroids]]);
  *   - assign: crossJoin(broadcast(centroids)) + exact `qdist2`, argmin by
  *     (distance, cluster id) so ties never flap;
  *   - update: posexplode to (cluster, dim) — one partial-aggregated
  *     shuffle of k·dim cells, NOT a whole-vector regroup — then
  *     `floor(sum/count)` per component (double division of exact longs:
  *     bit-identical everywhere).
  *
  * Scale shape: per iteration, the corpus is touched by ONE broadcast
  * crossJoin (k·dim longs ≪ memory for any sane k) and one explode-
  * aggregate whose reduce side is k·dim rows. The corpus itself never
  * shuffles; iterations grow the plan linearly (2–5 Lloyd rounds — the
  * IVF-training regime — keeps it trivially small; for many rounds,
  * checkpoint centroids per round like [[Graph.connectedComponents]]).
  */
object KMeans {

  private def quantized(embs: DataFrame, idCol: String, vecCol: String) =
    embs.select(col(idCol).as("id"), quantize(col(vecCol)).as("vq"))

  // In-row argmin against a ONE-ROW broadcast centroid array (round 11):
  // the former k-row crossJoin + groupBy(id) min_by re-shuffled the corpus
  // by id EVERY iteration (narrow rows, but a corpus-sized exchange the
  // object doc promised not to pay). Collapsing the centroids to one
  // array row makes assignment a pure map: per vector, sort the
  // (qdist2, cluster) struct array and take the head — identical argmin
  // and tie-break to min_by(struct(cluster, vq), struct(d2, cluster)).
  // Assumes unique ids (the old groupBy(id) collapsed duplicates; this
  // keeps one row per INPUT row — every caller feeds a keyed embedding
  // table, where the two coincide). Empty-centroid edge (ADVICE r11):
  // element_at over an empty centroid array would yield a null cluster
  // per vector and update() would fold those into a spurious null
  // centroid — UNREACHABLE in every caller, because the centroid table
  // is always seeded/trained from the SAME frame being assigned
  // (lloydCentroids' limit(k) is empty only when the corpus is, and then
  // there are no vector rows to mis-assign). Documented rather than
  // guarded: a runtime filter on the computed cluster column made
  // Catalyst evaluate the per-row k·dim argmin sort twice, and even a
  // 1-row guard on the broadcast side measurably perturbed the family's
  // plans (round-12 A/B: +0.2-0.4 s on q65/q95/q368).
  private def assign(vq: DataFrame, c: DataFrame): DataFrame = {
    val carr = c.agg(collect_list(struct(col("cluster"), col("cvq"))).as("__cs"))
    vq.crossJoin(broadcast(carr))
      .select(col("id"),
        element_at(array_sort(transform(col("__cs"),
          cc => struct(qdist2(col("vq"), cc.getField("cvq")).as("d2"),
            cc.getField("cluster").as("cluster")))), 1)
          .getField("cluster").as("cluster"),
        col("vq"))
  }

  private def update(a: DataFrame): DataFrame =
    a.select(col("cluster"), posexplode(col("vq")).as(Seq("pos", "v")))
      .groupBy("cluster", "pos")
      .agg(floor(sum("v").cast("double") / count(lit(1))).cast("long").as("cv"))
      .groupBy("cluster")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cv")))),
        s => s.getField("cv")).as("cvq"))

  /** The TRAINED centroid table `(cluster, cvq)` after `rounds` Lloyd
    * update rounds from a deterministic HASH-SPREAD seed (`rounds = 0`
    * returns the seed itself): the k first vectors in `(md5(id), id)`
    * order — a reproducible uniform sample, so an adversarially ordered
    * corpus (all low ids inside one tight cluster) still seeds every
    * region, where a lowest-id seed would strand Lloyd in a merged-list
    * local optimum. This is the coarse-quantizer trainer the IVF build
    * ([[Ann.ivfTopK]], [[AnnIndex.build]]) consumes: trained centroids
    * sit at cluster means, so a skewed corpus yields balanced inverted
    * lists. md5-of-decimal-string is the same function in Spark and
    * DuckDB, so seed AND training replay exactly in SQL. Clusters that
    * lose every member during a round are dropped (both engines replay
    * that the same way). */
  /** `sampleCap > 0` bounds the TRAINING set to the first `sampleCap`
    * vectors in the same `(md5(id), id)` order the seed uses — a
    * deterministic uniform sample, so Lloyd's per-round cost is
    * O(sampleCap·k·dim) REGARDLESS of corpus size (the FAISS practice:
    * quantizer statistics converge on a bounded sample; only the single
    * list-assignment pass touches the full corpus). `sampleCap = 0`
    * trains on everything; a cap ≥ corpus size is exactly equivalent to
    * no cap (the sample is the whole corpus). Still SQL-replayable. */
  def lloydCentroids(
      embs: DataFrame,
      k: Int,
      rounds: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      sampleCap: Int = 0): DataFrame = {
    require(rounds >= 0, "rounds must be non-negative")
    val all = quantized(embs, idCol, vecCol)
    val seedKey = md5(col("id").cast("string").cast("binary"))
    val vq = if (sampleCap > 0) all.orderBy(seedKey, col("id")).limit(sampleCap) else all
    // k rows by construction: the bounded-input window is safe (pmod key —
    // non-foldable constant, see Relational.globalIndex — keeps WindowExec
    // from planning a move-everything spec)
    var cents = vq.orderBy(seedKey, col("id")).limit(k)
      .withColumn("cluster",
        (row_number().over(
          Window.partitionBy(pmod(col("id"), lit(1))).orderBy(seedKey, col("id"))) - 1)
          .cast("long"))
      .select(col("cluster"), col("vq").as("cvq"))
    for (_ <- 0 until rounds) cents = update(assign(vq, cents))
    cents
  }

  /** Cluster assignment after `iters` Lloyd assignment rounds (with
    * `iters - 1` centroid updates in between). Returns (id, cluster). */
  def lloydAssign(
      embs: DataFrame,
      k: Int,
      iters: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(iters >= 1, "at least one assignment round")
    assign(quantized(embs, idCol, vecCol),
      lloydCentroids(embs, k, iters - 1, idCol, vecCol))
      .select(col("id"), col("cluster"))
  }
}
