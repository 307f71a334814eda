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
  *   - init: the k lowest-id vectors (deterministic seed — swap in a
  *     hash-sampled set for production variety, same shape);
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

  /** Cluster assignment after `iters` Lloyd assignment rounds (with
    * `iters - 1` centroid updates in between). Returns (id, cluster). */
  def lloydAssign(
      embs: DataFrame,
      k: Int,
      iters: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(iters >= 1, "at least one assignment round")
    val vq = embs.select(col(idCol).as("id"), quantize(col(vecCol)).as("vq"))
    // k rows by construction: the bounded-input window is safe (pmod key —
    // non-foldable constant, see Relational.globalIndex — keeps WindowExec
    // from planning a move-everything spec)
    var cents = vq.orderBy("id").limit(k)
      .withColumn("cluster",
        (row_number().over(
          Window.partitionBy(pmod(col("id"), lit(1))).orderBy("id")) - 1)
          .cast("long"))
      .select(col("cluster"), col("vq").as("cvq"))

    // the argmin carries the vector through, so the centroid update never
    // joins the corpus back to the assignment (that join would be a
    // corpus-size shuffle join per iteration); map-side combine reduces
    // the k candidate rows per id to one before the groupBy shuffle
    def assign(c: DataFrame): DataFrame =
      vq.crossJoin(broadcast(c))
        .withColumn("__d2", qdist2(col("vq"), col("cvq")))
        .groupBy("id")
        .agg(min_by(struct(col("cluster"), col("vq")),
          struct(col("__d2"), col("cluster"))).as("__best"))
        .select(col("id"), col("__best.cluster").as("cluster"),
          col("__best.vq").as("vq"))

    var a = assign(cents)
    for (_ <- 1 until iters) {
      cents = a
        .select(col("cluster"), posexplode(col("vq")).as(Seq("pos", "v")))
        .groupBy("cluster", "pos")
        .agg(floor(sum("v").cast("double") / count(lit(1))).cast("long").as("cv"))
        .groupBy("cluster")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("cv")))),
          s => s.getField("cv")).as("cvq"))
      a = assign(cents)
    }
    a.select(col("id"), col("cluster"))
  }
}
