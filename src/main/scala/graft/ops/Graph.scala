package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph operators for duplicate-cluster resolution: near-dup PAIRS (from
  * [[Dedup.minhashLshPairs]] / [[Dedup.simhashPairs]] / [[Dedup.jaccardPairs]])
  * are only half the dedup story — a training-data pipeline must then group
  * pairs into clusters and keep one canonical document per cluster, which is
  * connected components over the pair graph.
  *
  * Spark-first shape: iterative min-label propagation as a driver loop over
  * DataFrames (the Pregel pattern), `localCheckpoint` per iteration to
  * truncate lineage. Each iteration is one join + one partial-aggregated
  * groupBy, both shuffling on node id only — the edge list (pairs ≪ corpus)
  * is what iterates, never the corpus. Converges in O(graph diameter)
  * rounds; near-dup clusters are dense (a dup of A is usually a dup of B),
  * so diameter is small in practice — the same observation that makes
  * plain label propagation the standard first choice before the
  * O(log n)-round two-phase schemes (hash-to-min / small-star–large-star,
  * Rastogi et al., "Finding Connected Components in Map-Reduce").
  *
  * On a real cluster, swap `localCheckpoint` (block-manager backed, lost if
  * an executor dies) for `checkpoint` with a reliable checkpoint dir.
  */
object Graph {

  /** Connected components of the undirected graph given by `edges`
    * `(srcCol, dstCol)`. Returns one row per distinct node:
    * `(id, component_id)` with `component_id` = min node id reachable.
    *
    * `maxIter` is a SAFETY CAP, not a result parameter: the loop exits at
    * the fixpoint (no label changed — detected on the already-materialized
    * checkpoint, so the extra action is a local scan, not a recompute), and
    * hitting the cap without converging THROWS rather than returning
    * partial labels. Long near-dup chains (templated/shifting documents)
    * can exceed any fixed diameter bound at corpus scale, and silently
    * truncated labels would corrupt every cluster-canonical decision
    * downstream; a loud failure tells the operator to raise the cap.
    */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String = "id_a",
      dstCol: String = "id_b",
      maxIter: Int = 50): DataFrame = {
    // materialize the edge list BEFORE symmetrizing: union's two branches
    // are separate plan subtrees, so an un-materialized `edges` (often an
    // expensive LSH pair pipeline) would execute twice; after this the
    // loop re-reads checkpointed blocks only
    val e = edges.select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .localCheckpoint(eager = true)
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(eager = true)
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(eager = true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // min over the neighbors' labels, seen from each node
      val incoming = sym
        .join(labels.select(col("id").as("dst"), col("comp").as("nbr_comp")), "dst")
        .groupBy("src").agg(min("nbr_comp").as("nbr_min"))
        .select(col("src").as("id"), col("nbr_min"))
      val next = labels
        .join(incoming, Seq("id"), "left")
        .select(col("id"), col("comp").as("prev_comp"),
          least(col("comp"), coalesce(col("nbr_min"), col("comp"))).as("comp"))
        .localCheckpoint(eager = true)
      converged = next.filter(col("comp") < col("prev_comp")).isEmpty
      labels = next.select("id", "comp")
      iter += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge within maxIter=$maxIter label-propagation " +
        "rounds (component diameter exceeds the cap); partial labels would be wrong — " +
        "raise maxIter")
    labels.select(col("id"), col("comp").as("component_id"))
  }

  /** Duplicate-cluster resolution over a document table: label every doc
    * with its near-dup cluster (docs in no pair are their own singleton
    * cluster), the cluster size, and the keep-first canonical flag
    * (canonical = min doc id in the cluster — the doc a dedup stage keeps).
    *
    * Output: `(doc_id, component_id, cluster_size, is_canonical)`.
    */
  def dupClusters(
      docs: DataFrame,
      pairs: DataFrame,
      idCol: String = "doc_id",
      srcCol: String = "id_a",
      dstCol: String = "id_b"): DataFrame = {
    val comp = connectedComponents(pairs, srcCol, dstCol)
    val labeled = docs.select(col(idCol).cast("long").as("doc_id"))
      .join(comp.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .withColumn("component_id", coalesce(col("component_id"), col("doc_id")))
    val sizes = labeled.groupBy("component_id").agg(count(lit(1)).as("cluster_size"))
    labeled.join(sizes, "component_id")
      .withColumn("is_canonical", (col("doc_id") === col("component_id")).cast("int"))
      .select("doc_id", "component_id", "cluster_size", "is_canonical")
  }
}
