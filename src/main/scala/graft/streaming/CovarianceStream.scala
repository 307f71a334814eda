package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuous covariance-moment maintenance + derived dominant
  * direction — the streaming form of
  * [[graft.queries.RiskQueries.q300_principal_direction]] (X332).
  *
  * The trick that makes PC1 streamable exactly: the power iteration
  * needs only the raw second-moment table S_ij = Σ x_i·x_j plus the
  * marginals — and those are PLAIN SUMS, maintained by Spark's own
  * update-mode streaming aggregation with exactly-once per-batch
  * semantics (no custom state function at all). Each arriving vector is
  * augmented with a constant dimension x₀ = 1, so ONE (i ≤ j) pair
  * aggregate carries everything: S₀₀ = n, S₀ⱼ = Σxⱼ, Sᵢⱼ = Σxᵢxⱼ.
  * State is the d(d+1)/2 + d + 1 key space — bounded by the embedding
  * dimensionality, independent of corpus size.
  *
  * [[pc1FromMoments]] then replays q300's EXACT arithmetic off the
  * moment table via the integer identity
  * Σ(xᵢ−mᵢ)(xⱼ−mⱼ) = Sᵢⱼ − mᵢS₀ⱼ − mⱼS₀ᵢ + n·mᵢmⱼ  (m = floor mean),
  * so the streamed report equals the batch q300 bit-for-bit —
  * CovarianceStreamSpec pins both (moments ≡ batch sums over arbitrary
  * batch splits; derived PC1 ≡ the direct two-round power iteration).
  */
object CovarianceStream {

  /** Update-mode streaming aggregate of the augmented upper-triangle
    * moments. `vectors` needs (vec_id, embedding array<float|double>);
    * output rows are (i, j, s) with 0 ≤ i ≤ j ≤ d. */
  def moments(vectors: DataFrame): DataFrame = {
    val q = graft.functions.VectorFunctions.quantize(col("embedding"))
    // explode i, then re-explode the (still attached) augmented array
    // for j ≥ i — the marginals and n ride the x₀ = 1 dimension
    val pairs = vectors
      .select(concat(array(lit(1L)), q).as("v"))
      .select(posexplode(col("v")).as(Seq("i", "xi")), col("v"))
      .select(col("i").cast("long").as("i"), col("xi"),
        posexplode(col("v")).as(Seq("j", "xj")))
      .filter(col("j") >= col("i"))
      .select(col("i"), col("j").cast("long").as("j"),
        (col("xi") * col("xj")).as("p"))
    pairs.groupBy("i", "j").agg(sum("p").as("s"))
  }

  /** q300's two-round power iteration replayed EXACTLY from the moment
    * table: centered products by the integer identity, floor means,
    * IEEE-stable ×1000 rescale. Returns (dim, pc1_x1000), dims 1-based. */
  def pc1FromMoments(moments: DataFrame, rounds: Int = 2): DataFrame = {
    val n = moments.filter(col("i") === 0L && col("j") === 0L)
      .select(col("s").as("n"))
    val marg = moments.filter(col("i") === 0L && col("j") > 0L)
      .select(col("j").as("dim"), col("s").as("sx"))
      .crossJoin(broadcast(n))
      .withColumn("m", floor(col("sx").cast("double") / col("n")).cast("long"))
    // full symmetric centered matrix C (d² rows — dimensionality-bounded)
    val upper = moments.filter(col("i") > 0L)
      .select(col("i"), col("j"), col("s"))
    val sym = upper.unionByName(
      upper.filter(col("i") =!= col("j"))
        .select(col("j").as("i"), col("i").as("j"), col("s")))
    val c = sym
      .join(broadcast(marg.select(col("dim").as("i"), col("sx").as("sxi"),
        col("m").as("mi"))), "i")
      .join(broadcast(marg.select(col("dim").as("j"), col("sx").as("sxj"),
        col("m").as("mj"))), "j")
      .crossJoin(broadcast(n))
      .select(col("i"), col("j"),
        (col("s") - col("mi") * col("sxj") - col("mj") * col("sxi")
          + col("n") * col("mi") * col("mj")).as("c"))
    var v = marg.select(col("dim"), lit(1000L).as("v"))
    (1 to rounds).foreach { _ =>
      val w = c.join(broadcast(v.select(col("dim").as("j"), col("v"))), "j")
        .groupBy(col("i").as("dim")).agg(sum(col("c") * col("v")).as("w"))
      val mw = w.agg(max(abs(col("w"))).as("mw"))
      v = w.crossJoin(broadcast(mw))
        .select(col("dim"),
          floor(lit(1000.0) * col("w") / col("mw")).cast("long").as("v"))
    }
    v.select(col("dim"), col("v").as("pc1_x1000")).orderBy("dim")
  }
}
