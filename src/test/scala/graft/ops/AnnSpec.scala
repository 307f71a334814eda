package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.VectorFunctions._
import graft.ops.Ann

/** Similarity-search tests: brute-force exactness on a hand-checkable set,
  * LSH recall against brute force on seeded random vectors. */
class AnnSpec extends SparkSpec {

  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("quantize/qdot/qnorm2 integer math") {
    val r = Seq((1L, Seq(0.5f, -0.25f), Seq(1.0f, 1.0f)))
      .toDF("id", "a", "b")
      .select(
        quantize(col("a")).as("qa"),
        qdot(quantize(col("a")), quantize(col("b"))).as("dot"),
        qnorm2(quantize(col("a"))).as("n2"))
      .collect()(0)
    assert(r.getSeq[Long](0) == Seq(500L, -250L))
    assert(r.getLong(1) == 500L * 1000 - 250L * 1000)
    assert(r.getLong(2) == 500L * 500 + 250L * 250)
  }

  test("brute-force top-k ranks by dot, deterministic tiebreak") {
    val q = vecs(0L -> Seq(1f, 0f))
    val c = vecs(
      1L -> Seq(1f, 0f), // dot 1e6
      2L -> Seq(0.5f, 0.5f), // dot 5e5
      3L -> Seq(0f, 1f), // dot 0
      4L -> Seq(-1f, 0f)) // dot -1e6
    val out = Ann.bruteForceTopK(q, c, k = 3).orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 1L), (2L, 2L), (3L, 3L)))
  }

  test("LSH top-k achieves >=60% recall@10 vs brute force on seeded vectors") {
    val rnd = new scala.util.Random(7)
    def unit(): Seq[Float] = {
      val v = Array.fill(16)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
      v.map(_ / n).toSeq
    }
    val corpus = vecs((0L until 300L).map(i => i -> unit()): _*)
    val queries = corpus.filter(col("vec_id") % 30 === 0)
    val exact = Ann.bruteForceTopK(queries, corpus, k = 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ann.lshTopK(queries, corpus, k = 10, nBits = 4, probes = 3, tables = 2)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall=$recall")
  }

  test("cosine near-dup pairs: planted duplicate found, orthogonal not") {
    val out = Ann.cosineNearDupPairs(
      vecs(
        1L -> Seq(0.6f, 0.8f),
        2L -> Seq(0.6f, 0.8f), // exact dup of 1
        3L -> Seq(0.8f, -0.6f)), // orthogonal
      minCosX100 = 90L)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 2L)))
  }
}
