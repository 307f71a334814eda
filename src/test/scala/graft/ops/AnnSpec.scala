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

  test("md5PlaneSigns matches engine-side md5 parity (the oracle's sign rule)") {
    // the driver-side MessageDigest table and Spark's md5() must agree,
    // or the DuckDB oracle (which uses SQL md5) would diverge from the
    // literal-array plane the Spark plan ships
    val planes = for (p <- 0 until 8; i <- 0 until 16) yield (p, i)
    val fromSql = planes.toDF("p", "i")
      .select(col("p"), col("i"),
        when(substring(md5(concat_ws(":", col("p"), col("i"))), 1, 1)
          .isin("0", "2", "4", "6", "8", "a", "c", "e"), 1L).otherwise(-1L).as("s"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    planes.foreach { case (p, i) =>
      assert(md5PlaneSigns(p, 16)(i) == fromSql((p, i)),
        s"sign mismatch at plane=$p coord=$i")
    }
  }

  test("md5-plane LSH top-k achieves >=60% recall@10 vs brute force on seeded vectors") {
    val rnd = new scala.util.Random(11)
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
    val approx = Ann.mdLshTopK(queries, corpus, k = 10, dim = 16,
      nBits = 4, probes = 3, tables = 2)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall=$recall")
    // every emitted neighbor must carry the EXACT dot (rerank is exact):
    // approx results are a subset of the brute-force scored universe
    val dots = Ann.mdLshTopK(queries, corpus, k = 10, dim = 16,
      nBits = 4, probes = 3, tables = 2)
      .select("query_id", "neighbor_id", "dot")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val exactDots = Ann.bruteForceTopK(queries, corpus, k = 300)
      .select("query_id", "neighbor_id", "dot")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    dots.foreach { case (k2, d) =>
      assert(exactDots.get(k2).forall(_ == d), s"dot mismatch for $k2")
    }
  }

  test("IVF top-k: valid ranks, reasonable recall vs brute force") {
    val rnd = new scala.util.Random(19)
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
    val ivf = Ann.ivfTopK(queries, corpus, k = 10, nCentroids = 16, nProbe = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // ranks are dense 1..k per query
    ivf.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.size), s"ranks not dense for $q")
    }
    val recall = (exact & ivf.map(t => (t._1, t._3)).toSet).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall=$recall")
  }

  test("LSH cosine pairs: subset of brute force, full recall on planted dups") {
    val rnd = new scala.util.Random(11)
    def unit(): Array[Float] = {
      val v = Array.fill(16)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
      v.map(_ / n)
    }
    // 20 planted near-duplicate clusters (base + tiny perturbation) in a
    // sea of 160 unrelated vectors
    val clusters = (0 until 20).map { c =>
      val base = unit()
      val dup = base.map(x => x + (rnd.nextGaussian() * 0.01).toFloat)
      Seq((c * 2L) -> base.toSeq, (c * 2L + 1) -> dup.toSeq)
    }
    val noise = (1000L until 1160L).map(i => i -> unit().toSeq)
    val all = vecs((clusters.flatten ++ noise): _*)
    val brute = Ann.cosineNearDupPairs(all, minCosX100 = 95L)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Ann.cosineNearDupPairsLsh(all, minCosX100 = 95L, nBits = 8, tables = 4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact rerank ⇒ no false positives, ever
    assert((lsh -- brute).isEmpty, s"LSH emitted non-pairs: ${lsh -- brute}")
    // near-identical dups collide in every table ⇒ all planted pairs found
    val planted = (0 until 20).map(c => (c * 2L, c * 2L + 1)).toSet
    assert(planted.subsetOf(brute), "planted pairs must pass the exact threshold")
    assert(planted.subsetOf(lsh), s"LSH missed planted dups: ${planted -- lsh}")
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

  test("label propagation flags a planted mislabel inside a tight cluster") {
    // two tight clusters; id 3 sits in cluster A but carries B's label.
    // nProbe = nCentroids so the kNN search is exhaustive regardless of
    // how the coarse quantizer splits the space.
    val rows =
      (0L until 8L).map(i =>
        (i, Seq(1.0f, 0.01f * i, 0.0f, 0.0f), if (i == 3L) 1 else 0)) ++
      (10L until 18L).map(i =>
        (i, Seq(0.01f * (i - 10), 1.0f, 0.0f, 0.0f), 1))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val out = graft.queries.OlapQueries
      .labelPropagation(emb, nCentroids = 2, nProbe = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size == 16)
    assert(out(3L).getAs[Long]("prop_label") == 0L) // neighbors outvote it
    assert(out(3L).getAs[Int]("agree") == 0)
    assert(out(3L).getAs[Long]("n_votes") == 5L) // unanimous 5-NN vote
    (rows.map(_._1).toSet - 3L).foreach { id =>
      assert(out(id).getAs[Int]("agree") == 1, s"vec $id should agree")
    }
  }
}
