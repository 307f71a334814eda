package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Connected-components / dup-cluster operator contracts, pinned against a
  * driver-side union-find on small random graphs (the operator itself never
  * collects; the reference implementation here may). */
class GraphSpec extends SparkSpec {

  import spark.implicits._

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map((0L until n.toLong).map(i => i -> i): _*)
    def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) => parent(find(a)) = find(b) }
    // canonicalize to min member per root
    (0L until n.toLong).map(i => i -> find(i))
      .groupBy(_._2).values
      .flatMap { m => val mn = m.map(_._1).min; m.map(_._1 -> mn) }.toMap
  }

  test("connectedComponents labels a chain, a triangle and singletons correctly") {
    // components: {0,1,2,3} (chain), {10,11,12} (triangle), 20 isolated via no edge
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (10L, 12L))
      .toDF("id_a", "id_b")
    val got = Graph.connectedComponents(edges).as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("connectedComponents == union-find on random graphs (ScalaCheck)") {
    import org.scalacheck.{Gen, Test => SCTest}
    import org.scalacheck.Prop.forAll
    val gen: Gen[(Int, List[(Long, Long)])] = for {
      n <- Gen.choose(2, 30)
      nEdges <- Gen.choose(1, 40)
      edges <- Gen.listOfN(nEdges, for {
        a <- Gen.choose(0, n - 1)
        b <- Gen.choose(0, n - 1)
      } yield (math.min(a, b).toLong, math.max(a, b).toLong))
    } yield (n, edges.filter(e => e._1 != e._2).distinct)
    val prop = forAll(gen) { case (n, edges) =>
      edges.isEmpty || {
        val got = Graph.connectedComponents(edges.toDF("id_a", "id_b"))
          .as[(Long, Long)].collect().toMap
        val want = unionFind(n, edges)
        // the operator only labels nodes that appear in an edge
        val touched = edges.flatMap(e => Seq(e._1, e._2)).toSet
        got == want.view.filterKeys(touched).toMap
      }
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(r.passed, r.status.toString)
  }

  test("dupClusters keeps singletons, sizes and canonical flags consistent") {
    val docs = (0L to 9L).toDF("doc_id")
    val pairs = Seq((1L, 3L), (3L, 5L), (7L, 8L)).toDF("id_a", "id_b")
    val out = Graph.dupClusters(docs, pairs)
      .select("doc_id", "component_id", "cluster_size", "is_canonical")
      .as[(Long, Long, Long, Int)].collect().sortBy(_._1)
    val byDoc = out.map(r => r._1 -> r).toMap
    assert(byDoc(1L) == (1L, 1L, 3L, 1))
    assert(byDoc(3L) == (3L, 1L, 3L, 0))
    assert(byDoc(5L) == (5L, 1L, 3L, 0))
    assert(byDoc(7L) == (7L, 7L, 2L, 1))
    assert(byDoc(8L) == (8L, 7L, 2L, 0))
    // untouched docs are their own singleton cluster
    Seq(0L, 2L, 4L, 6L, 9L).foreach { d => assert(byDoc(d) == (d, d, 1L, 1)) }
    assert(out.length == 10)
  }

  test("connectedComponents throws instead of returning partial labels at the cap") {
    // path of length 12 needs ~11 propagation rounds; maxIter=3 must fail
    // LOUDLY (silently truncated labels would corrupt cluster canonicals)
    val pairs = (0L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val ex = intercept[IllegalStateException] {
      Graph.connectedComponents(pairs, maxIter = 3).count()
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("dupClusters converges on a long path (diameter > 1 iteration)") {
    // path 0-1-2-...-19: worst-case diameter for min propagation
    val docs = (0L to 19L).toDF("doc_id")
    val pairs = (0L until 19L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Graph.dupClusters(docs, pairs)
    assert(out.filter(col("component_id") === 0L).count() == 20)
    assert(out.filter(col("is_canonical") === 1).count() == 1)
  }

  /** Reference k-core: iterative peel on an adjacency map, driver-side. */
  private def bruteKCore(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    var adj = edges.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e, e.swap)).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var changed = true
    while (changed) {
      val drop = adj.collect { case (n, nb) if nb.size < k => n }.toSet
      changed = drop.nonEmpty
      adj = (adj -- drop).view.mapValues(_ -- drop).toMap.filter(_._2.nonEmpty)
    }
    adj.map { case (n, nb) => n -> nb.size.toLong }
  }

  test("kCore: triangle with a pendant — 2-core keeps the triangle, drops the pendant") {
    val edges = Seq((0L, 1L), (1L, 2L), (0L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val got = Graph.kCore(edges, k = 2).as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 2L, 1L -> 2L, 2L -> 2L))
    // chain collapse: peeling the pendant re-exposes new pendants round by round
    val chain = (0L until 6L).sliding(2).map(s => (s(0), s(1))).toSeq.toDF("id_a", "id_b")
    assert(Graph.kCore(chain, k = 2).count() == 0)
  }

  test("kCore matches the driver-side peel on seeded random graphs, incl. multi-edges") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 14
      val edges = Seq.fill(30)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)) ++
        Seq((1L, 1L), (2L, 3L), (2L, 3L)) // self-loop + multi-edge hygiene
      val k = 2 + trial % 2
      val got = Graph.kCore(edges.toDF("id_a", "id_b"), k).as[(Long, Long)].collect().toMap
      assert(got == bruteKCore(edges, k), s"trial $trial k=$k")
    }
  }

  test("iterative loops release superseded checkpoint blocks (bounded persistent RDDs)") {
    // a 12-node chain peels one pendant pair per round under k=2 — many
    // rounds, so unreleased per-round checkpoints would pile up here
    val chain = (0L until 12L).sliding(2).map(s => (s(0), s(1))).toSeq.toDF("id_a", "id_b")
    // delta-count: the suite session is shared across specs in a full
    // test run, so only the RDDs these two loops ADD are in scope
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Graph.kCore(chain, k = 2).count()
    Graph.connectedComponents(chain).count()
    val added = spark.sparkContext.getPersistentRDDs.keySet.diff(before).size
    // kept: at most the final round of each loop (+ CC's symmetric edge
    // set, which backs the returned labels' lineage) — NOT one per round
    assert(added <= 6, s"expected bounded persistent RDDs, got $added new")
  }
}
