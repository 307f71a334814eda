package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Wave-9 flow operators: structural invariants. */
class FlowSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("q130 compaction: no two consecutive kept events share a type") {
    val rows = FlowQueries.q130_changelog_compaction(spark, sfDir)
      .collect().groupBy(_.getLong(0))
    assert(rows.nonEmpty)
    rows.foreach { case (_, evs) =>
      val ordered = evs.sortBy(_.getLong(4))
      // change_seq is dense 1..n per user
      assert(ordered.map(_.getLong(4)).toSeq == (1L to ordered.length).toSeq)
      ordered.map(_.getString(3)).sliding(2).foreach {
        case Array(a, b) => assert(a != b, "adjacent kept events must differ")
        case _ =>
      }
    }
  }

  test("q131 PageRank: floor per node, mass bounded by damped total") {
    val prs = FlowQueries.q131_pagerank(spark, sfDir).collect().map(_.getLong(1))
    val n = prs.length
    val base = 15L * FlowQueries.PrScale / 100L
    assert(prs.forall(_ >= base), "every node holds at least the teleport mass")
    // total mass can only shrink (integer floors + dropped dangling mass)
    assert(prs.sum <= n.toLong * FlowQueries.PrScale,
      "damped total must not exceed the initial mass")
    assert(prs.max > base, "some node must accumulate in-mass")
  }

  test("q132 paths: support floor holds; path arity matches n_events") {
    val rows = FlowQueries.q132_session_paths(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= FlowQueries.PathMinSessions)
      assert(r.getString(0).split(">").length.toLong == r.getLong(1))
    }
  }
}
