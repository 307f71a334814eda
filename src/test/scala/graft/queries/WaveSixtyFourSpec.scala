package graft.queries

import org.apache.spark.sql.Row

import graft.SparkSpec

/** Invariant pins for the round-8 session-3 waves (64–70) — the
  * structural guarantees the DuckDB oracle's value-hash cannot express
  * as REASONS (it only shows the two engines agree):
  *
  *  - q327: rendezvous moves land ONLY on the new shard (that is the
  *    operator's whole selling point), and mod-hash moves most keys;
  *  - q339: Hamilton quotas sum to the budget EXACTLY and each quota is
  *    within 1 of exact proportionality;
  *  - q337: the operating curve is cumulative — predicted pairs and
  *    recall are monotone as τ falls, precision ∈ [0, 10⁴];
  *  - q325: the Wilson lower bound never exceeds the raw rate and is 0
  *    at zero successes;
  *  - q328: the risk set starts at the user count, only shrinks, and
  *    the day rows account for every user exactly once;
  *  - q331: modularity is in [−10⁶, 10⁶] and intra-community edges
  *    never exceed m.
  */
class WaveSixtyFourSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("q327: every rendezvous move lands on the new shard; mod moves most keys") {
    val rows = LifecycleQueries.q327_rendezvous_rebalance(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val rdv = rows("rendezvous")
    assert(rdv.getLong(2) == rdv.getLong(4),
      s"rendezvous n_moved must equal n_to_new: $rdv")
    val mod = rows("mod")
    assert(mod.getLong(2) > mod.getLong(1) / 2,
      s"mod-hash should reshuffle most keys on N -> N+1: $mod")
    // rendezvous expected 1/(N+1): allow a generous band around 1/9
    val movedShare = rdv.getLong(3)
    assert(movedShare > 200 && movedShare < 2500,
      s"rendezvous moved share x10k should be near 1/(N+1): $movedShare")
  }

  test("q339: quotas sum to the budget exactly; each within 1 of proportional") {
    val rows = AllocQueries.q339_hamilton_quota(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("quota")).sum == AllocQueries.AllocBudget)
    val nTotal = rows.map(_.getAs[Long]("n_docs")).sum
    rows.foreach { r =>
      val exactFloor = AllocQueries.AllocBudget * r.getAs[Long]("n_docs") / nTotal
      val q = r.getAs[Long]("quota")
      assert(q == exactFloor || q == exactFloor + 1,
        s"quota must be floor or floor+1 of the exact share: $r")
    }
  }

  test("q337: operating curve is cumulative and bounded") {
    val rows = DesignQueries.q337_er_operating_curve(spark, sfDir).collect()
    val pred = rows.map(_.getAs[Long]("n_pred"))
    val rec = rows.map(_.getAs[Long]("recall_x10k"))
    assert(pred.zip(pred.drop(1)).forall { case (a, b) => a <= b },
      "n_pred must be cumulative as tau falls")
    assert(rec.zip(rec.drop(1)).forall { case (a, b) => a <= b },
      "recall must be monotone as tau falls")
    rows.foreach { r =>
      val p = r.getAs[Long]("precision_x10k")
      assert(p >= 0 && p <= 10000, s"precision out of range: $r")
      assert(r.getAs[Long]("n_tp") <= r.getAs[Long]("n_pred"), s"tp > pred: $r")
    }
  }

  test("q325: Wilson bound sits below the raw rate; zero successes pin to zero") {
    val rows = TrustQueries.q325_wilson_source_rank(spark, sfDir).collect()
    rows.foreach { r =>
      val wilson = r.getAs[Long]("wilson_x1m")
      val raw = r.getAs[Long]("good_x10k") * 100
      assert(wilson <= raw, s"lower bound above the raw rate: $r")
      if (r.getAs[Long]("n_good") == 0)
        assert(wilson == 0, s"zero successes must bound to zero: $r")
    }
  }

  test("q328: risk set starts at N, shrinks monotonically, accounts for every user") {
    val rows = LifecycleQueries.q328_life_table(spark, sfDir).collect()
    val risks = rows.map(_.getAs[Long]("n_risk"))
    assert(risks.zip(risks.drop(1)).forall { case (a, b) => a >= b },
      "risk set must be non-increasing")
    val leaving = rows.map(r =>
      r.getAs[Long]("n_convert") + r.getAs[Long]("n_censored")).sum
    assert(risks.head == leaving,
      s"day rows must account for every at-risk user once: head=${risks.head} sum=$leaving")
    rows.foreach { r =>
      assert(r.getAs[Long]("hazard_x10k") <= 10000, s"hazard > 1: $r") }
  }

  test("q331: modularity bounded; intra edges never exceed m") {
    val rows = CommunityQueries.q331_lpa_modularity(spark, sfDir).collect()
    val q = rows.head.getAs[Long]("q_x1m")
    assert(q >= -1000000 && q <= 1000000, s"Q out of [-1, 1]: $q")
    val m = rows.head.getAs[Long]("m_edges")
    assert(rows.map(_.getAs[Long]("e_c")).sum <= m,
      "intra-community edges cannot exceed the edge count")
  }
}
