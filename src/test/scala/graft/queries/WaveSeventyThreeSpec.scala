package graft.queries

import graft.SparkSpec

/** Invariant pins for the round-8 session-4 waves (73+) — structural
  * guarantees the DuckDB oracle's value-hash cannot express as REASONS:
  *
  *  - q345: KM survival is monotone non-increasing from ≤10⁶, the risk
  *    set strictly shrinks, and the life table accounts for every
  *    signup user exactly once;
  *  - q346: replay evaluates only policy-matched events (n_matched ≤
  *    n_eval), covers every context present in the eval half, and the
  *    zero-match guard pins replay_mean_c to 0.
  */
class WaveSeventyThreeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("q345: KM curve is monotone, risk set strictly shrinks, users conserved") {
    val rows = ReplayQueries.q345_kaplan_meier(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val surv = rows.map(_.getAs[Long]("survival_x1m"))
    assert(surv.head <= ReplayQueries.SurvScale)
    assert(surv.zip(surv.drop(1)).forall { case (a, b) => b <= a },
      s"survival must be non-increasing: ${surv.mkString(",")}")
    val risk = rows.map(_.getAs[Long]("n_risk"))
    assert(risk.zip(risk.drop(1)).forall { case (a, b) => b < a },
      "each emitted day removes at least one user from the risk set")
    val leavers = rows.map(r =>
      r.getAs[Long]("n_convert") + r.getAs[Long]("n_censored")).sum
    assert(leavers == risk.head,
      s"every at-risk user leaves exactly once: $leavers vs ${risk.head}")
  }

  test("q347: folds align across methods and MAE is the exact integer ratio") {
    val rows = BacktestQueries.q347_forecast_backtest(spark, sfDir).collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[Long]("n_folds")).distinct.length == 1,
      "all three methods score the same folds")
    rows.foreach { r =>
      assert(r.getAs[Long]("mae_x100") ==
        100 * r.getAs[Long]("sum_abs_err") / r.getAs[Long]("n_folds"))
    }
  }

  test("q348: Shapley efficiency axiom — phi sums to v(full) - v(empty), all phi >= 0") {
    val rows = BacktestQueries.q348_shapley_attribution(spark, sfDir).collect()
    assert(rows.length == 4)
    rows.foreach(r => assert(r.getAs[Long]("phi_num") >= 0L,
      s"v is monotone so every marginal contribution is >= 0: $r"))
    // recompute v(C) and v(emptyset) directly: converted users, and converted
    // users with zero pre-purchase touches
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.events(spark, sfDir).select("user_id", "event_type", "ts_ms")
    val fp = ev.groupBy("user_id")
      .agg(min(when(col("event_type") === "purchase", col("ts_ms"))).as("p_ts"))
    val u = ev.join(fp, "user_id").groupBy("user_id")
      .agg(max(when(col("event_type") =!= "purchase" &&
          (col("p_ts").isNull || col("ts_ms") < col("p_ts")), 1L).otherwise(0L)).as("touched"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("conv"))
    val vFull = u.filter(col("conv") === 1).count()
    val vEmpty = u.filter(col("conv") === 1 && col("touched") === 0).count()
    assert(rows.map(_.getAs[Long]("phi_num")).sum == 24L * (vFull - vEmpty),
      s"efficiency: sum(phi_num) must equal 24*(v(C)-v(0)) = 24*($vFull-$vEmpty)")
  }

  test("q349: percolation census is monotone in tau and internally consistent") {
    val rows = PercolationQueries.q349_percolation_sweep(spark, sfDir).collect()
    assert(rows.length == PercolationQueries.PercolationTaus.length)
    val byTau = rows.sortBy(_.getAs[Long]("tau_x10k"))
    def mono(c: String) = {
      val v = byTau.map(_.getAs[Long](c))
      assert(v.zip(v.drop(1)).forall { case (a, b) => b <= a },
        s"$c must be non-increasing as tau rises: ${v.mkString(",")}")
    }
    mono("n_edges"); mono("n_nodes"); mono("max_cluster")
    byTau.foreach { r =>
      assert(r.getAs[Long]("n_components") <= r.getAs[Long]("n_nodes"))
      val g = r.getAs[Long]("giant_share_x10k")
      assert(g >= 0 && g <= 10000)
      if (r.getAs[Long]("n_nodes") > 0)
        assert(r.getAs[Long]("n_components") >= 1 && g > 0)
    }
  }

  test("q350: pooled stratum present, chi2 >= 0, hottest cell >= uniform share") {
    val rows = PercolationQueries.q350_split_uniformity(spark, sfDir).collect()
    assert(rows.exists(_.getAs[String]("source") == "__all__"))
    rows.foreach { r =>
      assert(r.getAs[Long]("chi2_x1000") >= 0L)
      assert(r.getAs[Long]("max_cell_share_x10k") >= 625L,
        s"the hottest of 16 cells cannot be below the uniform share: $r")
    }
  }

  test("q351: cluster census is internally consistent and pairs respect the threshold") {
    val rows = CohesionQueries.q351_cluster_cohesion(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sz = r.getAs[Long]("cluster_size")
      val np = r.getAs[Long]("n_pairs")
      assert(sz >= 2, s"components come from edges: $r")
      assert(np >= sz - 1 && np <= sz * (sz - 1) / 2,
        s"pairs within [spanning-tree, complete]: $r")
      assert(r.getAs[Long]("min_jaccard_x10k") >= DataPrepQueries.JaccardMinX10k)
      val d = r.getAs[Long]("density_x10k")
      assert(d > 0 && d <= 10000, s"density in (0, 1]: $r")
    }
  }

  test("q352: the fold grid accounts for every near-dup pair exactly once") {
    val rows = CohesionQueries.q352_fold_leakage(spark, sfDir).collect()
    val total = rows.map(_.getAs[Long]("n_pairs")).sum
    val expected = graft.ops.Dedup.jaccardPairsPinned(spark, sfDir,
      n = DataPrepQueries.ShingleN,
      minJaccardX10k = DataPrepQueries.JaccardMinX10k,
      maxDf = DataPrepQueries.JaccardMaxDf).count()
    assert(total == expected, s"grid total $total vs pair count $expected")
    rows.foreach { r =>
      val (lo, hi) = (r.getAs[Long]("fold_lo"), r.getAs[Long]("fold_hi"))
      assert(lo >= 0 && lo <= hi && hi < SweepQueries.KFolds)
      assert((r.getAs[Int]("is_cross") == 1) == (lo != hi))
    }
  }

  test("q353: novelty scores are ranked non-increasing over exactly top-k rows") {
    val rows = NoveltyQueries.q353_diag_mahalanobis(spark, sfDir).collect()
    assert(rows.length == NoveltyQueries.NoveltyTopK)
    val s = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("score"))
    assert(s.zip(s.drop(1)).forall { case (a, b) => b <= a })
  }

  test("q354: head overlap bounded by depth, jaccard in range") {
    val rows = NoveltyQueries.q354_head_stability(spark, sfDir).collect()
    assert(rows.length == NoveltyQueries.StabilityDepths.length)
    rows.foreach { r =>
      val (d, c) = (r.getAs[Long]("depth"), r.getAs[Long]("n_common"))
      assert(c >= 0 && c <= d, s"common bounded by depth: $r")
      val j = r.getAs[Long]("jaccard_x10k")
      assert(j >= 0 && j <= 10000)
    }
  }

  test("q355: excess = keys - distinct, expectation shrinks 256x per 2 hex digits") {
    val rows = HomophilyQueries.q355_hash_collisions(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("width_hex"))
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_excess") ==
        r.getAs[Long]("n_keys") - r.getAs[Long]("n_distinct"))
      assert(r.getAs[Long]("n_colliding_keys") <= r.getAs[Long]("n_excess") ||
        r.getAs[Long]("n_excess") == 0)
    }
    val ex = rows.map(_.getAs[Long]("expected_excess"))
    assert(ex.zip(ex.drop(1)).forall { case (a, b) => b <= a },
      "wider keys cannot expect more collisions")
  }

  test("q356: homophily and base rates are shares; same-label edges bounded") {
    val rows = HomophilyQueries.q356_label_homophily(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_same") <= r.getAs[Long]("n_dir_edges"))
      val h = r.getAs[Long]("homophily_x10k")
      val b = r.getAs[Long]("base_x10k")
      assert(h >= 0 && h <= 10000 && b > 0 && b <= 10000)
    }
  }

  test("q357: novelty conserves the distinct corpus exactly") {
    val rows = AgreementQueries.q357_source_novelty(spark, sfDir).collect()
    val novelSum = rows.map(_.getAs[Long]("n_novel")).sum
    val cumLast = rows.map(_.getAs[Long]("cum_unique")).max
    assert(novelSum == cumLast, "every fingerprint claimed exactly once")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_novel") <= r.getAs[Long]("n_fps"))
      assert(r.getAs[Long]("n_fps") <= r.getAs[Long]("n_docs"))
    }
  }

  test("q358: intersections bounded by both sides, jaccard consistent") {
    val rows = AgreementQueries.q358_detector_agreement(spark, sfDir).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val (l, rt, c) = (r.getAs[Long]("n_left"), r.getAs[Long]("n_right"),
        r.getAs[Long]("n_common"))
      assert(c <= l && c <= rt, s"intersection bounded: $r")
      val j = r.getAs[Long]("overlap_jaccard_x10k")
      assert(j >= 0 && j <= 10000)
    }
  }

  test("q359: LCP savings bounded by dictionary bytes; c_name nearly fully shared") {
    val rows = LayoutQueries.q359_frontcoding_advisor(spark, sfDir).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    assert(rows.size == 3)
    rows.values.foreach { r =>
      assert(r.getAs[Long]("lcp_bytes") <= r.getAs[Long]("dict_bytes"))
      val s = r.getAs[Long]("saving_x10k")
      assert(s >= 0 && s < 10000)
    }
    // Customer#NNNNNNNNN keys share all but the numeric tail
    assert(rows("c_name").getAs[Long]("saving_x10k") > 5000,
      "sequential customer names must front-code heavily")
  }

  test("q360: sweep 2 eccentricity >= sweep 1 (the whole point of the 2nd sweep)") {
    val rows = LayoutQueries.q360_double_sweep(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("sweep"))
    assert(rows.length == 2)
    val (e1, e2) = (rows(0).getAs[Long]("ecc"), rows(1).getAs[Long]("ecc"))
    assert(e2 >= e1, s"double sweep must not shrink the bound: $e1 -> $e2")
    rows.foreach(r => assert(r.getAs[Long]("n_reached") >= 1))
  }

  test("q361: isotonic curve is monotone and brackets the raw rates") {
    val rows = IsotonicQueries.q361_isotonic_calibration(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("bucket"))
    assert(rows.nonEmpty)
    val iso = rows.map(_.getAs[Long]("iso_x1m"))
    assert(iso.zip(iso.drop(1)).forall { case (a, b) => b >= a },
      s"PAVA output must be non-decreasing: ${iso.mkString(",")}")
    val raw = rows.map(_.getAs[Long]("raw_x1m"))
    assert(iso.min >= raw.min && iso.max <= raw.max,
      "pooling cannot extrapolate beyond the observed rates")
  }

  test("q362: llr walk is additive and decisions match the boundaries") {
    val rows = IsotonicQueries.q362_sprt_monitor(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("day"))
    assert(rows.nonEmpty)
    var cum = 0L
    rows.foreach { r =>
      cum += r.getAs[Long]("llr_day_x1m")
      assert(r.getAs[Long]("llr_cum_x1m") == cum, s"cum mismatch at $r")
      val d = r.getAs[String]("decision")
      val expect = if (cum >= IsotonicQueries.SprtBoundX1m) "accept_h1"
        else if (cum <= -IsotonicQueries.SprtBoundX1m) "accept_h0" else "continue"
      assert(d == expect)
    }
  }

  test("q363: both arms land the target point count and pps beats-or-ties nothing silently") {
    val rows = SamplingQueries.q363_pps_estimate(spark, sfDir).collect()
      .map(r => r.getAs[String]("method") -> r).toMap
    assert(rows.size == 2)
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_points") >= 1 &&
        r.getAs[Long]("n_points") <= SamplingQueries.PpsSamples)
      assert(r.getAs[Long]("n_docs") <= r.getAs[Long]("n_points"))
      assert(r.getAs[Long]("y_est") > 0)
      assert(r.getAs[Long]("err_x10k") ==
        10000L * math.abs(r.getAs[Long]("y_est") - r.getAs[Long]("y_true")) /
          r.getAs[Long]("y_true"))
    }
  }

  test("q364: diagonal mass positive, top pair is off-diagonal and bounded by the mass") {
    val r = SamplingQueries.q364_cov_diagonality(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_sample") >= 1)
    assert(r.getAs[Long]("diag_mass") > 0, "variances are non-negative and not all zero")
    assert(r.getAs[Long]("top_i") < r.getAs[Long]("top_j"))
    assert(r.getAs[Long]("top_abs_cov") <= r.getAs[Long]("offdiag_mass"))
  }

  test("q365: closed wedges bounded by wedges; closure is a share") {
    val r = ClosureQueries.q365_triadic_closure(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_closed") <= r.getAs[Long]("n_wedges"))
    val c = r.getAs[Long]("closure_x10k")
    assert(c >= 0 && c <= 10000)
  }

  test("q366: sweep covers the orders; jaccard stats bounded") {
    val rows = ClosureQueries.q366_shingle_sweep(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("shingle_n")).toSeq ==
      ClosureQueries.SweepOrders.map(_.toLong))
    rows.foreach { r =>
      val (m, x) = (r.getAs[Long]("mean_j_x10k"), r.getAs[Long]("max_j_x10k"))
      assert(m >= 0 && m <= x && x <= 10000, s"jaccard stats in range: $r")
      if (r.getAs[Long]("n_pairs") > 0)
        assert(m >= DataPrepQueries.JaccardMinX10k,
          "surviving pairs all clear the threshold, so the mean must too")
    }
  }

  test("connectedComponentsBy == per-group CC on seeded random multigraphs") {
    val spark0 = spark
    import spark0.implicits._
    // deterministic LCG so the property is replayable; graphs include
    // self-contained chains, stars and cross-links per group
    def lcg(seed: Long): Iterator[Long] =
      Iterator.iterate(seed)(s => (s * 6364136223846793005L + 1442695040888963407L))
    for (seed <- 1L to 4L) {
      val rnd = lcg(seed).drop(1)
      val edges = (1 to 60).map { _ =>
        val g = math.floorMod(rnd.next(), 3L)
        val a = math.floorMod(rnd.next(), 25L)
        val b = math.floorMod(rnd.next(), 25L)
        (g, math.min(a, b), math.max(a, b) + 1) // +1 avoids self loops
      }.toDF("g", "id_a", "id_b")
      val grouped = graft.ops.Graph.connectedComponentsBy(edges, "g")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      (0L to 2L).foreach { g =>
        val sub = edges.filter(org.apache.spark.sql.functions.col("g") === g)
        if (!sub.isEmpty) {
          val solo = graft.ops.Graph.connectedComponents(sub)
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          solo.foreach { case (id, comp) =>
            assert(grouped((g, id)) == comp, s"seed=$seed g=$g id=$id")
          }
        }
      }
    }
  }

  test("connectedComponentsBy == per-group connectedComponents on every group") {
    val spark0 = spark
    import spark0.implicits._
    // group 1: path 1-2-3 plus isolate pair 7-8; group 2: triangle 2-3-4
    // and bridge 4-9 (same node ids, different topology per group)
    val edges = Seq(
      (1L, 1L, 2L), (1L, 2L, 3L), (1L, 7L, 8L),
      (2L, 2L, 3L), (2L, 3L, 4L), (2L, 2L, 4L), (2L, 4L, 9L)
    ).toDF("g", "id_a", "id_b")
    val grouped = graft.ops.Graph.connectedComponentsBy(edges, "g")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    Seq(1L, 2L).foreach { g =>
      val solo = graft.ops.Graph.connectedComponents(
          edges.filter(org.apache.spark.sql.functions.col("g") === g))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      solo.foreach { case (id, comp) =>
        assert(grouped((g, id)) == comp,
          s"group $g node $id: grouped=${grouped((g, id))} solo=$comp")
      }
    }
  }

  test("q367: ten deciles, arm counts balance within one decile's worth") {
    val rows = QteQueries.q367_qte_deciles(spark, sfDir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("qte_c") ==
        r.getAs[Long]("mean_b_c") - r.getAs[Long]("mean_a_c"))
      assert(r.getAs[Long]("n_a") > 0 && r.getAs[Long]("n_b") > 0)
    }
    // deciles are exact integer ranks: per arm the cells differ by <= 1
    Seq("n_a", "n_b").foreach { c =>
      val ns = rows.map(_.getAs[Long](c))
      assert(ns.max - ns.min <= 1, s"$c cells must be within 1: ${ns.mkString(",")}")
    }
  }

  test("q368: cells cover every vector exactly once; deviations reconcile with shares") {
    val rows = QteQueries.q368_ivf_balance(spark, sfDir).collect()
    assert(rows.length == AnalyticsQueries.KmeansK)
    val n = rows.map(_.getAs[Long]("n_vectors")).sum
    assert(n > 0)
    rows.foreach { r =>
      val share = r.getAs[Long]("share_x10k")
      assert(share >= 0 && share <= 10000)
      assert(r.getAs[Long]("rel_dev_x10k") >= -10000)
    }
  }

  test("q369: odd components bounded by components; verdict consistent") {
    val r = BipartiteQueries.q369_bipartite_audit(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_odd_components") <= r.getAs[Long]("n_components"))
    assert(r.getAs[Long]("n_odd_nodes") <= r.getAs[Long]("n_nodes"))
    assert((r.getAs[Int]("bipartite") == 1) == (r.getAs[Long]("n_odd_nodes") == 0L))
  }

  test("q369: doubled-graph trick gives the right verdict on known graphs") {
    val spark0 = spark
    import spark0.implicits._
    // even cycle (bipartite) in group 1; triangle (odd) in group 2
    def audit(edges: Seq[(Long, Long)]): Boolean = {
      val und = edges.toDF("u", "v")
      val dbl = und.select(org.apache.spark.sql.functions.expr("u*2").as("id_a"),
          org.apache.spark.sql.functions.expr("v*2+1").as("id_b"))
        .union(und.select(org.apache.spark.sql.functions.expr("u*2+1").as("id_a"),
          org.apache.spark.sql.functions.expr("v*2").as("id_b")))
      val lab = graft.ops.Graph.connectedComponents(dbl)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      !edges.flatMap(e => Seq(e._1, e._2)).distinct
        .exists(u => lab(2 * u) == lab(2 * u + 1))
    }
    assert(audit(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))), "4-cycle is bipartite")
    assert(!audit(Seq((1L, 2L), (2L, 3L), (3L, 1L))), "triangle is not")
  }

  test("q370: final size identical across plans; rank follows intermediate mass") {
    val rows = BipartiteQueries.q370_join_order_preflight(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("rank"))
    assert(rows.length == 3)
    assert(rows.map(_.getAs[Long]("final_rows")).distinct.length == 1,
      "join order cannot change the final cardinality")
    val masses = rows.map(_.getAs[Long]("intermediate_rows"))
    assert(masses.zip(masses.drop(1)).forall { case (a, b) => a <= b })
  }

  test("q371: KMV falls back to exact below k and stays within a loose band above") {
    val rows = KmvQueries.q371_kmv_estimate(spark, sfDir).collect()
    assert(rows.length == 5 * KmvQueries.KmvKs.length)
    rows.foreach { r =>
      val (k, n, est) = (r.getAs[Long]("k"), r.getAs[Long]("n_exact"),
        r.getAs[Long]("n_est"))
      if (n < k) assert(est == n, s"below k the sketch is exact: $r")
      else {
        assert(est > 0)
        assert(r.getAs[Long]("err_x10k") == 10000 * (est - n) / n)
      }
    }
  }

  test("q372: affinity matrix is upper-triangular, cos2 in [0, 10^4]") {
    val rows = KmvQueries.q372_trigram_affinity(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("source_a") < r.getAs[String]("source_b"))
      val c = r.getAs[Long]("cos2_x10k")
      assert(c >= 0 && c <= 10000, s"squared cosine is a share: $r")
    }
  }

  test("q373: model starts at 10^4, decays monotonically; risk set shrinks with t") {
    val rows = UpliftQueries.q373_retention_fit(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("t"))
    assert(rows.head.getAs[Long]("model_x10k") == 10000L)
    val m = rows.map(_.getAs[Long]("model_x10k"))
    assert(m.zip(m.drop(1)).forall { case (a, b) => b <= a })
    val risk = rows.map(_.getAs[Long]("n_at_risk"))
    assert(risk.zip(risk.drop(1)).forall { case (a, b) => b <= a })
    rows.foreach(r => assert(r.getAs[Long]("n_active") <= r.getAs[Long]("n_at_risk")))
  }

  test("q374: cumulative censuses are monotone and conversions bounded") {
    val rows = UpliftQueries.q374_qini_curve(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("decile"))
    assert(rows.length == 10)
    Seq("cum_nt", "cum_ct", "cum_nc", "cum_cc").foreach { c =>
      val v = rows.map(_.getAs[Long](c))
      assert(v.zip(v.drop(1)).forall { case (a, b) => b >= a }, s"$c monotone")
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("cum_ct") <= r.getAs[Long]("cum_nt"))
      assert(r.getAs[Long]("cum_cc") <= r.getAs[Long]("cum_nc"))
    }
  }

  test("q375: ranks are a permutation and the ratio ordering holds") {
    val rows = CascadeQueries.q375_cascade_order(spark, sfDir).collect()
    assert(rows.length == 4)
    assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    val byRank = rows.sortBy(_.getAs[Long]("rank"))
    val ratios = byRank.map(_.getAs[Long]("ratio_x100"))
    assert(ratios.zip(ratios.drop(1)).forall { case (a, b) => a >= b })
  }

  test("q376: bootstrap envelope brackets its own mean; variance non-negative") {
    val r = CascadeQueries.q376_uplift_bootstrap(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_reps") == CascadeQueries.UpliftBootR.toLong)
    assert(r.getAs[Long]("lo_x10k") <= r.getAs[Long]("boot_mean_x10k"))
    assert(r.getAs[Long]("hi_x10k") >= r.getAs[Long]("boot_mean_x10k"))
    assert(r.getAs[Long]("boot_var") >= 0)
  }

  test("q377: the bridge reconciles to the cent on every brand row") {
    val rows = BridgeQueries.q377_revenue_bridge(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dr = r.getAs[Long]("rev2_c") - r.getAs[Long]("rev1_c")
      assert(r.getAs[Long]("volume_c") + r.getAs[Long]("price_c") +
        r.getAs[Long]("resid_c") == dr, s"waterfall must reconcile exactly: $r")
    }
  }

  test("q378: full upper triangle, significance symmetric in the pair order") {
    val rows = ContrastQueries.q378_pairwise_means(spark, sfDir).collect()
    val ns = rows.map(_.getAs[String]("source_a")).toSet ++
      rows.map(_.getAs[String]("source_b")).toSet
    assert(rows.length == ns.size * (ns.size - 1) / 2, "complete upper triangle")
    rows.foreach { r =>
      assert(Set(0, 1).contains(r.getAs[Int]("significant")))
    }
  }

  test("q379: violations bounded by lines, share consistent") {
    val rows = ContrastQueries.q379_temporal_integrity(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, v) = (r.getAs[Long]("n_lines"), r.getAs[Long]("n_violations"))
      assert(v <= n)
      assert(r.getAs[Long]("violation_x10k") == 10000 * v / n)
      if (v > 0) assert(r.getAs[Long]("min_lag_days") < 0)
    }
  }

  test("q380: HHI bounded below by the uniform floor and above by 10^4") {
    val rows = RiskProfileQueries.q380_supplier_risk(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Long]("hhi_x10k")
      val s = r.getAs[Long]("n_suppliers")
      assert(h <= 10000, s"HHI is a share sum: $r")
      assert(h >= 10000 / s - 1, s"HHI cannot beat the uniform floor: $r")
      assert(r.getAs[Long]("n_single_sourced") <= r.getAs[Long]("n_at_most_dual"))
      assert(r.getAs[Long]("n_at_most_dual") <= r.getAs[Long]("n_parts"))
    }
  }

  test("q381: r2 is a share; the tokens~chars pair is strongly linear") {
    val rows = RiskProfileQueries.q381_metric_r2(spark, sfDir).collect()
      .map(r => r.getAs[String]("pair") -> r).toMap
    assert(rows.size == 6)
    rows.values.foreach { r =>
      val v = r.getAs[Long]("r2_x10k")
      assert(v >= 0 && v <= 10000)
      assert(Set(-1L, 0L, 1L).contains(r.getAs[Long]("cov_sign")))
    }
    assert(rows("len_chars~n_tokens").getAs[Long]("r2_x10k") > 5000,
      "character and token counts must correlate strongly")
  }

  test("q382: cumulative LTV is monotone within every cohort") {
    val rows = LtvQueries.q382_cohort_ltv(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("cohort_week")).foreach { case (_, rs) =>
      val cum = rs.sortBy(_.getAs[Long]("offset_week")).map(_.getAs[Long]("cum_rev_c"))
      assert(cum.zip(cum.drop(1)).forall { case (a, b) => b >= a })
    }
  }

  test("q383: survivors are order-invariant; costs differ only via selectivities") {
    val rows = LtvQueries.q383_stage_order(spark, sfDir).collect()
      .map(r => r.getAs[String]("stage_order") -> r).toMap
    assert(rows.size == 2)
    assert(rows.values.map(_.getAs[Long]("n_survivors")).toSeq.distinct.length == 1,
      "the pipeline's output cannot depend on stage order")
    val d = rows("dedup_first")
    val n = d.getAs[Long]("n")
    assert(d.getAs[Long]("cost_units") ==
      n * LtvQueries.DedupCost + (n - d.getAs[Long]("n_dup")) * LtvQueries.FilterCost)
    assert(d.getAs[Long]("n_both") <= math.min(
      d.getAs[Long]("n_dup"), d.getAs[Long]("n_fail")))
  }

  test("q384: small dims broadcast at sf0.001; bytes grow with rows") {
    val rows = SizingQueries.q384_broadcast_advisor(spark, sfDir).collect()
      .map(r => r.getAs[String]("table_name") -> r).toMap
    assert(rows.size == 5)
    rows.values.foreach { r =>
      assert(r.getAs[Long]("est_bytes") > r.getAs[Long]("n_rows"),
        "every row carries at least its fixed width")
    }
    assert(rows("region").getAs[Int]("broadcastable") == 1)
    assert(rows("nation").getAs[Int]("broadcastable") == 1)
  }

  test("q385: hottest-key share and partition count are consistent") {
    val rows = SizingQueries.q385_shuffle_advisor(spark, sfDir).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("max_key_cnt") <= r.getAs[Long]("n"))
      assert(r.getAs[Long]("rec_partitions") >= 1)
      assert(r.getAs[Long]("n_keys") <= r.getAs[Long]("n"))
    }
  }

  test("q386: both-votes precision >= either-vote precision; recalls bounded") {
    val rows = EnsembleQueries.q386_ensemble_votes(spark, sfDir).collect()
      .map(r => r.getAs[Long]("votes") -> r).toMap
    assert(rows.keySet.subsetOf(Set(1L, 2L)))
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_true") <= r.getAs[Long]("n_pairs"))
      assert(r.getAs[Long]("recall_x10k") <= 10000)
    }
    if (rows.contains(1L) && rows.contains(2L))
      assert(rows(2L).getAs[Long]("precision_x10k") >=
        rows(1L).getAs[Long]("precision_x10k"),
        "agreement of both screens must not be less precise than disagreement")
  }

  test("q387: quantiles are monotone and the recommendation is the 2x rule") {
    val rows = EnsembleQueries.q387_watermark_advisor(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("quantile_x100"))
    assert(rows.length == 3)
    val v = rows.map(_.getAs[Long]("late_ms"))
    assert(v.zip(v.drop(1)).forall { case (a, b) => b >= a })
    rows.foreach(r => assert(r.getAs[Long]("rec_watermark_ms") ==
      2 * r.getAs[Long]("late_ms")))
  }

  test("q388: census monotone as tau rises; shares bounded") {
    val rows = SemanticSweepQueries.q388_semantic_percolation(spark, sfDir)
      .collect().sortBy(_.getAs[Long]("k10"))
    assert(rows.length == SemanticSweepQueries.SemTenths.length)
    def mono(c: String) = {
      val v = rows.map(_.getAs[Long](c))
      assert(v.zip(v.drop(1)).forall { case (a, b) => b <= a }, s"$c non-increasing")
    }
    mono("n_edges"); mono("n_nodes"); mono("max_cluster")
    rows.foreach { r =>
      val g = r.getAs[Long]("giant_share_x10k")
      assert(g >= 0 && g <= 10000)
    }
  }

  test("q389: word-breaking cuts bounded by boundaries; chunked docs bounded by docs") {
    val rows = SemanticSweepQueries.q389_chunk_boundaries(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_word_breaking") <= r.getAs[Long]("n_boundaries"))
      assert(r.getAs[Long]("n_docs_chunked") <= r.getAs[Long]("n_docs"))
      val s = r.getAs[Long]("breaking_x10k")
      assert(s >= 0 && s <= 10000)
    }
  }

  test("q390: arrivals bounded by population; every final cell accounted") {
    val rows = ChurnAuditQueries.q390_assignment_churn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_arrived") <= r.getAs[Long]("n_vectors"))
      val c = r.getAs[Long]("churn_x10k")
      assert(c >= 0 && c <= 10000)
    }
  }

  test("q391: collision groups are a subset of dup groups") {
    val r = ChurnAuditQueries.q391_norm_collisions(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_collision_groups") <= r.getAs[Long]("n_dup_groups"))
    if (r.getAs[Long]("n_dup_groups") > 0)
      assert(r.getAs[Long]("max_variants") >= 1)
  }

  test("q392/q393: hygiene checks pass on the well-formed md5 assignment") {
    val srm = HygieneAbQueries.q392_srm_check(spark, sfDir).collect().head
    assert(srm.getAs[Long]("n_a") + srm.getAs[Long]("n_b") > 0)
    assert(srm.getAs[Int]("srm_fail") == 0,
      s"md5 parity on a clean id space must not trip SRM: $srm")
    val aa = HygieneAbQueries.q393_aa_placebo(spark, sfDir).collect().head
    // the flag must agree with its own statistic; demanding a PASS is
    // only meaningful once the normal approximation applies (sf0.001's
    // control arm has single-digit users, where chi2 is noise)
    assert((aa.getAs[Int]("placebo_fail") == 1) ==
      (aa.getAs[Long]("chi2_x1000") > HygieneAbQueries.Chi2Crit1X1000))
    if (aa.getAs[Long]("n1") + aa.getAs[Long]("n2") >= 100)
      assert(aa.getAs[Int]("placebo_fail") == 0,
        s"an adequately-sized A/A split must not manufacture an effect: $aa")
    assert(aa.getAs[Long]("c1") <= aa.getAs[Long]("n1"))
    assert(aa.getAs[Long]("c2") <= aa.getAs[Long]("n2"))
  }

  test("q394: overlap pairs bounded by slot pairs; redundant bounded by overlap") {
    val r = RedundancyQueries.q394_topk_redundancy(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_overlap") <= r.getAs[Long]("n_possible"))
    assert(r.getAs[Long]("n_redundant") <= r.getAs[Long]("n_overlap"))
    assert(r.getAs[Long]("mean_j_x10k") <= r.getAs[Long]("max_j_x10k") ||
      r.getAs[Long]("n_overlap") == 0)
    assert(r.getAs[Long]("k") <= SearchQueries.Bm25K.toLong)
  }

  test("q395: every (type, scale) cell present; IoD non-negative; events conserved") {
    val rows = DispersionQueries.q395_dispersion_curve(spark, sfDir).collect()
    val types = rows.map(_.getAs[String]("event_type")).distinct
    assert(rows.length == types.length * DispersionQueries.DispersionWindows.length)
    rows.foreach(r => assert(r.getAs[Long]("iod_x1000") >= 0))
    // the same events counted at every scale
    val byW = rows.groupBy(_.getAs[Long]("w_days"))
      .map { case (w, rs) => w -> rs.map(_.getAs[Long]("n_events")).sum }
    assert(byW.values.toSet.size == 1, s"event totals must agree across scales: $byW")
  }

  test("q346: matched <= eval, all contexts covered, zero-match guard") {
    val rows = ReplayQueries.q346_policy_replay(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 7)
    rows.foreach { r =>
      val (ne, nm) = (r.getAs[Long]("n_eval"), r.getAs[Long]("n_matched"))
      assert(nm <= ne, s"matched must be a subset of eval: $r")
      if (nm == 0) assert(r.getAs[Long]("replay_mean_c") == 0L, s"zero-match guard: $r")
    }
    val ctxs = rows.map(_.getAs[Long]("ctx")).toSet
    assert(ctxs.size == rows.length, "one row per context")
  }
}
