package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-6 wave-31 training-value operators: contrastive triplet mining
  * over the session-pinned kNN graph (the dataset-construction step of
  * metric/embedding training), the reliability diagram with the Brier
  * decomposition (calibration-in-the-small for the quality gate), Markov
  * removal-effect attribution (which channel actually DRIVES conversion
  * — the model-based complement of q173's positional attribution), and
  * a length-bucket packing audit (what padding really costs at batch
  * time).
  *
  * Oracle conventions as the sibling modules: exact integers
  * end-to-end, identical aliases both sides, ORDER BY a unique key.
  */
object ValueQueries {

  // ------------------------------------------- X236 contrastive triplets

  /** X236 — contrastive triplet mining: for every anchor vector, the
    * best SAME-label neighbor (the positive) and the best
    * DIFFERENT-label neighbor (the hard negative) among its kNN-graph
    * neighbors, by quantized dot (ties → lower neighbor id); anchors
    * missing either side are dropped. `margin = pos_dot − neg_dot` is
    * the triplet's difficulty — small or negative margins are the
    * pairs a metric-learning run weights hardest.
    *
    * Mining FROM THE GRAPH is the scale design: candidates are the
    * already-materialized session-pinned q91 artifact (IVF-bucketed,
    * never all-pairs), so this is one bounded-fan-out pass + two
    * ≤k-row-per-anchor rank windows — the standard production shape
    * (mine hard negatives from the ANN index of the previous
    * checkpoint). */
  def q215_contrastive_triplets(spark: SparkSession, dir: String): DataFrame = {
    val lab = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label").cast("long").as("label"))
    val e = OlapQueries.knnGraphPinned(spark, dir)
      .join(lab.select(col("vec_id").as("query_id"), col("label").as("anchor_label")), "query_id")
      .join(lab.select(col("vec_id").as("neighbor_id"), col("label").as("nl")), "neighbor_id")
      .withColumn("same", (col("anchor_label") === col("nl")).cast("int"))
    // ≤ k rows per (anchor, side): the window input is graph fan-out
    val w = Window.partitionBy("query_id", "same")
      .orderBy(col("dot").desc, col("neighbor_id"))
    val best = e.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    val pos = best.filter(col("same") === 1)
      .select(col("query_id").as("anchor_id"), col("anchor_label"),
        col("neighbor_id").as("pos_id"), col("dot").as("pos_dot"))
    val neg = best.filter(col("same") === 0)
      .select(col("query_id").as("anchor_id"),
        col("neighbor_id").as("neg_id"), col("dot").as("neg_dot"))
    pos.join(neg, "anchor_id")
      .withColumn("margin", col("pos_dot") - col("neg_dot"))
      .select("anchor_id", "anchor_label", "pos_id", "pos_dot", "neg_id", "neg_dot", "margin")
      .orderBy("anchor_id")
  }

  // ------------------------------------------ X237 Brier reliability

  /** Reliability bins: score range min-max-normalized to p ∈ [0,1]
    * ×10⁴, then decile-binned (top bin closed). */
  val BrierBins = 10

  /** X237 — reliability diagram + Brier decomposition for the frozen
    * quality classifier (q97's scores) against the q26 keep outcome:
    * per probability decile the observed keep rate vs the predicted
    * probability (the reliability diagram q122's score histogram does
    * NOT show — q122 bins counts, this bins OUTCOMES), plus the
    * Murphy decomposition as constant audit columns — brier =
    * mean(p−y)², reliability (weighted calibration gap²), resolution
    * (how far bins move from the base rate), uncertainty ȳ(1−ȳ), all
    * ×10⁸ integer fixed-point with identical floor points both
    * engines.
    *
    * Scale: one scored pass (the q97 chain), one 1-row global
    * aggregate, one |bins|-row aggregate — nothing corpus-wide beyond
    * the scoring itself. */
  def q216_brier_reliability(spark: SparkSession, dir: String): DataFrame = {
    val sc = TrainPrepQueries.classifierScores(spark, dir)
      .select(col("doc_id"), col("score"))
    val keep = DataPrepQueries.q26_quality_filter(spark, dir)
      .select(col("doc_id"), col("keep").cast("long").as("y"))
    val rng = sc.agg(min("score").as("mn"), max("score").as("mx"))
    val scored = sc.join(keep, "doc_id").crossJoin(broadcast(rng))
      .withColumn("p",
        expr("CASE WHEN mx = mn THEN 5000 ELSE (10000 * (score - mn)) div (mx - mn) END"))
      .withColumn("bin", least(expr("p div 1000"), lit((BrierBins - 1).toLong)).cast("long"))
    val g1 = scored.agg(
      count(lit(1)).as("n_total"),
      sum("y").as("y_total"),
      sum(expr("(p - 10000 * y) * (p - 10000 * y)")).as("sq_sum"))
    val bins = scored.groupBy("bin").agg(
      count(lit(1)).as("n_docs"), sum("p").as("p_sum"), sum("y").as("y_sum"))
      .crossJoin(broadcast(g1))
      .withColumn("mean_p_x10k", expr("p_sum div n_docs"))
      .withColumn("mean_y_x10k", expr("(10000 * y_sum) div n_docs"))
      .withColumn("ybar_x10k", expr("(10000 * y_total) div n_total"))
    val g2 = bins.agg(
      sum(expr("n_docs * (mean_p_x10k - mean_y_x10k) * (mean_p_x10k - mean_y_x10k)")).as("rel_sum"),
      sum(expr("n_docs * (mean_y_x10k - ybar_x10k) * (mean_y_x10k - ybar_x10k)")).as("res_sum"))
    bins.crossJoin(broadcast(g2))
      .select(col("bin"), col("n_docs"), col("mean_p_x10k"), col("mean_y_x10k"),
        expr("sq_sum div n_total").as("brier_x1e8"),
        expr("rel_sum div n_total").as("reliability_x1e8"),
        expr("res_sum div n_total").as("resolution_x1e8"),
        expr("ybar_x10k * (10000 - ybar_x10k)").as("uncertainty_x1e8"))
      .orderBy("bin")
  }

  // ------------------------------------------ X238 removal-effect attribution

  /** Attribution channels (the non-absorbing event types) and the fixed
    * power-iteration depth. The depth is part of the operator contract
    * (both engines floor at every step, so any K gives bit-identical
    * results; 12 is within 1e-4 of the absorption fixpoint on this
    * matrix family). */
  val RemovalChannels: Seq[String] = Seq("click", "error", "signup", "view")
  val RemovalIters = 12
  private val Mil = 1000000L

  /** X238 — Markov removal-effect attribution: user journeys (events
    * ordered by (ts, id), truncated at the first purchase → CONV;
    * non-converters terminate → NULL) build a transition-count matrix;
    * conversion probability from START comes from [[RemovalIters]]
    * fixed-point iterations in ×10⁶ integer arithmetic; each channel's
    * removal effect is the relative conversion drop when that channel
    * is removed (its inbound transitions redirect to NULL — the
    * standard removal-effect construction). The MODEL-based attribution
    * next to q173's positional first/last-touch: a channel whose
    * removal barely moves conversion was never load-bearing, whatever
    * its touch counts say.
    *
    * Scale split: the journey → transition-count aggregate is the
    * distributed pass (one window + one |types|²-bounded groupBy — the
    * q118 shape); the matrix itself is ≤ (|types|+2)² cells and is
    * collected for the exact integer iteration (the same bounded-
    * collect class as q118's |types|² matrix — at ANY corpus scale the
    * state space is the event-type vocabulary, not the data). */
  def q217_removal_effect(spark: SparkSession, dir: String): DataFrame =
    removalEffects(spark, Tables.events(spark, dir)
      .select(col("user_id"), col("ts_ms"), col("event_id"), col("event_type")))

  /** Core of q217 over any (user_id, ts_ms, event_id, event_type) frame
    * — split out so RemovalEffectSpec can plant journeys with a known
    * load-bearing channel and pin the semantics. */
  private[queries] def removalEffects(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy("user_id").orderBy(col("ts_ms"), col("event_id"))
    val ev = events
    val fp = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(min(struct(col("ts_ms"), col("event_id"))).as("fpk"))
    val kept = ev.join(fp, Seq("user_id"), "left")
      .filter(col("fpk").isNull ||
        struct(col("ts_ms"), col("event_id")) <= col("fpk"))
      .withColumn("state",
        when(col("event_type") === "purchase", lit("CONV")).otherwise(col("event_type")))
    val steps = kept
      .withColumn("src", coalesce(lag(col("state"), 1).over(w), lit("START")))
      .select(col("src"), col("state").as("dst"))
    val wDesc = Window.partitionBy("user_id")
      .orderBy(col("ts_ms").desc, col("event_id").desc)
    val lastNoConv = kept.filter(col("fpk").isNull)
      .withColumn("rn", row_number().over(wDesc)).filter(col("rn") === 1)
      .select(col("state").as("src"), lit("NULL").as("dst"))
    // the distributed part ends here: a (src, dst) count matrix bounded
    // by (|event types|+2)² cells — collected for the exact iteration
    val counts = steps.union(lastNoConv)
      .groupBy("src", "dst").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    def convProb(m: Map[(String, String), Long]): Long = {
      val totals = m.groupBy(_._1._1).map { case (s, cs) => s -> cs.values.sum }
      val p = m.map { case ((s, t), c) => (s, t) -> (Mil * c) / totals(s) }
      val srcs = totals.keySet
      var v = srcs.map(_ -> 0L).toMap
      def value(t: String): Long =
        if (t == "CONV") Mil else if (t == "NULL") 0L else v.getOrElse(t, 0L)
      (1 to RemovalIters).foreach { _ =>
        v = srcs.map { s =>
          s -> p.collect { case ((`s`, t), pr) => pr * value(t) }.sum / Mil
        }.toMap
      }
      v.getOrElse("START", 0L)
    }
    def removed(channel: String): Map[(String, String), Long] =
      m2(counts.collect {
        case ((s, t), c) if s != channel => (s, if (t == channel) "NULL" else t) -> c
      }.toSeq)
    def m2(entries: Seq[((String, String), Long)]): Map[(String, String), Long] =
      entries.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    val full = convProb(counts)
    val rows = RemovalChannels.sorted.map { ch =>
      val c = convProb(removed(ch))
      val eff = if (full == 0) 0L else (10000L * (full - c)) / full
      (ch, full, c, eff)
    }
    rows.toDF("channel", "conv_full_x1e6", "conv_removed_x1e6", "removal_x10k")
      .orderBy("channel")
  }

  // ------------------------------------------------ X239 padding audit

  /** Length buckets: powers of two from 16 to 1024, overflow → 2048. */
  val PadBuckets: Seq[Long] = Seq(16L, 32L, 64L, 128L, 256L, 512L, 1024L)

  /** X239 — length-bucket packing audit: docs assigned to the smallest
    * power-of-two token bucket, per bucket the padding waste if every
    * doc pads to the bucket size, plus the corpus-wide saving vs
    * pad-everything-to-max uniform batching — the measured answer to
    * "is length-bucketed batching worth the shuffle", the batch-time
    * complement of X20's token-budget packing (which packs; this
    * audits the pad-don't-pack alternative).
    *
    * Scale: one scalar pass + a |buckets|-row aggregate + a 1-row
    * global. */
  def q218_padding_audit(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions._
    val ladder = PadBuckets.map(b => s"WHEN ntok <= $b THEN ${b}L").mkString(" ")
    val docs = Tables.documents(spark, dir)
      .select(tokenCountWs(normalizeText(col("text"))).cast("long").as("ntok"))
      .withColumn("bucket", expr(s"CASE $ladder ELSE 2048L END"))
    val g = docs.agg(count(lit(1)).as("n_total"), max("ntok").as("max_tok"))
    val buckets = docs.groupBy("bucket").agg(
      count(lit(1)).as("n_docs"), sum("ntok").as("sum_tokens"))
      .withColumn("padded_tokens", col("bucket") * col("n_docs"))
      .withColumn("waste_x10k",
        expr("(10000 * (padded_tokens - sum_tokens)) div padded_tokens"))
    val tot = buckets.agg(sum("padded_tokens").as("bucketed_padded"))
    buckets.crossJoin(broadcast(g)).crossJoin(broadcast(tot))
      .withColumn("savings_vs_uniform_x10k",
        // DECIMAL(38,0): 10⁴·n_total·max_tok ≈ 10⁴·corpus tokens — BIGINT
        // dies at ~9e14 tokens, inside 100 TB range (round-9 audit)
        expr("CAST((10000 * (CAST(n_total AS DECIMAL(38,0)) * max_tok - bucketed_padded)) div (CAST(n_total AS DECIMAL(38,0)) * max_tok) AS BIGINT)"))
      .select("bucket", "n_docs", "sum_tokens", "padded_tokens", "waste_x10k",
        "savings_vs_uniform_x10k")
      .orderBy("bucket")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q215_contrastive_triplets" -> q215_contrastive_triplets,
    "q216_brier_reliability" -> q216_brier_reliability,
    "q217_removal_effect" -> q217_removal_effect,
    "q218_padding_audit" -> q218_padding_audit
  )

  // ---------------------------------------------------------------- oracles

  import DataPrepQueries.normToks

  /** The shared journey → transition-count CTE chain (ends in `tr`). */
  private def journeySql: String =
    s"""ev AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id, event_type FROM events),
       |fpx AS (SELECT user_id, ts_ms AS fpts, event_id AS fpid FROM (
       |          SELECT user_id, ts_ms, event_id,
       |                 row_number() OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS rn
       |          FROM ev WHERE event_type = 'purchase') WHERE rn = 1),
       |kept AS (SELECT e.user_id, e.ts_ms, e.event_id,
       |                CASE WHEN e.event_type = 'purchase' THEN 'CONV' ELSE e.event_type END AS state,
       |                fpx.user_id IS NOT NULL AS has_conv
       |         FROM ev e LEFT JOIN fpx USING (user_id)
       |         WHERE fpx.user_id IS NULL OR (e.ts_ms, e.event_id) <= (fpx.fpts, fpx.fpid)),
       |steps AS (SELECT coalesce(lag(state) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id),
       |                          'START') AS src,
       |                 state AS dst
       |          FROM kept),
       |lastnc AS (SELECT state AS src, 'NULL' AS dst FROM (
       |             SELECT state, row_number() OVER (PARTITION BY user_id
       |                    ORDER BY ts_ms DESC, event_id DESC) AS rn
       |             FROM kept WHERE NOT has_conv) WHERE rn = 1),
       |tr AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS c
       |       FROM (SELECT * FROM steps UNION ALL SELECT * FROM lastnc)
       |       GROUP BY src, dst)""".stripMargin

  /** One scenario's probability matrix + unrolled value iteration.
    * `tag` suffixes the CTE names; `removedChannel` applies the
    * redirect-to-NULL construction. Ends in `v${RemovalIters}_<tag>`. */
  private def scenarioSql(tag: String, removedChannel: Option[String]): String = {
    val trS = removedChannel match {
      case None => s"tr${tag} AS (SELECT src, dst, c FROM tr)"
      case Some(ch) =>
        s"""tr${tag} AS (SELECT src, CASE WHEN dst = '$ch' THEN 'NULL' ELSE dst END AS dst,
           |             CAST(sum(c) AS BIGINT) AS c
           |      FROM tr WHERE src <> '$ch' GROUP BY 1, 2)""".stripMargin
    }
    val pS =
      s"""p${tag} AS (SELECT src, dst,
         |            CAST((${Mil} * c) // sum(c) OVER (PARTITION BY src) AS BIGINT) AS p
         |     FROM tr${tag})""".stripMargin
    val steps = (1 to RemovalIters).map { k =>
      val prevLookup =
        if (k == 1) "0"
        else s"coalesce(vp.v, 0)"
      val join =
        if (k == 1) ""
        else s" LEFT JOIN v${k - 1}${tag} vp ON vp.s = pp.dst"
      s"""v$k${tag} AS (SELECT pp.src AS s,
         |       CAST(sum(pp.p * CASE WHEN pp.dst = 'CONV' THEN ${Mil}
         |                            WHEN pp.dst = 'NULL' THEN 0
         |                            ELSE $prevLookup END) // ${Mil} AS BIGINT) AS v
         |FROM p${tag} pp$join GROUP BY pp.src)""".stripMargin
    }
    (Seq(trS, pS) ++ steps).mkString(",\n")
  }

  val oracles: Map[String, String] = Map(
    "q215_contrastive_triplets" ->
      s"""WITH ${OlapQueries.knnChainSql},
         |knn AS (SELECT query_id, neighbor_id, dot FROM r WHERE rank <= ${OlapQueries.KnnK}),
         |lab AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
         |e AS (SELECT knn.query_id, knn.neighbor_id, knn.dot,
         |             la.label AS anchor_label,
         |             CASE WHEN la.label = lb.label THEN 1 ELSE 0 END AS same
         |      FROM knn JOIN lab la ON la.vec_id = knn.query_id
         |               JOIN lab lb ON lb.vec_id = knn.neighbor_id),
         |rb AS (SELECT *, row_number() OVER (PARTITION BY query_id, same
         |                 ORDER BY dot DESC, neighbor_id) AS rn FROM e),
         |pos AS (SELECT query_id AS anchor_id, anchor_label,
         |               neighbor_id AS pos_id, dot AS pos_dot
         |        FROM rb WHERE same = 1 AND rn = 1),
         |neg AS (SELECT query_id AS anchor_id, neighbor_id AS neg_id, dot AS neg_dot
         |        FROM rb WHERE same = 0 AND rn = 1)
         |SELECT pos.anchor_id, pos.anchor_label, pos.pos_id, pos.pos_dot,
         |       neg.neg_id, neg.neg_dot,
         |       CAST(pos.pos_dot - neg.neg_dot AS BIGINT) AS margin
         |FROM pos JOIN neg USING (anchor_id)
         |ORDER BY anchor_id""".stripMargin,
    "q216_brier_reliability" ->
      s"""WITH ${EvalQueries.clsKeepSql},
         |sy AS (SELECT sc.doc_id, sc.score, kp.keep AS y
         |       FROM sc JOIN kp USING (doc_id)),
         |rng AS (SELECT CAST(min(score) AS BIGINT) AS mn, CAST(max(score) AS BIGINT) AS mx FROM sy),
         |sp AS (SELECT sy.doc_id, sy.y,
         |              CAST(CASE WHEN rng.mx = rng.mn THEN 5000
         |                   ELSE (10000 * (sy.score - rng.mn)) // (rng.mx - rng.mn) END AS BIGINT) AS p
         |       FROM sy, rng),
         |sb AS (SELECT *, CAST(least(p // 1000, ${BrierBins - 1}) AS BIGINT) AS bin FROM sp),
         |g1 AS (SELECT CAST(count(*) AS BIGINT) AS n_total,
         |              CAST(sum(y) AS BIGINT) AS y_total,
         |              CAST(sum((p - 10000 * y) * (p - 10000 * y)) AS BIGINT) AS sq_sum
         |       FROM sb),
         |b AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
         |             CAST(sum(p) AS BIGINT) AS p_sum, CAST(sum(y) AS BIGINT) AS y_sum
         |      FROM sb GROUP BY bin),
         |bm AS (SELECT b.*, g1.n_total, g1.y_total, g1.sq_sum,
         |              CAST(b.p_sum // b.n_docs AS BIGINT) AS mean_p_x10k,
         |              CAST((10000 * b.y_sum) // b.n_docs AS BIGINT) AS mean_y_x10k,
         |              CAST((10000 * g1.y_total) // g1.n_total AS BIGINT) AS ybar_x10k
         |       FROM b, g1),
         |g2 AS (SELECT CAST(sum(n_docs * (mean_p_x10k - mean_y_x10k) * (mean_p_x10k - mean_y_x10k)) AS BIGINT) AS rel_sum,
         |              CAST(sum(n_docs * (mean_y_x10k - ybar_x10k) * (mean_y_x10k - ybar_x10k)) AS BIGINT) AS res_sum
         |       FROM bm)
         |SELECT bm.bin, bm.n_docs, bm.mean_p_x10k, bm.mean_y_x10k,
         |       CAST(bm.sq_sum // bm.n_total AS BIGINT) AS brier_x1e8,
         |       CAST(g2.rel_sum // bm.n_total AS BIGINT) AS reliability_x1e8,
         |       CAST(g2.res_sum // bm.n_total AS BIGINT) AS resolution_x1e8,
         |       CAST(bm.ybar_x10k * (10000 - bm.ybar_x10k) AS BIGINT) AS uncertainty_x1e8
         |FROM bm, g2 ORDER BY bm.bin""".stripMargin,
    "q217_removal_effect" -> {
      val scenarios = scenarioSql("_full", None) +: RemovalChannels.map(ch =>
        scenarioSql(s"_$ch", Some(ch)))
      val chRows = RemovalChannels.sorted.map { ch =>
        s"""SELECT '$ch' AS channel,
           |  (SELECT coalesce((SELECT v FROM v${RemovalIters}_full WHERE s = 'START'), 0)) AS conv_full_x1e6,
           |  (SELECT coalesce((SELECT v FROM v${RemovalIters}_$ch WHERE s = 'START'), 0)) AS conv_removed_x1e6""".stripMargin
      }.mkString("\n  UNION ALL ")
      s"""WITH $journeySql,
         |${scenarios.mkString(",\n")}
         |SELECT channel, CAST(conv_full_x1e6 AS BIGINT) AS conv_full_x1e6,
         |       CAST(conv_removed_x1e6 AS BIGINT) AS conv_removed_x1e6,
         |       CAST(CASE WHEN conv_full_x1e6 = 0 THEN 0
         |            ELSE (10000 * (conv_full_x1e6 - conv_removed_x1e6)) // conv_full_x1e6
         |            END AS BIGINT) AS removal_x10k
         |FROM ($chRows)
         |ORDER BY channel""".stripMargin
    },
    "q218_padding_audit" -> {
      val ladder = PadBuckets.map(b => s"WHEN ntok <= $b THEN $b").mkString(" ")
      s"""WITH d AS (SELECT CAST(len($normToks) AS BIGINT) AS ntok FROM documents),
         |db AS (SELECT ntok, CAST(CASE $ladder ELSE 2048 END AS BIGINT) AS bucket FROM d),
         |g AS (SELECT CAST(count(*) AS BIGINT) AS n_total, CAST(max(ntok) AS BIGINT) AS max_tok FROM db),
         |b AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
         |             CAST(sum(ntok) AS BIGINT) AS sum_tokens
         |      FROM db GROUP BY bucket),
         |bp AS (SELECT *, CAST(bucket * n_docs AS BIGINT) AS padded_tokens FROM b),
         |t AS (SELECT CAST(sum(padded_tokens) AS BIGINT) AS bucketed_padded FROM bp)
         |SELECT bp.bucket, bp.n_docs, bp.sum_tokens, bp.padded_tokens,
         |       CAST((10000 * (bp.padded_tokens - bp.sum_tokens)) // bp.padded_tokens AS BIGINT) AS waste_x10k,
         |       CAST((10000 * (g.n_total * g.max_tok - t.bucketed_padded)) // (g.n_total * g.max_tok) AS BIGINT) AS savings_vs_uniform_x10k
         |FROM bp, g, t ORDER BY bp.bucket""".stripMargin
    }
  )
}
