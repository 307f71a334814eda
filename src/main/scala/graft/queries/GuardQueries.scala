package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Round-7 wave-36 guard-rail operators: the C4/Gopher-style
  * rule-cascade filter audit (per-rule and FIRST-failing-rule drop
  * attribution — the report a curation team reads before changing any
  * threshold), a character-class composition audit (charset/encoding
  * anomalies that token-level monitors miss), time-decayed popularity
  * (integer halving decay — the recency-weighted engagement rollup),
  * and a k-anonymity audit over quasi-identifier equivalence classes
  * (the re-identification risk read next to q221's disparate-impact
  * and q102's PII scrub).
  *
  * Oracle conventions as the sibling modules: exact integers, floor
  * division when operands can be negative, identical aliases both
  * sides, ORDER BY a unique key.
  */
object GuardQueries {

  /** Rule thresholds (Gopher-ish, adapted to the corpus): length gate,
    * mean-word-length gate, symbol gate, repetition gate. */
  val RuleMinTokens = 10L
  val RuleMaxTokens = 500L
  val RuleMinTokLenX100 = 200L
  val RuleMaxTokLenX100 = 800L
  val RuleMaxPunctX10k = 1500L
  val RuleMaxTopShareX10k = 2000L

  /** X262 — rule-cascade filter audit: every doc evaluated against the
    * four-gate cascade (1 token count, 2 mean token length, 3 symbol
    * share, 4 top-token repetition share), reported per source as
    * per-rule failure counts AND first-failing-rule attribution (the
    * cascade order is the production short-circuit order, so `ffN` is
    * what each gate actually drops — rule interplay that per-rule
    * counts alone hide).
    *
    * Scale: one scalar metrics pass + one token pass for the
    * repetition gate (map-side combined), aggregated straight to
    * |sources| rows. All gates are codegen'd column arithmetic. */
  def q238_rule_cascade(spark: SparkSession, dir: String): DataFrame = {
    val metrics = qualityMetrics(col("text")).map { case (n, c) => c.as(n) }
    val m = Tables.documents(spark, dir)
      .select(col("doc_id") +: col("source") +: metrics: _*)
    val top = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(wsTokens(normalizeText(col("text")))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("top_cnt"), sum("c").as("n_norm"))
    val flags = m.join(top, Seq("doc_id"), "left")
      .na.fill(0L, Seq("top_cnt", "n_norm"))
      .withColumn("top_share_x10k",
        when(col("n_norm") > 0,
          floor(lit(10000L) * col("top_cnt") / col("n_norm")))
          .otherwise(0L).cast("long"))
      .withColumn("r1",
        (col("n_tokens") < RuleMinTokens || col("n_tokens") > RuleMaxTokens)
          .cast("long"))
      .withColumn("r2",
        (col("mean_tok_len_x100") < RuleMinTokLenX100 ||
          col("mean_tok_len_x100") > RuleMaxTokLenX100).cast("long"))
      .withColumn("r3", (col("punct_per_10k") > RuleMaxPunctX10k).cast("long"))
      .withColumn("r4",
        (col("top_share_x10k") > RuleMaxTopShareX10k).cast("long"))
      .withColumn("first_fail",
        when(col("r1") === 1, 1L).when(col("r2") === 1, 2L)
          .when(col("r3") === 1, 3L).when(col("r4") === 1, 4L).otherwise(0L))
    flags.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("r1").as("fail_len"), sum("r2").as("fail_toklen"),
        sum("r3").as("fail_symbol"), sum("r4").as("fail_repeat"),
        sum((col("first_fail") === 1).cast("long")).as("ff_len"),
        sum((col("first_fail") === 2).cast("long")).as("ff_toklen"),
        sum((col("first_fail") === 3).cast("long")).as("ff_symbol"),
        sum((col("first_fail") === 4).cast("long")).as("ff_repeat"),
        sum((col("first_fail") === 0).cast("long")).as("survivors"))
      .orderBy("source")
  }

  /** Per-doc "other"-class share (×10⁴) above which a doc counts as a
    * charset anomaly. */
  val CharOtherAnomalyX10k = 500L

  /** X263 — character-class composition audit: per source, the corpus
    * byte budget split into lowercase / uppercase / digit / space /
    * other classes (×10⁴ shares of total chars) plus the count of docs
    * whose own "other" share exceeds [[CharOtherAnomalyX10k]] — the
    * encoding/scraper-regression monitor (mojibake, markup bleed,
    * non-text payloads) that token-level quality scores are blind to.
    *
    * Scale: pure codegen'd scalar char-class arithmetic per doc, one
    * |sources|-row aggregate, zero joins. */
  def q239_charclass_mix(spark: SparkSession, dir: String): DataFrame = {
    def clsCount(pat: String) =
      length(col("text")) - length(regexp_replace(col("text"), pat, ""))
    val d = Tables.documents(spark, dir)
      .select(col("source"), length(col("text")).cast("long").as("n"),
        clsCount("[a-z]").cast("long").as("lo"),
        clsCount("[A-Z]").cast("long").as("up"),
        clsCount("[0-9]").cast("long").as("di"),
        clsCount(" ").cast("long").as("sp"))
      .withColumn("ot", col("n") - col("lo") - col("up") - col("di") - col("sp"))
      .withColumn("anom",
        (col("n") > 0 &&
          floor(lit(10000L) * col("ot") / col("n")) > CharOtherAnomalyX10k)
          .cast("long"))
    d.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n").as("total_chars"),
        expr("(10000 * sum(lo)) div sum(n)").as("lower_x10k"),
        expr("(10000 * sum(up)) div sum(n)").as("upper_x10k"),
        expr("(10000 * sum(di)) div sum(n)").as("digit_x10k"),
        expr("(10000 * sum(sp)) div sum(n)").as("space_x10k"),
        expr("(10000 * sum(ot)) div sum(n)").as("other_x10k"),
        sum("anom").as("n_anomalous"))
      .orderBy("source")
  }

  /** Decay half-life in days: engagement halves every week. */
  val DecayHalfLifeDays = 7L

  /** X264 — time-decayed popularity: per event type, engagement value
    * decayed by integer halving per [[DecayHalfLifeDays]]-day age
    * (weight = value_c >> (age_days div halflife), shift capped at 62)
    * against the undecayed sum — the recency-weighted ranking an
    * engagement surface actually serves, exact in integers (no float
    * exp decay). Age is relative to the corpus max timestamp, so the
    * query is deterministic at any point in time.
    *
    * Scale: one broadcast of the 1-row max-ts aggregate, codegen'd
    * shift arithmetic per event, one |event types|-row aggregate. */
  def q240_decayed_popularity(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.eventsCents(spark, dir)
    val mx = ev.agg(max("ts_ms").as("mx"))
    ev.crossJoin(broadcast(mx))
      .withColumn("sh",
        least(expr(s"((mx - ts_ms) div 86400000) div $DecayHalfLifeDays"),
          lit(62L)))
      .withColumn("dec_c",
        expr("value_c div shiftleft(CAST(1 AS BIGINT), CAST(sh AS INT))"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), sum("value_c").as("raw_sum_c"),
        sum("dec_c").as("decayed_sum_c"))
      .orderBy("event_type")
  }

  /** k-anonymity thresholds audited. */
  val AnonKs = Seq(2L, 3L, 5L, 10L)

  /** X265 — k-anonymity audit: customers bucketed by the
    * quasi-identifier triple (nation, market segment, account-balance
    * band); for each k in [[AnonKs]], the number of equivalence
    * classes of size < k and the share of records in them (×10⁴) —
    * the re-identification risk measurement that decides whether a
    * dataset needs generalization before release (the governance
    * companion of q102's field-level PII scrub: scrubbing fields does
    * nothing if the remaining combination is unique).
    *
    * Scale: one groupBy over the quasi-identifier triple (bounded
    * domain), then a 4-row threshold sweep over the class-size table. */
  def q241_k_anonymity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val g = Tables.customer(spark, dir)
      .select(col("c_nationkey"), col("c_mktsegment"),
        floor(expr("CAST(round(c_acctbal * 100) AS BIGINT)") / lit(100000L))
          .cast("long").as("bal_band"))
      .groupBy("c_nationkey", "c_mktsegment", "bal_band")
      .agg(count(lit(1)).as("sz"))
    val tot = g.agg(sum("sz").as("n_total"), count(lit(1)).as("n_classes"))
    val ks = AnonKs.toDF("k")
    g.crossJoin(broadcast(ks))
      .groupBy("k")
      .agg(sum((col("sz") < col("k")).cast("long")).as("n_classes_below"),
        sum(when(col("sz") < col("k"), col("sz")).otherwise(0L))
          .as("n_records_below"))
      .crossJoin(broadcast(tot))
      .select(col("k"), col("n_classes"), col("n_classes_below"),
        col("n_records_below"),
        expr("(10000 * n_records_below) div n_total").as("share_below_x10k"))
      .orderBy("k")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q238_rule_cascade" -> q238_rule_cascade,
    "q239_charclass_mix" -> q239_charclass_mix,
    "q240_decayed_popularity" -> q240_decayed_popularity,
    "q241_k_anonymity" -> q241_k_anonymity
  )

  // ---------------------------------------------------------------- oracles

  import DataPrepQueries.{normToks, toks}

  private val stopHits = DataPrepQueries.hitsSql("en")

  val oracles: Map[String, String] = Map(
    "q238_rule_cascade" ->
      s"""WITH m AS (
         |  SELECT doc_id, source,
         |         CAST(len($toks) AS BIGINT) AS n_tokens,
         |         CAST(CASE WHEN length(text) > 0 THEN floor(10000 *
         |             (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))
         |             / length(text)) ELSE 0 END AS BIGINT) AS punct_per_10k,
         |         CAST(CASE WHEN len($toks) > 0 THEN floor(100 *
         |             length(regexp_replace(text, '[^A-Za-z]', '', 'g')) / len($toks))
         |             ELSE 0 END AS BIGINT) AS mean_tok_len_x100
         |  FROM documents),
         |tp AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_cnt,
         |              CAST(sum(c) AS BIGINT) AS n_norm FROM (
         |         SELECT doc_id, token, count(*) AS c FROM (
         |           SELECT doc_id, unnest($normToks) AS token FROM documents)
         |         GROUP BY doc_id, token) GROUP BY doc_id),
         |f AS (SELECT m.source,
         |             CAST(m.n_tokens < $RuleMinTokens OR m.n_tokens > $RuleMaxTokens
         |                  AS BIGINT) AS r1,
         |             CAST(m.mean_tok_len_x100 < $RuleMinTokLenX100
         |                  OR m.mean_tok_len_x100 > $RuleMaxTokLenX100 AS BIGINT) AS r2,
         |             CAST(m.punct_per_10k > $RuleMaxPunctX10k AS BIGINT) AS r3,
         |             CAST((CASE WHEN coalesce(tp.n_norm, 0) > 0
         |                   THEN floor(10000 * coalesce(tp.top_cnt, 0) / tp.n_norm)
         |                   ELSE 0 END) > $RuleMaxTopShareX10k AS BIGINT) AS r4
         |      FROM m LEFT JOIN tp USING (doc_id)),
         |ff AS (SELECT source, r1, r2, r3, r4,
         |              CASE WHEN r1 = 1 THEN 1 WHEN r2 = 1 THEN 2
         |                   WHEN r3 = 1 THEN 3 WHEN r4 = 1 THEN 4
         |                   ELSE 0 END AS first_fail
         |       FROM f)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(r1) AS BIGINT) AS fail_len,
         |       CAST(sum(r2) AS BIGINT) AS fail_toklen,
         |       CAST(sum(r3) AS BIGINT) AS fail_symbol,
         |       CAST(sum(r4) AS BIGINT) AS fail_repeat,
         |       CAST(sum(CASE WHEN first_fail = 1 THEN 1 ELSE 0 END) AS BIGINT) AS ff_len,
         |       CAST(sum(CASE WHEN first_fail = 2 THEN 1 ELSE 0 END) AS BIGINT) AS ff_toklen,
         |       CAST(sum(CASE WHEN first_fail = 3 THEN 1 ELSE 0 END) AS BIGINT) AS ff_symbol,
         |       CAST(sum(CASE WHEN first_fail = 4 THEN 1 ELSE 0 END) AS BIGINT) AS ff_repeat,
         |       CAST(sum(CASE WHEN first_fail = 0 THEN 1 ELSE 0 END) AS BIGINT) AS survivors
         |FROM ff GROUP BY source ORDER BY source""".stripMargin,
    "q239_charclass_mix" ->
      s"""WITH d AS (
         |  SELECT source, CAST(length(text) AS BIGINT) AS n,
         |         CAST(length(text) - length(regexp_replace(text, '[a-z]', '', 'g'))
         |           AS BIGINT) AS lo,
         |         CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g'))
         |           AS BIGINT) AS up,
         |         CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
         |           AS BIGINT) AS di,
         |         CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS sp
         |  FROM documents),
         |e AS (SELECT source, n, lo, up, di, sp,
         |             n - lo - up - di - sp AS ot FROM d),
         |a AS (SELECT e.*, CAST(n > 0 AND floor(10000 * ot / n) > $CharOtherAnomalyX10k
         |                  AS BIGINT) AS anom FROM e)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(n) AS BIGINT) AS total_chars,
         |       CAST((10000 * sum(lo)) // sum(n) AS BIGINT) AS lower_x10k,
         |       CAST((10000 * sum(up)) // sum(n) AS BIGINT) AS upper_x10k,
         |       CAST((10000 * sum(di)) // sum(n) AS BIGINT) AS digit_x10k,
         |       CAST((10000 * sum(sp)) // sum(n) AS BIGINT) AS space_x10k,
         |       CAST((10000 * sum(ot)) // sum(n) AS BIGINT) AS other_x10k,
         |       CAST(sum(anom) AS BIGINT) AS n_anomalous
         |FROM a GROUP BY source ORDER BY source""".stripMargin,
    "q240_decayed_popularity" ->
      s"""WITH e AS (SELECT event_type, epoch_ms(ts) AS ts_ms,
         |                  CAST(round(value * 100) AS BIGINT) AS value_c
         |           FROM events),
         |m AS (SELECT CAST(max(ts_ms) AS BIGINT) AS mx FROM e),
         |w AS (SELECT e.event_type, e.value_c,
         |             least(((m.mx - e.ts_ms) // 86400000) // $DecayHalfLifeDays,
         |                   62) AS sh
         |      FROM e, m)
         |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
         |       CAST(sum(value_c) AS BIGINT) AS raw_sum_c,
         |       CAST(sum(value_c // (CAST(1 AS BIGINT) << CAST(sh AS INT))) AS BIGINT)
         |         AS decayed_sum_c
         |FROM w GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q241_k_anonymity" ->
      s"""WITH g AS (
         |  SELECT c_nationkey, c_mktsegment,
         |         CAST(floor(CAST(round(c_acctbal * 100) AS BIGINT) / 100000)
         |           AS BIGINT) AS bal_band,
         |         CAST(count(*) AS BIGINT) AS sz
         |  FROM customer GROUP BY c_nationkey, c_mktsegment, bal_band),
         |tot AS (SELECT CAST(sum(sz) AS BIGINT) AS n_total,
         |               CAST(count(*) AS BIGINT) AS n_classes FROM g),
         |ks AS (SELECT unnest([${AnonKs.mkString(", ")}]) AS k)
         |SELECT CAST(ks.k AS BIGINT) AS k, tot.n_classes,
         |       CAST(sum(CASE WHEN g.sz < ks.k THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_classes_below,
         |       CAST(sum(CASE WHEN g.sz < ks.k THEN g.sz ELSE 0 END) AS BIGINT)
         |         AS n_records_below,
         |       CAST((10000 * sum(CASE WHEN g.sz < ks.k THEN g.sz ELSE 0 END))
         |         // tot.n_total AS BIGINT) AS share_below_x10k
         |FROM g, ks, tot GROUP BY ks.k, tot.n_classes, tot.n_total ORDER BY k""".stripMargin
  )
}
