package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Plan-audit dump: `explain("formatted")` for the headline queries →
  * `PLANS.md`, so the scale-shape claims (pushdown, broadcast, partial
  * aggregation, no single-partition exchanges) are reviewable without
  * running anything. The load-bearing properties are ALSO pinned as
  * PlanSpec assertions; this artifact is the human-readable twin.
  */
object Plans {

  /** Headline queries whose physical shape carries the 100 TB argument. */
  val Headline: Seq[(String, String)] = Seq(
    "q01_filter_project" -> "filter+projection pushdown into the parquet scan",
    "q09_transactions_view" -> "flagship replay: ONE data shuffle for dedup+tie-break+fold",
    "q16_jaccard_pairs" -> "inverted-index self-join, df-capped; no all-pairs",
    "q17_minhash_lsh_pairs" -> "banded signature equijoin (sub-quadratic near-dup)",
    "q20_ann_brute_topk" -> "broadcast query side; map-side bounded-heap top-k, no cross-product window",
    "q31_ann_ivf_topk" -> "IVF: broadcast centroids/probes, bucketed search, heap rerank",
    "q34_pack_sequences" -> "two-phase global cumsum: no single-partition window",
    "q43_top_orders" -> "star join: dims broadcast, TakeOrderedAndProject top-k",
    "q44_region_volume" -> "six-way star join, all dims broadcast, fact never sort-merges",
    "q45_skew_join_agg" -> "salted join: physical key includes __salt",
    "q52_corpus_curation" -> "full curation pass composed as ONE lazy plan (dedup ∘ clusters ∘ quality ∘ report)",
    "q54_corpus_shuffle" -> "deterministic shuffle: fused md5 key, two-phase index, no single-partition window",
    "q60_signup_follow" -> "binned range join: hash equi-join on (key, bucket), NOT a nested loop",
    "q62_scd2_intervals" -> "SCD2: both windows share one user_id shuffle, no re-exchange between them",
    "q65_kmeans_assign" -> "k-means round: centroids broadcast, corpus never shuffles for assignment",
    "q71_above_avg_orders" -> "correlated scalar subqueries decorrelated to aggregate+join (no per-row re-execution)",
    "q72_anomalous_windows" -> "integer sigma-test: one count shuffle, window stats broadcast back",
    "q73_exact_contamination" -> "exact n-gram screen: distinct eval grams broadcast, corpus screened in one pass",
    "q77_top_orders_per_cust" -> "bounded-heap top-k per group: partial ObjectHashAggregate, no window sort",
    "q78_asof_native" -> "native as-of join: one exchange+sort per side, linear merge walk, no blended window",
    "q79_sliding_windows" -> "hopping windows: map-side 2x fan-out, ONE partial-aggregated shuffle",
    "q80_interval_lookup" -> "point-in-interval via the native as-of operator: no inequality join",
    "q81_edit_rerank" -> "Levenshtein only on LSH candidates: pair-side joins, no all-pairs",
    "q82_cube_revenue" -> "CUBE: map-side Expand below ONE partial-aggregated shuffle",
    "q86_chunk_dedup" -> "chunk ownership: one shuffle on the chunk hash, one on doc_id",
    "q88_negative_ring" -> "hash-ring negatives: two-phase global index + integer rank equi-join",
    "q89_data_quality" -> "constraint gate: one conditional-aggregate pass + groupBy + anti-join",
    "q94_bpe_merges" -> "BPE training: per-word windows, vocabulary-sized shuffles, 1-row broadcast winners",
    "q95_semdedup" -> "SemDeDup: broadcast-trained clusters bound the pair search (cluster-keyed equi-join, no all-pairs)",
    "q98_kcenter_coreset" -> "k-center: one corpus pass per round against a TakeOrdered broadcast winner, no windows",
    "q101_dsir_weights" -> "DSIR: one token pass, <=4096-row ratio table broadcast back, two partial aggs",
    "q102_pii_scrub" -> "pattern scrub: codegen'd regexp map pass, zero shuffles",
    "q103_dup_spans" -> "ExactSubstr spans: gram equijoin + bounded explode only for cross-doc matches",
    "q104_random_projection" -> "JL projection: literal sign matrix, narrow posexplode, shuffle-free",
    "q106_span_corruption" -> "mask planning: token pass + bounded x3 explode + per-doc island window, no cartesian",
    "q108_label_propagation" -> "label propagation: IVF kNN graph + neighbor-label equijoin + per-node vote window",
    "q111_collocations" -> "collocation lift: one token pass, vocabulary-keyed equijoins, 1-row broadcast total",
    "q112_source_overlap" -> "source overlap: DISTINCT (source,gram) bounds the gram equijoin fan-out to sources^2",
    "q113_curriculum" -> "curriculum staging: two-phase globalCumSum, no single-partition window",
    "q116_cooc_windows" -> "co-occurrence: slice+zip_with window unroll, bounded xW explode, ONE pair-key shuffle",
    "q119_ann_recall" -> "recall sweep: one tagged candidate pass, per-depth heap re-ranks reuse the scoring exchange",
    "q124_sorted_neighborhood" -> "sorted-neighborhood screen: two-phase index + integer band equijoin, W rows per doc",
    "q127_rank_ensemble" -> "Borda gate: three globalIndex passes, no single-partition window",
    "q131_pagerank" -> "PageRank: per round one edge equijoin + one dst partial aggregate, edge-list-bounded"
  )

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("PLANS.md")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of the headline queries\n\n")
    sb.append(s"Generated by `graft.Plans` at $sfDir. The load-bearing shape\n")
    sb.append("properties are pinned as PlanSpec assertions; this is the readable twin.\n")
    Headline.foreach { case (name, why) =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect() // let AQE finalize so the printed plan is the executed one
      sb.append(s"\n## $name — $why\n\n```\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      sb.append("```\n")
      graft.ops.Dedup.unpersistIntermediates(spark)
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"[plans] wrote $out (${Headline.size} queries)")
    spark.stop()
  }
}
