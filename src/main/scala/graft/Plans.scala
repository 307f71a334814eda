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

  /** Headline queries whose physical shape carries the 100 TB argument —
    * every query that costs >0.5 s on the sf0.1 bench board, plus the
    * pushdown/flagship exemplars. */
  val Headline: Seq[(String, String)] = Seq(
    "q01_filter_project" -> "filter+projection pushdown into the parquet scan",
    "q02_ttl_antifilter" -> "schema'd from_json TTL screen: one parse, codegen'd filter, no data shuffle before the output sort",
    "q09_transactions_view" -> "flagship replay: ONE data shuffle for dedup+tie-break+fold",
    "q15_exact_dedup" -> "exact dedup: ONE fingerprint shuffle, keep-first via min aggregate",
    "q16_jaccard_pairs" -> "inverted-index self-join, df-capped; no all-pairs",
    "q17_minhash_lsh_pairs" -> "banded signature equijoin (sub-quadratic near-dup)",
    "q19_simhash_pairs" -> "simhash pairs: 16-bit segment pigeonhole equijoin + bit_count(xor) rerank, no all-pairs",
    "q20_ann_brute_topk" -> "broadcast query side; map-side bounded-heap top-k, no cross-product window",
    "q21_ann_lsh_topk" -> "hyperplane LSH: bucket equijoin candidates + exact heap rerank (md5-parity planes)",
    "q30_crossmodal_pairs" -> "cross-modal agreement: q16's pinned pair core + per-side embedding equijoins (pairs << corpus)",
    "q31_ann_ivf_topk" -> "IVF: broadcast centroids/probes, bucketed search, heap rerank",
    "q33_dup_clusters" -> "connected components iterate the EDGE list (min-label rounds, checkpoint-truncated), corpus untouched per round",
    "q34_pack_sequences" -> "two-phase global cumsum: no single-partition window",
    "q37_contamination" -> "LSH pair set bucketed by source pair: attribution joins ride the bounded pair table",
    "q38_tfidf_terms" -> "TF-IDF: partial-agg tf/df shuffles, ranking window per doc only",
    "q41_session_stats" -> "session_window aggregate: ONE user shuffle, same expression batch and streaming",
    "q43_top_orders" -> "star join: dims broadcast, TakeOrderedAndProject top-k",
    "q44_region_volume" -> "six-way star join, all dims broadcast, fact never sort-merges",
    "q45_skew_join_agg" -> "salted join: physical key includes __salt",
    "q52_corpus_curation" -> "full curation pass composed as ONE lazy plan (dedup ∘ clusters ∘ quality ∘ report)",
    "q53_decontaminate" -> "band-key LEFT ANTI screen: distinct eval keys vs corpus, no pair materialization",
    "q54_corpus_shuffle" -> "deterministic shuffle: fused md5 key, two-phase index, no single-partition window",
    "q60_signup_follow" -> "binned range join: hash equi-join on (key, bucket), NOT a nested loop",
    "q62_scd2_intervals" -> "SCD2: both windows share one user_id shuffle, no re-exchange between them",
    "q64_trigram_lm" -> "trigram + Kneser-Ney continuation: two partial-agg gram shuffles + one bigram equijoin",
    "q65_kmeans_assign" -> "k-means round: centroids broadcast, corpus never shuffles for assignment",
    "q66_zipf_coverage" -> "Zipf head: TakeOrdered top-k, two-phase rank/cumsum over the k surviving rows only",
    "q71_above_avg_orders" -> "correlated scalar subqueries decorrelated to aggregate+join (no per-row re-execution)",
    "q72_anomalous_windows" -> "integer sigma-test: one count shuffle, window stats broadcast back",
    "q73_exact_contamination" -> "exact n-gram screen: distinct eval grams broadcast, corpus screened in one pass",
    "q74_boilerplate_share" -> "boilerplate share: one df shuffle on the shingle + equijoin back + per-doc aggregate",
    "q75_retention_cohorts" -> "cohort matrix: co-partitioned customer-key shuffles, broadcast cohort sizes",
    "q76_containment_pairs" -> "containment: SAME pinned intersection core as q16 — the family builds it once per session",
    "q77_top_orders_per_cust" -> "bounded-heap top-k per group: partial ObjectHashAggregate, no window sort",
    "q78_asof_native" -> "native as-of join: one exchange+sort per side, linear merge walk, no blended window",
    "q79_sliding_windows" -> "hopping windows: map-side 2x fan-out, ONE partial-aggregated shuffle",
    "q80_interval_lookup" -> "point-in-interval via the native as-of operator: no inequality join",
    "q81_edit_rerank" -> "Levenshtein only on LSH candidates: pair-side joins, no all-pairs",
    "q82_cube_revenue" -> "CUBE: map-side Expand below ONE partial-aggregated shuffle",
    "q86_chunk_dedup" -> "chunk ownership: one shuffle on the chunk hash, one on doc_id",
    "q88_negative_ring" -> "hash-ring negatives: two-phase global index + integer rank equi-join",
    "q89_data_quality" -> "constraint gate: one conditional-aggregate pass + groupBy + anti-join",
    "q91_knn_graph" -> "kNN graph: IVF bucket search with queries = corpus, map-side bounded-heap ranking",
    "q94_bpe_merges" -> "BPE training: per-word windows, vocabulary-sized shuffles, 1-row broadcast winners",
    "q95_semdedup" -> "SemDeDup: broadcast-trained clusters bound the pair search (cluster-keyed equi-join, no all-pairs)",
    "q98_kcenter_coreset" -> "k-center: one corpus pass per round against a TakeOrdered broadcast winner, no windows",
    "q100_bpe_tokenize" -> "BPE apply: one corpus word pass + vocabulary-sized segmentation join",
    "q101_dsir_weights" -> "DSIR: one token pass, <=4096-row ratio table broadcast back, two partial aggs",
    "q102_pii_scrub" -> "pattern scrub: codegen'd regexp map pass, zero shuffles",
    "q103_dup_spans" -> "ExactSubstr spans: gram equijoin + bounded explode only for cross-doc matches",
    "q104_random_projection" -> "JL projection: literal sign matrix, narrow posexplode, shuffle-free",
    "q106_span_corruption" -> "mask planning: token pass + bounded x3 explode + per-doc island window, no cartesian",
    "q105_bpe_fertility" -> "tokenizer fertility: one word pass + vocabulary-sized segmentation join, per-language aggregate",
    "q108_label_propagation" -> "label propagation: IVF kNN graph + neighbor-label equijoin + per-node vote window",
    "q110_hard_examples" -> "min-margin mining: bounded-heap top-k on the negated margin, no corpus window",
    "q111_collocations" -> "collocation lift: one token pass, vocabulary-keyed equijoins, 1-row broadcast total",
    "q112_source_overlap" -> "source overlap: DISTINCT (source,gram) bounds the gram equijoin fan-out to sources^2",
    "q113_curriculum" -> "curriculum staging: two-phase globalCumSum, no single-partition window",
    "q114_neardup_flow" -> "near-dup flow: two meta joins over the bounded pinned pair set, |sources|^2 aggregate",
    "q116_cooc_windows" -> "co-occurrence: slice+zip_with window unroll, bounded xW explode, ONE pair-key shuffle",
    "q117_basket_pairs" -> "basket pairs: per-basket fan-out bounded by the event-type vocabulary^2, broadcast totals",
    "q119_ann_recall" -> "recall sweep: one tagged candidate pass, per-depth heap re-ranks reuse the scoring exchange",
    "q120_concordance" -> "KWIC: narrow posexplode + literal term filter, context sliced from the bound token array, no joins",
    "q122_score_calibration" -> "calibration: classifier scoring chain + |bins|-sized aggregate + 1-row broadcast total",
    "q124_sorted_neighborhood" -> "sorted-neighborhood screen: two-phase index + integer band equijoin, W rows per doc",
    "q127_rank_ensemble" -> "Borda gate: three globalIndex passes, no single-partition window",
    "q131_pagerank" -> "PageRank: per round one edge equijoin + one dst partial aggregate, edge-list-bounded",
    "q132_session_paths" -> "session paths: one sorted collect per session group, then session-count-sized aggregates",
    "q135_cluster_keeper" -> "cluster keeper: CC labels + per-cluster max-of-struct argmax, no corpus window",
    "q136_dedup_masks" -> "dup-span masks: spread gram pass, equijoin -> bounded position explode -> WINDOW-FREE per-doc array island merge",
    "q138_vocab_growth" -> "Heaps curve: two-phase doc index, min-decile per gram type, constant-partition cumsum over 10 rows",
    "q142_bm25_topk" -> "BM25 retrieval: probe-term filter BEFORE any shuffle, df + totals broadcast, TakeOrderedAndProject top-k",
    "q144_cdc_chunks" -> "content-defined chunks: fused in-row CdcChunks walk (no token explode, no window), ownership on the digest shuffle",
    "q145_knn_triangles" -> "kNN triangles: cached canonical edge set, wedge equijoins bounded by deg<=2k, never |V|^2",
    "q146_knn_outliers" -> "kth-neighbor outliers: per-query max-of-struct argmax, one global exact percentile, broadcast threshold",
    "q152_market_share" -> "TPC-H Q8 star: fact streams once, both nation roles + region + supplier broadcast, AQE re-plans the customer join",
    "q161_brand_copurchase" -> "bipartite projection: brand via broadcast dim, pair fan-out bounded per order, one pair-key shuffle",
    "q163_peak_concurrency" -> "sweep line: +1/-1 session deltas, per-day running max inside a day-partitioned window, no overlap pairs",
    "q168_rfm_segments" -> "RFM: per-user aggregate then three globalIndex quintile passes, no single-partition window",
    "q178_link_prediction" -> "link prediction: wedge equijoins on the cached canonical edge list + LEFT ANTI non-edge screen, TakeOrdered cut",
    "q181_rrf_fusion" -> "RRF: both rankers share the probe-term candidate pass (ReuseExchange), each cut by TakeOrdered, fusion on <=60 rows",
    "q182_ndcg_at_k" -> "NDCG: IVF kNN graph + two label equijoins, literal discount arrays, |labels|-row final aggregate",
    "q184_knn_confusion" -> "confusion: q108 vote chain feeds two |labels|-row aggregates full-outer-joined, nothing corpus-wide after votes",
    "q185_rater_kappa" -> "kappa: Rocchio rater = broadcast |labels| centroids + max-of-struct argmax (no window), marginals are |labels|-row",
    "q187_mann_kendall" -> "Mann-Kendall: pair space is |days|^2 per type (calendar-bounded), lower-median via per-type window over pairs",
    "q189_spearman_rfm" -> "Spearman: ranks from two two-phase globalIndex passes, 1-row moment aggregate, no corpus window",
    "q190_phrase_search" -> "phrase search: probe-term postings filter before any shuffle, (doc,pos+i) equijoins, TakeOrdered cut",
    "q191_mmr_rerank" -> "MMR: TakeOrdered candidate cut, pairwise dots + greedy fold all inside the plan on MmrCand^2 rows",
    "q192_bloom_decontam" -> "bloom decontam: pinned shingle core + tracked gram cache, eval bitset broadcasts, two left-semi broadcast probes map-side, only candidates shuffle to the exact join",
    "q199_rag_context" -> "RAG capstone: TakeOrdered arms -> RRF -> in-plan MMR fold -> token packing, one lazy plan, bounded-row tail",
    "q200_ppjoin_pairs" -> "PPJoin: pinned shingle core, prefix postings equijoin pruned by exact length+position filters, exact-Jaccard rerank on candidates only",
    "q202_gini_features" -> "gini binning: two-phase global index over (dim,v,vec_id), 64-row broadcast offsets, ntile arithmetic - no per-dim single-task sort",
    "q204_average_precision" -> "AP: two-phase globalIndex + globalCumSum over the ranked corpus, no single-task window",
    "q205_cumulative_gains" -> "gains: explicit-floor decile bucketing on the two-phase index, 10-row cumulative tail",
    "q206_frequent_triples" -> "A-priori triples: frequent-pair candidate generation, basket re-scan counts candidates only",
    "q208_bfs_layers" -> "BFS layers: bounded frontier-expand/anti-join rounds off the pinned edge core, localCheckpoint per round",
    "q211_winnow_pairs" -> "winnowing: fused WinnowFps pass (incremental gram md5 + deque sliding-min), (doc,nfp) packed ids kill the sizes joins, capped-collect equijoin, never all-pairs",
    "q214_blocklist_screen" -> "blocklist: literal pattern lists evaluated in-row over the token array (term + adjacent-pair counts) - NO corpus shuffle, output sort only",
    "q215_contrastive_triplets" -> "triplets: pinned kNN artifact + <=k-row rank windows per (anchor, side), two bounded joins",
    "q216_brier_reliability" -> "brier: pinned classifier core, 1-row + |bins|-row aggregates, everything else broadcast",
    "q217_removal_effect" -> "removal effect: q118-shape distributed transition aggregate; iteration on the collected |types|^2 matrix (bounded)",
    "q220_quota_topk" -> "quota top-k: bounded-heap per-source cap map-side, TakeOrdered over <=|sources|*cap rows",
    "q222_blocking_linkage" -> "linkage: capped blocking-key equijoin candidates, exact confirm via pinned-core arrays on candidates only, CC on edges",
    "q224_holt_forecast" -> "holt: distributed daily aggregate; calendar-bounded driver fold; oracle replays recurrence via recursive CTE",
    "q226_dedup_provenance" -> "provenance: four loser sets off pinned cores, four left joins on the doc spine",
    "q227_concept_clusters" -> "concepts: vocabulary-sized lift graph, two-phase index ids, CC iterates the edge list",
    "q228_mrr_at_k" -> "MRR: pinned kNN + per-query min-rank aggregate, |labels|-row rollup",
    "q229_stratified_folds" -> "folds: two-phase global index over (source, md5, id), broadcast per-source offsets, no per-stratum single-task window",
    "q231_contamination_sweep" -> "length sweep: per-n distinct-gram equijoin on 60-bit hashed keys (eval set vs train stream), one tokenize across arms, n=3 arm on the pinned shingle core",
    "q237_score_smoothing" -> "score smoothing: two pinned cores + one neighbor-id equijoin + per-doc <=k-row aggregate",
    "q242_item_item_cf" -> "item CF: distinct user-item edges, vocabulary-bounded pair aggregate, bounded-heap top-k per item",
    "q243_minhash_calibration" -> "minhash calibration: band-survivor pairs + 16 narrow signature columns by id + pinned exact-jaccard core; no new quadratic stage",
    "q245_linkage_score" -> "FS linkage: two-pass capped blocking candidates, attribute equijoins by id, <=2^4-row score distribution",
    "q248_revenue_gini" -> "gini: fact aggregate to |customers|, two-phase global rank, 10-row decile window",
    "q254_weighted_negatives" -> "weighted negatives: cumulative ranges explode to spanned bins, points equijoin their bin - no point x item nested loop",
    "q258_sparse_recall" -> "sparse recall: ALL arms in one scored pass (per-m masked union, cutoffs read off one sorted-|v| array), one bounded-heap shuffle keyed (m, query)",
    "q260_cluster_sweep" -> "tau sweep: pinned intersection core, arms packed into node*|arms|+arm ids, ONE CC loop for all thresholds",
    "q276_source_data_card" -> "data card: one map-only text pass (metrics+fingerprint), per-source aggregates over staged cores",
    "q263_neardup_evidence" -> "evidence: pinned pair core top-k cut, shingle joins bounded by the cut, windows over <=20 pairs",
    "q283_waiting_supplier" -> "Q21 collapse: EXISTS+NOT EXISTS as ONE grouped pass - each fact scanned once, no per-order window",
    "q289_quantization_recall" -> "int8 recall: both arms broadcast the query sample and heap-reduce - the corpus streams, scored pairs never materialize",
    "q292_temporal_motifs" -> "motifs: user-keyed equi self-joins span-bounded at the a-b step - no cross-user pairing, no cartesian",
    "q296_paired_significance" -> "permutation test: |discordant| x B rows generated map-side off the pinned rater pair, one B-row reduce",
    "q300_principal_direction" -> "PC1: matrix-free power iteration - two chained |V|-row aggregates per round, 1-row max broadcasts, covariance never materialized",
    "q306_stylometric_distance" -> "stylometry: one token pass, head-vocab-bounded rate frame, |sources|^2-bounded L1 pairs",
    "q308_deletion_blast_radius" -> "blast radius: broadcast forget-set semi-joins per artifact, lineitem scoped through its orders",
    "q309_active_learning_batch" -> "active learning: TakeOrdered uncertainty pool, k-center rounds over the POOL only - corpus touched once for scores",
    "q311_greedy_matching" -> "parallel matching: lineage-truncated edge core, per-round ONE endpoint-exploded window + one (u,v) survivor aggregate + anti-joins - driver plans stay leaf-anchored",
    "q312_dbscan_clusters" -> "DBSCAN-lite: strong-edge filter off the truncated core, CC on the core-core SUBGRAPH only, border attach via bounded per-node window",
    "q323_nation_profit" -> "TPC-H Q9: name-filtered part + supplier-nation dims broadcast, per-line cents profit BEFORE the (nation,year) aggregate - map-side partials",
    "q326_source_tv_matrix" -> "TV matrix: quantized rates, INNER token equijoin for the min-mass sums, one-sided tokens ride |sources|-row rate totals",
    "q330_resource_allocation" -> "RA link prediction: k-bounded wedge self-join, |nodes|-row degree table broadcast onto the wedge mid",
    "q331_lpa_modularity" -> "modularity: LPA labels cached, intra edges by two id equijoins, ONE exact rational + one floor-double division",
    "q335_histogram_fidelity" -> "histogram fidelity: per-side key-count tables cached, feed BOTH exact join total and |buckets|-row histogram estimate - facts read once",
    "q336_bloom_calibration" -> "bloom calibration: per-budget position rows joined on bit only, member bitset distinct-reduced before the probe join",
    "q337_er_operating_curve" -> "ER curve: pinned blocking+scores vs pinned jaccard truth, cumulative P/R over a <=|scores| frame",
    "q340_activity_streaks" -> "streaks: distinct (user,day), user-partitioned island windows, |streak-lengths|-row histogram",
    "q361_isotonic_calibration" -> "isotonic: cached (score,y) frame feeds extent + bucket passes once; PAV via <=B^2 lattice join, everything after the bucket agg is 16-row",
    "q366_shingle_sweep" -> "shingle sweep: one cached tokenize base, all three orders in ONE packed-key posting exchange (order in key AND id), per-order unpack after the pair aggregate",
    "q372_trigram_affinity" -> "trigram affinity: CharGramCounts pre-aggregates per-doc gram repetition in-row before the explode, (source,g) profile aggregate, in-row posting pairs - no gram self-join"
  )

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("PLANS.md")
    val spark = Sessions.tune(SparkSession.builder())
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
