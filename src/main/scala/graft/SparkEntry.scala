package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory (SURVEY.md §2) as runnable queries on
  * the driver testdata; `oracleSql` holds the matching DuckDB SQL. Column
  * names and types are aligned pairwise (the driver's compare sorts columns
  * by name and hashes values).
  */
object SparkEntry {

  /** Flagship: full transactions-view replay (SURVEY.md §2.3) at sf0.001;
    * driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CdcQueries.q09_transactions_view(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CdcQueries.defs ++ DataPrepQueries.defs ++ RelationalQueries.defs ++
      PipelineQueries.defs ++ AnalyticsQueries.defs ++ CurationQueries.defs ++
      OlapQueries.defs ++ TrainPrepQueries.defs ++ CorpusQueries.defs ++
      MiningQueries.defs ++ PatternQueries.defs ++ DriftQueries.defs ++
      HygieneQueries.defs ++ FlowQueries.defs ++ BalanceQueries.defs ++
      MaskQueries.defs ++ BudgetQueries.defs ++ SearchQueries.defs ++
      GraphStatQueries.defs ++ OpsAuditQueries.defs ++ JourneyQueries.defs ++
      TuningQueries.defs ++ BehaviorQueries.defs ++ NormQueries.defs ++
      ProjectionQueries.defs ++ SketchQueries.defs ++ KeywordQueries.defs ++
      RetailQueries.defs ++ SeriesQueries.defs ++ LabelQueries.defs ++
      MonitorQueries.defs ++ ReshapeQueries.defs ++ ReconcileQueries.defs ++
      EvalQueries.defs ++ StatQueries.defs ++ RetrievalQueries.defs ++
      FuzzyQueries.defs ++ OverlapQueries.defs ++ RagQueries.defs ++ IndexQueries.defs ++ CurveQueries.defs ++ StructureQueries.defs ++ TuneQueries.defs ++
      TextOpsQueries.defs ++ ValueQueries.defs ++ GovernQueries.defs ++ LinkageQueries.defs ++ ProvenanceQueries.defs ++ SweepQueries.defs ++ AgreeQueries.defs ++
      SmoothQueries.defs ++ GuardQueries.defs ++ CalibQueries.defs ++ ShapeQueries.defs ++
      AuditQueries.defs ++ MomentQueries.defs ++ GateQueries.defs ++ BandQueries.defs ++
      ClusterSweepQueries.defs ++ ExplainQueries.defs ++ ShardQueries.defs ++ CanonQueries.defs ++ CardQueries.defs ++ GraphQualityQueries.defs ++ MotifQueries.defs ++ SignifQueries.defs ++ RiskQueries.defs ++ StyleQueries.defs ++ ActiveQueries.defs ++ MatchQueries.defs ++ WalkQueries.defs ++ CodecQueries.defs ++ PreflightQueries.defs ++ FrontierQueries.defs ++ TrustQueries.defs ++ LifecycleQueries.defs ++ CommunityQueries.defs ++ MetadataQueries.defs ++ FidelityQueries.defs ++ DesignQueries.defs ++ AllocQueries.defs ++ MixtureQueries.defs ++ AlignQueries.defs ++ ReplayQueries.defs ++ BacktestQueries.defs ++ PercolationQueries.defs ++ CohesionQueries.defs ++ NoveltyQueries.defs ++ HomophilyQueries.defs ++ AgreementQueries.defs ++ LayoutQueries.defs ++ IsotonicQueries.defs ++ SamplingQueries.defs ++ ClosureQueries.defs ++ QteQueries.defs ++ BipartiteQueries.defs ++ KmvQueries.defs ++ UpliftQueries.defs ++ CascadeQueries.defs ++ BridgeQueries.defs ++ ContrastQueries.defs ++ RiskProfileQueries.defs ++ LtvQueries.defs ++ SizingQueries.defs ++ EnsembleQueries.defs ++ SemanticSweepQueries.defs ++ ChurnAuditQueries.defs

  def oracleSql: Map[String, String] =
    CdcQueries.oracles ++ DataPrepQueries.oracles ++ RelationalQueries.oracles ++
      PipelineQueries.oracles ++ AnalyticsQueries.oracles ++ CurationQueries.oracles ++
      OlapQueries.oracles ++ TrainPrepQueries.oracles ++ CorpusQueries.oracles ++
      MiningQueries.oracles ++ PatternQueries.oracles ++ DriftQueries.oracles ++
      HygieneQueries.oracles ++ FlowQueries.oracles ++ BalanceQueries.oracles ++
      MaskQueries.oracles ++ BudgetQueries.oracles ++ SearchQueries.oracles ++
      GraphStatQueries.oracles ++ OpsAuditQueries.oracles ++ JourneyQueries.oracles ++
      TuningQueries.oracles ++ BehaviorQueries.oracles ++ NormQueries.oracles ++
      ProjectionQueries.oracles ++ SketchQueries.oracles ++ KeywordQueries.oracles ++
      RetailQueries.oracles ++ SeriesQueries.oracles ++ LabelQueries.oracles ++
      MonitorQueries.oracles ++ ReshapeQueries.oracles ++ ReconcileQueries.oracles ++
      EvalQueries.oracles ++ StatQueries.oracles ++ RetrievalQueries.oracles ++
      FuzzyQueries.oracles ++ OverlapQueries.oracles ++ RagQueries.oracles ++ IndexQueries.oracles ++ CurveQueries.oracles ++ StructureQueries.oracles ++ TuneQueries.oracles ++
      TextOpsQueries.oracles ++ ValueQueries.oracles ++ GovernQueries.oracles ++ LinkageQueries.oracles ++ ProvenanceQueries.oracles ++ SweepQueries.oracles ++ AgreeQueries.oracles ++
      SmoothQueries.oracles ++ GuardQueries.oracles ++ CalibQueries.oracles ++ ShapeQueries.oracles ++
      AuditQueries.oracles ++ MomentQueries.oracles ++ GateQueries.oracles ++ BandQueries.oracles ++
      ClusterSweepQueries.oracles ++ ExplainQueries.oracles ++ ShardQueries.oracles ++ CanonQueries.oracles ++ CardQueries.oracles ++ GraphQualityQueries.oracles ++ MotifQueries.oracles ++ SignifQueries.oracles ++ RiskQueries.oracles ++ StyleQueries.oracles ++ ActiveQueries.oracles ++ MatchQueries.oracles ++ WalkQueries.oracles ++ CodecQueries.oracles ++ PreflightQueries.oracles ++ FrontierQueries.oracles ++ TrustQueries.oracles ++ LifecycleQueries.oracles ++ CommunityQueries.oracles ++ MetadataQueries.oracles ++ FidelityQueries.oracles ++ DesignQueries.oracles ++ AllocQueries.oracles ++ MixtureQueries.oracles ++ AlignQueries.oracles ++ ReplayQueries.oracles ++ BacktestQueries.oracles ++ PercolationQueries.oracles ++ CohesionQueries.oracles ++ NoveltyQueries.oracles ++ HomophilyQueries.oracles ++ AgreementQueries.oracles ++ LayoutQueries.oracles ++ IsotonicQueries.oracles ++ SamplingQueries.oracles ++ ClosureQueries.oracles ++ QteQueries.oracles ++ BipartiteQueries.oracles ++ KmvQueries.oracles ++ UpliftQueries.oracles ++ CascadeQueries.oracles ++ BridgeQueries.oracles ++ ContrastQueries.oracles ++ RiskProfileQueries.oracles ++ LtvQueries.oracles ++ SizingQueries.oracles ++ EnsembleQueries.oracles ++ SemanticSweepQueries.oracles ++ ChurnAuditQueries.oracles
}
