package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    JoinQueries.joinStar(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    AggQueries.queries ++ JoinQueries.queries ++
    ScanQueries.queries ++ SortSetQueries.queries ++
    WindowQueries.queries ++ ScalarQueries.queries ++
    SemiStructQueries.queries ++ TextQueries.queries ++
    SimQueries.queries ++ UdxQueries.queries ++
    DedupQueries.queries ++ TextAnalysisQueries.queries ++
    CapabilityQueries.queries ++ RelExtraQueries.queries ++
    MoreRelQueries.queries ++ PipelineQueries.queries ++
    WideSurfaceQueries.queries ++ StatsMlQueries.queries ++
    FunctionalQueries.queries ++ CorpusSimQueries.queries ++
    IrGraphQueries.queries ++ RobustQueries.queries ++
    MlEvalQueries.queries ++ GraphQueries.queries ++
    BizSeriesQueries.queries ++ LlmPipeQueries.queries ++
    AnalyticsExtraQueries.queries ++ GovernanceQueries.queries ++
    DriftQueries.queries ++ EncodingSeqQueries.queries ++
    CalendarPathQueries.queries ++ BinaryArrayQueries.queries ++
    RobustStatsQueries.queries ++ AttributionQueries.queries ++
    TwapGroupingQueries.queries ++ SourceTermQueries.queries ++
    DistributionQueries.queries ++ InferenceQueries.queries ++
    ChurnZipfQueries.queries ++ HitsFunnelQueries.queries ++
    BasketQueries.queries ++ OrderStatsQueries.queries ++
    InfoStatsQueries.queries ++ MixSampleQueries.queries ++
    IntervalQueries.queries ++ EvalExtraQueries.queries ++
    CleanTextQueries.queries ++ StatEngQueries.queries ++
    SeasonalQueries.queries ++ OverlapSeriesQueries.queries ++
    SeqEconQueries.queries ++ RiskStatsQueries.queries ++
    ExperimentQueries.queries ++ VectorStatsQueries.queries ++
    TemporalRelQueries.queries ++ NonParamQueries.queries ++
    DerivedAnalyticsQueries.queries ++ StatTestQueries.queries ++
    EmbOpsQueries.queries ++ SketchExactQueries.queries ++
    GraphFeatureQueries.queries ++ ForecastQueries.queries ++
    HygieneQueries.queries ++ RetrievalQueries.queries ++
    SeriesShapeQueries.queries ++ TextExtraQueries.queries ++
    FeatureEngQueries.queries ++ PathAgreementQueries.queries ++
    CorpusDriftQueries.queries ++ MonitorQueries.queries ++
    NormalityQueries.queries ++ FilterFunnelQueries.queries ++
    ProcessMiningQueries.queries ++ KmeansStepQueries.queries ++
    SqlSurfaceQueries.queries ++ DedupLshQueries.queries ++
    ProductAnalyticsQueries.queries ++ DispersionQueries.queries ++
    StratifiedQueries.queries ++ RakingQueries.queries ++
    ClusterEvalQueries.queries ++ MlEvalExtraQueries.queries ++
    ExactHllQueries.queries ++ GeoCellQueries.queries ++
    CdcMergeQueries.queries ++ ShapleyQueries.queries ++
    RankTestQueries.queries ++ SeriesDiagQueries.queries ++
    MultivarQueries.queries ++ ClassMetricsQueries.queries ++
    EncodingEconQueries.queries ++ TextGraphQueries.queries ++
    VarTestQueries.queries ++ TpchQueries.queries ++
    PairedTestQueries.queries ++ ReliabilityQueries.queries ++
    DiversityRetrievalQueries.queries ++ TopKAggQueries.queries ++
    MatchedRanksQueries.queries ++ ExtremesQueries.queries ++
    PriceIndexQueries.queries ++ SeqPatternQueries.queries ++
    LlmExtraQueries.queries ++ InferExtraQueries.queries ++
    GraphDistQueries.queries ++ UncertaintyEconQueries.queries ++
    CountDispersionQueries.queries ++ EvennessQueries.queries ++
    TpchExtraQueries.queries ++ InventoryEconQueries.queries ++
    GraphShapeQueries.queries ++ TailRiskQueries.queries ++
    InequalityQueries.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    AggQueries.oracle ++ JoinQueries.oracle ++
    ScanQueries.oracle ++ SortSetQueries.oracle ++
    WindowQueries.oracle ++ ScalarQueries.oracle ++
    SemiStructQueries.oracle ++ TextQueries.oracle ++
    SimQueries.oracle ++ UdxQueries.oracle ++
    DedupQueries.oracle ++ TextAnalysisQueries.oracle ++
    RelExtraQueries.oracle ++ MoreRelQueries.oracle ++
    PipelineQueries.oracle ++ WideSurfaceQueries.oracle ++
    StatsMlQueries.oracle ++ FunctionalQueries.oracle ++
    CorpusSimQueries.oracle ++ IrGraphQueries.oracle ++
    RobustQueries.oracle ++ MlEvalQueries.oracle ++
    GraphQueries.oracle ++ BizSeriesQueries.oracle ++
    LlmPipeQueries.oracle ++ AnalyticsExtraQueries.oracle ++
    GovernanceQueries.oracle ++ DriftQueries.oracle ++
    EncodingSeqQueries.oracle ++ CalendarPathQueries.oracle ++
    BinaryArrayQueries.oracle ++ RobustStatsQueries.oracle ++
    AttributionQueries.oracle ++ TwapGroupingQueries.oracle ++
    SourceTermQueries.oracle ++ DistributionQueries.oracle ++
    InferenceQueries.oracle ++ ChurnZipfQueries.oracle ++
    HitsFunnelQueries.oracle ++ BasketQueries.oracle ++
    OrderStatsQueries.oracle ++ InfoStatsQueries.oracle ++
    MixSampleQueries.oracle ++ IntervalQueries.oracle ++
    EvalExtraQueries.oracle ++ CleanTextQueries.oracle ++
    StatEngQueries.oracle ++ SeasonalQueries.oracle ++
    OverlapSeriesQueries.oracle ++ SeqEconQueries.oracle ++
    RiskStatsQueries.oracle ++ ExperimentQueries.oracle ++
    VectorStatsQueries.oracle ++ TemporalRelQueries.oracle ++
    NonParamQueries.oracle ++ DerivedAnalyticsQueries.oracle ++
    StatTestQueries.oracle ++ EmbOpsQueries.oracle ++
    SketchExactQueries.oracle ++ GraphFeatureQueries.oracle ++
    ForecastQueries.oracle ++ HygieneQueries.oracle ++
    RetrievalQueries.oracle ++ SeriesShapeQueries.oracle ++
    TextExtraQueries.oracle ++ FeatureEngQueries.oracle ++
    PathAgreementQueries.oracle ++ CorpusDriftQueries.oracle ++
    MonitorQueries.oracle ++ NormalityQueries.oracle ++
    FilterFunnelQueries.oracle ++ ProcessMiningQueries.oracle ++
    KmeansStepQueries.oracle ++ SqlSurfaceQueries.oracle ++
    DedupLshQueries.oracle ++ ProductAnalyticsQueries.oracle ++
    DispersionQueries.oracle ++ StratifiedQueries.oracle ++
    RakingQueries.oracle ++ ClusterEvalQueries.oracle ++
    MlEvalExtraQueries.oracle ++ ExactHllQueries.oracle ++
    GeoCellQueries.oracle ++ CdcMergeQueries.oracle ++
    ShapleyQueries.oracle ++ RankTestQueries.oracle ++
    SeriesDiagQueries.oracle ++ MultivarQueries.oracle ++
    ClassMetricsQueries.oracle ++ EncodingEconQueries.oracle ++
    TextGraphQueries.oracle ++ VarTestQueries.oracle ++
    TpchQueries.oracle ++ PairedTestQueries.oracle ++
    ReliabilityQueries.oracle ++ DiversityRetrievalQueries.oracle ++
    TopKAggQueries.oracle ++ MatchedRanksQueries.oracle ++
    ExtremesQueries.oracle ++ PriceIndexQueries.oracle ++
    SeqPatternQueries.oracle ++ LlmExtraQueries.oracle ++
    InferExtraQueries.oracle ++ GraphDistQueries.oracle ++
    UncertaintyEconQueries.oracle ++ CountDispersionQueries.oracle ++
    EvennessQueries.oracle ++ TpchExtraQueries.oracle ++
    InventoryEconQueries.oracle ++ GraphShapeQueries.oracle ++
    TailRiskQueries.oracle ++ InequalityQueries.oracle
}
