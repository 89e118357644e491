package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are declared per-module; every module row maps to a SURVEY §2
  * inventory line. A query with an oracle is hash-verified against DuckDB at
  * sf0.01; oracle-less queries (approx sketches etc.) get rows-only checks.
  */
object SparkEntry {

  import graft.{queries => qm}
  private val modules: Seq[QueryModule] = Seq(
    qm.RefOps,
    qm.RelationalQueries,
    qm.LlmQueries,
    qm.WindowingQueries,
    qm.PipelineQueries,
    qm.ExpressionQueries,
    qm.ExtraRelationalQueries,
    qm.LlmQueries2,
    qm.AnalyticQueries,
    qm.TpchMoreQueries,
    qm.TpchFullQueries,
    qm.SurfaceQueries,
    qm.TrainingDataQueries,
    qm.CorpusScrubQueries,
    qm.AdvancedAnalyticsQueries,
    qm.ReliabilityQueries,
    qm.LmMixQueries,
    qm.ScaleOpsQueries,
    qm.AnnDedupQueries,
    qm.ScaleCorpusQueries,
    qm.RetrievalQueries,
    qm.RobustOpsQueries,
    qm.CurationOpsQueries,
    qm.IntervalOpsQueries,
    qm.OrderingOpsQueries,
    qm.CorpusStatsQueries,
    qm.GovernanceQueries,
    qm.LifecycleQueries,
    qm.PlannerOpsQueries,
    qm.MiningOpsQueries,
    qm.BehaviorOpsQueries,
    qm.SignalOpsQueries,
    qm.PruneOpsQueries,
    qm.FidelityOpsQueries,
    qm.CalibrationOpsQueries,
    qm.MedallionOpsQueries,
    qm.CoresetOpsQueries,
    qm.DriftOpsQueries,
    qm.TuningOpsQueries,
    qm.EvalOpsQueries,
    qm.EngagementOpsQueries,
    qm.RerankOpsQueries,
    qm.ExperimentOpsQueries,
    qm.BehaviorQaOpsQueries,
    qm.HierDedupQueries,
    qm.SuffixOpsQueries,
    qm.StructureOpsQueries,
    qm.PatternOpsQueries,
    qm.ChunkOpsQueries,
    qm.FingerprintOpsQueries,
    qm.SegmentOpsQueries,
    qm.SymbolicOpsQueries,
    qm.LateInteractionOpsQueries,
    qm.FusionOpsQueries,
    qm.SequentialOpsQueries,
    qm.OutlierOpsQueries,
    qm.BinPackOpsQueries,
    qm.NetworkStatsOpsQueries,
    qm.BitemporalOpsQueries,
    qm.ClassifierOpsQueries,
    qm.RecsysOpsQueries,
    qm.GeoOpsQueries,
    qm.TrendOpsQueries,
    qm.IntegrityOpsQueries,
    qm.StatTestOpsQueries,
    qm.CommunityOpsQueries,
    qm.SweepOpsQueries,
    qm.MotifOpsQueries,
    qm.EvalMetricsOpsQueries,
    qm.LinkageOpsQueries,
    qm.ForecastOpsQueries,
    qm.MultiprobeOpsQueries,
    qm.SkylineOpsQueries,
    qm.AgreementOpsQueries,
    qm.KnapsackOpsQueries,
    qm.OpsResearchQueries,
    qm.VarianceOpsQueries,
    qm.ReconcileOpsQueries,
    qm.StreamAnalyticsQueries,
    qm.SourceExtraQueries,
    qm.GoldenOpsQueries,
    qm.AlignmentOpsQueries,
    qm.ShardOpsQueries,
    qm.EconOpsQueries,
    qm.ViterbiOpsQueries,
    qm.BoruvkaOpsQueries,
    qm.Scd2StreamOpsQueries,
    qm.QueueOpsQueries,
    qm.EvalAuditOpsQueries,
    qm.TrussOpsQueries,
    qm.SlaOpsQueries,
    qm.BootstrapOpsQueries,
    qm.ConcentrationOpsQueries,
    qm.ScreeningOpsQueries,
    qm.PeriodicityOpsQueries,
    qm.RakingOpsQueries,
    qm.TransportOpsQueries,
    qm.CostingOpsQueries,
    qm.KneeOpsQueries,
    qm.HeavyHitterStreamQueries,
    qm.CanaryOpsQueries,
    qm.RankTestOpsQueries,
    qm.ReceivablesOpsQueries,
    qm.SqlSurfaceExtraQueries,
    qm.LayoutAdvisorQueries,
    qm.ChecksumOpsQueries,
    qm.RiskEvalOpsQueries,
    qm.MotifRevenueOpsQueries,
    qm.EffectLayoutOpsQueries,
    qm.DriftPrivacyOpsQueries,
    qm.CentroidSyncOpsQueries,
    qm.PrfPowerOpsQueries,
    qm.ScriptingOpsQueries,
    qm.FuzzyBitmapOpsQueries,
    qm.ForecastEvalOpsQueries,
    qm.CoverageOpsQueries,
    qm.CurveOpsQueries,
    qm.SensitivityOpsQueries,
    qm.FunnelIntegrityOpsQueries,
    qm.CausalRankOpsQueries,
    qm.EquivalenceOpsQueries,
    qm.StaffingOpsQueries,
    qm.PairedTestOpsQueries,
    qm.InterleaveOpsQueries,
    qm.MixingOpsQueries,
    qm.CardinalityOpsQueries,
    qm.AdjustmentOpsQueries,
    qm.LinkPredOpsQueries,
    qm.XpathBpcOpsQueries,
    qm.GrowthAcctOpsQueries,
    qm.TripletOpsQueries,
    qm.PageTrendOpsQueries,
    qm.StockoutOpsQueries,
    qm.KpiTreeOpsQueries,
    qm.EmbeddednessOpsQueries,
    qm.CohensHOpsQueries,
    qm.RollupPrivacyOpsQueries,
    qm.LoyaltyOpsQueries,
    qm.CadenceOpsQueries,
    qm.SamplingSkewOpsQueries,
    qm.WapCupedOpsQueries,
    qm.LoaderGazetteerOpsQueries,
    qm.TakedownOpsQueries,
    qm.SubgroupConformalOpsQueries,
    qm.CompetingRisksOpsQueries)

  private lazy val registry: Seq[Q] = {
    val qs = modules.flatMap(_.all)
    require(qs.map(_.name).distinct.size == qs.size, "duplicate query names")
    qs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("o23_run_report")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries → weaker rows-only check. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
