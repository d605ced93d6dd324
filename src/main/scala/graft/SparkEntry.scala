package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each registered [[QDef]] is one operator row from SURVEY.md §2; the
  * driver runs `queries` through [[Verify]] (DuckDB hash-compare on the
  * `oracleSql` entries) and [[Bench]] (per-query timing at sf0.1).
  */
object SparkEntry {

  /** All declared operators, in registration order. */
  val registry: Seq[QDef] =
    ScanFilterQueries.defs ++ JoinQueries.defs ++ AggQueries.defs ++
      SortSetQueries.defs ++ WindowQueries.defs ++ ReshapeQueries.defs ++
      ScalarFuncQueries.defs ++ StreamQueries.defs ++ TextQueries.defs ++
      SimilarityQueries.defs ++ DedupQueries.defs ++ UdxQueries.defs ++
      Multimodal.defs ++ EtlQueries.defs ++ IvfAnn.defs ++
      SamplingQueries.defs ++ AnalyticExtQueries.defs ++
      SketchQueries.defs ++ PipelineExtQueries.defs ++
      StatExtQueries.defs ++ CurationQueries.defs ++
      WarehouseQueries.defs ++ TrainPrepQueries.defs ++
      FeatureQueries.defs ++ RangeJoin.defs ++ MlEvalQueries.defs ++
      BenchmarkQueries.defs ++ BenchmarkQueries2.defs ++
      GraphQueries.defs ++ TimeSeriesQueries.defs ++
      SequenceQueries.defs ++ NonparamQueries.defs ++
      MlEvalQueries2.defs ++ DataOpsQueries.defs ++
      ExperimentQueries.defs ++ BpeQueries.defs ++ PqAnn.defs ++
      RetrievalExtQueries.defs ++ PcaQueries.defs ++
      SelectionQueries.defs ++ PipelineOpsQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    AggQueries.qAggBasic.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case QDef(n, _, Some(sql)) => n -> sql }.toMap
}
