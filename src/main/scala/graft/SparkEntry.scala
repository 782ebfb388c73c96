package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every implemented operator module into the driver's
  * `queries` / `oracleSql` maps. Each module owns its operator
  * implementations and the matching DuckDB oracle SQL; this object just
  * concatenates them so the Verify/Bench harness sees one flat namespace.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Events.queries ++ TextOps.queries ++
      Extras.queries ++ EventAnalytics.queries ++
      VectorOps.queries ++ graft.multimodal.Multimodal.queries ++
      graft.streaming.StreamOps.queries ++
      graft.sources.FileSources.queries ++
      graft.pipeline.TrainingDataPipeline.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Events.oracles ++ TextOps.oracles ++
      Extras.oracles ++ EventAnalytics.oracles ++
      VectorOps.oracles ++ graft.multimodal.Multimodal.oracles ++
      graft.streaming.StreamOps.oracles ++
      graft.sources.FileSources.oracles ++
      graft.pipeline.TrainingDataPipeline.oracles
}
