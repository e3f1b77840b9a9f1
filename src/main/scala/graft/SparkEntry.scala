package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.rel.{AnalyticQueries, RelQueries, ScaleQueries}
import graft.ext.{ClusterQueries, DedupQueries, IncrementalDedup, Multimodal, SampleQueries, SimilarityQueries, TextQueries}
import graft.sched.MaintenanceQueries
import graft.streaming.StreamOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelQueries.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelQueries.queries ++ AnalyticQueries.queries ++ ScaleQueries.queries ++
      ClusterQueries.queries ++
      DedupQueries.queries ++ IncrementalDedup.queries ++
      SampleQueries.queries ++ SimilarityQueries.queries ++
      TextQueries.queries ++ Multimodal.queries ++
      MaintenanceQueries.queries ++ StreamOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelQueries.oracles ++ AnalyticQueries.oracles ++ ScaleQueries.oracles ++
      ClusterQueries.oracles ++
      DedupQueries.oracles ++ IncrementalDedup.oracles ++
      SampleQueries.oracles ++ SimilarityQueries.oracles ++
      TextQueries.oracles ++ Multimodal.oracles ++
      MaintenanceQueries.oracles ++ StreamOps.oracles
}
