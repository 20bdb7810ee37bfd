package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` aggregate the per-module registries; every
  * implemented SURVEY §2 operator registers BOTH a DataFrame program and
  * (when SQL-expressible) DuckDB oracle SQL over the same parquet tables.
  * Column names and types are aligned on both sides because the driver
  * sorts columns by name and hash-compares values.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RequestOps.validate(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RequestOps.queries ++ ScanOps.queries ++ JoinOps.queries ++
      ResponseOps.queries ++ RetryOps.queries ++ TextOps.queries ++
      DedupOps.queries ++ SimilarityOps.queries ++ MultimodalOps.queries ++
      WindowOps.queries ++ AggOps.queries ++ ApproxOps.queries ++
      SqlSurfaceOps.queries ++ VariantOps.queries ++ AuditOps.queries ++
      RetrievalOps.queries ++ TimeSeriesOps.queries ++
      QualityFilterOps.queries ++ LayoutOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RequestOps.oracles ++ ScanOps.oracles ++ JoinOps.oracles ++
      ResponseOps.oracles ++ RetryOps.oracles ++ TextOps.oracles ++
      DedupOps.oracles ++ SimilarityOps.oracles ++ MultimodalOps.oracles ++
      WindowOps.oracles ++ AggOps.oracles ++ ApproxOps.oracles ++
      SqlSurfaceOps.oracles ++ VariantOps.oracles ++ AuditOps.oracles ++
      RetrievalOps.oracles ++ TimeSeriesOps.oracles ++
      QualityFilterOps.oracles ++ LayoutOps.oracles
}
