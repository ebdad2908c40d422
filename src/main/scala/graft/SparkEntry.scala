package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of the per-area query maps; `oracleSql` carries a
  * DuckDB-runnable ANSI twin for every oracle-expressible query (keys absent
  * here get a rows-only check). Column aliases, rounding, and ORDER BY are
  * kept identical on both sides (SURVEY.md §7.2/§7.3 discipline).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("agg_groupby")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ AdvancedJoins.queries ++ Windows.queries ++
      Scalars.queries ++ LlmSimilarity.queries ++ TextOps.queries ++
      NearDup.queries ++ Multimodal.queries ++ Formats.queries ++
      Pipeline.queries ++ Curation.queries ++ GraphOps.queries ++
      LogAnalytics.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracleSql ++ AdvancedJoins.oracleSql ++ Windows.oracleSql ++
      Scalars.oracleSql ++ LlmSimilarity.oracleSql ++ TextOps.oracleSql ++
      NearDup.oracleSql ++ Multimodal.oracleSql ++ Formats.oracleSql ++
      Pipeline.oracleSql ++ Curation.oracleSql ++ GraphOps.oracleSql ++
      LogAnalytics.oracleSql
}
