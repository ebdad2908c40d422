package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture-table readers (TESTDATA.md / FIXTURES.md).
  *
  * All tables are single parquet files under the scale-factor dir. The only
  * special case is `events.ts`, which is physical parquet TIMESTAMP(NANOS):
  * Spark 4.x refuses to read it unless `spark.sql.legacy.parquet.nanosAsLong`
  * is set, in which case the column arrives as nanosecond `LongType`. We
  * truncate to microseconds with *integer* division (`DIV`) — double
  * division would lose precision at 1.7e18 ns — which matches DuckDB's
  * native ns→µs truncation exactly (SURVEY.md §7.2).
  *
  * Scale posture: each reader is a plain parquet scan, so Catalyst pushes
  * filters and prunes columns into the scan; at 100 TB these become
  * partitioned/bucketed reads with no code change here.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events` with `ts` converted to TimestampType (µs), matching DuckDB.
    *
    * `nanosAsLong` is set at session build in Verify/Bench and the test
    * fixtures; the conf.set here is an idempotent fallback for ad-hoc
    * sessions (it only affects reads planned after this call — never rely
    * on it from a cached plan). `DIV 1000` truncates toward zero, which
    * equals floor for the fixtures' post-1970 (positive-nanos) domain and
    * matches DuckDB's ns→µs truncation on the same data.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, sfDir, "events")
      .withColumn("ts",
        timestamp_micros(expr("ts DIV 1000")).cast("timestamp_ntz"))
  }
}
