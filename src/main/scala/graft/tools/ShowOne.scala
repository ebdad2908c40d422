package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: print a registered query's first rows (default 50) at
  * SPARK_GRAFT_SF_DIR — the value-inspection sibling of TimeOne (timings)
  * and ExplainOne (plans), for reading meter queries at the big fixtures
  * where the DuckDB twin is too slow to be a convenient probe. */
object ShowOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try graft.SparkEntry.queries(args(0))(spark, sfDir)
      .show(if (args.length > 1) args(1).toInt else 50, truncate = false)
    finally spark.stop()
  }
}
