package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: write `.explain("formatted")` output for MANY registered
  * queries into files in one JVM — the per-query ExplainOne pays a full
  * sbt+session launch per plan, which makes a 20-query audit pass ~15 min
  * of pure startup. Usage:
  *
  *   runMain graft.tools.ExplainDump <outDir> <suffix> <q1,q2,...|all>
  *
  * Writes <outDir>/<query>_<suffix>.txt per query. Plans are captured
  * BEFORE execution (AdaptiveSparkPlan isFinalPlan=false) — the same
  * artifact the optimization rounds commit under plans/. */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val suffix = args(1)
    val names =
      if (args(2) == "all") graft.SparkEntry.queries.keys.toSeq.sorted
      else args(2).split(",").toSeq
    try {
      for (name <- names) {
        val fn = graft.SparkEntry.queries(name)
        val plan =
          try fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          catch { case e: Throwable => s"EXPLAIN FAILED: $e" }
        java.nio.file.Files.writeString(
          outDir.resolve(s"${name}_$suffix.txt"), plan)
        println(s"[explaindump] wrote $name")
      }
    } finally spark.stop()
  }
}
