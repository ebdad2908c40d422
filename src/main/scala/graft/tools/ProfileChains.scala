package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: decompose the expensive queries' cost into (shared build,
  * residual query) by timing each registered query COLD (fresh cache +
  * Memo — the charge the suite's first consumer pays) and then WARM in
  * the same pass (what every later consumer pays). The difference is the
  * shared-stage build cost; optimizing a query whose warm time is already
  * small means optimizing the BUILD, not the query body.
  * Usage: runMain graft.tools.ProfileChains <q1,q2,...> */
object ProfileChains {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      graft.Tables.lineitem(spark, sfDir).groupBy("l_returnflag").count().count()
      for (name <- args(0).split(",")) {
        val fn = graft.SparkEntry.queries(name)
        spark.catalog.clearCache()
        graft.Memo.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val cold = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        fn(spark, sfDir).count()
        val warm = (System.nanoTime() - t1) / 1e9
        println(f"[chains] $name%-32s cold $cold%6.2f s  warm $warm%6.2f s  build≈ ${cold - warm}%6.2f s")
      }
    } finally spark.stop()
  }
}
