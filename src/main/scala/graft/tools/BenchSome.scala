package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: Bench's exact pass discipline (all named queries per pass,
  * cache + Memo cleared BETWEEN passes, min-of-N per query) over a named
  * SUBSET — the before/after instrument for optimizations whose win is a
  * SHARED stage (Memo/cache), which TimeOne's per-pass clear would erase.
  * Usage: runMain graft.tools.BenchSome <q1,q2,...> [passes] */
object BenchSome {
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
      val names = args(0).split(",").toSeq
      val passes = if (args.length > 1) args(1).toInt else 2
      val times = Array.fill(names.size)(Double.MaxValue)
      for (p <- 1 to passes) {
        spark.catalog.clearCache()
        graft.Memo.clear()
        for ((name, i) <- names.zipWithIndex) {
          val t0 = System.nanoTime()
          val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
          val dt = (System.nanoTime() - t0) / 1e9
          times(i) = math.min(times(i), dt)
          println(f"[benchsome] pass $p $name: $dt%.2f s ($n rows)")
        }
      }
      for ((name, i) <- names.zipWithIndex)
        println(f"[benchsome] MIN $name: ${times(i)}%.3f s")
      println(f"[benchsome] MIN-TOTAL: ${times.sum}%.3f s")
    } finally spark.stop()
  }
}
