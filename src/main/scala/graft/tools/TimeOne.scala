package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: time a single registered query by name (args(0)), repeated
  * args(1) times (default 2), fresh cache between passes — mirrors the
  * Bench harness for one query so iteration doesn't need a full suite run. */
object TimeOne {
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
      if (args.isEmpty) {
        println("[timeone] usage: TimeOne <query[,query...]> [passes]; " +
          s"valid names: ${graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
        return
      }
      graft.Tables.lineitem(spark, sfDir).groupBy("l_returnflag").count().count()
      val passes = if (args.length > 1) args(1).toInt else 2
      for (name <- args(0).split(",")) {
        graft.SparkEntry.queries.get(name) match {
          case None =>
            println(s"[timeone] unknown query '$name'; valid names: " +
              graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
          case Some(fn) =>
            for (p <- 1 to passes) {
              spark.catalog.clearCache()
              graft.Memo.clear()
              val t0 = System.nanoTime()
              val n = fn(spark, sfDir).count()
              println(f"[timeone] $name pass $p: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
            }
            // SPARK_GRAFT_EXPLAIN=1: after timing, print the executed
            // plan's scan/exchange/reuse census — the quick "is this
            // subtree recomputed?" probe without reading a full explain
            if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")) {
              val df = fn(spark, sfDir)
              // noop action on the SAME QueryExecution: finalizes the
              // AQE plan without pulling the result set to the driver
              // (collect() here risked driver OOM on wide outputs)
              df.queryExecution.toRdd.foreach(_ => ())
              val p = df.queryExecution.executedPlan.toString
              def n(tag: String) = p.linesIterator.count(_.contains(tag))
              println(s"[timeone] $name plan: scans=${n("Scan parquet")} " +
                s"shuffles=${n("Exchange hashpartitioning")} " +
                s"broadcasts=${n("BroadcastExchange")} " +
                s"reused=${n("ReusedExchange")}")
            }
        }
      }
    } finally spark.stop()
  }
}
