package graft

import java.io.File

import graft.tools.GenScale
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join rehearsal (SURVEY.md §6 / VERDICT r8 #3): prove the
  * runtime skew-split path actually FIRES on a genuinely heavy key, not
  * just that the conf is set. GenScale's `skew` option plants the heavy
  * keys (20% of lineitem rows on l_suppkey 0, 25% of events on user 0);
  * the spec generates that corpus once under target/ and pins the
  * executed adaptive plan.
  *
  * At 100 TB the same mechanics hold with the DEFAULT thresholds (256 MB
  * skewed-partition floor): a 20%-hot key in a 100 TB shuffle is tens of
  * TB in one partition — AQE splits it into advisory-sized chunks and
  * replicates the matching build rows, the runtime alternative to the
  * compile-time salting `join_salted_skew` demonstrates. The thresholds
  * are lowered here only because the rehearsal corpus is MBs, not TBs;
  * the factor/advisory RATIOS mirror production defaults.
  */
class SkewJoinSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/repo/target/skewfix"

  // regenerate if ANY table's _SUCCESS is missing — a partially-written
  // corpus (e.g. a killed GenScale run that finished lineitem but not
  // events) must not pass the guard (ADVICE r10)
  private val corpusTables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  private def ensureCorpus(): Unit =
    if (!corpusTables.forall(t =>
        new File(s"$dir/$t.parquet/_SUCCESS").exists()))
      GenScale.gen(spark, dir, 1, skew = true)

  test("planted heavy key: supplier 0 carries ~20% of lineitem rows") {
    ensureCorpus()
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val total = li.count().toDouble
    val hot = li.filter(col("l_suppkey") === 0L).count().toDouble
    assert(hot / total > 0.15 && hot / total < 0.25,
      s"hot-key share ${hot / total} outside the planted 20% band")
  }

  test("AQE splits the heavy-key shuffle partition (skew=true in the executed plan)") {
    ensureCorpus()
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // production-default RATIOS at test scale: partition is skewed when
      // > 2x median AND > 1 MB (defaults: 5x and 256 MB); split chunks
      // target the advisory size, as a cluster run would
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "256KB",
      // a skewed partition splits along MAPPER-block boundaries, so the
      // scan must produce enough map tasks to split across — at 100 TB a
      // hot key's shuffle blocks span thousands of mappers for free; the
      // 9 MB rehearsal corpus needs maxPartitionBytes lowered to get the
      // same multiplicity
      "spark.sql.files.maxPartitionBytes" -> "1MB",
      // force the sort-merge path: a broadcast join has no shuffle to
      // skew, and this corpus' supplier side would otherwise broadcast
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "16")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      val sup = spark.read.parquet(s"$dir/supplier.parquet")
      // integral-valued quantity summed as LONG so the equality check
      // below is exact regardless of partition-order float addition
      val joined = li.join(sup, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("long")).as("qty"))
      joined.collect() // execute: AQE re-plans on the materialized stats
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE skew split did not fire; executed plan:\n$plan")
      // and the split must not change the answer: equal to the
      // non-adaptive aggregate over the same corpus
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val expected = li.join(sup, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("long")).as("qty"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
        .toSet
      val got = joined.collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected, "skew-split join changed the aggregate")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("skewed events corpus: user 0 carries ~25% of events") {
    ensureCorpus()
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val share = ev.filter(col("user_id") === 0L).count().toDouble /
      ev.count().toDouble
    assert(share > 0.20 && share < 0.30,
      s"planted user-0 share $share outside the 25% band")
  }
}
