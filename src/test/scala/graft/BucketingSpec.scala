package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located joins — the 100 TB pattern for joining two big
  * fact tables repeatedly on the same key WITHOUT a shuffle per query:
  * both sides pre-bucketed on the join key means the join compiles to a
  * zip of matching buckets (no Exchange in the plan). */
class BucketingSpec extends AnyFunSuite with SparkFixture {

  test("pre-bucketed orders⋈lineitem plans with no shuffle exchange") {
    // unique per run: the in-memory catalog forgets tables between JVMs
    // but their warehouse directories survive
    val tag = java.lang.Long.toHexString(System.nanoTime())
    val (ot, lt) = (s"orders_b_$tag", s"lineitem_b_$tag")
    Tables.orders(spark, sfSmall).write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable(ot)
    Tables.lineitem(spark, sfSmall).write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable(lt)

    // force SMJ (at test scale the dim auto-broadcasts, which also avoids
    // a shuffle but wouldn't prove the bucketing path)
    val joined = spark.table(ot).hint("merge")
      .join(spark.table(lt),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString()
    val joinLine = plan.linesIterator.find(_.contains("SortMergeJoin"))
    assert(joinLine.isDefined, plan.take(1500))
    // bucket-pruned scan-to-join path: no Exchange feeding the join
    val beforeAgg = plan.substring(plan.indexOf("SortMergeJoin"))
    assert(!beforeAgg.contains("Exchange hashpartitioning(o_orderkey") &&
      !beforeAgg.contains("Exchange hashpartitioning(l_orderkey"),
      "bucketed join still shuffles:\n" + plan.take(2500))

    // and it computes the right thing
    val expected = Tables.orders(spark, sfSmall)
      .join(Tables.lineitem(spark, sfSmall),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val got = joined.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == expected)
  }
}
