package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions (SURVEY.md §2.5 W1–W4).
  *
  * int64 discipline: Spark's ranking functions return INT while DuckDB's
  * return BIGINT — every rank/ntile column is cast to long here so parquet
  * dtypes match the oracle exactly.
  *
  * Scale posture: every window partitions on a real key (event_type /
  * user_id / customer / range-partition id) — one shuffle per query, state
  * bounded per partition, and NO empty-partition windows anywhere: W4's
  * global rank/total are built from a range partitioning plus tiny
  * aggregate-derived offset/total joins (PlanShapeSpec asserts no query
  * plans a single-task window).
  */
object Windows {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // W1: top-5 per group with all three ranking flavors.
    "window_rank_topk" -> ((s, d) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value").desc, col("event_id"))
      Tables.events(s, d)
        .select(col("event_type"), col("event_id"), col("value"),
          row_number().over(w).cast("long").as("rk"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"))
        .filter(col("rk") <= 5)
        .orderBy(col("event_type"), col("rk"))
    }),

    // W2: batch sessionization — lag() gap detection + running sum ids.
    "window_lag_sessionize" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("is_new",
          when(col("prev_ts").isNull ||
            col("ts") > col("prev_ts") + expr("INTERVAL '30' MINUTE"), 1L)
            .otherwise(0L))
        .groupBy(col("user_id"))
        .agg(sum(col("is_new")).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    }),

    // W3: running revenue per customer over order dates.
    "window_running" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          round(sum(col("o_totalprice")).over(w), 2).as("running_total"))
        .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
    }),

    // W4: ntile quartiles + share-of-total — WITHOUT the single-partition
    // global window (`ntile() OVER (ORDER BY …)` moves every row through
    // one task; a scale-killer). Instead: a deterministic two-level rank —
    // bucket rows into 256 contiguous VALUE ranges of the sort key (bounds
    // from a broadcast min/max), rank within each bucket, and lift to a
    // global rank by adding per-bucket row-count offsets (a 256²-bounded
    // join, built with aggregates — no collect, no empty-partition
    // window). The bucket id derives from the DATA, not from
    // spark_partition_id() after a range repartition: the rank branch and
    // the counts branch execute the subtree independently, and sampled
    // range bounds can differ between executions, silently corrupting
    // off + lrk (measured on this machine for the analogous prefix-sum in
    // Curation). ntile's first-(n mod k)-buckets-get-one-extra split is
    // then arithmetic on (rank, n).
    "window_ntile_share" -> ((s, d) => {
      val bounds = Tables.orders(s, d)
        .agg(min(col("o_totalprice")).as("mn"), max(col("o_totalprice")).as("mx"),
          sum(col("o_totalprice")).as("grand"), count(lit(1)).as("n"))
      val blocked = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"))
        .crossJoin(broadcast(bounds))
        .withColumn("blk", expr(
          "IF(mx = mn, 0L, least(CAST(floor((o_totalprice - mn) / " +
            "((mx - mn) / 256.0D)) AS BIGINT), 255L))"))
        .withColumn("lrk", row_number().over(
          Window.partitionBy(col("blk"))
            .orderBy(col("o_totalprice"), col("o_orderkey"))).cast("long"))
      val counts = blocked.groupBy(col("blk")).agg(count(lit(1)).as("cnt"))
      val offsets = counts.as("a")
        .join(counts.as("b"), col("b.blk") < col("a.blk"), "left")
        .groupBy(col("a.blk").as("blk"))
        .agg(coalesce(sum(col("b.cnt")), lit(0L)).as("off"))
      blocked
        .join(broadcast(offsets), "blk")
        .withColumn("rk", col("off") + col("lrk"))
        .select(col("o_orderkey"),
          // ntile(4): first n%4 buckets take ceil(n/4) rows, rest floor.
          expr("""CAST(IF(rk <= (n % 4) * (n DIV 4 + 1),
                         (rk - 1) DIV (n DIV 4 + 1) + 1,
                         n % 4 + (rk - 1 - (n % 4) * (n DIV 4 + 1)) DIV (n DIV 4) + 1)
                  AS BIGINT)""").as("quartile"),
          round(col("o_totalprice") / col("grand"), 8).as("share"))
        .orderBy(col("o_orderkey"))
    }),

    // W5: the distribution/value window gauntlet — percent_rank,
    // cume_dist, nth_value, first/last over explicit frames, all on one
    // event_type-partitioned pass (ONE shuffle, every function shares the
    // sort). The ORDER BY carries event_id as a unique tiebreak, so the
    // rank fractions are exact ratios of integers — cross-engine-stable
    // doubles, rounded at 1e-6 well above the noise floor. nth_value's
    // frame is written out explicitly on BOTH engines (Spark's default
    // differs from the SQL-standard RANGE default DuckDB uses; with a
    // total order they coincide, but pinned is pinned).
    "window_percentiles" -> ((s, d) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value").desc, col("event_id"))
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wa = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, d)
        .select(col("event_type"), col("event_id"), col("value"),
          row_number().over(w).cast("long").as("rk"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"),
          nth_value(col("value"), 3).over(wf).as("v3"),
          first(col("value")).over(wf).as("vtop"),
          last(col("value")).over(wa).as("vbot"))
        .filter(col("rk") <= 3)
        .orderBy(col("event_type"), col("rk"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "window_rank_topk" ->
      "SELECT event_type, event_id, value, rk, rnk, drnk FROM (SELECT event_type, event_id, value, row_number() OVER w AS rk, rank() OVER w AS rnk, dense_rank() OVER w AS drnk FROM events WINDOW w AS (PARTITION BY event_type ORDER BY value DESC, event_id)) WHERE rk <= 5 ORDER BY event_type, rk",

    "window_lag_sessionize" ->
      "SELECT user_id, CAST(sum(is_new) AS BIGINT) AS n_sessions, count(*) AS n_events FROM (SELECT user_id, CASE WHEN lag(ts, 1) OVER w IS NULL OR ts > lag(ts, 1) OVER w + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) GROUP BY user_id ORDER BY user_id",

    "window_running" ->
      "SELECT o_custkey, o_orderkey, o_orderdate, round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey",

    "window_ntile_share" ->
      "SELECT o_orderkey, ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile, round(o_totalprice / sum(o_totalprice) OVER (), 8) AS share FROM orders ORDER BY o_orderkey",

    "window_percentiles" ->
      ("SELECT event_type, event_id, value, rk, pr, cd, v3, vtop, vbot " +
        "FROM (SELECT event_type, event_id, value, " +
        "row_number() OVER w AS rk, " +
        "round(percent_rank() OVER w, 6) AS pr, " +
        "round(cume_dist() OVER w, 6) AS cd, " +
        "nth_value(value, 3) OVER (PARTITION BY event_type " +
        "ORDER BY value DESC, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v3, " +
        "first_value(value) OVER (PARTITION BY event_type " +
        "ORDER BY value DESC, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vtop, " +
        "last_value(value) OVER (PARTITION BY event_type " +
        "ORDER BY value DESC, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS vbot " +
        "FROM events WINDOW w AS (PARTITION BY event_type " +
        "ORDER BY value DESC, event_id)) " +
        "WHERE rk <= 3 ORDER BY event_type, rk")
  )
}
