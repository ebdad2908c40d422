package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product/log-analytics over the events stream-table — the batch half of
  * the reference's Twitter-analytics identity (SURVEY.md §0 north star:
  * "stream processing and log analytics"): conversion funnels and
  * retention cohorts, the two queries every event-log warehouse runs.
  *
  * Scale posture (100 TB of events): both operators reduce the raw log to
  * per-user scalars FIRST (hash agg on user_id — the highest-cardinality
  * key, so parallelism is maximal and state per key is O(1)), then
  * aggregate those skinny tables. The funnel's sequencing constraints
  * (view AFTER first click, purchase AFTER that view) need the raw log
  * joined back to the per-user frontier — an equi-join on user_id that
  * AQE plans shuffle-hash with both sides already keyed; no window over
  * the full log, no driver loop.
  */
object LogAnalytics {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Conversion funnel click → view → purchase with event-time
    // sequencing: stage 2 counts users whose earliest view FOLLOWS their
    // earliest click; stage 3 users whose earliest qualifying purchase
    // follows that view. Strict inequality at each hop (same-timestamp
    // pairs don't demonstrate ordering). One row out: stage populations
    // and step conversion rates.
    "events_funnel" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val views = ev.filter(col("event_type") === "view")
        .join(clicks, "user_id")
        .filter(col("ts") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val buys = ev.filter(col("event_type") === "purchase")
        .join(views, "user_id")
        .filter(col("ts") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      clicks.agg(count(lit(1)).as("n_clicked"))
        .crossJoin(broadcast(views.agg(count(lit(1)).as("n_viewed"))))
        .crossJoin(broadcast(buys.agg(count(lit(1)).as("n_purchased"))))
        .select(col("n_clicked"), col("n_viewed"), col("n_purchased"),
          expr("floor(n_viewed / CAST(n_clicked AS DOUBLE) * 1000000D + 0.5D) " +
            "/ 1000000D").as("view_rate"),
          expr("floor(n_purchased / CAST(n_viewed AS DOUBLE) * 1000000D + 0.5D) " +
            "/ 1000000D").as("purchase_rate"))
    }),

    // Retention cohorts: users grouped by first-seen day, activity
    // counted per (cohort, day-offset) — the engagement-decay surface.
    // distinct users per cell via the two-phase count-distinct the
    // engine's agg family already exercises; cohort_day is emitted as a
    // DATE-truncated timestamp so the parquet type matches DuckDB's.
    "events_retention_cohort" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val first = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
      ev.join(first, "user_id")
        .groupBy(col("cohort"),
          datediff(col("day"), col("cohort")).cast("long").as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .select(col("cohort").cast("timestamp_ntz").as("cohort_day"),
          col("day_offset"), col("n_users"))
        .orderBy(col("cohort_day"), col("day_offset"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "events_funnel" ->
      ("WITH ev AS (SELECT user_id, event_type, ts FROM events), " +
        "clicks AS (SELECT user_id, min(ts) AS t1 FROM ev " +
        "WHERE event_type = 'click' GROUP BY user_id), " +
        "views AS (SELECT user_id, min(ts) AS t2 FROM ev " +
        "JOIN clicks USING (user_id) " +
        "WHERE event_type = 'view' AND ts > t1 GROUP BY user_id), " +
        "buys AS (SELECT user_id, min(ts) AS t3 FROM ev " +
        "JOIN views USING (user_id) " +
        "WHERE event_type = 'purchase' AND ts > t2 GROUP BY user_id) " +
        "SELECT n_clicked, n_viewed, n_purchased, " +
        "floor(n_viewed / CAST(n_clicked AS DOUBLE) * 1000000 + 0.5) / 1000000 " +
        "AS view_rate, " +
        "floor(n_purchased / CAST(n_viewed AS DOUBLE) * 1000000 + 0.5) / 1000000 " +
        "AS purchase_rate FROM " +
        "(SELECT count(*) AS n_clicked FROM clicks), " +
        "(SELECT count(*) AS n_viewed FROM views), " +
        "(SELECT count(*) AS n_purchased FROM buys)"),

    "events_retention_cohort" ->
      ("WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events), " +
        "fst AS (SELECT user_id, min(day) AS cohort FROM ev GROUP BY user_id) " +
        "SELECT CAST(cohort AS TIMESTAMP) AS cohort_day, " +
        "CAST(date_diff('day', cohort, day) AS BIGINT) AS day_offset, " +
        "count(DISTINCT user_id) AS n_users " +
        "FROM ev JOIN fst USING (user_id) " +
        "GROUP BY cohort, day_offset ORDER BY cohort_day, day_offset")
  )
}
