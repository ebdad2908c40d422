package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
    }),

    // Rolling z-score anomaly detection: per (event_type, hour) volumes
    // scored against the TRAILING 24-hour window (range frame, current
    // hour excluded — the score must not see the value it judges); hours
    // whose |z| > 2 with ≥ 12 trailing observations are flagged.
    //
    // Cross-engine float discipline: the window aggregates are INTEGER
    // sums (count, Σn, Σn²) — exact at any accumulation order — and
    // mean/variance/z are derived per-row from those exact sums with the
    // IDENTICAL expression tree on both engines (var from the
    // sum-of-squares identity, not stddev_samp: the two engines' stddev
    // implementations accumulate differently and can flip a rounded
    // boundary). Scale: partitioned by event_type × ordered by hour —
    // the per-series window the no-single-task guard allows; at 100 TB
    // the series key is (metric, entity) with millions of partitions,
    // same plan.
    "events_anomaly" -> ((s, d) => {
      val hourly = Tables.events(s, d)
        .select(col("event_type"), expr("unix_timestamp(ts) DIV 3600").as("hr"))
        .groupBy(col("event_type"), col("hr"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
        .rangeBetween(-24, -1)
      hourly
        .withColumn("cnt", count(col("n")).over(w))
        .withColumn("s1", sum(col("n")).over(w))
        .withColumn("s2", sum(col("n") * col("n")).over(w))
        .filter(col("cnt") >= 12)
        .withColumn("mean", col("s1").cast("double") / col("cnt"))
        .withColumn("vr", expr(
          "(s2 - CAST(s1 AS DOUBLE) * s1 / cnt) / (cnt - 1)"))
        .filter(col("vr") > 0)
        .withColumn("z", expr("(n - mean) / sqrt(vr)"))
        .filter(abs(col("z")) > 2)
        .select(col("event_type"), col("hr"), col("n"),
          expr("floor(mean * 1000000D + 0.5D) / 1000000D").as("mean_24h"),
          expr("floor(z * 1000000D + 0.5D) / 1000000D").as("z_score"))
        .orderBy(col("event_type"), col("hr"))
    }),

    // Latest-state materialization from the event log — the CDC-apply /
    // event-sourcing compaction every warehouse runs (MERGE latest-wins):
    // one row per user carrying their most recent event, tombstoned away
    // when that event is an error. Shape: ONE two-phase hash agg — a
    // max-of-struct with (ts, event_id) leading keys picks the latest row
    // with map-side partial aggregation, strictly cheaper than the
    // row_number window form (hash agg, no per-partition sort; the
    // orderable-struct trick). user_id is the table's highest-cardinality
    // key, so parallelism is maximal and per-key state is one struct.
    "events_cdc_latest" -> ((s, d) =>
      latestStateOf(Tables.events(s, d)).orderBy(col("user_id"))),

    // DAU / trailing-7-day WAU / stickiness — the canonical engagement
    // rollup. The trailing window is NOT a window function here: each
    // (user, day) activity row fans out to the 7 window-ENDS it counts
    // toward (a bounded ×7 explode of the already-deduped skinny table),
    // so WAU(d) = one hash count-distinct keyed by day — the two-phase
    // distinct the engine's agg family already exercises, no per-day
    // re-scan, no 7-day self-join. Restricting window ends to observed
    // days keeps the output grid honest. Scale: the fan-out multiplies
    // (users × active-days), not the raw log; everything downstream is
    // day-keyed (bounded cardinality).
    "events_wau" -> ((s, d) => {
      val ud = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val days = ud.select(col("day")).distinct()
      val dau = ud.groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("dau"))
      val wau = ud
        .select(col("user_id"), explode(expr(
          "transform(sequence(0, 6), i -> date_add(day, i))")).as("wday"))
        .join(days.select(col("day").as("wday")), "wday")
        .groupBy(col("wday"))
        .agg(countDistinct(col("user_id")).as("wau"))
        .select(col("wday").as("day"), col("wau"))
      dau.join(wau, "day")
        .select(col("day").cast("timestamp_ntz").as("day"),
          col("dau"), col("wau"),
          expr("floor(dau / CAST(wau AS DOUBLE) * 1000000D + 0.5D) / 1000000D")
            .as("stickiness"))
        .orderBy(col("day"))
    }),

    // Time-series gap fill — the regularization step every observability
    // pipeline runs BEFORE scoring (events_anomaly's trailing window
    // silently shrinks over missing hours; a gap-filled series makes
    // absence-of-data a fact, not a blind spot): densify each series to
    // its full [first, last] hourly grid, zero-fill counts, and carry the
    // last observed value forward (34–53 real gaps per series at sf0.01).
    // Shape: the grid EXPLODES from each series' extent row (bounded by
    // span, not corpus), joins back on the (series, hour) key, and the
    // carry-forward is a per-series window — at 100 TB the series key is
    // (metric, entity), millions of bounded partitions. Value sums are
    // integer cents (the domain_mix determinism discipline).
    "events_gap_fill" -> ((s, d) => {
      val hourly = Tables.events(s, d)
        .select(col("event_type"), expr("unix_timestamp(ts) DIV 3600").as("hr"),
          expr("CAST(floor(value * 100D + 0.5D) AS BIGINT)").as("cents"))
        .groupBy(col("event_type"), col("hr"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("v_cents"))
      val grid = hourly.groupBy(col("event_type"))
        .agg(min(col("hr")).as("mn"), max(col("hr")).as("mx"))
        .select(col("event_type"), explode(expr("sequence(mn, mx)")).as("hr"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(hourly, Seq("event_type", "hr"), "left")
        .withColumn("is_gap", col("n").isNull.cast("long"))
        // the first grid hour is an observed hour by construction (the
        // extent starts at real data), so the carry is never null
        .withColumn("carried_cents",
          last(col("v_cents"), ignoreNulls = true).over(w))
        .select(col("event_type"), col("hr"),
          coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("v_cents"), lit(0L)).as("v_cents"),
          col("is_gap"), col("carried_cents"))
        .orderBy(col("event_type"), col("hr"))
    }),

    // Frequent path mining: the top event-type trigrams users actually
    // walk (click>view>purchase, error>error>error, ...) — the
    // "what do sessions look like" complement to events_funnel, which
    // checks ONE fixed pattern; this surfaces the patterns worth fixing
    // a funnel around. Shape: one window keyed by user_id (highest
    // cardinality — maximal parallelism, two lead() slots of per-key
    // state), then a hash agg whose key space is bounded by
    // |event_type|³ (125 here), so the final agg is map-side-combined
    // to almost nothing regardless of log size. Top-10 with a total
    // order (n DESC, path) so the cut is deterministic.
    "events_top_paths" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("e2", lead(col("event_type"), 1).over(w))
        .withColumn("e3", lead(col("event_type"), 2).over(w))
        .filter(col("e3").isNotNull)
        .select(concat_ws(">", col("event_type"), col("e2"), col("e3"))
          .as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path"))
        .limit(10)
    }),

    // Snapshot reconciliation — the table-diff every CDC/backfill audit
    // runs: materialize the latest-state table AS OF the log's midpoint
    // and AS OF its end (the same latestStateOf kernel both times — diff
    // semantics inherit cdc_latest's tombstone rule), full-outer join on
    // the key, and classify: 'added' (absent → present), 'removed'
    // (present → tombstoned away; the event log only grows, so absence
    // at the later snapshot means the latest event became an error),
    // 'changed' (different last event). Unchanged rows are filtered —
    // a diff's output is the CHANGE set, which is what makes it cheap
    // to ship at 100 TB: two hash aggs on the highest-cardinality key,
    // one full-outer merge join of two skinny state tables, output
    // bounded by churn, not corpus. The cutoff derives from the data
    // extent (one broadcast scalar), integer epoch arithmetic only.
    "events_table_diff" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val cut = ev.agg(expr(
        "(min(unix_timestamp(ts)) + max(unix_timestamp(ts))) DIV 2").as("cut"))
      val before = latestStateOf(ev.crossJoin(broadcast(cut))
        .filter(expr("unix_timestamp(ts) < cut")).drop("cut"))
      val after = latestStateOf(ev)
      before.select(col("user_id"), col("last_ts").as("old_ts"),
          col("last_type").as("old_type"))
        .join(after.select(col("user_id"), col("last_ts").as("new_ts"),
          col("last_type").as("new_type")), Seq("user_id"), "full")
        .withColumn("change", expr(
          "CASE WHEN old_ts IS NULL THEN 'added' " +
            "WHEN new_ts IS NULL THEN 'removed' " +
            "WHEN new_ts <> old_ts OR new_type <> old_type THEN 'changed' " +
            "ELSE 'unchanged' END"))
        .filter(col("change") =!= "unchanged")
        .select(col("user_id"), col("change"), col("old_ts"), col("old_type"),
          col("new_ts"), col("new_type"))
        .orderBy(col("user_id"))
    }),

    // Robust outlier scoring — median/MAD, the heavy-tail-safe sibling of
    // events_anomaly's z-score (one fat-fingered 1e9 value shifts a mean
    // and stddev arbitrarily; it moves a median not at all): per
    // event_type, med = median(value), MAD = median(|value − med|), flag
    // rows with |value − med| > 3·MAD. Both medians are EXACT percentiles
    // rounded to 6 dp before any downstream arithmetic (the agg_stats
    // pairing: Spark `percentile` ≡ DuckDB `quantile_cont`; rounding makes
    // the flag boundary a comparison of identically-derived doubles on
    // both engines). Shape: two grouped-percentile passes over the log +
    // two broadcast joins of the 5-row stats table — the per-type medians
    // are the only non-map work. At 100 TB swap `percentile` for
    // `approx_percentile(…, 1e-4)` (same plan, bounded memory) — exact
    // per-group percentiles buffer each group, the one deliberate
    // small-cardinality-group assumption here.
    "events_mad_outliers" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"), col("event_id"), col("value"))
      val med = ev.groupBy(col("event_type"))
        .agg(round(expr("percentile(value, 0.5)"), 6).as("med"))
      val dev = ev.join(broadcast(med), "event_type")
        .withColumn("ad", abs(col("value") - col("med")))
      val mad = dev.groupBy(col("event_type"))
        .agg(round(expr("percentile(ad, 0.5)"), 6).as("mad"))
      dev.join(broadcast(mad), "event_type")
        .filter(col("mad") > 0 && col("ad") > col("mad") * 3)
        .select(col("event_type"), col("event_id"), col("value"),
          col("med"), col("mad"),
          expr("floor(ad / mad * 1000000D + 0.5D) / 1000000D").as("score"))
        .orderBy(col("event_type"), col("event_id"))
    }),

    // Pairwise Welch two-sample t-tests between event-type value
    // distributions — the A/B-experiment readout (unequal variances, so
    // Welch, not pooled Student): t = (m̄₁−m̄₂)/√(v₁/n₁+v₂/n₂) with the
    // Welch–Satterthwaite dof. The agg_corr_matrix discipline: ONE pass
    // collects exact integer sufficient statistics per group (n, Σcents,
    // Σcents² — order-independent BIGINT sums), then every derived
    // number comes from the IDENTICAL expression tree on both engines;
    // the pair fan-out is a broadcast self-join of the 5-row stats
    // table. At 100 TB the experiment key is (experiment, variant) —
    // the stats table stays tiny and the corpus is read once.
    "events_ab_welch" -> ((s, d) => {
      val stats = Tables.events(s, d)
        .select(col("event_type"),
          expr("CAST(floor(value * 100D + 0.5D) AS BIGINT)").as("c"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("c")).as("s1"),
          sum(col("c") * col("c")).as("s2"))
      val se2 = "(va / na + vb / nb)"
      stats.as("a").join(broadcast(stats.as("b")),
          col("a.event_type") < col("b.event_type"))
        .select(col("a.event_type").as("type_a"),
          col("b.event_type").as("type_b"),
          col("a.n").as("na"), col("b.n").as("nb"),
          expr("CAST(a.s1 AS DOUBLE) / a.n").as("ma"),
          expr("CAST(b.s1 AS DOUBLE) / b.n").as("mb"),
          expr("(a.s2 - CAST(a.s1 AS DOUBLE) * a.s1 / a.n) / (a.n - 1)").as("va"),
          expr("(b.s2 - CAST(b.s1 AS DOUBLE) * b.s1 / b.n) / (b.n - 1)").as("vb"))
        .select(col("type_a"), col("type_b"),
          col("na").as("n_a"), col("nb").as("n_b"),
          expr("floor((ma - mb) * 10000D + 0.5D) / 10000D").as("mean_diff_cents"),
          expr(s"floor((ma - mb) / sqrt($se2) * 1000000D + 0.5D) / 1000000D")
            .as("t_stat"),
          expr(s"floor($se2 * $se2 / " +
            "((va / na) * (va / na) / (na - 1) + (vb / nb) * (vb / nb) / (nb - 1)) " +
            "* 10000D + 0.5D) / 10000D").as("welch_dof"))
        .orderBy(col("type_a"), col("type_b"))
    }),

    // Slowly-changing-dimension (type 2) build from the event log — the
    // warehouse move that turns an append-only log into a temporal
    // dimension: collapse consecutive same-state events per user to
    // their CHANGE POINTS, then stamp each surviving row with its
    // validity interval [valid_from, valid_to) via lead(); the open
    // interval (valid_to NULL) is the current state. Two windows, both
    // keyed by user_id — the highest-cardinality key, so parallelism is
    // maximal and per-key state is one lag/lead slot; output is bounded
    // by state CHURN, not log volume (the same compression argument as
    // events_table_diff). Deterministic total order: change points tie
    // on (user, ts) only across DIFFERENT states, so (user_id,
    // valid_from, state) orders totally.
    "events_scd2" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val changes = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      changes
        .withColumn("valid_to", lead(col("ts"), 1).over(w))
        .select(col("user_id"), col("event_type").as("state"),
          col("ts").as("valid_from"), col("valid_to"),
          col("valid_to").isNull.as("is_current"))
        .orderBy(col("user_id"), col("valid_from"), col("state"))
    }),

    // Holt linear-trend smoothing over the per-type hourly series — the
    // forecasting step an observability pipeline runs on top of
    // events_gap_fill's regularized series: level/trend update with
    // α = β = ½, which makes every step PURE INTEGER arithmetic in
    // micro units (lvl' = (y + lvl + tr) DIV 2; both engines truncate
    // integer division toward zero) — no float accumulates across the
    // fold, so the 720-step recurrences land bit-identical cross-engine.
    // Sequential WITHIN a series, embarrassingly parallel ACROSS series
    // (the similarity_mmr argument): each series folds its collected
    // hour array in ONE aggregate() HOF pass — at 100 TB the series key
    // is (metric, entity) with millions of bounded-length partitions,
    // and the fold is O(len) per series with no cross-series barrier.
    // Emits the fitted terminal state and the 1/2/3-step-ahead forecasts
    // lvl + h·tr — all micro-unit BIGINTs the oracle replays exactly.
    "events_forecast_holt" -> ((s, d) => {
      val hourly = Tables.events(s, d)
        .select(col("event_type"), expr("unix_timestamp(ts) DIV 3600").as("hr"))
        .groupBy(col("event_type"), col("hr"))
        .agg(count(lit(1)).as("n"))
      hourly.groupBy(col("event_type"))
        .agg(expr("transform(array_sort(collect_list(struct(hr, n))), " +
          "s -> s.n * 1000000L)").as("ys"))
        .select(col("event_type"), size(col("ys")).cast("long").as("n_hours"),
          expr("aggregate(slice(ys, 2, size(ys) - 1), " +
            "array(ys[0], CAST(0 AS BIGINT)), " +
            "(acc, y) -> array((y + acc[0] + acc[1]) div 2, " +
            "((y + acc[0] + acc[1]) div 2 - acc[0] + acc[1]) div 2))").as("st"))
        .select(col("event_type"), col("n_hours"),
          col("st").getItem(0).as("level_micro"),
          col("st").getItem(1).as("trend_micro"),
          (col("st").getItem(0) + col("st").getItem(1)).as("fc1_micro"),
          (col("st").getItem(0) + col("st").getItem(1) * 2).as("fc2_micro"),
          (col("st").getItem(0) + col("st").getItem(1) * 3).as("fc3_micro"))
        .orderBy(col("event_type"))
    }),

    // Count-min-sketch heavy hitters — the third mergeable summary in
    // the sketch family (HLL distinct → agg_sketch_reaggregate, binned
    // quantiles → agg_quantile_partials, frequencies → here). d=4
    // independent LCG hash rows × w=512 buckets: the sketch is a fixed
    // d×w counter grid built by one hash agg over a 4× exploded key
    // stream — partial aggregation collapses every partition's
    // contribution to ≤ d·w rows, which IS the count-min merge property
    // (cell-wise sum), so 1000 executors each ship a 2 KB grid, never
    // rows. Estimates then come from a broadcast of the grid against
    // the candidate keys: est(k) = min over rows of cell(r, h_r(k)),
    // which can only OVER-estimate (collisions add, never subtract) —
    // the `over_ok` column carries that guarantee into the
    // oracle-checked output next to the exact counts. Deterministic
    // pure-mod hashes, so the DuckDB twin rebuilds the identical grid.
    "events_countmin_topk" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"))
      val sketch = countMinGrid(ev)
      val exact = ev.groupBy(col("user_id")).agg(count(lit(1)).as("exact_n"))
      val est = exact.select(col("user_id"), explode(array(cmBuckets: _*)).as("rb"))
        .select(col("user_id"), col("rb.r").as("r"), col("rb.b").as("b"))
        .join(broadcast(sketch), Seq("r", "b"))
        .groupBy(col("user_id")).agg(min(col("cnt")).as("est"))
      exact.join(est, "user_id")
        .select(col("user_id"), col("est"), col("exact_n"),
          (col("est") >= col("exact_n")).as("over_ok"))
        .orderBy(col("est").desc, col("user_id"))
        .limit(10)
    }),

    // k-anonymity audit — the privacy gate a released analytics extract
    // must pass: bucket every user's profile into a quasi-identifier
    // tuple (event-count decile band, first-seen hour-of-day quadrant,
    // lifetime-spend band) and report each QI group's population k. A
    // group with k < 5 re-identifies its members by the QI alone
    // (at_risk = 1): the release either generalizes those buckets wider
    // or suppresses the rows. Spend sums 1e-2-fixed INTEGER cents (the
    // cross-engine float discipline — summing doubles per user would hit
    // partition-order nondeterminism).
    //
    // Scale shape: two chained hash aggs — user profile (keyed by
    // user_id, map-side partial combine), then QI group (keyed by the
    // bucket triple). Both keys are high-cardinality-safe; nothing is
    // collected. The QI output is at most the product of the bucket
    // cardinalities — bounded and driver-safe.
    // Longest-activity-streak per user — the gaps-and-islands idiom (day
    // − row_number() is constant exactly within a consecutive-day run)
    // that engagement scoring ("7-day streak") is built on. Reported per
    // user: total active days, the longest streak, and its start day
    // (earliest on ties).
    //
    // Scale shape: one (user, day) distinct agg collapses the corpus;
    // everything after runs on user-partitioned ACTIVE-DAY partitions
    // (≤ calendar length each) — the island grouping, the per-user
    // max/total windows, and the tie-break agg.
    "events_streaks" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      Tables.events(s, d)
        .select(col("user_id"),
          expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000L")
            .as("day"))
        .distinct()
        .withColumn("grp", col("day") - row_number().over(w).cast("long"))
        .groupBy(col("user_id"), col("grp"))
        .agg(count(lit(1)).as("len"), min(col("day")).as("start"))
        .withColumn("n_active_days",
          sum(col("len")).over(Window.partitionBy(col("user_id"))))
        .withColumn("maxlen",
          max(col("len")).over(Window.partitionBy(col("user_id"))))
        .filter(col("len") === col("maxlen"))
        .groupBy(col("user_id"), col("n_active_days"), col("maxlen"))
        .agg(min(col("start")).as("streak_start"))
        .select(col("user_id"), col("n_active_days"),
          col("maxlen").as("longest_streak"), col("streak_start"))
        .orderBy(col("user_id"))
    }),

    // Linear multi-touch attribution — the marketing-analytics credit
    // model: every pre-purchase event (any type) in a user's journey
    // belongs to the NEXT purchase's conversion window; each window
    // splits one unit of credit equally across its touches. Per-touch
    // credits go to FIXED-POINT micro units (floor(share·1e6 + 0.5) as
    // BIGINT) before the corpus-wide aggregation, so the final sums are
    // exact integers — order-independent across partitions AND engines
    // (double summation order is neither); only the display column
    // divides back to a double.
    //
    // Scale shape: two user-bounded window passes (running purchase
    // count; per-user totals), a (user, conv, type) hash agg, a
    // conversion-bounded window for the window size, and a 4-ary final
    // agg. No joins at corpus width.
    "events_attribution" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr("unix_micros(CAST(ts AS TIMESTAMP))").as("us"))
        .withColumn("is_p",
          when(col("event_type") === "purchase", 1L).otherwise(0L))
        .withColumn("p_at",
          sum(col("is_p")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("tot_p",
          sum(col("is_p")).over(Window.partitionBy(col("user_id"))))
        .filter(col("is_p") === 0L && col("p_at") < col("tot_p"))
        .groupBy(col("user_id"), (col("p_at") + 1L).as("conv"),
          col("event_type"))
        .agg(count(lit(1)).as("n_e"))
        .withColumn("n_g", sum(col("n_e"))
          .over(Window.partitionBy(col("user_id"), col("conv"))))
        .withColumn("credit_micro", expr(
          "CAST(floor(n_e / CAST(n_g AS DOUBLE) * 1000000D + 0.5D) AS BIGINT)"))
        .groupBy(col("event_type"))
        .agg(sum(col("n_e")).as("n_touches"),
          count(lit(1)).as("n_windows"),
          sum(col("credit_micro")).as("cm"))
        .select(col("event_type"), col("n_touches"), col("n_windows"),
          expr("cm / 1000000.0D").as("credit"))
        .orderBy(col("event_type"))
    }),

    // Behavioral diversity — Shannon entropy of each user's event-type
    // mix (H = ln n − Σ c·ln c / n), summarized per activity tier (the
    // decimal digit count of n, so tiers are exact cross-engine). Every
    // ln term micro-rounds to a BIGINT BEFORE any corpus-wide sum, so
    // all aggregation is exact-integer and order-independent; doubles
    // appear only in the per-user H derivation and the display divides —
    // identical expression trees on both engines. (s_micro → double is
    // lossless to ~2^53, i.e. to ~1e9-event users; past that, widen the
    // per-user sum to DECIMAL(38,0) like agg_corr_matrix.)
    //
    // Scale shape: one (user, type) hash agg collapses the corpus, one
    // per-user agg over |types|-bounded rows, one ≤19-row tier agg. No
    // windows, no joins.
    "events_entropy" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("c"))
        .withColumn("lnc_micro",
          expr("CAST(floor(ln(c) * 1000000D + 0.5D) AS BIGINT)"))
        .groupBy(col("user_id"))
        .agg(sum(col("c")).as("n"),
          sum(expr("c * lnc_micro")).as("s_micro"),
          count(lit(1)).as("n_types"))
        .withColumn("h_micro", expr(
          "CAST(floor(CAST(floor(ln(n) * 1000000D + 0.5D) AS BIGINT) " +
            "- s_micro / CAST(n AS DOUBLE) + 0.5D) AS BIGINT)"))
        .withColumn("tier", length(col("n").cast("string")).cast("long"))
        .groupBy(col("tier"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("h_micro")).as("sh"),
          min(col("h_micro")).as("mn"),
          max(col("h_micro")).as("mx"),
          sum(col("n_types")).as("st"))
        .select(col("tier"), col("n_users"),
          expr("floor(sh / CAST(n_users AS DOUBLE) + 0.5D) / 1000000D")
            .as("avg_entropy"),
          expr("mn / 1000000.0D").as("min_entropy"),
          expr("mx / 1000000.0D").as("max_entropy"),
          expr("floor(st / CAST(n_users AS DOUBLE) * 1000D + 0.5D) / 1000D")
            .as("avg_types"))
        .orderBy(col("tier"))),

    // Offline CUSUM change-point detection on the per-type daily count
    // series — the monitoring family's level-shift audit (anomaly/MAD
    // flag points, PSI flags distribution drift, CUSUM locates WHERE the
    // level changed): S_i = Σ_{j≤i}(x_j − x̄) peaks at the shift point.
    // Everything stays in exact integers by scaling away the mean's
    // division: D·S_i = D·prefix_i − i·total (BIGINT throughout — the
    // telescoping identity D·S_D = 0 is the golden law), |·| argmax with
    // a min-day tie-break, and only the REPORTED magnitude |S|/D goes
    // through a rounded double.
    //
    // Scale shape: one (type, day) hash agg collapses the corpus; the
    // prefix window runs per type over SERIES-length partitions (days,
    // not events); the argmax is a broadcast max-join. At 100 TB the
    // window input is |types|×|days| rows — model-sized.
    "events_changepoint" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"),
          expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000L")
            .as("day"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val tot = daily.groupBy(col("event_type"))
        .agg(sum(col("n")).as("total"), count(lit(1)).as("n_days"))
      daily
        .withColumn("i", row_number().over(w).cast("long"))
        .withColumn("pre",
          sum(col("n")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .join(broadcast(tot), "event_type")
        .withColumn("a", abs(expr("n_days * pre - i * total")))
        .withColumn("amax",
          max(col("a")).over(Window.partitionBy(col("event_type"))))
        .filter(col("a") === col("amax"))
        .groupBy(col("event_type"), col("n_days"), col("amax"))
        .agg(min(col("day")).as("cp_day"))
        .select(col("event_type"), col("n_days"), col("cp_day"),
          expr("floor(amax / CAST(n_days AS DOUBLE) * 1000000D + 0.5D) " +
            "/ 1000000D").as("magnitude"))
        .orderBy(col("event_type"))
    }),

    // First-order Markov transition matrix over user event journeys —
    // in-engine model training #4: P(next event type | current) from
    // per-user adjacent pairs, the model a next-action predictor or
    // journey-anomaly scorer serves directly (events_top_paths mines the
    // top raw 3-paths; this trains the full normalized one-step chain).
    //
    // Scale shape: one bounded per-user window pass (event-log
    // cardinality, deterministic (ts, event_id) order), one hash agg
    // down to the |S|² transition matrix, and row-normalization as a
    // window over the MATRIX (|S| partitions of ≤ |S| rows — model-sized,
    // not corpus-sized). The model table is broadcastable by construction.
    "events_markov_transitions" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr("unix_micros(CAST(ts AS TIMESTAMP))").as("us"))
        .withColumn("dst", lead(col("event_type"), 1).over(w))
        .filter(col("dst").isNotNull)
        .groupBy(col("event_type").as("src"), col("dst"))
        .agg(count(lit(1)).as("n"))
        .withColumn("p", expr("floor(n / CAST(sum(n) OVER " +
          "(PARTITION BY src) AS DOUBLE) * 1000000D + 0.5D) / 1000000D"))
        .orderBy(col("src"), col("dst"))
    }),

    // Distribution-drift audit — the Population Stability Index every
    // monitored feature pipeline computes between a reference window and
    // the current one: PSI = Σ_bins (p−q)·ln(p/q) over a fixed 10-bin
    // histogram of `value`, per event_type, splitting the log at its
    // calendar midpoint (integer day arithmetic — no float boundary).
    // Laplace (+1) smoothing replaces the ad-hoc ε-floor for empty bins,
    // keeping every term finite AND cross-engine exact: each p and q is
    // one integer-ratio expression, so both engines feed ln identical
    // doubles (the idf/PMI rounding discipline; psi rounds to 1e-6 and
    // the drift verdict reads the ROUNDED value, psi > 0.2 — the
    // industry rule-of-thumb threshold).
    //
    // Scale shape: one broadcast 4-number extent row, one (type, half,
    // bin)-keyed count (map-side combinable), a 10-wide grid explode per
    // type, and a 10-row-per-type sum. Nothing rescans raw volume.
    "events_psi_drift" -> ((s, d) => {
      val binned = psiBinned(s, d)
      psiFromCounts(binned.groupBy(col("event_type"), col("bin")).agg(
        sum(when(col("per") === 0L, 1L).otherwise(0L)).as("c_ref"),
        sum(when(col("per") === 1L, 1L).otherwise(0L)).as("c_cur")))
    }),

    "events_k_anonymity" -> ((s, d) =>
      qiBuckets(s, d)
        .withColumn("at_risk", (col("k") < 5).cast("long"))
        .orderBy(col("n_bucket"), col("hour_bucket"), col("spend_bucket"))),

    // Differentially-private histogram release over the SAME
    // quasi-identifier buckets events_k_anonymity audits — the other
    // standard privacy mechanism: instead of suppressing small groups,
    // perturb every count with Laplace(1/ε) noise (ε = 1, sensitivity 1
    // for a disjoint-bucket histogram) and clamp at zero. The noise here
    // is SEEDED from the bucket key (the curation_sample_weighted LCG →
    // uniform → inverse-CDF ln transform), which is the reproducible
    // replay/audit mode — a production release draws fresh randomness;
    // the engine-side shape (per-bucket noise, integer rounding, the
    // post-processing clamp that DP composition permits) is what this
    // row builds and cross-checks. The true k is emitted alongside for
    // the audit view; the releasable projection drops it.
    //
    // Scale shape: inherits the two chained hash aggs; the noise step is
    // map-only arithmetic on the bucket table.
    "events_dp_release" -> ((s, d) =>
      qiBuckets(s, d)
        .withColumn("u", expr(
          "(((n_bucket * 100003L + hour_bucket * 1009L + spend_bucket) " +
            "* 2654435761L + 1013904223L) % 4294967296L + 1L) " +
            "/ 4294967297.0D"))
        .withColumn("noise",
          expr("-sign(u - 0.5D) * ln(1D - 2D * abs(u - 0.5D))"))
        .select(col("n_bucket"), col("hour_bucket"), col("spend_bucket"),
          col("k"),
          expr("greatest(CAST(floor(k + noise + 0.5D) AS BIGINT), 0L)")
            .as("released"))
        .orderBy(col("n_bucket"), col("hour_bucket"), col("spend_bucket"))),

    // Bot/automation detection by inter-event timing regularity: humans
    // arrive roughly Poisson (gap coefficient-of-variation ≈ 1, and the
    // fixture's users measure 0.77–1.28), schedulers and replay scripts
    // tick (cv → 0). Per user: microsecond gaps from a user-partitioned
    // lag window (deterministic (ts, event_id) order — ts alone can tie),
    // then cv = sd/mean from exact integer sufficient statistics
    // (DECIMAL(38,0) Σg² — g² overflows BIGINT at day-scale micro gaps).
    // Flag cv < 0.85 with n ≥ 50: below the fixture's observed floor, so
    // the synthetic all-human corpus flags nothing — the audit's correct
    // answer here — while the threshold arithmetic stays oracle-checked.
    //
    // Scale shape: one bounded-partition window (per-user, event-log
    // cardinality), one user-keyed hash agg of four numbers. The derived
    // doubles come from identical expression trees over exact integers.
    "events_bot_detection" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          expr("unix_micros(CAST(ts AS TIMESTAMP))").as("us"))
        .withColumn("gap", col("us") - lag(col("us"), 1).over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("us"), col("event_id"))))
        .filter(col("gap").isNotNull)
        .select(col("user_id"),
          expr("CAST(gap AS DECIMAL(18,0))").as("g"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_gaps"),
          sum(col("g")).as("sg"), sum(col("g") * col("g")).as("sg2"))
        .select(col("user_id"), col("n_gaps"),
          expr("CAST(floor(CAST(sg AS DOUBLE) / n_gaps + 0.5D) AS BIGINT)")
            .as("mean_gap_us"),
          expr("floor(sqrt(greatest(n_gaps * CAST(sg2 AS DOUBLE) - " +
            "CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE), 0D)) / " +
            "CAST(sg AS DOUBLE) * 1000000D + 0.5D) / 1000000D").as("cv"))
        .withColumn("is_bot",
          (col("cv") < 0.85 && col("n_gaps") >= 50L).cast("long"))
        .orderBy(col("user_id"))),

    // SLO error-budget burn monitor — the multiwindow burn-rate alert
    // (SRE workbook form) over the event log: per hour, the error share
    // against a 25% SLO, and the trailing 1 h / 6 h burn rates whose
    // JOINT breach pages (the short window proves it's current, the long
    // window proves it's material). The trailing-6 h sums come from a
    // 6-way offset equi-join on the HOURS-sized series (the autocorr
    // lag-join shape — bounded ×6 fan-out, no global-ORDER-BY window);
    // every sum is an exact integer, and rates/burns divide per-row.
    "events_error_rate_slo" -> ((s, d) =>
      sloFromGrid(sloGrid(sloTicks(Tables.events(s, d))))),

    // Velocity rule — the streaming-fraud primitive evaluated in batch:
    // flag every event whose user produced ≥ 3 events inside the
    // trailing hour (RANGE frame on epoch-µs, so the window is
    // event-TIME bounded, not row-count bounded — the semantics a rate
    // limiter actually wants). Counts are integers; ties at the same
    // microsecond land in the same frame regardless of intra-tie order,
    // so the flag set is deterministic. Per-user partitions keep the
    // sort bounded by a user's own history at any scale.
    "events_velocity_flags" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
        .rangeBetween(-3600000000L, 0L)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          expr("unix_micros(CAST(ts AS TIMESTAMP))").as("us"))
        .withColumn("n_trailing_1h", count(lit(1)).over(w))
        .filter(col("n_trailing_1h") >= 3)
        .select(col("user_id"), col("event_id"), col("us"),
          col("n_trailing_1h"))
        .orderBy(col("user_id"), col("us"), col("event_id"))
    }),

    // A/B power analysis — the sample-size planner run BEFORE an
    // experiment (the third member of the experimentation family next to
    // events_ab_welch and events_ab_srm): per event type, the users
    // required PER ARM to detect a 5% lift in mean value at α = .05 /
    // power = .80 — n = ceil(2·(z_α/2 + z_β)²·σ²/Δ²) with the standard
    // 15.68 constant — plus whether the type's current population is
    // already powered. Variance comes from the exact integer sufficient
    // statistics (n, Σc, Σc² in cents — the Welch discipline), so the
    // doubles feeding ceil are the same expression tree on both engines
    // and the integer n_required cannot drift cross-engine.
    "events_power_analysis" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          expr("CAST(floor(value * 100D + 0.5D) AS BIGINT)").as("c"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("c")).as("s1"),
          sum(col("c") * col("c")).as("s2"))
        .filter(col("n") > 1 && col("s1") > 0)
        .withColumn("vr",
          expr("(s2 - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)"))
        .withColumn("mde", expr("0.05D * (CAST(s1 AS DOUBLE) / n)"))
        // greatest(1, …): a zero-variance group ceils to 0 — clamp to
        // the 1-user floor so n_required is always a real sample size
        // (and the PropertySpec n_req >= 1 law holds on ANY fixture)
        .withColumn("n_req",
          expr("CAST(greatest(1L, ceil(15.68D * vr / (mde * mde))) AS BIGINT)"))
        .select(col("event_type"), col("n"),
          expr("floor(CAST(s1 AS DOUBLE) / n * 10000D + 0.5D) / 10000D")
            .as("mean_cents"),
          col("n_req").as("n_required_per_arm"),
          expr("CAST(CASE WHEN n >= 2L * n_req THEN 1 ELSE 0 END AS BIGINT)")
            .as("powered_now"))
        .orderBy(col("event_type"))),

    // Sample-ratio-mismatch audit — the assignment-integrity check run
    // BEFORE reading any A/B result (a skewed split invalidates
    // events_ab_welch's comparison): users are deterministically hashed
    // into two arms (LCG parity — replayable on any engine, unlike
    // rand()), and a 1-df chi-square against the expected 50/50 split
    // flags broken assignment. With equal expected counts the statistic
    // collapses to (n_a − n_b)² / (n_a + n_b) — exact integers until the
    // final division, so the 3.841 (p < .05) boundary cannot flip
    // cross-engine. Shape: DISTINCT (type, user) then a types-sized agg.
    "events_ab_srm" -> ((s, d) =>
      srmFromGrid(srmGrid(
        Tables.events(s, d).select(col("event_type"), col("user_id"))
          .distinct()))),

    // Kaplan–Meier churn-survival curve over user activity spans — the
    // censoring-aware form of retention. Per user: first/last active day;
    // span t = last − first (days) is an OBSERVED churn if the user went
    // quiet before the log's final day, CENSORED (still active at
    // end-of-log) otherwise. At each churn time t: n_risk = users whose
    // observed span ≥ t, n_churned = churns exactly at t, and
    // S(t) = Π_{t'≤t} (1 − d/n).
    //
    // Cross-engine float discipline: every factor is derived per-row from
    // exact integer counts; the cumulative product runs as exp(Σ ln(·))
    // with a windowed MAX flag short-circuiting S = 0 when a factor hits
    // zero — Spark's ln(0) is NULL while DuckDB's is -inf, so the CASE
    // keeps both engines off that divergent edge entirely.
    //
    // Scale: the raw log reduces FIRST to one row per user (hash agg on
    // the highest-cardinality key), then to one row per distinct span
    // value — bounded by the log's length in DAYS. The risk-set suffix
    // sum and the cumulative product both run as BROADCAST theta-joins
    // over that days-sized table (never a global-ORDER-BY window — the
    // suite-wide single-task guard): O(days²) work on a bounded frame
    // beats a serialized window at any scale.
    "events_survival_km" -> ((s, d) => {
      val spans = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .groupBy(col("user_id"))
        .agg(min(col("day")).as("f"), max(col("day")).as("l"))
      val horizon = spans.agg(max(col("l")).as("m"))
      val byT = spans.crossJoin(broadcast(horizon))
        .select(datediff(col("l"), col("f")).cast("long").as("t"),
          (col("l") < col("m")).cast("long").as("churned"))
        .groupBy(col("t"))
        .agg(count(lit(1)).as("ended"), sum(col("churned")).as("d_t"))
      val risk = byT.as("x")
        .join(broadcast(byT.select(col("t").as("yt"), col("ended").as("ye"))),
          col("yt") >= col("x.t"))
        .groupBy(col("x.t").as("t"), col("x.d_t").as("d_t"))
        .agg(sum(col("ye")).as("n_risk"))
        .filter(col("d_t") > 0)
        .withColumn("factor",
          lit(1.0) - col("d_t").cast("double") / col("n_risk"))
      risk.as("a")
        .join(broadcast(risk.select(col("t").as("bt"),
          col("factor").as("bf"))), col("bt") <= col("a.t"))
        .groupBy(col("a.t").as("t"), col("a.n_risk").as("n_risk"),
          col("a.d_t").as("n_churned"))
        .agg(max((col("bf") === 0.0).cast("long")).as("zero"),
          sum(when(col("bf") > 0.0, log(col("bf"))).otherwise(lit(0.0)))
            .as("lnsum"))
        .select(col("t"), col("n_risk"), col("n_churned"),
          expr("floor((CASE WHEN zero = 1 THEN 0D ELSE exp(lnsum) END) " +
            "* 1000000D + 0.5D) / 1000000D").as("survival"))
        .orderBy(col("t"))
    }),

    // Week-hour seasonal profile: event volume by (day-of-week × hour)
    // cell per event type, with a seasonal index normalizing each cell's
    // share against a flat 1/168 week (idx 1.0 = exactly average load,
    // 2.0 = double). dow is 0=Sunday…6 on BOTH engines (Spark's
    // dayofweek is 1-based → −1). One integer-count hash agg plus a
    // types-sized broadcast of totals; the only double is the final
    // per-row index division.
    "events_seasonal_profile" -> ((s, d) =>
      seasonalFromCells(seasonalCells(seasonalTicks(Tables.events(s, d))))),

    // Gini concentration of activity per event type — how unequally a
    // type's volume is spread across users (0 = uniform, →1 = one user).
    // Computed from the VALUE HISTOGRAM, not a per-user ranking: users
    // collapse to (activity count v → m_v users), and the rank-weighted
    // sum Σ i·x_i of the classic formula folds per v-run into
    // v·(m·C + m(m+1)/2) with C = users below v — every term an exact
    // integer, and the only window runs over DISTINCT ACTIVITY VALUES
    // (bounded by the max per-user count, not user cardinality), which
    // is what keeps this runnable at 1e9 users where a row_number over
    // users per type would be a single-task sort.
    "events_gini" -> ((s, d) => {
      val hist = Tables.events(s, d)
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("v"))
        .groupBy(col("event_type"), col("v"))
        .agg(count(lit(1)).as("m"))
      val wBelow = Window.partitionBy(col("event_type")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, -1)
      hist
        .withColumn("cum", coalesce(sum(col("m")).over(wBelow), lit(0L)))
        .withColumn("six", // m(m+1) is even → DIV 2 exact; stays LongType
          expr("v * (m * cum + m * (m + 1) DIV 2)"))
        .groupBy(col("event_type"))
        .agg(sum(col("m")).as("n_users"), sum(col("v") * col("m")).as("sx"),
          sum(col("six")).as("sixs"))
        .select(col("event_type"), col("n_users"),
          expr("floor((2D * sixs / (CAST(n_users AS DOUBLE) * sx) - " +
            "(n_users + 1D) / n_users) * 1000000D + 0.5D) / 1000000D")
            .as("gini"))
        .orderBy(col("event_type"))
    }),

    // Lag-k autocorrelation (k = 1, 2, 3) of the daily volume series per
    // event type — the seasonality/momentum diagnostic run before any
    // forecast (the Holt query's natural companion). Days are joined at
    // offset k via an equi-join on epoch-day (missing days simply yield
    // no pair — no imputation), and Pearson r comes from the six exact
    // integer sums (n, Σx, Σy, Σxy, Σx², Σy²) per (type, lag), cast to
    // double only inside the one shared closed-form expression — the
    // corr_matrix discipline. Scale: the series table is days×types
    // sized; the triple-lag explode is a ×3 on that tiny table, and the
    // join keys on (type, day) so skew is bounded by calendar length.
    "events_autocorr" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .select(col("event_type"),
          datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
            .cast("long").as("off"))
        .groupBy(col("event_type"), col("off"))
        .agg(count(lit(1)).as("n"))
      // Both sides derive from the same `daily` plan — alias them so the
      // equi-join predicate binds by name, not by dataset-id
      // disambiguation (the analyzer's trivially-true-equals warning).
      val withLag = daily.as("a")
        .withColumn("lag", explode(array(lit(1L), lit(2L), lit(3L))))
        .select(col("a.event_type").as("et"), col("off"), col("lag"),
          col("n").as("x"))
      val prev = daily.as("b")
        .select(col("b.event_type").as("pet"), col("off").as("poff"),
          col("n").as("y"))
      withLag.join(prev,
          col("et") === col("pet") &&
            col("poff") === col("off") - col("lag"))
        .select(col("et").as("event_type"), col("lag"), col("x"), col("y"))
        .groupBy(col("event_type"), col("lag"))
        .agg(count(lit(1)).as("n_pairs"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sx2"),
          sum(col("y") * col("y")).as("sy2"))
        .filter(col("n_pairs") >= 3 &&
          expr("n_pairs * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * sx") > 0 &&
          expr("n_pairs * CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE) * sy") > 0)
        .select(col("event_type"), col("lag"), col("n_pairs"),
          expr("floor((n_pairs * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy) / " +
            "sqrt((n_pairs * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * sx) * " +
            "(n_pairs * CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE) * sy)) " +
            "* 1000000D + 0.5D) / 1000000D").as("autocorr"))
        .orderBy(col("event_type"), col("lag"))
    })
  )

  /** The quasi-identifier bucket table (n_bucket, hour_bucket,
    * spend_bucket, k): user profiles coarsened into QI tuples, one count
    * per tuple — shared by the k-anonymity audit and the DP release. */
  private def qiBuckets(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        expr("(unix_timestamp(min(ts)) DIV 3600) % 24").as("first_hour"),
        sum(expr("CAST(floor(value * 100D + 0.5D) AS BIGINT)")).as("cents"))
      .groupBy(
        expr("n_events DIV 10").as("n_bucket"),
        expr("first_hour DIV 6").as("hour_bucket"),
        expr("cents DIV 50000").as("spend_bucket"))
      .agg(count(lit(1)).as("k"))

  /** (event_type, per, bin): every event placed in its calendar half
    * (integer-day midpoint split) and its extent-normalized 10-wide value
    * bin — events_psi_drift's binning stage, shared with the T18 live
    * drift monitor so stream ≡ batch holds by shared expression. */
  private[graft] def psiBinned(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("event_type"),
      expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000L").as("day"),
      col("value"))
    val ext = ev.agg(min(col("day")).as("dlo"), max(col("day")).as("dhi"),
      min(col("value")).as("vlo"), max(col("value")).as("vhi"))
    ev.crossJoin(broadcast(ext))
      .select(col("event_type"),
        when(col("day") < expr("(dlo + dhi + 1L) DIV 2L"), lit(0L))
          .otherwise(lit(1L)).as("per"),
        expr("least(CAST(floor((value - vlo) * 10D / " +
          "greatest(vhi - vlo, 1e-12D)) AS BIGINT), 9L)").as("bin"))
  }

  /** PSI from a per-(event_type, bin) count table (c_ref, c_cur; bins
    * with zero counts on both sides may be absent — the full 10-bin grid
    * is re-expanded here). Totals are recovered by summation, so ANY
    * route to the counts — the batch two-half split or a streaming
    * complete-mode agg joined to a static reference — yields the
    * IDENTICAL psi expression tree; T18 pins that equality. */
  private[graft] def psiFromCounts(rc: DataFrame): DataFrame = {
    val grid = rc.groupBy(col("event_type")).agg(
        sum(col("c_ref")).as("n_ref"), sum(col("c_cur")).as("n_cur"))
      .select(col("event_type"), col("n_ref"), col("n_cur"),
        explode(expr("sequence(0L, 9L)")).as("bin"))
    val term =
      "((c_ref + 1L) / CAST(n_ref + 10L AS DOUBLE) - " +
        "(c_cur + 1L) / CAST(n_cur + 10L AS DOUBLE)) * " +
        "ln(((c_ref + 1L) / CAST(n_ref + 10L AS DOUBLE)) / " +
        "((c_cur + 1L) / CAST(n_cur + 10L AS DOUBLE)))"
    grid.join(rc.select(col("event_type"), col("bin"), col("c_ref"),
        col("c_cur")), Seq("event_type", "bin"), "left")
      .na.fill(0L, Seq("c_ref", "c_cur"))
      .groupBy(col("event_type"), col("n_ref"), col("n_cur"))
      .agg(sum(expr(term)).as("s"))
      .select(col("event_type"), col("n_ref"), col("n_cur"),
        expr("floor(s * 1000000D + 0.5D) / 1000000D").as("psi"))
      .withColumn("drift", (col("psi") > 0.2).cast("long"))
      .orderBy(col("event_type"))
  }

  /** Count-min geometry: 4 hash rows × 512 buckets, LCG (mult, add)
    * pairs per row — pure mod-2³¹ arithmetic both engines replay. */
  private[graft] val cmW = 512
  private[graft] val cmSeeds: Seq[(Long, Long)] = Seq(
    (2654435761L, 1013904223L), (1103515245L, 12345L),
    (214013L, 2531011L), (69069L, 362437L))

  /** The d per-row (row, bucket) coordinates of a `user_id` key. */
  private[graft] def cmBuckets: Seq[org.apache.spark.sql.Column] =
    cmSeeds.zipWithIndex.map { case ((a, c), r) =>
      struct(lit(r.toLong).as("r"),
        expr(s"((user_id * ${a}L + ${c}L) % 2147483648L) % ${cmW}L").as("b"))
    }

  /** The count-min grid itself — factored so the streaming twin
    * (`Streams.countMinSketch`, a complete-mode stateful agg over the
    * SAME expressions) is stream ≡ batch by construction: maintaining
    * the grid incrementally over micro-batches IS the sketch's
    * cell-wise-sum merge, applied per trigger. */
  private[graft] def countMinGrid(ev: DataFrame): DataFrame =
    ev.select(explode(array(cmBuckets: _*)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("cnt"))

  /** The SLO-burn transforms, factored so the streaming twin
    * (`Streams.sloGrid`) is stream ≡ batch BY CONSTRUCTION: `sloTicks`
    * projects each event to its (hour, is-error) tick, `sloGrid` is the
    * additive hourly count grid a complete-mode agg maintains live
    * (state = hours seen — calendar-bounded), and `sloFromGrid` derives
    * the trailing-6 h burn rates and the joint-breach page flag via the
    * 6-way offset join with the identical expression tree on either
    * half. */
  private[graft] def sloTicks(ev: DataFrame): DataFrame =
    ev.select(expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 3600000000L")
      .as("hr"), (col("event_type") === "error").cast("long").as("e"))

  private[graft] def sloGrid(ticks: DataFrame): DataFrame =
    ticks.groupBy(col("hr"))
      .agg(count(lit(1)).as("n_total"), sum(col("e")).as("n_err"))

  private[graft] def sloFromGrid(hourly: DataFrame): DataFrame = {
    val w6 = hourly
      .withColumn("off", explode(array((0 to 5).map(lit(_)): _*)))
      .select((col("hr") + col("off")).as("hr"),
        col("n_total").as("t6"), col("n_err").as("e6"))
      .groupBy(col("hr"))
      .agg(sum(col("t6")).as("tot6"), sum(col("e6")).as("err6"))
    hourly.join(w6, Seq("hr")) // inner: every hr has its own offset-0 row
      .select(col("hr"), col("n_total"), col("n_err"),
        expr("floor(n_err / CAST(n_total AS DOUBLE) * 1000000D + 0.5D) " +
          "/ 1000000D").as("rate_1h"),
        expr("floor(err6 / CAST(tot6 AS DOUBLE) * 1000000D + 0.5D) " +
          "/ 1000000D").as("rate_6h"),
        expr("CAST(CASE WHEN n_err * 4L > n_total AND err6 * 4L > tot6 " +
          "THEN 1 ELSE 0 END AS BIGINT)").as("page"))
      .orderBy(col("hr"))
  }

  /** The SRM transforms, factored so the streaming twin
    * (`Streams.srmGrid`) is stream ≡ batch BY CONSTRUCTION: `srmGrid`
    * assigns each distinct (type, user) tick its deterministic LCG arm
    * and maintains the additive (type, arm) count grid — ≤ |types|×2
    * rows of complete-mode state live; `srmFromGrid` derives n_a/n_b
    * and the collapsed 1-df chi-square from the grid with the identical
    * expression tree on either half. Input contract: ticks are already
    * DISTINCT (type, user) — batch dedups inline; a stream dedups
    * upstream (dropDuplicates within its watermark, the T5 discipline). */
  private[graft] def srmGrid(tu: DataFrame): DataFrame =
    // reduce user_id mod 2³¹ BEFORE the multiply: the raw product
    // overflows BIGINT for user_id ≳ 8.4e9 — Spark would wrap silently
    // (arm −1, user vanishing from both arms) while DuckDB raises, a
    // cross-engine divergence at the 1e9+-user posture. The reduction
    // is a congruence no-op for the LCG (mod-2³¹ arithmetic) and keeps
    // every intermediate < 2³¹·1103515245 ≈ 2.4e18 < 2⁶³.
    tu.withColumn("arm",
        expr("(((user_id % 2147483648L) * 1103515245L + 12345L) " +
          "% 2147483648L) % 2L"))
      .groupBy(col("event_type"), col("arm"))
      .agg(count(lit(1)).as("n"))

  private[graft] def srmFromGrid(grid: DataFrame): DataFrame =
    grid.groupBy(col("event_type"))
      .agg(sum(when(col("arm") === 0L, col("n")).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 1L, col("n")).otherwise(0L)).as("n_b"))
      .select(col("event_type"), col("n_a"), col("n_b"),
        expr("floor((n_a - n_b) * (n_a - n_b) / " +
          "CAST(n_a + n_b AS DOUBLE) * 1000000D + 0.5D) / 1000000D")
          .as("srm_chi2"),
        expr("CAST(CASE WHEN (n_a - n_b) * (n_a - n_b) / " +
          "CAST(n_a + n_b AS DOUBLE) > 3.841459D THEN 1 ELSE 0 END " +
          "AS BIGINT)").as("srm_flag"))
      .orderBy(col("event_type"))

  /** The seasonal-profile transforms, factored in three stages so the
    * streaming twin (`Streams.seasonalCells`) is stream ≡ batch BY
    * CONSTRUCTION (the countMinGrid discipline): `seasonalTicks` is the
    * shared (type, dow 0=Sunday, hr) projection, `seasonalCells` the
    * additive count grid a complete-mode agg maintains live (state ≤
    * |types|×168 rows regardless of volume), and `seasonalFromCells` the
    * read-off that derives the ×168 flat-week index from the grid with
    * the identical expression tree on either half. */
  private[graft] def seasonalTicks(ev: DataFrame): DataFrame =
    ev.select(col("event_type"),
      (dayofweek(col("ts")) - 1).cast("long").as("dow"),
      hour(col("ts")).cast("long").as("hr"))

  private[graft] def seasonalCells(ticks: DataFrame): DataFrame =
    ticks.groupBy(col("event_type"), col("dow"), col("hr"))
      .agg(count(lit(1)).as("n"))

  private[graft] def seasonalFromCells(cells: DataFrame): DataFrame = {
    val tot = cells.groupBy(col("event_type")).agg(sum(col("n")).as("total"))
    cells.join(broadcast(tot), "event_type")
      .select(col("event_type"), col("dow"), col("hr"), col("n"),
        expr("floor(n * 168D / total * 1000000D + 0.5D) / 1000000D")
          .as("seasonal_idx"))
      .orderBy(col("event_type"), col("dow"), col("hr"))
  }

  /** The latest-state transform, factored out so the streaming twin
    * (`Streams.latestState`, a complete-mode stateful agg over the same
    * expressions) is stream ≡ batch BY CONSTRUCTION — the tokensOf
    * discipline from the near-dup family. */
  private[graft] def latestStateOf(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"))
      .agg(max(struct(col("ts"), col("event_id"), col("event_type"),
        col("value"))).as("last"))
      .filter(col("last.event_type") =!= "error")
      .select(col("user_id"), col("last.ts").as("last_ts"),
        col("last.event_type").as("last_type"),
        col("last.value").as("last_value"))

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
        "GROUP BY cohort, day_offset ORDER BY cohort_day, day_offset"),

    "events_anomaly" ->
      ("WITH hourly AS (SELECT event_type, " +
        "CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hr, count(*) AS n " +
        "FROM events GROUP BY 1, 2), " +
        "w AS (SELECT event_type, hr, n, " +
        "count(n) OVER win AS cnt, sum(n) OVER win AS s1, " +
        "sum(n * n) OVER win AS s2 FROM hourly WINDOW win AS " +
        "(PARTITION BY event_type ORDER BY hr " +
        "RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)), " +
        "v AS (SELECT event_type, hr, n, cnt, " +
        "CAST(s1 AS DOUBLE) / cnt AS mean, " +
        "(s2 - CAST(s1 AS DOUBLE) * s1 / cnt) / (cnt - 1) AS vr " +
        "FROM w WHERE cnt >= 12) " +
        "SELECT event_type, hr, n, " +
        "floor(mean * 1000000 + 0.5) / 1000000 AS mean_24h, " +
        "floor((n - mean) / sqrt(vr) * 1000000 + 0.5) / 1000000 AS z_score " +
        "FROM v WHERE vr > 0 AND abs((n - mean) / sqrt(vr)) > 2 " +
        "ORDER BY event_type, hr"),

    "events_cdc_latest" ->
      ("SELECT user_id, last_ts, last_type, last_value FROM (" +
        "SELECT user_id, ts AS last_ts, event_type AS last_type, " +
        "value AS last_value, row_number() OVER (PARTITION BY user_id " +
        "ORDER BY ts DESC, event_id DESC) AS rk FROM events) " +
        "WHERE rk = 1 AND last_type <> 'error' ORDER BY user_id"),

    "events_wau" ->
      ("WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day " +
        "FROM events), " +
        "days AS (SELECT DISTINCT day FROM ud), " +
        "dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM ud " +
        "GROUP BY day), " +
        "w AS (SELECT user_id, day + CAST(u.i AS INT) AS wday FROM ud, " +
        "unnest(range(7)) AS u(i)), " +
        "wau AS (SELECT wday AS day, count(DISTINCT user_id) AS wau " +
        "FROM w JOIN days ON w.wday = days.day GROUP BY wday) " +
        "SELECT CAST(day AS TIMESTAMP) AS day, dau, wau, " +
        "floor(dau / CAST(wau AS DOUBLE) * 1000000 + 0.5) / 1000000 " +
        "AS stickiness FROM dau JOIN wau USING (day) ORDER BY day"),

    "events_gap_fill" ->
      ("WITH hourly AS (SELECT event_type, " +
        "CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hr, count(*) AS n, " +
        "CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v " +
        "FROM events GROUP BY 1, 2), " +
        "ext AS (SELECT event_type, min(hr) AS mn, max(hr) AS mx " +
        "FROM hourly GROUP BY 1), " +
        "grid AS (SELECT event_type, mn + u.i AS hr FROM ext, " +
        "unnest(range(mx - mn + 1)) AS u(i)), " +
        "j AS (SELECT g.event_type, g.hr, h.n, h.v FROM grid g " +
        "LEFT JOIN hourly h ON g.event_type = h.event_type AND g.hr = h.hr) " +
        "SELECT event_type, hr, coalesce(n, 0) AS n, " +
        "coalesce(v, 0) AS v_cents, CAST(n IS NULL AS BIGINT) AS is_gap, " +
        "last_value(v IGNORE NULLS) OVER (PARTITION BY event_type " +
        "ORDER BY hr ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
        "AS carried_cents FROM j ORDER BY event_type, hr"),

    "events_top_paths" ->
      ("WITH tri AS (SELECT event_type || '>' || " +
        "lead(event_type, 1) OVER w || '>' || " +
        "lead(event_type, 2) OVER w AS path FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) " +
        "SELECT path, count(*) AS n FROM tri WHERE path IS NOT NULL " +
        "GROUP BY path ORDER BY n DESC, path LIMIT 10"),

    "events_table_diff" ->
      ("WITH cut AS (SELECT (min(CAST(floor(epoch(ts)) AS BIGINT)) + " +
        "max(CAST(floor(epoch(ts)) AS BIGINT))) // 2 AS cut FROM events), " +
        "bst AS (SELECT user_id, last_ts, last_type FROM (" +
        "SELECT user_id, ts AS last_ts, event_type AS last_type, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) " +
        "AS rk FROM events, cut WHERE CAST(floor(epoch(ts)) AS BIGINT) < cut) " +
        "WHERE rk = 1 AND last_type <> 'error'), " +
        "ast AS (SELECT user_id, last_ts, last_type FROM (" +
        "SELECT user_id, ts AS last_ts, event_type AS last_type, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) " +
        "AS rk FROM events) WHERE rk = 1 AND last_type <> 'error') " +
        "SELECT * FROM (SELECT coalesce(b.user_id, a.user_id) AS user_id, " +
        "CASE WHEN b.user_id IS NULL THEN 'added' " +
        "WHEN a.user_id IS NULL THEN 'removed' " +
        "WHEN a.last_ts <> b.last_ts OR a.last_type <> b.last_type THEN 'changed' " +
        "ELSE 'unchanged' END AS change, " +
        "b.last_ts AS old_ts, b.last_type AS old_type, " +
        "a.last_ts AS new_ts, a.last_type AS new_type " +
        "FROM bst b FULL JOIN ast a ON a.user_id = b.user_id) " +
        "WHERE change <> 'unchanged' ORDER BY user_id"),

    "events_mad_outliers" ->
      ("WITH med AS (SELECT event_type, round(quantile_cont(value, 0.5), 6) " +
        "AS med FROM events GROUP BY 1), " +
        "dev AS (SELECT e.event_type, e.event_id, e.value, m.med, " +
        "abs(e.value - m.med) AS ad FROM events e JOIN med m USING (event_type)), " +
        "mad AS (SELECT event_type, round(quantile_cont(ad, 0.5), 6) AS mad " +
        "FROM dev GROUP BY 1) " +
        "SELECT d.event_type, d.event_id, d.value, d.med, a.mad, " +
        "floor(d.ad / a.mad * 1000000 + 0.5) / 1000000 AS score " +
        "FROM dev d JOIN mad a USING (event_type) " +
        "WHERE a.mad > 0 AND d.ad > a.mad * 3 " +
        "ORDER BY d.event_type, d.event_id"),

    "events_ab_welch" -> {
      val se2 = "(va / na + vb / nb)"
      "WITH st AS (SELECT event_type, count(*) AS n, " +
        "CAST(sum(c) AS BIGINT) AS s1, CAST(sum(c * c) AS BIGINT) AS s2 FROM " +
        "(SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c " +
        "FROM events) GROUP BY 1), " +
        "p AS (SELECT a.event_type AS type_a, b.event_type AS type_b, " +
        "a.n AS na, b.n AS nb, " +
        "CAST(a.s1 AS DOUBLE) / a.n AS ma, CAST(b.s1 AS DOUBLE) / b.n AS mb, " +
        "(a.s2 - CAST(a.s1 AS DOUBLE) * a.s1 / a.n) / (a.n - 1) AS va, " +
        "(b.s2 - CAST(b.s1 AS DOUBLE) * b.s1 / b.n) / (b.n - 1) AS vb " +
        "FROM st a JOIN st b ON a.event_type < b.event_type) " +
        "SELECT type_a, type_b, na AS n_a, nb AS n_b, " +
        "floor((ma - mb) * 10000 + 0.5) / 10000 AS mean_diff_cents, " +
        s"floor((ma - mb) / sqrt($se2) * 1000000 + 0.5) / 1000000 AS t_stat, " +
        s"floor($se2 * $se2 / " +
        "((va / na) * (va / na) / (na - 1) + (vb / nb) * (vb / nb) / (nb - 1)) " +
        "* 10000 + 0.5) / 10000 AS welch_dof " +
        "FROM p ORDER BY type_a, type_b"
    },

    "events_scd2" ->
      ("WITH m AS (SELECT user_id, ts, event_id, event_type, " +
        "lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) " +
        "AS prev FROM events), " +
        "c AS (SELECT user_id, ts, event_id, event_type FROM m " +
        "WHERE prev IS NULL OR prev <> event_type) " +
        "SELECT user_id, event_type AS state, ts AS valid_from, " +
        "lead(ts) OVER w AS valid_to, lead(ts) OVER w IS NULL AS is_current " +
        "FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id) " +
        "ORDER BY user_id, valid_from, state"),

    // holt twin: the identical integer recurrence as a list_reduce fold —
    // the seed [y0, 0] is PREPENDED (DuckDB's reduce takes no init) and
    // later elements carry [y, 0] pairs of which only y is read.
    "events_forecast_holt" ->
      ("WITH hourly AS (SELECT event_type, " +
        "CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hr, count(*) AS n " +
        "FROM events GROUP BY 1, 2), " +
        "ser AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours, " +
        "list_transform(list(n * 1000000 ORDER BY hr), y -> [y, 0]::BIGINT[]) " +
        "AS ys FROM hourly GROUP BY 1), " +
        "st AS (SELECT event_type, n_hours, list_reduce(" +
        "list_prepend([ys[1][1], 0]::BIGINT[], ys[2:]), " +
        "(acc, x) -> [(x[1] + acc[1] + acc[2]) // 2, " +
        "((x[1] + acc[1] + acc[2]) // 2 - acc[1] + acc[2]) // 2]::BIGINT[]) AS s " +
        "FROM ser) " +
        "SELECT event_type, n_hours, s[1] AS level_micro, s[2] AS trend_micro, " +
        "s[1] + s[2] AS fc1_micro, s[1] + s[2] * 2 AS fc2_micro, " +
        "s[1] + s[2] * 3 AS fc3_micro FROM st ORDER BY event_type"),

    "events_countmin_topk" -> {
      val hashRows = cmSeeds.zipWithIndex
        .map { case ((a, c), r) => s"($r, $a, $c)" }.mkString(", ")
      s"WITH h(r, a, c) AS (VALUES $hashRows), " +
        "pairs AS (SELECT r, ((user_id * a + c) % 2147483648) " +
        s"% $cmW AS b FROM events, h), " +
        "sketch AS (SELECT r, b, count(*) AS cnt FROM pairs GROUP BY 1, 2), " +
        "exact AS (SELECT user_id, count(*) AS exact_n FROM events " +
        "GROUP BY user_id), " +
        "est AS (SELECT user_id, min(cnt) AS est FROM " +
        s"(SELECT e.user_id, h.r, ((e.user_id * h.a + h.c) % 2147483648) % $cmW AS b " +
        "FROM exact e, h) q JOIN sketch USING (r, b) GROUP BY user_id) " +
        "SELECT user_id, est, exact_n, est >= exact_n AS over_ok " +
        "FROM exact JOIN est USING (user_id) " +
        "ORDER BY est DESC, user_id LIMIT 10"
    },

    // Replays the per-user lead window (same tie-break) and the
    // matrix-partitioned row normalization.
    "events_markov_transitions" ->
      ("WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us " +
        "FROM events), " +
        "t AS (SELECT event_type AS src, lead(event_type) OVER " +
        "(PARTITION BY user_id ORDER BY us, event_id) AS dst FROM e), " +
        "m AS (SELECT src, dst, count(*) AS n FROM t " +
        "WHERE dst IS NOT NULL GROUP BY 1, 2) " +
        "SELECT src, dst, n, floor(n / CAST(sum(n) OVER (PARTITION BY src) " +
        "AS DOUBLE) * 1000000 + 0.5) / 1000000 AS p " +
        "FROM m ORDER BY src, dst"),

    // Replays the midpoint split (integer // 2), the extent-normalized
    // 10-bin histogram, Laplace-smoothed ratios, and the summed ln terms.
    "events_psi_drift" -> {
      val term =
        "((c_ref + 1) / CAST(n_ref + 10 AS DOUBLE) - " +
          "(c_cur + 1) / CAST(n_cur + 10 AS DOUBLE)) * " +
          "ln(((c_ref + 1) / CAST(n_ref + 10 AS DOUBLE)) / " +
          "((c_cur + 1) / CAST(n_cur + 10 AS DOUBLE)))"
      "WITH ev AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day, " +
        "value FROM events), " +
        "ext AS (SELECT min(day) AS dlo, max(day) AS dhi, " +
        "min(value) AS vlo, max(value) AS vhi FROM ev), " +
        "b AS (SELECT event_type, " +
        "CASE WHEN day < (dlo + dhi + 1) // 2 THEN 0 ELSE 1 END AS per, " +
        "least(CAST(floor((value - vlo) * 10 / " +
        "greatest(vhi - vlo, 1e-12)) AS BIGINT), 9) AS bin FROM ev, ext), " +
        "rc AS (SELECT event_type, bin, " +
        "CAST(sum(CASE WHEN per = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_ref, " +
        "CAST(sum(CASE WHEN per = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c_cur " +
        "FROM b GROUP BY 1, 2), " +
        "tt AS (SELECT event_type, " +
        "CAST(sum(CASE WHEN per = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ref, " +
        "CAST(sum(CASE WHEN per = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cur " +
        "FROM b GROUP BY 1), " +
        "grid AS (SELECT event_type, n_ref, n_cur, i AS bin " +
        "FROM tt, range(10) t(i)), " +
        "j AS (SELECT g.event_type, g.n_ref, g.n_cur, " +
        "COALESCE(c_ref, 0) AS c_ref, COALESCE(c_cur, 0) AS c_cur " +
        "FROM grid g LEFT JOIN rc ON rc.event_type = g.event_type " +
        "AND rc.bin = g.bin), " +
        s"ps AS (SELECT event_type, n_ref, n_cur, sum($term) AS s " +
        "FROM j GROUP BY 1, 2, 3) " +
        "SELECT event_type, n_ref, n_cur, " +
        "floor(s * 1000000 + 0.5) / 1000000 AS psi, " +
        "CAST(CASE WHEN floor(s * 1000000 + 0.5) / 1000000 > 0.2 " +
        "THEN 1 ELSE 0 END AS BIGINT) AS drift " +
        "FROM ps ORDER BY event_type"
    },

    // Replays the user-profile agg (epoch-hour arithmetic, integer
    // cents) and the QI bucketing; // is integer division on BIGINTs.
    "events_k_anonymity" ->
      ("WITH prof AS (SELECT user_id, count(*) AS n_events, " +
        "(CAST(floor(epoch(min(ts))) AS BIGINT) // 3600) % 24 AS first_hour, " +
        "CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents " +
        "FROM events GROUP BY 1) " +
        "SELECT n_events // 10 AS n_bucket, first_hour // 6 AS hour_bucket, " +
        "cents // 50000 AS spend_bucket, count(*) AS k, " +
        "CAST(CASE WHEN count(*) < 5 THEN 1 ELSE 0 END AS BIGINT) AS at_risk " +
        "FROM prof GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"),

    // Replays the islands (day − row_number), both per-user windows, and
    // the earliest-start tie-break.
    "events_streaks" ->
      ("WITH days AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 " +
        "AS day FROM events), " +
        "isl AS (SELECT user_id, day, day - row_number() OVER " +
        "(PARTITION BY user_id ORDER BY day) AS grp FROM days), " +
        "runs AS (SELECT user_id, grp, count(*) AS len, min(day) AS start " +
        "FROM isl GROUP BY 1, 2), " +
        "ranked AS (SELECT user_id, len, start, " +
        "CAST(sum(len) OVER (PARTITION BY user_id) AS BIGINT) AS n_active_days, " +
        "max(len) OVER (PARTITION BY user_id) AS maxlen FROM runs) " +
        "SELECT user_id, n_active_days, CAST(maxlen AS BIGINT) AS " +
        "longest_streak, min(start) AS streak_start FROM ranked " +
        "WHERE len = maxlen GROUP BY user_id, n_active_days, maxlen " +
        "ORDER BY user_id"),

    // Replays the running purchase count, the next-purchase windowing,
    // and the exact micro-unit credit aggregation.
    "events_attribution" ->
      ("WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us, " +
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p " +
        "FROM events), " +
        "pos AS (SELECT *, CAST(sum(is_p) OVER (PARTITION BY user_id " +
        "ORDER BY us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND " +
        "CURRENT ROW) AS BIGINT) AS p_at, " +
        "CAST(sum(is_p) OVER (PARTITION BY user_id) AS BIGINT) AS tot_p " +
        "FROM e), " +
        "grp AS (SELECT user_id, p_at + 1 AS conv, event_type, " +
        "count(*) AS n_e FROM pos WHERE is_p = 0 AND p_at < tot_p " +
        "GROUP BY 1, 2, 3), " +
        "sized AS (SELECT *, CAST(sum(n_e) OVER (PARTITION BY user_id, conv) " +
        "AS BIGINT) AS n_g FROM grp), " +
        "micro AS (SELECT event_type, n_e, " +
        "CAST(floor(n_e / CAST(n_g AS DOUBLE) * 1000000 + 0.5) AS BIGINT) " +
        "AS credit_micro FROM sized) " +
        "SELECT event_type, CAST(sum(n_e) AS BIGINT) AS n_touches, " +
        "count(*) AS n_windows, " +
        "CAST(sum(credit_micro) AS BIGINT) / 1000000.0 AS credit " +
        "FROM micro GROUP BY 1 ORDER BY 1"),

    // Replays the micro-rounded ln terms, the exact per-user integer
    // sums, and the digit-count tiers.
    "events_entropy" ->
      ("WITH ct AS (SELECT user_id, event_type, count(*) AS c FROM events " +
        "GROUP BY 1, 2), " +
        "cm AS (SELECT user_id, c, CAST(floor(ln(c) * 1000000 + 0.5) " +
        "AS BIGINT) AS lnc_micro FROM ct), " +
        "u AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n, " +
        "CAST(sum(c * lnc_micro) AS BIGINT) AS s_micro, " +
        "count(*) AS n_types FROM cm GROUP BY 1), " +
        "h AS (SELECT *, CAST(floor(CAST(floor(ln(n) * 1000000 + 0.5) " +
        "AS BIGINT) - s_micro / CAST(n AS DOUBLE) + 0.5) AS BIGINT) " +
        "AS h_micro, CAST(length(CAST(n AS VARCHAR)) AS BIGINT) AS tier " +
        "FROM u) " +
        "SELECT tier, count(*) AS n_users, " +
        "floor(CAST(sum(h_micro) AS BIGINT) / CAST(count(*) AS DOUBLE) " +
        "+ 0.5) / 1000000 AS avg_entropy, " +
        "min(h_micro) / 1000000.0 AS min_entropy, " +
        "max(h_micro) / 1000000.0 AS max_entropy, " +
        "floor(CAST(sum(n_types) AS BIGINT) / CAST(count(*) AS DOUBLE) " +
        "* 1000 + 0.5) / 1000 AS avg_types " +
        "FROM h GROUP BY tier ORDER BY tier"),

    // Replays the QI buckets, the seeded LCG → uniform → Laplace
    // inverse-CDF noise, and the clamped integer release.
    "events_dp_release" ->
      ("WITH prof AS (SELECT user_id, count(*) AS n_events, " +
        "(CAST(floor(epoch(min(ts))) AS BIGINT) // 3600) % 24 AS first_hour, " +
        "CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents " +
        "FROM events GROUP BY 1), " +
        "qi AS (SELECT n_events // 10 AS n_bucket, first_hour // 6 AS hour_bucket, " +
        "cents // 50000 AS spend_bucket, count(*) AS k " +
        "FROM prof GROUP BY 1, 2, 3), " +
        "nz AS (SELECT *, (((n_bucket * 100003 + hour_bucket * 1009 " +
        "+ spend_bucket) * 2654435761 + 1013904223) % 4294967296 + 1) " +
        "/ 4294967297.0 AS u FROM qi) " +
        "SELECT n_bucket, hour_bucket, spend_bucket, CAST(k AS BIGINT) AS k, " +
        "greatest(CAST(floor(k + (-sign(u - 0.5) * ln(1 - 2 * abs(u - 0.5))) " +
        "+ 0.5) AS BIGINT), 0) AS released " +
        "FROM nz ORDER BY 1, 2, 3"),

    // Replays the exact-integer scaled CUSUM (D·prefix − i·total), the
    // |·| argmax with min-day tie-break, and the reported |S|/D.
    "events_changepoint" ->
      ("WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day, " +
        "count(*) AS n FROM events GROUP BY 1, 2), " +
        "tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS total, " +
        "count(*) AS n_days FROM daily GROUP BY 1), " +
        "pref AS (SELECT event_type, day, " +
        "CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) " +
        "AS BIGINT) AS i, CAST(sum(n) OVER (PARTITION BY event_type " +
        "ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
        "AS BIGINT) AS pre FROM daily), " +
        "cs AS (SELECT p.event_type, day, n_days, " +
        "abs(n_days * pre - i * total) AS a, " +
        "max(abs(n_days * pre - i * total)) OVER " +
        "(PARTITION BY p.event_type) AS amax " +
        "FROM pref p JOIN tot t USING (event_type)) " +
        "SELECT event_type, n_days, min(day) AS cp_day, " +
        "floor(amax / CAST(n_days AS DOUBLE) * 1000000 + 0.5) / 1000000 " +
        "AS magnitude FROM cs WHERE a = amax " +
        "GROUP BY event_type, n_days, amax ORDER BY event_type"),

    // Replays the lag window (same deterministic tie-break), HUGEINT Σg²,
    // and the rounded-cv threshold.
    "events_bot_detection" ->
      ("WITH g AS (SELECT user_id, epoch_us(ts) - lag(epoch_us(ts)) " +
        "OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap " +
        "FROM events), " +
        "st AS (SELECT user_id, count(*) AS n_gaps, " +
        "CAST(sum(gap) AS HUGEINT) AS sg, " +
        "sum(CAST(gap AS HUGEINT) * gap) AS sg2 " +
        "FROM g WHERE gap IS NOT NULL GROUP BY 1), " +
        "o AS (SELECT user_id, n_gaps, " +
        "CAST(floor(CAST(sg AS DOUBLE) / n_gaps + 0.5) AS BIGINT) " +
        "AS mean_gap_us, " +
        "floor(sqrt(greatest(n_gaps * CAST(sg2 AS DOUBLE) - " +
        "CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE), 0)) / CAST(sg AS DOUBLE) " +
        "* 1000000 + 0.5) / 1000000 AS cv FROM st) " +
        "SELECT user_id, n_gaps, mean_gap_us, cv, " +
        "CAST(CASE WHEN cv < 0.85 AND n_gaps >= 50 THEN 1 ELSE 0 END " +
        "AS BIGINT) AS is_bot FROM o ORDER BY user_id"),

    // Replays the 6-way offset join (value-based trailing window, partial
    // at series start) and the integer 4·err > total burn test.
    "events_error_rate_slo" ->
      ("WITH hourly AS (SELECT epoch_us(ts) // 3600000000 AS hr, " +
        "count(*) AS n_total, CAST(sum(CASE WHEN event_type = 'error' " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_err FROM events GROUP BY 1), " +
        "w6 AS (SELECT h.hr + o.off AS hr, " +
        "CAST(sum(n_total) AS BIGINT) AS tot6, " +
        "CAST(sum(n_err) AS BIGINT) AS err6 FROM hourly h CROSS JOIN " +
        "(VALUES (0), (1), (2), (3), (4), (5)) o(off) GROUP BY 1) " +
        "SELECT h.hr, n_total, n_err, " +
        "floor(n_err / CAST(n_total AS DOUBLE) * 1000000 + 0.5) / 1000000 " +
        "AS rate_1h, " +
        "floor(err6 / CAST(tot6 AS DOUBLE) * 1000000 + 0.5) / 1000000 " +
        "AS rate_6h, " +
        "CAST(CASE WHEN n_err * 4 > n_total AND err6 * 4 > tot6 " +
        "THEN 1 ELSE 0 END AS BIGINT) AS page " +
        "FROM hourly h JOIN w6 ON w6.hr = h.hr ORDER BY h.hr"),

    // Replays the epoch-µs RANGE frame and the ≥ 3 threshold.
    "events_velocity_flags" ->
      ("SELECT user_id, event_id, us, n_trailing_1h FROM " +
        "(SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS us, " +
        "count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts) " +
        "RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) " +
        "AS n_trailing_1h FROM events) WHERE n_trailing_1h >= 3 " +
        "ORDER BY user_id, us, event_id"),

    // Replays the exact-sufficient-statistics variance and the 15.68
    // two-sided power constant into the same ceil.
    "events_power_analysis" ->
      ("WITH st AS (SELECT event_type, count(*) AS n, " +
        "CAST(sum(c) AS BIGINT) AS s1, CAST(sum(c * c) AS BIGINT) AS s2 " +
        "FROM (SELECT event_type, " +
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS c FROM events) " +
        "GROUP BY 1), " +
        "v AS (SELECT event_type, n, s1, " +
        "(s2 - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1) AS vr, " +
        "0.05 * (CAST(s1 AS DOUBLE) / n) AS mde " +
        "FROM st WHERE n > 1 AND s1 > 0), " +
        "r AS (SELECT event_type, n, s1, " +
        "CAST(greatest(1, ceil(15.68 * vr / (mde * mde))) AS BIGINT) AS n_req FROM v) " +
        "SELECT event_type, n, " +
        "floor(CAST(s1 AS DOUBLE) / n * 10000 + 0.5) / 10000 AS mean_cents, " +
        "n_req AS n_required_per_arm, " +
        "CAST(CASE WHEN n >= 2 * n_req THEN 1 ELSE 0 END AS BIGINT) " +
        "AS powered_now FROM r ORDER BY event_type"),

    // Replays the LCG arm assignment (forced BIGINT literals — the
    // cross-engine hash contract) and the collapsed 1-df chi-square.
    "events_ab_srm" ->
      ("WITH tu AS (SELECT DISTINCT event_type, user_id FROM events), " +
        "arms AS (SELECT event_type, " +
        "(((user_id % 2147483648) * 1103515245 + 12345) % 2147483648) % 2 " +
        "AS arm FROM tu), " +
        "agg AS (SELECT event_type, " +
        "CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a, " +
        "CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b " +
        "FROM arms GROUP BY 1) " +
        "SELECT event_type, n_a, n_b, " +
        "floor((n_a - n_b) * (n_a - n_b) / CAST(n_a + n_b AS DOUBLE) " +
        "* 1000000 + 0.5) / 1000000 AS srm_chi2, " +
        "CAST(CASE WHEN (n_a - n_b) * (n_a - n_b) / " +
        "CAST(n_a + n_b AS DOUBLE) > 3.841459 THEN 1 ELSE 0 END AS BIGINT) " +
        "AS srm_flag FROM agg ORDER BY event_type"),

    // Replays the censoring rule (quiet before the global last day =
    // churn), the suffix-sum risk set, and the zero-factor CASE that
    // keeps ln() off the divergent ln(0) edge.
    "events_survival_km" ->
      ("WITH spans AS (SELECT user_id, min(CAST(ts AS DATE)) AS f, " +
        "max(CAST(ts AS DATE)) AS l FROM events GROUP BY user_id), " +
        "m AS (SELECT max(l) AS m FROM spans), " +
        "byt AS (SELECT CAST(date_diff('day', f, l) AS BIGINT) AS t, " +
        "count(*) AS ended, CAST(sum(CASE WHEN l < m THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS d_t FROM spans, m GROUP BY 1), " +
        "r AS (SELECT t, d_t, CAST(sum(ended) OVER (ORDER BY t " +
        "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) " +
        "AS n_risk FROM byt), " +
        "k AS (SELECT t, n_risk, d_t, " +
        "1 - CAST(d_t AS DOUBLE) / n_risk AS factor FROM r WHERE d_t > 0), " +
        "c AS (SELECT t, n_risk, d_t, " +
        "max(CASE WHEN factor = 0 THEN 1 ELSE 0 END) OVER win AS zero, " +
        "sum(CASE WHEN factor > 0 THEN ln(factor) ELSE 0 END) OVER win " +
        "AS lnsum FROM k WINDOW win AS (ORDER BY t " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) " +
        "SELECT t, n_risk, d_t AS n_churned, " +
        "floor((CASE WHEN zero = 1 THEN 0 ELSE exp(lnsum) END) " +
        "* 1000000 + 0.5) / 1000000 AS survival FROM c ORDER BY t"),

    // Replays the 0=Sunday dow convention (DuckDB native; Spark −1) and
    // the ×168 flat-week index.
    "events_seasonal_profile" ->
      ("WITH cell AS (SELECT event_type, " +
        "CAST(dayofweek(ts) AS BIGINT) AS dow, " +
        "CAST(hour(ts) AS BIGINT) AS hr, count(*) AS n " +
        "FROM events GROUP BY 1, 2, 3), " +
        "tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS total " +
        "FROM cell GROUP BY 1) " +
        "SELECT event_type, dow, hr, n, " +
        "floor(n * 168 / CAST(total AS DOUBLE) * 1000000 + 0.5) / 1000000 " +
        "AS seasonal_idx FROM cell JOIN tot USING (event_type) " +
        "ORDER BY event_type, dow, hr"),

    // Replays the value-histogram Gini fold: per activity-count run,
    // Σ i·x collapses to v·(m·C + m(m+1)//2) — all integers until the
    // final closed form.
    "events_gini" ->
      ("WITH pu AS (SELECT event_type, user_id, count(*) AS v " +
        "FROM events GROUP BY 1, 2), " +
        "hist AS (SELECT event_type, v, count(*) AS m FROM pu GROUP BY 1, 2), " +
        "c AS (SELECT event_type, v, m, COALESCE(CAST(sum(m) OVER " +
        "(PARTITION BY event_type ORDER BY v " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) " +
        "AS cum FROM hist), " +
        "agg AS (SELECT event_type, CAST(sum(m) AS BIGINT) AS n_users, " +
        "CAST(sum(v * m) AS BIGINT) AS sx, " +
        "CAST(sum(v * (m * cum + m * (m + 1) // 2)) AS BIGINT) AS sixs " +
        "FROM c GROUP BY 1) " +
        "SELECT event_type, n_users, " +
        "floor((2 * sixs / (CAST(n_users AS DOUBLE) * sx) - " +
        "(n_users + CAST(1 AS DOUBLE)) / n_users) * 1000000 + 0.5) / 1000000 " +
        "AS gini FROM agg ORDER BY event_type"),

    // Replays the epoch-day lag join (gaps drop pairs, no imputation)
    // and the six-integer-sums Pearson closed form.
    "events_autocorr" ->
      ("WITH daily AS (SELECT event_type, " +
        "CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) " +
        "AS BIGINT) AS off, count(*) AS n FROM events GROUP BY 1, 2), " +
        "pairs AS (SELECT a.event_type, l.lag, a.n AS x, b.n AS y " +
        "FROM daily a CROSS JOIN (VALUES (CAST(1 AS BIGINT)), (2), (3)) " +
        "AS l(lag) JOIN daily b ON b.event_type = a.event_type " +
        "AND b.off = a.off - l.lag), " +
        "st AS (SELECT event_type, lag, count(*) AS n_pairs, " +
        "CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy, " +
        "CAST(sum(x * y) AS BIGINT) AS sxy, " +
        "CAST(sum(x * x) AS BIGINT) AS sx2, " +
        "CAST(sum(y * y) AS BIGINT) AS sy2 " +
        "FROM pairs GROUP BY 1, 2) " +
        "SELECT event_type, lag, n_pairs, " +
        "floor((n_pairs * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy) / " +
        "sqrt((n_pairs * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * sx) * " +
        "(n_pairs * CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE) * sy)) " +
        "* 1000000 + 0.5) / 1000000 AS autocorr FROM st " +
        "WHERE n_pairs >= 3 " +
        "AND n_pairs * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * sx > 0 " +
        "AND n_pairs * CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE) * sy > 0 " +
        "ORDER BY event_type, lag")
  )
}
