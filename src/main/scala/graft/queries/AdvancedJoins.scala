package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Advanced joins: theta/range, interval self-join, as-of (SURVEY.md §2.3
  * J6–J8).
  *
  * Scale posture: J6 keeps the nested-loop side broadcast-small (5 rows);
  * J7 carries an equi key (`user_id`) alongside the range predicate so the
  * planner uses a hash/sort-merge join instead of a cartesian explosion;
  * J8 expresses as-of via the portable `row_number() = 1` formulation so
  * Spark and DuckDB run identical semantics — at 100 TB the same plan
  * shuffles both sides by the equi key once and windows within partitions.
  */
object AdvancedJoins {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // J6: non-equi band join against a broadcast-small dimension.
    "join_theta_range" -> ((s, d) => {
      val e = Tables.events(s, d)
      val r = Tables.region(s, d)
      e.join(broadcast(r),
          e("value") >= r("r_regionkey") * 100.0 &&
          e("value") < (r("r_regionkey") + 1) * 100.0)
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy(col("r_name"))
    }),

    // J7: same-user event pairs within 1 hour. The join key carries an
    // hour bucket alongside user_id: a pair within 1 h has the second
    // event in the first's bucket or the next one, so the left side emits
    // (b, b+1) and the equi key becomes (user_id, bucket). Without the
    // bucket, every same-user pair materializes before the time filter —
    // quadratic in per-user density (a user with 10k events in a month
    // would produce 50M pairs to filter); with it, candidates are bounded
    // by events-per-user-per-hour.
    "join_interval" -> ((s, d) => {
      val base = Tables.events(s, d)
        .withColumn("bkt", expr("CAST(unix_seconds(CAST(ts AS TIMESTAMP)) DIV 3600 AS BIGINT)"))
      val e1 = base
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
          explode(expr("array(bkt, bkt + 1)")).as("jb")).alias("e1")
      val e2 = base.alias("e2")
      e1.join(e2,
          col("e1.user_id") === col("e2.user_id") &&
          col("e1.jb") === col("e2.bkt") &&
          (col("e1.ts") < col("e2.ts") ||
            (col("e1.ts") === col("e2.ts") &&
             col("e1.event_id") < col("e2.event_id"))) &&
          col("e2.ts") <= col("e1.ts") + expr("INTERVAL '1' HOUR"))
        .groupBy(col("e1.event_type").as("t1"), col("e2.event_type").as("t2"))
        .agg(count(lit(1)).as("pairs"))
        .orderBy(col("t1"), col("t2"))
    }),

    // J8: as-of join — each event matched to the latest prior order of the
    // same customer. Linear single-shuffle form: union both inputs into one
    // stream keyed by user, sort within user by (time, kind), and carry the
    // latest order forward with last(_, ignoreNulls). The join+rank form
    // materializes every (event × prior order) pair first — quadratic in
    // per-key density — and shuffles twice; this shuffles once and never
    // fans out, so it survives a 100× scale-up. Ordering makes an order at
    // exactly ts visible to the event (kind 0 < 1 = inclusive bound), and
    // equal-timestamp orders resolve to the max o_orderkey.
    "join_asof" -> ((s, d) => {
      val e = Tables.events(s, d).select(
        col("user_id"), col("ts").as("t"), lit(1).as("kind"),
        col("event_id"), lit(null).cast("long").as("ok"),
        lit(null).cast("double").as("tot"))
      val o = Tables.orders(s, d).select(
        col("o_custkey").as("user_id"),
        // ntz to match events.ts exactly (session is UTC, so same wall time)
        col("o_orderdate").cast("timestamp_ntz").as("t"),
        lit(0).as("kind"), lit(null).cast("long").as("event_id"),
        col("o_orderkey").as("ok"), col("o_totalprice").as("tot"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("t"), col("kind"), col("sk"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.unionByName(o)
        // materialize the sort key so both last() calls share ONE Window
        // node (otherwise each withColumn re-derives it under a fresh attr
        // and CollapseWindow can't merge the two sorts)
        .withColumn("sk", coalesce(col("ok"), col("event_id")))
        .select(col("*"),
          last(col("ok"), ignoreNulls = true).over(w).as("last_orderkey"),
          last(col("tot"), ignoreNulls = true).over(w).as("last_total"))
        .filter(col("kind") === 1 && col("last_orderkey").isNotNull)
        .select(col("event_id"), col("user_id"), col("t").as("ts"),
          col("last_orderkey"), col("last_total"))
        .orderBy(col("event_id"))
    }),

    // J8's FORWARD direction: each click matched to its user's NEXT
    // purchase at-or-after it — the other half of the as-of family
    // (backward answers "state as of t", forward answers "first outcome
    // after t": exactly the conversion-label attachment a churn/
    // conversion training set needs). Same join-free union-window form
    // as join_asof: one user-partitioned sort, first(ignoreNulls) over
    // [current, ∞). Kind encoding flips vs backward (clicks 0,
    // purchases 1) so a SAME-timestamp purchase sorts after the click
    // and lands inside the forward frame — that one bit is what makes
    // the frame mean "at-or-after".
    "join_asof_forward" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val c = ev.filter(col("event_type") === "click").select(
        col("user_id"), col("ts").as("t"), lit(0).as("kind"),
        col("event_id"), lit(null).cast("long").as("pid"),
        lit(null).cast("double").as("pval"))
      val p = ev.filter(col("event_type") === "purchase").select(
        col("user_id"), col("ts").as("t"), lit(1).as("kind"),
        lit(null).cast("long").as("event_id"),
        col("event_id").as("pid"), col("value").as("pval"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("t"), col("kind"), col("sk"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      // one first() over a purchase-only STRUCT, not two independent
      // first(ignoreNulls) columns: a purchase row with a NULL value
      // must still supply BOTH fields of the match (id present, value
      // NULL) rather than letting pval skip ahead to a later purchase
      // and pair fields from different rows. The when() makes click
      // rows a NULL struct (a struct of nulls is not null), so
      // ignoreNulls skips exactly the non-purchase rows.
      c.unionByName(p)
        .withColumn("sk", coalesce(col("pid"), col("event_id")))
        .select(col("*"),
          first(when(col("kind") === 1, struct(col("pid"), col("pval"))),
            ignoreNulls = true).over(w).as("nxt"))
        .filter(col("kind") === 0 && col("nxt").isNotNull)
        .select(col("event_id"), col("user_id"), col("t").as("ts"),
          col("nxt.pid").as("next_purchase_id"),
          col("nxt.pval").as("next_purchase_value"))
        .orderBy(col("event_id"))
    }),

    // Manual salted skew join — the deterministic fallback for the one
    // case AQE's skew splitting can't fix: a single mega-key on the
    // PROBE side of a shuffle join whose build side is too large to
    // broadcast. AQE splits an oversized probe partition but must
    // DUPLICATE the matching build partition to every split; salting
    // bakes the same move into the data, bounded and plannable: the
    // known-hot keys (here the top-5 by a probe-side count — production
    // reads them from table stats) fan their BUILD rows out S=8 ways
    // while each hot PROBE row picks one deterministic salt slot
    // (event_id % S, reproducible across runs — never rand()), so the
    // hot key's rows land on 8 partitions instead of one straggler.
    // Cold keys keep salt 0: no fan-out, no extra rows. The join's equi
    // key becomes (key, salt) — plan-pinned in PlanShapeSpec — and the
    // merge hint stands in for the at-scale reality of a
    // non-broadcastable dim. Result is EQUAL to the unsalted join (the
    // oracle runs the plain join; GoldenSpec pins salted ≡ unsalted),
    // revenue summed in integer cents so both engines agree bit-for-bit.
    "join_salted_skew" -> ((s, d) => {
      val S = 8
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("value"))
      val cust = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))
      val hot = ev.groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("user_id")).limit(5)
        .select(col("user_id").as("hk"))
      val probe = ev.join(broadcast(hot), col("user_id") === col("hk"), "left")
        .withColumn("salt", when(col("hk").isNotNull,
          pmod(col("event_id"), lit(S.toLong))).otherwise(lit(0L)))
        .select(col("user_id"), col("value"), col("salt"))
      val build = cust.join(broadcast(hot), col("c_custkey") === col("hk"), "left")
        .select(col("c_custkey"), col("c_mktsegment"),
          explode(when(col("hk").isNotNull,
            sequence(lit(0L), lit((S - 1).toLong)))
            .otherwise(array(lit(0L)))).as("salt"))
      probe.hint("merge")
        .join(build, probe("user_id") === build("c_custkey") &&
          probe("salt") === build("salt"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_events"),
          sum(expr("CAST(floor(value * 100D + 0.5D) AS BIGINT)")).as("rev_cents"))
        .orderBy(col("c_mktsegment"))
    }),

    // J10: bloom-prefiltered shuffle join — the runtime-filter pattern
    // that pays for itself at 100 TB: when the build side is a SELECTIVE
    // subset (20% of orders here), shuffling the full probe side to the
    // join wastes 80% of the exchange. A Bloom filter of the build keys
    // (65 536 bits = sixteen 64-bit words per kilobit, k = 3 LCG hashes;
    // FPR ≈ 0.2% at this load) broadcasts as ONE map row, and the probe
    // filters BEFORE its shuffle — only possible-matches pay the
    // exchange. No false negatives by construction (a present key sets
    // all 3 of its bits), so the RESULT is exactly the plain join: the
    // oracle runs the unfiltered SQL, and GoldenSpec pins that the
    // prefilter genuinely prunes AND keeps every matching key. Spark's
    // own runtime bloom (spark.sql.optimizer.runtime.bloomFilter) injects
    // this automatically under shuffle joins with selective creation
    // predicates; the explicit form is the portable version — it works
    // across the API boundary (e.g. a probe read from a different
    // format) and makes the mechanism testable. Word-packed bitset:
    // positions groupBy word → bit_or partial-aggregates map-side, so
    // building the filter ships ≤ 1024 words per executor, never keys.
    // Revenue sums integer cents (the cross-engine float discipline).
    "join_bloom_prefilter" -> ((s, d) => {
      val bld = Tables.orders(s, d)
        .filter(col("o_totalprice") > 400000)
        .select(col("o_orderkey"), col("o_custkey"))
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_extendedprice"))
        .crossJoin(broadcast(bloomOf(bld, "o_orderkey")))
        .filter(bloomHit("l_orderkey"))
        .drop("bm")
        // merge hint = the salted_skew discipline: the fixture's build
        // side would broadcast (making the prefilter moot); the hint
        // stands in for the at-scale non-broadcastable build so the plan
        // demonstrates what the bloom buys — a pruned probe exchange
        // (PlanShapeSpec pins the filter BELOW the shuffle).
        .hint("merge")
        .join(bld, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_items"),
          sum(expr("CAST(floor(l_extendedprice * 100D + 0.5D) AS BIGINT)"))
            .as("rev_cents"))
        .orderBy(col("o_custkey"))
    })
  )

  /** Bloom geometry: 65 536 bits (1024 packed 64-bit words), k = 3 pure
    * mod-2³¹ LCG hashes — deterministic, so a DuckDB twin COULD replay the
    * filter; the oracle deliberately runs the PLAIN join instead (the
    * stronger check: the bloom must not change the answer). */
  private[graft] val bloomBits = 65536L
  private[graft] val bloomSeeds: Seq[(Long, Long)] = Seq(
    (2654435761L, 1013904223L), (1103515245L, 12345L), (214013L, 2531011L))

  /** The build side's word-packed bitset as ONE broadcastable map row:
    * (word index → OR of member bits). bit_or partial-aggregates, so each
    * executor ships ≤ bloomBits/64 words regardless of build rows. */
  private[graft] def bloomOf(bld: DataFrame, key: String): DataFrame =
    bld.select(explode(array(bloomSeeds.map { case (a, c) =>
        expr(s"((($key * ${a}L + ${c}L) % 2147483648L) % ${bloomBits}L)") }: _*))
        .as("pos"))
      .select(expr("pos DIV 64").as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").as("m"))
      .groupBy(col("w")).agg(expr("bit_or(m)").as("mask"))
      .agg(expr("map_from_arrays(collect_list(w), collect_list(mask))").as("bm"))

  /** Probe-side membership test against the broadcast `bm` map: all k
    * bits present. An absent word (coalesce 0) short-circuits to miss. */
  private[graft] def bloomHit(key: String): org.apache.spark.sql.Column =
    bloomSeeds.map { case (a, c) =>
      expr(s"((coalesce(element_at(bm, ((($key * ${a}L + ${c}L) " +
        s"% 2147483648L) % ${bloomBits}L) DIV 64), CAST(0 AS BIGINT)) >> " +
        s"CAST(((($key * ${a}L + ${c}L) % 2147483648L) % ${bloomBits}L) % 64 " +
        "AS INT)) & 1) = 1")
    }.reduce(_ && _)

  val oracleSql: Map[String, String] = Map(
    "join_theta_range" ->
      "SELECT r_name, count(*) AS n, round(sum(value), 2) AS sum_value FROM events JOIN region ON value >= r_regionkey * 100.0 AND value < (r_regionkey + 1) * 100.0 GROUP BY r_name ORDER BY r_name",

    "join_interval" ->
      "SELECT e1.event_type AS t1, e2.event_type AS t2, count(*) AS pairs FROM events e1 JOIN events e2 ON e1.user_id = e2.user_id AND (e1.ts < e2.ts OR (e1.ts = e2.ts AND e1.event_id < e2.event_id)) AND e2.ts <= e1.ts + INTERVAL 1 HOUR GROUP BY 1, 2 ORDER BY t1, t2",

    "join_asof" ->
      "SELECT event_id, user_id, ts, o_orderkey AS last_orderkey, o_totalprice AS last_total FROM (SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_totalprice, row_number() OVER (PARTITION BY e.event_id ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn FROM events e JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts) WHERE rn = 1 ORDER BY event_id",

    // forward replay: first purchase at-or-after each click per user.
    "join_asof_forward" ->
      ("SELECT event_id, user_id, ts, next_purchase_id, " +
        "next_purchase_value FROM (SELECT c.event_id, c.user_id, c.ts, " +
        "p.event_id AS next_purchase_id, p.value AS next_purchase_value, " +
        "row_number() OVER (PARTITION BY c.event_id " +
        "ORDER BY p.ts, p.event_id) AS rn FROM events c JOIN events p " +
        "ON p.user_id = c.user_id AND p.event_type = 'purchase' " +
        "AND c.event_type = 'click' AND p.ts >= c.ts) " +
        "WHERE rn = 1 ORDER BY event_id"),

    // salted twin: the PLAIN join — salting must not change the answer.
    "join_salted_skew" ->
      ("SELECT c_mktsegment, count(*) AS n_events, " +
        "CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents " +
        "FROM events JOIN customer ON user_id = c_custkey " +
        "GROUP BY c_mktsegment ORDER BY c_mktsegment"),

    // bloom twin: the PLAIN join — the prefilter must not change the
    // answer (no-false-negatives is the bloom's defining guarantee).
    "join_bloom_prefilter" ->
      ("SELECT o_custkey, count(*) AS n_items, " +
        "CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) " +
        "AS rev_cents FROM lineitem l JOIN orders o " +
        "ON l.l_orderkey = o.o_orderkey WHERE o.o_totalprice > 400000 " +
        "GROUP BY o_custkey ORDER BY o_custkey")
  )
}
