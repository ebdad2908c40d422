package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational core: scans, projection/filter/predicates, joins, aggregations,
  * sorts/limits/set ops (SURVEY.md §2.1–§2.4, §2.6).
  *
  * Conventions shared with the DuckDB oracle twins (SURVEY.md §7.2/§7.3):
  *  - every double aggregate is `round(_, n)` on BOTH sides;
  *  - every query ends in a total-order ORDER BY (unique tiebreak column);
  *  - integer-valued derived columns are aligned to int64 on both sides
  *    (DuckDB `hour()` is BIGINT, Spark's is INT; DuckDB `sum(int)` is
  *    HUGEINT, so the oracle casts to BIGINT);
  *  - aggregate/computed columns carry identical aliases on both sides.
  *
  * Scale posture (100 TB): all plans are declarative DataFrame ops —
  * predicate pushdown / column pruning reach the parquet scan, broadcast is
  * explicit on bounded dims only (region/nation/part), large×large joins
  * shuffle on their equi keys and AQE may re-plan them; nothing collects to
  * the driver.
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  /** agg_corr_matrix geometry: the four lineitem measures (column →
    * short alias) and the 6 unordered pairs, in one place so the Spark
    * aggregate list and the oracle's UNION ALL enumerate identically. */
  private[graft] val corrCols = Seq(
    "l_discount" -> "di", "l_extendedprice" -> "e",
    "l_quantity" -> "q", "l_tax" -> "t")
  private[graft] def corrPairs[A](xs: Seq[A]): Seq[(A, A)] =
    for (i <- xs.indices; j <- i + 1 until xs.size) yield (xs(i), xs(j))

  /** The fixed-bin histogram bin of `value` over a [vmin, vmax] domain —
    * factored so the streaming twin (`Streams.valueHistogram`, a
    * complete-mode agg over the SAME expression with the domain fixed up
    * front, as stream sketches must) is stream ≡ batch by construction.
    * Expects `value`, `vmin`, `vmax` columns in scope. */
  private[graft] def histBin: org.apache.spark.sql.Column = least(
    expr("CAST(floor((value - vmin) / (vmax - vmin) * 256D) AS BIGINT)"),
    lit(255L))

  /** Pure transform behind agg_bitmap_distinct_sparse: Roaring's
    * container model over `(event_type, user_id)` rows. See the query's
    * comment for the full design; factored so GoldenSpec can pin the
    * encoding break-even law on a PLANTED sparse id domain (the fixture
    * ids are dense and small, so only the oracle's by-value census is
    * exercised there). */
  private[graft] def roaringOf(ev: DataFrame): DataFrame = {
    val words = ev
      .select(col("event_type"),
        expr("user_id DIV 65536").as("container"),
        expr("(user_id % 65536) DIV 64").as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 64 AS INT))").as("m"))
      .groupBy(col("event_type"), col("container"), col("w"))
      .agg(expr("bit_or(m)").as("mask"))
    val containers = words
      .groupBy(col("event_type"), col("container"))
      .agg(sum(expr("bit_count(mask)")).as("card"))
      .withColumn("bytes", least(col("card") * 2, lit(8192L)))
    val spans = ev
      .groupBy(col("event_type"))
      .agg(expr("(max(user_id) DIV 64) * 8 + 8") // exact int arithmetic
        .as("bytes_dense_span"))
    containers.groupBy(col("event_type"))
      .agg(sum(col("card")).as("n_distinct"),
        count(lit(1)).as("n_containers"),
        sum((col("card") <= 4096).cast("long")).as("n_array_containers"),
        sum(col("bytes")).as("bytes_roaring"))
      .join(spans, "event_type")
      .select(col("event_type"), col("n_distinct"), col("n_containers"),
        col("n_array_containers"), col("bytes_roaring"),
        col("bytes_dense_span"))
  }

  val queries: Map[String, Q] = Map(
    // ----- §2.1 scans ------------------------------------------------------
    "scan_parquet" -> ((s, d) =>
      Tables.customer(s, d).orderBy(col("c_custkey"))),

    "scan_events_ns" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
        .orderBy(col("event_id"))),

    "scan_json_props" -> ((s, d) =>
      Tables.events(s, d)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
            .getField("k").as("k2"))
        .orderBy(col("event_id"))),

    // Spark 4 VARIANT twin of scan_json_props: parse the JSON ONCE into
    // the binary variant encoding, then extract typed paths. At 100 TB
    // this is the semi-structured scan shape — get_json_object re-parses
    // the string per extraction, variant_get is a binary path lookup.
    "scan_json_variant" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          expr("variant_get(parse_json(props), '$.k', 'long')").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type"))),

    // ----- §2.2 projection / filter / predicates ---------------------------
    "project_filter" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
          col("l_discount") > 0.05)
        .select(col("l_orderkey"), col("l_linenumber"),
          // Per-row money rounding: floor(x*100+0.5)/100 is bit-identical
          // IEEE double math in Spark and DuckDB, unlike round() whose
          // half-up tie handling differs on doubles (SURVEY.md §7.3).
          (floor((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            * 100.0 + 0.5) / 100.0).as("revenue"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    "predicate_in_like" -> ((s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderstatus").isin("F", "O") &&
          col("o_orderpriority").like("%URGENT%") &&
          col("o_totalprice").between(50000.0, 300000.0) &&
          (col("o_orderstatus") <=> lit("F") || col("o_orderstatus") <=> lit("O")))
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_orderpriority"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))),

    "conditional" -> ((s, d) =>
      Tables.orders(s, d)
        .select(
          when(col("o_totalprice") < 50000.0, "small")
            .when(col("o_totalprice") < 150000.0, "medium")
            .otherwise("large").as("bucket"),
          col("o_totalprice"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy(col("bucket"))),

    // ----- §2.3 joins ------------------------------------------------------
    "join_broadcast" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("revenue"))
        .orderBy(col("p_brand"))),

    "join_shuffle" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
        .orderBy(col("o_orderpriority"))),

    "join_multiway" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(Tables.supplier(s, d),
          col("l_suppkey") === col("s_suppkey") &&
            col("s_nationkey") === col("c_nationkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA" &&
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("n_name"))),

    "join_outer_left" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("o_custkey") === col("c_custkey"),
          "left_outer")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          round(coalesce(sum(col("o_totalprice")), lit(0.0)), 2).as("total"))
        .orderBy(col("c_custkey"))),

    "join_outer_full" -> ((s, d) => {
      val byCust = Tables.orders(s, d).groupBy(col("o_custkey").as("k"))
        .agg(round(sum(col("o_totalprice")), 2).as("order_total"))
      val byUser = Tables.events(s, d).groupBy(col("user_id").as("k2"))
        .agg(round(sum(col("value")), 2).as("event_total"))
      byCust.join(byUser, col("k") === col("k2"), "full_outer")
        .select(coalesce(col("k"), col("k2")).as("id"),
          col("order_total"), col("event_total"))
        .orderBy(col("id"))
    }),

    "join_semi_anti" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      val semi = c.join(o, col("o_custkey") === col("c_custkey"), "left_semi")
        .agg(count(lit(1)).as("n")).select(lit("with_orders").as("tag"), col("n"))
      val anti = c.join(o, col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("n")).select(lit("without_orders").as("tag"), col("n"))
      semi.unionAll(anti).orderBy(col("tag"))
    }),

    // ----- §2.4 aggregations ----------------------------------------------
    "agg_groupby" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("sum_disc"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
            (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    "agg_distinct" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("uniq_users"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))),

    // Approximate distinct (HLL): the 100 TB path where exact distinct is
    // infeasible. The raw sketch estimate differs across engines, so the
    // oracle-checked surface is the exact count plus a boolean asserting
    // the HLL estimate landed within 5× its configured 1% rsd — the
    // oracle emits TRUE, so a drifting sketch fails the hash compare.
    "agg_approx_distinct" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_users"),
          approx_count_distinct(col("user_id"), 0.01).as("approx"),
          count(lit(1)).as("n"))
        .select(col("event_type"), col("exact_users"), col("n"),
          (abs(col("approx") - col("exact_users")) <=
            greatest(col("exact_users") * 0.05, lit(1.0))).as("approx_ok"))
        .orderBy(col("event_type"))),

    // A3 at the 100 TB posture: MERGEABLE sketches, not just one-shot
    // approx. The defining property of a production distinct-count
    // pipeline is re-aggregation — per-(type, day) HLL sketches are
    // persisted once, then ANY coarser rollup (per type, per month,
    // global) merges the binary sketches WITHOUT rescanning raw events.
    // Spark 4 ships Apache DataSketches HLL natively: hll_sketch_agg
    // builds the daily partials, hll_union_agg merges them upward — here
    // day → event_type, exactly the cube-maintenance pattern. Graded like
    // agg_approx_distinct: the oracle checks the exact column and a
    // bounded-error boolean on the estimate (lgConfigK=14 ⇒ RSE ≈ 0.8%,
    // the 5% gate is ~6 sigma; sketch bytes differ across engines so the
    // estimate itself can't hash-match).
    "agg_sketch_reaggregate" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val daily = ev
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
      val merged = daily.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      val exact = ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_users"))
      exact.join(merged, "event_type")
        .select(col("event_type"), col("exact_users"), col("n_days"),
          (abs(col("est") - col("exact_users")) <=
            greatest(col("exact_users") * 0.05, lit(5.0))).as("sketch_ok"))
        .orderBy(col("event_type"))
    }),

    // EXACT mergeable distinct — the bitmap-index pattern (ClickHouse
    // groupBitmap / roaring): when the id space is dense and bounded
    // (dictionary-encoded user ids), per-day distinct sets pack into
    // 64-bit WORDS (word = id DIV 64, bit = id % 64) built by one
    // bit_or hash agg — partial aggregation ships ≤ |id-space|/64 words
    // per executor, never ids — and re-aggregation up the cube is
    // cell-wise OR, after which distinct = Σ bit_count. Same mergeable
    // shape as the HLL/histogram partials but EXACT: the oracle checks
    // against true count-distinct by VALUE (a semantic oracle, stronger
    // than mechanism replay), and sum_daily ≥ n_distinct carries the
    // union bound into the checked output. At sparse/unbounded id
    // spaces the same plan holds with roaring containers per 2^16
    // block — the word packing is the dense special case.
    "agg_bitmap_distinct" -> ((s, d) => {
      val words = Tables.events(s, d)
        .select(col("event_type"), to_date(col("ts")).as("day"),
          expr("user_id DIV 64").as("w"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 64 AS INT))").as("m"))
        .groupBy(col("event_type"), col("day"), col("w"))
        .agg(expr("bit_or(m)").as("mask"))
      val daily = words.groupBy(col("event_type"), col("day"))
        .agg(sum(expr("bit_count(mask)")).as("du"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"), sum(col("du")).as("sum_daily"))
      val merged = words.groupBy(col("event_type"), col("w"))
        .agg(expr("bit_or(mask)").as("mm"))
        .groupBy(col("event_type"))
        .agg(sum(expr("bit_count(mm)")).as("n_distinct"))
      daily.join(merged, "event_type")
        .select(col("event_type"), col("n_days"), col("sum_daily"),
          col("n_distinct"))
        .orderBy(col("event_type"))
    }),

    // Roaring-style SPARSE bitmap distinct (VERDICT r10 #9 — the
    // documented upgrade of agg_bitmap_distinct's dense word packing,
    // which bloats on sparse/unbounded id domains): the id space splits
    // into 2^16-value CONTAINERS (container = id DIV 65536, low 16 bits
    // inside), each built by the same bit_or word agg scoped to its
    // container; the container then CHOOSES its encoding by cardinality —
    // Roaring's exact rule: ≤ 4096 values → a sorted uint16 array
    // (2 bytes/value), else the 8 KiB bitmap — so storage is
    // min(2·card, 8192) per container and never scales with the ID RANGE.
    // Output carries the distinct counts (semantically oracled by value),
    // the container census, and both storage footprints: bytes_roaring
    // vs bytes_dense_span (one bit per id in [0, max_id] — what the
    // naive dense array would allocate), making the sparse win — and the
    // dense fixture's honest small-domain loss — part of the checked
    // answer. GoldenSpec pins the break-even law (chosen bytes =
    // least(2·card, 8192)) on a planted sparse domain.
    "agg_bitmap_distinct_sparse" -> ((s, d) =>
      Relational.roaringOf(Tables.events(s, d)).orderBy(col("event_type"))),

    // Mergeable quantiles — the sketch-family sibling of
    // agg_sketch_reaggregate for ORDER statistics: per-day fixed-bin
    // histogram partials (the persisted summary a metrics pipeline
    // writes daily) are merged by plain cell-wise SUM into the global
    // histogram, from which p50/p95/p99 are read off. The bin domain
    // comes from a column-stats extent pass (two scalars, broadcast —
    // the zorder normalization discipline), so partials from any day
    // bin identically and merging is exact: the DuckDB twin skips the
    // day level entirely and bins GLOBALLY — hash equality with the
    // partial-merge path IS the mergeability proof, cross-engine.
    // Quantile extraction runs on the merged ≤256-row table via a
    // bounded non-equi self-join cumulative (≤256² pairs, broadcast) —
    // never a global-ORDER-BY window (the no-single-task-window rule).
    // Per-row double binning is IEEE-identical on both engines; every
    // cross-row aggregate is an integer count.
    "agg_quantile_partials" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("value"), to_date(col("ts")).as("day"))
      val ext = ev.agg(min(col("value")).as("vmin"), max(col("value")).as("vmax"))
      val binned = ev.crossJoin(broadcast(ext))
        .select(col("day"), histBin.as("bin"))
      val daily = binned.groupBy(col("day"), col("bin"))
        .agg(count(lit(1)).as("cnt"))
      val merged = daily.groupBy(col("bin")).agg(sum(col("cnt")).as("cnt"))
      val cum = merged.as("a")
        .join(broadcast(merged.as("b")), col("b.bin") <= col("a.bin"))
        .groupBy(col("a.bin").as("bin"))
        .agg(sum(col("b.cnt")).as("cum"))
      val tot = merged.agg(sum(col("cnt")).as("n"))
      s.range(1)
        .select(explode(array(lit(50L), lit(95L), lit(99L))).as("pct"))
        .crossJoin(broadcast(cum))
        .crossJoin(broadcast(tot))
        .filter(col("cum") * 100 >= col("pct") * col("n"))
        .groupBy(col("pct")).agg(min(col("bin")).as("bin"))
        .crossJoin(broadcast(ext))
        .select(col("pct"), col("bin"),
          expr("floor((vmin + (bin + 0.5D) * (vmax - vmin) / 256D) " +
            "* 1000000D + 0.5D) / 1000000D").as("est_value"))
        .orderBy(col("pct"))
    }),

    // KLL streaming quantiles (udaf/KllQuantileAgg) — the unbounded-
    // domain upgrade path next to the fixed-bin histogram form above:
    // no extent pass, O(k log n) state, associative partial merges
    // (the same shuffle shape as sum()). KLL estimates are RANDOMIZED
    // (compaction coin flips), so the graded output is the rank-error
    // CONTRACT, not the estimate: for each served quantile the exact
    // empirical rank (one broadcast of 3 estimates against the corpus)
    // must land within 5% of target — k = 200's guaranteed ~1.65%
    // error makes a miss at this bound vanishingly improbable, so the
    // check is stable across runs while still failing loudly if the
    // sketch path breaks. GoldenSpec pins the merge law directly.
    "agg_quantile_kll" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("value"))
      val est = ev.agg(graft.udaf.KllQuantileAgg(col("value")).as("qs"))
        .select(posexplode(col("qs")).as(Seq("i", "est")))
        .select(element_at(array(lit(50L), lit(95L), lit(99L)),
          col("i") + 1).as("pct"), col("est"))
      ev.crossJoin(broadcast(est))
        .groupBy(col("pct"))
        .agg(count(lit(1)).as("n"),
          sum((col("value") <= col("est")).cast("long")).as("n_le"))
        .select(col("pct"), col("n"),
          (abs(col("n_le") / col("n") - col("pct") / lit(100.0)) <= 0.05)
            .cast("long").as("within_bound"))
        .orderBy(col("pct"))
    }),

    // Pairwise Pearson correlation over the lineitem measures from ONE
    // aggregation pass of EXACT sufficient statistics — the distributed-
    // statistics discipline at 100 TB: corr() built-ins accumulate
    // doubles, and double addition is order-dependent while shuffle order
    // is not, so two runs (or two engines) can disagree in the last ulp
    // and flip a rounded boundary. Here every cross-row aggregate is an
    // exact integer sum — values scaled to cents as DECIMAL(18,0), so
    // products are DECIMAL(37,0) and sums DECIMAL(38,0), exact at any
    // accumulation order (peak magnitude ~6e19 ≪ 1e38; DuckDB mirrors in
    // HUGEINT) — and mean/variance/covariance derive per-row from those
    // exact sums with the IDENTICAL expression tree on both engines (the
    // events_anomaly discipline, applied to the full 4×4 matrix). One
    // two-phase hash agg, 14 counters, no second pass.
    "agg_corr_matrix" -> ((s, d) => {
      val names = corrCols.map(_._1)
      val scaled = Tables.lineitem(s, d).select(corrCols.map { case (c, a) =>
        expr(s"CAST(CAST(floor($c * 100D + 0.5D) AS BIGINT) AS DECIMAL(18,0))")
          .as(a)
      }: _*)
      val aliases = corrCols.map(_._2)
      val sums = aliases.map(a => sum(col(a)).as(s"s_$a")) ++
        corrPairs(aliases).map { case (a, b) =>
          sum(col(a) * col(b)).as(s"s_${a}_$b") } ++
        aliases.map(a => sum(col(a) * col(a)).as(s"s_${a}_$a"))
      val st = scaled.agg(
        count(lit(1)).cast("decimal(38,0)").as("n"), sums: _*)
      def dbl(c: String) = s"CAST($c AS DOUBLE)"
      def varTerm(a: String) =
        s"(${dbl("n")} * ${dbl(s"s_${a}_$a")} - ${dbl(s"s_$a")} * ${dbl(s"s_$a")})"
      val cells = corrPairs(aliases).zip(corrPairs(names)).map {
        case ((a, b), (na, nb)) =>
          struct(lit(na).as("col_a"), lit(nb).as("col_b"),
            expr("floor((" +
              s"(${dbl("n")} * ${dbl(s"s_${a}_$b")} - ${dbl(s"s_$a")} * ${dbl(s"s_$b")}) " +
              s"/ (sqrt(${varTerm(a)}) * sqrt(${varTerm(b)}))" +
              ") * 1000000D + 0.5D) / 1000000D").as("corr"))
      }
      st.select(explode(array(cells: _*)).as("p"))
        .select(col("p.col_a").as("col_a"), col("p.col_b").as("col_b"),
          col("p.corr").as("corr"))
        .orderBy(col("col_a"), col("col_b"))
    }),

    // Grouped ordinary-least-squares — in-engine model training #2
    // (alongside curation_quality_logreg's GD): per return-flag closed-form
    // OLS of extended price on quantity, fit entirely from sufficient
    // statistics. One hash-agg pass accumulates exact integer sums (x as
    // unit quantities, y as price cents, DECIMAL(38,0) accumulators — the
    // agg_corr_matrix discipline, order-independent and overflow-safe),
    // then slope/intercept/r² are pure per-group arithmetic on the six
    // sums: β = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²), α = (ΣyΣx² − ΣxΣxy) /
    // (nΣx² − (Σx)²), r² = (nΣxy − ΣxΣy)² / ((nΣx² − (Σx)²)(nΣy² −
    // (Σy)²)). The derived doubles come from identical expression trees
    // over identical integers on both engines.
    //
    // Scale shape: map-side partial aggregation collapses every partition
    // to ≤ |groups| × 6 numbers — the data-parallel training shape; no
    // second pass, no iteration, nothing driver-side.
    "agg_linreg" -> ((s, d) => {
      val sc = Tables.lineitem(s, d).select(
        col("l_returnflag").as("flag"),
        expr("CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(18,0))").as("x"),
        expr("CAST(CAST(floor(l_extendedprice * 100D + 0.5D) AS BIGINT) " +
          "AS DECIMAL(18,0))").as("y"))
      val st = sc.groupBy(col("flag")).agg(
        count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))
      def dbl(c: String) = s"CAST($c AS DOUBLE)"
      val det = s"(${dbl("n")} * ${dbl("sxx")} - ${dbl("sx")} * ${dbl("sx")})"
      val cov = s"(${dbl("n")} * ${dbl("sxy")} - ${dbl("sx")} * ${dbl("sy")})"
      val vy = s"(${dbl("n")} * ${dbl("syy")} - ${dbl("sy")} * ${dbl("sy")})"
      st.select(col("flag"), col("n").cast("long").as("n"),
          expr(s"floor($cov / $det * 1000000D + 0.5D) / 1000000D")
            .as("slope_cents"),
          expr(s"floor((${dbl("sy")} * ${dbl("sxx")} - ${dbl("sx")} * " +
            s"${dbl("sxy")}) / $det * 1000000D + 0.5D) / 1000000D")
            .as("intercept_cents"),
          expr(s"floor($cov * $cov / ($det * $vy) * 1000000D + 0.5D) " +
            "/ 1000000D").as("r2"))
        .orderBy(col("flag"))
    }),

    "agg_rollup" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("hr", hour(col("ts")).cast("long"))
        .rollup(col("event_type"), col("hr"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .select(coalesce(col("event_type"), lit("ALL")).as("etype"),
          coalesce(col("hr"), lit(-1L)).as("hr"), col("n"), col("sum_value"))
        .orderBy(col("etype"), col("hr"))),

    "agg_cube" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("dow", dayofweek(col("ts")).cast("long"))
        .cube(col("event_type"), col("dow"))
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("event_type"), lit("ALL")).as("etype"),
          coalesce(col("dow"), lit(-1L)).as("dow"), col("n"))
        .orderBy(col("etype"), col("dow"))),

    "agg_having_top" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .filter(col("n") > 100)
        .orderBy(col("n").desc, col("event_type"))
        .limit(3)),

    "agg_stats" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(
          round(min(col("value")), 2).as("mn"),
          round(max(col("value")), 2).as("mx"),
          round(avg(col("value")), 4).as("av"),
          round(stddev_samp(col("value")), 4).as("sd"),
          round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.9)"), 4).as("p90"))
        .orderBy(col("event_type"))),

    // ----- §2.6 sorts / limits / set ops ----------------------------------
    "sort_multi" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .orderBy(col("o_orderstatus").desc_nulls_last,
          col("o_totalprice").desc_nulls_last, col("o_orderkey").asc)),

    "topk_global" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
          col("l_linenumber"))
        .limit(100)),

    "set_ops" -> ((s, d) => {
      val e = Tables.events(s, d)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id")).distinct()
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id")).distinct()
      val only = clicks.except(purchases)
        .select(lit("click_only").as("tag"), col("user_id"))
      val both = clicks.intersect(purchases)
        .select(lit("click_and_purchase").as("tag"), col("user_id"))
      only.unionAll(both).orderBy(col("tag"), col("user_id"))
    }),

    // T1's batch twin (and the BASELINE events_tumble probe): tumbling
    // 1 h event-time windows as a plain groupBy — identical logic to the
    // streaming version in streaming/Streams.scala.
    "agg_tumbling_hour" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").getField("start")
          .cast("timestamp_ntz").as("w_start"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy(col("w_start"), col("event_type"))),

    // SQL entry path + subquery decorrelation: a scalar subquery in the
    // predicate (events above the global mean) — Catalyst rewrites it to
    // a broadcast one-row join, not a per-row execution.
    "sql_subquery_scalar" -> ((s, d) => {
      Tables.events(s, d).createOrReplaceTempView("v_events")
      s.sql("""SELECT event_id, event_type, value FROM v_events
               WHERE value > (SELECT avg(value) FROM v_events)
               ORDER BY event_id""")
    }),

    // LATERAL correlated subquery with ORDER BY + LIMIT — the SQL
    // surface's per-group top-k: each nation pulls its two
    // highest-balance customers. Catalyst DECORRELATES the lateral
    // (DecorrelateInnerQuery): the per-nation LIMIT becomes a
    // rank-over-partition on the customer side joined back on
    // n_nationkey — one distributed window partitioned by the
    // correlation key, never a per-nation probe loop, which is exactly
    // the window_rank_topk physical shape reached from the SQL entry
    // path instead of the DataFrame API.
    "sql_lateral_topk" -> ((s, d) => {
      Tables.nation(s, d).createOrReplaceTempView("v_nation")
      Tables.customer(s, d).createOrReplaceTempView("v_customer")
      s.sql("""SELECT n.n_name, t.c_custkey, round(t.c_acctbal, 2) AS acctbal
               FROM v_nation n,
               LATERAL (SELECT c_custkey, c_acctbal FROM v_customer c
                        WHERE c.c_nationkey = n.n_nationkey
                        ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
               ORDER BY n.n_name, acctbal DESC, t.c_custkey""")
    }),

    // UNPIVOT (wide → long melt) from the SQL entry path — the inverse
    // surface of pivot_events: the four lineitem measures fold into
    // (measure, v) rows, then a per-(flag, measure) rollup. Catalyst
    // plans Expand (4 output rows per input row, map-side — no shuffle
    // until the aggregate), so the melt is free of any join; the same
    // query at 100 TB is one Expand + one two-phase hash agg.
    "sql_unpivot_measures" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("v_lineitem")
      s.sql("""SELECT l_returnflag, measure, count(*) AS n,
                      round(sum(v), 2) AS sum_value
               FROM v_lineitem
               UNPIVOT (v FOR measure IN
                 (l_quantity, l_extendedprice, l_discount, l_tax))
               GROUP BY l_returnflag, measure
               ORDER BY l_returnflag, measure""")
    }),

    // Correlated scalar subquery: orders above their own customer's
    // average — RewriteCorrelatedScalarSubquery turns the inner query
    // into an aggregate + join keyed by the correlation column.
    "sql_subquery_correlated" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("v_orders")
      s.sql("""SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
               FROM v_orders o
               WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice)
                                           FROM v_orders i
                                           WHERE i.o_custkey = o.o_custkey)
               ORDER BY o_orderkey""")
    }),

    // EXISTS / NOT EXISTS chain (the TPC-H Q21 shape on this schema's
    // columns): orders with at least one returned item and NO item
    // shipped more than 60 days after the order date. Catalyst
    // decorrelates BOTH predicates — EXISTS becomes a left-semi join,
    // NOT EXISTS a left-anti join, each keyed on the correlation column
    // (RewritePredicateSubquery) — so the plan is two hash joins over
    // the line table, never a per-order probe. The semi/anti pair is
    // the third decorrelation form next to the scalar and correlated-
    // scalar entries.
    "sql_subquery_exists_chain" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("v_orders")
      Tables.lineitem(s, d).createOrReplaceTempView("v_lineitem")
      s.sql("""SELECT o_orderpriority, count(*) AS n_orders
               FROM v_orders o
               WHERE EXISTS (SELECT 1 FROM v_lineitem l
                             WHERE l.l_orderkey = o.o_orderkey
                               AND l.l_returnflag = 'R')
                 AND NOT EXISTS (SELECT 1 FROM v_lineitem l
                                 WHERE l.l_orderkey = o.o_orderkey
                                   AND l.l_shipdate > o.o_orderdate
                                     + INTERVAL 60 DAYS)
               GROUP BY o_orderpriority
               ORDER BY o_orderpriority""")
    }),

    // Exact per-group mode via the max-of-struct trick — (count, −value)
    // as an orderable struct picks the most frequent integer-floored
    // value with a deterministic smallest-value tie-break in ONE
    // two-phase hash agg chain (map-side partials on both levels), where
    // the textbook row_number-over-counts form would add a per-group
    // sort; the oracle replays that window form as a cross-method check.
    "agg_mode" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_type"), expr("CAST(floor(value) AS BIGINT)").as("v"))
        .groupBy(col("event_type"), col("v")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("event_type"))
        .agg(max(struct(col("cnt"), (-col("v")).as("nv"))).as("m"))
        .select(col("event_type"), (-col("m.nv")).as("mode_value"),
          col("m.cnt").as("n_mode"))
        .orderBy(col("event_type"))),

    // Value histogram via width_bucket (20 buckets over [0, 1000); 0 =
    // underflow, 21 = overflow). DuckDB 1.0 lacks width_bucket, so the
    // oracle replicates the bucketing arithmetically.
    "agg_histogram" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(width_bucket(col("value"), lit(0.0), lit(1000.0), lit(20))
          .as("bucket"))
        .agg(count(lit(1)).as("n"), round(avg(col("value")), 4).as("avg_value"))
        .orderBy(col("bucket"))),

    // T3's batch twin: session_window works in batch too. The oracle
    // derives the SAME sessions with the lag/cumsum method — a
    // cross-method, cross-engine check of the session semantics
    // (session end = last event + gap).
    "agg_session_windows" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(
          col("session_window.start").cast("timestamp_ntz").as("s_start"),
          col("session_window.end").cast("timestamp_ntz").as("s_end"),
          col("user_id"), col("n"))
        .orderBy(col("user_id"), col("s_start"))),

    // Skew pattern: two-stage salted aggregation. Stage 1 aggregates on
    // (key, salt) — 8 partial rows per hot key spread across 8 reducers —
    // stage 2 merges the partials. Same result as a direct groupBy (the
    // oracle IS the direct form); at 100 TB this is how a single hot
    // event_type stops bottlenecking one reducer. (AQE skew-join handles
    // joins; salting is the aggregation-side counterpart.)
    "agg_salted_skew" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("salt", pmod(col("event_id"), lit(8)))
        .groupBy(col("event_type"), col("salt"))
        .agg(count(lit(1)).as("pn"), sum(col("value")).as("pv"))
        .groupBy(col("event_type"))
        .agg(sum(col("pn")).as("n"), round(sum(col("pv")), 2).as("sum_value"))
        .orderBy(col("event_type"))),

    // Typed Dataset surface (§2.10): case-class pipeline — filter and
    // per-event fee math in Scala with an Encoder, then back to SQL agg.
    // Same oracle as the equivalent pure-SQL form.
    "typed_dataset_fees" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .as[(Long, Long, String, Double)]
        .filter(_._4 > 100.0)
        .map { case (id, user, typ, v) =>
          (typ, if (typ == "purchase") v * 0.02 else 0.5) }
        .toDF("event_type", "fee")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("fee")), 2).as("total_fee"))
        .orderBy(col("event_type"))
    }),

    // A4 variant: explicit GROUPING SETS (finer than rollup/cube — only
    // the combinations the report needs; one Expand, one aggregation).
    "agg_grouping_sets" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("hr", hour(col("ts")).cast("long"))
        .groupingSets(Seq(Seq(col("event_type")), Seq(col("hr")), Seq()),
          col("event_type"), col("hr"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .select(coalesce(col("event_type"), lit("ALL")).as("etype"),
          coalesce(col("hr"), lit(-1L)).as("hr"), col("n"), col("sum_value"))
        .orderBy(col("etype"), col("hr"))),

    // W3 variant: a RANGE frame over event time — peers are rows within a
    // 7-day window of ordering-column VALUE, not a fixed row count.
    "window_range_frame" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          round(sum(col("o_totalprice")).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("o_custkey"))
              .orderBy(col("o_orderdate").cast("timestamp").cast("long"))
              .rangeBetween(-7 * 86400L, 0L)), 2).as("wk_total"))
        .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))),

    // Pivot: event counts per user fanned into one column per event_type.
    // Explicit pivot values keep the schema static (no extra pass and no
    // schema drift at 100 TB); oracle twin is conditional aggregation.
    "pivot_events" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .select(col("user_id"),
          coalesce(col("click"), lit(0L)).as("click"),
          coalesce(col("view"), lit(0L)).as("view"),
          coalesce(col("purchase"), lit(0L)).as("purchase"),
          coalesce(col("signup"), lit(0L)).as("signup"),
          coalesce(col("error"), lit(0L)).as("error"))
        .orderBy(col("user_id")))
  )

  val oracleSql: Map[String, String] = Map(
    "scan_parquet" ->
      "SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer ORDER BY c_custkey",

    "scan_events_ns" ->
      "SELECT event_id, ts, user_id, event_type, value, props FROM events ORDER BY event_id",

    "scan_json_props" ->
      "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k2 FROM events ORDER BY event_id",

    "scan_json_variant" ->
      ("SELECT event_type, count(*) AS n, " +
        "CAST(sum(k) AS BIGINT) AS sum_k, min(k) AS min_k, max(k) AS max_k " +
        "FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k " +
        "FROM events) GROUP BY event_type ORDER BY event_type"),

    "project_filter" ->
      "SELECT l_orderkey, l_linenumber, floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) / 100.0 AS revenue FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_discount > 0.05 ORDER BY l_orderkey, l_linenumber",

    "predicate_in_like" ->
      "SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice FROM orders WHERE o_orderstatus IN ('F','O') AND o_orderpriority LIKE '%URGENT%' AND o_totalprice BETWEEN 50000.0 AND 300000.0 AND (o_orderstatus IS NOT DISTINCT FROM 'F' OR o_orderstatus IS NOT DISTINCT FROM 'O') ORDER BY o_orderkey",

    "conditional" ->
      "SELECT CASE WHEN o_totalprice < 50000.0 THEN 'small' WHEN o_totalprice < 150000.0 THEN 'medium' ELSE 'large' END AS bucket, count(*) AS n, round(sum(o_totalprice), 2) AS total FROM orders GROUP BY 1 ORDER BY bucket",

    "join_broadcast" ->
      "SELECT p_brand, count(*) AS n_items, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY p_brand ORDER BY p_brand",

    "join_shuffle" ->
      "SELECT o_orderpriority, count(*) AS n, round(sum(l_quantity), 2) AS qty FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY o_orderpriority ORDER BY o_orderpriority",

    "join_multiway" ->
      "SELECT n_name, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON o_orderkey = l_orderkey JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1999-01-01' GROUP BY n_name ORDER BY n_name",

    "join_outer_left" ->
      "SELECT c_custkey, c_name, count(o_orderkey) AS n_orders, round(coalesce(sum(o_totalprice), 0.0), 2) AS total FROM customer LEFT JOIN orders ON o_custkey = c_custkey GROUP BY c_custkey, c_name ORDER BY c_custkey",

    "join_outer_full" ->
      "SELECT coalesce(o.k, e.k2) AS id, o.order_total, e.event_total FROM (SELECT o_custkey AS k, round(sum(o_totalprice), 2) AS order_total FROM orders GROUP BY 1) o FULL JOIN (SELECT user_id AS k2, round(sum(value), 2) AS event_total FROM events GROUP BY 1) e ON o.k = e.k2 ORDER BY id",

    "join_semi_anti" ->
      "SELECT * FROM (SELECT 'with_orders' AS tag, count(*) AS n FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) UNION ALL SELECT 'without_orders' AS tag, count(*) AS n FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) ORDER BY tag",

    "agg_groupby" ->
      "SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, round(sum(l_extendedprice), 2) AS sum_base, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc, round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_charge, round(avg(l_quantity), 4) AS avg_qty, round(avg(l_extendedprice), 4) AS avg_price, round(avg(l_discount), 6) AS avg_disc, count(*) AS n FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01' GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus",

    "agg_distinct" ->
      "SELECT event_type, count(DISTINCT user_id) AS uniq_users, count(*) AS n FROM events GROUP BY event_type ORDER BY event_type",

    "agg_approx_distinct" ->
      "SELECT event_type, count(DISTINCT user_id) AS exact_users, count(*) AS n, true AS approx_ok FROM events GROUP BY event_type ORDER BY event_type",

    "agg_sketch_reaggregate" ->
      ("SELECT event_type, count(DISTINCT user_id) AS exact_users, " +
        "count(DISTINCT CAST(ts AS DATE)) AS n_days, true AS sketch_ok " +
        "FROM events GROUP BY event_type ORDER BY event_type"),

    // bitmap twin: true count-distinct BY VALUE — the bitmap mechanism
    // must reproduce exact distincts, daily and merged, or the hash fails.
    "agg_bitmap_distinct" ->
      ("WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, " +
        "count(DISTINCT user_id) AS du FROM events GROUP BY 1, 2) " +
        "SELECT event_type, n_days, sum_daily, n_distinct FROM " +
        "(SELECT event_type, count(*) AS n_days, " +
        "CAST(sum(du) AS BIGINT) AS sum_daily FROM d GROUP BY 1) " +
        "JOIN (SELECT event_type, count(DISTINCT user_id) AS n_distinct " +
        "FROM events GROUP BY 1) USING (event_type) ORDER BY event_type"),

    // sparse-bitmap twin: container census + storage arithmetic BY VALUE
    // (count DISTINCT per 2^16 block) — the mechanism (bit_or words per
    // container) must reproduce exact per-container cardinalities and the
    // Roaring min(2·card, 8192) encoding choice, or the hash fails.
    "agg_bitmap_distinct_sparse" ->
      ("WITH c AS (SELECT event_type, user_id // 65536 AS container, " +
        "count(DISTINCT user_id) AS card FROM events GROUP BY 1, 2), " +
        "sp AS (SELECT event_type, (max(user_id) // 64) * 8 + 8 " +
        "AS bytes_dense_span FROM events GROUP BY 1) " +
        "SELECT event_type, CAST(sum(card) AS BIGINT) AS n_distinct, " +
        "count(*) AS n_containers, " +
        "CAST(sum(CASE WHEN card <= 4096 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_array_containers, " +
        "CAST(sum(least(2 * card, 8192)) AS BIGINT) AS bytes_roaring, " +
        "CAST(bytes_dense_span AS BIGINT) AS bytes_dense_span " +
        "FROM c JOIN sp USING (event_type) " +
        "GROUP BY event_type, bytes_dense_span ORDER BY event_type"),

    // corr twin: HUGEINT mirrors the DECIMAL(38,0) exact sums; the six
    // SELECTs enumerate corrPairs in the same sorted order.
    "agg_corr_matrix" -> {
      val aliases = Relational.corrCols.map(_._2)
      val names = Relational.corrCols.map(_._1)
      def dbl(c: String) = s"CAST($c AS DOUBLE)"
      def varTerm(a: String) =
        s"(${dbl("n")} * ${dbl(s"s_${a}_$a")} - ${dbl(s"s_$a")} * ${dbl(s"s_$a")})"
      val sc = Relational.corrCols.map { case (c, a) =>
        s"CAST(CAST(floor($c * 100 + 0.5) AS BIGINT) AS HUGEINT) AS $a"
      }.mkString(", ")
      val sums = (aliases.map(a => s"sum($a) AS s_$a") ++
        Relational.corrPairs(aliases).map { case (a, b) =>
          s"sum($a * $b) AS s_${a}_$b" } ++
        aliases.map(a => s"sum($a * $a) AS s_${a}_$a")).mkString(", ")
      val selects = Relational.corrPairs(aliases)
        .zip(Relational.corrPairs(names)).map { case ((a, b), (na, nb)) =>
          s"SELECT '$na' AS col_a, '$nb' AS col_b, floor((" +
            s"(${dbl("n")} * ${dbl(s"s_${a}_$b")} - ${dbl(s"s_$a")} * ${dbl(s"s_$b")}) " +
            s"/ (sqrt(${varTerm(a)}) * sqrt(${varTerm(b)}))" +
            ") * 1000000 + 0.5) / 1000000 AS corr FROM st"
        }.mkString(" UNION ALL ")
      s"WITH sc AS (SELECT $sc FROM lineitem), " +
        s"st AS (SELECT CAST(count(*) AS HUGEINT) AS n, $sums FROM sc) " +
        s"$selects ORDER BY col_a, col_b"
    },

    // Replays the OLS sufficient-statistics pass with HUGEINT accumulators
    // and the identical closed-form double arithmetic.
    "agg_linreg" -> {
      def dbl(c: String) = s"CAST($c AS DOUBLE)"
      val det = s"(${dbl("n")} * ${dbl("sxx")} - ${dbl("sx")} * ${dbl("sx")})"
      val cov = s"(${dbl("n")} * ${dbl("sxy")} - ${dbl("sx")} * ${dbl("sy")})"
      val vy = s"(${dbl("n")} * ${dbl("syy")} - ${dbl("sy")} * ${dbl("sy")})"
      "WITH sc AS (SELECT l_returnflag AS flag, " +
        "CAST(CAST(l_quantity AS BIGINT) AS HUGEINT) AS x, " +
        "CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS HUGEINT) " +
        "AS y FROM lineitem), " +
        "st AS (SELECT flag, CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx, " +
        "sum(y) AS sy, sum(x * x) AS sxx, sum(x * y) AS sxy, " +
        "sum(y * y) AS syy FROM sc GROUP BY flag) " +
        "SELECT flag, CAST(n AS BIGINT) AS n, " +
        s"floor($cov / $det * 1000000 + 0.5) / 1000000 AS slope_cents, " +
        s"floor((${dbl("sy")} * ${dbl("sxx")} - ${dbl("sx")} * ${dbl("sxy")}) " +
        s"/ $det * 1000000 + 0.5) / 1000000 AS intercept_cents, " +
        s"floor($cov * $cov / ($det * $vy) * 1000000 + 0.5) / 1000000 AS r2 " +
        "FROM st ORDER BY flag"
    },

    // quantile twin: bins GLOBALLY (no per-day partial level) — equality
    // with Spark's partial-merge path is the mergeability proof.
    "agg_quantile_partials" ->
      ("WITH ext AS (SELECT min(value) AS vmin, max(value) AS vmax FROM events), " +
        "binned AS (SELECT least(CAST(floor((value - vmin) / (vmax - vmin) * 256) " +
        "AS BIGINT), 255) AS bin FROM events, ext), " +
        "merged AS (SELECT bin, count(*) AS cnt FROM binned GROUP BY bin), " +
        "cum AS (SELECT a.bin AS bin, CAST(sum(b.cnt) AS BIGINT) AS cum " +
        "FROM merged a JOIN merged b ON b.bin <= a.bin GROUP BY a.bin), " +
        "tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM events), " +
        "pcts(pct) AS (VALUES (50), (95), (99)), " +
        "sel AS (SELECT pct, min(bin) AS bin FROM pcts, cum, tot " +
        "WHERE cum * 100 >= pct * n GROUP BY pct) " +
        "SELECT CAST(pct AS BIGINT) AS pct, bin, " +
        "floor((vmin + (bin + 0.5) * (vmax - vmin) / 256) * 1000000 + 0.5) " +
        "/ 1000000 AS est_value FROM sel, ext ORDER BY pct"),

    // KLL twin: the oracle cannot replay a randomized sketch — it pins
    // the CONTRACT instead (count and the always-true rank bound).
    "agg_quantile_kll" ->
      ("WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM events), " +
        "p(pct) AS (VALUES (50), (95), (99)) " +
        "SELECT CAST(pct AS BIGINT) AS pct, n, " +
        "CAST(1 AS BIGINT) AS within_bound FROM p, n ORDER BY pct"),

    "agg_tumbling_hour" ->
      "SELECT time_bucket(INTERVAL 1 HOUR, ts) AS w_start, event_type, count(*) AS n, round(sum(value), 2) AS sum_value FROM events GROUP BY 1, 2 ORDER BY w_start, event_type",

    "agg_salted_skew" ->
      "SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value FROM events GROUP BY event_type ORDER BY event_type",

    "sql_subquery_scalar" ->
      "SELECT event_id, event_type, value FROM events WHERE value > (SELECT avg(value) FROM events) ORDER BY event_id",

    "sql_subquery_correlated" ->
      "SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price FROM orders o WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders i WHERE i.o_custkey = o.o_custkey) ORDER BY o_orderkey",

    "sql_lateral_topk" ->
      ("SELECT n.n_name, t.c_custkey, round(t.c_acctbal, 2) AS acctbal " +
        "FROM nation n, LATERAL (SELECT c_custkey, c_acctbal " +
        "FROM customer c WHERE c.c_nationkey = n.n_nationkey " +
        "ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t " +
        "ORDER BY n.n_name, acctbal DESC, t.c_custkey"),

    "sql_unpivot_measures" ->
      ("SELECT l_returnflag, measure, count(*) AS n, " +
        "round(sum(v), 2) AS sum_value FROM lineitem " +
        "UNPIVOT (v FOR measure IN " +
        "(l_quantity, l_extendedprice, l_discount, l_tax)) " +
        "GROUP BY l_returnflag, measure ORDER BY l_returnflag, measure"),

    "sql_subquery_exists_chain" ->
      ("SELECT o_orderpriority, count(*) AS n_orders FROM orders o " +
        "WHERE EXISTS (SELECT 1 FROM lineitem l " +
        "WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R') " +
        "AND NOT EXISTS (SELECT 1 FROM lineitem l " +
        "WHERE l.l_orderkey = o.o_orderkey " +
        "AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY) " +
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"),

    "agg_histogram" ->
      "SELECT bucket, count(*) AS n, round(avg(value), 4) AS avg_value FROM (SELECT CASE WHEN value < 0 THEN 0 WHEN value >= 1000 THEN 21 ELSE CAST(floor(value / 50.0) AS BIGINT) + 1 END AS bucket, value FROM events) GROUP BY bucket ORDER BY bucket",

    "agg_mode" ->
      ("SELECT event_type, mode_value, n_mode FROM " +
        "(SELECT event_type, v AS mode_value, cnt AS n_mode, " +
        "row_number() OVER (PARTITION BY event_type " +
        "ORDER BY cnt DESC, v) AS rk FROM " +
        "(SELECT event_type, CAST(floor(value) AS BIGINT) AS v, " +
        "count(*) AS cnt FROM events GROUP BY 1, 2)) " +
        "WHERE rk = 1 ORDER BY event_type"),

    "agg_session_windows" ->
      "SELECT min(ts) AS s_start, max(ts) + INTERVAL 30 MINUTE AS s_end, user_id, count(*) AS n FROM (SELECT user_id, ts, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess FROM (SELECT user_id, ts, event_id, CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL OR ts > lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new FROM events)) GROUP BY user_id, sess ORDER BY user_id, s_start",

    "typed_dataset_fees" ->
      "SELECT event_type, count(*) AS n, round(sum(CASE WHEN event_type = 'purchase' THEN value * 0.02 ELSE 0.5 END), 2) AS total_fee FROM events WHERE value > 100.0 GROUP BY event_type ORDER BY event_type",

    "agg_grouping_sets" ->
      "SELECT coalesce(event_type, 'ALL') AS etype, coalesce(hr, -1) AS hr, count(*) AS n, round(sum(value), 2) AS sum_value FROM (SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr, value FROM events) GROUP BY GROUPING SETS ((event_type), (hr), ()) ORDER BY etype, hr",

    "window_range_frame" ->
      "SELECT o_orderkey, o_custkey, o_orderdate, round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate) RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW), 2) AS wk_total FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey",

    "pivot_events" ->
      "SELECT user_id, count(*) FILTER (event_type = 'click') AS click, count(*) FILTER (event_type = 'view') AS view, count(*) FILTER (event_type = 'purchase') AS purchase, count(*) FILTER (event_type = 'signup') AS signup, count(*) FILTER (event_type = 'error') AS error FROM events GROUP BY user_id ORDER BY user_id",

    "agg_rollup" ->
      "SELECT coalesce(event_type, 'ALL') AS etype, coalesce(hour(ts), -1) AS hr, count(*) AS n, round(sum(value), 2) AS sum_value FROM events GROUP BY ROLLUP(event_type, hour(ts)) ORDER BY etype, hr",

    "agg_cube" ->
      "SELECT coalesce(event_type, 'ALL') AS etype, coalesce(dayofweek(ts) + 1, -1) AS dow, count(*) AS n FROM events GROUP BY CUBE(event_type, dayofweek(ts) + 1) ORDER BY etype, dow",

    "agg_having_top" ->
      "SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value FROM events GROUP BY event_type HAVING count(*) > 100 ORDER BY n DESC, event_type LIMIT 3",

    "agg_stats" ->
      "SELECT event_type, round(min(value), 2) AS mn, round(max(value), 2) AS mx, round(avg(value), 4) AS av, round(stddev_samp(value), 4) AS sd, round(quantile_cont(value, 0.5), 4) AS p50, round(quantile_cont(value, 0.9), 4) AS p90 FROM events GROUP BY event_type ORDER BY event_type",

    "sort_multi" ->
      "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders ORDER BY o_orderstatus DESC NULLS LAST, o_totalprice DESC NULLS LAST, o_orderkey ASC",

    "topk_global" ->
      "SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100",

    "set_ops" ->
      "SELECT * FROM (SELECT 'click_only' AS tag, user_id FROM (SELECT DISTINCT user_id FROM events WHERE event_type = 'click' EXCEPT SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase') UNION ALL SELECT 'click_and_purchase' AS tag, user_id FROM (SELECT DISTINCT user_id FROM events WHERE event_type = 'click' INTERSECT SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')) ORDER BY tag, user_id"
  )
}
