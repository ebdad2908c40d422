package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph analytics over the corpus's tag co-occurrence graph — the
  * hashtag-influence shape at the heart of the Twitter-analytics workload
  * class (SURVEY.md §0: which tags matter, not just which are frequent).
  * Nodes are extracted tags (the `text_extract_tags` pattern), edges are
  * same-document co-occurrence weighted by document count, and the rank is
  * weighted PageRank with damping 0.85.
  *
  * Determinism discipline (the Lloyd's-loop rule from similarity_ivf):
  * every rank generation is rounded floor(x·1e6 + 0.5)/1e6 BEFORE feeding
  * the next iteration, so both engines iterate over identical inputs and
  * the DuckDB twin replays the exact generations as unrolled CTEs. The
  * iteration count is fixed (3) rather than convergence-probed for the
  * same reason — the oracle needs a closed form.
  *
  * Scale shape (100 TB): tags per doc is small and bounded (hashtags per
  * tweet), so the per-doc self-join is O(k²) with tiny k — map-heavy, one
  * shuffle on (src, dst) to aggregate edge weights. The node and edge
  * tables are vocabulary-sized (sub-linear in corpus); each PageRank round
  * is ONE hash join (rank × normalized edges) + ONE aggregation on dst —
  * the same bounded-driver-loop shape as labelPropagation, with no driver
  * action at all here (fixed rounds ⇒ the loop just stacks three join+agg
  * layers onto the plan, well under lineage-truncation depth). Dangling
  * mass is NOT redistributed (the standard "leaky" variant): isolated
  * tags hold the (1−d)/N floor, and total rank < 1 is expected.
  */
object GraphOps {
  type Q = (SparkSession, String) => DataFrame

  private val iterations = 3

  val queries: Map[String, Q] = Map(
    "graph_pagerank" -> ((s, d) => {
      val tags = Tables.documents(s, d)
        .select(col("doc_id"), explode(array_distinct(
          expr("regexp_extract_all(text, '\\\\w{6,}', 0)"))).as("tag"))
      val half = tags.as("a").join(tags.as("b"),
          col("a.doc_id") === col("b.doc_id") && col("a.tag") < col("b.tag"))
        .groupBy(col("a.tag").as("src"), col("b.tag").as("dst"))
        .agg(count(lit(1)).as("w"))
      val edges = half.union(half.select(col("dst"), col("src"), col("w")))
      val wdeg = edges.groupBy(col("src")).agg(sum(col("w")).as("wdeg"))
      // normalized once, outside the loop: each round then costs exactly
      // one join + one agg over this table
      val nedges = edges.join(wdeg, "src")
        .select(col("src"), col("dst"),
          (col("w").cast("double") / col("wdeg").cast("double")).as("nw"))
      val nodes = tags.select(col("tag")).distinct()
      val nTbl = nodes.agg(count(lit(1)).as("n"))
      var r = nodes.crossJoin(broadcast(nTbl))
        .select(col("tag"),
          expr("floor(1.0D / n * 1000000D + 0.5D) / 1000000D").as("score"))
      for (_ <- 1 to iterations) {
        val contrib = nedges
          .join(r.select(col("tag").as("src"), col("score")), "src")
          .groupBy(col("dst").as("tag"))
          .agg(sum(col("score") * col("nw")).as("c"))
        r = nodes.join(contrib, Seq("tag"), "left")
          .crossJoin(broadcast(nTbl))
          .select(col("tag"),
            expr("floor((0.15D / n + 0.85D * coalesce(c, 0.0D)) * 1000000D + 0.5D) " +
              "/ 1000000D").as("score"))
      }
      r.orderBy(col("score").desc, col("tag"))
    }),

    // Triangle participation count per tag — the clustering-coefficient
    // numerator, the other classic graph measure over the co-occurrence
    // graph (pagerank ranks reach; triangles measure community density).
    //
    // Algorithm: orient every edge small-id → large-id, so each triangle
    // {a < b < c} exists exactly once as the wedge (a→b, b→c) closed by
    // the oriented edge (a→c) — two equi-joins, no double counting, no
    // direction bookkeeping. Scale: orientation alone already bounds the
    // wedge join to ordered pairs; production further orients by DEGREE
    // (low→high, tie on id), which caps every out-neighborhood at
    // O(sqrt(2m)) and tames power-law hubs — same plan shape, one extra
    // broadcast of the degree table; id-orientation keeps the oracle twin
    // trivially identical on the bounded fixture vocabulary. The closing
    // join's build side is the (skinny) oriented edge list itself.
    "graph_triangles" -> ((s, d) => {
      val tags = Tables.documents(s, d)
        .select(col("doc_id"), explode(array_distinct(
          expr("regexp_extract_all(text, '\\\\w{6,}', 0)"))).as("tag"))
        .distinct()
      val e = tags.as("a").join(tags.as("b"),
          col("a.doc_id") === col("b.doc_id") && col("a.tag") < col("b.tag"))
        .select(col("a.tag").as("u"), col("b.tag").as("v"))
        .distinct()
      val tri = e.as("e1")
        .join(e.as("e2"), col("e1.v") === col("e2.u"))
        .select(col("e1.u").as("x"), col("e1.v").as("y"), col("e2.v").as("z"))
        .join(e.as("e3"),
          col("x") === col("e3.u") && col("z") === col("e3.v"))
        .select(col("x"), col("y"), col("z"))
      tri.select(explode(array(col("x"), col("y"), col("z"))).as("tag"))
        .groupBy(col("tag"))
        .agg(count(lit(1)).as("n_triangles"))
        .orderBy(col("n_triangles").desc, col("tag"))
    }),

    // Market-basket association mining over order line items — the
    // co-occurrence family's RETAIL instance (tags → pagerank/triangles;
    // parts → basket rules): top part pairs by support with confidence
    // and lift, the three numbers every recommender bootstrap reads.
    // Shape: per-basket pair fan-out is C(items, 2) with items ≤ 13
    // (bounded basket width — the same small-k argument as the tag
    // self-join), so pair generation is map-heavy with ONE shuffle on
    // the pair key; item frequencies are a vocabulary-sized agg that
    // broadcasts. Ratios derive from exact integer counts with one
    // division each (identical expression trees both engines) — conf =
    // sup/f1, lift = sup·N/(f1·f2) — floor-rounded to 1e-6.
    "orders_basket_pairs" -> ((s, d) => {
      val b = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val nb = b.select(col("l_orderkey")).distinct()
        .agg(count(lit(1)).as("n_baskets"))
      val pf = b.groupBy(col("l_partkey")).agg(count(lit(1)).as("f"))
      b.as("a").join(b.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("p1"), col("b.l_partkey").as("p2"))
        .agg(count(lit(1)).as("sup"))
        .filter(col("sup") >= 2)
        .join(broadcast(pf.select(col("l_partkey").as("p1"), col("f").as("f1"))), "p1")
        .join(broadcast(pf.select(col("l_partkey").as("p2"), col("f").as("f2"))), "p2")
        .crossJoin(broadcast(nb))
        .select(col("p1"), col("p2"), col("sup"),
          expr("floor(sup / CAST(f1 AS DOUBLE) * 1000000D + 0.5D) / 1000000D")
            .as("confidence"),
          expr("floor(sup * n_baskets / (CAST(f1 AS DOUBLE) * f2) " +
            "* 1000000D + 0.5D) / 1000000D").as("lift"))
        .orderBy(col("sup").desc, col("p1"), col("p2"))
        .limit(20)
    }),

    // RFM segmentation — the classic customer-value partitioning a
    // marketing/analytics warehouse derives from an order log: per
    // customer recency (days since last order, against the log's max
    // date), frequency (order count), monetary (lifetime spend in exact
    // integer cents), each cut at its observed quartiles into 4 bands,
    // concatenated into a 3-digit segment code (111 = most recent / most
    // frequent / highest spend … 444). Quartile boundaries come from
    // exact `percentile` interpolation over integer profiles: quarter
    // fractions are exact binary doubles, so the band comparisons have NO
    // rounding boundary on either engine.
    //
    // Scale shape: one customer-keyed hash agg builds profiles; the
    // boundary agg reduces to ONE 9-number row that broadcasts back; band
    // assignment is map-only CASE arithmetic; the final segment agg is
    // 64-ary. No window functions at all — a global ntile would be a
    // single-task sort at scale (the suite-wide guard).
    // Benford's-law conformance audit on order totals — the forensic
    // data-quality screen for fabricated or systematically generated
    // monetary data: natural multi-scale amounts put digit d first with
    // probability log10(1 + 1/d); a synthetic generator usually doesn't.
    // First digits come from exact integer cents via string truncation
    // (no log10 on the hot path — identical on both engines), expected
    // shares are 6-dp literals, and χ² = N·Σ(p−q)²/q is flagged at the
    // df=8, α=0.05 critical value 15.507. The fixture's uniform-ish
    // synthetic prices SHOULD reject — the audit detecting that this
    // corpus is generated is the correct answer, and the golden law
    // pins the arithmetic either way.
    //
    // Scale shape: map-only digit extraction, a 9-ary hash agg, and
    // broadcast scalars — one corpus pass.
    "orders_benford" -> ((s, d) => {
      val q = "CASE digit WHEN 1 THEN 0.301030D WHEN 2 THEN 0.176091D " +
        "WHEN 3 THEN 0.124939D WHEN 4 THEN 0.096910D WHEN 5 THEN 0.079181D " +
        "WHEN 6 THEN 0.066947D WHEN 7 THEN 0.057992D WHEN 8 THEN 0.051153D " +
        "ELSE 0.045757D END"
      val counts = Tables.orders(s, d)
        .select(expr("CAST(substring(CAST(CAST(floor(o_totalprice * 100D " +
          "+ 0.5D) AS BIGINT) AS STRING), 1, 1) AS BIGINT)").as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
        .cache() // 9 rows, read by three branches — one corpus pass total
      val rows = counts.agg(sum(col("n_obs")).as("n_total"))
        .select(col("n_total"), explode(expr("sequence(1L, 9L)")).as("digit"))
        .join(counts, Seq("digit"), "left").na.fill(0L, Seq("n_obs"))
        .withColumn("contrib", expr(
          s"(n_obs / CAST(n_total AS DOUBLE) - ($q)) * " +
            s"(n_obs / CAST(n_total AS DOUBLE) - ($q)) / ($q)"))
      val chi2 = rows.groupBy(col("n_total")).agg(sum(col("contrib")).as("sc"))
        .select(expr("floor(n_total * sc * 1000000D + 0.5D) / 1000000D")
          .as("chi2"))
      rows.crossJoin(broadcast(chi2))
        .select(col("digit"), col("n_obs"),
          expr("floor(n_obs / CAST(n_total AS DOUBLE) * 1000000D + 0.5D) " +
            "/ 1000000D").as("p_obs"),
          expr(s"$q").as("q_benford"),
          col("chi2"), (col("chi2") > 15.507).cast("long").as("reject_benford"))
        .orderBy(col("digit"))
    }),

    "orders_rfm_segments" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val dmax = o.agg(max(col("o_orderdate")).as("dmax"))
      val prof = o.groupBy(col("o_custkey"))
        .agg(max(col("o_orderdate")).as("last_order"),
          count(lit(1)).as("freq"),
          sum(expr("CAST(floor(o_totalprice * 100D + 0.5D) AS BIGINT)"))
            .as("cents"))
        .crossJoin(broadcast(dmax))
        .select(col("o_custkey"),
          expr("CAST(datediff(dmax, last_order) AS BIGINT)").as("rec"),
          col("freq"), col("cents"))
      val qs = prof.agg(
        expr("percentile(rec, array(0.25D, 0.5D, 0.75D))").as("rq"),
        expr("percentile(freq, array(0.25D, 0.5D, 0.75D))").as("fq"),
        expr("percentile(cents, array(0.25D, 0.5D, 0.75D))").as("mq"))
      def band(v: String, q: String, rev: Boolean) = {
        // recency: SMALL is good → band 1; freq/monetary: LARGE is good
        val o123 = s"WHEN $v <= $q[0] THEN 1 WHEN $v <= $q[1] THEN 2 " +
          s"WHEN $v <= $q[2] THEN 3 ELSE 4"
        val o432 = s"WHEN $v <= $q[0] THEN 4 WHEN $v <= $q[1] THEN 3 " +
          s"WHEN $v <= $q[2] THEN 2 ELSE 1"
        s"CASE ${if (rev) o432 else o123} END"
      }
      prof.crossJoin(broadcast(qs))
        .select(col("cents"),
          expr(s"${band("rec", "rq", rev = false)} * 100L + " +
            s"${band("freq", "fq", rev = true)} * 10L + " +
            s"${band("cents", "mq", rev = true)}").as("segment"))
        .groupBy(col("segment"))
        .agg(count(lit(1)).as("n_customers"), sum(col("cents")).as("total_cents"))
        .orderBy(col("segment"))
    }),

    // Cohort lifetime value — the revenue companion to
    // events_retention_cohort: customers grouped by first-order month,
    // revenue accumulated per month offset, reported as cumulative LTV
    // per cohort customer. Exact-integer discipline throughout: revenue
    // in BIGINT cents, months as y·12+m integers, per-customer LTV via
    // integer division — doubles appear only in the display
    // divide-by-100 (exact for cents < 2^53).
    //
    // Scale shape: one per-customer hash agg for cohort assignment, one
    // corpus-keyed join back on the customer key (both shuffle on
    // o_custkey — AQE coalesces), one (cohort, offset) hash agg; the
    // cumulative window and the size join run over the months²-bounded
    // MODEL table with a months-bounded broadcast. Nothing collects.
    "orders_cohort_ltv" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_custkey"),
        (year(col("o_orderdate")).cast("long") * 12L +
          month(col("o_orderdate")).cast("long")).as("m"),
        expr("CAST(floor(o_totalprice * 100D + 0.5D) AS BIGINT)")
          .as("cents"))
      val cohort = o.groupBy(col("o_custkey")).agg(min(col("m")).as("cm"))
      val sizes = cohort.groupBy(col("cm"))
        .agg(count(lit(1)).as("cohort_size"))
      val cells = o.join(cohort, "o_custkey")
        .groupBy(col("cm"), (col("m") - col("cm")).as("month_offset"))
        .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("rev_cents"))
      val w = Window.partitionBy(col("cm")).orderBy(col("month_offset"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cells.join(broadcast(sizes), "cm")
        .withColumn("cum_cents", sum(col("rev_cents")).over(w))
        .select(expr("(cm - 1L) DIV 12L").as("cohort_year"),
          expr("cm - 12L * ((cm - 1L) DIV 12L)").as("cohort_month"),
          col("month_offset"), col("cohort_size"), col("n_orders"),
          expr("rev_cents / 100.0D").as("revenue"),
          expr("(cum_cents DIV cohort_size) / 100.0D")
            .as("ltv_per_customer"))
        .orderBy(col("cohort_year"), col("cohort_month"),
          col("month_offset"))
    }),

    // Co-visitation similarity between event types — the item-item edge
    // weights of a "users who did X also did Y" recommender, as Jaccard
    // over audience sets: |users(a) ∩ users(b)| / |users(a) ∪ users(b)|.
    // Shape: DISTINCT (type, user) first (two-phase hash agg), then a
    // self-join KEYED ON user_id — per-user fan-out is C(T,2) with T the
    // type-set size a user can touch (the catalog cardinality, not data
    // volume), so the join output is bounded at any scale; audience
    // sizes broadcast back (types-sized). The union count is derived
    // from the exact integer identity |A∪B| = f1 + f2 − inter rather
    // than a third aggregation.
    "graph_covisit_jaccard" -> ((s, d) => {
      val tu = Tables.events(s, d)
        .select(col("event_type"), col("user_id")).distinct()
      val f = tu.groupBy(col("event_type")).agg(count(lit(1)).as("f"))
      tu.as("a").join(tu.as("b"),
          col("a.user_id") === col("b.user_id") &&
            col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("t1"), col("b.event_type").as("t2"))
        .agg(count(lit(1)).as("inter"))
        .join(broadcast(f.select(col("event_type").as("t1"),
          col("f").as("f1"))), "t1")
        .join(broadcast(f.select(col("event_type").as("t2"),
          col("f").as("f2"))), "t2")
        .select(col("t1"), col("t2"), col("inter"), col("f1"), col("f2"),
          expr("floor(inter / CAST(f1 + f2 - inter AS DOUBLE) " +
            "* 1000000D + 0.5D) / 1000000D").as("jaccard"))
        .orderBy(col("t1"), col("t2"))
    }),

    // Revenue-concentration (Pareto/80-20) audit: how few customers carry
    // 80% of lifetime revenue. k80 = the minimal top-spender count whose
    // cumulative revenue reaches 80% of the total; one row out with the
    // customer share and the exact revenue share AT that customer.
    //
    // Scale shape: revenue is exact BIGINT cents per customer (the RFM
    // discipline); the descending cumulative runs as the TWO-LEVEL
    // distributed prefix sum (the curation_token_budget form, blocked on
    // cents DIV — monotone in the sort order, so block offsets are a
    // 256-row theta-join, and the only windows partition BY BLOCK), never
    // a global-ORDER-BY window. The 80% boundary is located with pure
    // integer arithmetic (5·cum vs 4·total) — no FP boundary to flip.
    "orders_pareto_8020" -> ((s, d) => {
      val pc = Tables.orders(s, d)
        .select(col("o_custkey"),
          expr("CAST(floor(o_totalprice * 100D + 0.5D) AS BIGINT)").as("oc"))
        .groupBy(col("o_custkey")).agg(sum(col("oc")).as("cents"))
      val bounds = pc.agg(max(col("cents")).as("maxc"))
      val w = Window.partitionBy(col("blk"))
        .orderBy(col("cents").desc, col("o_custkey"))
      val blocked = pc.crossJoin(broadcast(bounds))
        .withColumn("blk", expr("cents DIV (maxc DIV 256L + 1L)"))
        .withColumn("run", sum(col("cents")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val parts = blocked.groupBy(col("blk"))
        .agg(sum(col("cents")).as("bc"), count(lit(1)).as("bn"))
      val offsets = parts.as("a") // richer blocks (higher blk) come first
        .join(parts.as("b"), col("b.blk") > col("a.blk"), "left")
        .groupBy(col("a.blk").as("blk"))
        .agg(coalesce(sum(col("b.bc")), lit(0L)).as("coff"))
      val tot = pc.agg(sum(col("cents")).as("total"),
        count(lit(1)).as("n"))
      blocked.join(broadcast(offsets), "blk")
        .withColumn("cum", col("coff") + col("run"))
        .crossJoin(broadcast(tot))
        .agg(max(col("n")).as("n_customers"),
          sum(when(expr("5L * cum < 4L * total"), 1L).otherwise(0L))
            .as("below80"),
          min(when(expr("5L * cum >= 4L * total"), col("cum"))).as("rev80"),
          max(col("total")).as("total"))
        .select(col("n_customers"),
          (col("below80") + 1L).as("k80"),
          expr("floor((below80 + 1L) / CAST(n_customers AS DOUBLE) " +
            "* 1000000D + 0.5D) / 1000000D").as("cust_share"),
          expr("floor(rev80 / CAST(total AS DOUBLE) * 1000000D + 0.5D) " +
            "/ 1000000D").as("rev_share"))
    })
  )

  /** Unrolled-generation twin: r0 → r1 → … — one CTE per Spark iteration,
    * identical rounding, so the hash check covers the ITERATION mechanism,
    * not just the final presentation. */
  private def duckPagerank: String = {
    def gen(i: Int): String =
      s"r$i AS (SELECT nodes.tag, floor((0.15 / n + 0.85 * coalesce(c, 0.0)) " +
        "* 1000000 + 0.5) / 1000000 AS score FROM nodes " +
        s"LEFT JOIN (SELECT dst AS tag, sum(score * nw) AS c FROM ne " +
        s"JOIN r${i - 1} r ON r.tag = ne.src GROUP BY dst) q USING (tag) " +
        "CROSS JOIN n)"
    "WITH tags AS (SELECT DISTINCT doc_id, tag FROM (SELECT doc_id, " +
      "unnest(regexp_extract_all(text, '\\w{6,}')) AS tag FROM documents)), " +
      "half AS (SELECT a.tag AS src, b.tag AS dst, count(*) AS w FROM tags a " +
      "JOIN tags b ON a.doc_id = b.doc_id AND a.tag < b.tag GROUP BY 1, 2), " +
      "edges AS (SELECT src, dst, w FROM half " +
      "UNION ALL SELECT dst, src, w FROM half), " +
      "wdeg AS (SELECT src, sum(w) AS wdeg FROM edges GROUP BY src), " +
      "ne AS (SELECT src, dst, CAST(w AS DOUBLE) / CAST(wdeg AS DOUBLE) AS nw " +
      "FROM edges JOIN wdeg USING (src)), " +
      "nodes AS (SELECT DISTINCT tag FROM tags), " +
      "n AS (SELECT count(*) AS n FROM nodes), " +
      "r0 AS (SELECT tag, floor(1.0 / n * 1000000 + 0.5) / 1000000 AS score " +
      "FROM nodes CROSS JOIN n), " +
      (1 to iterations).map(gen).mkString(", ") +
      s" SELECT tag, score FROM r$iterations ORDER BY score DESC, tag"
  }

  val oracleSql: Map[String, String] = Map(
    "graph_pagerank" -> duckPagerank,

    "graph_triangles" ->
      ("WITH tags AS (SELECT DISTINCT doc_id, tag FROM (SELECT doc_id, " +
        "unnest(regexp_extract_all(text, '\\w{6,}')) AS tag FROM documents)), " +
        "e AS (SELECT DISTINCT a.tag AS u, b.tag AS v FROM tags a " +
        "JOIN tags b ON a.doc_id = b.doc_id AND a.tag < b.tag), " +
        "tri AS (SELECT e1.u AS x, e1.v AS y, e2.v AS z FROM e e1 " +
        "JOIN e e2 ON e1.v = e2.u " +
        "JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v) " +
        "SELECT tag, count(*) AS n_triangles FROM (" +
        "SELECT x AS tag FROM tri UNION ALL SELECT y FROM tri " +
        "UNION ALL SELECT z FROM tri) " +
        "GROUP BY tag ORDER BY n_triangles DESC, tag"),

    "orders_basket_pairs" ->
      ("WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), " +
        "nb AS (SELECT count(DISTINCT l_orderkey) AS n_baskets FROM b), " +
        "pf AS (SELECT l_partkey, count(*) AS f FROM b GROUP BY 1), " +
        "pairs AS (SELECT a.l_partkey AS p1, b2.l_partkey AS p2, " +
        "count(*) AS sup FROM b a JOIN b b2 " +
        "ON a.l_orderkey = b2.l_orderkey AND a.l_partkey < b2.l_partkey " +
        "GROUP BY 1, 2 HAVING count(*) >= 2) " +
        "SELECT p1, p2, sup, " +
        "floor(sup / CAST(f1.f AS DOUBLE) * 1000000 + 0.5) / 1000000 " +
        "AS confidence, " +
        "floor(sup * n_baskets / (CAST(f1.f AS DOUBLE) * f2.f) " +
        "* 1000000 + 0.5) / 1000000 AS lift " +
        "FROM pairs JOIN pf f1 ON f1.l_partkey = p1 " +
        "JOIN pf f2 ON f2.l_partkey = p2, nb " +
        "ORDER BY sup DESC, p1, p2 LIMIT 20"),

    // Replays the string-truncated first digit, the 6-dp Benford
    // literals, and N·Σ(p−q)²/q.
    "orders_benford" -> {
      val q = "CASE digit WHEN 1 THEN 0.301030 WHEN 2 THEN 0.176091 " +
        "WHEN 3 THEN 0.124939 WHEN 4 THEN 0.096910 WHEN 5 THEN 0.079181 " +
        "WHEN 6 THEN 0.066947 WHEN 7 THEN 0.057992 WHEN 8 THEN 0.051153 " +
        "ELSE 0.045757 END"
      // inside the joined CTE the bare column is ambiguous
      def qg(c: String) = c.replace("CASE digit", "CASE g.digit")
      "WITH counts AS (SELECT CAST(substring(CAST(CAST(floor(o_totalprice " +
        "* 100 + 0.5) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit, " +
        "count(*) AS n_obs FROM orders GROUP BY 1), " +
        "tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_total FROM counts), " +
        "grid AS (SELECT n_total, i AS digit FROM tot, range(1, 10) t(i)), " +
        "rows_ AS (SELECT g.digit, g.n_total, " +
        "CAST(COALESCE(n_obs, 0) AS BIGINT) AS n_obs, " +
        s"(COALESCE(n_obs, 0) / CAST(n_total AS DOUBLE) - (${qg(q)})) * " +
        s"(COALESCE(n_obs, 0) / CAST(n_total AS DOUBLE) - (${qg(q)})) / (${qg(q)}) " +
        "AS contrib FROM grid g LEFT JOIN counts c ON c.digit = g.digit), " +
        "chi AS (SELECT floor(max(n_total) * sum(contrib) * 1000000 + 0.5) " +
        "/ 1000000 AS chi2 FROM rows_) " +
        "SELECT digit, n_obs, " +
        "floor(n_obs / CAST(n_total AS DOUBLE) * 1000000 + 0.5) / 1000000 " +
        s"AS p_obs, ($q) AS q_benford, chi2, " +
        "CAST(CASE WHEN chi2 > 15.507 THEN 1 ELSE 0 END AS BIGINT) " +
        "AS reject_benford FROM rows_, chi ORDER BY digit"
    },

    // Replays profiles (integer cents, date-diff days), quantile_cont
    // quartiles (same type-7 interpolation as Spark `percentile`), and
    // the CASE band arithmetic.
    "orders_rfm_segments" ->
      ("WITH dmax AS (SELECT max(o_orderdate) AS dmax FROM orders), " +
        "prof AS (SELECT o_custkey, " +
        "CAST(date_diff('day', CAST(max(o_orderdate) AS DATE), " +
        "CAST((SELECT dmax FROM dmax) AS DATE)) AS BIGINT) AS rec, " +
        "count(*) AS freq, " +
        "CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) " +
        "AS BIGINT) AS cents FROM orders GROUP BY 1), " +
        "qs AS (SELECT quantile_cont(rec, [0.25, 0.5, 0.75]) AS rq, " +
        "quantile_cont(freq, [0.25, 0.5, 0.75]) AS fq, " +
        "quantile_cont(cents, [0.25, 0.5, 0.75]) AS mq FROM prof), " +
        "seg AS (SELECT cents, CAST(" +
        "(CASE WHEN rec <= rq[1] THEN 1 WHEN rec <= rq[2] THEN 2 " +
        "WHEN rec <= rq[3] THEN 3 ELSE 4 END) * 100 + " +
        "(CASE WHEN freq <= fq[1] THEN 4 WHEN freq <= fq[2] THEN 3 " +
        "WHEN freq <= fq[3] THEN 2 ELSE 1 END) * 10 + " +
        "(CASE WHEN cents <= mq[1] THEN 4 WHEN cents <= mq[2] THEN 3 " +
        "WHEN cents <= mq[3] THEN 2 ELSE 1 END) AS BIGINT) AS segment " +
        "FROM prof, qs) " +
        "SELECT segment, count(*) AS n_customers, " +
        "CAST(sum(cents) AS BIGINT) AS total_cents " +
        "FROM seg GROUP BY 1 ORDER BY segment"),

    // Replays the integer month keys, the cohort assignment, the bounded
    // cumulative window, and the integer-division LTV.
    "orders_cohort_ltv" ->
      ("WITH o AS (SELECT o_custkey, " +
        "CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS m, " +
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents " +
        "FROM orders), " +
        "coh AS (SELECT o_custkey, min(m) AS cm FROM o GROUP BY 1), " +
        "sz AS (SELECT cm, count(*) AS cohort_size FROM coh GROUP BY 1), " +
        "cells AS (SELECT cm, m - cm AS month_offset, count(*) AS n_orders, " +
        "CAST(sum(cents) AS BIGINT) AS rev_cents " +
        "FROM o JOIN coh USING (o_custkey) GROUP BY 1, 2), " +
        "cum AS (SELECT cells.cm, month_offset, cohort_size, n_orders, " +
        "rev_cents, CAST(sum(rev_cents) OVER (PARTITION BY cells.cm " +
        "ORDER BY month_offset ROWS BETWEEN UNBOUNDED PRECEDING AND " +
        "CURRENT ROW) AS BIGINT) AS cum_cents " +
        "FROM cells JOIN sz ON cells.cm = sz.cm) " +
        "SELECT CAST((cm - 1) // 12 AS BIGINT) AS cohort_year, " +
        "CAST(cm - 12 * ((cm - 1) // 12) AS BIGINT) AS cohort_month, " +
        "CAST(month_offset AS BIGINT) AS month_offset, " +
        "CAST(cohort_size AS BIGINT) AS cohort_size, " +
        "CAST(n_orders AS BIGINT) AS n_orders, " +
        "rev_cents / 100.0 AS revenue, " +
        "(cum_cents // cohort_size) / 100.0 AS ltv_per_customer " +
        "FROM cum ORDER BY cohort_year, cohort_month, month_offset"),

    // Replays the distinct audience sets, the ordered-pair intersection,
    // and the f1 + f2 − inter union identity.
    "graph_covisit_jaccard" ->
      ("WITH tu AS (SELECT DISTINCT event_type, user_id FROM events), " +
        "f AS (SELECT event_type, count(*) AS f FROM tu GROUP BY 1), " +
        "inter AS (SELECT a.event_type AS t1, b.event_type AS t2, " +
        "count(*) AS inter FROM tu a JOIN tu b " +
        "ON a.user_id = b.user_id AND a.event_type < b.event_type " +
        "GROUP BY 1, 2) " +
        "SELECT t1, t2, inter, f1.f AS f1, f2.f AS f2, " +
        "floor(inter / CAST(f1.f + f2.f - inter AS DOUBLE) " +
        "* 1000000 + 0.5) / 1000000 AS jaccard " +
        "FROM inter JOIN f f1 ON f1.event_type = t1 " +
        "JOIN f f2 ON f2.event_type = t2 ORDER BY t1, t2"),

    // Replays exact-cents customer revenue, the descending cumulative
    // (a plain window here — DuckDB is single-node), and the integer
    // 5·cum vs 4·total boundary test.
    "orders_pareto_8020" ->
      ("WITH pc AS (SELECT o_custkey, " +
        "CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) " +
        "AS BIGINT) AS cents FROM orders GROUP BY 1), " +
        "r AS (SELECT cents, CAST(sum(cents) OVER (ORDER BY cents DESC, " +
        "o_custkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
        "AS BIGINT) AS cum FROM pc), " +
        "t AS (SELECT CAST(sum(cents) AS BIGINT) AS total, " +
        "count(*) AS n FROM pc), " +
        "a AS (SELECT max(n) AS n_customers, " +
        "CAST(sum(CASE WHEN 5 * cum < 4 * total THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS below80, " +
        "CAST(min(CASE WHEN 5 * cum >= 4 * total THEN cum END) AS BIGINT) " +
        "AS rev80, max(total) AS total FROM r, t) " +
        "SELECT n_customers, below80 + 1 AS k80, " +
        "floor((below80 + 1) / CAST(n_customers AS DOUBLE) " +
        "* 1000000 + 0.5) / 1000000 AS cust_share, " +
        "floor(rev80 / CAST(total AS DOUBLE) * 1000000 + 0.5) / 1000000 " +
        "AS rev_share FROM a")
  )
}
