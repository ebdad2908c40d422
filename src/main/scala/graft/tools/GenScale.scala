package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scaled-fixture generator: replicates the sf0.1 fixture
  * SHAPE (schemas per FIXTURES.md, value distributions measured with DuckDB
  * on 2026-08-14) at an arbitrary multiplier, so the engine's scaling
  * exponents can be measured beyond the driver-provided sf0.1 without
  * touching read-only `/root/testdata`.
  *
  * Design: every column is a pure deterministic expression of the row id
  * (`xxhash64(id, salt)` streams), so the generator is itself a
  * 100 TB-shaped Spark job — `spark.range` + codegen'd projections,
  * no driver-side data, no RNG state, identical output under any
  * partitioning. Writing 10× sf0.1 (~7.8 M rows) takes ~30 s at local[32];
  * the same job against a 1000-executor cluster would generate the real
  * 100 TB layout unchanged.
  *
  * Distribution fidelity (vs sf0.1, measured):
  *   - lineitem per-order fanout: mean 4 (uniform 1..7 here vs the
  *     fixture's Poisson(4) — same mean/row count, simpler inverse).
  *   - events: ~month span (2024-01-01+), time-ordered by event_id with
  *     irregular inter-arrival, users = customers/10, value ~U(0,100),
  *     props = {"k": 0..99} JSON.
  *   - documents: 10..100 words uniform over the fixture's exact 31-word
  *     vocabulary; ~0.2% planted exact duplicates (copy of doc_id-17) and
  *     ~0.5% planted near-duplicates (copy of doc_id-23 plus one appended
  *     word → bigram jaccard ≥ 0.7, length diff ≤ 6 chars) so the dedup
  *     operators see the same structure FIXTURES.md documents at sf0.1.
  *   - embeddings: 64-dim unit-normalized Box-Muller gaussians (sf0.1
  *     vectors are unit-norm with no label clustering — measured
  *     within-label avg cosine 0.001), label ~U{0..9}.
  */
object GenScale {
  /** 53-bit uniform double in [0,1), keyed by (salt, cols…). */
  private def u(salt: String, cols: Column*): Column =
    shiftrightunsigned(xxhash64((lit(salt) +: cols): _*), 11)
      .cast("double") / lit(9007199254740992.0) // 2^53

  /** Non-negative hash mod k, keyed by (salt, cols…). */
  private def hmod(salt: String, k: Long, cols: Column*): Column =
    pmod(xxhash64((lit(salt) +: cols): _*), lit(k))

  private def pick(salt: String, values: Seq[String], cols: Column*): Column =
    element_at(array(values.map(lit): _*), (hmod(salt, values.size.toLong, cols: _*) + 1).cast("int"))

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("target/sf1")
    val mult = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    gen(spark, out, mult)
    spark.stop()
  }

  def gen(spark: SparkSession, out: String, mult: Int): Unit = {
    val nCust = 15000L * mult
    val nSupp = 1000L * mult
    val nPart = 20000L * mult
    val nOrders = 150000L * mult
    val nEvents = 100000L * mult
    val nUsers = nCust / 10 // sf0.1: 1500 distinct users over 15000 customers
    val nDocs = 5000L * mult
    val nVecs = 2000L * mult

    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[genscale] wrote $name")
    }

    val id = col("id")

    write(spark.range(5).select(
      id.cast("int").as("r_regionkey"),
      element_at(array(Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
        .map(lit): _*), (id + 1).cast("int")).as("r_name")), "region")

    write(spark.range(25).select(
      id.cast("int").as("n_nationkey"),
      format_string("NATION_%d", id).as("n_name"),
      (id % 5).cast("int").as("n_regionkey")), "nation")

    write(spark.range(nCust).select(
      id.as("c_custkey"),
      format_string("Customer#%09d", id).as("c_name"),
      hmod("cnat", 25, id).cast("int").as("c_nationkey"),
      round(lit(-1000.0) + u("cbal", id) * 11000.0, 2).as("c_acctbal"),
      pick("cseg", Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
        "MACHINERY"), id).as("c_mktsegment")), "customer")

    write(spark.range(nSupp).select(
      id.as("s_suppkey"),
      format_string("Supplier#%09d", id).as("s_name"),
      hmod("snat", 25, id).cast("int").as("s_nationkey"),
      round(lit(-1000.0) + u("sbal", id) * 11000.0, 2).as("s_acctbal")), "supplier")

    write(spark.range(nPart).select(
      id.as("p_partkey"),
      concat_ws(" ",
        pick("padj", Seq("large", "small", "hot", "cold", "old", "new",
          "blue", "red", "green", "dark"), id),
        pick("pnoun", Seq("ring", "bolt", "plate", "screw", "gear", "wheel",
          "pipe", "rod", "cap", "disk"), id)).as("p_name"),
      format_string("Brand#%d", hmod("pbrand", 25, id) + 1).as("p_brand"),
      pick("ptype", Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL",
        "STANDARD"), id).as("p_type"),
      (hmod("psize", 50, id) + 1).cast("int").as("p_size"),
      round(lit(900.0) + hmod("pprice", 1000, id) / lit(10.0), 2)
        .as("p_retailprice")), "part")

    // orders + lineitem share the per-order draw stream so lineitem can be
    // exploded straight off the orders projection (one scan, no join)
    val orders = spark.range(nOrders).select(
      id.as("o_orderkey"),
      hmod("ocust", nCust, id).as("o_custkey"),
      pick("ostat", Seq("F", "O", "P"), id).as("o_orderstatus"),
      round(lit(1000.0) + u("oprice", id) * 499000.0, 2).as("o_totalprice"),
      // day-aligned timestamps spanning 1995-01-01 .. 2001-07-31 (fixture
      // span); timestamp[ms] physical per FIXTURES.md is a parquet detail —
      // Spark reads either encoding as TimestampType
      to_timestamp(date_add(lit("1995-01-01").cast("date"),
        hmod("odate", 2404, id).cast("int"))).as("o_orderdate"),
      pick("oprio", Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
        "5-LOW"), id).as("o_orderpriority"))
    write(orders, "orders")

    val li = orders
      .select(col("o_orderkey"), col("o_orderdate"),
        // uniform 1..7 lines per order: mean 4 matches the fixture's
        // Poisson(4); total rows ≈ 4×orders = the 6M-per-mult-10 contract
        (hmod("lnl", 7, col("o_orderkey")) + 1).cast("int").as("nl"))
      .select(col("o_orderkey"), col("o_orderdate"),
        explode(sequence(lit(1), col("nl"))).as("l_linenumber"))
    val lkey = Seq(col("o_orderkey"), col("l_linenumber"))
    write(li.select(
      col("o_orderkey").as("l_orderkey"),
      hmod("lpart", nPart, lkey: _*).as("l_partkey"),
      hmod("lsupp", nSupp, lkey: _*).as("l_suppkey"),
      col("l_linenumber"),
      (hmod("lqty", 50, lkey: _*) + 1).cast("double").as("l_quantity"),
      round((hmod("lqty", 50, lkey: _*) + 1).cast("double") *
        (lit(900.0) + hmod("lep", 1000, lkey: _*) / lit(10.0)), 2)
        .as("l_extendedprice"),
      (hmod("ldisc", 11, lkey: _*) / lit(100.0)).as("l_discount"),
      (hmod("ltax", 9, lkey: _*) / lit(100.0)).as("l_tax"),
      pick("lrf", Seq("A", "N", "R"), lkey: _*).as("l_returnflag"),
      pick("lls", Seq("F", "O"), lkey: _*).as("l_linestatus"),
      to_timestamp(date_add(col("o_orderdate").cast("date"),
        (hmod("lship", 120, lkey: _*) + 1).cast("int"))).as("l_shipdate")),
      "lineitem")

    // events: time-ordered by event_id, irregular inter-arrival, ~31-day
    // span regardless of mult (density scales, span doesn't — mirrors the
    // sf0.001→sf0.1 fixtures and keeps hourly/session windows meaningful)
    val spanUs = 30.9999 * 86400e6
    val originUs = lit(1704067200000000L) // 2024-01-01 00:00:00 UTC in µs
    write(spark.range(nEvents).select(
      id.as("event_id"),
      timestamp_micros((originUs +
        ((id.cast("double") + u("ets", id)) * lit(spanUs / nEvents))
          .cast("long")).cast("long")).as("ts"),
      hmod("euser", nUsers, id).as("user_id"),
      pick("etype", Seq("click", "view", "purchase", "signup", "error"), id)
        .as("event_type"),
      round(u("eval", id) * 100.0, 2).as("value"),
      format_string("{\"k\": %d}", hmod("eprops", 100, id)).as("props")),
      "events")

    // documents: base text is a pure function of a BASE id, so planted
    // duplicates are expressed as base-id redirection — exact dups copy
    // doc (id-17)'s text verbatim, near-dups copy doc (id-23)'s text and
    // append one word (bigram jaccard stays ≥ 0.7 at ≥ 10 words)
    val vocab = Seq("a", "agg", "batch", "big", "column", "customer", "data",
      "dup", "fast", "filter", "group", "hash", "join", "key", "line",
      "merge", "order", "part", "query", "row", "scan", "slow", "small",
      "sort", "spark", "stream", "table", "the", "value", "vector", "window")
    val dupClass = hmod("ddup", 500, id) // 0 → exact dup, 1–2 → near dup
    val baseId = when(dupClass === 0 && id >= 17, id - 17)
      .when(dupClass.isin(1, 2) && id >= 23, id - 23)
      .otherwise(id)
    val vocabArr = array(vocab.map(lit): _*)
    def textOf(base: Column): Column = array_join(
      transform(sequence(lit(0), hmod("dnw", 91, base).cast("int") + 9),
        i => element_at(vocabArr,
          (pmod(xxhash64(lit("dword"), base, i), lit(31L)) + 1).cast("int"))),
      " ")
    val text = when(dupClass.isin(1, 2) && id >= 23,
      concat(textOf(baseId), lit(" "),
        element_at(vocabArr, (hmod("dextra", 31, id) + 1).cast("int"))))
      .otherwise(textOf(baseId))
    write(spark.range(nDocs).select(
      id.as("doc_id"),
      text.as("text"),
      // en-heavy mix matching sf0.1: en 41%, fr/es/zh 15%, de 14%
      when(hmod("dlang", 100, id) < 41, "en")
        .when(hmod("dlang", 100, id) < 56, "fr")
        .when(hmod("dlang", 100, id) < 71, "es")
        .when(hmod("dlang", 100, id) < 86, "zh").otherwise("de").as("lang"),
      format_string("src%d", hmod("dsrc", 20, id)).as("source"),
      length(text).cast("long").as("n_chars")), "documents")

    // embeddings: unit-normalized 64-dim gaussians (Box-Muller over two
    // hash-uniform streams), computed entirely inside one projection
    val dims = sequence(lit(0), lit(63))
    val raw = transform(dims, i => sqrt(lit(-2.0) *
      log(lit(1e-12) + u("bm1", id, i))) *
      cos(lit(2.0 * math.Pi) * u("bm2", id, i)))
    val nrm = sqrt(aggregate(raw, lit(0.0), (acc, x) => acc + x * x))
    write(spark.range(nVecs).select(
      id.as("vec_id"),
      transform(raw, x => (x / nrm).cast("float")).as("embedding"),
      hmod("elabel", 10, id).cast("int").as("label")), "embeddings")
  }
}
