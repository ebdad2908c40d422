package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only stage profiler: times labeled sub-stages of the heavy queries
  * so regressions point at a stage, not a query. Not part of the contract. */
object Profile {
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
    import org.apache.spark.sql.functions._

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    graft.functions.CosineSim.register(spark)
    val poly = "aggregate(filter(split(t, ''), ch -> ch <> ''), 0L, " +
      "(h, ch) -> (h * 31 + ascii(ch)) % 1000000007)"
    val docs = graft.Tables.documents(spark, sfDir).repartition(col("doc_id"))
    time("scan")(docs.count())
    val tokhHof = docs.withColumn("tokh",
      expr(s"transform(split(lower(trim(text)), ' '), t -> $poly)"))
    time("token hashes (HOF interp)")(
      tokhHof.select(sum(size(col("tokh")))).head())
    val tokh = docs.withColumn("tokh",
      expr("transform(split(lower(trim(text)), ' '), t -> poly_hash(t))"))
    time("token hashes (native)")(tokh.select(sum(size(col("tokh")))).head())
    val setsHof = tokh.select(col("doc_id"), expr(
      "array_distinct(IF(size(tokh) >= 3, transform(sequence(0, size(tokh) - 3), " +
        "i -> (((tokh[i] * 8191 + tokh[i+1]) % 1000000007) * 8191 " +
        "+ tokh[i+2]) % 1000000007), array()))").as("shl"))
    time("shingle sets (HOF interp)")(setsHof.select(sum(size(col("shl")))).head())
    val sets = tokh.select(col("doc_id"),
      expr("ngram_hashes(tokh, 3)").as("shl"))
    time("shingle sets (native)")(sets.select(sum(size(col("shl")))).head())
    val mhHof = sets.withColumn("mh", expr(
      "transform(sequence(0, 15), p -> array_min(transform(shl, " +
        "x -> ((2 * p + 1) * x + (p * p * 7919 + 1)) % 1000000007)))"))
    time("minhash sigs (HOF interp)")(mhHof.select(sum(size(col("mh")))).head())
    val mh = sets.withColumn("mh", expr("minhash_sigs(shl, 16)"))
    time("minhash sigs (native)")(mh.select(sum(size(col("mh")))).head())
    val cached = mh.cache()
    time("cache materialize")(cached.count())
    val bands = cached.select(col("doc_id"), posexplode(expr(
      "transform(sequence(0, 7), b -> concat(" +
        "CAST(mh[CAST(2 * b AS INT)] AS STRING), '-', " +
        "CAST(mh[CAST(2 * b + 1 AS INT)] AS STRING)))")).as(Seq("bd", "sig")))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.bd") === col("b.bd") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()
    time("candidates")(println("  n_cand = " + cand.count()))
    val full = cand
      .join(cached.select(col("doc_id").as("id1"), col("shl").as("s1"),
        col("mh").as("m1")), "id1")
      .join(cached.select(col("doc_id").as("id2"), col("shl").as("s2"),
        col("mh").as("m2")), "id2")
      .filter(expr("size(filter(zip_with(m1, m2, (x, y) -> x = y), v -> v)) >= 5"))
      .select(col("id1"), col("id2"),
        round(expr("size(array_intersect(s1, s2)) / CAST(size(s1) + size(s2) " +
          "- size(array_intersect(s1, s2)) AS DOUBLE)"), 6).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
    time("verify + full")(println("  n_out = " + full.count()))
    val setsM = sets.cache(); time("sets materialize")(setsM.count())
    val mhOnly = setsM.withColumn("mh", expr(
      "transform(sequence(0, 15), p -> array_min(transform(shl, " +
        "x -> ((2 * p + 1) * x + (p * p * 7919 + 1)) % 1000000007)))"))
    time("mh over cached sets")(mhOnly.write.format("noop").mode("overwrite").save())
    val reg = time("registered minhash: build+cache")(
      graft.queries.NearDup.queries("dedup_minhash")(spark, sfDir))
    time("registered minhash: execute")(println("  n = " + reg.count()))
    val simHof = sets.select(col("doc_id"), expr(
      "aggregate(sequence(0, 63), 0L, (acc, k) -> acc + " +
        "IF(aggregate(shl, 0L, (s2, x) -> s2 + " +
        "IF((((1103515245L * (((2 * k + 1) * x + k * k * 7919 + 1) % 1000000007L) " +
        "+ 12345L) % 2147483648L) div 32768L) % 2L = 1L, 1L, -1L)) >= 0L, " +
        "shiftleft(CAST(1 AS BIGINT), k), 0L))").as("sim"))
    // probe via bit_count: 64-bit signatures use the sign bit, so a raw
    // sum overflows under ANSI mode
    time("simhash sigs 64 (HOF interp)")(
      simHof.select(sum(expr("bit_count(sim)"))).head())
    val sim = sets.select(col("doc_id"), expr("simhash_sig(shl, 64)").as("sim"))
    time("simhash sigs 64 (native)")(
      sim.select(sum(expr("bit_count(sim)"))).head())

    // embedding LSH signature: interpreted triple-nested HOF vs the native
    // codegen'd hyperplane_sig (same LCG parity, bit-identical output)
    graft.functions.CosineSim.register(spark)
    val emb = graft.Tables.embeddings(spark, sfDir)
      .repartition(col("vec_id"))
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("ed"))
      .cache()
    emb.count()
    // 8 bands × 16 bits (128 hyperplanes/vector) so the kernel dominates
    // the fixed per-job overhead that hides the ratio at 2×8
    val hofSig =
      "transform(sequence(0, 7), b -> aggregate(sequence(0, 15), 0L, " +
        "(acc, r) -> acc * 2 + IF(aggregate(sequence(0, 63), 0D, " +
        "(s2, k) -> s2 + ed[k] * IF((((1103515245L * CAST((b * 16 + r) * 64 + k AS BIGINT) " +
        "+ 12345L) % 2147483648L) DIV 32768L) % 2L = 1L, 1D, -1D)) >= 0D, 1L, 0L)))"
    val emb20 = emb.select(col("ed"),
      explode(expr("sequence(1, 20)")).as("rep")).repartition(32).cache()
    emb20.count()
    time("emb sig 8x16 x20: HOF interp")(
      emb20.select(expr(hofSig).as("s")).select(sum(expr("s[0] + s[7]"))).head())
    time("emb sig 8x16 x20: native codegen")(
      emb20.select(expr("hyperplane_sig(ed, 8, 16)").as("s"))
        .select(sum(expr("s[0] + s[7]"))).head())

    // ---- BM25 / RRF retrieval stages ------------------------------------
    spark.catalog.clearCache(); graft.Memo.clear()
    time("retrieval: tokens stage")(
      graft.queries.NearDup.tokens(spark, sfDir).count())
    val rdocs = graft.Tables.documents(spark, sfDir)
    val rtf = rdocs
      .select(col("doc_id"),
        size(split(lower(trim(col("text"))), " ")).cast("long").as("dl"),
        explode(split(lower(trim(col("text"))), " ")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf")).cache()
    time("retrieval: term freqs")(println("  tf rows = " + rtf.count()))
    // the SAME adaptive query/corpus split the registered queries use
    // (nQueryDocs = Sizing.anchors(docCount)) — a hardcoded 50 here made
    // the per-stage timings decompose a DIFFERENT pipeline (ADVICE r11)
    val rnq = graft.Sizing.anchors(graft.Sizing.docCount(spark, sfDir))
    val rcorp = rtf.filter(col("doc_id") >= rnq)
    val rq = rtf.filter(col("doc_id") < rnq)
      .select(col("doc_id").as("qid"), col("term")).distinct()
    val rstats = rcorp.groupBy(col("doc_id")).agg(first(col("dl")).as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val rwt = rcorp.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(rstats))
      .select(col("term"), expr(
        "CAST(floor(round(ln(1.0D + (n_docs - df + 0.5D) / (df + 0.5D)), 6) " +
          "* 1000000D + 0.5D) AS BIGINT)").as("idf6"))
    time("retrieval: idf table")(println("  wt rows = " + rwt.count()))
    val rfan = rcorp.join(rwt, "term").crossJoin(broadcast(rstats))
      .join(broadcast(rq), "term")
    time("retrieval: fan-out rows")(println("  fan = " + rfan.count()))
    val rsc = rfan.select(col("qid"), col("doc_id").as("did"), expr(
        "CAST(floor(idf6 * (tf * 2.2D) / (tf + 1.2D * (0.25D + 0.75D * dl / " +
          "(CAST(sum_dl AS DOUBLE) / n_docs))) + 0.5D) AS BIGINT)").as("c6"))
      .groupBy(col("qid"), col("did")).agg(sum(col("c6")).as("s6"))
    time("retrieval: scored pairs")(println("  pairs = " + rsc.count()))
    val rw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("s6").desc, col("did"))
    time("retrieval: top-10 window")(
      rsc.withColumn("rk", row_number().over(rw)).filter(col("rk") <= 10).count())
    time("retrieval: bm25_topk (registered, cold)")(
      graft.SparkEntry.queries("similarity_bm25_topk")(spark, sfDir).count())
    time("retrieval: rrf_fusion (warm bm25 stage)")(
      graft.SparkEntry.queries("similarity_rrf_fusion")(spark, sfDir).count())
    spark.stop()
  }
}
