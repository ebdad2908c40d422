package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end corpus-curation job — what a training-data pipeline
  * actually runs over raw documents, composed from this library's own
  * operators:
  *
  *   1. exact dedup (keep min doc_id per normalized-content group)
  *   2. near-dup removal (drop the higher id of every verified
  *      bigram-jaccard pair — NearDup.dedup_ngram_jaccard reused as-is:
  *      MinHash-band candidates + exact bigram verify, so this stage
  *      inherits the scale-safe candidate generation)
  *   3. quality scoring + threshold, language allowlist
  *   4. per-language corpus stats
  *
  * pipeline_pretrain_corpus extends the composition to the full
  * pretraining build: 5. eval-holdout split + contamination removal
  * (Curation.contaminationPairs — the decontaminate kernel) and
  * 6. a 60% token-budget cut in doc_id order via the distributed
  * two-level prefix sum (Curation.cumTokensOf — no single-task window).
  *
  * Every stage is the already-oracle-checked operator, so the composite's
  * DuckDB twin replays the identical semantics end-to-end. Shape at scale:
  * two hash aggregations, the near-dup candidate join, semi/anti joins
  * (all keyed), the bounded prefix-sum machinery, one final aggregation —
  * no stage is new work beyond its standalone operator.
  */
object Pipeline {
  type Q = (SparkSession, String) => DataFrame

  /** Stages 1–3: (doc_id, lang, n_chars, n_tokens, quality) for every doc
    * that survives exact dedup, near-dup drop, the quality threshold and
    * the language allowlist — shared by both pipeline queries. */
  private def cleanDocs(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val keepers = docs
      .groupBy(sha2(lower(trim(col("text"))), 256).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val nearDupDrops = NearDup.ngramPairs(s, d)
      .select(col("id2").as("doc_id")).distinct()
    val quality = docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("stop_ratio",
        expr("floor(size(filter(toks, t -> t IN ('the', 'a'))) / CAST(n_tokens AS DOUBLE) * 1000000D + 0.5D) / 1000000D"))
      .withColumn("distinct_ratio",
        expr("floor(size(array_distinct(toks)) / CAST(n_tokens AS DOUBLE) * 1000000D + 0.5D) / 1000000D"))
      .select(col("doc_id"), col("lang"), col("n_chars"), col("n_tokens"),
        // floor-form rounding: portable at the half boundary (TextOps)
        expr("floor((CAST(0.4 AS DOUBLE) * distinct_ratio + CAST(0.3 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - stop_ratio) + " +
          "0.3D * least(n_tokens / 100.0D, 1.0D)) * 1000000D + 0.5D) / 1000000D")
          .as("quality"))
    quality
      .join(keepers, Seq("doc_id"), "left_semi")
      .join(nearDupDrops, Seq("doc_id"), "left_anti")
      .filter(col("quality") >= 0.7 && col("lang").isin("en", "fr", "es"))
  }

  val queries: Map[String, Q] = Map(
    "pipeline_curation" -> ((s, d) =>
      cleanDocs(s, d)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          round(avg(col("quality")), 6).as("avg_quality"),
          round(avg(col("n_chars")), 2).as("avg_chars"))
        .orderBy(col("lang"))),

    // The COMPLETE pretraining-corpus build: the clean set restricted to
    // the train split, contaminated train docs removed (the
    // decontaminate kernel over the shared 5-gram index), then cut to a
    // 60% token budget in doc_id order with the distributed prefix sum.
    // Output: the per-language survival audit of the corpus a dataloader
    // would actually be handed. Every stage reuses an oracle-proven
    // operator, so the twin replays the whole build.
    "pipeline_pretrain_corpus" -> ((s, d) => {
      val flagged = Curation.contaminationPairs(s, d)
        .select(col("train_id").as("doc_id")).distinct()
      // MATERIALIZED (round 16): the surviving-corpus subtree (exact-dup
      // groupBy + quality HOFs + two anti-joins) feeds FOUR branches of
      // one plan — the grand total, cumTokensOf's bounds probe, and the
      // prefix sum's main + block-totals legs. Un-cached, each branch
      // replays the whole curation chain (4 corpus passes at 100 TB for
      // a skinny survivors table); the cache is the "build the kept set
      // once" step every stage downstream of a filter pipeline takes.
      val corpus = cleanDocs(s, d)
        .filter(Curation.isTrainDoc)
        .join(flagged, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"), col("n_tokens"))
        .cache()
      corpus.count()
      val total = corpus.agg(sum(col("n_tokens")).as("grand"))
      Curation.cumTokensOf(corpus)
        .crossJoin(broadcast(total))
        .filter(col("cum") <= expr("grand * 6L DIV 10L"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("kept_tokens"))
        .orderBy(col("lang"))
    })
  )

  // the near-dup drop set replays NearDup's oracle pipeline verbatim
  private val dropsSql: String = {
    val ngram = NearDup.oracleSql("dedup_ngram_jaccard")
    s"SELECT DISTINCT id2 AS doc_id FROM ($ngram)"
  }

  /** Shared oracle CTE chain for stages 1–3 (keepers, drops, qual with
    * n_tokens, clean) — composed by both pipeline twins. */
  private val cleanSql: String =
    "keepers AS (SELECT min(doc_id) AS doc_id FROM documents " +
      "GROUP BY sha256(lower(trim(text)))), " +
      s"drops AS ($dropsSql), " +
      "qual AS (SELECT doc_id, lang, n_chars, n_tokens, " +
      "floor((CAST(0.4 AS DOUBLE) * distinct_ratio + CAST(0.3 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - stop_ratio) + " +
      "CAST(0.3 AS DOUBLE) * least(n_tokens / CAST(100.0 AS DOUBLE), CAST(1.0 AS DOUBLE))) * 1000000 + CAST(0.5 AS DOUBLE)) / 1000000 AS quality FROM (" +
      "SELECT doc_id, lang, n_chars, CAST(len(toks) AS BIGINT) AS n_tokens, " +
      "floor(len(list_filter(toks, t -> t IN ('the', 'a'))) / CAST(len(toks) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS stop_ratio, " +
      "floor(len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS distinct_ratio " +
      "FROM (SELECT doc_id, lang, n_chars, string_split(text, ' ') AS toks FROM documents))), " +
      "clean AS (SELECT doc_id, lang, n_chars, n_tokens, quality FROM qual " +
      "WHERE doc_id IN (SELECT doc_id FROM keepers) " +
      "AND doc_id NOT IN (SELECT doc_id FROM drops) " +
      "AND quality >= 0.7 AND lang IN ('en', 'fr', 'es'))"

  val oracleSql: Map[String, String] = Map(
    "pipeline_curation" ->
      (s"WITH $cleanSql " +
        "SELECT lang, count(*) AS n_docs, round(avg(quality), 6) AS avg_quality, " +
        "round(avg(n_chars), 2) AS avg_chars " +
        "FROM clean GROUP BY lang ORDER BY lang"),

    "pipeline_pretrain_corpus" ->
      (s"WITH $cleanSql, ${Curation.duckGrams}, " +
        "flagged AS (SELECT DISTINCT a.doc_id AS doc_id FROM grams a " +
        "JOIN grams b ON a.g = b.g " +
        s"WHERE NOT (b.${Curation.trainPredSql}) AND a.${Curation.trainPredSql} " +
        "GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 3), " +
        s"corpus AS (SELECT doc_id, lang, n_tokens FROM clean " +
        s"WHERE ${Curation.trainPredSql} " +
        "AND doc_id NOT IN (SELECT doc_id FROM flagged)), " +
        "cum AS (SELECT doc_id, lang, n_tokens, sum(n_tokens) OVER " +
        "(ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
        "AS cum FROM corpus) " +
        "SELECT lang, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) " +
        "AS kept_tokens FROM cum " +
        "WHERE cum <= (SELECT sum(n_tokens) FROM corpus) * 6 // 10 " +
        "GROUP BY lang ORDER BY lang")
  )
}
