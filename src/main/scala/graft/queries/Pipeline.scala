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
  * Every stage is the already-oracle-checked operator, so the composite's
  * DuckDB twin replays the identical semantics end-to-end. Shape at scale:
  * two hash aggregations, the near-dup candidate join, one semi + one
  * anti join (all keyed), one final aggregation — no stage is new work
  * beyond its standalone operator.
  */
object Pipeline {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "pipeline_curation" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val keepers = docs
        .groupBy(sha2(lower(trim(col("text"))), 256).as("h"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"))
      val nearDupDrops = NearDup.queries("dedup_ngram_jaccard")(s, d)
        .select(col("id2").as("doc_id")).distinct()
      val quality = docs
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n_tokens", size(col("toks")).cast("long"))
        .withColumn("stop_ratio",
          expr("floor(size(filter(toks, t -> t IN ('the', 'a'))) / CAST(n_tokens AS DOUBLE) * 1000000D + 0.5D) / 1000000D"))
        .withColumn("distinct_ratio",
          expr("floor(size(array_distinct(toks)) / CAST(n_tokens AS DOUBLE) * 1000000D + 0.5D) / 1000000D"))
        .select(col("doc_id"), col("lang"), col("n_chars"),
          // floor-form rounding: portable at the half boundary (TextOps)
          expr("floor((CAST(0.4 AS DOUBLE) * distinct_ratio + CAST(0.3 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - stop_ratio) + " +
            "0.3D * least(n_tokens / 100.0D, 1.0D)) * 1000000D + 0.5D) / 1000000D")
            .as("quality"))
      quality
        .join(keepers, Seq("doc_id"), "left_semi")
        .join(nearDupDrops, Seq("doc_id"), "left_anti")
        .filter(col("quality") >= 0.7 && col("lang").isin("en", "fr", "es"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          round(avg(col("quality")), 6).as("avg_quality"),
          round(avg(col("n_chars")), 2).as("avg_chars"))
        .orderBy(col("lang"))
    })
  )

  // the near-dup drop set replays NearDup's oracle pipeline verbatim
  private val dropsSql: String = {
    val ngram = NearDup.oracleSql("dedup_ngram_jaccard")
    s"SELECT DISTINCT id2 AS doc_id FROM ($ngram)"
  }

  val oracleSql: Map[String, String] = Map(
    "pipeline_curation" ->
      (s"WITH keepers AS (SELECT min(doc_id) AS doc_id FROM documents " +
        "GROUP BY sha256(lower(trim(text)))), " +
        s"drops AS ($dropsSql), " +
        "qual AS (SELECT doc_id, lang, n_chars, " +
        "floor((CAST(0.4 AS DOUBLE) * distinct_ratio + CAST(0.3 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - stop_ratio) + " +
        "CAST(0.3 AS DOUBLE) * least(n_tokens / CAST(100.0 AS DOUBLE), CAST(1.0 AS DOUBLE))) * 1000000 + CAST(0.5 AS DOUBLE)) / 1000000 AS quality FROM (" +
        "SELECT doc_id, lang, n_chars, CAST(len(toks) AS BIGINT) AS n_tokens, " +
        "floor(len(list_filter(toks, t -> t IN ('the', 'a'))) / CAST(len(toks) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS stop_ratio, " +
        "floor(len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS distinct_ratio " +
        "FROM (SELECT doc_id, lang, n_chars, string_split(text, ' ') AS toks FROM documents))) " +
        "SELECT lang, count(*) AS n_docs, round(avg(quality), 6) AS avg_quality, " +
        "round(avg(n_chars), 2) AS avg_chars " +
        "FROM qual WHERE doc_id IN (SELECT doc_id FROM keepers) " +
        "AND doc_id NOT IN (SELECT doc_id FROM drops) " +
        "AND quality >= 0.7 AND lang IN ('en', 'fr', 'es') " +
        "GROUP BY lang ORDER BY lang")
  )
}
