package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators (SURVEY.md §2.9 L7): opaque binary payloads
  * with a typed metadata struct, processed without ever decoding the blob
  * unless a stage explicitly asks for it.
  *
  * The fixtures carry no real image/audio bytes, so the payload is the
  * UTF-8 encoding of `documents.text` and the "decode" stage is a
  * DETERMINISTIC STUB (sums payload bytes in a mapPartitions batch): the
  * Spark-side plumbing — binary column, metadata struct, partition-batched
  * decode, schema in/out — is real and oracle-checked; only the codec call
  * inside the stub would change with a real library.
  *
  * Scale posture: metadata-only queries must never materialize payload
  * bytes — Catalyst column pruning drops `payload` (and the `text` it
  * derives from) out of the parquet scan, which is the difference between
  * scanning kilobytes and scanning the 100 TB of blobs
  * (plan-shape-asserted in MultimodalSpec). The decode stub runs
  * per-partition so a real codec would amortize model/codec init across a
  * batch, the mapInPandas/mapPartitions deployment shape.
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  /** documents → multimodal frame: (doc_id, payload BINARY, meta STRUCT). */
  private def mm(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        concat(lit("text/"), col("lang")).as("mime"),
        col("n_chars").as("bytes"),
        col("source").as("origin")).as("meta"))

  final case class MMLite(doc_id: Long, payload: Array[Byte])

  val queries: Map[String, Q] = Map(
    // L7a: metadata-only filter/group — the payload column exists in the
    // frame but is pruned out of the scan (asserted in MultimodalSpec).
    "multimodal_meta_prune" -> ((s, d) =>
      mm(s, d)
        .filter(col("meta.bytes") > 200)
        .groupBy(col("meta.mime").as("mime"))
        .agg(count(lit(1)).as("n"), sum(col("meta.bytes")).as("total_bytes"))
        .orderBy(col("mime"))),

    // L7b: blob introspection with builtins only — length, head bytes,
    // content digest. No custom code touches the payload.
    "multimodal_features" -> ((s, d) =>
      mm(s, d).select(
        col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        lower(hex(expr("substring(payload, 1, 4)"))).as("head_hex"),
        md5(col("payload")).as("digest"))
        .orderBy(col("doc_id"))),

    // L7c: the decode stub — typed per-partition batch over the payload
    // (deterministic fake: unsigned byte sum stands in for decode +
    // feature extraction; swap the fold body for a real codec call).
    "multimodal_decode_stub" -> ((s, d) => {
      import s.implicits._
      val ds: Dataset[MMLite] =
        mm(s, d).select(col("doc_id"), col("payload")).as[MMLite]
      ds.mapPartitions { it =>
        // batch boundary: a real decoder would init its codec HERE once
        it.map(r => (r.doc_id, r.payload.foldLeft(0L)((a, b) => a + (b & 0xff))))
      }.toDF("doc_id", "byte_sum")
        .orderBy(col("doc_id"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "multimodal_meta_prune" ->
      ("SELECT 'text/' || lang AS mime, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS total_bytes " +
        "FROM documents WHERE n_chars > 200 GROUP BY 1 ORDER BY mime"),

    "multimodal_features" ->
      ("SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes, " +
        "substr(lower(hex(CAST(text AS BLOB))), 1, 8) AS head_hex, " +
        "md5(text) AS digest FROM documents ORDER BY doc_id"),

    // fixtures are pure ASCII, so byte sum == codepoint sum
    "multimodal_decode_stub" ->
      ("SELECT doc_id, CAST(list_sum(list_transform(range(length(text)), " +
        "j -> CAST(ascii(text[j+1]) AS BIGINT))) AS BIGINT) AS byte_sum " +
        "FROM documents ORDER BY doc_id")
  )
}
