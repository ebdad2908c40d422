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
    }),

    // L7e: frame sampling — the video-pipeline plumbing the brief names
    // (decode / resize / frame-sample): the payload is treated as a
    // fixed-frame-size container (64-byte frames standing in for decoded
    // video frames), every 4th frame is sampled by an index explode
    // BOUNDED by the metadata frame count (never a per-byte explode),
    // and each sampled frame is sliced out of the blob and reduced by
    // the deterministic stub feature (byte sum — swap for a real
    // decode+resize kernel; the fixture payloads are pure ASCII so the
    // char fold is byte-exact). Shape: map-only — frame indices fan out
    // ×(frames/stride), slices are substring pushups on the blob, no
    // shuffle until the output sort; at 100 TB the sampler streams each
    // blob once per executor exactly like a real frame decoder.
    "multimodal_frame_sample" -> ((s, d) =>
      mm(s, d)
        .withColumn("n_frames", expr("CAST(length(payload) DIV 64 AS BIGINT)"))
        .filter(col("n_frames") >= 1)
        .select(col("doc_id"), col("payload"), col("n_frames"), explode(expr(
          "sequence(CAST(0 AS BIGINT), n_frames - 1, CAST(4 AS BIGINT))"))
          .as("frame"))
        .withColumn("fstr", expr(
          "decode(substring(payload, CAST(frame * 64 + 1 AS INT), 64), 'UTF-8')"))
        .select(col("doc_id"), col("n_frames"), col("frame"),
          expr("aggregate(filter(split(fstr, ''), ch -> ch <> ''), " +
            "CAST(0 AS BIGINT), (a, ch) -> a + ascii(ch))").as("frame_sum"))
        .orderBy(col("doc_id"), col("frame"))),

    // L7d: perceptual-hash near-dup pairs over the BLOBS — the image-dedup
    // pipeline (pHash/aHash family) with the codec stubbed: a 60-bit
    // signature from the decoded features (here a 60-bin byte-BIGRAM
    // histogram, bit b = bucket b above the bucket MEDIAN — the median
    // threshold is pHash's own move: it forces ~half the bits set, so
    // signatures carry maximal entropy where a mean threshold measured
    // degenerate on this corpus, every pair a candidate; swap the bigram
    // histogram for DCT coefficients and it IS pHash), then the
    // simhash-style blocked candidate search: any pair agreeing on one of
    // four 15-bit signature blocks is a candidate — the pigeonhole bound
    // makes recall at hamming ≤ 3 EXACT — verified by an O(1) bit_count.
    // 60 bits, not 64, keeps every fold and shift inside positive int64
    // on both engines (bit 63 would sign-wrap DuckDB's list_reduce). The
    // decode+sig runs in the SAME mapPartitions batch shape as L7c (codec
    // init amortized per partition; the 100 TB of blobs are read ONCE,
    // the surviving 8-byte sigs shuffle; measured here the blocks prune
    // 90% of pairs even on this intrinsically-clustered 31-word corpus —
    // real image corpora spread far wider). Pure integer arithmetic, so
    // the DuckDB twin regenerates every signature and the full pair set
    // is hash-checked cross-engine.
    "multimodal_phash_pairs" -> ((s, d) => {
      import s.implicits._
      val ds: Dataset[MMLite] =
        mm(s, d).select(col("doc_id"), col("payload")).as[MMLite]
      val sigs = ds.mapPartitions { it =>
        it.map { r =>
          val hist = new Array[Long](60)
          var j = 0
          while (j < r.payload.length - 1) {
            hist(((r.payload(j) & 0xff) * 31 + (r.payload(j + 1) & 0xff)) % 60) += 1
            j += 1
          }
          val m = hist.sorted.apply(30) // the 31st-smallest bucket count
          // MSB-first fold: bucket 0 lands in bit 59, like the twin's
          var sig = 0L
          var b = 0
          while (b < 60) {
            sig = sig * 2 + (if (hist(b) > m) 1L else 0L); b += 1
          }
          (r.doc_id, sig)
        }
      }.toDF("doc_id", "sig").cache()
      sigs.count() // one decode pass feeds all four block projections
      val blocks = sigs.select(col("doc_id"), col("sig"),
        explode(expr("transform(sequence(0, 3), i -> named_struct(" +
          "'i', i, 'v', shiftright(sig, i * 15) & 32767))")).as("blk"))
      val pairs = blocks.as("a").join(blocks.as("b"),
          col("a.blk") === col("b.blk") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
          col("a.sig").as("s1"), col("b.sig").as("s2"))
        .distinct()
      pairs
        .select(col("id1"), col("id2"),
          expr("CAST(bit_count(s1 ^ s2) AS BIGINT)").as("hamming"))
        .filter(col("hamming") <= phashHamming)
        .orderBy(col("id1"), col("id2"))
    }),

    // L7f: shard manifest — pack blobs (doc_id order) into 64 KiB export
    // shards by cumulative payload bytes, emitting each shard's blob
    // count, byte total, and fill ratio. This is curation_pack_sequences'
    // byte-domain twin for the blob store: the write-layout planner a
    // multimodal export runs before `.write.partitionBy(shard)`. The
    // cumulative is the TWO-LEVEL blocked prefix sum (256 doc_id blocks,
    // offsets from a tiny theta-join, windows partitioned BY BLOCK) —
    // never a global-ORDER-BY window.
    "multimodal_shard_plan" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val b = mm(s, d)
        .select(col("doc_id"), length(col("payload")).cast("long").as("nb"))
      val bounds = b.agg(max(col("doc_id")).as("max_id"))
      val blocked = b.crossJoin(broadcast(bounds))
        .withColumn("blk", expr("doc_id DIV (max_id DIV 256L + 1L)"))
        .withColumn("run", sum(col("nb")).over(
          Window.partitionBy(col("blk")).orderBy(col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val parts = blocked.groupBy(col("blk")).agg(sum(col("nb")).as("bb"))
      val offsets = parts.as("a")
        .join(parts.as("p2"), col("p2.blk") < col("a.blk"), "left")
        .groupBy(col("a.blk").as("blk"))
        .agg(coalesce(sum(col("p2.bb")), lit(0L)).as("off"))
      blocked.join(broadcast(offsets), "blk")
        .withColumn("shard_id", expr("(off + run - nb) DIV 65536L"))
        .groupBy(col("shard_id"))
        .agg(count(lit(1)).as("n_blobs"), sum(col("nb")).as("shard_bytes"))
        .select(col("shard_id"), col("n_blobs"), col("shard_bytes"),
          expr("floor(shard_bytes / 65536D * 1000000D + 0.5D) / 1000000D")
            .as("fill_ratio"))
        .orderBy(col("shard_id"))
    })
  )

  /** Verify threshold for L7d: ≤ 3 of 60 bits — the pigeonhole bound the
    * 4×15-bit blocking guarantees (any pair within hamming 3 leaves at
    * least one block untouched, so recall over the threshold is exact). */
  private val phashHamming = 3

  val oracleSql: Map[String, String] = Map(
    "multimodal_meta_prune" ->
      ("SELECT 'text/' || lang AS mime, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS total_bytes " +
        "FROM documents WHERE n_chars > 200 GROUP BY 1 ORDER BY mime"),

    "multimodal_features" ->
      ("SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes, " +
        "substr(lower(hex(CAST(text AS BLOB))), 1, 8) AS head_hex, " +
        "md5(text) AS digest FROM documents ORDER BY doc_id"),

    // frame twin: identical window arithmetic on the text (the payloads
    // are its UTF-8 bytes, pure ASCII ⇒ char index = byte index).
    "multimodal_frame_sample" ->
      ("WITH f AS (SELECT doc_id, CAST(length(text) // 64 AS BIGINT) AS n_frames " +
        "FROM documents WHERE length(text) // 64 >= 1), " +
        "fr AS (SELECT doc_id, n_frames, unnest(range(0, n_frames, 4)) AS frame " +
        "FROM f) " +
        "SELECT fr.doc_id, fr.n_frames, fr.frame, " +
        "CAST(list_sum(list_transform(range(64), i -> " +
        "ascii(substring(d.text, CAST(fr.frame * 64 + 1 + i AS INT), 1)))) " +
        "AS BIGINT) AS frame_sum " +
        "FROM fr JOIN documents d ON d.doc_id = fr.doc_id " +
        "ORDER BY fr.doc_id, fr.frame"),

    // fixtures are pure ASCII, so byte sum == codepoint sum
    "multimodal_decode_stub" ->
      ("SELECT doc_id, CAST(list_sum(list_transform(range(length(text)), " +
        "j -> CAST(ascii(text[j+1]) AS BIGINT))) AS BIGINT) AS byte_sum " +
        "FROM documents ORDER BY doc_id"),

    // phash twin: regenerate every 60-bit signature from the same
    // byte-bigram (== ASCII codepoint pair) histogram — median via
    // list_sort ascending, 31st element — MSB-first fold, then replay
    // the 4×15-bit block candidate join and the bit_count verify.
    "multimodal_phash_pairs" ->
      ("WITH hist AS (SELECT doc_id, " +
        "list_transform(range(60), b -> CAST(len(list_filter(" +
        "range(length(text) - 1), j -> (ascii(text[j + 1]) * 31 + " +
        "ascii(text[j + 2])) % 60 = b)) AS BIGINT)) AS h FROM documents), " +
        "med AS (SELECT doc_id, h, list_sort(h)[31] AS m FROM hist), " +
        "sig AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "range(60)), (acc, b) -> acc * 2 + " +
        "CASE WHEN h[b + 1] > m THEN 1 ELSE 0 END) AS sig FROM med), " +
        "blocks AS (SELECT doc_id, sig, i, (sig >> CAST(i * 15 AS INT)) & 32767 AS v " +
        "FROM sig, unnest(range(4)) AS u(i)), " +
        "pairs AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2, " +
        "a.sig AS s1, b.sig AS s2 FROM blocks a JOIN blocks b " +
        "ON a.i = b.i AND a.v = b.v AND a.doc_id < b.doc_id) " +
        "SELECT id1, id2, CAST(bit_count(xor(s1, s2)) AS BIGINT) AS hamming " +
        "FROM pairs WHERE bit_count(xor(s1, s2)) <= 3 ORDER BY id1, id2"),

    // Replays payload bytes (strlen = UTF-8 octets), the doc_id-order
    // cumulative (a plain window — DuckDB is single-node), and the
    // first-byte shard assignment.
    "multimodal_shard_plan" ->
      ("WITH b AS (SELECT doc_id, CAST(strlen(text) AS BIGINT) AS nb " +
        "FROM documents), " +
        "c AS (SELECT doc_id, nb, CAST(sum(nb) OVER (ORDER BY doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) " +
        "AS cum FROM b) " +
        "SELECT (cum - nb) // 65536 AS shard_id, count(*) AS n_blobs, " +
        "CAST(sum(nb) AS BIGINT) AS shard_bytes, " +
        "floor(CAST(sum(nb) AS BIGINT) / 65536.0 * 1000000 + 0.5) / 1000000 " +
        "AS fill_ratio FROM c GROUP BY 1 ORDER BY 1")
  )
}
