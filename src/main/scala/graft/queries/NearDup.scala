package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate detection over the documents corpus (SURVEY.md §2.9 L2 +
  * the training-data dedup mandate): MinHash-LSH, SimHash, and exact n-gram
  * Jaccard on length-blocked candidates.
  *
  * All hashing is portable mod-arithmetic (polynomial char hash mod 1e9+7,
  * affine MinHash permutations, LCG hyperplanes) so DuckDB replays the
  * EXACT candidate generation — these are full hash-checked oracles, not
  * rows-only approximations.
  *
  * Scale shape (the 100 TB story): every variant is
  *   per-doc signature (map-side, linear)
  *   → explode to (band, signature) keys
  *   → self-join on the band key (hash shuffle, bucket-sized work)
  *   → DISTINCT candidate pairs
  *   → exact verification on candidates only.
  * No all-pairs product ever materializes; bucket counts grow with the
  * data (unbounded), unlike fixed-cardinality blocking (e.g. a 10-value
  * label column) which degenerates to O(N²/10). Band width tunes the
  * S-curve: more rows/band = fewer false candidates, lower recall.
  */
object NearDup {
  type Q = (SparkSession, String) => DataFrame

  /** Portable polynomial char hash (mod 1e9+7); same helper as TextOps. */
  private def polySql(s: String): String =
    s"aggregate(filter(split($s, ''), ch -> ch <> ''), 0L, " +
      s"(h, ch) -> (h * 31 + ascii(ch)) % 1000000007)"

  private def duckPoly(s: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(range(length($s)), j -> CAST(ascii($s[j+1]) AS BIGINT))), " +
      s"(h, c) -> (h * 31 + c) % 1000000007)"

  /** documents → (doc_id, shl): distinct 3-word-shingle hash set. */
  private def shingleSets(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("toks", split(lower(trim(col("text"))), " "))
      .withColumn("shingles", expr(
        "IF(size(toks) >= 3, transform(sequence(0, size(toks) - 3), " +
          "i -> concat_ws(' ', slice(toks, i + 1, 3))), array())"))
      .select(col("doc_id"),
        expr("array_distinct(transform(shingles, st -> " + polySql("st") + "))")
          .as("shl"))
      .filter(size(col("shl")) >= 2)

  private val duckShingleSets: String =
    "SELECT doc_id, list_distinct(list_transform(shingles, st -> " +
      duckPoly("st") + ")) AS shl FROM (" +
      "SELECT doc_id, CASE WHEN len(toks) >= 3 THEN " +
      "list_transform(range(len(toks) - 2), i -> array_to_string(toks[i+1:i+3], ' ')) " +
      "ELSE [] END AS shingles FROM (" +
      "SELECT doc_id, string_split(lower(trim(text)), ' ') AS toks FROM documents)) " +
      "WHERE len(list_distinct(list_transform(shingles, st -> " + duckPoly("st") +
      "))) >= 2"

  val queries: Map[String, Q] = Map(
    // L2a: MinHash-LSH. 16 affine permutations, 8 bands × 2 rows —
    // P(candidate | jaccard j) = 1-(1-j²)^8, ≈ 0.995 at j = 0.7.
    // Candidates verified with exact Jaccard over the shingle sets.
    "dedup_minhash" -> ((s, d) => {
      val sets = shingleSets(s, d)
      val sigs = sets.withColumn("mh", expr(
        "transform(sequence(0, 15), p -> array_min(transform(shl, " +
          "x -> ((2 * p + 1) * x + (p * p * 7919 + 1)) % 1000000007)))"))
        .select(col("doc_id"), posexplode(expr(
          "transform(sequence(0, 7), b -> concat(" +
            "CAST(mh[CAST(2 * b AS INT)] AS STRING), '-', " +
            "CAST(mh[CAST(2 * b + 1 AS INT)] AS STRING)))")).as(Seq("bd", "sig")))
      val cand = sigs.as("a").join(sigs.as("b"),
          col("a.bd") === col("b.bd") && col("a.sig") === col("b.sig") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
        .distinct()
      cand
        .join(sets.select(col("doc_id").as("id1"), col("shl").as("s1")), "id1")
        .join(sets.select(col("doc_id").as("id2"), col("shl").as("s2")), "id2")
        .select(col("id1"), col("id2"),
          round(expr("size(array_intersect(s1, s2)) / CAST(size(s1) + size(s2) " +
            "- size(array_intersect(s1, s2)) AS DOUBLE)"), 6).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
        .orderBy(col("id1"), col("id2"))
    }),

    // L2b: SimHash. 30-bit signature over the shingle-hash set (the tiny
    // fixture vocabulary makes token-level SimHash indiscriminate), byte
    // blocking: hamming ≤ 3 ⇒ at least one of the 4 blocks is intact.
    "dedup_simhash" -> ((s, d) => {
      val sims = shingleSets(s, d).select(col("doc_id"), expr(
        "aggregate(sequence(0, 29), 0L, (acc, k) -> acc + " +
          "IF(aggregate(shl, 0L, (s2, x) -> s2 + " +
          "IF((shiftright(x, k) & 1) = 1, 1L, -1L)) >= 0L, " +
          "shiftleft(CAST(1 AS BIGINT), k), 0L))").as("sim"))
      val blocks = sims.select(col("doc_id"), col("sim"), posexplode(expr(
        "transform(sequence(0, 3), b -> shiftright(sim, b * 8) & 255)"))
        .as(Seq("bd", "blk")))
      val cand = blocks.as("a").join(blocks.as("b"),
          col("a.bd") === col("b.bd") && col("a.blk") === col("b.blk") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
        .distinct()
      cand
        .join(sims.select(col("doc_id").as("id1"), col("sim").as("sim1")), "id1")
        .join(sims.select(col("doc_id").as("id2"), col("sim").as("sim2")), "id2")
        .select(col("id1"), col("id2"),
          expr("CAST(bit_count(sim1 ^ sim2) AS BIGINT)").as("hamming"))
        .filter(col("hamming") <= 3)
        .orderBy(col("id1"), col("id2"))
    }),

    // L2c: exact word-bigram Jaccard, candidates blocked by document
    // length (each doc lands in buckets ⌊n_chars/64⌋ and +1, so any pair
    // within 64 chars of each other shares a bucket — near-dups always do).
    "dedup_ngram_jaccard" -> ((s, d) => {
      val grams = Tables.documents(s, d)
        .withColumn("toks", split(lower(trim(col("text"))), " "))
        .filter(size(col("toks")) >= 2)
        .select(col("doc_id"), col("n_chars"),
          expr("array_distinct(transform(sequence(0, size(toks) - 2), " +
            "i -> concat_ws(' ', slice(toks, i + 1, 2))))").as("g"))
      val blocks = grams.select(col("doc_id"),
        explode(expr("array(n_chars DIV 64, n_chars DIV 64 + 1)")).as("blk"))
      val cand = blocks.as("a").join(blocks.as("b"),
          col("a.blk") === col("b.blk") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
        .distinct()
      cand
        .join(grams.select(col("doc_id").as("id1"), col("g").as("g1")), "id1")
        .join(grams.select(col("doc_id").as("id2"), col("g").as("g2")), "id2")
        .select(col("id1"), col("id2"),
          round(expr("size(array_intersect(g1, g2)) / CAST(size(g1) + size(g2) " +
            "- size(array_intersect(g1, g2)) AS DOUBLE)"), 6).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
        .orderBy(col("id1"), col("id2"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "dedup_minhash" ->
      (s"WITH sets AS ($duckShingleSets), " +
        "sigs AS (SELECT doc_id, bd, " +
        "CAST(mh[2*bd+1] AS VARCHAR) || '-' || CAST(mh[2*bd+2] AS VARCHAR) AS sig FROM (" +
        "SELECT doc_id, list_transform(range(16), p -> list_min(list_transform(shl, " +
        "x -> ((2*p+1) * x + (p*p*7919 + 1)) % 1000000007))) AS mh FROM sets), " +
        "range(8) t(bd)), " +
        "cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2 FROM sigs a " +
        "JOIN sigs b ON a.bd = b.bd AND a.sig = b.sig AND a.doc_id < b.doc_id) " +
        "SELECT id1, id2, jaccard FROM (SELECT id1, id2, " +
        "round(len(list_intersect(s1.shl, s2.shl)) / CAST(len(s1.shl) + len(s2.shl) " +
        "- len(list_intersect(s1.shl, s2.shl)) AS DOUBLE), 6) AS jaccard " +
        "FROM cand JOIN sets s1 ON s1.doc_id = id1 JOIN sets s2 ON s2.doc_id = id2) " +
        "WHERE jaccard >= 0.5 ORDER BY id1, id2"),

    "dedup_simhash" ->
      (s"WITH sets AS ($duckShingleSets), " +
        "sims AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT), range(30)), " +
        "(acc, k) -> acc + CASE WHEN list_sum(list_transform(shl, " +
        "x -> CASE WHEN (x >> k) & 1 = 1 THEN 1 ELSE -1 END)) >= 0 " +
        "THEN (CAST(1 AS BIGINT) << k) ELSE 0 END) AS sim FROM sets), " +
        "blocks AS (SELECT doc_id, sim, bd, (sim >> (bd * 8)) & 255 AS blk " +
        "FROM sims, range(4) t(bd)), " +
        "cand AS (SELECT DISTINCT a.doc_id AS id1, a.sim AS sim1, " +
        "b.doc_id AS id2, b.sim AS sim2 FROM blocks a " +
        "JOIN blocks b ON a.bd = b.bd AND a.blk = b.blk AND a.doc_id < b.doc_id) " +
        "SELECT id1, id2, CAST(bit_count(xor(sim1, sim2)) AS BIGINT) AS hamming " +
        "FROM cand WHERE bit_count(xor(sim1, sim2)) <= 3 ORDER BY id1, id2"),

    "dedup_ngram_jaccard" ->
      ("WITH grams AS (SELECT doc_id, n_chars, list_distinct(list_transform(" +
        "range(len(toks) - 1), i -> array_to_string(toks[i+1:i+2], ' '))) AS g " +
        "FROM (SELECT doc_id, n_chars, string_split(lower(trim(text)), ' ') AS toks " +
        "FROM documents) WHERE len(toks) >= 2), " +
        "blocks AS (SELECT doc_id, (n_chars // 64) + bd AS blk FROM grams, range(2) t(bd)), " +
        "cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2 FROM blocks a " +
        "JOIN blocks b ON a.blk = b.blk AND a.doc_id < b.doc_id) " +
        "SELECT id1, id2, jaccard FROM (SELECT id1, id2, " +
        "round(len(list_intersect(g1.g, g2.g)) / CAST(len(g1.g) + len(g2.g) " +
        "- len(list_intersect(g1.g, g2.g)) AS DOUBLE), 6) AS jaccard " +
        "FROM cand JOIN grams g1 ON g1.doc_id = id1 JOIN grams g2 ON g2.doc_id = id2) " +
        "WHERE jaccard >= 0.5 ORDER BY id1, id2")
  )
}
