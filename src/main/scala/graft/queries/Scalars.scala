package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function gauntlets (SURVEY.md §2.7): one wide select per family so
  * each oracle hash checks many functions at once. All are Catalyst builtins
  * (codegen'd, pushdown-friendly) — no UDFs.
  *
  * Dialect notes baked into the oracle twins:
  *  - Spark `log` is natural log but DuckDB `log` is log10 → `ln` on both;
  *  - Spark int-returning functions (length/instr/size/year/hour/...) are
  *    cast to long to match DuckDB's BIGINT;
  *  - DuckDB `dayofweek` is 0-based (Sunday=0), Spark's is 1-based;
  *  - libm functions (exp/ln/pow) may differ in the last ulp between JVM
  *    and C — rounded to 6 decimals;
  *  - `list_distinct` order is unspecified in DuckDB → always sorted after;
  *  - map results are not oracle-compared (parquet map vs DuckDB map repr
  *    drift) — scalar_map is rows-only.
  */
object Scalars {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "scalar_string" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        upper(col("lang")).as("up"),
        trim(concat(lit("  "), col("source"), lit(" "))).as("trimmed"),
        length(col("text")).cast("long").as("len"),
        substring(col("text"), 1, 20).as("head20"),
        concat_ws("-", col("lang"), col("source")).as("tag"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        regexp_extract(col("text"), "(\\w+) (\\w+)", 2).as("second_word"),
        regexp_replace(col("source"), "src", "origin_").as("renamed"),
        lpad(col("lang"), 5, "_").as("padded"),
        instr(col("text"), "the").cast("long").as("the_pos"),
        translate(col("lang"), "aeiou", "AEIOU").as("xlated"),
        reverse(col("lang")).as("rev"),
        repeat(col("lang"), 2).as("dbl"))
        .orderBy(col("doc_id"))),

    "scalar_datetime" -> ((s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        date_trunc("hour", col("ts")).cast("timestamp_ntz").as("ts_hour"),
        year(col("ts")).cast("long").as("yr"),
        month(col("ts")).cast("long").as("mo"),
        dayofmonth(col("ts")).cast("long").as("dom"),
        dayofweek(col("ts")).cast("long").as("dow"),
        hour(col("ts")).cast("long").as("hr"),
        minute(col("ts")).cast("long").as("mi"),
        to_date(col("ts")).cast("timestamp_ntz").as("day"),
        date_add(to_date(col("ts")), 30).cast("timestamp_ntz").as("day_plus30"),
        datediff(lit("2024-02-01").cast("date"), to_date(col("ts")))
          .cast("long").as("days_to_feb"),
        date_format(col("ts"), "yyyy-MM-dd HH").as("fmt"),
        window(col("ts"), "1 hour").getField("start").as("bucket_start"))
        .orderBy(col("event_id"))),

    "scalar_math" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_linenumber") === 1)
        .select(
          col("l_orderkey"),
          round(col("l_quantity") / 7.0, 6).as("q_div"),
          floor(col("l_extendedprice") / 1000.0).as("price_k"),
          ceil(col("l_quantity") / 3.0).as("q_ceil"),
          abs(col("l_discount") - 0.05).as("d_abs"),
          round(pow(col("l_quantity"), 2.0), 6).as("q_sq"),
          round(sqrt(col("l_extendedprice")), 6).as("price_sqrt"),
          round(log(col("l_extendedprice")), 6).as("price_ln"),
          round(exp(col("l_discount")), 6).as("d_exp"),
          signum(col("l_discount") - 0.05).as("d_sign"),
          pmod(col("l_orderkey"), lit(7)).as("key_mod"),
          greatest(col("l_quantity"), col("l_discount") * 100.0).as("gr"),
          least(col("l_tax"), col("l_discount")).as("le"))
        .orderBy(col("l_orderkey"))),

    "scalar_array" -> ((s, d) =>
      Tables.embeddings(s, d).select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        expr("round(aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0D, (acc, x) -> acc + x), 6)").as("sq_norm"),
        expr("round(CAST(array_max(embedding) AS DOUBLE), 6)").as("mx"),
        expr("round(CAST(array_min(embedding) AS DOUBLE), 6)").as("mn"),
        // Array-valued cells crash the driver's pandas sort/hash comparator
        // (unhashable ndarray) — serialize arrays to strings on both
        // engines. Doubles go through %.4f (Java's to-string flips to
        // scientific notation below 1e-3, DuckDB's doesn't); ints via
        // to_json (identical on both).
        // + 0D normalizes -0.0: engines disagree on the sign of a zero
        // rounding result and %.4f would print "-0.0000" on one side
        expr("array_join(transform(slice(embedding, 1, 3), x -> format_string('%.4f', round(CAST(x AS DOUBLE), 4) + 0D)), ',')").as("head3"),
        expr("size(filter(embedding, x -> x > 0))").cast("long").as("n_pos"),
        expr("exists(embedding, x -> x > 0.5)").as("any_big"),
        expr("forall(embedding, x -> x > -10)").as("all_sane"),
        to_json(expr("transform(sequence(1, 3), i -> CAST(i * 2 AS BIGINT))")).as("seq2"),
        expr("array_contains(transform(embedding, x -> x > 0), true)").as("has_pos"))
        .orderBy(col("vec_id"))),

    // Map surface. The map itself never leaves the query (map cells are
    // not comparable across engines); the exploded entries and scalar
    // map-introspection columns are, so this IS oracle-checked.
    "scalar_map" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          map_from_entries(array(
            struct(col("event_type").as("key"), col("value").as("val")),
            // underscore prefix keeps the synthetic key outside the
            // event_type value domain — a data value equal to the literal
            // key would otherwise throw DUPLICATED_MAP_KEY
            struct(lit("_bonus").as("key"), (col("value") / 2.0).as("val")))).as("m"))
        .select(col("event_id"),
          size(map_keys(col("m"))).cast("long").as("nk"),
          explode(col("m")).as(Seq("k", "v")))
        .orderBy(col("event_id"), col("k"))),

    "scalar_json" -> ((s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        json_tuple(col("props"), "k").as(Seq("k_str")),
        to_json(struct(col("event_type").as("t"))).as("as_json"))
        .orderBy(col("event_id"))),

    // Struct build/field-access + the inline Generator (struct-array →
    // rows). Structs never leave the query: the comparator only sees the
    // extracted scalar fields.
    "scalar_struct" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("st", struct(col("event_type").as("t"),
          (col("value") * 2.0).as("v2")))
        .select(col("event_id"),
          col("st.t").as("t"),
          col("st.v2").as("v2"),
          posexplode(expr(
            "array(named_struct('part', 'lo', 'amt', value / 2.0), " +
              "named_struct('part', 'hi', 'amt', value))")))
        .select(col("event_id"), col("t"), col("v2"),
          col("pos").cast("long").as("pos"),
          col("col.part").as("part"), col("col.amt").as("amt"))
        .orderBy(col("event_id"), col("pos"))),

    // §2.10's one scalar-UDF demo — deliberately the ONLY udf() in the
    // engine. It computes the same normalized text key as the builtin
    // expression beside it and the output PROVES row-wise equality
    // (agree = 1 on every row, hash-checked by the oracle). The plan
    // shows why the engine's zero-UDF policy exists: the builtin column
    // is a codegen'd expression Catalyst folds, pushes, and reorders
    // freely, while the UDF is an opaque ScalaUDF node — each call
    // crosses the internal-row ↔ JVM-object boundary (deserialize, box,
    // invoke, re-encode), predicates cannot push through it, and null
    // handling falls back to a runtime wrapper. Use builtins or native
    // Expressions (functions/) for everything real; this row closes the
    // SURVEY §2.10 table and documents the cost of the alternative.
    "udf_norm_key" -> ((s, d) => {
      val normKey = udf((t: String) =>
        if (t == null) null
        else t.trim.toLowerCase(java.util.Locale.ROOT)
          .replaceAll("[^a-z0-9 ]", "").replaceAll(" +", " "))
      val builtin = regexp_replace(regexp_replace(
        lower(trim(col("text"))), "[^a-z0-9 ]", ""), " +", " ")
      Tables.documents(s, d)
        .select(col("doc_id"), normKey(col("text")).as("norm_key"),
          builtin.as("builtin_key"))
        .withColumn("agree",
          (col("norm_key") === col("builtin_key")).cast("long"))
        .select(col("doc_id"), col("norm_key"), col("agree"))
        .orderBy(col("doc_id"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "scalar_string" ->
      """SELECT doc_id, upper(lang) AS up, trim('  ' || source || ' ') AS trimmed, CAST(length(text) AS BIGINT) AS len, substring(text, 1, 20) AS head20, concat_ws('-', lang, source) AS tag, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, regexp_extract(text, '(\w+) (\w+)', 2) AS second_word, regexp_replace(source, 'src', 'origin_') AS renamed, lpad(lang, 5, '_') AS padded, CAST(strpos(text, 'the') AS BIGINT) AS the_pos, translate(lang, 'aeiou', 'AEIOU') AS xlated, reverse(lang) AS rev, repeat(lang, 2) AS dbl FROM documents ORDER BY doc_id""".stripMargin,

    "scalar_datetime" ->
      "SELECT event_id, date_trunc('hour', ts) AS ts_hour, CAST(year(ts) AS BIGINT) AS yr, CAST(month(ts) AS BIGINT) AS mo, CAST(dayofmonth(ts) AS BIGINT) AS dom, CAST(dayofweek(ts) + 1 AS BIGINT) AS dow, CAST(hour(ts) AS BIGINT) AS hr, CAST(minute(ts) AS BIGINT) AS mi, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day, CAST(CAST(ts AS DATE) + 30 AS TIMESTAMP) AS day_plus30, CAST(date_diff('day', CAST(ts AS DATE), DATE '2024-02-01') AS BIGINT) AS days_to_feb, strftime(ts, '%Y-%m-%d %H') AS fmt, time_bucket(INTERVAL 1 HOUR, ts) AS bucket_start FROM events ORDER BY event_id",

    "scalar_math" ->
      "SELECT l_orderkey, round(l_quantity / 7.0, 6) AS q_div, CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS price_k, CAST(ceil(l_quantity / 3.0) AS BIGINT) AS q_ceil, abs(l_discount - 0.05) AS d_abs, round(pow(l_quantity, 2.0), 6) AS q_sq, round(sqrt(l_extendedprice), 6) AS price_sqrt, round(ln(l_extendedprice), 6) AS price_ln, round(exp(l_discount), 6) AS d_exp, CAST(sign(l_discount - 0.05) AS DOUBLE) AS d_sign, ((l_orderkey % 7) + 7) % 7 AS key_mod, greatest(l_quantity, l_discount * 100.0) AS gr, least(l_tax, l_discount) AS le FROM lineitem WHERE l_linenumber = 1 ORDER BY l_orderkey",

    "scalar_array" ->
      "SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim, round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS sq_norm, round(CAST(list_max(embedding) AS DOUBLE), 6) AS mx, round(CAST(list_min(embedding) AS DOUBLE), 6) AS mn, array_to_string(list_transform(embedding[1:3], x -> printf('%.4f', round(CAST(x AS DOUBLE), 4) + 0.0)), ',') AS head3, CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos, len(list_filter(embedding, x -> x > 0.5)) > 0 AS any_big, len(list_filter(embedding, x -> NOT (x > -10))) = 0 AS all_sane, to_json([CAST(2 AS BIGINT), 4, 6]) AS seq2, list_contains(list_transform(embedding, x -> x > 0), true) AS has_pos FROM embeddings ORDER BY vec_id",

    "scalar_map" ->
      "SELECT event_id, CAST(2 AS BIGINT) AS nk, k, v FROM (SELECT event_id, event_type AS k, value AS v FROM events UNION ALL SELECT event_id, '_bonus' AS k, value / 2.0 AS v FROM events) ORDER BY event_id, k",

    "scalar_json" ->
      "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, json_extract_string(props, '$.k') AS k_str, to_json(struct_pack(t := event_type)) AS as_json FROM events ORDER BY event_id",

    "scalar_struct" ->
      "SELECT event_id, t, v2, pos, part, amt FROM (SELECT event_id, event_type AS t, value * 2.0 AS v2, CAST(0 AS BIGINT) AS pos, 'lo' AS part, value / 2.0 AS amt FROM events UNION ALL SELECT event_id, event_type AS t, value * 2.0 AS v2, CAST(1 AS BIGINT) AS pos, 'hi' AS part, value AS amt FROM events) ORDER BY event_id, pos",

    // the oracle replays the BUILTIN normalization and pins agree = 1:
    // a UDF-vs-builtin divergence on any row breaks the hash.
    "udf_norm_key" ->
      "SELECT doc_id, regexp_replace(regexp_replace(lower(trim(text)), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g') AS norm_key, CAST(1 AS BIGINT) AS agree FROM documents ORDER BY doc_id"
  )
}
