package graft.functions

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** §2.7 Scalar function packs — one multi-column query per family, all
  * codegen'd built-ins (no UDFs). Floating outputs of transcendental
  * functions are rounded to 6dp (libm ulp differences between JVM and
  * DuckDB vanish well below that); integer/string functions need no
  * rounding.
  */
object FnQueries {

  val queries: Map[String, Q] = Map(
    "fn_string" -> ((s, dir) => {
      Tables.part(s, dir)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("up_name"),
          lower(col("p_type")).as("lo_type"),
          trim(concat(lit("  "), col("p_brand"), lit("  "))).as("trimmed"),
          substring(col("p_name"), 1, 5).as("sub5"),
          concat_ws("-", col("p_brand"), col("p_type")).as("joined"),
          length(col("p_name")).as("name_len"),
          lpad(col("p_brand"), 12, "*").as("padded"),
          regexp_replace(col("p_name"), " ", "_").as("underscored"),
          regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
          element_at(split(col("p_name"), " "), 1).as("split_first"))
        .orderBy(col("p_partkey"))
    }),

    "fn_date" -> ((s, dir) => {
      Tables.orders(s, dir)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          quarter(col("o_orderdate")).as("qtr"),
          dayofweek(col("o_orderdate")).as("dow"),
          date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
          datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).as("days_since"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          last_day(col("o_orderdate").cast("date")).as("month_end"))
        .orderBy(col("o_orderkey"))
    }),

    "fn_math" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_quantity") - 25).as("abs_dev"),
          round(col("l_extendedprice") / 7, 2).as("div7"),
          floor(col("l_extendedprice") / 1000).cast("long").as("floor_k"),
          ceil(col("l_extendedprice") / 1000).cast("long").as("ceil_k"),
          round(sqrt(col("l_extendedprice")), 6).as("sqrt_p"),
          pow(col("l_quantity"), 2).as("qty_sq"),
          pmod(floor(col("l_quantity")).cast("int"), lit(5)).as("qty_mod5"),
          round(log(col("l_extendedprice")), 6).as("ln_p"),
          round(exp(col("l_discount")), 6).as("exp_d"),
          signum(col("l_discount") - 0.05).as("sign_d"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    "fn_conditional" -> ((s, dir) => {
      Tables.orders(s, dir)
        .select(
          col("o_orderkey"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status_or_open"),
          greatest(col("o_totalprice"), lit(100000.0)).as("at_least_100k"),
          least(col("o_totalprice"), lit(100000.0)).as("at_most_100k"),
          when(col("o_orderpriority") === "1-URGENT",
            when(col("o_totalprice") > 200000, "urgent_big").otherwise("urgent_small"))
            .otherwise("normal").as("nested_case"))
        .orderBy(col("o_orderkey"))
    }),

    "fn_array" -> ((s, dir) => {
      Tables.documents(s, dir)
        .withColumn("toks", split(col("text"), " "))
        .select(
          col("doc_id"),
          size(col("toks")).as("n_toks"),
          array_contains(col("toks"), "spark").as("has_spark"),
          // array outputs serialized to CSV strings: the driver comparator
          // can't hash array cells, so both sides emit text (ops unchanged)
          array_join(slice(col("toks"), 1, 3), ",").as("first3"),
          array_join(sort_array(array_distinct(col("toks"))), ",").as("vocab"),
          array_join(transform(col("toks"), x => upper(x)), ",").as("upper_toks"),
          array_join(filter(col("toks"), x => length(x) > 4), ",").as("long_toks"),
          aggregate(transform(col("toks"), x => length(x)), lit(0), (a, x) => a + x).as("total_chars"),
          array_join(flatten(array(slice(col("toks"), 1, 2), slice(col("toks"), 3, 2))), ",").as("first4"))
        .orderBy(col("doc_id"))
    }),

    "fn_map" -> ((s, dir) => {
      Tables.part(s, dir)
        .withColumn("m", map(lit("brand"), col("p_brand"), lit("type"), col("p_type")))
        .withColumn("sm", str_to_map(
          concat(lit("b:"), col("p_brand"), lit(",t:"), col("p_type")), lit(","), lit(":")))
        .select(
          col("p_partkey"),
          element_at(col("m"), "brand").as("brand_val"),
          element_at(col("m"), "type").as("type_val"),
          array_join(sort_array(map_keys(col("m"))), ",").as("mkeys"),
          element_at(col("sm"), "b").as("sm_b"),
          element_at(col("sm"), "t").as("sm_t"),
          size(col("sm")).as("sm_size"))
        .orderBy(col("p_partkey"))
    }),

    // regex surface: replace-all, group extract, match predicate — all
    // patterns restricted to syntax RE2 (DuckDB) and java.util.regex
    // agree on
    "fn_regex" -> ((s, dir) => {
      Tables.part(s, dir).select(
          col("p_partkey"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
          regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
          col("p_name").rlike("^[a-z]+ ").as("starts_word"))
        .orderBy(col("p_partkey"))
    }),

    // bitwise surface: and/or/xor, shifts, popcount — the hash/bucket/
    // flag arithmetic every fingerprinting pipeline leans on
    "fn_bitwise" -> ((s, dir) => {
      Tables.orders(s, dir).select(
          col("o_orderkey"),
          col("o_orderkey").bitwiseAND(lit(255L)).as("band"),
          col("o_orderkey").bitwiseOR(lit(4096L)).as("bor"),
          col("o_orderkey").bitwiseXOR(col("o_custkey")).as("bxor"),
          shiftleft(col("o_orderkey"), 3).as("shl"),
          shiftright(col("o_orderkey"), 2).as("shr"),
          bit_count(col("o_orderkey")).as("popcount"))
        .orderBy(col("o_orderkey"))
    }),

    // trigonometric/angular surface. The input is folded to an exact
    // rational in [0,1) (floor % 1000 / 1000) so no argument lands near a
    // tan singularity — libm ulp differences stay far below the 6dp round.
    "fn_trig" -> ((s, dir) => {
      val x = (floor(col("o_totalprice")).cast("bigint") % 1000).cast("double") / 1000.0
      Tables.orders(s, dir).select(
          col("o_orderkey"),
          round(sin(x), 6).as("sin_x"),
          round(cos(x), 6).as("cos_x"),
          round(tan(x), 6).as("tan_x"),
          round(atan2(x, lit(2.0)), 6).as("atan2_x"),
          round(degrees(x), 6).as("deg_x"),
          round(radians(x), 6).as("rad_x"),
          round(hypot(x, lit(1.0)), 6).as("hyp_x"))
        .orderBy(col("o_orderkey"))
    }),

    // higher-order array surface #2: exists/forall predicates, zip_with
    // pairing, position/remove — complements fn_array's
    // transform/filter/aggregate
    "fn_array2" -> ((s, dir) => {
      Tables.documents(s, dir)
        .withColumn("toks", split(col("text"), " "))
        .select(
          col("doc_id"),
          exists(col("toks"), x => x === "spark").as("has_spark"),
          forall(col("toks"), x => length(x) > 2).as("all_long"),
          array_join(zip_with(
            slice(col("toks"), 1, 3),
            transform(slice(col("toks"), 1, 3), x => length(x).cast("string")),
            (a, b) => concat(a, lit(":"), b)), ",").as("tagged3"),
          array_position(col("toks"), "spark").as("spark_pos"),
          size(array_remove(col("toks"), "the")).as("n_no_the"))
        .orderBy(col("doc_id"))
    }),

    // VARIANT semi-structured navigation (Spark 4's open JSON type):
    // parse once, extract typed values by path. At 100 TB this is the
    // schema-on-read path for heterogeneous event payloads — the variant
    // binary encoding is columnar-shreddable, so extraction stays in the
    // scan instead of re-parsing JSON strings per query. Missing paths
    // yield NULL (not errors), matching json_extract semantics.
    // CSV codec pack: to_csv packs a struct into a CSV line, from_csv
    // parses it back under an explicit schema — the serialize/parse pair
    // for CSV-shaped message payloads (Kafka values, log lines). The
    // declared result is the ROUNDTRIP (parse ∘ serialize ≡ identity),
    // so the oracle is the original columns: any quoting/formatting
    // asymmetry between the two directions breaks the hash. Projection
    // only — codegen, no shuffle.
    "fn_csv" -> ((s, dir) => {
      val csvSchema = "k INT, name STRING, price DOUBLE"
      Tables.part(s, dir)
        .select(col("p_partkey"),
          to_csv(struct(col("p_partkey").cast("int").as("k"),
            col("p_name").as("name"),
            col("p_retailprice").as("price"))).as("line"))
        .select(col("p_partkey"),
          from_csv(col("line"),
            org.apache.spark.sql.types.StructType.fromDDL(csvSchema),
            Map.empty[String, String]).as("rec"))
        .select(col("p_partkey"), col("rec.k").as("k"), col("rec.name").as("name"),
          round(col("rec.price"), 2).as("price"))
        .orderBy(col("p_partkey"))
    }),

    "fn_variant" -> ((s, dir) => {
      val v = parse_json(col("props"))
      val nested = parse_json(
        concat(lit("""{"a":{"b":"""), col("props"), lit("}}")))
      Tables.events(s, dir).select(
          col("event_id"),
          variant_get(v, "$.k", "bigint").as("k_int"),
          variant_get(v, "$.k", "double").as("k_dbl"),
          variant_get(nested, "$.a.b.k", "bigint").as("nested_k"),
          variant_get(v, "$.missing", "bigint").as("missing_val"),
          variant_get(v, "$.missing", "bigint").isNull.as("missing_is_null"))
        .orderBy(col("event_id"))
    }),

    // string surface #2: positional split/slice plus levenshtein (the
    // edit-distance primitive behind fuzzy entity matching) — all
    // codegen built-ins, deterministic across engines
    "fn_string2" -> ((s, dir) => {
      Tables.part(s, dir)
        .select(
          col("p_partkey"),
          rpad(col("p_brand"), 12, "*").as("rpadded"),
          expr("repeat(substring(p_type, 1, 2), 3)").as("repeated"),
          expr("split_part(p_type, ' ', 2)").as("type_word2"),
          expr("left(p_name, 4)").as("left4"),
          expr("right(p_name, 3)").as("right3"),
          instr(col("p_name"), "a").as("first_a"),
          levenshtein(col("p_brand"), col("p_type")).as("lev_bt"))
        .orderBy(col("p_partkey"))
    }),

    // timezone conversions (IANA zones, DST-correct). Only the
    // instant→local direction is declared: local→instant is ambiguous
    // during DST fall-back and engines may legally disagree on the
    // chosen offset; instant→local is total and unique.
    "fn_tz" -> ((s, dir) => {
      val ny = from_utc_timestamp(col("ts"), "America/New_York")
      Tables.events(s, dir).select(
          col("event_id"),
          ny.as("ny_local"),
          from_utc_timestamp(col("ts"), "Asia/Tokyo").as("tokyo_local"),
          hour(ny).as("ny_hour"),
          ny.cast("date").as("ny_date"))
        .orderBy(col("event_id"))
    }),

    // cryptographic digests — content addressing / stable sharding keys
    // (md5 and sha-256 are bit-identical across engines; the md5 prefix
    // doubles as a portable uniform hash for splits, cf. sample_hash)
    "fn_hash" -> ((s, dir) => {
      Tables.customer(s, dir).select(
          col("c_custkey"),
          md5(col("c_name")).as("md5_name"),
          sha2(col("c_name"), 256).as("sha256_name"),
          substring(md5(col("c_name")), 1, 8).as("md5_prefix"),
          length(sha2(col("c_name"), 256)).as("sha_len"))
        .orderBy(col("c_custkey"))
    }),

    // binary/text encodings: base64 + hex + roundtrips, char/ascii,
    // reverse/translate — the serialization surface an interchange
    // pipeline leans on (all codegen'd built-ins, bit-identical across
    // engines)
    "fn_encode" -> ((s, dir) => {
      Tables.part(s, dir).select(
          col("p_partkey"),
          base64(col("p_brand").cast("binary")).as("b64"),
          unbase64(base64(col("p_brand").cast("binary"))).cast("string").as("b64_rt"),
          hex(col("p_brand")).as("hexed"),
          unhex(hex(col("p_brand"))).cast("string").as("hex_rt"),
          ascii(col("p_type")).as("first_ascii"),
          reverse(col("p_brand")).as("reversed"),
          translate(lower(col("p_type")), "aeiou", "AEIOU").as("upvoweled"))
        .orderBy(col("p_partkey"))
    }),

    // URL parsing: parse_url components checked against the ground truth
    // the URL was constructed from (DuckDB 1.0 has no parse_url — the
    // oracle recomputes components from the same inputs)
    "fn_url" -> ((s, dir) => {
      Tables.documents(s, dir)
        .withColumn("url", concat(lit("https://"), col("source"),
          lit(".example.com/docs/"), col("doc_id").cast("string"),
          lit("?lang="), col("lang")))
        .select(col("doc_id"), col("url"),
          parse_url(col("url"), lit("HOST")).as("host"),
          parse_url(col("url"), lit("PATH")).as("path"),
          parse_url(col("url"), lit("QUERY"), lit("lang")).as("qlang"),
          parse_url(col("url"), lit("PROTOCOL")).as("proto"))
        .orderBy(col("doc_id"))
    }),

    "fn_json" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.IntegerType)))).getField("k").as("k_int"),
          json_tuple(col("props"), "k").as("k_tup"))
        .orderBy(col("event_id"))
    })
  )

  val oracle: Map[String, String] = Map(
    "fn_string" ->
      """SELECT p_partkey,
        |  upper(p_name) AS up_name,
        |  lower(p_type) AS lo_type,
        |  trim('  ' || p_brand || '  ') AS trimmed,
        |  substring(p_name, 1, 5) AS sub5,
        |  concat_ws('-', p_brand, p_type) AS joined,
        |  length(p_name) AS name_len,
        |  lpad(p_brand, 12, '*') AS padded,
        |  replace(p_name, ' ', '_') AS underscored,
        |  regexp_extract(p_name, '^(\w+)', 1) AS first_word,
        |  str_split(p_name, ' ')[1] AS split_first
        |FROM part ORDER BY p_partkey""".stripMargin,

    "fn_date" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS yr,
        |  month(o_orderdate) AS mo,
        |  dayofmonth(o_orderdate) AS dom,
        |  quarter(o_orderdate) AS qtr,
        |  dayofweek(o_orderdate) + 1 AS dow,
        |  CAST(o_orderdate AS DATE) + 30 AS plus30,
        |  datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "fn_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_quantity - 25) AS abs_dev,
        |  round(l_extendedprice / 7, 2) AS div7,
        |  CAST(floor(l_extendedprice / 1000) AS BIGINT) AS floor_k,
        |  CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS ceil_k,
        |  round(sqrt(l_extendedprice), 6) AS sqrt_p,
        |  pow(l_quantity, 2) AS qty_sq,
        |  CAST(floor(l_quantity) AS INT) % 5 AS qty_mod5,
        |  round(ln(l_extendedprice), 6) AS ln_p,
        |  round(exp(l_discount), 6) AS exp_d,
        |  CAST(sign(l_discount - 0.05) AS DOUBLE) AS sign_d
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "fn_conditional" ->
      """SELECT o_orderkey,
        |  coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open,
        |  greatest(o_totalprice, 100000.0) AS at_least_100k,
        |  least(o_totalprice, 100000.0) AS at_most_100k,
        |  CASE WHEN o_orderpriority = '1-URGENT' THEN
        |    CASE WHEN o_totalprice > 200000 THEN 'urgent_big' ELSE 'urgent_small' END
        |  ELSE 'normal' END AS nested_case
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "fn_array" ->
      """SELECT doc_id,
        |  len(toks) AS n_toks,
        |  list_contains(toks, 'spark') AS has_spark,
        |  array_to_string(toks[1:3], ',') AS first3,
        |  array_to_string(list_sort(list_distinct(toks)), ',') AS vocab,
        |  array_to_string(list_transform(toks, x -> upper(x)), ',') AS upper_toks,
        |  array_to_string(list_filter(toks, x -> length(x) > 4), ',') AS long_toks,
        |  CAST(list_sum(list_transform(toks, x -> length(x))) AS INT) AS total_chars,
        |  array_to_string(flatten([toks[1:2], toks[3:4]]), ',') AS first4
        |FROM (SELECT doc_id, str_split(text, ' ') AS toks FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "fn_map" ->
      """SELECT p_partkey,
        |  p_brand AS brand_val,
        |  p_type AS type_val,
        |  'brand,type' AS mkeys,
        |  p_brand AS sm_b,
        |  p_type AS sm_t,
        |  2 AS sm_size
        |FROM part ORDER BY p_partkey""".stripMargin,

    "fn_regex" ->
      """SELECT p_partkey,
        |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
        |  regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
        |  regexp_matches(p_name, '^[a-z]+ ') AS starts_word
        |FROM part ORDER BY p_partkey""".stripMargin,

    "fn_bitwise" ->
      """SELECT o_orderkey,
        |  o_orderkey & 255 AS band,
        |  o_orderkey | 4096 AS bor,
        |  xor(o_orderkey, o_custkey) AS bxor,
        |  o_orderkey << 3 AS shl,
        |  o_orderkey >> 2 AS shr,
        |  CAST(bit_count(o_orderkey) AS INT) AS popcount
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "fn_trig" ->
      """SELECT o_orderkey,
        |  round(sin(x), 6) AS sin_x,
        |  round(cos(x), 6) AS cos_x,
        |  round(tan(x), 6) AS tan_x,
        |  round(atan2(x, 2.0), 6) AS atan2_x,
        |  round(degrees(x), 6) AS deg_x,
        |  round(radians(x), 6) AS rad_x,
        |  round(sqrt(x * x + 1.0), 6) AS hyp_x
        |FROM (SELECT o_orderkey,
        |        CAST(CAST(floor(o_totalprice) AS BIGINT) % 1000 AS DOUBLE) / 1000.0 AS x
        |      FROM orders)
        |ORDER BY o_orderkey""".stripMargin,

    "fn_array2" ->
      """WITH d AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id,
        |  len(list_filter(toks, x -> x = 'spark')) > 0 AS has_spark,
        |  len(list_filter(toks, x -> NOT (length(x) > 2))) = 0 AS all_long,
        |  array_to_string(list_transform(range(1, least(len(toks), 3) + 1),
        |    i -> toks[i] || ':' || CAST(length(toks[i]) AS VARCHAR)), ',') AS tagged3,
        |  coalesce(list_position(toks, 'spark'), 0) AS spark_pos,
        |  len(list_filter(toks, x -> x != 'the')) AS n_no_the
        |FROM d ORDER BY doc_id""".stripMargin,

    "fn_string2" ->
      """SELECT p_partkey,
        |  rpad(p_brand, 12, '*') AS rpadded,
        |  repeat(substring(p_type, 1, 2), 3) AS repeated,
        |  split_part(p_type, ' ', 2) AS type_word2,
        |  left(p_name, 4) AS left4,
        |  right(p_name, 3) AS right3,
        |  instr(p_name, 'a') AS first_a,
        |  levenshtein(p_brand, p_type) AS lev_bt
        |FROM part ORDER BY p_partkey""".stripMargin,

    "fn_tz" ->
      """SELECT event_id,
        |  timezone('America/New_York', CAST(ts AS TIMESTAMPTZ)) AS ny_local,
        |  timezone('Asia/Tokyo', CAST(ts AS TIMESTAMPTZ)) AS tokyo_local,
        |  CAST(date_part('hour', timezone('America/New_York', CAST(ts AS TIMESTAMPTZ))) AS INT) AS ny_hour,
        |  CAST(timezone('America/New_York', CAST(ts AS TIMESTAMPTZ)) AS DATE) AS ny_date
        |FROM events ORDER BY event_id""".stripMargin,

    // roundtrip identity: the oracle is simply the original columns
    "fn_csv" ->
      """SELECT p_partkey, CAST(p_partkey AS INT) AS k, p_name AS name,
        |  round(p_retailprice, 2) AS price
        |FROM part ORDER BY p_partkey""".stripMargin,

    "fn_variant" ->
      """SELECT event_id,
        |  CAST(json_extract(props, '$.k') AS BIGINT) AS k_int,
        |  CAST(json_extract(props, '$.k') AS DOUBLE) AS k_dbl,
        |  CAST(json_extract('{"a":{"b":' || props || '}}', '$.a.b.k') AS BIGINT) AS nested_k,
        |  CAST(json_extract(props, '$.missing') AS BIGINT) AS missing_val,
        |  json_extract(props, '$.missing') IS NULL AS missing_is_null
        |FROM events ORDER BY event_id""".stripMargin,

    "fn_hash" ->
      """SELECT c_custkey,
        |  md5(c_name) AS md5_name,
        |  sha256(c_name) AS sha256_name,
        |  substring(md5(c_name), 1, 8) AS md5_prefix,
        |  length(sha256(c_name)) AS sha_len
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "fn_encode" ->
      """SELECT p_partkey,
        |  base64(CAST(p_brand AS BLOB)) AS b64,
        |  CAST(from_base64(base64(CAST(p_brand AS BLOB))) AS VARCHAR) AS b64_rt,
        |  hex(p_brand) AS hexed,
        |  CAST(unhex(hex(p_brand)) AS VARCHAR) AS hex_rt,
        |  ascii(p_type) AS first_ascii,
        |  reverse(p_brand) AS reversed,
        |  translate(lower(p_type), 'aeiou', 'AEIOU') AS upvoweled
        |FROM part ORDER BY p_partkey""".stripMargin,

    "fn_url" ->
      """SELECT doc_id,
        |  'https://' || source || '.example.com/docs/' || CAST(doc_id AS VARCHAR)
        |    || '?lang=' || lang AS url,
        |  source || '.example.com' AS host,
        |  '/docs/' || CAST(doc_id AS VARCHAR) AS path,
        |  lang AS qlang,
        |  'https' AS proto
        |FROM documents ORDER BY doc_id""".stripMargin,

    "fn_json" ->
      """SELECT event_id,
        |  (props->>'$.k') AS k_str,
        |  CAST(props->>'$.k' AS INT) AS k_int,
        |  (props->>'$.k') AS k_tup
        |FROM events ORDER BY event_id""".stripMargin
  )
}
