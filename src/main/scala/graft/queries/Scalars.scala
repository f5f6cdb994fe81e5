package graft.queries

import graft.{QueryGroup, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SURVEY §2.H — one multi-column projection query per scalar-function
  * family, D1-sorted. Per-row expressions are IEEE/bit-deterministic, so
  * only libm-backed functions (ln/exp/pow) get ROUND 4; casts avoid the
  * engine-divergent double→int rounding (Spark truncates, DuckDB rounds). */
object Scalars extends QueryGroup {

  def queries: Seq[(String, Q)] = Seq(
    "fn_string" -> ((s, dir) =>
      Tables.customer(s, dir)
        .select(
          col("c_custkey"),
          concat(upper(col("c_mktsegment")), lit(":"), lower(col("c_name"))).as("tag"),
          substring(col("c_name"), 10, 9).as("id_digits"),
          length(col("c_name")).cast("long").as("name_len"),
          trim(lit("  pad  ")).as("trimmed"),
          expr("replace(c_name, 'Customer', 'C')").as("short_name"),
          lpad(col("c_custkey").cast("string"), 12, "0").as("padded"),
          // split result re-joined to one flat string: the driver's
          // comparator cannot hash list columns (round-1 lesson)
          concat_ws("|", split(col("c_name"), "#")).as("parts"),
          regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"))
        .orderBy("c_custkey")),

    // Bitwise family over the 64-bit order key — integer ops are exact
    // in both engines; bit_count is cast to BIGINT (Spark emits INT,
    // DuckDB TINYINT).
    "fn_bitwise" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select(
          col("o_orderkey"),
          (col("o_orderkey").bitwiseAND(lit(255L))).as("lo_byte"),
          (col("o_orderkey").bitwiseOR(lit(4096L))).as("with_flag"),
          (col("o_orderkey").bitwiseXOR(col("o_custkey"))).as("mixed"),
          shiftleft(col("o_orderkey"), 2).as("shl2"),
          shiftright(col("o_orderkey"), 3).as("shr3"),
          bit_count(col("o_orderkey")).cast("long").as("popcnt"))
        .orderBy("o_orderkey")),

    // Regex family over real document text. Patterns stay in the plain
    // character-class/quantifier subset where Java regex (Spark) and RE2
    // (DuckDB) agree; DuckDB's regexp_replace needs the explicit 'g' flag
    // to match Spark's replace-all default.
    "fn_regexp" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(
          col("doc_id"),
          regexp_extract(col("text"), "([A-Za-z]+)", 1).as("first_word"),
          regexp_count(col("text"), lit("[0-9]+")).cast("long").as("n_numbers"),
          col("text").rlike("[0-9]").as("has_digit"),
          regexp_replace(col("text"), "[aeiou]", "*").as("masked"))
        .orderBy("doc_id")),

    "fn_date" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"),
          dayofmonth(col("o_orderdate")).cast("long").as("d"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          (col("o_orderdate") + expr("INTERVAL 14 DAYS")).as("due"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).cast("long").as("days_since"),
          dayofweek(col("o_orderdate")).cast("long").as("dow"),
          last_day(col("o_orderdate")).as("month_end"))
        .orderBy("o_orderkey")),

    "fn_math" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("l_extendedprice"),
          round(col("l_extendedprice"), 1).as("price_r1"),
          floor(col("l_extendedprice")).as("price_floor"),
          ceil(col("l_extendedprice")).as("price_ceil"),
          abs(col("l_quantity") - 25).as("qty_dev"),
          round(pow(col("l_quantity"), 2), 4).as("qty_sq"),
          sqrt(col("l_extendedprice")).as("price_sqrt"),
          round(log(col("l_extendedprice")), 4).as("price_ln"),
          round(exp(col("l_discount")), 4).as("disc_exp"),
          pmod(col("l_orderkey"), lit(7)).as("key_mod"),
          signum(col("l_quantity") - 25).as("qty_sign"))
        .orderBy(graft.Det.liKey.head, graft.Det.liKey.tail: _*)),

    "fn_conditional" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select(
          col("o_orderkey"),
          when(col("o_totalprice") > 200000, "big")
            .when(col("o_totalprice") > 100000, "mid")
            .otherwise("small").as("bucket"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status_or_open"),
          nullif(col("o_orderstatus"), lit("F")).as("status_nf"),
          col("o_orderkey").cast("string").as("key_str"),
          floor(col("o_totalprice")).as("price_floor"),
          col("o_orderpriority").substr(1, 1).cast("int").cast("long").as("prio"))
        .orderBy("o_orderkey")),

    // Safe-cast / safe-arithmetic family: malformed input degrades to
    // NULL instead of failing the job — the ingestion posture over dirty
    // data at scale (one bad row must not kill a 100 TB scan). Spark's
    // try_* functions; DuckDB mirrors with TRY_CAST and NULLIF-guarded
    // division.
    "fn_try_cast" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select(
          col("o_orderkey"),
          expr("try_cast(o_orderpriority AS INT)").as("bad_cast"),
          expr("try_cast(substring(o_orderpriority, 1, 1) AS BIGINT)").as("prio_num"),
          expr("try_cast(o_orderstatus AS DOUBLE)").as("status_num"),
          // single IEEE division (or NULL on zero divisor) — bit-equal
          // in both engines, no rounding discipline needed
          expr("try_divide(o_totalprice, o_custkey % 3)").as("div_or_null"))
        .orderBy("o_orderkey")),

    // Higher-order functions over the embedding vectors. Elements are
    // cast float→double (exact) before arithmetic so both engines
    // compute in double. Array-valued results are serialized to flat
    // strings of scaled integers (floor(x·1e6) — floor and the preceding
    // multiplies are bit-identical IEEE ops in both engines, and
    // long→string formatting is dialect-free, unlike double→string): the
    // driver's comparator cannot hash list columns (round-1 lesson).
    "fn_array" -> ((s, dir) => {
      val embD = transform(col("embedding"), x => x.cast("double"))
      def scaled(a: Column): Column =
        concat_ws(",", transform(a, x => floor(x * 1000000).cast("long").cast("string")))
      Tables.embeddings(s, dir)
        .select(
          col("vec_id"),
          size(col("embedding")).cast("long").as("dim"),
          element_at(col("embedding"), 1).cast("double").as("first_val"),
          scaled(transform(col("embedding"), x => x.cast("double") * 2)).as("doubled"),
          scaled(slice(embD, 2, 3)).as("mid_slice"),
          size(filter(embD, x => x > 0)).cast("long").as("n_pos"),
          round(aggregate(embD, lit(0.0), (acc, x) => acc + x), 6).as("sum_all"))
        .orderBy("vec_id")
    }),

    "fn_json_map" -> ((s, dir) => {
      val m = from_json(col("props"), org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.LongType))
      Tables.events(s, dir)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k_val"),
          concat_ws(",", map_keys(m)).as("keys"),
          concat_ws(",", transform(map_values(m), _.cast("string"))).as("vals"))
        .orderBy("event_id")
    }),

    // Struct construction + field extraction, with the struct flattened
    // back to scalar columns at the output boundary (nested outputs crash
    // the driver's comparator — round-1 lesson).
    "fn_struct" -> ((s, dir) =>
      Tables.supplier(s, dir)
        .select(
          col("s_suppkey"),
          struct(col("s_nationkey").as("nation"), col("s_acctbal").as("bal")).as("info"))
        .select(
          col("s_suppkey"),
          col("info").getField("nation").as("info_nation"),
          col("info").getField("bal").as("info_bal"),
          col("info").getField("bal").as("bal_out"))
        .orderBy("s_suppkey"))
  )

  def oracles: Seq[(String, String)] = Seq(
    "fn_string" ->
      """SELECT c_custkey,
        |  upper(c_mktsegment) || ':' || lower(c_name) AS tag,
        |  substring(c_name, 10, 9) AS id_digits,
        |  CAST(length(c_name) AS BIGINT) AS name_len,
        |  trim('  pad  ') AS trimmed,
        |  replace(c_name, 'Customer', 'C') AS short_name,
        |  lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS padded,
        |  array_to_string(string_split(c_name, '#'), '|') AS parts,
        |  regexp_extract(c_name, '([0-9]+)', 1) AS digits
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "fn_bitwise" ->
      """SELECT o_orderkey,
        |  o_orderkey & 255 AS lo_byte,
        |  o_orderkey | 4096 AS with_flag,
        |  xor(o_orderkey, o_custkey) AS mixed,
        |  o_orderkey << 2 AS shl2,
        |  o_orderkey >> 3 AS shr3,
        |  CAST(bit_count(o_orderkey) AS BIGINT) AS popcnt
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_regexp" ->
      """SELECT doc_id,
        |  regexp_extract(text, '([A-Za-z]+)', 1) AS first_word,
        |  CAST(length(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_numbers,
        |  regexp_matches(text, '[0-9]') AS has_digit,
        |  regexp_replace(text, '[aeiou]', '*', 'g') AS masked
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fn_date" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS d,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  o_orderdate + INTERVAL 14 DAY AS due,
        |  date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
        |  dayofweek(o_orderdate) + 1 AS dow,
        |  last_day(o_orderdate) AS month_end
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_math" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_extendedprice,
        |  round(l_extendedprice, 1) AS price_r1,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        |  abs(l_quantity - 25) AS qty_dev,
        |  round(pow(l_quantity, 2), 4) AS qty_sq,
        |  sqrt(l_extendedprice) AS price_sqrt,
        |  round(ln(l_extendedprice), 4) AS price_ln,
        |  round(exp(l_discount), 4) AS disc_exp,
        |  ((l_orderkey % 7) + 7) % 7 AS key_mod,
        |  CAST(sign(l_quantity - 25) AS DOUBLE) AS qty_sign
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, l_extendedprice""".stripMargin,
    "fn_conditional" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 200000 THEN 'big'
        |       WHEN o_totalprice > 100000 THEN 'mid'
        |       ELSE 'small' END AS bucket,
        |  COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_or_open,
        |  NULLIF(o_orderstatus, 'F') AS status_nf,
        |  CAST(o_orderkey AS VARCHAR) AS key_str,
        |  CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
        |  CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS prio
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_try_cast" ->
      """SELECT o_orderkey,
        |  TRY_CAST(o_orderpriority AS INTEGER) AS bad_cast,
        |  TRY_CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS prio_num,
        |  TRY_CAST(o_orderstatus AS DOUBLE) AS status_num,
        |  o_totalprice / NULLIF(o_custkey % 3, 0) AS div_or_null
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_array" ->
      """SELECT vec_id,
        |  len(embedding) AS dim,
        |  CAST(embedding[1] AS DOUBLE) AS first_val,
        |  array_to_string(list_transform(embedding,
        |    x -> CAST(CAST(floor(CAST(x AS DOUBLE) * 2 * 1000000) AS BIGINT) AS VARCHAR)), ',') AS doubled,
        |  array_to_string(list_transform(embedding[2:4],
        |    x -> CAST(CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS VARCHAR)), ',') AS mid_slice,
        |  len(list_filter(list_transform(embedding, x -> CAST(x AS DOUBLE)), x -> x > 0)) AS n_pos,
        |  round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum'), 6) AS sum_all
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    // vals re-extracts $.k directly (not a generic json_each walk): the
    // events generator pins props to the single-key {"k": <int>} shape
    // (FIXTURES.md) — if that pin ever changes, the Spark side's generic
    // map_values will diverge from this oracle HERE, deliberately.
    "fn_json_map" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
        |  array_to_string(json_keys(props), ',') AS keys,
        |  CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) AS VARCHAR) AS vals
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_struct" ->
      """SELECT s_suppkey,
        |  s_nationkey AS info_nation,
        |  s_acctbal AS info_bal,
        |  s_acctbal AS bal_out
        |FROM supplier ORDER BY s_suppkey""".stripMargin
  )
}
