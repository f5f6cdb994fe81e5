package graft.queries

import graft.{Det, QueryGroup, Tables}
import org.apache.spark.sql.functions._

/** SURVEY §2.A scans/sources + §2.B projection/filter. All queries end in
  * a total order over a provably-unique key set (rule D1) — for lineitem
  * that means the full 5-column Det.liKey. */
object Scans extends QueryGroup {
  import Det.{liKey, liKeySql, sumd2}

  def queries: Seq[(String, Q)] = Seq(
    // Full scan, stable order. Catalyst plans a plain FileScan.
    "scan_parquet" -> ((s, dir) =>
      Tables.lineitem(s, dir).orderBy(liKey.head, liKey.tail: _*)),

    // Column pruning: 6 of 11 cols must survive to the parquet reader
    // (ReadSchema in .explain confirms).
    "scan_pruned" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_extendedprice", "l_quantity")
        .orderBy(liKey.head, liKey.tail: _*)),

    // Predicate pushdown to parquet row-group stats (PushedFilters).
    "scan_pushdown" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("2000-01-01 00:00:00").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_extendedprice", "l_shipdate", "l_quantity")
        .orderBy(liKey.head, liKey.tail: _*)),

    // Parse the events.props JSON strings into typed columns.
    "source_json_inline" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(
          col("event_id"), col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy("event_id")),

    // Computed projection — raw double arithmetic is per-row IEEE and
    // bit-identical across engines (no aggregate ⇒ no order dependence).
    "project_expr" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("l_extendedprice"),
          (col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))
            .as("revenue"),
          (col("l_quantity") * col("l_extendedprice")).as("gross"))
        .orderBy(liKey.head, liKey.tail: _*)),

    // Hive-style partition pruning: events materialized once as a
    // date-partitioned layout (Tables.eventsByDay), then read back with
    // a predicate on the partition column — Catalyst resolves it against
    // the directory listing at planning time (PartitionFilters in
    // .explain), so the scan touches 5 of the ~30 date directories and
    // never opens the rest. The d column is emitted as a string on both
    // sides (partition-value type inference yields DATE; the cast keeps
    // the comparator engine-neutral).
    "scan_partition_prune" -> ((s, dir) => {
      val path = Tables.eventsByDay(s, dir)
      s.read.parquet(path)
        .filter(col("d").between("2024-01-10", "2024-01-14"))
        .select(col("event_id"), col("event_type"),
          date_format(col("d"), "yyyy-MM-dd").as("d"))
        .orderBy("event_id")
    }),

    // Dynamic partition pruning — the star-join scan optimization: the
    // fact table is partitioned by day, the calendar dim carries the
    // selective predicate (weekends), and the fact scan's partition list
    // is pruned AT RUNTIME by a subquery over the broadcast dim — the
    // days are not known at plan time, yet only their directories are
    // read. At 100 TB this is the difference between scanning 30 and
    // 3000 partitions of a date-partitioned fact. PlanSpec asserts the
    // dynamicpruning expression lands in the scan's PartitionFilters.
    "join_partition_dpp" -> ((s, dir) => {
      val fact = s.read.parquet(Tables.eventsByDay(s, dir))
      val cal = s.read.parquet(Tables.calendarDim(s, dir))
        .filter(col("dow").isin(1, 7)) // weekends; IN is DPP-selective
      fact.join(cal, Seq("d"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sumd2(col("value")).as("sum_value"))
        .orderBy("event_type")
    }),

    // CSV file source: supplier materialized once as headered CSV
    // (Tables.sideload), read back with an EXPLICIT schema — at 100 TB,
    // inferSchema is a full extra pass over the data; a production ingest
    // always declares the schema and lets the text scan parse straight
    // into typed columns (one task per split, no driver-side sampling).
    // Hash-matching the parquet oracle certifies the full text round-trip
    // (quoting, header, shortest-round-trip doubles).
    "source_csv_file" -> ((s, dir) => {
      val path = Tables.sideload(s, dir, "supplier", "csv")
      s.read
        .schema("s_suppkey BIGINT, s_name STRING, s_nationkey INT, s_acctbal DOUBLE")
        .option("header", "true")
        // validate header names against the declared schema instead of
        // mapping positionally — a reordered/extended sideload file then
        // fails FAST at the scan, not as a hash mismatch downstream
        // (round-12 review)
        .option("enforceSchema", "false")
        .csv(path)
        .orderBy("s_suppkey")
    }),

    // JSON-lines file source, same discipline (explicit schema — JSON
    // inference additionally widens types by sampling; declared types
    // keep the scan single-pass and the columns exactly parquet's).
    "source_json_file" -> ((s, dir) => {
      val path = Tables.sideload(s, dir, "part", "json")
      s.read
        .schema("p_partkey BIGINT, p_name STRING, p_brand STRING, p_size INT, p_retailprice DOUBLE")
        .json(path)
        .select("p_partkey", "p_name", "p_brand", "p_size", "p_retailprice")
        .orderBy("p_partkey")
    }),

    // ORC file source — the second columnar format a lakehouse ingests.
    // Unlike csv/json the types round-trip exactly (no declared-schema
    // re-cast needed), and ORC carries the same pushdown/pruning surface
    // as parquet at scale.
    "source_orc_file" -> ((s, dir) => {
      val path = Tables.sideload(s, dir, "customer", "orc")
      s.read.orc(path)
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    // Schema evolution: two file generations under one table path, the
    // newer with an added column; mergeSchema reconciles the footers at
    // scan time and the pre-evolution rows surface the new column as
    // NULL. The everyday lakehouse read after years of column adds.
    "source_merge_schema" -> ((s, dir) => {
      val path = Tables.ordersEvolved(s, dir)
      s.read.option("mergeSchema", "true").parquet(path)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey")
    }),

    // AND/OR/NOT, IN, BETWEEN, LIKE over part.
    "filter_compound" -> ((s, dir) =>
      Tables.part(s, dir)
        .filter(
          (col("p_brand").like("Brand#1%") &&
            col("p_size").between(5, 40) &&
            !(col("p_size") === 7)) ||
          col("p_brand").isInCollection(Seq("Brand#2", "Brand#22")))
        .orderBy("p_partkey")),

    // 3-valued logic over synthesized nulls (D4): left join against a
    // filtered build side, predicates over the nullable columns, plus a
    // null-safe-equality column.
    "filter_null_semantics" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir).filter(col("c_acctbal") > 5000)
      o.join(c, o("o_custkey") === c("c_custkey"), "left")
        .select(
          col("o_orderkey"), col("c_custkey"), col("c_acctbal"),
          col("c_custkey").isNull.as("unmatched"),
          (col("c_custkey") <=> col("o_custkey")).as("nsafe_eq"))
        .filter(col("c_acctbal").isNull || col("c_acctbal") > 7000)
        .orderBy("o_orderkey")
    })
  )

  def oracles: Seq[(String, String)] = Seq(
    "scan_parquet" ->
      s"SELECT * FROM lineitem ORDER BY $liKeySql",
    "scan_pruned" ->
      s"""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_extendedprice, l_quantity
         |FROM lineitem ORDER BY $liKeySql""".stripMargin,
    "scan_pushdown" ->
      s"""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_extendedprice, l_shipdate, l_quantity
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
         |ORDER BY $liKeySql""".stripMargin,
    "source_json_inline" ->
      """SELECT event_id, event_type,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "project_expr" ->
      s"""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_extendedprice,
         |  l_extendedprice * (1 - l_discount) * (1 + l_tax) AS revenue,
         |  l_quantity * l_extendedprice AS gross
         |FROM lineitem ORDER BY $liKeySql""".stripMargin,
    "scan_partition_prune" ->
      """SELECT event_id, event_type, strftime(ts, '%Y-%m-%d') AS d
        |FROM events
        |WHERE strftime(ts, '%Y-%m-%d') BETWEEN '2024-01-10' AND '2024-01-14'
        |ORDER BY event_id""".stripMargin,
    "source_csv_file" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "source_json_file" ->
      """SELECT p_partkey, p_name, p_brand, p_size, p_retailprice
        |FROM part ORDER BY p_partkey""".stripMargin,
    "source_orc_file" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,
    // DuckDB dayofweek: 0 = Sunday … 6 = Saturday (Spark: 1/7)
    "join_partition_dpp" ->
      s"""SELECT event_type, COUNT(*) AS n,
         |  ${Det.sumd2Sql("value")} AS sum_value
         |FROM events
         |WHERE dayofweek(CAST(ts AS DATE)) IN (0, 6)
         |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "source_merge_schema" ->
      """SELECT o_orderkey, o_totalprice,
        |  CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END AS o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "filter_compound" ->
      """SELECT * FROM part
        |WHERE (p_brand LIKE 'Brand#1%' AND p_size BETWEEN 5 AND 40 AND NOT p_size = 7)
        |   OR p_brand IN ('Brand#2', 'Brand#22')
        |ORDER BY p_partkey""".stripMargin,
    "filter_null_semantics" ->
      """SELECT o_orderkey, c_custkey, c_acctbal,
        |  c_custkey IS NULL AS unmatched,
        |  c_custkey IS NOT DISTINCT FROM o_custkey AS nsafe_eq
        |FROM orders LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 5000) c
        |  ON o_custkey = c_custkey
        |WHERE c_acctbal IS NULL OR c_acctbal > 7000
        |ORDER BY o_orderkey""".stripMargin
  )
}
