package graft.queries

import graft.{Det, QueryGroup, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-quality / pipeline-management operators (SURVEY §2 extensions):
  * column profiling, stratified sampling, CDC-style dimension
  * versioning, string-distance functions, and the runtime-bloom-filter
  * join. These are the operational queries a 100 TB training-data
  * pipeline runs between its transform stages — profile after ingest,
  * sample per stratum for eval sets, version dimensions for
  * point-in-time joins.
  */
object Profile extends QueryGroup {
  import Det._

  private val profiled = Seq("l_quantity", "l_extendedprice", "l_discount")

  /** One-pass profile of 2-decimal numeric columns: per column — row
    * count, exact distinct count, min/max, exact sum (integer cents).
    * All columns profile in a SINGLE scan: one aggregate with every
    * per-column statistic, pivoted to long form afterwards with stack()
    * (|cols| rows out of 1). */
  private[graft] def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__n"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c)).as(s"${c}__min"),
        max(col(c)).as(s"${c}__max"),
        fixedToDbl(sum(cents(col(c))), 100).as(s"${c}__sum"))
    }
    val stackExpr = cols
      .map(c => s"'$c', ${c}__n, ${c}__nd, ${c}__min, ${c}__max, ${c}__sum")
      .mkString(s"stack(${cols.size}, ", ", ", ")")
    df.agg(aggs.head, aggs.tail: _*)
      .select(expr(s"$stackExpr AS (col_name, n, n_distinct, min_v, max_v, sum_v)"))
  }

  def queries: Seq[(String, Q)] = Seq(
    // One-pass column profile: per numeric column — row count, nulls,
    // exact distinct count, min/max, exact sum (cents). All columns
    // profile in a SINGLE scan: one aggregate with every per-column
    // statistic, pivoted to long form afterwards with stack() (3 rows
    // out of 1). The multi-column exact COUNT(DISTINCT) plans one
    // Expand (scan replicated per distinct column) — the honest cost of
    // exactness; at 100 TB the same shape runs with
    // approx_count_distinct (agg_approx_distinct) and the Expand
    // disappears.
    "profile_columns" -> ((s, dir) =>
      profile(Tables.lineitem(s, dir), profiled).orderBy("col_name")),

    // Stratified sampling: per-stratum rates from a (broadcast) config
    // relation, membership decided by a deterministic hash-mod on the
    // row key — reproducible across runs/engines, no RNG state, and at
    // scale it is a map-only filter after a broadcast join (no shuffle).
    "sample_stratified" -> ((s, dir) => {
      import s.implicits._
      val rates = Seq(("click", 10), ("view", 20), ("error", 5),
        ("signup", 50), ("purchase", 100)).toDF("event_type", "pct")
      Tables.events(s, dir)
        .join(broadcast(rates), "event_type")
        .filter(pmod(col("event_id"), lit(100)) < col("pct"))
        .select(col("event_id"), col("event_type"), col("user_id"))
        .orderBy("event_id")
    }),

    // CDC / SCD-2 versioning: each customer's orders become validity
    // intervals [valid_from, valid_to) via lead() over the change
    // sequence; the open interval (valid_to null, is_current=1) is the
    // live version. One window over the natural partition key — linear
    // at scale. D6 tie-break: same-date orders sequence by o_orderkey.
    "cdc_scd2" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("valid_from"),
          date_format(lead(col("o_orderdate"), 1).over(w), "yyyy-MM-dd").as("valid_to"),
          when(lead(col("o_orderdate"), 1).over(w).isNull, 1L).otherwise(0L).as("is_current"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // String-distance functions: edit distance and a length-normalized
    // similarity — the fuzzy-match primitives under entity resolution.
    // Per-row scalar compute (codegen'd), embarrassingly parallel.
    "fn_string_sim" -> ((s, dir) => {
      val lev = levenshtein(col("p_brand"), col("p_type"))
      Tables.part(s, dir)
        .select(col("p_partkey"), lev.cast("long").as("lev"),
          r6(lit(1.0) - lev.cast("double") /
            greatest(length(col("p_brand")), length(col("p_type"))).cast("double"))
            .as("sim"))
        .orderBy("p_partkey")
    }),

    // Selective-dimension join — the shape Spark's runtime bloom filter
    // optimizes: the filtered orders side builds a bloom filter that is
    // pushed into the lineitem scan, cutting the probe-side shuffle to
    // rows that can join (PlanSpec proves the BloomFilter injection at
    // production thresholds; at fixture scale the optimizer correctly
    // declines — the 10 GB probe-side threshold exists precisely so
    // small scans don't pay the filter's cost). Semantics are the plain
    // equi-join + aggregate the oracle checks.
    "join_runtime_bloom" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      Tables.lineitem(s, dir)
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sumd2(col("l_extendedprice")).as("sum_price"))
        .orderBy("l_returnflag")
    })
  )

  def oracles: Seq[(String, String)] = Seq(
    "profile_columns" -> {
      val branches = profiled.map { c =>
        s"""SELECT '$c' AS col_name, COUNT($c) AS n,
           |  COUNT(DISTINCT $c) AS n_distinct,
           |  MIN($c) AS min_v, MAX($c) AS max_v,
           |  ${Det.sumd2Sql(c)} AS sum_v
           |FROM lineitem""".stripMargin
      }
      branches.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },
    "sample_stratified" ->
      """SELECT event_id, event_type, user_id
        |FROM events e
        |JOIN (VALUES ('click', 10), ('view', 20), ('error', 5),
        |             ('signup', 50), ('purchase', 100)) r(event_type, pct)
        |  USING (event_type)
        |WHERE event_id % 100 < pct
        |ORDER BY event_id""".stripMargin,
    "cdc_scd2" ->
      """SELECT o_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
        |  strftime(lead(o_orderdate) OVER w, '%Y-%m-%d') AS valid_to,
        |  CAST(CASE WHEN lead(o_orderdate) OVER w IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "fn_string_sim" ->
      """SELECT p_partkey, levenshtein(p_brand, p_type) AS lev,
        |  ROUND(1.0 - CAST(levenshtein(p_brand, p_type) AS DOUBLE) /
        |    CAST(GREATEST(LENGTH(p_brand), LENGTH(p_type)) AS DOUBLE), 6) AS sim
        |FROM part ORDER BY p_partkey""".stripMargin,
    "join_runtime_bloom" ->
      s"""SELECT l_returnflag, COUNT(*) AS n,
         |  ${Det.sumd2Sql("l_extendedprice")} AS sum_price
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE o_orderpriority = '1-URGENT'
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
