package graft.queries

import graft.{QueryGroup, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL subquery surface — scalar (correlated and uncorrelated), IN, NOT
  * IN, and correlated EXISTS predicates, entered through `spark.sql`
  * (SURVEY §3.2 entry point) over temp views of the fixture tables.
  *
  * These are the forms Catalyst must DECORRELATE to execute at scale:
  * a correlated scalar COUNT becomes a left-outer aggregate join,
  * IN/EXISTS become left-semi joins, NOT IN becomes the null-aware anti
  * join (`RewritePredicateSubquery`, `RewriteCorrelatedScalarSubquery`).
  * A per-row re-execution of the inner query — what a naive engine does —
  * is O(N·M) and impossible at 100 TB; after the rewrite each key is one
  * shuffled join, so the plans here are the same join shapes §2.C already
  * benchmarks. Plan assertions live in PlanSpec (no BNLJ, semi/anti join
  * present).
  *
  * Determinism: scalar thresholds derive from MIN/MAX (exact under IEEE
  * double in both engines — D2 forbids only non-associative SUM/AVG
  * comparisons); counts are exact integers; D1 sorts on unique keys.
  */
object Subqueries extends QueryGroup {

  /** Register the fixture views this group's SQL reads. DataFrames come
    * from Tables.load, so the session's catalog-cache (and any warmed
    * buffer-pool layout) backs the views too. */
  private def views(s: SparkSession, dir: String): Unit =
    Seq("orders", "customer", "supplier", "lineitem")
      .foreach(n => Tables.load(s, dir, n).createOrReplaceTempView(n))

  private def sql(s: SparkSession, dir: String, q: String): DataFrame = {
    views(s, dir); s.sql(q)
  }

  // One SQL text per key, shared verbatim with the oracle: both engines
  // parse the identical ANSI string (AgreementSpec cross-checks Spark's
  // reading of every oracle, so divergence is caught suite-side).
  private val texts: Seq[(String, String)] = Seq(
    // Uncorrelated scalar subquery: orders in the top decile of the price
    // range. 0.9*MAX is one IEEE multiply on an exact max — deterministic.
    "subq_scalar" ->
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |WHERE o_totalprice > (SELECT 0.9 * MAX(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,

    // Correlated scalar COUNT: decorrelates to customer LEFT JOIN
    // (orders GROUP BY o_custkey) with COALESCE(n, 0).
    "subq_scalar_corr" ->
      """SELECT c_custkey,
        |  (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,

    // IN predicate over a filtered subquery → left-semi join.
    "subq_in" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE c_custkey IN (
        |  SELECT o_custkey FROM orders
        |  WHERE o_totalprice > (SELECT 0.5 * MAX(o_totalprice) FROM orders))
        |ORDER BY c_custkey""".stripMargin,

    // NOT IN → Spark's null-aware anti join (a dedicated physical path:
    // one null in the subquery column would empty the result under
    // three-valued logic, so the engine must track null presence even
    // when — as here, keys are non-null — none occurs). SCALE CONTRACT
    // (round-13 review): Spark plans single-column NOT IN ONLY as a
    // broadcast NAAJ — the subquery side must fit the driver, which
    // holds for dimension-sized inners (this key's shape) but not for
    // a fact-sized one; at that scale use [[graft.Graft.notIn]], the
    // three-valued-logic-exact decomposition into a SHUFFLED anti join
    // plus a one-row null-presence guard (GraftSpec pins it row-equal
    // to this key and exact on the null cases).
    "subq_not_in" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE c_custkey NOT IN (
        |  SELECT o_custkey FROM orders
        |  WHERE o_totalprice > (SELECT 0.5 * MAX(o_totalprice) FROM orders))
        |ORDER BY c_custkey""".stripMargin,

    // Correlated EXISTS with an extra inner predicate → left-semi join on
    // (suppkey) with the filter pushed below the join.
    "subq_exists_corr" ->
      """SELECT s_suppkey, s_name
        |FROM supplier
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem
        |  WHERE l_suppkey = s_suppkey AND l_quantity > 45)
        |ORDER BY s_suppkey""".stripMargin,

    // Correlated LATERAL subquery with ORDER BY + LIMIT — top-2 orders
    // per customer. The engine must decorrelate the per-row LIMIT into a
    // window rank over one join (Spark's DecorrelateInnerQuery), not run
    // the inner query once per customer; the result is the same shape
    // topk_per_group benchmarks. Ties broken by o_orderkey (D6).
    "subq_lateral" ->
      """SELECT c_custkey, o.o_orderkey, o.o_totalprice
        |FROM customer c,
        |LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey
        |  LIMIT 2) o
        |ORDER BY c_custkey, o.o_orderkey""".stripMargin
  )

  def queries: Seq[(String, Q)] =
    texts.map { case (name, q) => name -> ((s: SparkSession, dir: String) => sql(s, dir, q)) }

  def oracles: Seq[(String, String)] = texts
}
