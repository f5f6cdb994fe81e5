package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 (the key inventory) and §7.
  * Each QueryGroup contributes `queries` (Spark builds) and `oracles`
  * (DuckDB-runnable ANSI SQL with identical column names/ordering, SURVEY
  * §2.0 D1–D6).
  */
object SparkEntry {
  private def groups: Seq[QueryGroup] = Seq(
    _root_.graft.queries.Scans,
    _root_.graft.queries.Aggregates,
    _root_.graft.queries.Joins,
    _root_.graft.queries.Subqueries,
    _root_.graft.queries.Windows,
    _root_.graft.queries.SetOps,
    _root_.graft.queries.Scalars,
    _root_.graft.queries.StreamingBatch,
    _root_.graft.queries.ApQueries,
    _root_.graft.queries.Dedup,
    _root_.graft.queries.Matching,
    _root_.graft.queries.TextOps,
    _root_.graft.queries.Profile,
    _root_.graft.queries.UdfSurface
  )

  /** Flagship query on /root/testdata/sf0.001: the reference's own
    * deliverable — AP exemplar cluster sizes (66 rows expected, see
    * FIXTURES.md pinned constants); driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("ap_cluster_sizes")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. Duplicate
    * keys across groups fail LOUD: toMap's silent last-wins would drop
    * a query (and its oracle) from verification with no signal at all
    * (round-12 review). Lazy vals — built and checked once. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    uniqueByKey(groups.flatMap(_.queries), "query")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (D3). */
  lazy val oracleSql: Map[String, String] =
    uniqueByKey(groups.flatMap(_.oracles), "oracle")

  private def uniqueByKey[V](entries: Seq[(String, V)], what: String): Map[String, V] = {
    val dups = entries.groupBy(_._1).filter(_._2.length > 1).keys.toSeq.sorted
    require(dups.isEmpty,
      s"duplicate $what keys across QueryGroups (silently shadowed): ${dups.mkString(", ")}")
    entries.toMap
  }
}
