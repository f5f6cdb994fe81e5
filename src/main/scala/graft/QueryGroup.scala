package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of SparkEntry queries + their DuckDB oracle SQL.
  * Each operator group (SURVEY §2.A–L) implements this; SparkEntry
  * concatenates them. Keys without oracle SQL get the driver's weaker
  * rows-only check (SURVEY §2.0 rule D3).
  */
trait QueryGroup {
  type Q = (SparkSession, String) => DataFrame
  def queries: Seq[(String, Q)]
  def oracles: Seq[(String, String)]
}
