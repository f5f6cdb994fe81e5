package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table loaders for the driver-generated parquet fixtures
  * (`TESTDATA.md:13-15`). All loads are plain parquet scans so Catalyst
  * keeps pushdown/pruning; the only special case is `events`, whose `ts`
  * column is parquet TIMESTAMP(NANOS) — Spark has no nanosecond timestamp
  * type, so we read it as a long (`spark.sql.legacy.parquet.nanosAsLong`)
  * and convert to a microsecond timestamp (floor division, matching
  * DuckDB's TIMESTAMP_NS → TIMESTAMP cast semantics).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Catalog-style metadata cache: the resolved DataFrame (file listing +
  // parquet footer schema) is reused across query builds in the same
  // session. Without it every query build pays a driver-side listing +
  // schema-read job — noise at bench scale, and at 100 TB (100k+ files)
  // re-listing per query is a real cost every production catalog avoids.
  // DataFrames are immutable plans, so sharing is safe.
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(Int, String, String), DataFrame]

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    cache.getOrElseUpdate((System.identityHashCode(spark), sfDir, name), {
      if (name == "events") eventsUncached(spark, sfDir)
      else spark.read.parquet(s"$sfDir/$name.parquet")
    })

  /** events with `ts` as a TimestampType (microsecond precision, UTC). */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "events")

  private def eventsUncached(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    // ts arrives as nanos-since-epoch long; integer-divide to micros
    // (floor for the positive 2024 range) then reinterpret. Must be
    // integral `div` — Column./ is double division and loses 1 µs at
    // 1e18-nano magnitudes.
    raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
