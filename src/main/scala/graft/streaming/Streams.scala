package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import org.apache.spark.sql.types._

/** SURVEY §2.I — true Structured Streaming execution of the engine's
  * stream operators. The same transforms back the batch-equivalent
  * queries in [[graft.queries.StreamingBatch]]; here they run over a
  * replayable file-source stream with watermarks and the state store
  * (exercised by the streaming test suite — D3, not the SQL oracle). */
object Streams {

  /** events schema after the nanos→micros conversion Tables.events does
    * for batch (a file-source stream needs an explicit schema). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source events stream over a directory of parquet chunks.
    * maxFilesPerTrigger=1 makes each chunk one micro-batch, so the
    * watermark advances between chunks — the replay harness for
    * late-data semantics. */
  def eventsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(eventsSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)

  /** 1-hour tumbling count+sum per event_type with a 10-min watermark
    * (append mode ⇒ a window only emits once it's closed). */
  def tumbling(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"), col("sum_value"))

  /** Streaming dedup: first event per (user_id, event_type) within the
    * watermark horizon. */
  def dedup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicates(Seq("user_id", "event_type"))

  /** Per-user session windows (30-minute gap). */
  def sessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start").as("ws"), col("w.end").as("we"), col("n"))

  /** Stream-static enrichment: the events stream joined to a broadcast
    * static dimension (re-resolved per micro-batch — the standard dim
    * refresh semantics). */
  def enrich(events: DataFrame, customer: DataFrame): DataFrame =
    events.join(
        broadcast(customer.select(col("c_custkey"), col("c_name"))),
        col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("user_id"), col("c_name"), col("value"))

  /** Stream-stream interval self-join: purchases matched to the same
    * user's clicks in the preceding hour. Watermarks on BOTH sides plus
    * the time-range condition let the state store evict clicks older
    * than (watermark − 1 h) — bounded state, the requirement for an
    * unbounded 100 TB/day stream. */
  def clickToPurchase(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("cts"))
      .withWatermark("cts", "2 hours")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("pts"))
      .withWatermark("pts", "2 hours")
    purchases.join(clicks,
        col("p_user") === col("c_user") &&
        col("cts") <= col("pts") &&
        col("cts") >= col("pts") - expr("INTERVAL 1 HOUR"))
      .select(col("purchase_id"), col("click_id"), col("p_user").as("user_id"))
  }

  /** Arbitrary stateful op: running per-user event count — each event
    * emits the user's count so far. Implemented on `transformWithState`
    * (the Spark 4-current arbitrary-state API; supersedes
    * flatMapGroupsWithState per SURVEY §7.4-5) with a ValueState[Long]
    * per user. Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass` — the API rejects
    * the default HDFS-backed store). */
  def runningCounts(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    events
      .select(col("user_id"), col("event_id"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new RunningCountProcessor,
        TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "event_id", "running_n")
  }
}

/** Per-user running count as a [[StatefulProcessor]]: one ValueState[Long]
  * holds the count-so-far; each input batch's rows are processed in
  * event_id order (deterministic within a replay chunk). */
class RunningCountProcessor
    extends StatefulProcessor[Long, (Long, Long), (Long, Long, Long)] {
  @transient private var count: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    count = getHandle.getValueState[Long]("count", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(
      userId: Long,
      rows: Iterator[(Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
    var n = if (count.exists()) count.get() else 0L
    val out = rows.toSeq.sortBy(_._2).map { case (_, eventId) =>
      n += 1
      (userId, eventId, n)
    }
    count.update(n)
    out.iterator
  }
}
