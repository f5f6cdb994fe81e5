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
      // sum_value via the Det cents encoding — the SAME aggregate as the
      // batch twin (StreamingBatch.hourlyAggPlan): a plain double sum()
      // is state-merge-order dependent in its final ulps, so replays of
      // identical data could emit different bits (round-12 review)
      .agg(count(lit(1)).as("n"), graft.Det.sumd2(col("value")).as("sum_value"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"), col("sum_value"))

  /** Streaming dedup: first event per (user_id, event_type) — EXACT
    * global semantics (the batch twin stream_dedup's contract). State
    * discipline (round-12 review): with the event-time column absent
    * from the key subset, Spark never evicts dedup state by watermark —
    * state is bounded by the KEY CARDINALITY (|users|·|types| here),
    * not by the horizon. That is the right trade for entity-keyed
    * dedup; for an unbounded key space use [[dedupWithinHorizon]]. */
  def dedup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicates(Seq("user_id", "event_type"))

  /** Horizon-bounded streaming dedup (`dropDuplicatesWithinWatermark`):
    * duplicates are suppressed only within the watermark horizon and
    * state IS evicted as the watermark advances — the form an
    * unbounded-cardinality key space (content digests, URLs) needs at
    * 100 TB/day, trading exactness across distant re-occurrences for
    * bounded state. */
  def dedupWithinHorizon(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark(Seq("user_id", "event_type"))

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
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new RunningCountProcessor,
        TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "event_id", "running_n")
  }
}

/** Per-user running count as a [[StatefulProcessor]]: one ValueState[Long]
  * holds the count-so-far; each input batch's rows are processed in
  * (ts, event_id) order — the SAME order the batch cross-check
  * (stream_stateful's window) uses; sorting by event_id alone diverged
  * whenever arrival ids ran against event time (round-12 review). The
  * equivalence claim is scoped to ts-ordered replays: a row arriving in
  * a LATER batch than its timestamp peers still counts late (arbitrary
  * state has no watermark reordering). */
class RunningCountProcessor
    extends StatefulProcessor[Long, (Long, Long, Long), (Long, Long, Long)] {
  @transient private var count: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    count = getHandle.getValueState[Long]("count", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(
      userId: Long,
      rows: Iterator[(Long, Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
    var n = if (count.exists()) count.get() else 0L
    val out = rows.toSeq.sortBy(r => (r._2, r._3)).map { case (_, _, eventId) =>
      n += 1
      (userId, eventId, n)
    }
    count.update(n)
    out.iterator
  }
}
