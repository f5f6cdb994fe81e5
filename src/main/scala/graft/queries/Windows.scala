package graft.queries

import graft.{Det, QueryGroup, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2.E window functions + §2.F sort/limit/top-k. Window orderings
  * always end in a unique key (D6) so every function value is
  * deterministic; ranking functions additionally exercise genuine ties
  * (integer-valued l_quantity). */
object Windows extends QueryGroup {
  import Det._

  /** D1 output order for per-suppkey lineitem rows, derived from the
    * canonical unique key ([[Det.liKey]]) rather than hand-spelled —
    * the round-12 discUnits centralization discipline (round-13
    * review: the five-column list was duplicated across the file). */
  private val bySuppkeyThenLiKey: Seq[org.apache.spark.sql.Column] =
    col("l_suppkey") +: Det.liKey.filterNot(_ == "l_suppkey").map(col)

  /** Both physical shapes of topk_global (see the key's comment).
    * `preAgg = true` is the scale plan; false is the small-input plan.
    * Exposed so PlanSpec can pin each shape independently of the size
    * statistic the query key branches on. */
  private[graft] def topkGlobal(s: org.apache.spark.sql.SparkSession,
      dir: String, preAgg: Boolean): org.apache.spark.sql.DataFrame = {
    val c = Tables.customer(s, dir)
    if (preAgg && Tables.hasDerived(s, dir, "lineitem#okrev_cust")) {
      // Ingest-denormalized path: the catalog holds the order-grain
      // revenue projection with the customer key already attached
      // (orderCustRevPlan — the C-Store/star-schema ETL move: the fact
      // is denormalized against its parent dim at ingest, which is also
      // where the orderkey join belongs at 100 TB — done once, not per
      // query). The per-query plan aggregates FIRST — the cache reports
      // HashPartitioning(o_custkey), so the custkey aggregate collapses
      // 150 k rows to 15 k with NO exchange — and only then joins the
      // broadcast customer dim for the name: the join probes the
      // aggregate's output, not the fact. c_name is functionally
      // dependent on c_custkey, so aggregating before the dim join is
      // value-identical to the two-regime shape.
      Tables.derived(s, dir, "lineitem#okrev_cust")(orderCustRevPlan(s, dir))
        .groupBy(col("o_custkey"))
        .agg(fixedToDbl(sum(col("rev_units")), 10000).as("revenue"))
        .join(broadcast(c.select(col("c_custkey"), col("c_name"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(10)
    } else {
    val o = Tables.orders(s, dir)
    // declare the orderkey access path: if the catalog has a bucketed
    // projection, the fact-side aggregate/join needs no exchange
    val l = Tables.projection(s, dir, "lineitem", "l_orderkey")
    val rev = Det.discUnits(col("l_extendedprice"), col("l_discount"))
    val fact =
      if (preAgg) orderkeyRevPlan(s, dir)
      else l.select(col("l_orderkey"), rev.as("rev_units"))
    fact.join(o.select(col("o_orderkey"), col("o_custkey")),
        fact("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c.select(col("c_custkey"), col("c_name"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(fixedToDbl(sum(col("rev_units")), 10000).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(10)
    }
  }

  /** Per-orderkey revenue pre-aggregate of lineitem — the scale regime's
    * fact side, as a NAMED derived relation so the bench session can
    * ingest it once (the events#hourly / documents#hshingles pattern:
    * round-7 VERDICT #2). Built over the l_orderkey-bucketed projection,
    * so the aggregate itself needs no exchange and the cached output
    * REPORTS HashPartitioning(l_orderkey) — the orders join then plans
    * exchange-free. Unwarmed callers get the identical plan lazily. */
  private[graft] def orderkeyRevPlan(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val l = Tables.projection(s, dir, "lineitem", "l_orderkey")
    val rev = Det.discUnits(col("l_extendedprice"), col("l_discount"))
    l.groupBy(col("l_orderkey")).agg(sum(rev).as("rev_units"))
  }

  /** [[orderkeyRevPlan]] denormalized against orders at ingest: one row
    * per orderkey carrying (o_custkey, rev_units), bucketed by the
    * customer key the downstream aggregate groups on. Joining the fact
    * to its parent dim once at ingest is the standard star-schema ETL
    * projection — at 100 TB the orderkey join runs once here instead of
    * in every query, and the custkey bucketing hands every consumer an
    * exchange-free aggregate. */
  private[graft] def orderCustRevPlan(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val base = orderkeyRevPlan(s, dir)
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("rev_units"))
    // sized by ORDERS, not lineitem: the output is order-grain (one row
    // per orderkey, two narrow columns) — the fact's byte count would
    // over-partition the cached projection ~25× and schedule that many
    // near-empty tasks per consumer
    base.repartition(
      graft.Tables.workloadPartitions(s, Tables.orders(s, dir)), col("o_custkey"))
  }

  /** Bench-session ingest of [[orderCustRevPlan]]. */
  private[graft] def warmOrderkeyRev(s: org.apache.spark.sql.SparkSession,
      dir: String): Unit =
    Tables.warmDerived(s, dir, "lineitem#okrev_cust", orderCustRevPlan(s, dir))

  def queries: Seq[(String, Q)] = Seq(
    "win_ranking" -> ((s, dir) => {
      val wTies = Window.partitionBy("l_suppkey").orderBy(col("l_quantity").desc)
      val wUnique = Window.partitionBy("l_suppkey")
        .orderBy(col("l_quantity").desc, col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_extendedprice"))
      Tables.lineitem(s, dir)
        .select(
          col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_extendedprice"), col("l_quantity"),
          rank().over(wTies).cast("long").as("rnk"),
          dense_rank().over(wTies).cast("long").as("drnk"),
          row_number().over(wUnique).cast("long").as("rn"))
        .orderBy(bySuppkeyThenLiKey: _*)
    }),

    "win_analytic" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, dir)
        .select(
          col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          first(col("o_totalprice")).over(w).as("first_price"),
          last(col("o_totalprice")).over(wFull).as("last_price"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // nth_value / lag with default / IGNORE NULLS — the analytic-function
    // surface win_analytic doesn't touch. Nulls are synthesized (D4:
    // price < 20000 ⇒ null) so ignoreNulls has real work to do.
    "win_nth" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      val wFrame = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, dir)
        .withColumn("big_price",
          when(col("o_totalprice") < 20000, lit(null)).otherwise(col("o_totalprice")))
        .select(
          col("o_custkey"), col("o_orderkey"),
          nth_value(col("o_totalprice"), 3).over(wFrame).as("third_price"),
          lag(col("o_totalprice"), 1, -1.0).over(w).as("prev_or_default"),
          last(col("big_price"), ignoreNulls = true).over(w).as("last_big"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // Running revenue: ROWS UNBOUNDED PRECEDING → CURRENT (exact decimal).
    "win_frame_rows" -> ((s, dir) => {
      val w = Window.partitionBy("l_suppkey")
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_extendedprice"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(s, dir)
        .select(
          col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_extendedprice"),
          fixedToDbl(sum(cents(col("l_extendedprice"))).over(w), 100).as("running_rev"))
        .orderBy(bySuppkeyThenLiKey: _*)
    }),

    // RANGE frame: peers (equal o_totalprice) are included together, so
    // the result is deterministic even across tie orderings.
    "win_frame_range" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, dir)
        .select(
          col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          fixedToDbl(sum(cents(col("o_totalprice"))).over(w), 100).as("cum_price"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // Time-interval RANGE frame: per-user trailing-1-hour event count and
    // value sum at every event. The frame is value-bounded on the
    // microsecond clock (RANGE, not ROWS), so simultaneous events are
    // frame-peers in both engines — no tie-break needed; one shuffle on
    // user_id serves the whole window. The trailing-window feature shape
    // (rate limiting, rolling engagement) over event time.
    "win_time_range" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("us"))
        .rangeBetween(-3600000000L, 0L)
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"), col("value"))
        .select(col("event_id"), col("user_id"),
          count(lit(1)).over(w).as("n_hour"),
          fixedToDbl(sum(cents(col("value"))).over(w), 100).as("sum_hour"))
        .orderBy("event_id")
    }),

    "win_distribution" -> ((s, dir) => {
      val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal"), col("c_custkey"))
      Tables.customer(s, dir)
        .select(
          col("c_mktsegment"), col("c_custkey"),
          ntile(4).over(w).cast("long").as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy("c_mktsegment", "c_custkey")
    }),

    // The SCALE form of the distribution window (round-18 VERDICT #3 —
    // win_distribution partitions by a 5-value key, so each segment's
    // FULL customer set sorts on one task; the eqdepth_scale playbook
    // applied to per-row rank functions): per segment, 31 bucket
    // BOUNDARIES from the mergeable percentile sketch (map-side
    // partials, exact at fixture accuracy) assign every row a bucket
    // MAP-SIDE against the broadcast boundary relation; the global rank
    // is then (broadcast per-(segment,bucket) offset) + (row_number
    // within the bucket) — the only window partitions by (segment,
    // bucket), whose occupancy is ~N/32 per segment at ANY scale, never
    // a whole segment. Offsets come from a bounded self-join over the
    // ≤ segments×32 count relation (no segment-only window anywhere).
    // quartile/pr/cd derive EXACTLY from the rank: the order key
    // (acctbal, custkey) is unique, so percent_rank = (rank−1)/(N−1),
    // cume_dist = rank/N, and ntile's first-(N mod 4)-buckets-larger
    // sizing is closed-form. ORACLED with win_distribution's own SQL —
    // bucket assignment is monotone in the order key, so ranks (and
    // every derived value) hash-match the exact window; at 100 TB the
    // same plan runs with the sketch approximate (bucket occupancy
    // merely skews, values stay exact). Deviation from even occupancy
    // is bounded by the largest acctbal tie run (all ties share one
    // bucket), the documented eqdepth_scale caveat.
    "win_distribution_scale" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
        .select(col("c_mktsegment"), col("c_custkey"),
          cents(col("c_acctbal")).as("pc"))
      val fracs = (1 until 32).map(_ / 32.0)
      val bs = cust.groupBy("c_mktsegment")
        .agg(percentile_approx(col("pc"), array(fracs.map(lit): _*),
          lit(Aggregates.eqdepthSketchAccuracy)).as("bs"))
      val nseg = cust.groupBy("c_mktsegment").agg(count(lit(1)).as("nseg"))
      val bucketed = cust.join(broadcast(bs), "c_mktsegment")
        .withColumn("bkt", size(filter(col("bs"), x => x < col("pc"))))
        .drop("bs")
      val counts = bucketed.groupBy("c_mktsegment", "bkt")
        .agg(count(lit(1)).as("bn"))
      val offs = counts.as("a")
        .join(counts.as("b"),
          col("a.c_mktsegment") === col("b.c_mktsegment") &&
            col("b.bkt") < col("a.bkt"), "left")
        .groupBy(col("a.c_mktsegment").as("c_mktsegment"), col("a.bkt").as("bkt"))
        .agg(coalesce(sum(col("b.bn")), lit(0L)).as("off"))
      val wIn = Window.partitionBy("c_mktsegment", "bkt")
        .orderBy(col("pc"), col("c_custkey"))
      val base = floor(col("nseg") / 4).cast("long")
      val r = col("nseg") % 4
      val cut = r * (base + 1)
      bucketed
        .withColumn("rn", row_number().over(wIn))
        .join(broadcast(offs), Seq("c_mktsegment", "bkt"))
        .join(broadcast(nseg), "c_mktsegment")
        .withColumn("rank", col("off") + col("rn"))
        .select(col("c_mktsegment"), col("c_custkey"),
          when(col("rank") <= cut,
            ceil(col("rank").cast("double") / (base + 1).cast("double")))
            .otherwise(r + ceil((col("rank") - cut).cast("double") /
              greatest(base, lit(1L)).cast("double")))
            .cast("long").as("quartile"),
          when(col("nseg") === 1, lit(0.0))
            .otherwise((col("rank") - 1).cast("double") /
              (col("nseg") - 1).cast("double")).as("pr"),
          (col("rank").cast("double") / col("nseg").cast("double")).as("cd"))
        .orderBy("c_mktsegment", "c_custkey")
    }),

    // Multi-key sort, mixed direction, explicit null placement (D4 nulls
    // synthesized via CASE).
    "sort_multi" -> ((s, dir) =>
      Tables.customer(s, dir)
        .select(
          col("c_custkey"), col("c_mktsegment"),
          when(col("c_acctbal") < 500, lit(null)).otherwise(col("c_acctbal")).as("bal"))
        .orderBy(col("c_mktsegment").asc, col("bal").desc_nulls_last, col("c_custkey").asc)),

    // 3-table join + group + global top-10 (TakeOrderedAndProject) —
    // TWO-REGIME, chosen by the fact side's size statistic (the same
    // cost-based call AQE makes from runtime stats):
    //   big   — pre-aggregate lineitem per l_orderkey before any join:
    //           map-side combine caps the join input, both sf-scaling
    //           relations shuffle-join, only the customer dim is
    //           broadcast. The 100 TB shape.
    //   small — below ~1 GB of fact input the 150 k-group pre-aggregate
    //           costs more than the join rows it saves (BENCH_NOTES §6:
    //           0.58 s of a 0.70 s query at a 4:1 reduction); join the
    //           raw rows and aggregate ONCE per custkey.
    // Same rows either way (sum is associative); PlanSpec pins both
    // shapes. (Round 1 broadcast the orders⋈customer product: a relation
    // that grows linearly with sf — a driver OOM at 100×.)
    // Regime choice: the size statistic (the cost-based call), OR the
    // catalog has the per-orderkey pre-aggregate ingested — a warmed
    // lineitem#okrev_cust makes the scale plan strictly cheaper at ANY size
    // (the 150 k-group hash agg leaves every rep and the fact side
    // shrinks 4:1 before the join).
    "topk_global" -> ((s, dir) => {
      val l = Tables.projection(s, dir, "lineitem", "l_orderkey")
      topkGlobal(s, dir,
        preAgg = Tables.hasDerived(s, dir, "lineitem#okrev_cust") ||
          l.queryExecution.optimizedPlan.stats.sizeInBytes > (1L << 30))
    }),

    // Top-3 lineitems per supplier via row_number ≤ 3 (D6 tie-break).
    "topk_per_group" -> ((s, dir) => {
      val w = Window.partitionBy("l_suppkey")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"))
      Tables.lineitem(s, dir)
        .select(
          col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"),
          row_number().over(w).cast("long").as("rn"))
        .filter(col("rn") <= 3)
        .orderBy("l_suppkey", "rn")
    }),

    // Same top-3 via the bounded top-k Aggregator (graft.functions
    // .TopKRows): map-side partials carry ≤3 rows per group, so the
    // shuffle is ≤ k·groups·partitions rows instead of every input row —
    // the shape that wins once the shuffle, not the local sort, is the
    // bottleneck (100 TB path). Bit-identical rows to topk_per_group.
    "topk_bounded_agg" -> ((s, dir) => {
      // direct Column application — registering into the session-global
      // function registry and round-tripping through expr() bought
      // nothing here (SQL-callable registration is UdfSurface's own
      // surface; round-13 review)
      val top3 = udaf(new graft.functions.TopKRows(3))
      Tables.lineitem(s, dir)
        .groupBy("l_suppkey")
        .agg(top3(col("l_extendedprice"), col("l_orderkey"),
          col("l_linenumber"), col("l_partkey")).as("top"))
        .select(col("l_suppkey"), posexplode(col("top")).as(Seq("pos", "t")))
        .select(col("l_suppkey"), col("t.orderkey").as("l_orderkey"),
          col("t.linenumber").as("l_linenumber"),
          col("t.price").as("l_extendedprice"),
          (col("pos") + 1).cast("long").as("rn"))
        .orderBy("l_suppkey", "rn")
    }),

    // Batch sessionization — the lag+cumsum idiom: a session break is a
    // >30 min gap (or the user's first event); the running sum of breaks
    // numbers the sessions. One shuffle on user_id serves both window
    // passes (same partitioning), and the event ordering ends in
    // event_id so same-timestamp events are deterministic (D6). This is
    // the batch twin of stream_session's session_window aggregate — a
    // training pipeline runs exactly this shape to segment user/doc
    // activity before feature extraction.
    "win_sessionize" -> ((s, dir) => {
      val byTs = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts"))
        // gap test in exact integer MICROSECONDS (unix_micros here,
        // epoch_us in the oracle) — a seconds cast floors sub-second
        // components differently than a fractional epoch would
        .withColumn("brk",
          when(unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(byTs) > 1800000000L
            || lag(col("ts"), 1).over(byTs).isNull, 1L).otherwise(0L))
        .withColumn("session_no",
          sum(col("brk")).over(byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("event_id", "user_id", "session_no")
        .orderBy("event_id")
    }),

    // Time-series gap fill: per-user daily activity resampled onto a
    // dense calendar (sequence over the user's [min_day, max_day] span),
    // missing days as n=0 with the day value carried forward
    // (last_value IGNORE NULLS). The standard resample→ffill step before
    // any per-entity time-series feature; every stage is keyed on
    // user_id (or user_id+day), so at scale the shuffles stay linear and
    // the calendar explode is bounded by the observed span, never a
    // global date range.
    "ts_fill_forward" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"), sumd2(col("value")).as("day_value"))
      val cal = daily.groupBy("user_id")
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
      val w = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cal.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day"),
          coalesce(col("n"), lit(0L)).as("n"),
          last(col("day_value"), ignoreNulls = true).over(w).as("ffill_value"))
        .orderBy("user_id", "day")
    }),

    // Gaps-and-islands streaks: each user's longest run of CONSECUTIVE
    // active days plus how many distinct runs they have — the
    // engagement-streak analytic. The island key is the classic
    // day − row_number() trick (consecutive days share it); entirely
    // integer arithmetic (days since a fixed anchor), two keyed
    // aggregates after one per-user window — linear at any scale.
    "win_streak" -> ((s, dir) => {
      val uw = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val w = Window.partitionBy("user_id").orderBy("day")
      uw.withColumn("island",
          datediff(col("day"), to_date(lit("2024-01-01")))
            - row_number().over(w))
        .groupBy("user_id", "island")
        .agg(count(lit(1)).as("len"))
        .groupBy("user_id")
        .agg(max(col("len")).as("max_streak"), count(lit(1)).as("n_streaks"))
        .orderBy("user_id")
    }),

    // Time-series gap fill, linear flavor: the same dense per-user
    // calendar, but missing days INTERPOLATE between the bracketing
    // observations instead of carrying the last one — the resample→
    // interpolate step under rate/level series where a step function
    // lies. Two windows per user (last-obs back, first-obs forward,
    // carrying the observation DAY alongside its value), then one
    // closed-form lerp; values stay exact integer cents until the final
    // projection, whose double math is the identical expression tree in
    // both engines (D2). Days outside the first..last observation span
    // are honestly null. Scale: keyed on user_id throughout, calendar
    // explode bounded by each user's own span.
    "ts_interpolate" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("vc"))
      val cal = daily.groupBy("user_id")
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
      val back = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val fwd = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      cal.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"), coalesce(col("n"), lit(0L)).as("n"),
          last(col("vc"), ignoreNulls = true).over(back).as("pv"),
          last(when(col("vc").isNotNull, col("day")), ignoreNulls = true)
            .over(back).as("pd"),
          first(col("vc"), ignoreNulls = true).over(fwd).as("nv"),
          first(when(col("vc").isNotNull, col("day")), ignoreNulls = true)
            .over(fwd).as("nd"))
        .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("n"),
          round(when(col("pv").isNull || col("nv").isNull, lit(null))
            .when(col("pd") === col("nd"), col("pv").cast("double") / 100.0)
            .otherwise((col("pv").cast("double")
              + (col("nv") - col("pv")).cast("double")
                * datediff(col("day"), col("pd")).cast("double")
                / datediff(col("nd"), col("pd")).cast("double")) / 100.0),
            4).as("interp_value"))
        .orderBy("user_id", "day")
    })
  )

  def oracles: Seq[(String, String)] = Seq(
    "ts_fill_forward" ->
      s"""WITH daily AS (
         |  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n,
         |    ${Det.sumd2Sql("value")} AS day_value
         |  FROM events GROUP BY user_id, CAST(ts AS DATE)),
         |cal AS (
         |  SELECT user_id, CAST(d AS DATE) AS day
         |  FROM (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
         |        FROM daily GROUP BY user_id) s,
         |       UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS t(d))
         |SELECT c.user_id, strftime(c.day, '%Y-%m-%d') AS day,
         |  COALESCE(n, 0) AS n,
         |  last_value(day_value IGNORE NULLS) OVER (
         |    PARTITION BY c.user_id ORDER BY c.day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill_value
         |FROM cal c LEFT JOIN daily d ON c.user_id = d.user_id AND c.day = d.day
         |ORDER BY c.user_id, day""".stripMargin,
    "win_streak" ->
      """WITH uw AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |i AS (
        |  SELECT user_id,
        |    datediff('day', DATE '2024-01-01', day)
        |      - row_number() OVER (PARTITION BY user_id ORDER BY day) AS island
        |  FROM uw),
        |runs AS (
        |  SELECT user_id, island, COUNT(*) AS len
        |  FROM i GROUP BY user_id, island)
        |SELECT user_id, MAX(len) AS max_streak, COUNT(*) AS n_streaks
        |FROM runs GROUP BY user_id ORDER BY user_id""".stripMargin,
    "ts_interpolate" ->
      s"""WITH daily AS (
         |  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n,
         |    CAST(SUM(${Det.centsSql("value")}) AS BIGINT) AS vc
         |  FROM events GROUP BY user_id, CAST(ts AS DATE)),
         |cal AS (
         |  SELECT user_id, CAST(d AS DATE) AS day
         |  FROM (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
         |        FROM daily GROUP BY user_id) s,
         |       UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS t(d)),
         |br AS (
         |  SELECT c.user_id, c.day, COALESCE(n, 0) AS n,
         |    last_value(vc IGNORE NULLS) OVER wb AS pv,
         |    last_value(CASE WHEN vc IS NOT NULL THEN c.day END IGNORE NULLS)
         |      OVER wb AS pd,
         |    first_value(vc IGNORE NULLS) OVER wf AS nv,
         |    first_value(CASE WHEN vc IS NOT NULL THEN c.day END IGNORE NULLS)
         |      OVER wf AS nd
         |  FROM cal c LEFT JOIN daily d ON c.user_id = d.user_id AND c.day = d.day
         |  WINDOW
         |    wb AS (PARTITION BY c.user_id ORDER BY c.day
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |    wf AS (PARTITION BY c.user_id ORDER BY c.day
         |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         |SELECT user_id, strftime(day, '%Y-%m-%d') AS day, n,
         |  ROUND(CASE
         |    WHEN pv IS NULL OR nv IS NULL THEN NULL
         |    WHEN pd = nd THEN CAST(pv AS DOUBLE) / 100.0
         |    ELSE (CAST(pv AS DOUBLE)
         |      + CAST(nv - pv AS DOUBLE)
         |        * CAST(datediff('day', pd, day) AS DOUBLE)
         |        / CAST(datediff('day', pd, nd) AS DOUBLE)) / 100.0
         |  END, 4) AS interp_value
         |FROM br ORDER BY user_id, day""".stripMargin,
    "win_sessionize" ->
      """WITH brk AS (
        |  SELECT event_id, user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT event_id, user_id,
        |  CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
        |FROM brk ORDER BY event_id""".stripMargin,
    "win_ranking" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_partkey, l_extendedprice, l_quantity,
        |  rank() OVER (PARTITION BY l_suppkey ORDER BY l_quantity DESC) AS rnk,
        |  dense_rank() OVER (PARTITION BY l_suppkey ORDER BY l_quantity DESC) AS drnk,
        |  row_number() OVER (PARTITION BY l_suppkey ORDER BY l_quantity DESC, l_orderkey, l_linenumber, l_partkey, l_extendedprice) AS rn
        |FROM lineitem ORDER BY l_suppkey, l_orderkey, l_linenumber, l_partkey, l_extendedprice""".stripMargin,
    "win_analytic" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  first_value(o_totalprice) OVER w AS first_price,
        |  last_value(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_nth" ->
      """SELECT o_custkey, o_orderkey,
        |  nth_value(o_totalprice, 3) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS third_price,
        |  lag(o_totalprice, 1, -1.0) OVER w AS prev_or_default,
        |  last_value(CASE WHEN o_totalprice < 20000 THEN NULL ELSE o_totalprice END IGNORE NULLS)
        |    OVER w AS last_big
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_frame_rows" ->
      s"""SELECT l_suppkey, l_orderkey, l_linenumber, l_partkey, l_extendedprice,
        |  (CAST(SUM(${Det.centsSql("l_extendedprice")}) OVER (
        |    PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey, l_extendedprice
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) / CAST(100 AS DOUBLE)) AS running_rev
        |FROM lineitem ORDER BY l_suppkey, l_orderkey, l_linenumber, l_partkey, l_extendedprice""".stripMargin,
    "win_frame_range" ->
      s"""SELECT o_custkey, o_orderkey, o_totalprice,
        |  (CAST(SUM(${Det.centsSql("o_totalprice")}) OVER (
        |    PARTITION BY o_custkey ORDER BY o_totalprice
        |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) / CAST(100 AS DOUBLE)) AS cum_price
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_time_range" ->
      s"""SELECT event_id, user_id,
        |  COUNT(*) OVER w AS n_hour,
        |  (CAST(SUM(${Det.centsSql("value")}) OVER w AS BIGINT) / CAST(100 AS DOUBLE)) AS sum_hour
        |FROM (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, value
        |      FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY us
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "win_distribution" ->
      """SELECT c_mktsegment, c_custkey,
        |  ntile(4) OVER w AS quartile,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,
    // the scale form must reproduce the exact window's values — same SQL
    "win_distribution_scale" ->
      """SELECT c_mktsegment, c_custkey,
        |  ntile(4) OVER w AS quartile,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,
    "sort_multi" ->
      """SELECT c_custkey, c_mktsegment,
        |  CASE WHEN c_acctbal < 500 THEN NULL ELSE c_acctbal END AS bal
        |FROM customer
        |ORDER BY c_mktsegment ASC, bal DESC NULLS LAST, c_custkey ASC""".stripMargin,
    "topk_global" ->
      s"""SELECT c_custkey, c_name,
        |  (CAST(SUM(${Det.discUnitsSql("l_extendedprice", "l_discount")}) AS BIGINT) / CAST(10000 AS DOUBLE)) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY c_custkey, c_name
        |ORDER BY revenue DESC, c_custkey LIMIT 10""".stripMargin,
    "topk_per_group" ->
      """SELECT * FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_suppkey
        |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber, l_partkey) AS rn
        |  FROM lineitem) t
        |WHERE rn <= 3 ORDER BY l_suppkey, rn""".stripMargin,
    "topk_bounded_agg" ->
      """SELECT * FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_suppkey
        |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber, l_partkey) AS rn
        |  FROM lineitem) t
        |WHERE rn <= 3 ORDER BY l_suppkey, rn""".stripMargin
  )
}
