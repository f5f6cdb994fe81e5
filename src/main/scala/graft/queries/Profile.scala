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

  /** Target picks per (priority, shard) stratum of the systematic
    * weighted sample — the oracle's step divisor is GENERATED from this
    * (one-constant discipline). */
  private val weightedK = 5

  /** Time-grid resample + forward-fill kernel (the ts_resample body and
    * [[graft.Graft.resampleForwardFill]]'s engine): `ev` carries
    * (key, us, ord, vc) — event-time micros, an orderable tie-break,
    * integral value — and the result is one row per `granUs` bucket per
    * key from the key's first to last event: (key, hb, n, last_cents)
    * with empty buckets at n = 0 carrying the last observed value
    * forward. Scale shape: the per-(key, bucket) aggregate reduces
    * map-side; the grid generates by sequence+explode from the 2-column
    * span relation (rows per key bounded by span/granularity, never by
    * event count); the fill is a running last-non-null over a window
    * keyed by `key` — cardinality scales with data, and no partition
    * outgrows span-buckets rows at any corpus size. D6: "last in
    * bucket" = max_by over the (us, ord) total order. */
  private[graft] def resampleFfill(ev0: DataFrame, granUs: Long): DataFrame = {
    require(granUs > 0, s"resampleFfill: granularity $granUs us <= 0")
    val ev = ev0.withColumn("hb", floor(col("us") / granUs).cast("long"))
    val perBucket = ev.groupBy("key", "hb").agg(
      count(lit(1)).as("n"),
      max_by(col("vc"), struct(col("us"), col("ord"))).as("vc_last"))
    val span = ev.groupBy("key")
      .agg(min(col("hb")).as("h0"), max(col("hb")).as("h1"))
    val grid = span.select(col("key"),
      explode(sequence(col("h0"), col("h1"))).as("hb"))
    val w = Window.partitionBy("key").orderBy("hb")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(perBucket, Seq("key", "hb"), "left")
      .select(col("key"), col("hb"),
        coalesce(col("n"), lit(0L)).as("n"),
        last(col("vc_last"), ignoreNulls = true).over(w).as("last_cents"))
  }

  /** PSI bin boundaries: global quartiles — exact binary doubles so the
    * Scala toString round-trips into the oracle SQL bit-identically. */
  private[graft] val psiFractions: Seq[Double] = Seq(0.25, 0.5, 0.75)

  /** Bin count (= Laplace smoothing denominator offset). */
  private[graft] val psiBuckets: Int = psiFractions.size + 1

  /** Sketch accuracy ≥ the fixture events row count at every tested SF
    * (100 k at sf0.1) — the percentile sketch is EXACT there, so the key
    * stays oracle-able; at 100 TB the same plan runs it approximate
    * (the agg_histogram_eqdepth_scale discipline). */
  private[graft] val psiSketchAccuracy: Int = 1000000

  /** Population-stability-index drift per group — the data-quality
    * gate a training pipeline runs between snapshots ("did this
    * source's value distribution move?"; PSI is the standard credit-
    * scoring drift score, Σ (p−q)·ln(p/q) over bins; > 0.25 is the
    * conventional "significant shift"). Here each `event_type`'s value
    * distribution is scored against the GLOBAL distribution over
    * equi-depth quartile bins. `r`: (event_type, pc) with pc integral
    * cents. Plan: one sketch aggregate for the 3 global boundaries
    * (map-side partials), one broadcast map-only bin assignment feeding
    * ONE keyed (type, bucket) count — the only N-sized stages — then the
    * |types|×4-row reshape (scaffold join + window sums + the
    * entropy-key decimal-sum discipline: ln terms round to 6, sum as
    * exact DECIMAL, final round-4 in decimal). Zero-count bins stay in
    * via Laplace (c+1)/(n+B) smoothing, so PSI is total and finite. */
  private[graft] def driftPsi(r: DataFrame): DataFrame = {
    val b = r.agg(percentile_approx(col("pc"),
      array(psiFractions.map(lit): _*), lit(psiSketchAccuracy)).as("bs"))
    val counts = r.crossJoin(broadcast(b))
      .withColumn("bucket",
        (size(filter(col("bs"), x => x < col("pc"))) + 1).cast("long"))
      .groupBy("event_type", "bucket").agg(count(lit(1)).as("c"))
    val scaffold = r.select("event_type").distinct()
      .select(col("event_type"),
        explode(sequence(lit(1L), lit(psiBuckets.toLong))).as("bucket"))
    val w = scaffold.join(counts, Seq("event_type", "bucket"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .withColumn("n_t", sum(col("c")).over(Window.partitionBy("event_type")))
      .withColumn("n_b", sum(col("c")).over(Window.partitionBy("bucket")))
      .withColumn("nn", sum(col("c")).over(Window.partitionBy()))
    val pt = (col("c") + 1).cast("double") / (col("n_t") + psiBuckets).cast("double")
    val pr = (col("n_b") + 1).cast("double") / (col("nn") + psiBuckets).cast("double")
    w.withColumn("term", dec(round((pt - pr) * log(pt / pr), 6)))
      .groupBy("event_type")
      .agg(max(col("n_t")).as("n"),
        round(sum(col("term")), 4).cast("double").as("psi"))
  }

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
    // One-pass column profile: per numeric column — non-null row count,
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

    // Weighted sampling, integer-exact: systematic (cumulative-weight)
    // selection — a row is kept when its weight interval [cum−w, cum)
    // crosses a multiple of step = total/k, so inclusion probability is
    // proportional to weight and rows heavier than step are ALWAYS kept
    // (the certainty-inclusion property survey samplers rely on). All
    // arithmetic is exact integer cents — no transcendental sampling
    // keys whose cross-engine ulp could flip a rank (the
    // Efraimidis–Spirakis float form lives behind Graft.weightedSample
    // with a statistical suite test instead). Scale: the domain
    // partitions FIRST — per (priority, hash-shard) strata, one keyed
    // window each, no global running sum (the compactPlan discipline);
    // stratified systematic sampling is itself a valid weighted design.
    "sample_weighted" -> ((s, dir) => {
      val strata = Window.partitionBy("o_orderpriority", "shard")
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderpriority"),
          pmod(col("o_orderkey"), lit(8)).as("shard"),
          cents(col("o_totalprice")).as("w_cents"))
        .withColumn("cum", sum(col("w_cents")).over(strata.orderBy("o_orderkey")))
        // greatest(step, 1): a degenerate stratum whose total weight is
        // below k cents would otherwise yield step = 0 and an ANSI
        // division-by-zero whose message names neither the stratum nor
        // the cause; step 1 keeps every row of such a stratum (the
        // certainty-inclusion limit). Mirrored in the oracle SQL.
        .withColumn("step", expr(s"greatest(sum(w_cents) OVER (PARTITION BY o_orderpriority, shard) div $weightedK, 1)"))
        .filter(expr("(cum div step) > ((cum - w_cents) div step)"))
        .select(col("o_orderkey"), col("o_orderpriority"), col("shard"), col("w_cents"))
        .orderBy("o_orderkey")
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

    // MERGE / upsert — the lakehouse idiom a 100 TB pipeline applies a
    // CDC change-set with (round-12 VERDICT #6): one FULL OUTER join of
    // target × changes on the key, then per-row resolution — D rows
    // drop, U/I rows take the change's values (keyed on the matched
    // op, not coalesce, so a null change payload would land as null —
    // the Delta semantics; round-13 review), untouched target rows
    // pass through. One shuffle on the merge key (the join), no
    // windows, no driver state — exactly how Delta/Iceberg MERGE plans
    // the row-level pass at scale. The change-set is derived
    // deterministically from the target itself (keys ≡3 mod 10 reprice
    // +10.00, ≡7 delete, ≡0 clone to fresh NEGATIVE keys −(k+1) —
    // collision-free against the positive key space at ANY scale; the
    // first form's +10⁸ offset collided with real orderkeys past
    // SF ≈ 17, round-13 review) so the key needs no side files; money
    // stays exact integer cents end to end (D2).
    "cdc_merge" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val target = o.select(col("o_orderkey"), col("o_custkey"),
        cents(col("o_totalprice")).as("tc"))
      val upd = o.filter(pmod(col("o_orderkey"), lit(10)) === 3)
        .select(col("o_orderkey"), lit("U").as("op"),
          col("o_custkey").as("ck"), (cents(col("o_totalprice")) + 1000L).as("cc"))
      val del = o.filter(pmod(col("o_orderkey"), lit(10)) === 7)
        .select(col("o_orderkey"), lit("D").as("op"),
          lit(null).cast("long").as("ck"), lit(null).cast("long").as("cc"))
      val ins = o.filter(pmod(col("o_orderkey"), lit(10)) === 0)
        .select((-(col("o_orderkey") + lit(1L))).as("o_orderkey"),
          lit("I").as("op"), col("o_custkey").as("ck"),
          cents(col("o_totalprice")).as("cc"))
      target.join(upd.unionByName(del).unionByName(ins),
          Seq("o_orderkey"), "full_outer")
        .filter(coalesce(col("op"), lit("")) =!= "D")
        .select(col("o_orderkey"),
          when(col("op").isNotNull, col("ck"))
            .otherwise(col("o_custkey")).as("o_custkey"),
          when(col("op").isNotNull, col("cc"))
            .otherwise(col("tc")).as("o_total_cents"))
        .orderBy("o_orderkey")
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

    // Funnel analysis: per user, the ordered view → click → purchase
    // progression — each stage's first timestamp must be at or after the
    // previous stage's. Three per-user conditional-min aggregates
    // chained by joins on user_id (every shuffle keyed on the funnel
    // entity, linear at scale); the classic product-analytics query.
    "funnel_stages" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      // prev couples the gating frame WITH its timestamp column — a
      // single Option, so no "" sentinel and no way to pair a frame
      // with the wrong column (round-12 review)
      def firstAfter(tpe: String, prev: Option[(DataFrame, String)],
          out: String): DataFrame = {
        val base = ev.filter(col("event_type") === tpe)
        val gated = prev match {
          case Some((p, prevCol)) => base.join(p.select("user_id", prevCol), "user_id")
            .filter(col("ts") >= col(prevCol))
          case None => base
        }
        gated.groupBy("user_id").agg(min(col("ts")).as(out))
      }
      val v = firstAfter("view", None, "t_view")
      val c = firstAfter("click", Some((v, "t_view")), "t_click")
      val p = firstAfter("purchase", Some((c, "t_click")), "t_purchase")
      ev.select("user_id").distinct()
        .join(v, Seq("user_id"), "left")
        .join(c, Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .select(col("user_id"),
          when(col("t_purchase").isNotNull, 3L)
            .when(col("t_click").isNotNull, 2L)
            .when(col("t_view").isNotNull, 1L).otherwise(0L).as("stage"),
          date_format(col("t_view"), "yyyy-MM-dd HH:mm:ss").as("t_view"),
          date_format(col("t_click"), "yyyy-MM-dd HH:mm:ss").as("t_click"),
          date_format(col("t_purchase"), "yyyy-MM-dd HH:mm:ss").as("t_purchase"))
        .orderBy("user_id")
    }),

    // Weekly cohort retention: users bucketed by first-activity week,
    // counted per (cohort, weeks-since-cohort) — the engagement matrix.
    // Week = integer days-since-epoch-anchor div 7 (identical arithmetic
    // in both engines; no locale week-start semantics). Two grouped
    // aggregates over (user, week) pairs, both keyed on bounded
    // cardinalities.
    "retention_cohort" -> ((s, dir) => {
      // explicit floor: DuckDB's double→BIGINT cast ROUNDS while Spark's
      // truncates — floor-then-cast is identical in both (all positive)
      val wk = floor(datediff(to_date(col("ts")), to_date(lit("2024-01-01"))) / 7)
        .cast("long")
      val uw = Tables.events(s, dir)
        .select(col("user_id"), wk.as("w")).distinct()
      val cohort = uw.groupBy("user_id").agg(min(col("w")).as("cohort_week"))
      uw.join(cohort, "user_id")
        .groupBy(col("cohort_week"), (col("w") - col("cohort_week")).as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("cohort_week", "week_offset")
    }),

    // Time-grid RESAMPLE + FORWARD FILL — the gap-filling every metrics
    // pipeline runs before feature extraction or charting (pandas
    // resample('1h').ffill(); ClickHouse WITH FILL): per user, one row
    // per HOUR from the user's first to last event — hours with no
    // events carry n = 0 and the LAST OBSERVED value forward. Scale
    // shape: the per-(user, hour) aggregate reduces map-side; the grid
    // generates by sequence+explode from the 2-column span relation
    // (rows per key bounded by span/granularity, never by event count);
    // the forward fill is a running last-non-null over a window KEYED
    // BY user — key cardinality scales with the data, so no partition
    // outgrows span-hours rows at any corpus size. Determinism (D6):
    // "last in hour" = max_by over the (us, event_id) total order;
    // values in exact integer cents. The first grid row per user is the
    // user's first event hour, so the fill never reads an empty
    // history. Fully ORACLED: the same hourly aggregate, the
    // generate_series grid, and DuckDB's IGNORE NULLS running
    // last_value.
    "ts_resample" -> ((s, dir) =>
      resampleFfill(
          Tables.events(s, dir)
            .select(col("user_id").as("key"), unix_micros(col("ts")).as("us"),
              col("event_id").as("ord"), cents(col("value")).as("vc")),
          granUs = 3600000000L)
        .select(col("key").as("user_id"), col("hb"), col("n"),
          col("last_cents"))
        .orderBy("user_id", "hb")),

    // Robust outlier detection: per event_type, flag values more than
    // 3 scaled-MAD units from the median — the median/MAD pair shrugs
    // off the very outliers a mean/stddev z-score would absorb (50%
    // breakdown point vs 0), the standard robust gate before training
    // on telemetry-like values. Two keyed exact-percentile aggregates
    // (median, then median of |v − m|), the 5-row stats relation rides
    // back as a broadcast, and the gate is a map-only filter — at 100 TB
    // the same shape swaps percentile for approx_percentile and nothing
    // else moves. Both engines interpolate percentiles identically
    // (Spark percentile ≡ DuckDB quantile_cont) and the score is the
    // identical IEEE expression tree (D2, rounded to 4).
    "anomaly_mad" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val med = ev.groupBy("event_type")
        .agg(expr("percentile(value, 0.5)").as("m"))
      val mad = ev.join(broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(expr("percentile(abs(value - m), 0.5)").as("mad"), first(col("m")).as("m"))
      ev.join(broadcast(mad), "event_type")
        .filter(abs(col("value") - col("m")) > lit(3.0) * lit(1.4826) * col("mad"))
        .select(col("event_id"), col("event_type"), r6(col("value")).as("value"),
          r4(abs(col("value") - col("m")) / (lit(1.4826) * col("mad"))).as("mad_score"))
        .orderBy("event_id")
    }),

    // Distribution drift per event_type vs the global population
    // (kernel scaladoc on [[driftPsi]]): PSI over global-quartile bins,
    // Laplace-smoothed, decimal-exact term sums. The single-partition
    // window in the reshape runs on |types|×4 rows — the N-sized work
    // is one sketch agg + one keyed count, both map-side-combining.
    "profile_drift_psi" -> ((s, dir) =>
      driftPsi(Tables.events(s, dir)
          .select(col("event_type"), cents(col("value")).as("pc")))
        .orderBy("event_type")),

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
    "anomaly_mad" ->
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS m
        |  FROM events GROUP BY event_type),
        |mad AS (
        |  SELECT e.event_type,
        |    quantile_cont(abs(e.value - med.m), 0.5) AS mad, MIN(med.m) AS m
        |  FROM events e JOIN med USING (event_type)
        |  GROUP BY e.event_type)
        |SELECT event_id, e.event_type, ROUND(value, 6) AS value,
        |  ROUND(abs(value - m) / (CAST(1.4826 AS DOUBLE) * mad), 4) AS mad_score
        |FROM events e JOIN mad USING (event_type)
        |WHERE abs(value - m) > CAST(3 AS DOUBLE) * CAST(1.4826 AS DOUBLE) * mad
        |ORDER BY event_id""".stripMargin,
    // PSI replayed end to end: same quartile boundaries (quantile_disc ≡
    // full-accuracy percentile_approx), same bin-assignment formula,
    // same Laplace smoothing and decimal-sum rounding.
    "profile_drift_psi" -> {
      val fr = psiFractions.map(f => s"CAST($f AS DOUBLE)").mkString(", ")
      val bk = (1 to psiBuckets).mkString(", ")
      s"""WITH r AS (
         |  SELECT event_type, ${Det.centsSql("value")} AS pc FROM events),
         |b AS (SELECT quantile_disc(pc, [$fr]) AS bs FROM r),
         |a AS (
         |  SELECT event_type,
         |    1 + len(list_filter(bs, x -> x < pc)) AS bucket FROM r, b),
         |c0 AS (
         |  SELECT event_type, bucket, COUNT(*) AS c
         |  FROM a GROUP BY event_type, bucket),
         |sc AS (
         |  SELECT t.event_type, g.bucket
         |  FROM (SELECT DISTINCT event_type FROM r) t
         |  CROSS JOIN (SELECT UNNEST([$bk]) AS bucket) g),
         |f AS (
         |  SELECT sc.event_type, sc.bucket, COALESCE(c0.c, 0) AS c
         |  FROM sc LEFT JOIN c0
         |    ON c0.event_type = sc.event_type AND c0.bucket = sc.bucket),
         |w AS (
         |  SELECT event_type, c,
         |    SUM(c) OVER (PARTITION BY event_type) AS n_t,
         |    SUM(c) OVER (PARTITION BY bucket) AS n_b,
         |    SUM(c) OVER () AS nn
         |  FROM f),
         |t AS (
         |  SELECT event_type, n_t,
         |    ROUND((CAST(c + 1 AS DOUBLE) / CAST(n_t + $psiBuckets AS DOUBLE)
         |         - CAST(n_b + 1 AS DOUBLE) / CAST(nn + $psiBuckets AS DOUBLE))
         |      * ln((CAST(c + 1 AS DOUBLE) / CAST(n_t + $psiBuckets AS DOUBLE))
         |          / (CAST(n_b + 1 AS DOUBLE) / CAST(nn + $psiBuckets AS DOUBLE))), 6) AS term
         |  FROM w)
         |SELECT event_type, CAST(MAX(n_t) AS BIGINT) AS n,
         |  CAST(ROUND(SUM(CAST(term AS DECIMAL(18,6))), 4) AS DOUBLE) AS psi
         |FROM t GROUP BY event_type ORDER BY event_type""".stripMargin
    },
    "sample_weighted" ->
      s"""WITH b AS (
         |  SELECT o_orderkey, o_orderpriority, o_orderkey % 8 AS shard,
         |    ${Det.centsSql("o_totalprice")} AS w_cents
         |  FROM orders),
         |c AS (
         |  SELECT *,
         |    SUM(w_cents) OVER (PARTITION BY o_orderpriority, shard
         |                       ORDER BY o_orderkey) AS cum,
         |    SUM(w_cents) OVER (PARTITION BY o_orderpriority, shard) AS tot
         |  FROM b)
         |SELECT o_orderkey, o_orderpriority, shard, w_cents
         |FROM c
         |WHERE (cum // GREATEST(tot // $weightedK, 1)) > ((cum - w_cents) // GREATEST(tot // $weightedK, 1))
         |ORDER BY o_orderkey""".stripMargin,
    "cdc_scd2" ->
      """SELECT o_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
        |  strftime(lead(o_orderdate) OVER w, '%Y-%m-%d') AS valid_to,
        |  CAST(CASE WHEN lead(o_orderdate) OVER w IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "cdc_merge" ->
      s"""WITH ch AS (
         |  SELECT o_orderkey, 'U' AS op, o_custkey AS ck,
         |    ${Det.centsSql("o_totalprice")} + 1000 AS cc
         |  FROM orders WHERE o_orderkey % 10 = 3
         |  UNION ALL
         |  SELECT o_orderkey, 'D', NULL, NULL
         |  FROM orders WHERE o_orderkey % 10 = 7
         |  UNION ALL
         |  SELECT -(o_orderkey + 1), 'I', o_custkey,
         |    ${Det.centsSql("o_totalprice")}
         |  FROM orders WHERE o_orderkey % 10 = 0)
         |SELECT COALESCE(t.o_orderkey, ch.o_orderkey) AS o_orderkey,
         |  CASE WHEN ch.op IS NOT NULL THEN ch.ck ELSE t.o_custkey END AS o_custkey,
         |  CASE WHEN ch.op IS NOT NULL THEN ch.cc
         |       ELSE ${Det.centsSql("t.o_totalprice")} END AS o_total_cents
         |FROM orders t FULL OUTER JOIN ch ON t.o_orderkey = ch.o_orderkey
         |WHERE COALESCE(ch.op, '') <> 'D'
         |ORDER BY o_orderkey""".stripMargin,
    "fn_string_sim" ->
      """SELECT p_partkey, levenshtein(p_brand, p_type) AS lev,
        |  ROUND(1.0 - CAST(levenshtein(p_brand, p_type) AS DOUBLE) /
        |    CAST(GREATEST(LENGTH(p_brand), LENGTH(p_type)) AS DOUBLE), 6) AS sim
        |FROM part ORDER BY p_partkey""".stripMargin,
    "funnel_stages" ->
      """WITH v AS (
        |  SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t_view
        |  FROM events WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t_click
        |  FROM events e JOIN v USING (user_id)
        |  WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) >= v.t_view
        |  GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t_purchase
        |  FROM events e JOIN c USING (user_id)
        |  WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) >= c.t_click
        |  GROUP BY e.user_id),
        |u AS (SELECT DISTINCT user_id FROM events)
        |SELECT u.user_id,
        |  CAST(CASE WHEN p.t_purchase IS NOT NULL THEN 3
        |            WHEN c.t_click IS NOT NULL THEN 2
        |            WHEN v.t_view IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS stage,
        |  strftime(v.t_view, '%Y-%m-%d %H:%M:%S') AS t_view,
        |  strftime(c.t_click, '%Y-%m-%d %H:%M:%S') AS t_click,
        |  strftime(p.t_purchase, '%Y-%m-%d %H:%M:%S') AS t_purchase
        |FROM u LEFT JOIN v USING (user_id)
        |  LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
        |ORDER BY u.user_id""".stripMargin,
    "retention_cohort" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id,
        |    CAST(floor(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) / 7) AS BIGINT) AS w
        |  FROM events),
        |co AS (SELECT user_id, MIN(w) AS cohort_week FROM uw GROUP BY user_id)
        |SELECT co.cohort_week, uw.w - co.cohort_week AS week_offset,
        |  COUNT(DISTINCT uw.user_id) AS n_users
        |FROM uw JOIN co USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ts_resample" ->
      s"""WITH ev AS (
         |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id,
         |    ${Det.centsSql("value")} AS vc,
         |    CAST(floor(epoch_us(CAST(ts AS TIMESTAMP)) / 3600000000) AS BIGINT) AS hb
         |  FROM events),
         |hourly AS (
         |  SELECT user_id, hb, COUNT(*) AS n FROM ev GROUP BY 1, 2),
         |lastv AS (
         |  SELECT user_id, hb, vc AS vc_last FROM (
         |    SELECT user_id, hb, vc,
         |      row_number() OVER (PARTITION BY user_id, hb
         |        ORDER BY us DESC, event_id DESC) AS rn
         |    FROM ev) WHERE rn = 1),
         |span AS (
         |  SELECT user_id, MIN(hb) AS h0, MAX(hb) AS h1 FROM ev GROUP BY 1),
         |grid AS (
         |  SELECT user_id, unnest(generate_series(h0, h1)) AS hb FROM span)
         |SELECT g.user_id, g.hb, CAST(COALESCE(h.n, 0) AS BIGINT) AS n,
         |  last_value(l.vc_last IGNORE NULLS) OVER (
         |    PARTITION BY g.user_id ORDER BY g.hb
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_cents
         |FROM grid g
         |  LEFT JOIN hourly h ON g.user_id = h.user_id AND g.hb = h.hb
         |  LEFT JOIN lastv l ON g.user_id = l.user_id AND g.hb = l.hb
         |ORDER BY g.user_id, g.hb""".stripMargin,
    "join_runtime_bloom" ->
      s"""SELECT l_returnflag, COUNT(*) AS n,
         |  ${Det.sumd2Sql("l_extendedprice")} AS sum_price
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE o_orderpriority = '1-URGENT'
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
