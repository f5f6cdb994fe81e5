package graft.queries

import graft.{QueryGroup, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2.C — join operators. Join-strategy choices (broadcast, SMJ)
  * change plan shape only, never results; the as-of join is the one
  * operator Spark lacks and is composed scalably (union-tag + single
  * window pass — one shuffle, no N² pair blowup). */
object Joins extends QueryGroup {

  /** As-of kernel (no Spark builtin), shared by the `join_asof` key and
    * the property suite: for each row, the latest strictly earlier row
    * of the same customer; date ties broken by max orderkey (D6).
    * Union-tag + last_value(ignoreNulls) over a single
    * (custkey, date, tag, key) sort — query rows (tag 0) sort before
    * same-date build rows (tag 1), so ROWS ... AND -1 sees only strictly
    * earlier dates. One shuffle, linear in input — the 100 TB-scale
    * as-of algorithm (vs the O(pairs) self-join the oracle uses).
    * Input columns: o_custkey, o_orderkey (long), o_orderdate (any
    * orderable type). */
  private[graft] def asofPrev(o: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val probe = o.withColumn("tag", lit(0))
      .withColumn("bid", lit(null).cast("long"))
      .withColumn("bdt", lit(null).cast(o.schema("o_orderdate").dataType))
    val build = o.withColumn("tag", lit(1))
      .withColumn("bid", col("o_orderkey"))
      .withColumn("bdt", col("o_orderdate"))
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("tag"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // prev_orderdate rides the SAME frame (no extra exchange) so a
    // max-gap tolerance (join_asof_tolerance) is one map-side
    // comparison downstream
    probe.unionByName(build)
      .withColumn("prev_orderkey", last(col("bid"), ignoreNulls = true).over(w))
      .withColumn("prev_orderdate", last(col("bdt"), ignoreNulls = true).over(w))
      .filter(col("tag") === 0)
      .select("o_orderkey", "prev_orderkey", "prev_orderdate", "o_orderdate")
  }

  /** NEAREST as-of join (pandas merge_asof direction='nearest'):
    * each probe row matches the build row minimizing |t_build − t_probe|
    * within its key. Completes the as-of family — join_asof/
    * join_asof_event are the backward form; forward is nearest's
    * degenerate case when pbid is null. Same union-tag single-window
    * algorithm, ONE shuffle for BOTH directions: the union sorts once
    * on (t, tag, bid) and the backward candidate rides a
    * (unbounded-preceding, -1) frame while the forward one rides
    * (+1, unbounded-following) over the SAME sort — Spark plans the
    * two frames without a second exchange. Distances compare as exact
    * integer microseconds (UTC session pins the epoch, and a
    * difference cancels any fixed offset). Ties: backward wins
    * (same-instant builds sort before the probe, so Δ=0 is a backward
    * match); equal-t build ties break max-bid backward / min-bid
    * forward (the frame edge rows under ascending bid — D6).
    * `tolMicros` is pandas merge_asof's `tolerance=`: a candidate
    * farther than the bound (in either direction) does not qualify —
    * the valid-side selection below degenerates to the unbounded rule
    * at the Long.MaxValue default (distances are bounded by the data's
    * time span, so the comparison never overflows). Input:
    * probe (key, t: timestamp, event_id), build (key, t, bid). Output
    * (event_id, key, matched_id, d_us); both null when the key has no
    * build rows within tolerance (D4). */
  private[graft] def asofNearest(probe: org.apache.spark.sql.DataFrame,
      build: org.apache.spark.sql.DataFrame,
      tolMicros: Long = Long.MaxValue): org.apache.spark.sql.DataFrame = {
    require(tolMicros >= 0, s"asofNearest: tolerance $tolMicros < 0")
    val p = probe.withColumn("tag", lit(1))
      .withColumn("bid", lit(null).cast("long"))
      .withColumn("bt", lit(null).cast("timestamp"))
      .select("key", "t", "event_id", "tag", "bid", "bt")
    val b = build.select(col("key"), col("t").cast("timestamp").as("t"),
      lit(null).cast("long").as("event_id"), lit(0).as("tag"),
      col("bid"), col("t").cast("timestamp").as("bt"))
    val wPrev = Window.partitionBy("key")
      .orderBy(col("t"), col("tag"), col("bid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNext = Window.partitionBy("key")
      .orderBy(col("t"), col("tag"), col("bid"))
      .rowsBetween(1, Window.unboundedFollowing)
    val u = p.unionByName(b)
      .withColumn("pbid", last(col("bid"), ignoreNulls = true).over(wPrev))
      .withColumn("pbt", last(col("bt"), ignoreNulls = true).over(wPrev))
      .withColumn("nbid", first(col("bid"), ignoreNulls = true).over(wNext))
      .withColumn("nbt", first(col("bt"), ignoreNulls = true).over(wNext))
      .filter(col("tag") === 1)
    val pd = unix_micros(col("t")) - unix_micros(col("pbt"))
    val nd = unix_micros(col("nbt")) - unix_micros(col("t"))
    val validPrev = col("pbid").isNotNull && pd <= tolMicros
    val validNext = col("nbid").isNotNull && nd <= tolMicros
    val takePrev = validPrev && (!validNext || pd <= nd)
    u.select(col("event_id"), col("key"),
      when(takePrev, col("pbid")).when(validNext, col("nbid")).as("matched_id"),
      when(takePrev, pd).when(validNext, nd).as("d_us"))
  }

  def queries: Seq[(String, Q)] = Seq(
    "join_inner_equi" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      o.join(c, o("o_custkey") === c("c_custkey"), "inner")
        .select("o_orderkey", "o_custkey", "c_name", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // Small dimension side explicitly broadcast (plan-shape assertion is
    // in the test suite; result identical to a shuffled join).
    "join_broadcast" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
      val p = Tables.part(s, dir)
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_extendedprice", "p_brand", "p_retailprice")
        .orderBy(graft.Det.liKey.head, graft.Det.liKey.tail: _*)
    }),

    // Same equi-join pinned to sort-merge via hint.
    "join_sort_merge" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir).hint("merge")
      o.join(c, o("o_custkey") === c("c_custkey"), "inner")
        .select("o_orderkey", "c_name", "c_acctbal")
        .orderBy("o_orderkey")
    }),

    // Outer joins against a filtered build side produce the nulls (D4).
    "join_left_outer" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir).filter(col("c_acctbal") > 5000)
      o.join(c, o("o_custkey") === c("c_custkey"), "left")
        .select("o_orderkey", "c_custkey", "c_name")
        .orderBy("o_orderkey")
    }),

    // Full outer: rich-customer subset vs per-customer order counts —
    // unmatched rows appear on both sides.
    "join_full_outer" -> ((s, dir) => {
      val c = Tables.customer(s, dir).filter(col("c_acctbal") > 5000)
        .select("c_custkey", "c_acctbal")
      val o = Tables.orders(s, dir).groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"))
      c.join(o, c("c_custkey") === o("o_custkey"), "full")
        .select(
          coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          col("c_acctbal"), col("n_orders"))
        .orderBy("custkey")
    }),

    "join_left_semi" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // D4 build-side synthesis (like filter_null_semantics): every customer
    // in the fixtures has ≥1 order, so the plain anti-join is vacuously
    // empty at every sf; filtering the build side to high-value orders
    // makes the result non-empty (8/68/762 rows at sf0.001/0.01/0.1) while
    // keeping the operator the same physical left-anti hash join.
    "join_left_anti" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).filter(col("o_totalprice") > 350000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    "join_cross" -> ((s, dir) => {
      val r = Tables.region(s, dir)
      val n = Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))
      r.select(col("r_regionkey"), col("r_name")).crossJoin(n)
        .orderBy("r_regionkey", "n_nationkey")
    }),

    // Non-equi theta join (physical BNLJ): ordered nation pairs.
    "join_theta_range" -> ((s, dir) => {
      val a = Tables.nation(s, dir).select(
        col("n_nationkey").as("k1"), col("n_name").as("name1"))
      val b = Tables.nation(s, dir).select(
        col("n_nationkey").as("k2"), col("n_name").as("name2"))
      a.join(b, col("k1") < col("k2"))
        .orderBy("k1", "k2")
    }),

    // Per-group Pareto skyline (Börzsönyi et al. 2001's skyline
    // operator): each supplier's non-dominated lineitems under
    // (price, quantity) both minimized — the multi-criteria shortlist.
    // ONE left-anti self-join: equi on the group key plus the strict-
    // dominance band predicate, so the quadratic compare is keyed per
    // supplier and bounded by group width, never a global product.
    // Duplicate (price, qty) points don't dominate each other — both
    // stay (the standard skyline tie semantics). Money compares as
    // exact integer cents.
    "skyline_pareto" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), graft.Det.cents(col("l_extendedprice")).as("price_cents"),
        col("l_quantity").cast("long").as("quantity"))
      val dom = li.select(col("l_suppkey").as("sk"),
        col("price_cents").as("pc2"), col("quantity").as("qc2"))
      li.join(dom,
          col("l_suppkey") === col("sk") &&
            col("pc2") <= col("price_cents") && col("qc2") <= col("quantity") &&
            (col("pc2") < col("price_cents") || col("qc2") < col("quantity")),
          "left_anti")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "price_cents")
    }),

    // Equi + band predicate: lineitem shipped within 90 days of its order.
    "join_interval" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      l.join(o,
          l("l_orderkey") === o("o_orderkey") &&
          l("l_shipdate") >= o("o_orderdate") &&
          l("l_shipdate") <= o("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_extendedprice", "o_orderdate", "l_shipdate")
        .orderBy(graft.Det.liKey.head, graft.Det.liKey.tail: _*)
    }),

    // Banded range join — the scale decomposition for a big-big range
    // join with no selective equi key beyond the range itself: pairs of
    // the same user's events within 1 hour. The naive plan is per-user
    // pair enumeration with a residual predicate (a hot user serializes
    // into one task; with no user key at all it degenerates to BNLJ);
    // the banded form adds an HOUR-BUCKET equi key — the earlier side
    // explodes into its own and the next bucket, the later side keys by
    // its bucket — so every qualifying pair meets in exactly one
    // (user, bucket) hash-join group and per-task work is bounded by
    // band population, never a whole user's history. Same rows as the
    // plain range predicate (the oracle runs it), no distinct needed: a
    // pair matches in exactly one of the two exploded buckets.
    "join_range_banded" -> ((s, dir) =>
      rangeBandedPairs(
          Tables.events(s, dir).select(col("user_id").as("key"),
            col("event_id").as("id"), col("ts")),
          windowMicros = 3600000000L)
        .orderBy("id_a", "id_b")),

    // (kernel for join_range_banded lives below: rangeBandedPairs)

    // Skew-mitigated equi-join: the build side is replicated across 8
    // salt buckets and the probe side picks a deterministic bucket, so a
    // hot key's rows spread over 8 reducers instead of one. Result is
    // exactly the plain equi-join (the oracle), making the technique
    // verifiable; at 100 TB this is the fallback when AQE skew-split
    // isn't available (e.g. non-AQE engines or stateful ops).
    "join_skew_salted" -> ((s, dir) => {
      val salts = 8
      val l = Tables.lineitem(s, dir)
        .withColumn("salt", pmod(col("l_orderkey"), lit(salts)).cast("int"))
      val sup = Tables.supplier(s, dir)
        .withColumn("salt", explode(sequence(lit(0), lit(salts - 1))))
      l.join(sup,
          l("l_suppkey") === sup("s_suppkey") && l("salt") === sup("salt"))
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_extendedprice", "s_name", "s_nationkey")
        .orderBy(graft.Det.liKey.head, graft.Det.liKey.tail: _*)
    }),

    // As-of join — semantics and scale argument on the [[asofPrev]]
    // kernel scaladoc (one copy; the duplicated comment here was the
    // doc-drift class the Det.discUnits consolidation removed for code).
    "join_asof" -> ((s, dir) =>
      asofPrev(Tables.orders(s, dir)
          .select("o_custkey", "o_orderkey", "o_orderdate"))
        .select("o_orderkey", "prev_orderkey")
        .orderBy("o_orderkey")),

    // Null-safe equality join (<=>): rows with a NULL key still match the
    // NULL group — a plain equi-join silently drops them (the classic
    // nullable-dimension bug). Keys are synthesized nulls (D4: bal < 500
    // ⇒ segment unknown); the right side is the per-segment count
    // INCLUDING the null group.
    "join_null_safe" -> ((s, dir) => {
      val a = Tables.customer(s, dir).select(
        col("c_custkey"),
        when(col("c_acctbal") < 500, lit(null)).otherwise(col("c_mktsegment")).as("seg"))
      val g = a.groupBy("seg").agg(count(lit(1)).as("n"))
        .withColumnRenamed("seg", "gseg") // disambiguate the self-derived side
      a.join(g, col("seg") <=> col("gseg"))
        .select(col("c_custkey"), col("seg"), col("n"))
        .orderBy("c_custkey")
    }),

    // Cross-table as-of (SURVEY §2.C's declared case): each event matched
    // to the customer's latest order with o_orderdate <= ts (INCLUSIVE —
    // build rows sort with tag 0 BEFORE same-instant probe rows, so the
    // strictly-preceding frame still sees them), date ties broken by max
    // o_orderkey (D6: builds sort ascending by orderkey; last_value takes
    // the largest). Same union-tag single-window algorithm as join_asof —
    // one shuffle, linear, mixed timestamp-vs-date comparison handled by
    // Spark's timestamp promotion. Probe rows carry a null bid, so
    // last(bid, ignoreNulls) skips earlier probes in the same partition.
    // NEAREST as-of (kernel scaladoc on [[asofNearest]]): each event
    // matched to the customer's temporally closest order in either
    // direction; backward wins exact-distance ties.
    "join_asof_nearest" -> ((s, dir) =>
      asofNearest(
          Tables.events(s, dir)
            .select(col("user_id").as("key"), col("ts").as("t"), col("event_id")),
          Tables.orders(s, dir)
            .select(col("o_custkey").as("key"),
              col("o_orderdate").cast("timestamp").as("t"),
              col("o_orderkey").as("bid")))
        .select(col("event_id"), col("key").as("user_id"),
          col("matched_id").as("o_orderkey"), col("d_us"))
        .orderBy("event_id")),

    "join_asof_event" -> ((s, dir) =>
      asofInclusive(
          Tables.events(s, dir)
            .select(col("user_id").as("key"), col("ts").as("t"), col("event_id")),
          Tables.orders(s, dir)
            .select(col("o_custkey").as("key"), col("o_orderdate").as("t"),
              col("o_orderkey").as("bid")))
        .select(col("event_id"), col("key").as("user_id"), col("okey").as("o_orderkey"))
        .orderBy("event_id")),

    // As-of with a MAX-GAP tolerance (pandas merge_asof tolerance=):
    // join_asof's previous-order match, but a predecessor staler than
    // the bound nulls out instead of matching — the freshness rule
    // every feature-join pipeline needs ("the customer's previous
    // order, IF within 90 days"). One map-side comparison on the
    // kernel's prev_orderdate column (same window, no extra exchange);
    // backward's latest-<-t is also the nearest <-t, so pick-then-null
    // ≡ pandas' filter-then-pick (the property suite pins the law on
    // random instances; both kernels — this strict form via
    // prev_orderdate and the inclusive form via obt — carry it).
    "join_asof_tolerance" -> ((s, dir) => {
      val m = asofPrev(Tables.orders(s, dir)
        .select("o_custkey", "o_orderkey", "o_orderdate"))
      val dUs = unix_micros(col("o_orderdate").cast("timestamp")) -
        unix_micros(col("prev_orderdate").cast("timestamp"))
      val fresh = col("prev_orderkey").isNotNull && dUs <= asofToleranceMicros
      m.select(col("o_orderkey"),
          when(fresh, col("prev_orderkey")).as("prev_orderkey"),
          when(fresh, dUs).as("d_us"))
        .orderBy("o_orderkey")
    })
  )

  /** join_asof_tolerance's max gap: 90 days in microseconds, against a
    * fixture prev-order gap whose median is ~151 days (measured at
    * sf0.01) — so both branches (kept match, nulled-out stale) are
    * load-bearing at every SF. One constant feeding the Spark predicate
    * and the oracle. */
  private[graft] val asofToleranceMicros: Long = 90L * 86400L * 1000000L

  /** Banded range self-join kernel — pairs (id_a, id_b) of rows sharing
    * `key` with ts_b ∈ (ts_a, ts_a + windowMicros]. Input columns:
    * (key, id, ts: timestamp). Both sides get a ⌊µs/window⌋ band id;
    * the earlier side explodes into its own and the next band, the
    * later side keys by its band, so every qualifying pair meets in
    * exactly ONE (key, band) hash-join group (no distinct needed) and
    * per-task work is bounded by band population — never a hot key's
    * whole history, never a BNLJ. Window arithmetic is on epoch
    * microseconds (instant-based, engine-independent). */
  private[graft] def rangeBandedPairs(rows: org.apache.spark.sql.DataFrame,
      windowMicros: Long): org.apache.spark.sql.DataFrame = {
    // Band id by INTEGRAL floor division (round-10 ADVICE): Column `/`
    // is double division, and past ~year 2200 the epoch-micros quotient's
    // ulp exceeds 1 µs — a boundary row could band off-by-one and
    // silently drop a qualifying pair. pmod's non-negative remainder
    // makes the numerator the largest exact multiple of the window ≤ us,
    // so the long `div` is exact floor at any magnitude (negative
    // pre-1970 instants included).
    val base = rows.select(col("key"), col("id"), col("ts"),
      expr(s"(unix_micros(ts) - pmod(unix_micros(ts), ${windowMicros}L))" +
        s" div ${windowMicros}L").as("hb"))
    val aSide = base.select(col("key"), col("id").as("id_a"),
      unix_micros(col("ts")).as("us_a"),
      explode(array(col("hb"), col("hb") + 1)).as("jb"))
    val bSide = base.select(col("key"), col("id").as("id_b"),
      unix_micros(col("ts")).as("us_b"), col("hb").as("jb"))
    aSide.join(bSide, Seq("key", "jb"))
      .filter(col("us_b") > col("us_a") &&
        col("us_b") <= col("us_a") + windowMicros)
      .select("id_a", "id_b")
  }

  /** INCLUSIVE as-of kernel shared by `join_asof_event`,
    * `join_asof_tolerance` and the property suite: for each probe row,
    * the latest build row with build.t ≤ probe.t (ties on t broken by
    * max bid — builds sort with tag 0 BEFORE same-instant probes, so
    * the strictly-preceding frame still sees them). (t, tag, bid) order
    * is deterministic for builds; probes tie only with other probes
    * (bid null), whose relative order cannot change the preceding-build
    * set — output is deterministic (D6). Also emits `obt` — the matched
    * build row's own t, from the SAME window frame (no extra exchange)
    * — so a tolerance bound (pandas merge_asof `tolerance=`) is one
    * map-side comparison on the output; backward picks the LATEST ≤ t,
    * which is also the NEAREST ≤ t, so filter-then-pick ≡
    * pick-then-null-if-stale. `probe`: (key, t, event_id); `build`:
    * (key, t, bid: long). */
  private[graft] def asofInclusive(probe: org.apache.spark.sql.DataFrame,
      build: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val tType = build.schema("t").dataType
    val p = probe.withColumn("tag", lit(1))
      .withColumn("bid", lit(null).cast("long"))
      .withColumn("bt", lit(null).cast(tType))
    val b = build.select(col("key"), col("t"),
      lit(null).cast(probe.schema("event_id").dataType).as("event_id"),
      lit(0).as("tag"), col("bid"), col("t").as("bt"))
    val w = Window.partitionBy("key")
      .orderBy(col("t"), col("tag"), col("bid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    p.unionByName(b.select(p.columns.map(col).toIndexedSeq: _*))
      .withColumn("okey", last(col("bid"), ignoreNulls = true).over(w))
      .withColumn("obt", last(col("bt"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .drop("bt")
  }

  def oracles: Seq[(String, String)] = Seq(
    "join_inner_equi" ->
      """SELECT o_orderkey, o_custkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "join_broadcast" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_extendedprice, p_brand, p_retailprice
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, l_extendedprice""".stripMargin,
    "join_sort_merge" ->
      """SELECT o_orderkey, c_name, c_acctbal
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "join_left_outer" ->
      """SELECT o_orderkey, c_custkey, c_name
        |FROM orders LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 5000) c
        |  ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "join_full_outer" ->
      """SELECT COALESCE(c_custkey, o_custkey) AS custkey, c_acctbal, n_orders
        |FROM (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 5000) c
        |FULL JOIN (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey) o
        |  ON c_custkey = o_custkey
        |ORDER BY custkey""".stripMargin,
    "join_left_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "join_left_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 350000)
        |ORDER BY c_custkey""".stripMargin,
    "join_cross" ->
      """SELECT r_regionkey, r_name, n_nationkey, n_name
        |FROM region CROSS JOIN nation
        |ORDER BY r_regionkey, n_nationkey""".stripMargin,
    "join_theta_range" ->
      """SELECT a.n_nationkey AS k1, a.n_name AS name1,
        |       b.n_nationkey AS k2, b.n_name AS name2
        |FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
        |ORDER BY k1, k2""".stripMargin,
    "skyline_pareto" ->
      s"""WITH l AS (
         |  SELECT l_suppkey, l_orderkey, l_linenumber, l_partkey,
         |    ${graft.Det.centsSql("l_extendedprice")} AS price_cents,
         |    CAST(l_quantity AS BIGINT) AS quantity
         |  FROM lineitem)
         |SELECT l_suppkey, l_orderkey, l_linenumber, l_partkey,
         |  price_cents, quantity
         |FROM l a
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM l b
         |  WHERE b.l_suppkey = a.l_suppkey
         |    AND b.price_cents <= a.price_cents AND b.quantity <= a.quantity
         |    AND (b.price_cents < a.price_cents OR b.quantity < a.quantity))
         |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, price_cents""".stripMargin,
    "join_interval" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_extendedprice, o_orderdate, l_shipdate
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  AND l_shipdate BETWEEN o_orderdate AND o_orderdate + INTERVAL 90 DAY
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, l_extendedprice""".stripMargin,
    // the PLAIN range-predicate join — any banding bug (missed band,
    // double-counted pair, off-by-one bucket edge) diverges
    "join_range_banded" ->
      """SELECT a.event_id AS id_a, b.event_id AS id_b
        |FROM events a JOIN events b ON a.user_id = b.user_id
        |  AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
        |ORDER BY id_a, id_b""".stripMargin,
    "join_skew_salted" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_extendedprice, s_name, s_nationkey
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, l_extendedprice""".stripMargin,
    "join_asof" ->
      """SELECT o.o_orderkey, b.o_orderkey AS prev_orderkey
        |FROM orders o LEFT JOIN orders b
        |  ON b.o_custkey = o.o_custkey AND b.o_orderdate < o.o_orderdate
        |QUALIFY row_number() OVER (PARTITION BY o.o_orderkey
        |  ORDER BY b.o_orderdate DESC NULLS LAST, b.o_orderkey DESC NULLS LAST) = 1
        |ORDER BY o.o_orderkey""".stripMargin,
    "join_null_safe" ->
      """WITH a AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_acctbal < 500 THEN NULL ELSE c_mktsegment END AS seg
        |  FROM customer),
        |g AS (SELECT seg, COUNT(*) AS n FROM a GROUP BY seg)
        |SELECT a.c_custkey, a.seg, g.n
        |FROM a JOIN g ON a.seg IS NOT DISTINCT FROM g.seg
        |ORDER BY a.c_custkey""".stripMargin,
    "join_asof_event" ->
      """SELECT e.event_id, e.user_id, b.o_orderkey
        |FROM events e LEFT JOIN orders b
        |  ON b.o_custkey = e.user_id AND b.o_orderdate <= e.ts
        |QUALIFY row_number() OVER (PARTITION BY e.event_id
        |  ORDER BY b.o_orderdate DESC NULLS LAST, b.o_orderkey DESC NULLS LAST) = 1
        |ORDER BY e.event_id""".stripMargin,
    // pandas-semantics form: the tolerance bound sits IN the join
    // predicate (filter-then-pick), which backward's latest-before-t
    // makes equivalent to the kernel's pick-then-null — the property
    // suite carries the proof on adversarial instances
    "join_asof_tolerance" ->
      s"""SELECT o.o_orderkey, b.o_orderkey AS prev_orderkey,
        |  epoch_us(CAST(o.o_orderdate AS TIMESTAMP))
        |    - epoch_us(CAST(b.o_orderdate AS TIMESTAMP)) AS d_us
        |FROM orders o LEFT JOIN orders b
        |  ON b.o_custkey = o.o_custkey AND b.o_orderdate < o.o_orderdate
        |  AND epoch_us(CAST(o.o_orderdate AS TIMESTAMP))
        |    - epoch_us(CAST(b.o_orderdate AS TIMESTAMP)) <= $asofToleranceMicros
        |QUALIFY row_number() OVER (PARTITION BY o.o_orderkey
        |  ORDER BY b.o_orderdate DESC NULLS LAST, b.o_orderkey DESC NULLS LAST) = 1
        |ORDER BY o.o_orderkey""".stripMargin,
    // Independent naive form of the nearest as-of: join ALL the key's
    // build rows and rank by (|distance|, backward-first, max-bid
    // backward / min-bid forward) — the kernel's frame-edge tie rules
    // spelled out as one ORDER BY.
    "join_asof_nearest" ->
      """SELECT e.event_id, e.user_id, b.o_orderkey,
        |  ABS(epoch_us(CAST(b.o_orderdate AS TIMESTAMP))
        |      - epoch_us(CAST(e.ts AS TIMESTAMP))) AS d_us
        |FROM events e LEFT JOIN orders b ON b.o_custkey = e.user_id
        |QUALIFY row_number() OVER (PARTITION BY e.event_id
        |  ORDER BY ABS(epoch_us(CAST(b.o_orderdate AS TIMESTAMP))
        |             - epoch_us(CAST(e.ts AS TIMESTAMP))) ASC NULLS LAST,
        |    CASE WHEN b.o_orderdate <= e.ts THEN 0 ELSE 1 END ASC,
        |    CASE WHEN b.o_orderdate <= e.ts THEN -b.o_orderkey
        |         ELSE b.o_orderkey END ASC) = 1
        |ORDER BY e.event_id""".stripMargin
  )
}
