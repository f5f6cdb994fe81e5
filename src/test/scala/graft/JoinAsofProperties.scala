package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Round-5 VERDICT #8 — property-based guard on the as-of join's tie
  * semantics: the shipped union-tag window kernel must match the
  * QUALIFY-form reference semantics (latest strictly-earlier date, date
  * ties broken by MAX orderkey — D6) on random instances that force
  * duplicate dates, the case the fixture exercises only sparsely. */
object JoinAsofProperties extends Properties("join_asof") {

  // each sample runs Spark jobs — a dozen adversarial instances beats a
  // hundred redundant ones
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = SparkSuite.session

  // few customers × few distinct dates ⇒ duplicate (custkey, date) pairs
  // with high probability; orderkeys unique by construction so the D6
  // tie-break is well-defined
  private val instances: Gen[List[(Long, Int, Long)]] = for {
    n <- Gen.choose(1, 40)
    custs <- Gen.listOfN(n, Gen.choose(1L, 4L))
    dates <- Gen.listOfN(n, Gen.choose(1, 6))
  } yield custs.zip(dates).zipWithIndex.map { case ((c, d), i) => (c, d, i + 100L) }

  property("window kernel = QUALIFY-form semantics incl. duplicate dates") =
    forAll(instances) { rows =>
      import spark.implicits._
      val df = rows.toDF("o_custkey", "o_orderdate", "o_orderkey")
      // (orderkey, prev_orderkey, prev_orderdate, ...) — the carried
      // prev date must pair with the chosen key (the tolerance surface)
      val got = queries.Joins.asofPrev(df).collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getInt(2)))))
        .toMap
      val expected = rows.map { case (c, d, k) =>
        val earlier = rows.filter(r => r._1 == c && r._2 < d)
        k -> earlier.maxByOption(r => (r._2, r._3)).map(r => (r._3, r._2))
      }.toMap
      got == expected
    }

  // probes and builds share few keys × few instants so probe-instant ==
  // build-instant collisions (the INCLUSIVE case) occur constantly
  private val asymInstances: Gen[(List[(Long, Int, Long)], List[(Long, Int, Long)])] = for {
    np <- Gen.choose(1, 25)
    nb <- Gen.choose(0, 25)
    pc <- Gen.listOfN(np, Gen.choose(1L, 3L)); pt <- Gen.listOfN(np, Gen.choose(1, 5))
    bc <- Gen.listOfN(nb, Gen.choose(1L, 3L)); bt <- Gen.listOfN(nb, Gen.choose(1, 5))
  } yield (
    pc.zip(pt).zipWithIndex.map { case ((c, t), i) => (c, t, i + 500L) },
    bc.zip(bt).zipWithIndex.map { case ((c, t), i) => (c, t, i + 900L) })

  property("inclusive kernel = latest build with t <= probe t, max-bid ties") =
    forAll(asymInstances) { case (probes, builds) =>
      import spark.implicits._
      val p = probes.toDF("key", "t", "event_id")
      val b = builds.toDF("key", "t", "bid")
      val got = queries.Joins.asofInclusive(p, b).collect()
        .map(r => r.getLong(2) -> (if (r.isNullAt(5)) None else Some(r.getLong(5))))
        .toMap
      val expected = probes.map { case (c, t, eid) =>
        val eligible = builds.filter(r => r._1 == c && r._2 <= t)
        eid -> eligible.maxByOption(r => (r._2, r._3)).map(_._3)
      }.toMap
      got == expected
    }

  // Tolerance law (round-17 VERDICT #8, pandas merge_asof tolerance=):
  // the kernel picks the latest ≤ t and nulls it when staler than the
  // bound (via the obt column); pandas filters candidates FIRST. For
  // the backward direction these are the same function — pinned here on
  // the adversarial duplicate-instant instances.
  property("backward tolerance: pick-then-null = filter-then-pick") =
    forAll(for { pb <- asymInstances; tol <- Gen.choose(0, 3) }
        yield (pb._1, pb._2, tol)) { case (probes, builds, tol) =>
      import spark.implicits._
      val p = probes.toDF("key", "t", "event_id")
      val b = builds.toDF("key", "t", "bid")
      // output columns: (key, t, event_id, tag, bid, okey, obt)
      val got = queries.Joins.asofInclusive(p, b).collect()
        .map(r => r.getLong(2) -> (
          if (r.isNullAt(5) || r.getInt(1) - r.getInt(6) > tol) None
          else Some(r.getLong(5))))
        .toMap
      val expected = probes.map { case (c, t, eid) =>
        val eligible = builds.filter(r => r._1 == c && r._2 <= t && t - r._2 <= tol)
        eid -> eligible.maxByOption(r => (r._2, r._3)).map(_._3)
      }.toMap
      got == expected
    }

  // Nearest with tolerance: a candidate farther than the bound in
  // either direction must not win even when the other side has no
  // candidate at all — the naive recompute spells out the kernel's
  // (distance, backward-first, frame-edge bid) tie rules.
  property("nearest tolerance: kernel = naive filtered nearest") =
    forAll(for { pb <- asymInstances; tol <- Gen.choose(0, 3) }
        yield (pb._1, pb._2, tol)) { case (probes, builds, tol) =>
      import spark.implicits._
      import org.apache.spark.sql.functions.{col, timestamp_micros}
      val p = probes.toDF("key", "ti", "event_id")
        .select(col("key"), timestamp_micros(col("ti").cast("long")).as("t"),
          col("event_id"))
      val b = builds.toDF("key", "ti", "bid")
        .select(col("key"), timestamp_micros(col("ti").cast("long")).as("t"),
          col("bid"))
      val got = queries.Joins.asofNearest(p, b, tol.toLong).collect()
        .map(r => r.getLong(0) -> (
          if (r.isNullAt(2)) None else Some((r.getLong(2), r.getLong(3)))))
        .toMap
      val expected = probes.map { case (c, t, eid) =>
        val best = builds
          .filter(r => r._1 == c && math.abs(r._2 - t) <= tol)
          .minByOption { r =>
            val back = r._2 <= t
            (math.abs(r._2 - t).toLong, if (back) 0 else 1,
              if (back) -r._3 else r._3)
          }
        eid -> best.map(r => (r._3, math.abs(r._2 - t).toLong))
      }.toMap
      got == expected
    }

  // Band-boundary guard for the banded range join (round-11 VERDICT
  // #2): band ids must be the exact integral ⌊µs/window⌋ — a double
  // division's quotient ulp exceeds 1 µs past ~year 2200, where a
  // boundary row banding off-by-one silently drops a qualifying pair.
  // Instants are drawn within ±2 windows of an hour-multiple boundary
  // near year 2500 (1.676e16 µs) and BEFORE the epoch (negative
  // micros — the floor-vs-truncate divide), with ±1 µs edge cases
  // generated explicitly.
  private val WindowUs = 3600000000L
  private val bandInstances: Gen[List[(Long, Long, Long)]] = for {
    n <- Gen.choose(2, 24)
    boundary <- Gen.oneOf(4654800L * WindowUs, -13L * WindowUs)
    offs <- Gen.listOfN(n, Gen.oneOf(
      Gen.choose(-2 * WindowUs, 2 * WindowUs),
      Gen.oneOf(-WindowUs - 1, -WindowUs, -1L, 0L, 1L,
        WindowUs, WindowUs + 1)))
  } yield offs.zipWithIndex.map { case (o, i) =>
    ((i % 2).toLong, i.toLong, boundary + o)
  }

  property("banded pairs exact at far-future and pre-epoch band boundaries") =
    forAll(bandInstances) { rows =>
      import spark.implicits._
      import org.apache.spark.sql.functions.{col, timestamp_micros}
      val df = rows.toDF("key", "id", "us")
        .select(col("key"), col("id"), timestamp_micros(col("us")).as("ts"))
      val got = queries.Joins.rangeBandedPairs(df, WindowUs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = (for {
        a <- rows; b <- rows
        if a._1 == b._1 && b._3 > a._3 && b._3 <= a._3 + WindowUs
      } yield (a._2, b._2)).toSet
      got == expected
    }
}
