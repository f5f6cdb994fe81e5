package graft

import graft.functions.{Bloom, BloomFilterAgg}
import org.apache.spark.sql.functions._

/** The approximate-matching family (queries/Matching.scala): the
  * deletion-neighborhood fuzzy join's exactness against brute force
  * (both taus, all edit kinds), and the bloom filter's two structural
  * guarantees — zero false negatives (what makes the prefilter-verify
  * pipelines exact) and a bounded false-positive rate (what makes them
  * cheap). The oracled keys pin fixture behavior; this spec pins the
  * algorithm on adversarial inputs the fixtures don't contain.
  */
class MatchingSpec extends SparkSuite {

  // substitutions, inserts, deletes, transposition (lev 2), repeated
  // chars, prefix/suffix edits, a short string, and far-apart controls
  private val words = Seq(
    1L -> "kitten", 2L -> "sitten", 3L -> "kittens", 4L -> "kiten",
    5L -> "mitten", 6L -> "sitting", 7L -> "ab", 8L -> "ba",
    9L -> "abba", 10L -> "baba", 11L -> "zzzzzz", 12L -> "kettle",
    13L -> "aab", 14L -> "aba", 15L -> "x", 16L -> "xy")

  private def bruteForce(tau: Int): Set[(Long, Long, Long)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for {
      (ia, sa) <- words; (ib, sb) <- words
      if ia < ib && lev(sa, sb) <= tau
    } yield (ia, ib, lev(sa, sb).toLong)).toSet
  }

  private def engine(tau: Int): Set[(Long, Long, Long)] = {
    import spark.implicits._
    Graft.fuzzyMatches(words.toDF("wid", "w"), "wid", "w", tau)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("fuzzy join tau=1 equals brute force (subs, inserts, deletes)") {
    assert(engine(1) == bruteForce(1))
  }

  test("fuzzy join tau=2 equals brute force (incl. transpositions)") {
    assert(engine(2) == bruteForce(2))
  }

  test("fuzzy join verify is load-bearing: shared variants at lev 2 are cut at tau=1") {
    // "ab" and "ba" share deletion variants ("a", "b") but lev = 2 —
    // a candidate-only join would emit them; tau=1 must not
    val got = engine(1)
    assert(!got.exists(p => p._1 == 7L && p._2 == 8L),
      "tau=1 emitted a lev-2 pair: the levenshtein verify is missing")
    assert(bruteForce(2).contains((7L, 8L, 2L)), "fixture broke: ab/ba should be lev 2")
  }

  test("bloom filter: zero false negatives, FPR within 3x of the (1-e^-kn/m)^k bound") {
    import spark.implicits._
    val mBits = 1 << 14
    val k = 5
    val members = (0L until 2000L).map(i => s"member-$i").toDF("s")
      .select(xxhash64(col("s")).as("h1"),
        xxhash64(col("s"), lit(Bloom.H2Salt)).as("h2"))
    val bloomUdaf = udaf(new BloomFilterAgg(mBits, k))
    val bw = members.repartition(7) // partial buffers force real merges
      .agg(bloomUdaf(col("h1"), col("h2")).as("bw"))
    def probe(df: org.apache.spark.sql.DataFrame): Long =
      df.crossJoin(broadcast(bw))
        .filter(expr(Bloom.mightContainSql("bw", "h1", "h2", mBits, k)))
        .count()
    assert(probe(members) == 2000L, "a built key probed negative: false negative")
    val strangers = (0L until 20000L).map(i => s"stranger-$i").toDF("s")
      .select(xxhash64(col("s")).as("h1"),
        xxhash64(col("s"), lit(Bloom.H2Salt)).as("h2"))
    val fp = probe(strangers)
    val bound = math.pow(1 - math.exp(-k * 2000.0 / mBits), k) // ≈ 0.022
    assert(fp <= 3 * bound * 20000,
      s"FPR ${fp / 20000.0} exceeds 3x the theoretical ${bound}")
  }

  test("bloom merge is partition-order free: filters agree at any parallelism") {
    import spark.implicits._
    val keys = (0L until 500L).map(i => s"k$i").toDF("s")
      .select(xxhash64(col("s")).as("h1"),
        xxhash64(col("s"), lit(Bloom.H2Salt)).as("h2"))
    val agg = udaf(new BloomFilterAgg(1 << 12, 4))
    val a = keys.repartition(1).agg(agg(col("h1"), col("h2"))).head.getSeq[Long](0)
    val b = keys.repartition(13).agg(agg(col("h1"), col("h2"))).head.getSeq[Long](0)
    assert(a == b, "bloom words differ under re-partitioned aggregation")
  }

  test("weightedSample: inclusion frequency tracks weight across seeds (ES race)") {
    import spark.implicits._
    // 400 independent races in ONE job: explode seeds, per-seed argmax
    // of the ES key u^(1/w) — k=1 inclusion probability is w/Σw exactly
    val rows = Seq((1L, 1.0), (2L, 2.0), (3L, 4.0))
    val raced = (0L until 400L).flatMap(s => rows.map { case (i, w) => (s, i, w) })
      .toDF("seed", "id", "w")
      .withColumn("u", (pmod(xxhash64(col("id"), col("seed")), lit(1L << 52))
        .cast("double") + lit(0.5)) / lit((1L << 52).toDouble))
      .withColumn("key", pow(col("u"), lit(1.0) / col("w")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("seed")
          .orderBy(col("key").desc, col("id"))))
      .filter(col("rn") === 1)
      .groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (c1, c2, c4) = (raced.getOrElse(1L, 0L), raced.getOrElse(2L, 0L),
      raced.getOrElse(3L, 0L))
    // expectations 57/114/229 of 400; generous bands — this pins the
    // proportionality LAW, not a seed-specific draw
    assert(c4 > c2 && c2 > c1, s"weight ordering violated: $c1/$c2/$c4")
    assert(c4.toDouble / c1 > 2.2 && c4.toDouble / c1 < 8.0,
      s"4:1 weight ratio should show ~4x inclusion, got $c4:$c1")
    // the facade draws the same race: k=1 equals this job's seed-42 pick
    val pick = Graft.weightedSample(
      rows.toDF("id", "w"), "id", "w", k = 1, seed = 42L)
      .select("id").head.getLong(0)
    val expect = rows.map { case (i, w) =>
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        i, org.apache.spark.sql.types.LongType, 42L)
      val u = (java.lang.Math.floorMod(h, 1L << 52) + 0.5) / (1L << 52).toDouble
      (math.pow(u, 1.0 / w), -i)
    }.zip(rows.map(_._1)).maxBy(_._1)._2
    assert(pick == expect, "facade race diverged from the reference draw")
  }

  test("weightedSample fails loud on non-positive weights") {
    import spark.implicits._
    val boom = intercept[Exception] {
      Graft.weightedSample(Seq((1L, 0.0)).toDF("id", "w"), "id", "w", 1).collect()
    }
    assert(boom.getMessage.contains("strictly positive"))
  }

  test("mixtureResample facade: exact target proportions, bottleneck-sized") {
    val docs = Tables.documents(spark, sf001)
    val shares = graft.queries.TextOps.mixtureShares
    val out = Graft.mixtureResample(spark, docs, "doc_id", "lang", shares)
    val got = out.groupBy("bucket").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val t = shares.map { case (l, s) => n.getOrElse(l, 0L) * 10000L / s }.min
    shares.foreach { case (l, s) =>
      assert(got.getOrElse(l, 0L) == t * s / 10000L,
        s"bucket $l: got ${got.getOrElse(l, 0L)}, want ${t * s / 10000L}")
    }
    // an absent bucket zeroes the whole mixture (the honest edge)
    val zero = Graft.mixtureResample(spark, docs, "doc_id", "lang",
      Seq(("en", 5000L), ("??", 5000L)))
    assert(zero.count() == 0L)
  }

  test("substring dedup: crafted corpus with known shared spans") {
    import spark.implicits._
    // doc 1 and doc 2 share exactly the 10-word span "a b … j": with
    // k = 8 that is 3 adjacent shared gram positions in each doc
    // (longest = 3 + 7 = 10 words); doc 3 has one gram, unshared; doc 4
    // is 7 words — below k, zero by the LEFT join; doc 5 repeats a
    // gram WITHIN itself only — within-doc repetition is NOT shared
    val docs = Seq(
      (1L, "a b c d e f g h i j k l"),
      (2L, "x y a b c d e f g h i j z"),
      (3L, "p q r s t u v w"),
      (4L, "s1 s2 s3 s4 s5 s6 s7"),
      (5L, "m n o pp qq rr ss tt m n o pp qq rr ss tt")
    ).toDF("doc_id", "text")
    val got = Graft.sharedSpans(docs, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == ((3L, 10L)), s"doc 1: ${got(1L)}")
    assert(got(2L) == ((3L, 10L)), s"doc 2: ${got(2L)}")
    assert(got(3L) == ((0L, 0L)), s"doc 3: ${got(3L)}")
    assert(got(4L) == ((0L, 0L)), s"doc 4: ${got(4L)}")
    assert(got(5L) == ((0L, 0L)), s"doc 5 (within-doc repeat): ${got(5L)}")
    // two DISJOINT shared runs in one doc: count sums, longest takes max
    val docs2 = Seq(
      (1L, "a1 a2 a3 a4 a5 a6 a7 a8 mid b1 b2 b3 b4 b5 b6 b7 b8 b9"),
      (2L, "a1 a2 a3 a4 a5 a6 a7 a8 zz"),
      (3L, "yy b1 b2 b3 b4 b5 b6 b7 b8 b9")
    ).toDF("doc_id", "text")
    val got2 = Graft.sharedSpans(docs2, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 1: run of 1 (the a-gram) + run of 2 (b-grams at 10, 11) —
    // 3 shared positions, longest span 2 + 7 = 9 words
    assert(got2(1L) == ((3L, 9L)), s"doc 1 disjoint runs: ${got2(1L)}")
  }

  test("substring cut: removes cross-doc spans, keeps within-doc repeats") {
    import spark.implicits._
    // same crafted corpus as the stats test: docs 1/2 share the 10-word
    // span "a b … j"; doc 5 repeats an 8-gram within itself only
    val docs = Seq(
      (1L, "a b c d e f g h i j k l"),
      (2L, "x y a b c d e f g h i j z"),
      (3L, "p q r s t u v w"),
      (4L, "s1 s2 s3 s4 s5 s6 s7"),
      (5L, "m n o pp qq rr ss tt m n o pp qq rr ss tt")
    ).toDF("doc_id", "text")
    val got = Graft.substringCut(docs, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1: words 1..10 cut, "k l" survives — one span, ten words
    assert(got(1L) == (("k l", 1L, 10L)), s"doc 1: ${got(1L)}")
    // doc 2: words 3..12 cut, "x y … z" survives
    assert(got(2L) == (("x y z", 1L, 10L)), s"doc 2: ${got(2L)}")
    // docs 3/4: nothing shared — text unchanged, zero removals
    assert(got(3L) == (("p q r s t u v w", 0L, 0L)), s"doc 3: ${got(3L)}")
    assert(got(4L) == (("s1 s2 s3 s4 s5 s6 s7", 0L, 0L)), s"doc 4: ${got(4L)}")
    // doc 5: within-doc repetition is NOT cut (Lee et al. cut is
    // cross-document) — full text survives
    assert(got(5L) == (("m n o pp qq rr ss tt m n o pp qq rr ss tt", 0L, 0L)),
      s"doc 5: ${got(5L)}")
    // a doc that is ENTIRELY one shared span cuts to the empty string,
    // and overlapping coverage from nearby runs never double-counts
    val docs2 = Seq(
      (1L, "a1 a2 a3 a4 a5 a6 a7 a8"),
      (2L, "a1 a2 a3 a4 a5 a6 a7 a8 t9 a1 a2 a3 a4 a5 a6 a7 a8")
    ).toDF("doc_id", "text")
    val got2 = Graft.substringCut(docs2, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got2(1L) == (("", 1L, 8L)), s"doc 1 full cut: ${got2(1L)}")
    // doc 2: the a-gram is shared (doc 1 has it) at positions 1 and 10;
    // those two runs cover words 1..8 and 10..17 — "t9" survives
    assert(got2(2L) == (("t9", 2L, 16L)), s"doc 2 two spans: ${got2(2L)}")
  }

  test("containment: asymmetric pairs Jaccard misses; df prune recomputes denominators") {
    import spark.implicits._
    // single-letter words → 3-gram shingles are letter triples:
    //   d1 "a b c d"             → {abc, bcd}                       (2)
    //   d2 "a b c d e f g h i j" → {abc, bcd, cde, …, hij}          (8)
    //   d3 "a b c x y z"         → {abc, bcx, cxy, xyz}             (4)
    // d1 ⊂ d2: containment(1→2) = 2/2 = 1.0 while Jaccard(1,2) =
    // 2/8 = 0.25 — the asymmetric copy Jaccard's union swamps.
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b c d e f g h i j"),
      (3L, "a b c x y z")).toDF("doc_id", "text")
    def report(tau: Double, dfCap: Int): Map[(Long, Long), Double] =
      Graft.containmentReport(spark, docs, tau = tau, dfCap = dfCap)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(report(0.6, 256) == Map((1L, 2L) -> 1.0),
      "tau=0.6 should report exactly the wholesale copy")
    // c(1→3) = |{abc}| / 2 = 0.5 joins at tau=0.5
    assert(report(0.5, 256) == Map((1L, 2L) -> 1.0, (1L, 3L) -> 0.5))
    // df prune law: abc appears in all 3 docs; dfCap=2 drops it from
    // the VOCABULARY, so d1's set shrinks to {bcd} and c(1→2) must be
    // 1/1 = 1.0 (a stale pre-prune denominator would say 1/2 = 0.5),
    // while the abc-only (1,3) overlap disappears entirely.
    assert(report(0.5, 2) == Map((1L, 2L) -> 1.0),
      "pruned denominator must count only surviving shingles")
    // the hot-vocabulary probe is BOUNDED (round-18 review: an
    // unbounded driver collect of the above-cap list is the OOM the
    // probe family exists to prevent) — dfCap=1 makes abc AND bcd hot,
    // so maxHot=1 must fail loud, never truncate the prune silently
    val boom = intercept[IllegalArgumentException] {
      graft.queries.Dedup.containmentPairs(
        graft.queries.Dedup.hashedShinglePlan(spark, docs),
        tau = 0.5, dfCap = 1, maxHot = 1)
    }
    assert(boom.getMessage.contains("raise dfCap or maxHot"))
  }

  test("rendezvous sharding: growing the ring moves only the new shard's winners") {
    import spark.implicits._
    val ids = (0L until 3000L).toDF("doc_id")
    def assign(s: Int): Map[Long, Long] =
      graft.queries.TextOps.rendezvousAssign(ids, s).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a8 = assign(8)
    val a9 = assign(9)
    assert(a8.size == 3000 && a9.size == 3000, "every key must get a shard")
    val moved = a8.keys.filter(k => a8(k) != a9(k)).toSeq
    // the HRW law: a key moves ONLY because the new shard outscored its
    // old winner — every moved key must land on shard 8
    assert(moved.forall(k => a9(k) == 8L),
      s"a key moved to an OLD shard: ${moved.filter(k => a9(k) != 8L).take(5)}")
    // and the moved fraction is ~1/9 (a plain id % S remap moves ~8/9)
    assert(moved.size < 3000 * 2 / 9,
      s"moved ${moved.size} of 3000 - not minimal movement")
    assert(moved.nonEmpty, "the new shard should win something")
  }

  test("bloom decontamination facade equals the exact facade on the fixture") {
    val docs = Tables.documents(spark, sf001)
    val isEval = col("doc_id") % 20 === 0
    val exact = Graft.decontaminate(spark, docs.filter(!isEval), docs.filter(isEval))
    val bloom = Graft.decontaminateBloom(spark, docs.filter(!isEval), docs.filter(isEval))
    assert(bloom.exceptAll(exact).isEmpty && exact.exceptAll(bloom).isEmpty,
      "bloom-prefiltered decontamination diverged from the exact pipeline")
  }
}
