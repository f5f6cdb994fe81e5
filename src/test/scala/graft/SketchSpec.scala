package graft

import org.apache.spark.sql.functions._

/** D3-exempt operators validated against their exact counterparts
  * (SURVEY §5): MinHash-LSH vs exact Jaccard, IVF vs brute-force kNN,
  * HLL vs exact distinct. Data and seeds are fixed, so these outcomes
  * are deterministic. */
class SketchSpec extends SparkSuite {

  test("minhash candidates recall high-jaccard pairs") {
    val exact = SparkEntry.queries("dedup_jaccard")(spark, sf001)
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = SparkEntry.queries("dedup_minhash")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    if (exact.nonEmpty) {
      val recall = exact.count(cand).toDouble / exact.size
      // 8 bands × 4 rows: P(candidate | j=0.5) ≈ 0.40 — assert a floor
      // well under the expectation so the pinned-seed outcome is stable.
      assert(recall >= 0.2, s"recall $recall over ${exact.size} exact pairs")
    } else {
      info("no exact pairs with jaccard ≥ 0.5 at sf0.001; candidates=" + cand.size)
    }
  }

  test("minhash rerank = exact jaccard restricted to candidates (recall 1.0 here)") {
    // dedup_minhash_rerank's oracle is the exact-Jaccard SQL, which is
    // only sound if LSH recall at j ≥ 0.2 is 1.0 on the fixtures — the
    // fixture's true pairs are near-exact duplicates, whose 8×4-band
    // candidate probability is ≈1. Assert the containment (always true
    // by construction) AND the exact equality the oracle depends on, at
    // both suite scale factors.
    for (dir <- Seq(sf001, sf01)) {
      val exact = SparkEntry.queries("dedup_jaccard")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val rerank = SparkEntry.queries("dedup_minhash_rerank")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert((rerank -- exact).isEmpty,
        s"$dir: rerank produced pairs/values outside exact jaccard: ${(rerank -- exact).take(3)}")
      val recall = if (exact.isEmpty) 1.0 else rerank.size.toDouble / exact.size
      info(s"$dir: rerank recall = $recall over ${exact.size} exact pairs")
      assert(rerank == exact,
        s"$dir: recall $recall < 1.0 — the exact-Jaccard oracle no longer binds dedup_minhash_rerank")
    }
  }

  test("IVF ANN achieves high recall vs brute force") {
    val exact = SparkEntry.queries("simsearch_topk")(spark, sf001)
      .select("i", "k").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = SparkEntry.queries("simsearch_ivf")(spark, sf001)
      .select("i", "k").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(approx).toDouble / exact.size
    assert(recall >= 0.7, s"IVF recall@5 = $recall")
  }

  test("dedup_embedding_ann recalls the exact cosine near-dup pairs") {
    val exact = SparkEntry.queries("dedup_embedding")(spark, sf001)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = SparkEntry.queries("dedup_embedding_ann")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture has no cos ≥ 0.4 pairs — test is vacuous")
    val recall = exact.count(approx).toDouble / exact.size
    // near-dup pairs sit at the TOP of each other's neighbor lists, so
    // IVF@nprobe 8/16 recalls them far better than average-rank kNN.
    assert(recall >= 0.7, s"embedding-ANN recall = $recall over ${exact.size} pairs")
    // precision: every reported pair must genuinely pass the threshold
    // (candidates are exact-reranked, so false positives are impossible)
    assert((approx -- exact).isEmpty,
      s"ANN reported pairs the exact scan lacks: ${(approx -- exact).take(3)}")
  }

  test("IVF locality wins on clustered data: recall ≥ 0.9 probing 2/16 buckets") {
    // The fixture embeddings are isotropic random — the worst case for
    // any sublinear ANN. This test proves the index MECHANISM delivers
    // locality where locality exists: 16 well-separated Gaussian clusters
    // (the real shape of production embedding corpora), nprobe = 2.
    import spark.implicits._
    graft.functions.VectorExprs.register(spark) // vec_dot below must not
    // depend on an earlier test in the suite having registered it
    val rnd = new scala.util.Random(1234)
    val d = 16
    val centers = Array.fill(16)(Array.fill(d)(rnd.nextGaussian() * 10.0))
    val rows = (0 until 480).map { i =>
      val c = centers(i % 16)
      (i.toLong, c.map(x => x + rnd.nextGaussian() * 0.5).toSeq)
    }
    val n = rows.toDF("vec_id", "v")
      .withColumn("nrm", sqrt(expr("vec_dot(v, v)")))
    val approx = graft.queries.Dedup.ivfTopk(spark, n, k = 5, centroids = 16, nprobe = 2)
      .select("i", "k").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact top-5 by the same (cos DESC, id ASC) rule, brute-forced
    val vs = rows.toMap
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val exact = rows.flatMap { case (i, v) =>
      rows.filter(_._1 != i)
        .map { case (j, w) => (j, cos(v, w)) }
        .sortBy { case (j, c) => (-c, j) }.take(5)
        .map { case (j, _) => (i, j) }
    }.toSet
    val recall = exact.count(approx).toDouble / exact.size
    assert(recall >= 0.9, s"clustered IVF recall@5 = $recall")
  }

  test("banded simhash pairs equal the brute-force all-pairs scan (pigeonhole exactness)") {
    // 4 bands × 16 bits: any pair within hamming ≤ 3 shares ≥1 exact band,
    // so the banded bucket join must return EXACTLY the brute-force set.
    val banded = SparkEntry.queries("dedup_simhash")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // fingerprints come from the engine (single source of truth — Spark's
    // xxhash64 isn't reproducible on the JVM side); only the pair scan is
    // brute-forced here
    val fps: Array[(Long, Long)] = {
      import org.apache.spark.sql.functions.{col => c}
      Tables.documents(spark, sf001)
        .select(c("doc_id"), explode(split(c("text"), " ")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .withColumn("h", xxhash64(c("term")))
        .select(c("doc_id"), c("tf"), c("h"),
          explode(sequence(lit(0), lit(63))).as("b"))
        .withColumn("vote",
          c("tf") * (expr("shiftright(h, CAST(b AS INT)) & CAST(1 AS BIGINT)") * 2 - 1))
        .groupBy("doc_id", "b").agg(sum(c("vote")).as("v"))
        .groupBy("doc_id")
        .agg(sum(when(c("v") > 0,
          expr("shiftleft(CAST(1 AS BIGINT), CAST(b AS INT))")).otherwise(0L)).as("simhash"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
    }
    val brute = (for {
      (ida, ha) <- fps
      (idb, hb) <- fps
      if ida < idb
      d = java.lang.Long.bitCount(ha ^ hb)
      if d <= 3
    } yield (ida, idb, d.toLong)).toSet
    assert(banded == brute,
      s"banded=${banded.size} brute=${brute.size}; missing=${(brute -- banded).take(3)} extra=${(banded -- brute).take(3)}")
    assert(brute.nonEmpty, "fixture has no near-dup simhash pairs — test is vacuous")
  }

  test("skew-safe shingle plan: identical rows, bounded task skew on a pathological document") {
    // round-7 VERDICT #4: the shingle family's doc_id clustering
    // serializes a pathologically hot document into one task; the
    // salted (chunked) fallback must produce the SAME (doc_id, shingle,
    // n) relation while spreading the hot document's work. Fixture: one
    // ~20k-word document among 40 normal ones. AQE is disabled so the
    // partition-size assertions see the declared partitioning, not a
    // small-data coalesce.
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def words(n: Int, vocab: Int) =
      (0 until n).map(_ => "w" + rnd.nextInt(vocab)).mkString(" ")
    val docs = ((1 to 40).map(i => (i.toLong, words(50, 200))) :+
      (999L, words(20000, 50000))).toDF("doc_id", "text")

    val aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plain = queries.Dedup.hashedShinglePlan(spark, docs)
      val salted = queries.Dedup.hashedShinglePlanSkewSafe(spark, docs,
        hotWordCap = 1000, chunkWords = 512, maxHot = 8)

      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val p = rows(plain)
      assert(rows(salted) == p, "salted relation differs from the plain one")

      def partSizes(df: org.apache.spark.sql.DataFrame) =
        df.rdd.mapPartitions(it => Iterator(it.size)).collect()
      val hotShingles = p.count(_._1 == 999L)
      val total = p.size
      // plain: the doc_id clustering pins the hot doc's whole set in one
      // partition — the skew being demonstrated
      assert(partSizes(plain).max >= hotShingles,
        "expected the plain plan to concentrate the hot document")
      // salted: no partition holds more than half the relation (the hot
      // doc alone is ~90% of it)
      val saltedMax = partSizes(salted).max
      assert(saltedMax <= total / 2,
        s"salted plan still skewed: max partition $saltedMax of $total rows")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("skew-safe chunk decomposition is exact at chunk-boundary word counts") {
    // the chunked hot-doc pipeline's index arithmetic (slice offset,
    // per-chunk jmax, +2-word overlap) must cover every shingle start
    // exactly once for ANY chunk width and document length — probe the
    // boundary cases: length ≡ 0/±1 mod W, single-chunk, sub-chunk.
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    for (w <- Seq(3, 5, 64)) {
      val lengths = Seq(3, 4, w + 1, w + 2, 2 * w, 2 * w + 1, 3 * w - 1, 3 * w + 3)
      val docs = lengths.zipWithIndex.map { case (len, i) =>
        ((i + 1).toLong, (0 until len).map(_ => "t" + rnd.nextInt(40)).mkString(" "))
      }.toDF("doc_id", "text")
      val plain = queries.Dedup.hashedShinglePlan(spark, docs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // hotWordCap = 0: EVERY doc routes through the chunked pipeline
      val chunked = queries.Dedup.hashedShinglePlanSkewSafe(spark, docs,
        hotWordCap = 0, chunkWords = w, maxHot = lengths.size)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(chunked == plain,
        s"chunk width $w: chunked relation diverged " +
          s"(missing=${plain diff chunked}, extra=${chunked diff plain})")
    }
  }

  test("unioned daily HLL sketches estimate global distinct within 5%") {
    val est = SparkEntry.queries("agg_hll_union")(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactPerDay = Tables.events(spark, sf001)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactTotal = Tables.events(spark, sf001)
      .select("user_id").distinct().count()
    exactPerDay.foreach { case (d, x) =>
      assert(math.abs(est(d) - x) <= math.max(1L, (0.05 * x).toLong),
        s"day $d: hll $est(d) vs exact $x")
    }
    // the union of per-day sketches must recover the GLOBAL distinct —
    // the mergeability property the key exists to demonstrate
    assert(math.abs(est("ALL") - exactTotal) <= math.max(1L, (0.05 * exactTotal).toLong),
      s"union: hll ${est("ALL")} vs exact $exactTotal")
  }

  test("count-min estimates respect the one-sided eps*N bound") {
    val est = SparkEntry.queries("agg_count_min")(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sf001)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    exact.foreach { case (t, x) =>
      val e = est(t)
      // CMS guarantee at eps=0.001: never under, over by at most eps*N
      // (w.p. 0.99 — deterministic here via the pinned seed)
      assert(e >= x, s"$t: est $e under exact $x")
      assert(e <= x + math.ceil(0.001 * n).toLong + 1, s"$t: est $e too far over $x (N=$n)")
    }
    assert(exact.nonEmpty)
  }

  test("Misra-Gries summary: coverage + two-sided bound on a Zipf stream, any partitioning") {
    // The sketch contract ([[graft.functions.MisraGries]] — Misra &
    // Gries 1982; merge rule per Agarwal et al. 2013): on N draws with
    // k counters, every stored estimate is within [true − N/(k+1),
    // true], so every key with true count > N/(k+1) is present. The
    // fixture vocabulary is near-uniform, so the bound is exercised
    // here on a synthetic Zipf(s=1) stream over 500 keys — real skew,
    // heavy head, hapax tail — under BOTH a single-partition and a
    // 32-partition layout: candidates may differ (tie noise is
    // arrival-order-dependent), the guarantee may not.
    import spark.implicits._
    val k = 32
    val n = 20000
    val rnd = new scala.util.Random(4242)
    val keys = 500
    val harmonic = (1 to keys).map(1.0 / _).sum
    val cum = (1 to keys).map(1.0 / _ / harmonic).scanLeft(0.0)(_ + _).tail
    val draws = Seq.fill(n) {
      val u = rnd.nextDouble()
      s"key${cum.indexWhere(u <= _)}"
    }
    val truth = draws.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val mg = udaf(new graft.functions.MisraGries(k),
      org.apache.spark.sql.Encoders.STRING)
    for (parts <- Seq(1, 32)) {
      val est = draws.toDF("term").repartition(parts)
        .agg(mg(col("term")).as("cand"))
        .head().getSeq[org.apache.spark.sql.Row](0)
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(est.size <= k, s"parts=$parts: summary size ${est.size} > k=$k")
      val slack = n.toDouble / (k + 1)
      truth.foreach { case (t, c) =>
        if (c > slack)
          assert(est.contains(t),
            s"parts=$parts: frequent key $t (count $c > N/(k+1)=$slack) missing")
      }
      est.foreach { case (t, e) =>
        val c = truth(t)
        assert(e <= c && e >= c - slack,
          s"parts=$parts: estimate $e for $t outside [${c - slack}, $c]")
      }
    }
  }

  test("approx quantiles land between exact quantiles at ±5 rank points") {
    val approx = SparkEntry.queries("agg_approx_quantile")(spark, sf001)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = Tables.orders(spark, sf001)
      .groupBy("o_orderpriority")
      .agg(expr("percentile(o_totalprice, array(0.45, 0.55, 0.85, 0.95))").as("q"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    exact.foreach { case (g, Seq(p45, p55, p85, p95)) =>
      val (p50, p90) = approx(g)
      assert(p50 >= p45 && p50 <= p55, s"$g: approx p50=$p50 outside [$p45, $p55]")
      assert(p90 >= p85 && p90 <= p95, s"$g: approx p90=$p90 outside [$p85, $p95]")
    }
    assert(exact.nonEmpty)
  }

  test("approx_count_distinct is within rsd bounds of exact") {
    val approx = SparkEntry.queries("agg_approx_distinct")(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sf001)
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, n) =>
      assert(math.abs(approx(t) - n) <= math.max(2, (n * 0.1).toLong),
        s"$t: approx=${approx(t)} exact=$n")
    }
  }

  test("two-level IVF assignment agrees with flat on home centroids (clustered data)") {
    // round-10: past Ivf.TwoLevelThreshold (512) centroids the flat N·c
    // assignment crossJoin
    // switches to the two-level Θ(N·√c) form (points rank ⌈√c⌉
    // super-centroids, then only the centroids under their sprobe
    // nearest supers). Approximate only in which centroids a point may
    // rank. Like the locality test above, the MECHANISM is asserted on
    // clustered data (the production embedding shape): on isotropic
    // random vectors super-bucket geometry carries little information —
    // measured 54% home agreement there — exactly the regime where any
    // hierarchical ANN is information-theoretically weak; since round 11
    // the sampled isotropy probe detects that regime and falls back to
    // flat automatically (the guard test below pins it). On THIS
    // clustered input the probe passes and the genuine two-level plan
    // runs — which is what this test asserts.
    import spark.implicits._
    graft.functions.VectorExprs.register(spark)
    val rnd = new scala.util.Random(42)
    val d = 16
    val centers = Array.fill(300)(Array.fill(d)(rnd.nextGaussian() * 10.0))
    val rows = (0 until 3000).map { i =>
      (i.toLong, centers(i % 300).map(_ + rnd.nextGaussian() * 0.3).toSeq)
    }
    val e = rows.toDF("vec_id", "v")
    val cents = graft.functions.Ivf.seeds(e, 300, sampleN = 600)
    def homes(forceTwoLevel: Boolean): Map[Long, Long] =
      graft.functions.Ivf.assignments(e, cents, nprobe = 1,
          (v, cv) => call_function("vec_sqdist", v, cv),
          twoLevelThreshold = if (forceTwoLevel) 0 else Int.MaxValue)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val flat = homes(forceTwoLevel = false)
    val two = homes(forceTwoLevel = true)
    assert(two.size == flat.size, s"point count drifted: ${two.size} vs ${flat.size}")
    val agree = flat.count { case (id, c) => two.get(id).contains(c) }
    assert(agree.toDouble / flat.size >= 0.9,
      s"two-level home agreement ${agree.toDouble / flat.size} < 0.9 on clustered data")
  }

  test("isotropy guard falls back to flat assignment on isotropic input") {
    // round-11 (VERDICT #4): on ISOTROPIC vectors super-bucket geometry
    // carries no signal (measured 54% two-level home agreement), so the
    // sampled agreement probe must reject the two-level plan and the
    // dispatch must keep flat-equivalent assignment quality — asserted
    // here as home agreement ≥ 0.9 vs the flat plan even when the
    // two-level form is forced on. (On the clustered fixture above the
    // same probe PASSES and the genuine two-level plan runs — together
    // the two tests pin both sides of the guard.)
    import spark.implicits._
    graft.functions.VectorExprs.register(spark)
    val rnd = new scala.util.Random(7)
    val d = 16
    val rows = (0 until 3000).map { i =>
      (i.toLong, Seq.fill(d)(rnd.nextGaussian() * 10.0))
    }
    val e = rows.toDF("vec_id", "v")
    val cents = graft.functions.Ivf.seeds(e, 300, sampleN = 600)
    def homes(forceTwoLevel: Boolean): Map[Long, Long] =
      graft.functions.Ivf.assignments(e, cents, nprobe = 1,
          (v, cv) => call_function("vec_sqdist", v, cv),
          twoLevelThreshold = if (forceTwoLevel) 0 else Int.MaxValue)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val flat = homes(forceTwoLevel = false)
    val guarded = homes(forceTwoLevel = true)
    assert(guarded.size == flat.size,
      s"point count drifted: ${guarded.size} vs ${flat.size}")
    val agree = flat.count { case (id, c) => guarded.get(id).contains(c) }
    assert(agree.toDouble / flat.size >= 0.9,
      s"guarded assignment agreement ${agree.toDouble / flat.size} < 0.9 " +
        "on isotropic input — the isotropy probe did not fall back to flat")
  }

  test("multi-level IVF tree descent agrees with flat on home centroids (clustered data)") {
    // round-11: past Ivf.MultiLevelThreshold (4096 = TreeBranch²) the
    // two-level form switches to the b-ary centroid TREE — points keep
    // the sprobe nearest nodes per level via the bounded ap_topm
    // aggregate (one exchange for the whole descent, no window sorts),
    // Θ(N·b·sprobe·log c) assignment work. Forced here on a 300-centroid
    // clustered fixture with branch = 8 so the tree is genuinely 3 deep
    // (300 → 38 → 5) and the per-level pruning is real: home agreement
    // vs the exact flat scan must hold ≥ 0.9, the same bound the
    // two-level form pins, and the descent must be deterministic.
    import spark.implicits._
    graft.functions.VectorExprs.register(spark)
    val rnd = new scala.util.Random(42)
    val d = 16
    val centers = Array.fill(300)(Array.fill(d)(rnd.nextGaussian() * 10.0))
    val rows = (0 until 3000).map { i =>
      (i.toLong, centers(i % 300).map(_ + rnd.nextGaussian() * 0.3).toSeq)
    }
    val e = rows.toDF("vec_id", "v")
    val cents = graft.functions.Ivf.seeds(e, 300, sampleN = 600)
    def homes(forceTree: Boolean): Map[Long, Long] =
      graft.functions.Ivf.assignments(e, cents, nprobe = 1,
          (v, cv) => call_function("vec_sqdist", v, cv),
          twoLevelThreshold = if (forceTree) 0 else Int.MaxValue,
          multiLevelThreshold = if (forceTree) 0 else Int.MaxValue,
          branch = 8)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val flat = homes(forceTree = false)
    val tree = homes(forceTree = true)
    assert(tree.size == flat.size, s"point count drifted: ${tree.size} vs ${flat.size}")
    val agree = flat.count { case (id, c) => tree.get(id).contains(c) }
    assert(agree.toDouble / flat.size >= 0.9,
      s"tree home agreement ${agree.toDouble / flat.size} < 0.9 on clustered data")
    assert(homes(forceTree = true) == tree, "tree descent is not deterministic")
  }

  test("multi-level isotropy guard falls back to flat assignment on isotropic input") {
    // Same guard contract as the two-level form: on isotropic vectors
    // hierarchical pruning carries no signal, the sampled driver-side
    // probe (which mirrors the distributed descent bit-for-bit) must
    // reject the tree plan, and assignment quality must stay
    // flat-equivalent even with the tree forced on.
    import spark.implicits._
    graft.functions.VectorExprs.register(spark)
    val rnd = new scala.util.Random(7)
    val d = 16
    val rows = (0 until 3000).map { i =>
      (i.toLong, Seq.fill(d)(rnd.nextGaussian() * 10.0))
    }
    val e = rows.toDF("vec_id", "v")
    val cents = graft.functions.Ivf.seeds(e, 300, sampleN = 600)
    def homes(forceTree: Boolean): Map[Long, Long] =
      graft.functions.Ivf.assignments(e, cents, nprobe = 1,
          (v, cv) => call_function("vec_sqdist", v, cv),
          twoLevelThreshold = if (forceTree) 0 else Int.MaxValue,
          multiLevelThreshold = if (forceTree) 0 else Int.MaxValue,
          branch = 8)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val flat = homes(forceTree = false)
    val guarded = homes(forceTree = true)
    assert(guarded.size == flat.size,
      s"point count drifted: ${guarded.size} vs ${flat.size}")
    val agree = flat.count { case (id, c) => guarded.get(id).contains(c) }
    assert(agree.toDouble / flat.size >= 0.9,
      s"guarded assignment agreement ${agree.toDouble / flat.size} < 0.9 " +
        "on isotropic input — the isotropy probe did not fall back to flat")
  }

  test("centroid-tree prune removes childless branches; buildTree output is fertile") {
    // round-11 ADVICE (medium): the distributed descent inner-joins the
    // frontier's kept parents against the next level's children — a
    // vec_id whose sprobe kept parents were ALL childless yielded zero
    // rows and silently dropped from the assignments output. Ivf.prune
    // makes that structurally impossible: every surviving non-bottom
    // node has ≥ 1 child. Hand-built tree with childless nodes at two
    // levels, then the invariant on a real buildTree output.
    import graft.functions.Ivf
    val v = Array(0.0)
    val top = Seq((0L, v), (1L, v), (2L, v))
    val mid = Seq((0L, 0L, v), (1L, 0L, v), (2L, 1L, v)) // mid 1, 2 childless
    val bot = Seq((10L, 0L, v), (11L, 0L, v))            // only mid 0 is fertile
    val p = Ivf.prune(Ivf.CentroidTree(top, List(mid, bot)))
    assert(p.down.last.map(_._1) == Seq(10L, 11L), "bottom level must never be pruned")
    assert(p.down.head.map(_._1) == Seq(0L),
      s"childless mid nodes survived: ${p.down.head.map(_._1)}")
    // top 1 cascades out (its only child, mid 2, was childless); top 2 had none
    assert(p.top.map(_._1) == Seq(0L), s"childless roots survived: ${p.top.map(_._1)}")
    val rnd = new scala.util.Random(99)
    val nodes = (0 until 500).map(i => (i.toLong, Array.fill(8)(rnd.nextGaussian() * 5.0)))
    val built = Ivf.buildTree(nodes, branch = 8, sprobe = 2)
    assert(built.down.nonEmpty, "500 nodes at branch 8 must build a real tree")
    assert(built.down.last.map(_._1).sorted == (0L until 500L),
      "bottom level must carry every input centroid")
    val parentLevels = built.top.map(_._1) +: built.down.dropRight(1).map(_.map(_._1))
    parentLevels.zip(built.down.map(_.map(_._2).toSet)).zipWithIndex.foreach {
      case ((ids, childParents), lvl) =>
        assert(ids.nonEmpty, s"level $lvl pruned to empty")
        ids.foreach(id => assert(childParents.contains(id),
          s"childless node $id at level $lvl — descent could drop points"))
    }
  }

  test("multi-level descent nprobe ranks match the flat ranking on probed centroids") {
    // nprobe > 1 through the tree: each returned (c_id, crnk) list must
    // be ordered by true distance (crnk 1..nprobe, no duplicates) and —
    // on clustered data with deep-enough probing — reproduce flat's
    // top-1 choice within the candidate set semantics.
    import spark.implicits._
    graft.functions.VectorExprs.register(spark)
    val rnd = new scala.util.Random(13)
    val d = 8
    val centers = Array.fill(120)(Array.fill(d)(rnd.nextGaussian() * 10.0))
    val rows = (0 until 1200).map { i =>
      (i.toLong, centers(i % 120).map(_ + rnd.nextGaussian() * 0.3).toSeq)
    }
    val e = rows.toDF("vec_id", "v")
    val cents = graft.functions.Ivf.seeds(e, 120, sampleN = 240)
    val out = graft.functions.Ivf.assignments(e, cents, nprobe = 3,
        (v, cv) => call_function("vec_sqdist", v, cv),
        twoLevelThreshold = 0, multiLevelThreshold = 0, branch = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val byVec = out.groupBy(_._1)
    assert(byVec.size == 1200, s"vecs with assignments: ${byVec.size}")
    val centMap = cents.toMap
    val vecMap = rows.toMap
    byVec.foreach { case (vid, rs) =>
      val ranks = rs.map(_._3).sorted
      assert(ranks.sameElements(1 to rs.length) && rs.length <= 3,
        s"vec $vid ranks ${ranks.mkString(",")}")
      assert(rs.map(_._2).distinct.length == rs.length, s"vec $vid duplicate centroids")
      def sq(a: Seq[Double], b: Seq[Double]): Double =
        a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      val sortedByRank = rs.sortBy(_._3).map(t => sq(vecMap(vid), centMap(t._2)))
      assert(sortedByRank.sameElements(sortedByRank.sorted),
        s"vec $vid crnk order does not follow distance")
    }
  }

  test("Lloyd refinement balances home buckets and is deterministic (clustered data)") {
    // round-11: farthest-point seeds are the k-CENTER optimum — i.e. the
    // sample's outliers — so at large c dense regions are under-seeded
    // and a few home buckets run hot (the skew per-bucket pair
    // generation pays for at scale). Ivf.refine's bounded-sample Lloyd
    // iterations pull seeds into density; this pins (a) mean home-bucket
    // distortion (the k-means objective — provably non-increasing under
    // Lloyd) strictly improving, (b) occupancy variance not degrading,
    // (c) bit-identical output across two calls (exact fixed-point mean
    // sums — no shuffle-order dependence).
    import spark.implicits._
    graft.functions.VectorExprs.register(spark)
    val rnd = new scala.util.Random(42)
    val d = 16
    val centers = Array.fill(300)(Array.fill(d)(rnd.nextGaussian() * 10.0))
    val rows = (0 until 3000).map { i =>
      (i.toLong, centers(i % 300).map(_ + rnd.nextGaussian() * 0.3).toSeq)
    }
    val e = rows.toDF("vec_id", "v")
    val seeds = graft.functions.Ivf.seeds(e, 300, sampleN = 600)
    val refined = graft.functions.Ivf.refine(e, seeds, iters = 2)
    val again = graft.functions.Ivf.refine(e, seeds, iters = 2)
    assert(refined == again, "refine is not deterministic across runs")
    assert(refined.map(_._1) == seeds.map(_._1), "bucket labels must be stable")

    def homes(cents: Seq[(Long, Seq[Double])]): Map[Long, Long] =
      graft.functions.Ivf.assignments(e, cents, nprobe = 1,
          (v, cv) => call_function("vec_sqdist", v, cv),
          twoLevelThreshold = Int.MaxValue)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def occVar(h: Map[Long, Long]): Double = {
      // variance of per-seed occupancy counting unseeded buckets as 0
      val byBucket = h.groupBy(_._2).map { case (c, g) => c -> g.size }
      val occ = seeds.map { case (id, _) => byBucket.getOrElse(id, 0).toDouble }
      val mean = occ.sum / occ.size
      occ.map(x => (x - mean) * (x - mean)).sum / occ.size
    }
    def distortion(h: Map[Long, Long], cents: Seq[(Long, Seq[Double])]): Double = {
      val cv = cents.toMap
      rows.map { case (id, v) =>
        val c = cv(h(id))
        v.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum
      }.sum / rows.size
    }
    val h0 = homes(seeds); val h1 = homes(refined)
    assert(distortion(h1, refined) < distortion(h0, seeds),
      s"refined distortion ${distortion(h1, refined)} not below " +
        s"unrefined ${distortion(h0, seeds)}")
    assert(occVar(h1) <= occVar(h0),
      s"refined occupancy variance ${occVar(h1)} above unrefined ${occVar(h0)}")
    info(f"occupancy variance: seeds ${occVar(h0)}%.2f -> refined ${occVar(h1)}%.2f; " +
      f"distortion: ${distortion(h0, seeds)}%.3f -> ${distortion(h1, refined)}%.3f")
  }

  test("refined two-level IVF end-to-end: recall holds at c=600 on clustered data") {
    // The production large-c path end-to-end through ivfTopk: c = 600 >
    // TwoLevelThreshold engages BOTH round-10/11 scale mechanisms — Lloyd
    // seed refinement and the two-level Θ(N·√c) assignment (clustered
    // input, so the isotropy probe admits the two-level plan). Recall is
    // asserted against the brute-force cosine top-5 under the identical
    // (cos DESC, id ASC) tie rule.
    import spark.implicits._
    graft.functions.VectorExprs.register(spark)
    val rnd = new scala.util.Random(4242)
    val d = 16
    val centers = Array.fill(600)(Array.fill(d)(rnd.nextGaussian() * 10.0))
    val rows = (0 until 3000).map { i =>
      (i.toLong, centers(i % 600).map(_ + rnd.nextGaussian() * 0.3).toSeq)
    }
    val n = rows.toDF("vec_id", "v")
      .withColumn("nrm", sqrt(expr("vec_dot(v, v)")))
    val approx = graft.queries.Dedup.ivfTopk(spark, n, k = 5, centroids = 600, nprobe = 4)
      .select("i", "k").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val vs = rows.toMap
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val exact = rows.flatMap { case (i, v) =>
      rows.filter(_._1 != i)
        .map { case (j, w) => (j, cos(v, w)) }
        .sortBy { case (j, c) => (-c, j) }.take(5)
        .map { case (j, _) => (i, j) }
    }.toSet
    val recall = exact.count(approx).toDouble / exact.size
    assert(recall >= 0.8, s"refined two-level IVF recall@5 = $recall at c=600")
  }

  test("boundary-assigned equi-depth buckets match exact ntile within the tie-run bound") {
    // round-16 VERDICT #1: the scale form (sketch boundaries + map-side
    // assignment) must agree with the exact single-partition ntile up
    // to boundary ties — at full sketch accuracy the boundaries ARE the
    // exact rank-⌈i·n/8⌉ values, so bucket sizes can deviate from n/8
    // only where a duplicate value's run spans a boundary.
    val exact = SparkEntry.queries("agg_histogram_eqdepth")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val scale = SparkEntry.queries("agg_histogram_eqdepth_scale")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    assert(scale.values.sum == n, "scale form must partition every row")
    assert(scale.keySet.subsetOf((1L to 8L).toSet), s"bucket ids: ${scale.keySet}")
    // the largest tie run of the bucketing value bounds the deviation
    val maxTie = Tables.orders(spark, sf001)
      .groupBy(Det.cents(col("o_totalprice"))).count()
      .agg(max("count")).collect()(0).getLong(0)
    (1L to 8L).foreach { b =>
      val d = math.abs(scale.getOrElse(b, 0L) - exact.getOrElse(b, 0L))
      assert(d <= maxTie,
        s"bucket $b deviates by $d from exact ntile (tie bound $maxTie)")
    }
  }

  test("win_distribution_scale reproduces the exact window's rows bit-for-bit") {
    // round-18 VERDICT #3: the scale twin's rank derivation (sketch
    // bucket + broadcast offset + within-bucket row_number) must equal
    // the whole-segment window EXACTLY — quartile by the closed-form
    // ntile sizing, pr/cd as the same integer divisions — at fixture
    // accuracy the boundaries are exact, so every value (doubles
    // included) is bit-identical, which is what keeps the key oracled.
    val exact = SparkEntry.queries("win_distribution")(spark, sf001).collect()
    val scale = SparkEntry.queries("win_distribution_scale")(spark, sf001)
      .collect()
    assert(exact.length == scale.length,
      s"row counts diverge: ${exact.length} vs ${scale.length}")
    exact.zip(scale).foreach { case (a, b) =>
      assert(a == b, s"scale row diverged: exact=$a scale=$b")
    }
  }

  /** Exact lower weighted quartiles by the integer rule — the plain-
    * Scala ground truth for the WeightedQuantiles sketch tests. */
  private def exactWq(rows: Seq[(Long, Long)]): (Long, Long, Long, Long) = {
    val grouped = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(_._1)
    val tot = grouped.map(_._2).sum
    def q(k: Long): Long = {
      var cum = 0L
      grouped.find { case (_, w) => cum += w; cum * 4 >= k * tot }.get._1
    }
    (tot, q(1), q(2), q(3))
  }

  test("weighted-quantile sketch is exact under the cap for any merge tree") {
    // round-17 VERDICT #1: the sketch replaces the keyed RANGE window —
    // below the cap its buffer IS the grouped (value, Σmass) relation,
    // so finish must reproduce the window rule bit-for-bit regardless of
    // how partial buffers split and merge.
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(5000)((rnd.nextInt(1500).toLong, 1L + rnd.nextInt(50)))
    val (tot, q1, q2, q3) = exactWq(rows)
    val agg = new graft.functions.WeightedQuantiles(4096)
    // three random partition layouts, pairwise-merged in different orders
    for (nParts <- Seq(1, 7, 32)) {
      val bufs = rows.grouped(math.max(1, rows.size / nParts)).map { chunk =>
        chunk.foldLeft(agg.zero) { case (b, (v, w)) =>
          agg.reduce(b, graft.functions.WqIn(v, w))
        }
      }.toSeq
      val merged = bufs.reduceLeft(agg.merge)
      val out = agg.finish(merged)
      assert((out.total_w, out.wq1_cents, out.wmedian_cents, out.wq3_cents)
        == ((tot, q1, q2, q3)), s"nParts=$nParts: $out vs exact ($tot,$q1,$q2,$q3)")
    }
  }

  test("compressed weighted-quantile sketch is one-sided with bounded rank error") {
    // the 100 TB regime: above the cap, compress coalesces runs downward,
    // so cum_sketch ≥ cum_exact pointwise — every reported quartile is ≤
    // the exact one, totals stay exact, and the rank undershoot at the
    // reported value is O(tot/cap).
    val rnd = new scala.util.Random(7)
    val rows = (0 until 20000).map(i => (i.toLong, 1L + rnd.nextInt(9)))
    val (tot, q1, q2, q3) = exactWq(rows)
    val cap = 64
    val agg = new graft.functions.WeightedQuantiles(cap)
    val buf = rows.foldLeft(agg.zero) { case (b, (v, w)) =>
      agg.reduce(b, graft.functions.WqIn(v, w))
    }
    val out = agg.finish(buf)
    assert(out.total_w == tot, "compression must preserve total mass exactly")
    val cum = rows.sortBy(_._1).scanLeft((Long.MinValue, 0L)) {
      case ((_, c), (v, w)) => (v, c + w)
    }.tail.toMap
    for ((got, exact, k) <- Seq((out.wq1_cents, q1, 1L),
        (out.wmedian_cents, q2, 2L), (out.wq3_cents, q3, 3L))) {
      assert(got <= exact, s"q$k: sketch $got above exact $exact — not one-sided")
      val undershoot = k * tot - 4 * cum(got)
      assert(undershoot <= 8L * tot / cap,
        s"q$k: rank undershoot $undershoot exceeds 8·tot/cap=${8L * tot / cap}")
    }
  }

  test("arbitrary-fraction weighted quantiles are exact and agree with the quartile form") {
    // the generalized sketch must apply the same MIN-v/den·cum≥num·tot
    // rule at any rational, and its (1/4, 2/4, 3/4) instance must equal
    // the quartile aggregator bit-for-bit
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(4000)((rnd.nextInt(900).toLong, 1L + rnd.nextInt(20)))
    val fracs = Seq((1L, 10L), (1L, 4L), (2L, 4L), (3L, 4L), (99L, 100L), (1L, 1L))
    val agg = new graft.functions.WeightedQuantilesAt(2048, fracs)
    val buf = rows.foldLeft(agg.zero) { case (b, (v, w)) =>
      agg.reduce(b, graft.functions.WqIn(v, w))
    }
    val out = agg.finish(buf)
    val grouped = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(_._1)
    val tot = grouped.map(_._2).sum
    def exactAt(num: Long, den: Long): Long = {
      var cum = 0L
      grouped.find { case (_, w) => cum += w; cum * den >= num * tot }.get._1
    }
    assert(out.total_w == tot)
    fracs.zipWithIndex.foreach { case ((n, d), i) =>
      assert(out.qs(i) == exactAt(n, d), s"q($n/$d): ${out.qs(i)} vs ${exactAt(n, d)}")
    }
    // p = 1 is the max value; the quartile aggregator agrees at its fracs
    assert(out.qs(5) == grouped.last._1)
    val q4 = new graft.functions.WeightedQuantiles(2048)
    val b4 = rows.foldLeft(q4.zero) { case (b, (v, w)) =>
      q4.reduce(b, graft.functions.WqIn(v, w))
    }
    val o4 = q4.finish(b4)
    assert((o4.wq1_cents, o4.wmedian_cents, o4.wq3_cents)
      == ((out.qs(1), out.qs(2), out.qs(3))), "quartile form diverged")
    // 128-bit comparison regime (round-18 review): masses near 2⁶² wrap
    // a 64-bit cum·den — the median of {1:h, 2:h, 3:h} must stay 2
    val h = Long.MaxValue / 4
    val big = new graft.functions.WeightedQuantilesAt(64, Seq((5000L, 10000L)))
    val bbuf = Seq((1L, h), (2L, h), (3L, h)).foldLeft(big.zero) {
      case (b, (v, w)) => big.reduce(b, graft.functions.WqIn(v, w))
    }
    assert(big.finish(bbuf).qs(0) == 2L, "huge-mass median wrapped")
    // negative mass fails at the carrying row, never a wrong quantile
    val boom = intercept[IllegalArgumentException] {
      big.reduce(big.zero, graft.functions.WqIn(1L, -1L))
    }
    assert(boom.getMessage.contains("negative mass"))
  }

  test("agg_weighted_median query equals the keyed-window form it replaced") {
    import org.apache.spark.sql.expressions.Window
    val in = Tables.lineitem(spark, sf001).select(
      col("l_returnflag").as("g"),
      Det.cents(col("l_extendedprice")).as("pc"),
      col("l_quantity").cast("long").as("w"))
    val win = in
      .withColumn("cum", sum(col("w")).over(Window.partitionBy("g").orderBy("pc")))
      .withColumn("tot", sum(col("w")).over(Window.partitionBy("g")))
      .groupBy("g")
      .agg(max(col("tot")).as("total_w"),
        min(when(col("cum") * 4 >= col("tot"), col("pc"))).as("wq1_cents"),
        min(when(col("cum") * 2 >= col("tot"), col("pc"))).as("wmedian_cents"),
        min(when(col("cum") * 4 >= col("tot") * 3, col("pc"))).as("wq3_cents"))
      .orderBy("g").collect().map(_.toSeq).toSeq
    val sketch = SparkEntry.queries("agg_weighted_median")(spark, sf001)
      .collect().map(_.toSeq).toSeq
    assert(sketch == win, s"sketch form diverged from window form:\n$sketch\n$win")
  }
}
