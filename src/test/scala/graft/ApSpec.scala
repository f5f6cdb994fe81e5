package graft

import graft.ap.AffinityPropagation
import org.apache.spark.sql.functions._

/** SURVEY §5.2 items 4–5: AP end-to-end oracle + message-invariant
  * properties, pinned against FIXTURES.md ground truth. */
class ApSpec extends SparkSuite {

  private lazy val embRows = {
    Tables.embeddings(spark, sf001)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      .orderBy("vec_id")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
  }

  test("LocalAP kernel reproduces the pinned ground truth: 66 exemplars on sf0.001") {
    val res = graft.ap.LocalAP.run(embRows.map(_._1), embRows.map(_._2))
    assert(res.converged, s"did not converge in ${res.iterations} iterations")
    assert(res.exemplars.size == 66,
      s"expected 66 exemplars (FIXTURES.md), got ${res.exemplars.size} at iter ${res.iterations}")
  }

  test("Spark AP loop matches LocalAP kernel exemplar set exactly") {
    val brute = graft.ap.LocalAP.run(embRows.map(_._1), embRows.map(_._2))
    val dist = AffinityPropagation.run(spark, Tables.embeddings(spark, sf001))
    assert(dist.converged)
    assert(dist.exemplars.toSet == brute.exemplars,
      s"spark=${dist.exemplars.size} brute=${brute.exemplars.size} " +
        s"symdiff=${(dist.exemplars.toSet diff brute.exemplars) ++ (brute.exemplars diff dist.exemplars.toSet)}")
  }

  test("alternative preferences hit the pinned exemplar counts (min→33, 2·min→14)") {
    val ids = embRows.map(_._1); val xs = embRows.map(_._2)
    var minS = Double.PositiveInfinity
    for (a <- xs.indices; b <- xs.indices if a != b) {
      var d = 0.0
      var j = 0
      while (j < xs(a).length) { val t = xs(a)(j) - xs(b)(j); d += t * t; j += 1 }
      if (-d < minS) minS = -d
    }
    assert(graft.ap.LocalAP.run(ids, xs, prefOverride = Some(minS)).exemplars.size == 33)
    assert(graft.ap.LocalAP.run(ids, xs, prefOverride = Some(2 * minS)).exemplars.size == 14)
  }

  test("sparse m-NN AP equals dense at m = N−1 and converges at m = 50") {
    import spark.implicits._
    val emb150 = Tables.embeddings(spark, sf001).orderBy("vec_id").limit(150)
    val dense = AffinityPropagation.run(spark, emb150)
    // exact m-NN builder at m = N−1 keeps every pair → the sparse message
    // algebra must reproduce dense AP bit-for-bit at the exemplar level
    val fullSparse = AffinityPropagation.run(spark, emb150, neighbors = Some(149),
      knnExact = true)
    assert(fullSparse.exemplars == dense.exemplars,
      s"m=N−1 sparse diverged: dense=${dense.exemplars.size} sparse=${fullSparse.exemplars.size}")

    // the bucketed m-NN graph must agree with the exact m-NN graph on
    // most kept edges (candidate recall; the fixture is isotropic random
    // — the hardest case for any bucketed candidate generator)
    val exactEdges = AffinityPropagation.sparseSimilaritiesExact(
      Tables.embeddings(spark, sf001), 50).select("i", "k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketEdges = AffinityPropagation.sparseSimilarities(
      Tables.embeddings(spark, sf001), 50).select("i", "k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exactEdges.count(bucketEdges).toDouble / exactEdges.size
    assert(recall >= 0.6, s"bucketed m-NN edge recall = $recall")

    // production bucketed-candidate graph (no N² stage): deterministic
    // seeds ⇒ deterministic outcome; converges with a cluster count close
    // to dense AP's 66 (exact equality held only for the exact m-NN
    // build — an approximate graph legitimately perturbs the fixpoint)
    val sparse = AffinityPropagation.run(spark, Tables.embeddings(spark, sf001),
      neighbors = Some(50))
    assert(sparse.converged && sparse.exemplars.nonEmpty)
    assert(math.abs(sparse.exemplars.size - 66) <= 7,
      s"got ${sparse.exemplars.size}, expected within 66±7")
  }

  test("25-way replica elections oscillate at λ=0.5 and settle at λ=0.7 (raise-damping remedy)") {
    // The ap_dist N=50k fixture geometry scaled to kernel size (round
    // 11, BENCH_NOTES §18): R perturbed replicas per base point give
    // each base point an R-way exemplar election among near-identical
    // candidates (r·1e-3 dim-0 shifts vs inter-point distance 10). At
    // R=25 the election never holds the classic 15-iteration plateau
    // under λ=0.5 — jitter doesn't fix a sustained oscillation — while
    // [FD07]'s raise-damping remedy (λ=0.7) settles it fast and finds
    // exactly one exemplar per replica group. R=10 guards the ladder's
    // rung-1 default: lighter multiplicity converges without help.
    def fixture(reps: Int): (Array[Long], Array[Array[Double]]) = {
      val ids = Array.newBuilder[Long]
      val xs = Array.newBuilder[Array[Double]]
      for (b <- 0 until 8; r <- 0 until reps) {
        ids += b * 1000000L + r
        xs += Array((b % 4) * 10.0 + r * 1e-3, (b / 4) * 10.0)
      }
      (ids.result(), xs.result())
    }
    val (ids25, xs25) = fixture(25)
    val osc = graft.ap.LocalAP.run(ids25, xs25) // λ=0.5 default
    assert(!osc.converged,
      s"expected the 25-way election to oscillate at λ=0.5, converged at ${osc.iterations}")
    val damped = graft.ap.LocalAP.run(ids25, xs25, damping = 0.7)
    assert(damped.converged, s"λ=0.7 did not converge in ${damped.iterations} iters")
    assert(damped.exemplars.size == 8,
      s"expected one exemplar per replica group, got ${damped.exemplars.size}")
    assert(damped.exemplars.map(_ / 1000000L) == (0L until 8L).toSet,
      "exemplars must cover every replica group exactly once")
    val (ids10, xs10) = fixture(10)
    val light = graft.ap.LocalAP.run(ids10, xs10)
    assert(light.converged && light.exemplars.size == 8,
      s"R=10 should converge at the default λ: converged=${light.converged} " +
        s"exemplars=${light.exemplars.size}")
  }

  test("opt-in jitter converges exact-duplicate inputs on both regimes") {
    // round-9 VERDICT #4: exact-duplicate points provably oscillate the
    // λ = 0.5 loop (the two copies swap exemplar roles every iteration
    // — [FD07]'s noted degeneracy, remedied there by adding a tiny
    // amount of noise to the similarities). The guard is the opt-in
    // deterministic hash-seeded jitter (solve/run/runLocal/
    // solveFromSimilarities `jitter` param, D3-exempt: default 0 leaves
    // every oracled path bit-identical).
    import org.apache.spark.sql.functions._
    val base = Tables.embeddings(spark, sf001)
      .select("vec_id", "embedding").orderBy("vec_id").limit(100)
    val dup = base.unionByName(
      base.select((col("vec_id") + lit(100000L)).as("vec_id"), col("embedding")))
    // Local kernel, no jitter: the duplicated fixture must exhibit the
    // failure the guard exists for — unconverged at a generous maxIter.
    val bare = AffinityPropagation.runLocal(spark, dup, maxIter = 120)
    assert(!bare.converged,
      s"expected the duplicated fixture to oscillate without jitter, " +
        s"but it converged in ${bare.iterations} iterations")
    // Local kernel with jitter: converges.
    val local = AffinityPropagation.runLocal(spark, dup, jitter = 1e-6)
    assert(local.converged && local.exemplars.nonEmpty,
      s"local regime did not converge with jitter (${local.iterations} iters)")
    // Distributed loop with jitter: same guard, same per-pair draws.
    val dist = AffinityPropagation.run(spark, dup, jitter = 1e-6)
    assert(dist.converged && dist.exemplars.nonEmpty,
      s"distributed regime did not converge with jitter (${dist.iterations} iters)")
    // solveFromSimilarities' distributed branch (jitterOffd on supplied
    // triples — forced via localNodeThreshold = 0): an all-equal
    // similarity matrix is the fully degenerate tie case (range 0 →
    // fallback scale 1.0); without jitter every point is
    // interchangeable, with it the loop settles.
    import spark.implicits._
    val ties = (for { i <- 1L to 8L; k <- 1L to 8L if i != k }
      yield (i, k, -1.0)).toDF("i", "k", "s")
    val sim = AffinityPropagation.solveFromSimilarities(spark, ties,
      localNodeThreshold = 0, jitter = 1e-6)
    assert(sim.converged && sim.exemplars.nonEmpty,
      s"solveFromSimilarities distributed regime did not converge with " +
        s"jitter (${sim.iterations} iters)")
  }

  test("sparse m=50 exemplar rate matches dense on the same N=2000 input (within 1.25×)") {
    // round-9 VERDICT #3: the N=6000 sparse bench record converged to
    // 2000 exemplars (33%) — far denser than the dense fixture's 13% —
    // suspecting the sampled dense-median preference runs too high on
    // m=50 graphs. Measured on the SAME input (sf0.1 embeddings,
    // N=2000, no replicas) the suspicion is falsified: dense local
    // kernel → 206 exemplars, exact m=50 → 207, bucketed m=50 → 210
    // (within 2%). The 33% rate is the bench input's GEOMETRY: apDist's
    // sparse shape replicates each fixture point 3× with a 1e-3
    // perturbation, so N=6000 is 2000 near-duplicate triplets whose
    // intra-triplet similarity (~−1e-6) dwarfs every inter-point
    // similarity — 2000 exemplars ≈ one per natural micro-cluster is
    // the correct clustering, not preference drift. This test pins the
    // same-input equivalence so a real preference regression can't hide
    // behind that geometry again.
    val emb2000 = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val dense = AffinityPropagation.runLocal(spark, emb2000)
    val sparse = AffinityPropagation.run(spark, emb2000, neighbors = Some(50))
    assert(dense.converged && sparse.converged)
    val ratio = sparse.exemplars.size.toDouble / dense.exemplars.size
    assert(ratio >= 0.8 && ratio <= 1.25,
      s"sparse m=50 exemplar count ${sparse.exemplars.size} vs dense " +
        s"${dense.exemplars.size} (ratio $ratio) — outside the 1.25× band")
  }

  test("single-point and empty inputs: trivial exemplar / loud error (round-12)") {
    // n = 1 used to AIOOBE(-1) in the median branch; reachable from the
    // public facade on a 1-row frame. n = 0 must error with the
    // contract, not an index crash.
    import spark.implicits._
    val one = Seq((42L, Seq.fill(8)(0.5))).toDF("vec_id", "embedding")
    val labeled = graft.Graft.cluster(spark, one).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(labeled.toSeq == Seq((42L, 42L)),
      s"single point must self-elect: ${labeled.toSeq}")
    val e = intercept[IllegalArgumentException] {
      AffinityPropagation.solve(spark,
        Seq.empty[(Long, Seq[Double])].toDF("vec_id", "embedding"))
    }
    assert(e.getMessage.toLowerCase.contains("empty"), s"unexpected: ${e.getMessage}")
  }

  test("isolated node in a sparse similarity graph self-elects in BOTH regimes") {
    // round-12 review: a node supplied ONLY its diagonal preference row
    // (an isolated node in a caller-supplied sparse graph) hit a NULL
    // m2 in the distributed responsibility pass — r(x,x) went NULL and
    // the node silently vanished from the exemplar set, while the local
    // dense kernel (s = −∞ fill) made it its own exemplar. Both passes
    // now coalesce the missing second-max to −∞: r(x,x) = +∞, the node
    // self-elects, regimes agree.
    import spark.implicits._
    // two tight mutual neighbors + isolated node 9 with only s(9,9)
    val sims = Seq(
      (1L, 2L, -1.0), (2L, 1L, -1.0),
      (1L, 3L, -9.0), (3L, 1L, -9.0),
      (2L, 3L, -9.0), (3L, 2L, -9.0),
      (9L, 9L, -5.0)).toDF("i", "k", "s")
    def exemplarsOf(threshold: Int): Seq[Long] =
      AffinityPropagation.solveFromSimilarities(spark, sims,
        localNodeThreshold = threshold).exemplars
    val dist = exemplarsOf(0)     // forced-distributed regime
    val local = exemplarsOf(2000) // local dense kernel
    assert(dist.contains(9L), s"distributed regime dropped the isolated node: $dist")
    assert(local.contains(9L), s"local regime dropped the isolated node: $local")
    assert(dist == local, s"regimes disagree: distributed $dist vs local $local")
  }

  test("distributed runLoop releases superseded checkpoints (≤2 pinned after 30 iterations)") {
    import spark.implicits._
    // round-6 VERDICT #1: each iteration localCheckpoints a new generation
    // and abandoned the previous one to eventual driver GC — up to
    // maxIter × N² rows of dead pinned storage on the 100 TB path. Force
    // the distributed regime (localNodeThreshold = 0) and keep it from
    // converging early (convergenceIter > maxIter): after 30 iterations
    // only the final generation may remain pinned.
    val triples = (for { i <- 1L to 12L; k <- 1L to 12L if i != k }
      yield (i, k, if ((i <= 6) == (k <= 6)) -1.0 else -20.0)).toDF("i", "k", "s")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val res = AffinityPropagation.solveFromSimilarities(spark, triples,
      maxIter = 30, convergenceIter = 31, localNodeThreshold = 0)
    assert(res.iterations == 30)
    val added = spark.sparkContext.getPersistentRDDs.view
      .filterKeys(!before.contains(_)).values.toSeq
    assert(added.size <= 2,
      s"expected ≤2 pinned RDDs after the loop, got ${added.size}")
    assert(res.messages.count() == 12L * 12L) // final generation still readable
  }

  test("sparse distributed runLoop releases superseded checkpoints (m=50 production path)") {
    // round-7 VERDICT #6: the release test above forces the DENSE loop;
    // the 100 TB production path is the sparse O(N·m) one — same
    // discipline asserted on run(neighbors=Some(50)).
    val emb = Tables.embeddings(spark, sf001)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val res = AffinityPropagation.run(spark, emb,
      maxIter = 12, convergenceIter = 13, neighbors = Some(50))
    assert(res.iterations == 12)
    val added = spark.sparkContext.getPersistentRDDs.view
      .filterKeys(!before.contains(_)).values.toSeq
    assert(added.size <= 2,
      s"expected ≤2 pinned RDDs after the sparse loop, got ${added.size}")
    assert(res.messages.count() > 0)
  }

  test("final-generation checkpoint is registered and released at the next run's start") {
    // round-7 ADVICE (medium): repeated runs in one session each pinned
    // their final checkpoint forever. The registry releases run t−1's
    // final generation when run t starts.
    val emb = Tables.embeddings(spark, sf001)
    val r1 = AffinityPropagation.run(spark, emb, maxIter = 3, convergenceIter = 4)
    assert(AffinityPropagation.hasRunCheckpoint(spark))
    // the registry records the checkpoint RDDs themselves (round-8
    // ADVICE: RDDs reference the context, not the session, so strong
    // values are safe and the release survives Result GC)
    val pinned1 = AffinityPropagation.runCheckpointRdds(spark)
    assert(pinned1.nonEmpty && pinned1.forall(_.getStorageLevel.useMemory))
    assert(r1.messages.count() > 0)
    val r2 = AffinityPropagation.run(spark, emb, maxIter = 3, convergenceIter = 4)
    // run 1's final generation must have been unpersisted by run 2's start
    assert(pinned1.forall(r => !r.getStorageLevel.useMemory && !r.getStorageLevel.useDisk),
      "previous run's final checkpoint still pinned after the next run started")
    assert(r2.messages.count() > 0)
  }

  /** Count Spark jobs started while `f` runs, waiting for the listener
    * bus to quiesce before reading. */
  private def jobsDuring(f: => Unit): Int = {
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      f
      var last = -1; var cur = jobs.get
      while (cur != last) { Thread.sleep(150); last = cur; cur = jobs.get }
      cur
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("convergence cadence shares one materializing job across checkEvery iterations") {
    // round-7 VERDICT #1 (one job per iteration, not two) tightened by
    // round-8 VERDICT #2: the convergence collect is the ONLY
    // materializing action, taken every checkEvery=5 iterations — 10
    // extra iterations may add only ⌈10/5⌉ = 2 jobs (+ slack for the
    // listener), not 10.
    import spark.implicits._
    val triples = (for { i <- 1L to 12L; k <- 1L to 12L if i != k }
      yield (i, k, if ((i <= 6) == (k <= 6)) -1.0 else -20.0)).toDF("i", "k", "s")
    def countJobs(iters: Int): Int = jobsDuring {
      val r = AffinityPropagation.solveFromSimilarities(spark, triples,
        maxIter = iters, convergenceIter = iters + 1, localNodeThreshold = 0)
      assert(r.iterations == iters)
    }
    val j10 = countJobs(10)
    val j20 = countJobs(20)
    assert(j20 - j10 <= 4,
      s"expected ≈1 job per 5 extra iterations, got ${j20 - j10} jobs for 10 extra")
  }

  test("cadence rollback stops at the same iteration as per-iteration checks") {
    // round-9 ADVICE (medium): the cadence-SAMPLED counter declared
    // convergence after a 10-iteration plateau and aliased on
    // oscillating sets. The fix collects every generation's indicator
    // per chunk and rolls back to the generation where the CLASSIC rule
    // fires — so any cadence must report the exact iteration count and
    // exemplar set of checkEvery = 1 (ApDbg measured the same on the
    // sf0.1 200-vec prefix: 46 iterations at every cadence).
    // The two-clique fixture is fully symmetric (all-equal in-cluster
    // similarities — every node interchangeable), so WITHOUT jitter it
    // oscillates past maxIter under the exact counter: run it jittered
    // (deterministic draws ⇒ every cadence sees the same matrix).
    import spark.implicits._
    val triples = (for { i <- 1L to 12L; k <- 1L to 12L if i != k }
      yield (i, k, if ((i <= 6) == (k <= 6)) -1.0 else -20.0)).toDF("i", "k", "s")
    def solveAt(c: Int) = AffinityPropagation.solveFromSimilarities(spark, triples,
      localNodeThreshold = 0, checkEvery = c, jitter = 1e-6)
    val base = solveAt(1)
    assert(base.converged, s"fixture did not converge (${base.iterations} iters)")
    for (c <- Seq(5, 7)) {
      val r = solveAt(c)
      assert(r.converged && r.iterations == base.iterations &&
        r.exemplars == base.exemplars,
        s"cadence $c diverged from per-iteration checks: " +
          s"iters ${r.iterations} vs ${base.iterations}, " +
          s"exemplars ${r.exemplars.size} vs ${base.exemplars.size}")
    }
  }

  test("fused loop passes match the window-algebra passes (r exact, a to 1e-9)") {
    // The loop kernel (hash-aggregate top-2 + SHUFFLE_HASH join) must
    // compute the same messages as the oracle-matched window algebra:
    // responsibilities bit-exactly (max/second-max over the same totally
    // ordered set, same damping expression), availabilities to float
    // sum-order tolerance (hash-agg order vs sorted-window order).
    val emb = Tables.embeddings(spark, sf001)
    val pref = AffinityPropagation.preference(AffinityPropagation.similarities(emb))
    def init = AffinityPropagation.init(emb, pref)
    val w = AffinityPropagation.availabilityPass(
      AffinityPropagation.responsibilityPass(init, 0.5), 0.5)
    val f = AffinityPropagation.availabilityPassFused(
      AffinityPropagation.responsibilityPassFused(init, 0.5), 0.5)
    val joined = w.select(col("i"), col("k"), col("r").as("rw"), col("a").as("aw"))
      .join(f.select(col("i"), col("k"), col("r").as("rf"), col("a").as("af")),
        Seq("i", "k"))
    val agg = joined.agg(
      count(lit(1)).as("n"),
      max(abs(col("rw") - col("rf"))).as("dr"),
      max(abs(col("aw") - col("af"))).as("da")).head()
    assert(agg.getLong(0) == 500L * 500L)
    assert(agg.getDouble(1) == 0.0,
      s"fused responsibility diverged from window algebra by ${agg.getDouble(1)}")
    assert(agg.getDouble(2) < 1e-9,
      s"fused availability diverged from window algebra by ${agg.getDouble(2)}")
  }

  test("solveFromSimilarities local regime runs ≤2 actions (probe + one collect)") {
    // round-8 VERDICT #4/#6: the local regime executed the caller's sims
    // plan up to 3× (probe, offd.collect, diag.collect) — for an
    // expensive caller-supplied plan that tripled the dominant cost. Now
    // the triples are cached and collected ONCE, split driver-side: the
    // probe and the collect are the only ACTIONS (SQL executions — the
    // AQE-proof count; per-stage jobs within one execution don't
    // re-execute the caller's plan).
    import spark.implicits._
    val triples = (for { i <- 1L to 12L; k <- 1L to 12L
      if i != k && (i <= 6) == (k <= 6) }
      yield (i, k, -1.0 + 0.01 * i - 0.003 * k)).toDF("i", "k", "s")
    val execs = new java.util.concurrent.atomic.AtomicInteger
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case _: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            execs.incrementAndGet(); ()
          case _ => ()
        }
    }
    spark.sparkContext.addSparkListener(l)
    val res = try {
      val r = AffinityPropagation.solveFromSimilarities(spark, triples, maxIter = 60)
      var last = -1; var cur = execs.get
      while (cur != last) { Thread.sleep(150); last = cur; cur = execs.get }
      r
    } finally spark.sparkContext.removeSparkListener(l)
    assert(res.exemplars.nonEmpty)
    assert(execs.get <= 2,
      s"local-regime facade call ran ${execs.get} executions, expected ≤2")
  }

  test("local regime preference comes from SUPPLIED off-diagonal triples (sparse input)") {
    import spark.implicits._
    // round-6 ADVICE (medium): the local regime fills absent pairs with
    // −∞ and LocalAP's fallback medianed the WHOLE n²−n matrix — −∞
    // padding included — so a sparse m-NN-style input below the node
    // threshold got preference −∞, no exemplar could ever form, and the
    // result degenerated while the identical input above the threshold
    // worked. Both regimes must now use the median of the supplied
    // off-diagonal triples. Fixture: two 6-node blocks with ONLY
    // within-block pairs supplied (an m-NN-style graph) and a small
    // deterministic tilt; with the supplied-triples median it converges
    // in ~15 iterations to a non-empty exemplar set (NumPy-checked),
    // with the −∞-padded median it can produce none.
    val triples = (for { i <- 1L to 12L; k <- 1L to 12L
      if i != k && (i <= 6) == (k <= 6) }
      yield (i, k, -1.0 + 0.01 * i - 0.003 * k)).toDF("i", "k", "s")
    val loc = AffinityPropagation.solveFromSimilarities(spark, triples, maxIter = 60)
    assert(loc.exemplars.nonEmpty, "local regime degenerated on sparse input")
    // …and the distributed regime on the identical input lands on the
    // same exemplar set (same preference default, same message algebra).
    val dist = AffinityPropagation.solveFromSimilarities(spark, triples,
      maxIter = 60, localNodeThreshold = 0)
    assert(dist.exemplars == loc.exemplars,
      s"regimes disagree: local=${loc.exemplars} dist=${dist.exemplars}")
  }

  test("ap_dist_exemplars fixture has a comfortable diagonal margin (no near-tie flake)") {
    // round-8 ADVICE: the ap_dist_exemplars query REQUIRES exact
    // exemplar-set equality between the distributed loop and the local
    // kernel, but availability sums are float-order-nondeterministic
    // across shuffle fetches — a diagonal r+a within ulp noise of 0
    // could flip the indicator between runs and fail the require
    // intermittently. This pins the safety premise instead: on the
    // 200-vec fixture the smallest |r+a| over the diagonal is far above
    // any sum-order jitter (~1e-13 relative), so the exact equality the
    // query asserts is robust. If the fixture ever moves and this
    // margin collapses, THIS test names the cause before the query
    // flakes.
    val emb200 = Tables.embeddings(spark, sf001).orderBy("vec_id").limit(200)
    val dist = AffinityPropagation.run(spark, emb200)
    assert(dist.converged)
    val margin = dist.messages.filter(col("i") === col("k"))
      .agg(min(abs(col("r") + col("a")))).head().getDouble(0)
    assert(margin > 1e-6,
      f"diagonal margin $margin%.3e is within float-jitter range — the " +
        "ap_dist_exemplars exact-equality require is no longer safe on this fixture")
  }

  test("availability is non-positive off-diagonal; exemplars self-assign") {
    val emb = Tables.embeddings(spark, sf001)
    val pref = AffinityPropagation.preference(AffinityPropagation.similarities(emb))
    val one = AffinityPropagation.availabilityPass(
      AffinityPropagation.responsibilityPass(AffinityPropagation.init(emb, pref), 0.0), 0.0)
    assert(one.filter(col("i") =!= col("k") && col("a") > 1e-12).count() == 0)

    val offd = AffinityPropagation.similarities(emb)
    val ex = Seq(1L, 7L, 42L)
    val asg = AffinityPropagation.assign(offd, ex, spark)
    val selfAssigned = asg.filter(col("i").isin(ex: _*))
      .filter(col("i") =!= col("exemplar")).count()
    assert(selfAssigned == 0)
    assert(asg.count() == 500)
  }

  test("ap_topm aggregate ≡ DISTINCT + row_number window (dups, ties, NaN)") {
    // round-11: sparseSimilarities' top-m now runs as the bounded
    // ap_topm aggregate instead of a DISTINCT shuffle + window sort over
    // the full candidate stream. This pins bit-equivalence on the nasty
    // inputs: exact duplicate (i, k, s) rows (the multi-bucket
    // co-occurrence case), s-value ties across different k (D6: k ASC
    // breaks them), and a NaN s (Double.compare ranks it above all).
    import spark.implicits._
    graft.functions.ApAggs.register(spark)
    val rnd = new scala.util.Random(77)
    val base = (1 to 400).map { _ =>
      (rnd.nextInt(12).toLong, rnd.nextInt(60).toLong,
        math.floor(rnd.nextDouble() * 5) / 2.0) // coarse grid → many ties
    }
    val rows = (base ++ base.take(120) :+ ((3L, 999L, Double.NaN))).toDF("i", "k", "s")
      .filter(col("i") =!= col("k"))
      .distinct() // distinct (i,k,s) triples; duplicates re-added below
    val dups = rows.union(rows.limit(100)) // exact duplicate rows back in
    for (m <- Seq(1, 3, 7)) {
      val agg = dups
        .groupBy("i").agg(expr(s"ap_topm(s, k, $m)").as("top"))
        .select(col("i"), explode(col("top")).as("e"))
        .select(col("i"), col("e.k").as("k"), col("e.s").as("s"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val win = dups.distinct()
        .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("i")
            .orderBy(col("s").desc, col("k"))))
        .filter(col("rn") <= m).select("i", "k", "s")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // NaN != NaN in Set equality via ==; compare on bit patterns
      def bits(t: (Long, Long, Double)) =
        (t._1, t._2, java.lang.Double.doubleToLongBits(t._3))
      assert(agg.map(bits) == win.map(bits), s"mismatch at m=$m")
    }
  }
}
