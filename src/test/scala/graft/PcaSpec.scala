package graft

import org.apache.spark.sql.functions._

/** graft.functions.Pca — the PCA/whitening stage (SURVEY §2.M emb_pca,
  * D3-exempt: no SQL oracle can produce an eigenbasis, so correctness
  * is pinned by the defining algebraic identities instead):
  *   - eigenpair residuals: ‖Σv − λv‖ small for every fitted component
  *     (THE definition of an eigenpair — checked against an
  *     independently computed covariance);
  *   - loadings orthonormal, eigenvalues descending;
  *   - projected variance per component equals its eigenvalue, and
  *     cross-component covariance vanishes (population convention);
  *   - k = d projection is lossless (reconstruction to 1e-9);
  *   - bit-determinism of fit (fixed-point long sums — any partition
  *     order) and of the query key end-to-end. */
class PcaSpec extends SparkSuite {

  private def fixture(n: Int, d: Int, seed: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    // anisotropic: stretch a few axes so the spectrum is well-separated
    val stretch = Array.tabulate(d)(i => 1.0 + 7.0 / (1 + i))
    (0 until n).map { i =>
      (i.toLong, Seq.tabulate(d)(j => rnd.nextGaussian() * stretch(j) + 0.5 * j))
    }.toDF("vec_id", "embedding")
  }

  test("fit produces true eigenpairs of the population covariance") {
    val n = 400; val d = 12
    val df = fixture(n, d, seed = 31)
    val model = graft.functions.Pca.fit(df, "embedding")
    // independent covariance: plain driver arithmetic on the collected
    // fixture (no fixed-point, no Spark) — the reference the fitted
    // basis must diagonalize
    val rows = df.collect().map(_.getSeq[Double](1).toArray)
    val mean = Array.tabulate(d)(j => rows.map(_(j)).sum / n)
    val cov = Array.tabulate(d, d) { (i, j) =>
      rows.map(r => (r(i) - mean(i)) * (r(j) - mean(j))).sum / n
    }
    val covNorm = math.sqrt(cov.map(_.map(x => x * x).sum).sum)
    (0 until d).foreach { c =>
      val v = model.loadings(c)
      val sv = Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j) * v(j)).sum)
      val resid = math.sqrt(
        Array.tabulate(d)(i => sv(i) - model.eigenvalues(c) * v(i)).map(x => x * x).sum)
      assert(resid <= 1e-6 * math.max(covNorm, 1.0),
        s"component $c eigenpair residual $resid (λ=${model.eigenvalues(c)})")
    }
    // the fitted mean matches the reference to fixed-point precision
    (0 until d).foreach { j =>
      assert(math.abs(model.mean(j) - mean(j)) <= 1e-6,
        s"mean[$j] ${model.mean(j)} vs ${mean(j)}")
    }
  }

  test("loadings are orthonormal and eigenvalues descend") {
    val model = graft.functions.Pca.fit(fixture(300, 10, seed = 7), "embedding")
    val d = model.d
    (0 until d).foreach { a =>
      (0 until d).foreach { b =>
        val dot = (0 until d).map(i => model.loadings(a)(i) * model.loadings(b)(i)).sum
        val want = if (a == b) 1.0 else 0.0
        assert(math.abs(dot - want) <= 1e-9, s"v${a}.v${b} = $dot, want $want")
      }
    }
    model.eigenvalues.sliding(2).foreach { case Array(x, y) =>
      assert(x >= y - 1e-12, s"eigenvalues not descending: $x then $y")
    }
    assert(model.eigenvalues.last >= -1e-9,
      s"negative eigenvalue ${model.eigenvalues.last} on a covariance")
  }

  test("projected variance equals the eigenvalue; components decorrelate") {
    val n = 500; val d = 8
    val df = fixture(n, d, seed = 13)
    val model = graft.functions.Pca.fit(df, "embedding")
    val proj = graft.functions.Pca.project(df, "embedding", model, k = d)
      .select((1 to d).map(c => col(s"pc$c")): _*).collect()
      .map(r => Array.tabulate(d)(c => r.getDouble(c)))
    (0 until d).foreach { c =>
      val xs = proj.map(_(c))
      val m = xs.sum / n
      val v = xs.map(x => (x - m) * (x - m)).sum / n
      assert(math.abs(v - model.eigenvalues(c)) <= 1e-6 * math.max(1.0, model.eigenvalues(c)),
        s"pc${c + 1} variance $v vs eigenvalue ${model.eigenvalues(c)}")
      // projected means vanish (projection subtracts the mean bias)
      assert(math.abs(m) <= 1e-6, s"pc${c + 1} mean $m not ~0")
    }
    (0 until d).foreach { a =>
      ((a + 1) until d).foreach { b =>
        val ma = proj.map(_(a)).sum / n; val mb = proj.map(_(b)).sum / n
        val cab = proj.map(r => (r(a) - ma) * (r(b) - mb)).sum / n
        assert(math.abs(cab) <= 1e-6 * math.max(1.0, model.eigenvalues(a)),
          s"pc${a + 1}/pc${b + 1} covariance $cab not ~0")
      }
    }
  }

  test("whitened projection has unit variance per component") {
    val n = 500; val d = 8
    val df = fixture(n, d, seed = 21)
    val model = graft.functions.Pca.fit(df, "embedding")
    val proj = graft.functions.Pca.project(df, "embedding", model, k = d, whiten = true)
      .select((1 to d).map(c => col(s"pc$c")): _*).collect()
      .map(r => Array.tabulate(d)(c => r.getDouble(c)))
    (0 until d).foreach { c =>
      val xs = proj.map(_(c))
      val m = xs.sum / n
      val v = xs.map(x => (x - m) * (x - m)).sum / n
      assert(math.abs(v - 1.0) <= 1e-6,
        s"whitened pc${c + 1} variance $v not ~1 (λ=${model.eigenvalues(c)})")
    }
  }

  test("k = d projection reconstructs the input") {
    val d = 6
    val df = fixture(200, d, seed = 3)
    val model = graft.functions.Pca.fit(df, "embedding")
    val rows = graft.functions.Pca.project(df, "embedding", model, k = d)
      .select(col("embedding") +: (1 to d).map(c => col(s"pc$c")): _*)
      .collect()
    rows.foreach { r =>
      val x = r.getSeq[Double](0)
      val p = Array.tabulate(d)(c => r.getDouble(c + 1))
      (0 until d).foreach { i =>
        val xi = model.mean(i) + (0 until d).map(c => p(c) * model.loadings(c)(i)).sum
        assert(math.abs(xi - x(i)) <= 1e-9 * math.max(1.0, math.abs(x(i))),
          s"reconstruction drift at dim $i: $xi vs ${x(i)}")
      }
    }
  }

  test("null embedding rows are ignored by fit; all-null input errors cleanly") {
    // round-11 ADVICE: the old fit divided the null-skipping moment
    // sums by an all-rows count — any null rows silently biased the
    // mean and covariance, and an all-null column NPE'd.
    val base = fixture(300, 6, seed = 11)
    val nulled = base.withColumn("embedding",
      when(col("vec_id") % 5 === 0, lit(null).cast("array<double>"))
        .otherwise(col("embedding")))
    val m1 = graft.functions.Pca.fit(nulled, "embedding")
    val m2 = graft.functions.Pca.fit(
      base.filter(col("vec_id") % 5 =!= 0), "embedding")
    assert(m1.mean.sameElements(m2.mean), "null rows biased the mean")
    assert(m1.eigenvalues.sameElements(m2.eigenvalues),
      "null rows biased the eigenvalues")
    assert((0 until m1.d).forall(c => m1.loadings(c).sameElements(m2.loadings(c))),
      "null rows biased the loadings")
    val allNull = base.withColumn("embedding", lit(null).cast("array<double>"))
    val e = intercept[IllegalArgumentException] {
      graft.functions.Pca.fit(allNull, "embedding")
    }
    assert(e.getMessage.contains("empty input"), s"unexpected error: ${e.getMessage}")
    // ragged vectors fail LOUD (the centered pass's zip_with would
    // otherwise silently null-pad a short row)
    val ragged = base.withColumn("embedding",
      when(col("vec_id") === 7, slice(col("embedding"), 1, 3))
        .otherwise(col("embedding")))
    val e2 = intercept[IllegalArgumentException] {
      graft.functions.Pca.fit(ragged, "embedding")
    }
    assert(e2.getMessage.contains("ragged"), s"unexpected error: ${e2.getMessage}")
    // null ELEMENTS inside a vector fail loud too (round-12 ADVICE: an
    // all-null dim NPE'd on the mean read; a partial null silently
    // biased sx against the n divisor)
    val nullEl = base.withColumn("embedding",
      when(col("vec_id") === 3,
        concat(slice(col("embedding"), 1, 5), array(lit(null).cast("double"))))
        .otherwise(col("embedding")))
    val e3 = intercept[IllegalArgumentException] {
      graft.functions.Pca.fit(nullEl, "embedding")
    }
    assert(e3.getMessage.contains("null elements"), s"unexpected error: ${e3.getMessage}")
  }

  test("a huge mean offset does not degrade the eigenbasis (centered moments)") {
    // round-11 ADVICE: uncentered second moments form cov as
    // E[xy] − μᵢμⱼ — at offset 1e9 both terms are ~1e18 (double ulp
    // ~256) while the true covariance is O(10²): the old fit's basis
    // was pure cancellation noise there. The centered fit must
    // reproduce the unshifted spectrum (covariance is shift-invariant).
    val d = 6
    val base = fixture(400, d, seed = 17)
    val m0 = graft.functions.Pca.fit(base, "embedding")
    val shifted = base.withColumn("embedding",
      transform(col("embedding"), (x, i) => x + (i + 1) * 1e9))
    val m1 = graft.functions.Pca.fit(shifted, "embedding")
    (0 until d).foreach { c =>
      val a = m0.eigenvalues(c); val b = m1.eigenvalues(c)
      assert(math.abs(a - b) <= 1e-3 * math.max(1.0, a),
        s"eigenvalue $c drifted under offset: $a vs $b")
      val dot = math.abs(
        (0 until d).map(i => m0.loadings(c)(i) * m1.loadings(c)(i)).sum)
      assert(dot >= 0.999, s"component $c rotated under offset (|dot| = $dot)")
    }
    (0 until d).foreach { j =>
      assert(math.abs(m1.mean(j) - (m0.mean(j) + (j + 1) * 1e9)) <= 1.0,
        s"shifted mean[$j] ${m1.mean(j)} vs ${m0.mean(j) + (j + 1) * 1e9}")
    }
  }

  test("tiny spread under a huge offset keeps a real covariance (shift sizing)") {
    // round-12 review: the old min(24, …)-capped shift quantized every
    // second-moment term to ZERO once the centered spread fell below
    // ~2e-4 — exactly the huge-offset/tiny-spread regime the centering
    // exists for. The shift is now sized from the actual magnitude.
    // x → x·1e-5 + 1e6 scales the covariance by 1e-10 exactly (shift
    // invariance + linear scaling), so the spectrum must track the
    // base fit's.
    val d = 6
    val base = fixture(400, d, seed = 23)
    val tiny = base.withColumn("embedding",
      transform(col("embedding"), x => x * 1e-5 + 1e6))
    val m0 = graft.functions.Pca.fit(base, "embedding")
    val m1 = graft.functions.Pca.fit(tiny, "embedding")
    (0 until d).foreach { c =>
      val want = m0.eigenvalues(c) * 1e-10
      assert(math.abs(m1.eigenvalues(c) - want) <= 1e-3 * math.max(want, 1e-18),
        s"eigenvalue $c under tiny spread: ${m1.eigenvalues(c)} vs $want")
      val dot = math.abs(
        (0 until d).map(i => m0.loadings(c)(i) * m1.loadings(c)(i)).sum)
      assert(dot >= 0.999, s"component $c rotated under tiny spread (|dot| = $dot)")
    }
  }

  test("fit is bit-deterministic across partitionings; emb_pca key runs end-to-end") {
    val df = fixture(500, 8, seed = 42)
    val m1 = graft.functions.Pca.fit(df.repartition(32), "embedding")
    val m2 = graft.functions.Pca.fit(df.repartition(3), "embedding")
    assert(m1.mean.sameElements(m2.mean), "mean differs across partitionings")
    assert(m1.eigenvalues.sameElements(m2.eigenvalues),
      "eigenvalues differ across partitionings")
    assert((0 until m1.d).forall(c => m1.loadings(c).sameElements(m2.loadings(c))),
      "loadings differ across partitionings")
    val out = SparkEntry.queries("emb_pca")(spark, sf001).collect()
    assert(out.length == 500 && out.head.length == 5,
      s"emb_pca shape: ${out.length} rows × ${out.headOption.map(_.length)}")
    val again = SparkEntry.queries("emb_pca")(spark, sf001).collect()
    assert(out.sameElements(again), "emb_pca key is not deterministic")
  }
}
