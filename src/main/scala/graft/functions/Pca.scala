package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PCA / whitening over an embedding column — the dimension-reduction
  * stage an LLM-data pipeline runs before ANN indexing (cheaper
  * distances, decorrelated axes for product quantization).
  *
  * Spark-first decomposition of "fit":
  *   1. one bounded scale pass (count + max|x| — sizes the fixed-point
  *      shifts, the same overflow discipline as Ivf.refine);
  *   2. one fixed-point MEAN pass (d keyed long sums) whose result
  *      centers the data for pass 3 — conditioning, not convenience:
  *      forming cov as E[xy] − μᵢμⱼ from uncentered sums cancels
  *      catastrophically when the mean offset dominates the spread
  *      (round-11 ADVICE);
  *   3. ONE distributed pass computing all d·(d+3)/2 CENTERED moment
  *      sums via [[PcaMoments]], a TypedImperativeAggregate whose
  *      buffer is a long array — input rows never explode into (i, j)
  *      pairs (the explode formulation is N·d²/2 intermediate rows —
  *      2×10¹² at N = 10⁹, d = 64 — where the aggregate does the same
  *      arithmetic in-place and ships ONE buffer per task);
  *   4. driver-side cyclic-Jacobi eigendecomposition of the d×d
  *      covariance (d ≤ 1024 enforced — 10⁶ doubles, microseconds of
  *      driver time; the DATA never lands on the driver);
  *   5. projection as a codegen'd expression per component
  *      (aggregate(zip_with(v, lit(loading)), …) — no UDF, no shuffle:
  *      the transform is embarrassingly row-parallel).
  *
  * Determinism (house rule D2): every distributed sum is a sum of
  * LONGS — per-term round(x·2^shift) (and round(x_i·x_j·2^shift) for
  * second moments) — associative in any partition order, so the fitted
  * basis is bit-identical run to run. Raw double sums would make the
  * eigenbasis (and everything indexed with it) depend on task
  * scheduling. Eigenvector sign is fixed deterministically (the
  * largest-|coordinate| entry is made positive; ties → smallest index).
  */
object Pca {

  final case class Model(
      mean: Array[Double],
      eigenvalues: Array[Double],       // descending, length d
      loadings: Array[Array[Double]]) { // loadings(c) = component c, length d
    def d: Int = mean.length
  }

  /** Max supported dimensionality: the d×d covariance must stay a
    * trivial driver object (1024² doubles = 8 MB; Jacobi is O(d³) ≈
    * 10⁹ flops — seconds). Embedding tables are d ≤ a few hundred. */
  val MaxDim: Int = 1024

  /** Register pca_moments for expr() use (idempotent, the ApAggs
    * pattern). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier("pca_moments")
    if (!reg.functionExists(id))
      reg.createOrReplaceTempFunction("pca_moments",
        es => PcaMoments(es(0), es(1)), "built-in")
  }

  /** Fit on `vecs` (columns: anything + `col` array<double|float>).
    * POPULATION covariance (divisor n) — the PCA convention where
    * eigenvalues equal projected variances. Null vectors are ignored
    * (filtered before EVERY pass, so the scale/mean/moment passes agree
    * on the row count — round-11 ADVICE: the old fit divided the
    * null-skipping moment sums by an all-rows count).
    *
    * Numerical conditioning (round-11 ADVICE): second moments are
    * accumulated CENTERED — a fixed-point per-dim mean pass runs first
    * and its (deterministic) mean is subtracted per row before
    * [[PcaMoments]], so the covariance never forms as the catastrophic
    * E[xy] − μᵢμⱼ difference of two large numbers. For embeddings with
    * a mean offset far from the origin (the common unnormalized case)
    * this keeps the quantization error relative to the SPREAD, not the
    * offset. Three bounded passes total (scale, mean, moments) — each a
    * single scan with a scalar/d-row result; determinism is unchanged
    * (every distributed sum is still a sum of longs, and the centering
    * offset is itself derived from fixed-point sums). */
  def fit(vecs: DataFrame, vecCol: String): Model = {
    register(vecs.sparkSession)
    val v = vecs.select(transform(col(vecCol), _.cast("double")).as("v"))
      .filter(col("v").isNotNull)
    val head = v.limit(1).collect()
    require(head.nonEmpty, "Pca.fit: empty input (no non-null vectors)")
    val d = head(0).getSeq[Double](0).length
    require(d <= MaxDim, s"Pca.fit: d=$d exceeds MaxDim=$MaxDim")
    val scaleRow = v.agg(
      count(lit(1)).as("n"),
      max(array_max(transform(col("v"), x => abs(x)))).as("m"),
      min(size(col("v"))).as("dmin"),
      max(size(col("v"))).as("dmax"),
      max(when(exists(col("v"), x => x.isNull), 1).otherwise(0)).as("nullEl"))
      .collect()(0)
    val n = scaleRow.getLong(0)
    require(n > 1, s"Pca.fit: need ≥ 2 non-null rows, got $n")
    // Ragged input must fail LOUD here: the centered pass below uses
    // zip_with, which would silently null-pad a short vector instead of
    // tripping the aggregate's dimension check the raw path had.
    require(scaleRow.getInt(2) == d && scaleRow.getInt(3) == d,
      s"Pca.fit: ragged vectors (sizes ${scaleRow.getInt(2)}..${scaleRow.getInt(3)}, expected $d)")
    // Null ELEMENTS inside a vector fail loud too (round-12 ADVICE):
    // an all-null dimension would NPE on the mean read below, and a
    // partially-null one would silently bias sx against the n divisor —
    // the same discipline as the null-VECTOR filter above.
    require(scaleRow.getInt(4) == 0,
      "Pca.fit: vectors contain null elements — clean or impute upstream")
    val maxAbs = scaleRow.getDouble(1)
    // Shift sized from the ACTUAL worst magnitude — no 1.0 floor and
    // no small cap (round-12 review): data whose centered spread is
    // tiny (the huge-offset regime the centering exists for) NEEDS a
    // large shift, or every second-moment term rounds to zero and the
    // covariance silently collapses; the old min(24, …) did exactly
    // that below spread ~2e-4. The only real constraints are overflow
    // (worst·n·2^shift < 2⁶²) and a finite 2^shift for degenerate
    // all-constant input (worst = 0 → any shift works; 0 keeps pow
    // sane).
    def shiftFor(worstMag: Double): Int = {
      if (worstMag <= 0 || worstMag.isNaN || worstMag.isInfinite) 0
      else math.max(0, math.min(512,
        62 - math.ceil(math.log(worstMag * n.toDouble) / math.log(2.0)).toInt))
    }
    // Pass 2: fixed-point per-dim mean (+ per-dim min/max, which bound
    // the CENTERED magnitude exactly — bounding it by maxAbs + |μ|
    // instead would burn the shift budget on the offset the centering
    // just removed) — posexplode to (pos, x), one narrow hash aggregate
    // over d groups. N·d exploded 16-byte rows, all codegen; the d²
    // moment work stays in the aggregate pass.
    val shift1 = shiftFor(maxAbs)
    val scale1 = math.pow(2.0, shift1)
    val mean0 = new Array[Double](d)
    var maxAbsC = 0.0
    v.select(posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("pos")
      .agg(sum(round(col("x") * scale1).cast("long")).as("sx"),
        min(col("x")).as("mn"), max(col("x")).as("mx"))
      .collect()
      .foreach { r =>
        val m = (r.getLong(1).toDouble / scale1) / n
        mean0(r.getInt(0)) = m
        maxAbsC = math.max(maxAbsC,
          math.max(r.getDouble(3) - m, m - r.getDouble(2)))
      }
    // Pass 3: moments of the CENTERED values, shift sized from the true
    // centered spread.
    val shift = shiftFor(math.max(maxAbsC, maxAbsC * maxAbsC))
    val scale = math.pow(2.0, shift)
    val momRow = v
      .select(zip_with(col("v"), typedLit(mean0.toSeq), (x, m) => x - m).as("cv"))
      .agg(expr(s"pca_moments(cv, $shift)").as("m"))
      .collect()(0).getAs[org.apache.spark.sql.Row](0)
    val sums = momRow.getSeq[Long](0).toArray
    val prods = momRow.getSeq[Long](1).toArray
    val nMom = momRow.getLong(2)
    require(nMom == n, s"Pca.fit: moment pass saw $nMom rows, scale pass $n")
    // δ = mean of the centered values — the tiny fixed-point residual of
    // the centering offset; the true mean is μ₀ + δ and the centered
    // covariance correction δᵢδⱼ is O(quantization²) — benign.
    val delta = sums.map(s => (s.toDouble / scale) / n)
    val mean = Array.tabulate(d)(i => mean0(i) + delta(i))
    val cov = Array.ofDim[Double](d, d)
    var idx = 0
    var i = 0
    while (i < d) {
      var j = 0
      while (j <= i) {
        val exy = (prods(idx).toDouble / scale) / n
        val c = exy - delta(i) * delta(j)
        cov(i)(j) = c; cov(j)(i) = c
        idx += 1; j += 1
      }
      i += 1
    }
    val (evals, evecs) = symEig(cov)
    Model(mean, evals, evecs)
  }

  /** Floor for the whitening divisor √λ: components with (numerically)
    * zero variance are left unscaled rather than exploded. */
  val WhitenEps: Double = 1e-12

  /** Project `vecs` onto the model's top `k` components: adds columns
    * pc1..pck. Pure row-parallel codegen'd expressions — the loading
    * and mean ride as literals, no join, no shuffle. `whiten` divides
    * each component by √λ (unit projected variance — the PQ/ANN
    * preprocessing convention); components with λ ≤ [[WhitenEps]] stay
    * unscaled. */
  def project(vecs: DataFrame, vecCol: String, model: Model, k: Int,
      whiten: Boolean = false): DataFrame = {
    require(k >= 1 && k <= model.d, s"Pca.project: k=$k out of 1..${model.d}")
    val vd = transform(col(vecCol), x => x.cast("double"))
    (1 to k).foldLeft(vecs) { (df, c) =>
      val w = model.loadings(c - 1)
      val bias = model.mean.zip(w).map { case (m, wi) => m * wi }.sum
      val raw = aggregate(
        zip_with(vd, typedLit(w.toSeq), (x, l) => x * l),
        lit(0.0), (acc, e) => acc + e) - lit(bias)
      val ev = model.eigenvalues(c - 1)
      df.withColumn(s"pc$c",
        if (whiten && ev > WhitenEps) raw / lit(math.sqrt(ev)) else raw)
    }
  }

  /** Cyclic-Jacobi eigendecomposition of a symmetric matrix.
    * Returns (eigenvalues descending, eigenvectors — row c is the unit
    * vector for eigenvalue c, sign-fixed). Deterministic: fixed sweep
    * order, fixed convergence bound, no pivot search. */
  def symEig(aIn: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = aIn.length
    val a = Array.tabulate(d, d)((i, j) => aIn(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var norm = 0.0
    var i = 0
    while (i < d) { var j = 0; while (j < d) { norm += a(i)(j) * a(i)(j); j += 1 }; i += 1 }
    val tol = 1e-22 * math.max(norm, 1e-300)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 100 && off > tol) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (apq != 0.0) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(1.0 + theta * theta))
              else 1.0 / (theta - math.sqrt(1.0 + theta * theta))
            val c = 1.0 / math.sqrt(1.0 + t * t)
            val s = t * c
            var r = 0
            while (r < d) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = c * arp - s * arq
              a(r)(q) = s * arp + c * arq
              r += 1
            }
            r = 0
            while (r < d) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = c * apr - s * aqr
              a(q)(r) = s * apr + c * aqr
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = c * vrp - s * vrq
              v(r)(q) = s * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = 0.0
      i = 0
      while (i < d) {
        var j = i + 1
        while (j < d) { off += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      sweep += 1
    }
    // (eigenvalue, original column) pairs, sorted λ DESC then index ASC
    val order = (0 until d).sortBy(c => (-a(c)(c), c))
    val evals = order.map(c => a(c)(c)).toArray
    val evecs = order.map { c =>
      val vec = Array.tabulate(d)(r => v(r)(c))
      // deterministic sign: largest-|coordinate| entry positive
      var bi = 0
      var r = 1
      while (r < d) { if (math.abs(vec(r)) > math.abs(vec(bi))) bi = r; r += 1 }
      if (vec(bi) < 0) { r = 0; while (r < d) { vec(r) = -vec(r); r += 1 } }
      vec
    }.toArray
    (evals, evecs)
  }
}

/** Fixed-point moment buffer: count, per-dim Σround(x_i·2^shift), and
  * upper-triangle Σround(x_i·x_j·2^shift) — all longs, so merges are
  * exact and order-free. Sized lazily from the first row. */
final class PcaMomentsBuf(val shift: Int) {
  var d: Int = -1
  var n: Long = 0L
  var s: Array[Long] = null
  var ss: Array[Long] = null

  def init(dim: Int): Unit = {
    d = dim
    s = new Array[Long](d)
    ss = new Array[Long](d * (d + 1) / 2)
  }

  def add(x: ArrayData): Unit = {
    val dim = x.numElements()
    if (d < 0) init(dim)
    require(dim == d, s"PcaMoments: ragged input ($dim vs $d)")
    val scale = java.lang.Math.scalb(1.0, shift)
    n += 1
    var idx = 0
    var i = 0
    while (i < d) {
      val xi = x.getDouble(i)
      s(i) += math.round(xi * scale)
      var j = 0
      while (j <= i) {
        ss(idx) += math.round(xi * x.getDouble(j) * scale)
        idx += 1; j += 1
      }
      i += 1
    }
  }

  def mergeFrom(o: PcaMomentsBuf): Unit = {
    if (o.d < 0) return
    if (d < 0) init(o.d)
    require(o.d == d, s"PcaMoments: ragged merge (${o.d} vs $d)")
    n += o.n
    var i = 0
    while (i < s.length) { s(i) += o.s(i); i += 1 }
    i = 0
    while (i < ss.length) { ss(i) += o.ss(i); i += 1 }
  }
}

/** pca_moments(v: array<double>, shift: int) →
  * struct<s: array<bigint>, ss: array<bigint>, n: bigint>.
  * See [[PcaMomentsBuf]]; used by [[Pca.fit]]. */
case class PcaMoments(left: Expression, right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PcaMomentsBuf] with BinaryLike[Expression] {

  private lazy val shift: Int = right.eval().asInstanceOf[Number].intValue()

  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("s", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("ss", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("n", LongType, nullable = false)))

  override def createAggregationBuffer(): PcaMomentsBuf = new PcaMomentsBuf(shift)

  override def update(buf: PcaMomentsBuf, input: InternalRow): PcaMomentsBuf = {
    val v = left.eval(input)
    if (v != null) buf.add(v.asInstanceOf[ArrayData])
    buf
  }

  override def merge(buf: PcaMomentsBuf, other: PcaMomentsBuf): PcaMomentsBuf = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: PcaMomentsBuf): Any = {
    val row = new GenericInternalRow(3)
    val s = if (buf.d < 0) Array.empty[Long] else buf.s
    val ss = if (buf.d < 0) Array.empty[Long] else buf.ss
    row.update(0, new GenericArrayData(s.map(x => x: Any)))
    row.update(1, new GenericArrayData(ss.map(x => x: Any)))
    row.setLong(2, buf.n)
    row
  }

  override def serialize(buf: PcaMomentsBuf): Array[Byte] = {
    val d = math.max(buf.d, 0)
    val bb = java.nio.ByteBuffer.allocate(16 + 8 * d + 8 * d * (d + 1) / 2)
    bb.putInt(d).putLong(buf.n)
    var i = 0
    while (i < d) { bb.putLong(buf.s(i)); i += 1 }
    i = 0
    while (i < d * (d + 1) / 2) { bb.putLong(buf.ss(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): PcaMomentsBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val d = bb.getInt()
    val buf = new PcaMomentsBuf(shift)
    val n = bb.getLong()
    if (d > 0) {
      buf.init(d)
      buf.n = n
      var i = 0
      while (i < d) { buf.s(i) = bb.getLong(); i += 1 }
      i = 0
      while (i < d * (d + 1) / 2) { buf.ss(i) = bb.getLong(); i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): PcaMoments =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PcaMoments =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PcaMoments =
    copy(left = newLeft, right = newRight)
}
