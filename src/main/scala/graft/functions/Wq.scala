package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One (value, mass) input row for the weighted-quantile sketches. */
case class WqIn(v: Long, w: Long)

/** Lower weighted quartiles of a group: total mass plus the three
  * quartile values under the integer rule `quartile q = MIN v with
  * 4·cum(v) ≥ q·tot` (cum = mass at or below v). Field names match the
  * agg_weighted_median output contract so the struct projects straight
  * into the driver columns. */
case class WqOut(total_w: Long, wq1_cents: Long, wmedian_cents: Long,
    wq3_cents: Long)

/** [[WeightedQuantilesAt]]'s output: total mass plus one lower
  * weighted quantile per requested fraction, in request order. */
case class WqAtOut(total_w: Long, qs: Seq[Long])

/** Shared buffer kernel of the weighted-quantile sketch family — the
  * scale-safe replacement for the per-group RANGE-window cumulative
  * sum (round-17 VERDICT #1: `sum(w) over (partition by g order by v)`
  * puts a group's entire row set on one task; with a 5-value group key
  * that is 5 near-global sorts at 100 TB).
  *
  * Buffer: a value→mass map of at most `cap` distinct values. Below the
  * cap the sketch is EXACT — the map IS the grouped (value, Σmass)
  * relation, and the sorted prefix scan reproduces the RANGE-frame
  * cumulative sum bit-for-bit, so the integer rule
  * `q = MIN v with den·cum ≥ num·tot` returns exactly what the window
  * form returns. Every fixture SF sits under the default cap (max
  * distinct cents per l_returnflag group: 1,962 @ sf0.001 / 20,029 @
  * sf0.01 / 198,250 @ sf0.1, measured — vs cap 2²⁰), so
  * agg_weighted_median STAYS oracled against the window-derived DuckDB
  * SQL while the plan is two ObjectHashAggregates around one exchange:
  * map-side partials, sketch-sized shuffle rows, no window, no
  * per-group sort.
  *
  * Above the cap (the 100 TB regime) [[compress]] coalesces sorted runs
  * of consecutive values whose combined mass stays ≤ 2·tot/cap,
  * assigning each run's mass to its LOWEST value. Mass only ever moves
  * down, so cum_sketch(v) ≥ cum_exact(v) pointwise and every reported
  * quantile is ≤ the exact one (one-sided, like eqdepth_scale's
  * ties-assign-low rule), with rank error bounded by the mass of the
  * single run straddling the query point — O(tot/cap) per compression
  * level. Totals are preserved exactly at any cap. Merging partials is
  * map-sum + the same compress, so partial buffers combine associatively
  * under any merge tree (the Agarwal et al. 2013 mergeability shape, as
  * in [[MisraGries]]).
  *
  * Null handling lives in the QUERY layer: the typed encoder rejects a
  * null in either primitive field at runtime, so callers
  * (`Aggregates.weightedQuartiles`, `Graft.weightedQuantiles`) filter
  * null-value/null-mass rows before the aggregate (the SQL-aggregate
  * skip, made explicit). An empty group never reaches finish; a group
  * whose buffer is empty yields null output. */
private[functions] object WqKernel {

  def add(buf: Map[Long, Long], in: WqIn, cap: Int): Map[Long, Long] = {
    if (in == null) return buf
    // a negative mass breaks every cumulative invariant silently —
    // fail at the row that carries it, not at a wrong quantile
    require(in.w >= 0, s"weighted quantiles: negative mass ${in.w} at value ${in.v}")
    compress(buf.updated(in.v, buf.getOrElse(in.v, 0L) + in.w), cap)
  }

  def mergeMaps(x: Map[Long, Long], y: Map[Long, Long],
      cap: Int): Map[Long, Long] =
    compress(y.foldLeft(x) { case (m, (v, w)) =>
      m.updated(v, m.getOrElse(v, 0L) + w)
    }, cap)

  /** Greedy run-coalescing: walk values ascending, extend the current
    * run while its mass stays ≤ max(1, 2·tot/cap), emit the run's mass
    * at its lowest value. Runs already above the threshold stay atomic
    * (never re-coalesced with neighbours), so repeated compressions do
    * not compound a heavy bucket. Result size ≤ cap/2 light runs +
    * the < cap/2 heavy ones. No-op below the cap — the exact regime. */
  private def compress(m: Map[Long, Long], cap: Int): Map[Long, Long] = {
    if (m.size <= cap) return m
    val es = m.toArray.sortBy(_._1)
    var tot = 0L
    es.foreach(tot += _._2)
    val thr = math.max(1L, 2L * (tot / cap))
    val out = Map.newBuilder[Long, Long]
    var curV = es(0)._1
    var curW = es(0)._2
    var i = 1
    while (i < es.length) {
      val (v, w) = es(i)
      if (curW + w <= thr) curW += w
      else { out += curV -> curW; curV = v; curW = w }
      i += 1
    }
    out += curV -> curW
    out.result()
  }

  /** Exact a·b ≥ c·d over non-negative longs via 128-bit products —
    * the arbitrary-fraction instances multiply cum·den with den up to
    * 10⁴ (and callers may pass larger), so the plain 64-bit product
    * would wrap past tot ≈ 9.2e14 mass and silently flip a comparison
    * (round-18 review: the quartile-only form's ×4 had 2500× more
    * headroom; the generalization must not shrink the safe range). */
  @inline private def mulGe(a: Long, b: Long, c: Long, d: Long): Boolean = {
    val hi1 = java.lang.Math.multiplyHigh(a, b)
    val hi2 = java.lang.Math.multiplyHigh(c, d)
    if (hi1 != hi2) hi1 > hi2
    else java.lang.Long.compareUnsigned(a * b, c * d) >= 0
  }

  /** Lower weighted quantiles at the given exact rational fractions:
    * q_i = MIN v with den_i·cum ≥ num_i·tot — comparisons 128-bit
    * exact ([[mulGe]]), no interpolation, no float. Fractions may come
    * in any order (one pass serves all). Returns (total mass, one
    * value per fraction, request order). */
  def quantiles(buf: Map[Long, Long],
      fracs: Seq[(Long, Long)]): (Long, Array[Long]) = {
    val es = buf.toArray.sortBy(_._1)
    var tot = 0L
    es.foreach(tot += _._2)
    val out = new Array[Long](fracs.length)
    val found = new Array[Boolean](fracs.length)
    var nFound = 0
    var cum = 0L
    var i = 0
    while (i < es.length && nFound < fracs.length) {
      cum += es(i)._2
      var j = 0
      while (j < fracs.length) {
        if (!found(j) && mulGe(cum, fracs(j)._2, fracs(j)._1, tot)) {
          out(j) = es(i)._1; found(j) = true; nFound += 1
        }
        j += 1
      }
      i += 1
    }
    (tot, out)
  }

  val QuartileFracs: Seq[(Long, Long)] = Seq((1L, 4L), (2L, 4L), (3L, 4L))
}

/** The quartile instance of the sketch family (kernel scaladoc on
  * [[WqKernel]]) — agg_weighted_median's aggregate, fixed output shape
  * (total_w, wq1, wmedian, wq3). */
class WeightedQuantiles(cap: Int)
    extends Aggregator[WqIn, Map[Long, Long], WqOut] {
  require(cap >= 8, s"WeightedQuantiles: cap must be >= 8, got $cap")

  def zero: Map[Long, Long] = Map.empty
  def reduce(buf: Map[Long, Long], in: WqIn): Map[Long, Long] =
    WqKernel.add(buf, in, cap)
  def merge(x: Map[Long, Long], y: Map[Long, Long]): Map[Long, Long] =
    WqKernel.mergeMaps(x, y, cap)

  def finish(buf: Map[Long, Long]): WqOut = {
    if (buf.isEmpty) return null
    val (tot, qs) = WqKernel.quantiles(buf, WqKernel.QuartileFracs)
    WqOut(tot, qs(0), qs(1), qs(2))
  }

  def bufferEncoder: Encoder[Map[Long, Long]] =
    ExpressionEncoder[Map[Long, Long]]()
  def outputEncoder: Encoder[WqOut] = Encoders.product[WqOut]
}

/** Arbitrary-fraction instance of the sketch family (kernel scaladoc
  * on [[WqKernel]]): lower weighted quantiles at caller-chosen exact
  * rationals — the p50/p90/p99 corpus-statistics shape
  * (`Graft.weightedQuantiles` wires it; same exactness/compression
  * contract as the quartile form). `fracs` are (num, den) pairs with
  * 0 < num ≤ den. */
class WeightedQuantilesAt(cap: Int, fracs: Seq[(Long, Long)])
    extends Aggregator[WqIn, Map[Long, Long], WqAtOut] {
  require(cap >= 8, s"WeightedQuantilesAt: cap must be >= 8, got $cap")
  require(fracs.nonEmpty && fracs.forall { case (n, d) => n > 0 && n <= d },
    s"WeightedQuantilesAt: fractions must satisfy 0 < num <= den, got $fracs")

  def zero: Map[Long, Long] = Map.empty
  def reduce(buf: Map[Long, Long], in: WqIn): Map[Long, Long] =
    WqKernel.add(buf, in, cap)
  def merge(x: Map[Long, Long], y: Map[Long, Long]): Map[Long, Long] =
    WqKernel.mergeMaps(x, y, cap)

  def finish(buf: Map[Long, Long]): WqAtOut = {
    if (buf.isEmpty) return null
    val (tot, qs) = WqKernel.quantiles(buf, fracs)
    WqAtOut(tot, qs.toSeq)
  }

  def bufferEncoder: Encoder[Map[Long, Long]] =
    ExpressionEncoder[Map[Long, Long]]()
  def outputEncoder: Encoder[WqAtOut] = Encoders.product[WqAtOut]
}
