package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bloom filter (Bloom 1970) as a typed mergeable [[Aggregator]] — the
  * approximate-membership sketch completing the family (count-min
  * estimates counts, HLL counts distincts, Misra–Gries finds frequent
  * keys; this one answers "might x be in S?" in fixed memory with NO
  * false negatives).
  *
  * Buffer: a fixed `mBits`-bit array (`mBits/64` longs). Each element
  * arrives as TWO independent 64-bit hashes computed IN the plan
  * (`xxhash64(x)` / `xxhash64(x, salt)`) — build and probe share the
  * same codegen'd hash expressions by construction, so no JVM-side
  * hash reimplementation can drift from the SQL side. The k probe
  * positions derive as `h1 + i·h2 mod m` (Kirsch & Mitzenmacher 2006:
  * two hashes generate k with no loss in the FPR bound). Partial
  * buffers merge by bitwise OR — order-free, so map-side combine and
  * ANY merge tree at 100 TB give the identical filter.
  *
  * Guarantee: every inserted element probes positive (no false
  * negatives — the property [[graft.queries.Matching]]'s
  * prefilter-then-exact-verify pipelines are exact BECAUSE of); a
  * non-member probes positive with p ≈ (1 − e^(−kn/m))^k. The filter
  * is a fixed-size one-row relation however large the build side is —
  * broadcastable when the exact key set is NOT (the membership-sketch
  * role Spark's own runtime bloom join plays inside a single query,
  * exposed here as a reusable cross-stage artifact).
  *
  * Output: the word array itself, carried as a one-row relation
  * (never collected to the driver) and probed with
  * [[Bloom.mightContainSql]] — a codegen'd shift/mask chain.
  */
class BloomFilterAgg(mBits: Int, k: Int)
    extends Aggregator[(Long, Long), Array[Long], Array[Long]] {
  require(mBits >= 64 && mBits % 64 == 0,
    s"BloomFilterAgg: mBits must be a positive multiple of 64, got $mBits")
  require(k >= 1 && k <= 32, s"BloomFilterAgg: k must be in 1..32, got $k")

  def zero: Array[Long] = new Array[Long](mBits / 64)

  def reduce(buf: Array[Long], h: (Long, Long)): Array[Long] = {
    // mod-reduce each hash BEFORE combining — mathematically identical
    // to (h1 + i·h2) mod m over the integers, and the combined term
    // stays ≤ m·(k+1), so neither side can overflow (ANSI mode makes a
    // wrapping long add a runtime ERROR in Spark SQL, not a wrap)
    val a = java.lang.Math.floorMod(h._1, mBits.toLong)
    val b = java.lang.Math.floorMod(h._2, mBits.toLong)
    var i = 0
    while (i < k) {
      val idx = ((a + i * b) % mBits).toInt
      buf(idx >>> 6) |= (1L << (idx & 63))
      i += 1
    }
    buf
  }

  def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) |= y(i); i += 1 }
    x
  }

  def finish(buf: Array[Long]): Array[Long] = buf

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object Bloom {
  /** Default filter geometry: 2²⁰ bits (128 KiB) / 5 probes — FPR under
    * 1 % up to n ≈ 10⁵ build keys, and still a fixed 128 KiB broadcast
    * at ANY n (production sizes m from the expected key count; the
    * geometry threads through every helper so build and probe can't
    * disagree). */
  val DefaultBits: Int = 1 << 20
  val DefaultK: Int = 5

  /** Salt for the second hash: any non-null literal distinct from the
    * bare-column form makes xxhash64(x, salt) independent of
    * xxhash64(x) for the Kirsch–Mitzenmacher scheme. */
  val H2Salt: String = "graft-bloom-h2"

  /** SQL predicate testing membership of the element whose two hashes
    * are in columns `h1`/`h2` against the filter words in array column
    * `words` — k codegen'd element_at + shift/mask terms AND'd, no UDF.
    * MUST be built with the same (mBits, k) as the aggregator. */
  def mightContainSql(words: String, h1: String, h2: String,
      mBits: Int = DefaultBits, k: Int = DefaultK): String =
    (0 until k).map { i =>
      // hashes mod-reduced BEFORE combining: ≡ (h1 + i·h2) mod m over
      // the integers, and the sum stays ≤ m·(k+1) — ANSI mode turns a
      // wrapping long add/multiply into a runtime error, so the naive
      // form CRASHES on half of all hash values
      val idx = s"((pmod($h1, ${mBits}L) + ${i}L * pmod($h2, ${mBits}L)) % ${mBits}L)"
      // `div` (integer), never `/` (double division in Spark SQL)
      s"(shiftright(element_at($words, CAST($idx div 64 AS INT) + 1), " +
        s"CAST($idx % 64 AS INT)) & 1L) = 1L"
    }.mkString("(", " AND ", ")")
}
