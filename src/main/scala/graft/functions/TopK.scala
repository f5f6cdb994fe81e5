package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group top-k aggregate (SURVEY §4.4a).
  *
  * The window formulation of "top 3 per group" shuffles and sorts every
  * input row; this Aggregator keeps only k rows per group in its buffer,
  * so the map-side partial aggregation reduces the shuffle to
  * ≤ k·groups·partitions rows — the property that matters at 100 TB,
  * where the full shuffle is the bottleneck.
  *
  * Ordering matches the oracle exactly: l_extendedprice DESC, then
  * l_orderkey, l_linenumber, l_partkey ASC (rule D6) — exact compares on
  * doubles/longs, so results are bit-identical to the window build.
  */
final case class LiRow(price: Double, orderkey: Long, linenumber: Int, partkey: Long)

class TopKRows(k: Int) extends Aggregator[LiRow, Array[LiRow], Array[LiRow]] {

  private def before(a: LiRow, b: LiRow): Boolean =
    a.price > b.price || (a.price == b.price && (
      a.orderkey < b.orderkey || (a.orderkey == b.orderkey && (
        a.linenumber < b.linenumber || (a.linenumber == b.linenumber &&
          a.partkey < b.partkey)))))

  def zero: Array[LiRow] = Array.empty

  def reduce(buf: Array[LiRow], v: LiRow): Array[LiRow] = {
    if (buf.length == k && !before(v, buf(k - 1))) buf
    else {
      var pos = buf.length
      while (pos > 0 && before(v, buf(pos - 1))) pos -= 1
      val out = new Array[LiRow](math.min(buf.length + 1, k))
      var i = 0
      while (i < out.length) {
        out(i) = if (i < pos) buf(i) else if (i == pos) v else buf(i - 1)
        i += 1
      }
      out
    }
  }

  def merge(x: Array[LiRow], y: Array[LiRow]): Array[LiRow] = {
    // merge two sorted bounded buffers
    val out = new Array[LiRow](math.min(x.length + y.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < out.length) {
      out(o) =
        if (i == x.length) { j += 1; y(j - 1) }
        else if (j == y.length) { i += 1; x(i - 1) }
        else if (before(x(i), y(j))) { i += 1; x(i - 1) }
        else { j += 1; y(j - 1) }
      o += 1
    }
    out
  }

  def finish(buf: Array[LiRow]): Array[LiRow] = buf
  def bufferEncoder: Encoder[Array[LiRow]] = ExpressionEncoder[Array[LiRow]]()
  def outputEncoder: Encoder[Array[LiRow]] = ExpressionEncoder[Array[LiRow]]()
}
