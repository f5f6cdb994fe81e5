package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items summary (Misra & Gries 1982) as a typed
  * mergeable [[Aggregator]] — the deterministic-bound heavy-hitter
  * sketch completing the sketch family (count-min estimates any key,
  * HLL counts distincts, approx_percentile ranks; this one FINDS the
  * frequent keys without a full groupBy).
  *
  * Buffer: at most k (key, counter) entries. Per-row update is the
  * classic rule — increment a present key, insert while there is room,
  * otherwise decrement every counter by one and drop zeros (the O(k)
  * path runs only on overflow rows). Partial buffers merge by summing
  * counters then subtracting the (k+1)-th largest from all and keeping
  * the positive ones — the Agarwal et al. 2013 (Mergeable Summaries)
  * rule, which preserves the sketch guarantee under ANY merge tree, so
  * map-side partials combine freely at 100 TB.
  *
  * Guarantee (held through merges): every stored estimate satisfies
  * `true − N/(k+1) ≤ est ≤ true`, and therefore every key with true
  * count > N/(k+1) IS present in the summary. Which *infrequent* keys
  * also appear (and their exact estimates) depends on partition
  * arrival order — the production pipeline (text_heavy_hitters)
  * therefore re-counts the ≤ k candidates exactly and filters on the
  * exact counts, making the END result deterministic and oracle-able
  * while the sketch pass keeps the shuffle at k rows per partition.
  *
  * Output: the surviving (key, estimate) pairs, key-sorted.
  */
class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
  require(k >= 1, s"MisraGries: k must be >= 1, got $k")

  def zero: Map[String, Long] = Map.empty

  def reduce(buf: Map[String, Long], term: String): Map[String, Long] = {
    // SQL-aggregate null semantics: a null item contributes nothing
    // (ScalaAggregator passes nulls through; a null Map key would NPE
    // later in finish's key sort — review round 15)
    if (term == null) return buf
    val cur = buf.getOrElse(term, 0L)
    if (cur > 0L || buf.size < k) buf.updated(term, cur + 1L)
    else buf.flatMap { case (t, c) =>
      if (c > 1L) Some(t -> (c - 1L)) else None
    }
  }

  def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
    val sum = y.foldLeft(x) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      // subtract the (k+1)-th largest counter from all, keep positive —
      // at most k survive, undercounts add like the decrement rule's
      val cut = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse).apply(k)
      sum.flatMap { case (t, c) => if (c > cut) Some(t -> (c - cut)) else None }
    }
  }

  def finish(buf: Map[String, Long]): Seq[(String, Long)] =
    buf.toSeq.sortBy(_._1)

  def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  def outputEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
}
