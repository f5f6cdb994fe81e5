package graft

import org.scalatest.funsuite.AnyFunSuite

/** Drift guard for [[Bench.baselinePins]] (round-15 ADVICE): the retry
  * pass's pin map must stay byte-equal to the committed BASELINE.md
  * record it copies — a silent desync would arm the record-insurance
  * retry against the wrong targets. Parses the pinned table (the FIRST
  * markdown table only; the floors table further down re-quotes three
  * of the values as evidence, not contract). No Spark needed.
  */
class BenchPinsSpec extends AnyFunSuite {

  // bench row -> token that identifies its BASELINE.md table line
  // (ap_full_n500 pins to the ap_damped_iterate NumPy full-loop row)
  private val rowToken = Map(
    "agg_groupby" -> "`agg_groupby`",
    "topk_global" -> "`topk_global`",
    "topk_per_group" -> "`topk_per_group`",
    "stream_tumbling" -> "`stream_tumbling`",
    "simsearch_topk" -> "`simsearch_topk`",
    "join_asof" -> "`join_asof`",
    "dedup_minhash" -> "`dedup_minhash`",
    "dedup_cluster" -> "`dedup_cluster`",
    "ap_full_n500" -> "`ap_damped_iterate`")

  test("Bench.baselinePins matches the committed BASELINE.md pinned table") {
    val md = java.nio.file.Files.readString(
      java.nio.file.Paths.get("BASELINE.md"))
    // first table only: stop at the round-5/6 floors section
    val pinned = md.split("\n## ", 2).head.linesIterator.toSeq
    val cell = """\|\s*([0-9]+(?:\.[0-9]+)?)\s*s\s*\|""".r
    assert(rowToken.keySet == Bench.baselinePins.keySet,
      "pin map keys drifted from the guarded row set")
    rowToken.foreach { case (key, token) =>
      val lines = pinned.filter(l => l.startsWith("|") && l.contains(token))
      assert(lines.nonEmpty, s"$key: no pinned BASELINE.md row contains $token")
      val v = cell.findFirstMatchIn(lines.head)
        .getOrElse(fail(s"$key: no '| <n> s |' value cell in: ${lines.head}"))
        .group(1).toDouble
      assert(math.abs(v - Bench.baselinePins(key)) < 1e-9,
        s"$key: BASELINE.md pins $v s but Bench.baselinePins has " +
          s"${Bench.baselinePins(key)} - resync the one-copy constant")
    }
  }
}
