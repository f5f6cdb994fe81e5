package graft.queries

/** Scale dispatch for oracles that pin per-fixture-scale literals
  * (converged AP exemplar sets, BPE merge tables): the orders row
  * count — orders = 1 500 000 · SF by the TPC-H-ish generator, i.e.
  * 1500/15000/150000 at the three fixture dirs, verified against the
  * parquet metadata — is the one statistic that discriminates the sf
  * dirs inside a STATIC oracle SQL string (the embeddings tables
  * cannot: sf0.001 and sf0.01 both carry N = 500 vectors, different
  * content). An unpinned scale yields NULL → zero rows downstream — a
  * loud row-count mismatch rather than a silent wrong-scale compare. */
private[queries] object SfPins {

  val ordersCountOf: Seq[(String, Long)] =
    Seq("sf0.001" -> 1500L, "sf0.01" -> 15000L, "sf0.1" -> 150000L)

  /** A CASE over the orders row count selecting each pinned scale's
    * rendered literal. Fails loud at oracle-BUILD time if a pinned sf
    * has no dispatch statistic here (add it first — a silent fallthrough
    * would make that scale's parity compare against NULL). */
  def scaleCase(pins: Seq[(String, String)], render: String => String): String =
    pins.map { case (sf, lits) =>
      val n = ordersCountOf.collectFirst { case (`sf`, c) => c }.getOrElse(
        throw new IllegalArgumentException(
          s"SfPins.scaleCase: no orders count pinned for fixture scale '$sf'"))
      s"WHEN $n THEN ${render(lits)}"
    }.mkString("CASE (SELECT count(*) FROM orders) ", " ", " END")
}
