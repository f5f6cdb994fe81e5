package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property guard on the deletion-neighborhood fuzzy join
  * (queries/Matching.fuzzyPairs): on random small-alphabet strings —
  * the regime where near-misses, duplicate strings, empty strings, and
  * single-character strings are all dense — the engine's candidate+
  * verify pipeline must equal the brute-force all-pairs Levenshtein
  * row-for-row at both taus. A small alphabet maximizes the rate of
  * lev ∈ {tau, tau+1} boundary pairs (exactly where a recall bug or a
  * missing verify would show); MatchingSpec's fixed words cover the
  * named edit kinds, this covers the space between them.
  */
object FuzzyProperties extends Properties("fuzzy_join") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkSuite.session

  private val strs: Gen[String] = for {
    k <- Gen.choose(0, 6)
    cs <- Gen.listOfN(k, Gen.oneOf('a', 'b', 'c'))
  } yield cs.mkString

  private val instances: Gen[(List[String], Int)] = for {
    n <- Gen.choose(2, 24)
    ss <- Gen.listOfN(n, strs)
    tau <- Gen.oneOf(1, 2)
  } yield (ss, tau)

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  property("fuzzyPairs equals brute-force all-pairs levenshtein at tau 1 and 2") =
    forAll(instances) { case (ss, tau) =>
      import spark.implicits._
      val rows = ss.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val got = Graft.fuzzyMatches(rows.toDF("id", "s"), "id", "s", tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = (for {
        (ia, sa) <- rows; (ib, sb) <- rows
        if ia < ib && lev(sa, sb) <= tau
      } yield (ia, ib, lev(sa, sb).toLong)).toSet
      got == want
    }
}
