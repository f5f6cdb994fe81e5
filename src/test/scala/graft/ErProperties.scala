package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Round-12 property guard on the blocked entity-resolution matcher:
  * the distinct-string decomposition (compare DISTINCT names per
  * block, expand exact-duplicate groups with no compare) must equal
  * the naive blocked self-join row-for-row on random instances that
  * force heavy duplication, empty strings, multi-space names, and
  * single-token names — shapes the fixture oracle exercises only
  * partially. */
object ErProperties extends Properties("er_blocked") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = SparkSuite.session

  // small vocab ⇒ duplicate names with high probability; tokens chosen
  // to produce shared and distinct block keys plus edge shapes
  private val words = Seq("red", "rod", "red", "blue", "bolt", "bol", "", "a b")
  private val names: Gen[String] = for {
    k <- Gen.choose(1, 3)
    ws <- Gen.listOfN(k, Gen.oneOf(words))
  } yield ws.mkString(" ")

  private val instances: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(2, 30)
    ns <- Gen.listOfN(n, names)
  } yield ns.zipWithIndex.map { case (s, i) => (i.toLong, s) }

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  property("decomposed kernel = naive blocked self-join") =
    forAll(instances) { rows =>
      import spark.implicits._
      val maxEdits = 2
      val got = queries.Dedup.blockedEditPairs(
          rows.toDF("id", "name"), maxEdits)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val expected = (for {
        a <- rows; b <- rows
        if a._1 < b._1
        if a._2.split(" ").headOption.getOrElse("") ==
          b._2.split(" ").headOption.getOrElse("")
        d = lev(a._2, b._2)
        if d <= maxEdits
      } yield (a._1, b._1, d)).toSet
      got == expected
    }

  // ids drawn from a small range ⇒ the same id appears under several
  // names with high probability — the round-12 ADVICE shape: an id
  // listed under two ≤-maxEdits names must NOT emit a self-pair (the
  // naive join's a.id < b.id excludes it; the decomposed kernel's
  // cross-name branch needed the explicit key_a ≠ key_b filter)
  private val dupIdInstances: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(2, 30)
    ns <- Gen.listOfN(n, names)
    ids <- Gen.listOfN(n, Gen.choose(0L, math.max(1L, n / 3L)))
  } yield ids.zip(ns)

  property("duplicate ids: no self-pairs, row set still = naive") =
    forAll(dupIdInstances) { rows =>
      import spark.implicits._
      val maxEdits = 2
      val got = queries.Dedup.blockedEditPairs(
          rows.toDF("id", "name"), maxEdits)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val expected = (for {
        a <- rows; b <- rows
        if a._1 < b._1
        if a._2.split(" ").headOption.getOrElse("") ==
          b._2.split(" ").headOption.getOrElse("")
        d = lev(a._2, b._2)
        if d <= maxEdits
      } yield (a._1, b._1, d)).toSet
      got.forall(t => t._1 != t._2) && got == expected
    }
}
