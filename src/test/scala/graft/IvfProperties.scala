package graft

import graft.functions.Ivf
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Round-12 property guard on [[Ivf.prune]] (the structural fix for the
  * r11 medium ADVICE — childless branches could silently drop vectors
  * from the distributed tree descent): on random multi-level trees with
  * dangling and childless branches, pruning must (a) never touch the
  * bottom level (the caller's real centroids), (b) leave every
  * surviving non-bottom node with ≥ 1 child (the invariant that makes
  * an empty distributed frontier impossible), and (c) preserve the set
  * of bottom nodes reachable from the roots (it removes only dead
  * branches, never live ones). Pure driver-side — no Spark session. */
object IvfProperties extends Properties("ivf_prune") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(200)

  private val v = Array(0.0)

  // parents drawn from a range WIDER than the level above, so dangling
  // parent refs (no such node) and childless nodes both occur often
  private val trees: Gen[Ivf.CentroidTree] = for {
    nTop <- Gen.choose(1, 5)
    nMid <- Gen.choose(1, 8)
    nBot <- Gen.choose(1, 12)
    midParents <- Gen.listOfN(nMid, Gen.choose(0L, nTop + 1L))
    botParents <- Gen.listOfN(nBot, Gen.choose(0L, nMid + 1L))
  } yield Ivf.CentroidTree(
    (0 until nTop).map(i => (i.toLong, v)),
    List(
      midParents.zipWithIndex.map { case (p, i) => (i.toLong, p, v) },
      botParents.zipWithIndex.map { case (p, i) => (100L + i, p, v) }))

  private def reachableBottom(t: Ivf.CentroidTree): Set[Long] = {
    var cur = t.top.map(_._1).toSet
    t.down.foreach { lvl =>
      cur = lvl.filter(e => cur.contains(e._2)).map(e => e._1).toSet
    }
    cur
  }

  property("bottom-preserving, fertile, reachability-preserving") =
    forAll(trees) { t =>
      val p = Ivf.prune(t)
      val bottomOk = p.down.last.map(_._1) == t.down.last.map(_._1)
      val parentLevels = p.top.map(_._1) +: p.down.dropRight(1).map(_.map(_._1))
      val fertile = parentLevels.zip(p.down.map(_.map(_._2).toSet)).forall {
        case (ids, childParents) => ids.forall(childParents.contains)
      }
      bottomOk && fertile && reachableBottom(p) == reachableBottom(t)
    }
}
