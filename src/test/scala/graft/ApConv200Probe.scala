package graft

/** One-off kernel probe (round 11): which damping rung settles a
  * 100-WAY replica election? The ap_dist fixture at N=200,000 would be
  * R=100 perturbed replicas of the 2000 sf0.1 base points; before
  * paying distributed ladder walls, reproduce the election geometry at
  * kernel size (8 base points × 100 replicas, same r·1e-3 dim-0
  * shifts) and walk λ ∈ {0.5, 0.7, 0.8, 0.9}. The winning rung seeds
  * the distributed run's ladder order. */
object ApConv200Probe {
  def main(args: Array[String]): Unit = {
    def fixture(reps: Int): (Array[Long], Array[Array[Double]]) = {
      val ids = Array.newBuilder[Long]
      val xs = Array.newBuilder[Array[Double]]
      for (b <- 0 until 8; r <- 0 until reps) {
        ids += b * 1000000L + r
        xs += Array((b % 4) * 10.0 + r * 1e-3, (b / 4) * 10.0)
      }
      (ids.result(), xs.result())
    }
    val (ids, xs) = fixture(100)
    for (lam <- Seq(0.5, 0.7, 0.8, 0.9)) {
      val t0 = System.nanoTime()
      val r = graft.ap.LocalAP.run(ids, xs, damping = lam)
      val groups = r.exemplars.map(_ / 1000000L)
      println(f"lambda=$lam%.1f converged=${r.converged} iters=${r.iterations} " +
        f"exemplars=${r.exemplars.size} groupsCovered=${groups.size} " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
  }
}
