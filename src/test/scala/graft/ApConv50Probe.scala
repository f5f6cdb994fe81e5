package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnosis (round 11): the ap_dist N=50,000 converged run
  * (25 perturbed replicas of the sf0.1 embeddings, m=50) fails the
  * classic λ=0.5 / maxIter=200 stopping rule even jittered — the 2000
  * replica micro-clusters each hold a 25-way exemplar election and the
  * set never sits still for 15 consecutive iterations. This probe walks
  * [FD07]'s documented oscillation remedy (raise the damping factor)
  * to find the cheapest settings that converge, so Bench.apDist's
  * converged-run ladder can encode them with measurements rather than
  * guesses. */
object ApConv50Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val threads = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = Tables.embeddings(spark, sfDir)
    def emb(replicas: Int) = (0 until replicas)
      .map(r => base.select((col("vec_id") + lit(r * 1000000L)).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          when(i === 0, x + lit(r * 1e-3f)).otherwise(x)).as("embedding")))
      .reduce(_.unionByName(_))
      .repartition(threads)
    val e = emb(25)
    val ladder = Seq[(Double, Int, Double)](
      (0.7, 300, 0.0), (0.9, 400, 0.0), (0.9, 400, 1e-6))
    var done = false
    for ((lam, mi, j) <- ladder if !done) {
      val t0 = System.nanoTime()
      val r = ap.AffinityPropagation.run(spark, e,
        damping = lam, maxIter = mi, neighbors = Some(50), jitter = j)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"PROBE lambda=$lam maxIter=$mi jitter=$j%.0e: " +
        f"converged=${r.converged} iters=${r.iterations} " +
        f"exemplars=${r.exemplars.size} sec=$sec%.1f")
      done = r.converged
    }
    spark.stop()
  }
}
