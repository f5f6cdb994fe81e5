package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off measurement (round 11): Lloyd refinement of the IVF coarse
  * quantizer at a production shape — N = 200,000, d = 32, auto centroid
  * count √(8N) ≈ 1265 (> TwoLevelThreshold, so BOTH the two-level
  * assignment and refinement engage on the real path). Cluster sizes
  * are deliberately SKEWED (cube-law over 1000 ground-truth clusters):
  * the uniform 300-cluster suite fixture showed occupancy variance
  * barely moves when every cluster is the same size — the balance
  * payoff refinement exists for is the density-VARYING corpus, which
  * is what production embeddings look like. Prints seed-vs-refined
  * occupancy skew (hot-bucket factor), quantization distortion, and
  * walls; numbers recorded in BENCH_NOTES §19. */
object IvfRefineProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    graft.functions.VectorExprs.register(spark)

    val n = 200000; val d = 32; val kTrue = 1000
    val pts = spark.range(n).as[Long].mapPartitions { it =>
      it.map { i =>
        val r = new scala.util.Random(i)
        // cube-law cluster pick: cluster 0 holds ~1.4% of points, the
        // tail thins out — a Zipf-ish density profile
        val cid = (math.pow(r.nextDouble(), 3.0) * kTrue).toInt
        val rc = new scala.util.Random(cid * 7919L + 13)
        val center = Array.fill(d)(rc.nextGaussian() * 10.0)
        (i, center.map(_ + r.nextGaussian() * 0.5).toSeq)
      }
    }.toDF("vec_id", "v").cache()
    pts.count()

    val c = graft.functions.Ivf.autoCentroids(n)
    println(s"N=$n d=$d trueClusters=$kTrue autoCentroids=$c")

    val t0 = System.nanoTime()
    val seeds = graft.functions.Ivf.seeds(pts, c, sampleN = math.max(256, 2 * c))
    val t1 = System.nanoTime()
    val refined = graft.functions.Ivf.refine(pts, seeds)
    val t2 = System.nanoTime()
    println(f"seeds: ${(t1 - t0) / 1e9}%.1f s; refine (2 iters): ${(t2 - t1) / 1e9}%.1f s")

    def stats(cents: Seq[(Long, Seq[Double])], label: String): Unit = {
      // exact (flat) homes so the comparison isn't confounded by the
      // two-level approximation; distortion via the assignment distance
      val homes = graft.functions.Ivf.assignments(pts, cents, nprobe = 1,
          (v, cv) => call_function("vec_sqdist", v, cv),
          twoLevelThreshold = Int.MaxValue)
        .join(pts, "vec_id")
      val cdf = cents.toDF("c_id", "cv")
      val agg = homes.join(broadcast(cdf), "c_id")
        .select(col("c_id"), call_function("vec_sqdist", col("v"), col("cv")).as("d2"))
        .groupBy("c_id").agg(count(lit(1)).as("occ"), sum("d2").as("sd2"))
        .agg(max("occ").as("maxOcc"), sum("occ").as("nPts"),
          sum("sd2").as("totD2"), count(lit(1)).as("nonEmpty"))
        .head()
      val maxOcc = agg.getLong(0); val nPts = agg.getLong(1)
      val totD2 = agg.getDouble(2); val nonEmpty = agg.getLong(3)
      println(f"$label: hot-bucket factor ${maxOcc / (nPts.toDouble / cents.size)}%.1f " +
        f"(max $maxOcc vs mean ${nPts.toDouble / cents.size}%.0f), " +
        f"distortion ${totD2 / nPts}%.2f, ${cents.size - nonEmpty} empty buckets")
    }
    stats(seeds, "farthest-point seeds")
    stats(refined, "refined (Lloyd x2)  ")

    // the real large-c build end-to-end (two-level + refine on the
    // production path), for the wall-clock context
    val t3 = System.nanoTime()
    val edges = ap.AffinityPropagation.sparseSimilarities(pts.select(
      col("vec_id"), col("v").as("embedding")), m = 20).count()
    val t4 = System.nanoTime()
    println(f"sparseSimilarities m=20 full build: $edges edges in ${(t4 - t3) / 1e9}%.1f s")
    spark.stop()
  }
}
