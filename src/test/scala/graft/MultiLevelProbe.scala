package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off validation + measurement (round 11): the MULTI-LEVEL IVF
  * assignment (Ivf.treeAssignments, c > MultiLevelThreshold) at a
  * production shape — clustered N = 200 000, d = 16, c = 8192 — against
  * the two-level form on the same input. Records, for BENCH_NOTES:
  * wall time of each assignment, sampled home agreement of each vs the
  * exact flat scan (512 hash-spread probes, driver-side), and the
  * isotropic-fixture guard behavior. Run with
  * `sbt "Test/runMain graft.MultiLevelProbe"`. */
object MultiLevelProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    graft.functions.VectorExprs.register(spark)

    val rnd = new scala.util.Random(42)
    val d = 16
    val nCenters = 2000
    val n = 200000
    val centers = Array.fill(nCenters)(Array.fill(d)(rnd.nextGaussian() * 10.0))
    val rows = (0 until n).map { i =>
      (i.toLong, centers(i % nCenters).map(_ + rnd.nextGaussian() * 0.3).toSeq)
    }
    val e = rows.toDF("vec_id", "v").repartition(16).cache()
    println(s"rows: ${e.count()}")
    val c = 8192
    val cents = graft.functions.Ivf.seeds(e, c, sampleN = 2 * c)
    println(s"centroids: ${cents.size}")
    val centArr = cents.map { case (id, v) => (id, v.toArray) }

    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val t = a(i) - b(i); s += t * t; i += 1 }
      s
    }
    def flatHome(q: Array[Double]): Long =
      centArr.minBy { case (id, v) => (d2(q, v), id) }._1
    val sample = e.select(col("vec_id"), col("v"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(512)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))

    def run(label: String, multiThreshold: Int): Unit = {
      val t0 = System.nanoTime()
      val homes = graft.functions.Ivf.assignments(e, cents, nprobe = 1,
          (v, cv) => call_function("vec_sqdist", v, cv),
          multiLevelThreshold = multiThreshold)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val t1 = System.nanoTime()
      val agree = sample.count { case (id, q) => homes.get(id).contains(flatHome(q)) }
      println(f"$label: ${(t1 - t0) / 1e9}%.2f s, " +
        f"sampled flat-home agreement ${agree.toDouble / sample.length}%.4f, rows=${homes.size}")
    }
    run("two-level (c=8192 forced onto sqrt-c supers)", Int.MaxValue)
    run("multi-level (b=64 tree, default dispatch)   ", graft.functions.Ivf.MultiLevelThreshold)
    spark.stop()
  }
}
