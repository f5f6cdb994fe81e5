package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnosis (round-10 VERDICT #3): sparse vs dense exemplar
  * counts on the SAME N=2000 input (sf0.1 embeddings — no replicas). */
object SparseRateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, sfDir)
    println(s"N = ${emb.count()}")

    val t0 = System.nanoTime()
    val dense = ap.AffinityPropagation.runLocal(spark, emb)
    println(f"dense local: converged=${dense.converged} iters=${dense.iterations} " +
      f"exemplars=${dense.exemplars.size} in ${(System.nanoTime() - t0) / 1e9}%.1f s")

    val t1 = System.nanoTime()
    val sparseExact = ap.AffinityPropagation.run(spark, emb,
      neighbors = Some(50), knnExact = true)
    println(f"sparse exact m=50: converged=${sparseExact.converged} " +
      f"iters=${sparseExact.iterations} exemplars=${sparseExact.exemplars.size} " +
      f"in ${(System.nanoTime() - t1) / 1e9}%.1f s")

    val t2 = System.nanoTime()
    val sparseBucket = ap.AffinityPropagation.run(spark, emb, neighbors = Some(50))
    println(f"sparse bucketed m=50: converged=${sparseBucket.converged} " +
      f"iters=${sparseBucket.iterations} exemplars=${sparseBucket.exemplars.size} " +
      f"in ${(System.nanoTime() - t2) / 1e9}%.1f s")
    spark.stop()
  }
}
