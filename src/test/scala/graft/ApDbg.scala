package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnosis: convergence behavior of the sf0.1 200-vec prefix
  * under check cadences (round-9) and loop-partition widths (round-11:
  * the 40 k-row shape is scheduling-bound — how much of the per-iter
  * cost is task count?). */
object ApDbg {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb200 = Tables.embeddings(spark, sfDir).orderBy("vec_id").limit(200)
    for (rep <- 1 to 3; p <- Seq(8, 4, 2, 1)) {
      spark.conf.set("spark.graft.ap.loopPartitions", p.toString)
      val t0 = System.nanoTime()
      val r = ap.AffinityPropagation.run(spark, emb200, checkEvery = 5)
      val t = (System.nanoTime() - t0) / 1e9
      println(f"rep=$rep loopParts=$p: converged=${r.converged} iters=${r.iterations} " +
        f"exemplars=${r.exemplars.size} in $t%.2f s")
    }
    spark.conf.unset("spark.graft.ap.loopPartitions")
    // per-iteration exemplar-set trace around the r8 convergence point
    val loc = ap.LocalAP.run(
      emb200.select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
        .orderBy("vec_id").collect().map(_.getLong(0)),
      emb200.select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
        .orderBy("vec_id").collect().map(_.getSeq[Double](1).toArray))
    println(s"local kernel: converged=${loc.converged} iters=${loc.iterations} " +
      s"exemplars=${loc.exemplars.size}")
    spark.stop()
  }
}
