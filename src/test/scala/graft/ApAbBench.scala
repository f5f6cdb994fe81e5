package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B harness for the AP loop kernel (round-9 tuning, not shipped in
  * the library): same box, same session, back-to-back — isolates the
  * window-vs-fused pass shape and the checkpoint cadence from this
  * box's 2-6× capacity swings. */
object ApAbBench {
  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val threads = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", (1 << 22).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ap.AffinityPropagation._

    val base = Tables.embeddings(spark, sfDir)
    val emb = (0 until 2)
      .map(r => base.select((col("vec_id") + lit(r * 1000000L)).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          when(i === 0, x + lit(r * 1e-3f)).otherwise(x)).as("embedding")))
      .reduce(_.unionByName(_))
      .repartition(threads)
    val offd = similarities(emb)
    val pref = preference(similarities(
      emb.orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(1000)))
    val init = initFrom(offd, emb, pref).localCheckpoint()
    println(s"init rows: ${init.count()}")

    def iterWindow(m: DataFrame): DataFrame =
      availabilityPass(responsibilityPass(m, 0.5), 0.5)
    def iterFused(m: DataFrame): DataFrame =
      availabilityPassFused(responsibilityPassFused(m, 0.5), 0.5)

    /** n iterations, materializing every `c`, releasing superseded. */
    def run(name: String, n: Int, c: Int, iter: DataFrame => DataFrame): Unit = {
      for (_ <- 1 to 2) {
        var msgs = init
        val t = time {
          var it = 0
          while (it < n) {
            val step = math.min(c, n - it)
            var cur = msgs
            val gens = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
            for (_ <- 1 to step) { cur = iter(cur).localCheckpoint(false); gens += cur }
            it += step
            cur.filter(col("i") === col("k")).filter(col("r") + col("a") > 0)
              .select(col("k")).collect()
            if (msgs ne init) Checkpoints.release(msgs)
            gens.dropRight(1).foreach(Checkpoints.release)
            msgs = cur
          }
          Checkpoints.release(msgs)
        }
        println(f"$name%-22s n=$n c=$c  ${t}%7.2f s  (${t / n}%6.3f s/iter)")
      }
    }

    run("window c=1 (r8 shape)", 4, 1, iterWindow)
    run("fused  c=1", 4, 1, iterFused)
    run("fused  c=5 (current)", 5, 5, iterFused)
    run("window c=5", 5, 5, iterWindow)
    spark.stop()
  }
}
