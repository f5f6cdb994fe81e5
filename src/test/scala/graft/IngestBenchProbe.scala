package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** One-off decomposition probe for the `ingest_dedup_lex_b4` bench row
  * (BENCH_NOTES §36): per-batch wall time of the store-backed
  * [[graft.streaming.Streams.applyDedupBatch]] replay at sf0.1, plus
  * the per-batch Spark JOB count (a registered listener) and the
  * dispatch floor — so the record can say how much of a batch is job
  * dispatch versus kernel work before anyone cries regression.
  * Run: `Test/runMain graft.IngestBenchProbe`. */
object IngestBenchProbe {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicLong()
    val sites = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          val site = js.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n'))
            .getOrElse("?")
          sites.merge(site, 1L, (a, b) => a + b)
          ()
        }
      })
    val sfDir = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val seed = docs.filter(col("doc_id") % 2 === 0).localCheckpoint()
    val parts = (0 until 4)
      .map(r => docs.filter(col("doc_id") % 8 === 2 * r + 1).localCheckpoint())
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val floor = (1 to 5).map(_ => time(seed.count())).min
    (1 to 2).foreach { pass =>
      val t = java.nio.file.Files
        .createTempDirectory("graft-ingest-probe").toString
      val seedSec = time(graft.streaming.Streams.initDedupCorpus(seed, t))
      val rows = parts.zipWithIndex.map { case (p, i) =>
        val j0 = jobs.get()
        val sec = time {
          graft.streaming.Streams.applyDedupBatch(p, i.toLong, t); ()
        }
        (i, sec, jobs.get() - j0)
      }
      println(f"pass $pass seed=$seedSec%.2f floor=$floor%.4f " +
        rows.map { case (i, s, j) => f"b$i=$s%.2f/${j}j" }.mkString(" "))
      if (pass == 2) {
        import scala.jdk.CollectionConverters._
        println("job callsites: " + sites.asScala.toSeq.sortBy(-_._2)
          .map { case (k, v) => s"$k=$v" }.mkString(", "))
      }
      MarkerStore.fs(spark, t).delete(new org.apache.hadoop.fs.Path(t), true)
    }
    spark.stop()
  }
}
