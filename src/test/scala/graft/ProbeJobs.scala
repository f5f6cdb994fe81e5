package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Dev tool (round-21 optimization): per-JOB decomposition of the two
  * ingest-dedup bench rows — the §36 floor decomposition said "~68
  * jobs/batch, dispatch-bound", so the optimization lever is the JOB
  * COUNT, and this probe attributes every job to the transaction phase
  * that dispatched it (via setJobDescription around each phase, plus
  * the listener's callSite fallback). Usage:
  *   runMain graft.ProbeJobs lex|sem [sfDir]
  * Prints one line per job (id, duration, description) and a per-phase
  * rollup. Bench-methodology-free: this is a diagnostic, not a record. */
object ProbeJobs {

  private final class JobLog extends SparkListener {
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val done = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val execs = new java.util.concurrent.ConcurrentHashMap[Long, String]()
    override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
      e match {
        case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
          execs.put(s.executionId, s.details.takeWhile(_ != '\n')); ()
        case _ => ()
      }
    override def onJobStart(js: SparkListenerJobStart): Unit = {
      val phase = Option(js.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description")))
        .getOrElse("?")
      val execId = Option(js.properties)
        .flatMap(p => Option(p.getProperty("spark.sql.execution.root.id"))
          .orElse(Option(p.getProperty("spark.sql.execution.id"))))
        .getOrElse("-")
      val nstages = js.stageInfos.size
      jobs.put(js.jobId, (s"$phase | s=$nstages | x=$execId", js.time)); ()
    }
    override def onJobEnd(je: SparkListenerJobEnd): Unit = {
      done.put(je.jobId, je.time); ()
    }
  }

  def main(args: Array[String]): Unit = {
    val mode = if (args.nonEmpty) args(0) else "lex"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val log = new JobLog
    spark.sparkContext.addSparkListener(log)

    val t = java.nio.file.Files.createTempDirectory(s"graft-probe-$mode").toString
    def timed(label: String)(f: => Unit): Unit = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime(); f
      println(f"phase $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      spark.sparkContext.setJobDescription(null)
    }

    if (mode == "lex") {
      val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      val seed = docs.filter(col("doc_id") % 2 === 0).localCheckpoint()
      val parts = (0 until 4)
        .map(r => docs.filter(col("doc_id") % 8 === 2 * r + 1).localCheckpoint())
      timed("seed")(graft.streaming.Streams.initDedupCorpus(seed, t))
      parts.zipWithIndex.foreach { case (p, i) =>
        timed(s"batch$i") {
          graft.streaming.Streams.applyDedupBatch(p, i.toLong, t); ()
        }
      }
    } else {
      val emb = Tables.embeddings(spark, sfDir)
        .select(col("vec_id").as("doc_id"), col("embedding"))
      val seed = emb.filter(col("doc_id") % 2 === 0).localCheckpoint()
      val parts = (0 until 2)
        .map(r => emb.filter(col("doc_id") % 4 === 2 * r + 1).localCheckpoint())
      timed("seed")(graft.streaming.Streams.initSemanticDedupCorpus(seed, t))
      parts.zipWithIndex.foreach { case (p, i) =>
        timed(s"batch$i") {
          graft.streaming.Streams.applySemanticDedupBatch(p, i.toLong, t); ()
        }
      }
    }
    Thread.sleep(2000) // let the listener bus drain
    import scala.jdk.CollectionConverters._
    val rows = log.jobs.asScala.toSeq.sortBy(_._1).map { case (id, (desc, t0)) =>
      val dur = log.done.asScala.get(id).map(t1 => (t1 - t0).toDouble).getOrElse(-1.0)
      (id, desc, dur)
    }
    println("---- jobs ----")
    rows.foreach { case (id, desc, ms) =>
      println(f"job $id%4d  $ms%9.1f ms  $desc")
    }
    println("---- per-phase rollup ----")
    rows.groupBy(_._2.takeWhile(_ != '|').trim).toSeq
      .map { case (ph, js) => (ph, js.size, js.map(_._3).sum) }
      .sortBy(-_._3)
      .foreach { case (ph, n, ms) => println(f"$ph%-12s jobs=$n%4d  total=${ms / 1000}%8.3f s") }
    println("---- per-execution rollup (batch0/batch1 only) ----")
    rows.filter(r => r._2.startsWith("batch0") || r._2.startsWith("batch1"))
      .groupBy(_._2.split("x=").last.trim).toSeq
      .map { case (x, js) =>
        val root = scala.util.Try(x.toLong).toOption
          .flatMap(i => Option(log.execs.get(i))).getOrElse("?")
        (x, js.size, js.map(_._3).sum, js.head._2.takeWhile(_ != '|').trim, root)
      }
      .sortBy(r => scala.util.Try(r._1.toDouble).getOrElse(-1.0))
      .foreach { case (x, n, ms, ph, root) =>
        println(f"x=$x%4s $ph%-8s jobs=$n%3d total=${ms / 1000}%7.3f s  $root") }
    graft.MarkerStore.fs(spark, t)
      .delete(new org.apache.hadoop.fs.Path(t), true)
    spark.stop()
  }
}
