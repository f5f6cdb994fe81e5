package graft

import org.apache.spark.sql.SparkSession

/** One-off diagnosis (round-11): is a dereferenced `newSession()` child
  * collectable at all in this Spark build, and which library path pins
  * it? Drives the Ann.lastIndexCache weak-key design. */
object SessLeakProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf001 = "/root/testdata/sf0.001"

    def collected(mk: SparkSession => Unit, label: String): Unit = {
      var s2: SparkSession = spark.newSession()
      val ref = new java.lang.ref.WeakReference(s2)
      mk(s2)
      s2 = null
      SparkSession.setActiveSession(spark)
      var tries = 0
      while (ref.get() != null && tries < 100) {
        System.gc(); Thread.sleep(20); tries += 1
      }
      println(s"$label: collected=${ref.get() == null} after $tries gcs")
    }

    collected(_ => (), "bare newSession")
    collected(s2 => { s2.range(10).count(); () }, "newSession + range count")
    collected(s2 => { Tables.embeddings(s2, sf001).limit(16).count(); () },
      "newSession + Tables load")
    collected(s2 => {
      functions.Ann.topkCosine(s2, Tables.embeddings(s2, sf001).limit(16), 2).count()
      ()
    }, "newSession + topkCosine")
    spark.stop()
  }
}
