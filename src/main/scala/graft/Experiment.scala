package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch dev main for isolating query-cost components. */
object Experiment {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4194304")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Any): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); f
        if (i == 3) println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    val l = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    t("scan count")(l.count())
    t("scan agg double")(l.agg(sum(col("l_extendedprice"))).collect())
    t("scan agg dec18")(l.agg(sum(col("l_extendedprice").cast("decimal(18,6)"))).collect())
    t("scan agg dec product")(l.agg(sum(col("l_extendedprice").cast("decimal(18,6)") * (lit(1).cast("decimal(18,6)") - col("l_discount").cast("decimal(18,6)")))).collect())
    val dim = broadcast(o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .select(col("o_orderkey"), col("c_custkey"), col("c_name")))
    t("join only")(l.join(dim, l("l_orderkey") === dim("o_orderkey")).count())
    t("join+agg double")(
      l.join(dim, l("l_orderkey") === dim("o_orderkey"))
        .groupBy("c_custkey", "c_name")
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("r"))
        .orderBy(col("r").desc, col("c_custkey")).limit(10).collect())
    t("join+agg decimal")(
      l.join(dim, l("l_orderkey") === dim("o_orderkey"))
        .groupBy("c_custkey", "c_name")
        .agg(sum(col("l_extendedprice").cast("decimal(18,6)") * (lit(1).cast("decimal(18,6)") - col("l_discount").cast("decimal(18,6)"))).as("r"))
        .orderBy(col("r").desc, col("c_custkey")).limit(10).collect())
    spark.stop()
  }
}
