package graft

import org.apache.spark.sql.functions._

/** Det fixed-point helpers — exactness properties (VERDICT r1 item 9). */
class DetSpec extends SparkSuite {

  test("cents is exact round-half-away over ±1e7 money values (both signs)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // n = exact cents in ±1e9; x = n/100.0 is the double the fixtures store
    val ns = Seq.fill(20000)(rnd.nextLong() % 1000000000L)
    val df = (ns ++ Seq(0L, 1L, -1L, 50L, -50L, 999999999L, -999999999L))
      .toDF("n").withColumn("x", col("n") / 100.0)
    val bad = df.withColumn("c", Det.cents(col("x")))
      .filter(col("c") =!= col("n")).count()
    assert(bad == 0L, s"$bad cents() mismatches")
  }

  test("fixedToDbl(sum(cents)) is bit-stable under re-partitioned aggregation order") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(5000)((rnd.nextLong() % 100000000L) / 100.0)
    val a = xs.toDF("x").repartition(1)
      .agg(Det.fixedToDbl(sum(Det.cents(col("x"))), 100)).head().getDouble(0)
    val b = xs.toDF("x").repartition(13)
      .agg(Det.fixedToDbl(sum(Det.cents(col("x"))), 100)).head().getDouble(0)
    assert(java.lang.Double.doubleToLongBits(a) == java.lang.Double.doubleToLongBits(b))
  }
}
