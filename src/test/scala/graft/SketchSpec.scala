package graft

import org.apache.spark.sql.functions._

/** D3-exempt operators validated against their exact counterparts
  * (SURVEY §5): MinHash-LSH vs exact Jaccard, IVF vs brute-force kNN,
  * HLL vs exact distinct. Data and seeds are fixed, so these outcomes
  * are deterministic. */
class SketchSpec extends SparkSuite {

  test("minhash candidates recall high-jaccard pairs") {
    val exact = SparkEntry.queries("dedup_jaccard")(spark, sf001)
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = SparkEntry.queries("dedup_minhash")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    if (exact.nonEmpty) {
      val recall = exact.count(cand).toDouble / exact.size
      // 8 bands × 4 rows: P(candidate | j=0.5) ≈ 0.40 — assert a floor
      // well under the expectation so the pinned-seed outcome is stable.
      assert(recall >= 0.2, s"recall $recall over ${exact.size} exact pairs")
    } else {
      info("no exact pairs with jaccard ≥ 0.5 at sf0.001; candidates=" + cand.size)
    }
  }

  test("IVF ANN achieves reasonable recall vs brute force") {
    val exact = SparkEntry.queries("simsearch_topk")(spark, sf001)
      .select("i", "k").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = SparkEntry.queries("simsearch_ivf")(spark, sf001)
      .select("i", "k").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(approx).toDouble / exact.size
    assert(recall >= 0.3, s"IVF recall@5 = $recall")
  }

  test("approx_count_distinct is within rsd bounds of exact") {
    val approx = SparkEntry.queries("agg_approx_distinct")(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sf001)
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, n) =>
      assert(math.abs(approx(t) - n) <= math.max(2, (n * 0.1).toLong),
        s"$t: approx=${approx(t)} exact=$n")
    }
  }
}
