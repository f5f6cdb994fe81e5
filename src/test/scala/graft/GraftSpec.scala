package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The public facade ([[Graft]]) must produce the same rows as the
  * oracled query keys that bind the same kernels to the fixtures — run
  * here on inputs with RENAMED columns, so the column-name
  * parameterization (the part the query keys never exercise) is what's
  * actually under test.
  */
class GraftSpec extends SparkSuite {

  // fixture tables with caller-flavored column names
  private def myDocs: DataFrame =
    Tables.documents(spark, sf001)
      .select(col("doc_id").as("document_id"), col("text").as("body"))
  private def myEmb: DataFrame =
    Tables.embeddings(spark, sf001)
      .select(col("vec_id").as("item_id"), col("embedding").as("vec"))

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("exactDuplicates matches dedup_exact_hash on renamed columns") {
    val facade = rows(Graft.exactDuplicates(myDocs, "document_id", "body")
      .select(col("id"), col("n_copies")).orderBy("id"))
    val key = rows(SparkEntry.queries("dedup_exact_hash")(spark, sf001)
      .select(col("doc_id"), col("n_copies")).orderBy("doc_id"))
    assert(facade == key)
  }

  test("nearDupPairsExact matches dedup_jaccard") {
    val facade = rows(Graft.nearDupPairsExact(spark, myDocs, "document_id", "body")
      .orderBy("id_a", "id_b"))
    val key = rows(SparkEntry.queries("dedup_jaccard")(spark, sf001))
    assert(facade == key)
  }

  test("nearDupPairs (minhash LSH) matches dedup_minhash") {
    val facade = rows(Graft.nearDupPairs(spark, myDocs, "document_id", "body")
      .orderBy("id_a", "id_b"))
    val key = rows(SparkEntry.queries("dedup_minhash")(spark, sf001))
    assert(facade == key)
  }

  test("nearDupClusters matches dedup_cluster") {
    val facade = rows(Graft.nearDupClusters(spark, myDocs, "document_id", "body")
      .orderBy("id"))
    val key = rows(SparkEntry.queries("dedup_cluster")(spark, sf001))
    assert(facade == key)
  }

  test("similarTopKIvf matches simsearch_ivf") {
    val facade = rows(Graft.similarTopKIvf(spark, myEmb, 5, "item_id", "vec")
      .orderBy("i", "rnk"))
    val key = rows(SparkEntry.queries("simsearch_ivf")(spark, sf001))
    assert(facade == key)
  }

  test("quantizeInt8 matches emb_quantize") {
    val facade = rows(Graft.quantizeInt8(myEmb, "item_id", "vec").orderBy("vec_id"))
    val key = rows(SparkEntry.queries("emb_quantize")(spark, sf001))
    assert(facade == key)
  }

  test("cluster reproduces the pinned sf0.001 exemplar structure") {
    // FIXTURES.md pinned ground truth: 66 exemplars at sf0.001 with
    // pref = median; every point assigned, exemplars self-assigned.
    val assigned = Graft.cluster(spark, myEmb, "item_id", "vec")
    val n = Tables.embeddings(spark, sf001).count()
    assert(assigned.count() == n)
    val ex = assigned.filter(col("id") === col("exemplar")).count()
    assert(ex == 66L, s"expected 66 exemplars, got $ex")
  }

  test("profile matches profile_columns") {
    val facade = rows(Graft.profile(Tables.lineitem(spark, sf001),
      Seq("l_quantity", "l_extendedprice", "l_discount")).orderBy("col_name"))
    val key = rows(SparkEntry.queries("profile_columns")(spark, sf001))
    assert(facade == key)
  }
}
