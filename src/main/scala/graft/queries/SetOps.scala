package graft.queries

import graft.{QueryGroup, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY §2.G — set operations over two order subsets:
  * A = status 'F' orders, B = orders with totalprice > 200000. */
object SetOps extends QueryGroup {

  private def subsetA(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_custkey")

  private def subsetB(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).filter(col("o_totalprice") > 200000)
      .select("o_orderkey", "o_custkey")

  private val sqlA = "SELECT o_orderkey, o_custkey FROM orders WHERE o_orderstatus = 'F'"
  private val sqlB = "SELECT o_orderkey, o_custkey FROM orders WHERE o_totalprice > 200000"

  def queries: Seq[(String, Q)] = Seq(
    // Bag union — duplicates across branches kept, disambiguated by a
    // source tag so the sort key set stays unique (D1).
    "set_union_all" -> ((s, dir) =>
      subsetA(s, dir).withColumn("src", lit("a"))
        .unionAll(subsetB(s, dir).withColumn("src", lit("b")))
        .orderBy("o_orderkey", "src")),

    "set_union_distinct" -> ((s, dir) =>
      subsetA(s, dir).union(subsetB(s, dir)).distinct()
        .orderBy("o_orderkey")),

    "set_intersect" -> ((s, dir) =>
      subsetA(s, dir).intersect(subsetB(s, dir))
        .orderBy("o_orderkey")),

    "set_except" -> ((s, dir) =>
      subsetA(s, dir).except(subsetB(s, dir))
        .orderBy("o_orderkey")),

    // Bag (multiset) semantics — projected to o_custkey so each side
    // genuinely carries duplicates (o_orderkey is unique, custkey isn't):
    // intersectAll keeps min(countA, countB) copies per key, exceptAll
    // keeps countA − countB. Duplicate output rows are identical, so D1
    // holds under any tie order.
    "set_intersect_all" -> ((s, dir) =>
      subsetA(s, dir).select("o_custkey")
        .intersectAll(subsetB(s, dir).select("o_custkey"))
        .orderBy("o_custkey")),

    "set_except_all" -> ((s, dir) =>
      subsetA(s, dir).select("o_custkey")
        .exceptAll(subsetB(s, dir).select("o_custkey"))
        .orderBy("o_custkey"))
  )

  def oracles: Seq[(String, String)] = Seq(
    "set_union_all" ->
      s"""SELECT * FROM (
         |  SELECT o_orderkey, o_custkey, 'a' AS src FROM ($sqlA)
         |  UNION ALL
         |  SELECT o_orderkey, o_custkey, 'b' AS src FROM ($sqlB))
         |ORDER BY o_orderkey, src""".stripMargin,
    "set_union_distinct" ->
      s"SELECT * FROM (($sqlA) UNION ($sqlB)) ORDER BY o_orderkey",
    "set_intersect" ->
      s"SELECT * FROM (($sqlA) INTERSECT ($sqlB)) ORDER BY o_orderkey",
    "set_except" ->
      s"SELECT * FROM (($sqlA) EXCEPT ($sqlB)) ORDER BY o_orderkey",
    "set_intersect_all" ->
      s"""SELECT * FROM (
         |  (SELECT o_custkey FROM ($sqlA)) INTERSECT ALL (SELECT o_custkey FROM ($sqlB)))
         |ORDER BY o_custkey""".stripMargin,
    "set_except_all" ->
      s"""SELECT * FROM (
         |  (SELECT o_custkey FROM ($sqlA)) EXCEPT ALL (SELECT o_custkey FROM ($sqlB)))
         |ORDER BY o_custkey""".stripMargin
  )
}
