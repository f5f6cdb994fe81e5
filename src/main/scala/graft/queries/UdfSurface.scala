package graft.queries

import graft.{QueryGroup, Tables}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}

/** SURVEY §2.L — the user-extension surface: scalar Scala UDF, typed
  * Aggregator UDAF, and the Generator (UDTF) path. These demonstrate the
  * extension APIs; everything else in the engine deliberately stays on
  * codegen'd builtins (SURVEY §7.3).
  */
object UdfSurface extends QueryGroup {

  /** Scalar UDF: L2-normalize a vector (sequential fold norm, then one
    * IEEE division per element — bit-deterministic). */
  private val normalizeUdf = udf { (v: Seq[Double]) =>
    val norm = math.sqrt(v.foldLeft(0.0)((acc, x) => acc + x * x))
    // a zero vector has no direction: define its unit form as zeros —
    // 0/0 = NaN would flow into cast(long) as a silent 0 on the Spark
    // side while the oracle's CAST(floor(NaN)) hard-errors (round-12
    // review; the oracle mirrors this CASE)
    if (norm == 0.0) v.map(_ => 0.0) else v.map(_ / norm)
  }

  /** Typed Aggregator: elementwise vector mean — the centroid-shaped
    * reduction an AP/clustering pipeline needs as a UDAF. */
  object VecMean extends Aggregator[Seq[Double], (Long, Array[Double]), Seq[Double]] {
    def zero: (Long, Array[Double]) = (0L, Array.empty)
    def reduce(b: (Long, Array[Double]), v: Seq[Double]): (Long, Array[Double]) = {
      val s = if (b._2.isEmpty) new Array[Double](v.length) else b._2
      // fail loud on ragged input (house discipline — VecBinary, Pca.fit):
      // truncation or index errors here were silent or inscrutable
      require(v.length == s.length,
        s"vec_mean: ragged vectors (${v.length} vs ${s.length})")
      var i = 0
      while (i < v.length) { s(i) += v(i); i += 1 }
      (b._1 + 1, s)
    }
    def merge(x: (Long, Array[Double]), y: (Long, Array[Double])): (Long, Array[Double]) = {
      if (x._2.isEmpty) y
      else if (y._2.isEmpty) x
      else {
        require(x._2.length == y._2.length,
          s"vec_mean: ragged merge (${x._2.length} vs ${y._2.length})")
        var i = 0
        while (i < x._2.length) { x._2(i) += y._2(i); i += 1 }
        (x._1 + y._1, x._2)
      }
    }
    def finish(b: (Long, Array[Double])): Seq[Double] = b._2.map(_ / b._1).toSeq
    def bufferEncoder: Encoder[(Long, Array[Double])] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Array[Double])]()
    def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  def queries: Seq[(String, Q)] = Seq(
    // Registered scalar UDF path: unit-normalize each embedding, then
    // serialize to a flat string of 1e4-scaled integers (the driver's
    // comparator cannot hash list columns — round-1 lesson; round-4 then
    // floor(x·1e4 + 0.5) recovers the exact integer in both engines).
    "udf_scalar" -> ((s, dir) => {
      s.udf.register("vec_normalize", normalizeUdf)
      Tables.embeddings(s, dir)
        .select(col("vec_id"),
          transform(col("embedding"), _.cast("double")).as("v"))
        .select(col("vec_id"),
          concat_ws(",", transform(expr("vec_normalize(v)"),
            x => floor(round(x, 4) * 10000 + 0.5).cast("long").cast("string"))).as("unit_vec"))
        .orderBy("vec_id")
    }),

    // Typed Aggregator (UDAF) path: per-label centroid, flattened to
    // (label, pos, value) so the oracle can express it relationally.
    "udaf_aggregator" -> ((s, dir) => {
      s.udf.register("vec_mean", udaf(VecMean))
      Tables.embeddings(s, dir)
        .select(col("label"), transform(col("embedding"), _.cast("double")).as("v"))
        .groupBy("label").agg(expr("vec_mean(v)").as("centroid"))
        .select(col("label"), posexplode(col("centroid")).as(Seq("pos0", "value")))
        .select(col("label"), (col("pos0") + 1).cast("long").as("pos"),
          (round(col("value"), 4) + lit(0.0)).as("value"))
        .orderBy("label", "pos")
    }),

    // Generator (UDTF) path: explode vectors to (vec_id, pos, value)
    // rows — float→double is exact, so values are raw.
    "udtf_generator" -> ((s, dir) =>
      Tables.embeddings(s, dir)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos0", "value")))
        .select(col("vec_id"), (col("pos0") + 1).cast("long").as("pos"),
          col("value").cast("double").as("value"))
        .orderBy("vec_id", "pos"))
  )

  def oracles: Seq[(String, String)] = Seq(
    "udf_scalar" ->
      """SELECT vec_id,
        |  array_to_string(list_transform(embedding, x -> CAST(CAST(floor(round(
        |    CASE WHEN sqrt(list_aggregate(list_transform(embedding, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)), 'sum')) = 0 THEN CAST(0 AS DOUBLE)
        |         ELSE CAST(x AS DOUBLE) / sqrt(list_aggregate(list_transform(embedding, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)), 'sum')) END,
        |    4) * 10000 + 0.5) AS BIGINT) AS VARCHAR)), ',') AS unit_vec
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "udaf_aggregator" ->
      """SELECT label, pos, round(SUM(v) / COUNT(*), 4) + 0.0 AS value
        |FROM (
        |  SELECT label, generate_subscripts(embedding, 1) AS pos,
        |    CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings)
        |GROUP BY label, pos ORDER BY label, pos""".stripMargin,
    "udtf_generator" ->
      """SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
        |  CAST(unnest(embedding) AS DOUBLE) AS value
        |FROM embeddings ORDER BY vec_id, pos""".stripMargin
  )
}
