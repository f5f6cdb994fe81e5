package graft

/** SURVEY §5.2 item 3 — SQL/DataFrame agreement: every oracle SQL string
  * that also parses and runs in Spark must agree with the DataFrame
  * build. DuckDB-only dialect (list_*, QUALIFY, json_extract_string,
  * time_bucket, …) fails to parse in Spark and is skipped; keys whose
  * oracle intentionally compensates for a dialect delta (e.g. fn_date's
  * dayofweek+1) are excluded. */
class AgreementSpec extends SparkSuite {

  // join_partition_dpp: DuckDB dayofweek is 0-6 (Sun=0), Spark's 1-7 —
  // the oracle compensates in DuckDB's dialect, so it must not run here.
  private val dialectCompensated = Set("fn_date", "join_partition_dpp")

  test("Spark-parseable oracle SQL agrees with the DataFrame builds") {
    Tables.names.foreach(n =>
      Tables.load(spark, sf001, n).createOrReplaceTempView(n))
    var checked = 0
    val disagreements = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (key, _) if dialectCompensated(key) => None
      case (key, sql) =>
        val viaSql =
          try Some(spark.sql(sql).collect().map(_.toString).toSeq)
          catch { case _: Throwable => None }
        viaSql.flatMap { sqlRows =>
          checked += 1
          val dfRows = SparkEntry.queries(key)(spark, sf001)
            .collect().map(_.toString).toSeq
          if (sqlRows == dfRows) None
          else Some(s"$key: sql=${sqlRows.size} rows, df=${dfRows.size} rows, " +
            s"first diff: ${sqlRows.zip(dfRows).find(p => p._1 != p._2)}")
        }
    }
    info(s"checked $checked Spark-parseable oracle strings")
    assert(checked >= 25, s"only $checked oracle strings parsed in Spark")
    assert(disagreements.isEmpty, disagreements.mkString("\n"))
  }
}
