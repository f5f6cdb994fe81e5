package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional trailing key names restrict the dump (dev iteration);
    // the driver's two-arg call dumps everything
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args.drop(2).toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // write INT64 micros (not INT96) so any parquet reader sees the
      // same timestamp type DuckDB produces for the oracle side
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Timestamps leave as TIMESTAMP_NTZ micros: under the UTC session the
    // wall-clock value is unchanged, and every parquet reader (DuckDB,
    // pyarrow) then sees the exact type the DuckDB oracle produces —
    // Spark's INT96/adjusted-UTC defaults read back as ns or timestamptz
    // and trip type-sensitive comparators.
    def ntz(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      import org.apache.spark.sql.functions.col
      import org.apache.spark.sql.types.TimestampType
      df.select(df.schema.fields.map { f =>
        if (f.dataType == TimestampType) col(f.name).cast("timestamp_ntz").as(f.name)
        else col(f.name)
      }.toIndexedSeq: _*)
    }
    // Delete a key's previous dump BEFORE attempting it: a query that
    // throws used to leave the prior run's parquet in place, and a
    // reused outDir then let a REGRESSED query pass the compare against
    // its own stale results (round-12 review). A failure now leaves the
    // key's path absent — a loud missing-output, never a stale pass.
    def deleteRecursively(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
      f.delete(); ()
    }
    SparkEntry.queries.foreach { case (name, fn) =>
      if (only.forall(_.contains(name))) {
        deleteRecursively(new java.io.File(s"$outDir/$name"))
        try ntz(fn(spark, sfDir)).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
