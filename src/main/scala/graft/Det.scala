package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism helpers enforcing SURVEY §2.0 rules D1–D6 so Spark results
  * hash-match the DuckDB oracle bit-for-bit.
  *
  * D2 float discipline: double SUM/AVG aggregate order is engine-dependent,
  * so aggregate over DECIMAL(38,6) (exact, associative in both engines) and
  * convert the exact decimal result to double at the end (both engines
  * round-to-nearest identically). Non-associative stats get ROUND(x, 4).
  */
object Det {
  /** Cast to the shared exact decimal type before an additive aggregate.
    * Precision 18 (not 38): a product of two DECIMAL(18,6) is (37,12),
    * which both engines hold exactly; with (38,6) inputs Spark overflows
    * precision 38 and silently rounds products back to scale 6 while
    * DuckDB keeps scale 12 → hash mismatch. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 6))

  /** Final exact-aggregate type. DuckDB's DECIMAL→DOUBLE cast is NOT
    * correctly rounded (int128 scaled by a double power of ten), while
    * Spark's BigDecimal→double is — so exact aggregates must STAY decimal
    * in the result, normalized to (38,6) in both engines. */
  def outDec(c: Column): Column = c.cast(DecimalType(38, 6))

  /** Exact-sum of a double column: CAST(SUM(CAST AS DEC(18,6)) AS DEC(38,6)). */
  def sumd(c: Column): Column = outDec(sum(dec(c)))

  /** Avg of a double column as ROUND(double(sum)/count, 4). Spark's
    * AVG(DECIMAL) truncates to scale+4 and DuckDB's decimal→double cast is
    * sloppy (≤2 ulp), so divide-then-round-to-4 absorbs both. Oracle:
    * ROUND(CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)/COUNT(x), 4). */
  def avgd(c: Column): Column = round(sum(dec(c)).cast("double") / count(c), 4)

  /** Round to 4 places — for non-associative float stats (D2b). */
  def r4(c: Column): Column = round(c, 4)

  // ---- exact fixed-point fast path ----------------------------------
  // The generated money columns are exact 2-decimal values stored as
  // doubles (max |x·100 − round(x·100)| ≈ 1e-9, measured at sf0.01/0.1).
  // Summing them as integer cents is exact, associative, and stays in
  // whole-stage codegen on longs — ~2.5× faster than Spark's
  // BigDecimal-backed decimal aggregation — and converts to the same
  // DECIMAL(38,6) the oracle computes. Overflow headroom: |cents| ≤ 1e9
  // per row leaves ~1e9 rows per partition-sum before 2^63; beyond that
  // scale, switch the call site back to sumd (decimal) or pre-aggregate.

  /** Exact integer cents of a 2-decimal money column. The +0.5/truncate
    * form (valid for the non-negative fixture values) stays in codegen
    * arithmetic — Spark's round() allocates a BigDecimal per row. */
  def cents(c: Column): Column = (c * 100 + 0.5).cast("long")

  /** Long fixed-point aggregate (in units of 1/divisor) → DECIMAL(38,6).
    * The decimal division is exact (scale widens then trims). */
  def fixedToDec(sumUnits: Column, divisor: Int): Column =
    outDec(sumUnits.cast(DecimalType(38, 6)) / lit(divisor).cast(DecimalType(9, 0)))

  /** Exact-sum of a 2-decimal money column via integer cents. */
  def sumd2(c: Column): Column = fixedToDec(sum(cents(c)), 100)

  /** Avg of a 2-decimal money column, ROUND(·, 4) like avgd. */
  def avgd2(c: Column): Column =
    round(sum(cents(c)).cast("double") / 100 / count(c), 4)

  /** Round to 6 places — similarity values (SURVEY §2.J). */
  def r6(c: Column): Column = round(c, 6)

  /** Canonical unique lineitem key. (l_orderkey, l_linenumber) is NOT
    * unique in the driver-generated data (45 832 distinct of 60 000 rows
    * at sf0.01, measured) — any total order over lineitem must use all
    * five of these (verified unique at sf0.01 and sf0.1). */
  val liKey: Seq[String] =
    Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_extendedprice")
  val liKeySql: String = liKey.mkString(", ")
}
