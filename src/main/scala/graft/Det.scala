package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism helpers enforcing SURVEY §2.0 rules D1–D6 so Spark results
  * hash-match the DuckDB oracle bit-for-bit.
  *
  * D2 float discipline: double SUM/AVG aggregate order is engine-dependent,
  * so additive money aggregates run over exact integer units (cents) —
  * associative in any order — and the final value is exposed as a DOUBLE
  * via one long→double cast and one IEEE division, both correctly rounded
  * in Spark and DuckDB, so result bits are identical. (DECIMAL(38,6)
  * outputs are avoided entirely: rows/values compare equal but the
  * driver's hash sees engine-specific decimal encodings — round-1 lesson,
  * 9 keys.) Non-associative stats get ROUND(x, 4).
  */
object Det {
  /** Cast to the shared exact decimal type before an additive aggregate.
    * Precision 18 (not 38): a product of two DECIMAL(18,6) is (37,12),
    * which both engines hold exactly; with (38,6) inputs Spark overflows
    * precision 38 and silently rounds products back to scale 6 while
    * DuckDB keeps scale 12 → hash mismatch. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 6))

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

  /** Exact integer cents of a 2-decimal money column, round half away
    * from zero (sign-aware — the naive +0.5/truncate form is wrong for
    * negative values). Both branches stay in codegen arithmetic —
    * Spark's round() allocates a BigDecimal per row. Oracle mirror:
    * [[centsSql]] (DuckDB round() is also half-away-from-zero). */
  def cents(c: Column): Column =
    when(c >= 0, c * 100 + 0.5).otherwise(c * 100 - 0.5).cast("long")

  /** DuckDB SQL mirror of [[cents]]. */
  def centsSql(col: String): String = s"CAST(round($col * 100, 0) AS BIGINT)"

  /** Long fixed-point aggregate (in units of 1/divisor) → DOUBLE.
    * long→double is correctly rounded, and the single IEEE division is
    * correctly rounded in both engines, so the result bits are identical.
    * Headroom (round-2 ADVICE): plain cent sums are ≲1e13 per group even
    * at sf10, but the 1e-4-unit disc-price path sums cents·(100−cents)
    * ≈ 3.6e8 per row — ~5e15 per sf10 group, already past 2^53 (the
    * long→double cast stops being exact, though both engines round the
    * SAME long identically, so parity holds until 2^63). Near 2^63 the
    * engines DIVERGE: Spark's non-ANSI sum(long) wraps silently while
    * DuckDB raises on its HUGEINT→BIGINT cast. Past ~1e3× that scale,
    * switch the call site to decimal aggregation (dec/avgd) or
    * pre-aggregate per partition key; [[graft.Verify]] runs the oracle
    * compare that would catch a wrapped sum as a hash mismatch. Oracle
    * mirror: CAST(SUM(units) AS BIGINT) / <divisor>.0 — the explicit
    * BIGINT cast collapses DuckDB's HUGEINT sum before its double cast. */
  def fixedToDbl(sumUnits: Column, divisor: Int): Column =
    sumUnits.cast("double") / lit(divisor).cast("double")

  /** Exact-sum of a 2-decimal money column via integer cents. */
  def sumd2(c: Column): Column = fixedToDbl(sum(cents(c)), 100)

  /** THE discounted-revenue fixed point — price·(1−disc) in integer
    * 1e-4 units, as cents(price)·(100 − cents(disc)). One definition
    * (round-12 review: this expression was hand-duplicated across
    * agg_groupby, topkGlobal, orderkeyRevPlan, and two oracle strings —
    * the exact drift class Det exists to prevent). Sum with sum(·) and
    * convert via [[fixedToDbl]](·, 10000); headroom discussion above. */
  def discUnits(price: Column, disc: Column): Column =
    cents(price) * (lit(100L) - cents(disc))

  /** SQL mirror of [[discUnits]]. */
  def discUnitsSql(price: String, disc: String): String =
    s"${centsSql(price)} * (100 - ${centsSql(disc)})"

  /** SQL mirror of [[sumd2]]. The divisor is CAST(100 AS DOUBLE), not the
    * literal 100.0: Spark parses a decimal literal and would produce a
    * DECIMAL division (AgreementSpec runs these strings in Spark too),
    * while the explicit double is a double division in every dialect. */
  def sumd2Sql(col: String): String =
    s"(CAST(SUM(${centsSql(col)}) AS BIGINT) / CAST(100 AS DOUBLE))"

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
