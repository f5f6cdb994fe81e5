package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for vector math (SURVEY §4.4 ladder:
  * builtin HOFs → native Expression → kernel). The zip_with+aggregate
  * builtin form allocates an intermediate array per row; these generate a
  * primitive accumulation loop inside whole-stage codegen instead. The
  * loop is the same left-to-right fold as the builtin and the DuckDB
  * oracle formulation, so values stay bit-identical.
  *
  * Input discipline (round-12 review — both are session-registered for
  * arbitrary SQL use, so misuse is user-reachable):
  *   - non-array<double> children fail at ANALYSIS (checkInputDataTypes)
  *     instead of reinterpreting int storage at double strides (silent
  *     garbage) or class-cast-crashing; the SQL registration wraps the
  *     arguments in a Cast to array<double>, so `vec_dot(array(1,2), …)`
  *     still coerces like the builtin HOFs would;
  *   - RAGGED inputs fail loud with the lengths in the message — the
  *     old min-length truncation returned a silently wrong partial sum,
  *     the exact defect class Pca.fit fails loud on. (The zip_with
  *     builtin would null-pad instead; a distance over half a vector is
  *     never what a caller meant, so an error beats both.)
  */
private[functions] trait VecBinary extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$fnName expects (array<double>, array<double>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  protected def fnName: String

  @inline protected final def checkSameLength(x: ArrayData, y: ArrayData): Unit =
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        s"$fnName: ragged vectors (${x.numElements()} vs ${y.numElements()})")

  /** Codegen guard mirroring [[checkSameLength]]. */
  protected final def lenGuard(x: String, y: String): String =
    s"""if ($x.numElements() != $y.numElements())
       |  throw new IllegalArgumentException(
       |    "$fnName: ragged vectors (" + $x.numElements() + " vs " + $y.numElements() + ")");
       |""".stripMargin
}

case class VecDot(left: Expression, right: Expression) extends VecBinary {

  override protected def fnName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    checkSameLength(x, y)
    var acc = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |${lenGuard(x, y)}
         |int $n = $x.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σ (x_i − y_i)² — the AP similarity kernel (negated at the call site). */
case class VecSqDist(left: Expression, right: Expression) extends VecBinary {

  override protected def fnName: String = "vec_sqdist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    checkSameLength(x, y)
    var acc = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) { val d = x.getDouble(i) - y.getDouble(i); acc += d * d; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |${lenGuard(x, y)}
         |int $n = $x.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $x.getDouble($i) - $y.getDouble($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /** Register vec_dot / vec_sqdist for SQL + expr() use in a session.
    * Arguments are cast to array<double> (a no-op when already typed),
    * so SQL callers get the builtin HOFs' coercion while the raw
    * expressions stay strictly typed. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def two(name: String, es: Seq[Expression]): (Expression, Expression) = {
      require(es.length == 2,
        s"$name expects exactly 2 arguments (array<double>, array<double>), got ${es.length}")
      (Cast(es(0), ArrayType(DoubleType)), Cast(es(1), ArrayType(DoubleType)))
    }
    reg.createOrReplaceTempFunction("vec_dot",
      es => { val (a, b) = two("vec_dot", es); VecDot(a, b) }, "built-in")
    reg.createOrReplaceTempFunction("vec_sqdist",
      es => { val (a, b) = two("vec_sqdist", es); VecSqDist(a, b) }, "built-in")
  }
}
