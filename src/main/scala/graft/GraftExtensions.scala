package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import graft.functions.{VecDot, VecSqDist}

/** Library integration point: `SparkSession.builder.withExtensions(new
  * GraftExtensions)` — or `spark.sql.extensions=graft.GraftExtensions` on
  * a cluster — installs the engine's native codegen functions into every
  * session at build time, so SQL and `expr()` users never call
  * [[graft.functions.VectorExprs.register]] by hand. (The per-session
  * `register` path stays for embedded use against an already-built
  * session; both routes bind the same Expressions.) */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    // Same argument handling as VectorExprs.register (round-12 review —
    // the two routes MUST stay behavior-identical): arity validated
    // with the signature in the message (extra args were silently
    // dropped; missing ones threw an index error), and arguments cast
    // to array<double> so array<float>/array<int> inputs coerce like
    // the builtin HOFs.
    def two(name: String, es: Seq[Expression]): (Expression, Expression) = {
      require(es.length == 2,
        s"$name expects exactly 2 arguments (array<double>, array<double>), got ${es.length}")
      (Cast(es(0), ArrayType(DoubleType)), Cast(es(1), ArrayType(DoubleType)))
    }
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (es: Seq[Expression]) => { val (a, b) = two("vec_dot", es); VecDot(a, b) }))
    ext.injectFunction((
      FunctionIdentifier("vec_sqdist"),
      new ExpressionInfo(classOf[VecSqDist].getName, "vec_sqdist"),
      (es: Seq[Expression]) => { val (a, b) = two("vec_sqdist", es); VecSqDist(a, b) }))
  }
}
