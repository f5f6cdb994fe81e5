package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
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
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (es: Seq[Expression]) => VecDot(es(0), es(1))))
    ext.injectFunction((
      FunctionIdentifier("vec_sqdist"),
      new ExpressionInfo(classOf[VecSqDist].getName, "vec_sqdist"),
      (es: Seq[Expression]) => VecSqDist(es(0), es(1))))
  }
}
