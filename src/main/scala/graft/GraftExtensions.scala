package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.FloatDotProduct

/** `SparkSessionExtensions` hook: registers the engine's native
  * expressions as SQL functions, so `spark.sql` users get them without
  * touching the Scala API:
  *
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  *   spark.sql("SELECT float_dot(a.embedding, b.embedding) ...")
  * }}}
  *
  * Also loadable via `spark.sql.extensions=graft.GraftExtensions` on a
  * cluster — no code changes, the standard deployment seam.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDotProduct].getName, "float_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "float_dot takes exactly 2 arguments")
        FloatDotProduct(args(0), args(1))
      }))
  }
}
