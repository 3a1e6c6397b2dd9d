package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{FloatDotProduct, VectorFunctions}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions for SQL use. Production wiring:
  *   spark.sql.extensions=graft.GraftExtensions
  * or SparkSession.builder().withExtensions(new GraftExtensions).
  * The builder is [[VectorFunctions.dotSqlBuilder]] — the SAME function
  * the tested temp-registration path uses (code-review r16: the two
  * paths carried duplicate lambdas that could drift). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[FloatDotProduct].getName, "graft_dot"),
      VectorFunctions.dotSqlBuilder))
  }
}
