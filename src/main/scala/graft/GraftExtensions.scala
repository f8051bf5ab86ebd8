package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.plans.{FloatVecDot, HammingDist}

/** Session extension registering graft's native SQL functions.
  *
  * Deployment: `--conf spark.sql.extensions=graft.GraftExtensions`, or
  * call [[GraftExtensions.register]] on a live session (temp-function
  * registry). Registered surface:
  *
  *  - `float_dot(array<float>, array<float>) -> double` — codegen dot
  *    product ([[graft.plans.FloatVecDot]]).
  *  - `hamming_dist(string, string) -> bigint` — codegen byte-wise
  *    Hamming distance ([[graft.plans.HammingDist]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "float_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2, "float_dot takes exactly 2 arguments")
        FloatVecDot(exprs.head, exprs(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("hamming_dist"),
      new ExpressionInfo(classOf[HammingDist].getName, "hamming_dist"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2, "hamming_dist takes exactly 2 arguments")
        HammingDist(exprs.head, exprs(1))
      }))
  }
}

object GraftExtensions {
  /** Register on an already-built session (temp functions). */
  def register(spark: SparkSession): Unit =
    org.apache.spark.sql.graftshim.GraftFunctionRegistry.registerAll(spark)
}
