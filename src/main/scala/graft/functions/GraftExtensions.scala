package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers graft's native expressions into the SQL function registry
  * so they work from `spark.sql("...")` strings, not just the Scala
  * DSL — the `SparkSessionExtensions` mechanism from the build
  * contract, used the minimal legitimate way (function injection; no
  * planner rules are needed, SURVEY.md §4).
  *
  * Wire-up options:
  *   - config: `spark.sql.extensions=graft.functions.GraftExtensions`
  *   - builder: `.withExtensions(new GraftExtensions()(_))`
  *   - post-hoc on a live session: `GraftExtensions.register(spark)`
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.vecDot)
    ext.injectFunction(GraftExtensions.vecNorm)
  }
}

object GraftExtensions {
  private val vecDot: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
    { args: Seq[Expression] =>
      require(args.length == 2, "vec_dot(a, b) takes exactly 2 array<double> arguments")
      DotProduct(args.head, args(1))
    })

  /** vec_norm(v) = sqrt(vec_dot(v, v)) — the same codegen'd kernel,
    * composed at expression level so SQL users get the L2 norm too. */
  private val vecNorm: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_norm"),
    new ExpressionInfo(classOf[DotProduct].getName, "vec_norm"),
    { args: Seq[Expression] =>
      require(args.length == 1, "vec_norm(v) takes exactly 1 array<double> argument")
      org.apache.spark.sql.catalyst.expressions.Sqrt(DotProduct(args.head, args.head))
    })

  /** Register on an already-built session (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry
      .registerFunction(vecDot._1, vecDot._2, vecDot._3)
    spark.sessionState.functionRegistry
      .registerFunction(vecNorm._1, vecNorm._2, vecNorm._3)
  }
}
