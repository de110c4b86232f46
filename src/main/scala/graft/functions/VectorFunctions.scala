package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the embedding hot path.
  *
  * The composable alternative (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`)
  * is semantically identical but higher-order functions don't participate
  * in whole-stage codegen — every element evaluates a lambda interpreter
  * — which made the O(n²) similarity joins the bench bottleneck
  * (24 s of a 66 s total at sf0.1). This expression generates a tight
  * scalar loop inside the join's codegen stage instead: same sequential
  * left-to-right accumulation order, so results stay bit-identical to
  * both the fold version and DuckDB's `list_dot_product` oracle.
  *
  * Preference order per the build contract: built-in functions first,
  * native `Expression` with `doGenCode` where the built-ins can't deliver
  * the plan — this is the latter case.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Dot product of two double arrays as a Column (codegen'd). */
  def dot(a: Column, b: Column): Column =
    GraftBridge.column(
      DotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** L2 norm via the same codegen'd kernel. */
  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** Spark's runtime-filter bloom sketch as an explicit aggregate:
    * folds xxhash64'd values into one binary bloom filter
    * (`BloomFilterAggregate` — the expression
    * `spark.sql.optimizer.runtime.bloomFilter` injects), exposed for
    * plans where the optimizer cannot see the opportunity itself. */
  def bloomFilterAgg(hashed: Column, expectedItems: Long): Column =
    GraftBridge.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        GraftBridge.expression(hashed), expectedItems).toAggregateExpression())

  /** Codegen'd bloom membership probe. `sketch` must be a constant or
    * scalar-subquery Column (e.g. `benchAgg.scalar()`) — the engine
    * executes the subquery once and embeds the bits in the probe. */
  def bloomMightContain(sketch: Column, hashed: Column): Column =
    GraftBridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        GraftBridge.expression(sketch), GraftBridge.expression(hashed)))
}
