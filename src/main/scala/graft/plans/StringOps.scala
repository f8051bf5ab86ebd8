package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftColumns
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen Hamming distance over two string signatures (e.g. the
  * '0'/'1' SimHash bit strings): the count of positions whose bytes
  * differ, over the common prefix length.
  *
  * The higher-order formulation (`aggregate(sequence(1, n), ...)` with a
  * per-position `substr` compare) evaluates 2n interpreted substring
  * calls per pair; at candidate-verification volume that dominates the
  * query. This expression is one tight byte loop inside whole-stage
  * codegen. Byte-wise compare equals character-wise compare for the
  * ASCII signature alphabet it is built for.
  */
case class HammingDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hamming_dist requires two string arguments, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String].getBytes
    val y = b.asInstanceOf[UTF8String].getBytes
    val n = math.min(x.length, y.length)
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x(i) != y(i)) acc += 1L
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xb = ctx.freshName("xb")
      val yb = ctx.freshName("yb")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |byte[] $xb = $a.getBytes();
         |byte[] $yb = $b.getBytes();
         |int $n = java.lang.Math.min($xb.length, $yb.length);
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($xb[$i] != $yb[$i]) $acc++;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDist =
    copy(left = newLeft, right = newRight)
}

object StringOps {
  /** Hamming distance of two string columns (native codegen). */
  def hammingDist(a: Column, b: Column): Column =
    GraftColumns.column(HammingDist(
      GraftColumns.expression(a), GraftColumns.expression(b)))
}
