package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftColumns
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen dot product over two `array<float>` columns.
  *
  * The higher-order-function formulation
  * (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) evaluates interpreted
  * lambdas with per-element boxing and allocates an intermediate array
  * per row — at millions of pairs (embedding near-dup, ANN rerank) that
  * dominates the query. This expression generates a tight primitive loop
  * (`acc += (double)a.getFloat(i) * (double)b.getFloat(i)`) inside
  * whole-stage codegen: identical arithmetic (sequential double
  * accumulation, same order), ~50× less per-row overhead.
  *
  * Semantics: sum over the common prefix length; null if either side is
  * null (standard null-intolerant binary expression).
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def isFloatArray(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"float_dot requires two array<float> arguments, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

/** Native codegen squared L2 distance Σ(aᵢ−bᵢ)² over two `array<float>`
  * columns — the distance kernel of PQ/k-means assignment passes, where
  * it runs n·M·K times per encode. Same motivation as [[FloatVecDot]]:
  * the exact-decimal fold ([[graft.operators.Similarity.squaredErrorExact]])
  * pays per-element Decimal boxing, which is only warranted where the
  * VALUE is hash-compared; an argmin consumer needs only the winner, and
  * round-6 double agrees with round-6 exact decimal on it (the two
  * accumulations differ by ~1e-13). Arithmetic matches the exact fold's
  * term formula — d = (double)a[i] − (double)b[i]; acc += d·d — in
  * sequential order.
  */
case class FloatVecSqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def isFloatArray(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"float_sq_dist requires two array<float> arguments, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecSqDist =
    copy(left = newLeft, right = newRight)
}

/** Native codegen banded Rademacher sign signature: bit `p` of the
  * output string is `'1'` iff Σᵢ signs(p)(i)·vec(i) > 0, with the sum
  * accumulated as sequential doubles in index order (multiplying by ±1
  * is IEEE-exact, so the sum equals the same left-associated
  * add/subtract chain an oracle SQL spells out — the property that
  * keeps wide-signature LSH hash-checkable against DuckDB).
  *
  * Why this exists: [[graft.operators.Similarity.signSignature]] reads
  * the sign of each RAW dimension, capping the signature at `dim` bits —
  * and a fixed-width banding's expected candidate pairs are
  * `bands·n²/2^bits`, quadratic in corpus size. Keeping candidates
  * LINEAR needs `bits ≈ log₂ n` growth, i.e. signatures wider than the
  * vector, which is exactly a random-hyperplane signature (sign random
  * projections with ±1 Rademacher entries — Charikar 2002 SimHash /
  * Achlioptas 2003 database-friendly projections). One expression
  * computes the whole signature in a tight generated loop
  * (`planes × dim` fused multiply-adds per row) instead of
  * `planes` separate dot-product expressions blowing up the plan tree.
  */
case class RademacherSig(child: Expression, signs: Array[Array[Byte]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rademacher_sig requires array<float>, got ${other.catalogString}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.StringType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Char](signs.length)
    var p = 0
    while (p < signs.length) {
      val row = signs(p)
      val n = math.min(row.length, v.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += row(i) * v.getFloat(i).toDouble
        i += 1
      }
      out(p) = if (acc > 0.0) '1' else '0'
      p += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(new String(out))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val s = ctx.addReferenceObj("signs", signs, "byte[][]")
      val chars = ctx.freshName("chars")
      val p = ctx.freshName("p")
      val row = ctx.freshName("row")
      val acc = ctx.freshName("acc")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |char[] $chars = new char[$s.length];
         |for (int $p = 0; $p < $s.length; $p++) {
         |  byte[] $row = $s[$p];
         |  int $n = java.lang.Math.min($row.length, $v.numElements());
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $row[$i] * (double) $v.getFloat($i);
         |  }
         |  $chars[$p] = $acc > 0.0 ? '1' : '0';
         |}
         |${ev.value} =
         |  org.apache.spark.unsafe.types.UTF8String.fromString(
         |    new String($chars));
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): RademacherSig = copy(child = newChild)
}

object FloatVecOps {
  /** Dot product of two float-array columns (native codegen). */
  def floatDot(a: Column, b: Column): Column =
    GraftColumns.column(FloatVecDot(
      GraftColumns.expression(a), GraftColumns.expression(b)))

  /** Banded Rademacher sign signature of a float-array column: one
    * '0'/'1' char per plane in `signs` (native codegen; see
    * [[RademacherSig]]).
    */
  def rademacherSig(vec: Column, signs: Array[Array[Byte]]): Column =
    GraftColumns.column(RademacherSig(GraftColumns.expression(vec), signs))

  /** Squared L2 norm (dot with itself). */
  def floatNorm2(a: Column): Column = floatDot(a, a)

  /** Squared L2 distance of two float-array columns (native codegen). */
  def floatSqDist(a: Column, b: Column): Column =
    GraftColumns.column(FloatVecSqDist(
      GraftColumns.expression(a), GraftColumns.expression(b)))
}
