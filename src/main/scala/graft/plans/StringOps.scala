package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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

/** Native codegen packed language-stopword mask — the hot loop of the
  * multilingual quality gate ([[graft.operators.TextAnalysis
  * .gopherRulesLang]]): walk the space-separated tokens of `child`
  * once, look each up in a word→language-bitmask table (model state,
  * one reference object per plan), and fold into ONE long — low 32
  * bits = languages whose stopwords appeared ≥1 time, high 32 =
  * ≥2 times. "Some language contributes ≥2 function words" is then
  * `(mask & 0xffffffff00000000) != 0`.
  *
  * Exists because the `aggregate(...)` higher-order formulation is
  * CodegenFallback: every token paid an interpreted lambda step with
  * Catalyst boxing. This is one tight loop inside whole-stage codegen
  * (same per-token hash lookup, none of the interpreter). Token
  * boundaries are single spaces, matching `split(text, " ")` (empty
  * tokens from doubled/trailing spaces miss the table, exactly like
  * the Column formulation). Update rule per token: `acc = acc | m |
  * ((acc & m) << 32)` — the OLD once-bits gate the twice-bits, so a
  * word seen twice sets its language's high bit.
  */
case class StopwordLangMask(child: Expression, masks: Map[String, Long])
    extends UnaryExpression {

  require(masks.values.forall(m => (m >>> 32) == 0L),
    "StopwordLangMask: masks must fit the low 32 bits (≤32 languages)")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"stopword_lang_mask requires a string argument, got " +
        child.dataType.catalogString)

  override def dataType: DataType = LongType

  @transient private lazy val maskMap: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](masks.size * 2)
    masks.foreach { case (k, v) => m.put(k, java.lang.Long.valueOf(v)) }
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    var acc = 0L
    var i = 0
    while (i <= n) {
      var j = s.indexOf(' ', i)
      if (j < 0) j = n
      val mv = maskMap.get(s.substring(i, j))
      if (mv != null) {
        val m = mv.longValue()
        acc = acc | m | ((acc & m) << 32)
      }
      i = j + 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("stopMasks", maskMap,
      "java.util.HashMap<String, java.lang.Long>")
    nullSafeCodeGen(ctx, ev, input => {
      val s = ctx.freshName("s")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val mv = ctx.freshName("mv")
      val m = ctx.freshName("m")
      val acc = ctx.freshName("acc")
      s"""
         |String $s = $input.toString();
         |int $n = $s.length();
         |long $acc = 0L;
         |int $i = 0;
         |while ($i <= $n) {
         |  int $j = $s.indexOf(' ', $i);
         |  if ($j < 0) $j = $n;
         |  java.lang.Long $mv =
         |    (java.lang.Long) $mapRef.get($s.substring($i, $j));
         |  if ($mv != null) {
         |    long $m = $mv.longValue();
         |    $acc = $acc | $m | (($acc & $m) << 32);
         |  }
         |  $i = $j + 1;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): StopwordLangMask = copy(child = newChild)
}

object StringOps {
  /** Hamming distance of two string columns (native codegen). */
  def hammingDist(a: Column, b: Column): Column =
    GraftColumns.column(HammingDist(
      GraftColumns.expression(a), GraftColumns.expression(b)))

  /** Packed once/twice language-stopword mask of a text column against
    * a word→language-bitmask table (native codegen).
    */
  def stopwordLangMask(text: Column, masks: Map[String, Long]): Column =
    GraftColumns.column(StopwordLangMask(
      GraftColumns.expression(text), masks))
}
