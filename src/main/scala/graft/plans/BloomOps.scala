package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftColumns
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native codegen Bloom-filter membership probe over a long key column.
  *
  * Spark's runtime-bloom-join rewrite only fires under the optimizer's
  * own cost heuristics and its `might_contain` expression is not public
  * API; this expression makes the pattern an explicit, composable
  * operator. The deserialized filter rides the plan as a reference
  * object (one instance per executor, shipped with the serialized
  * plan), and the generated code is a single `mightContainLong` call
  * inside whole-stage codegen — no UDF, no boxing.
  *
  * Bloom semantics: no false negatives, so a prefilter with this
  * expression followed by an exact join is EXACT — the filter only
  * shrinks the shuffle.
  */
case class BloomMightContainLong(filterBytes: Array[Byte], child: Expression)
    extends UnaryExpression {

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires a bigint key, got ${t.catalogString}")
  }

  override def dataType: DataType = BooleanType

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.mightContainLong($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}

/** Bloom-prefiltered joins — the 100 TB shape for selective semi joins.
  *
  * A plain left-semi join shuffles the ENTIRE fact table on the join
  * key even when the dim side matches 1% of it. [[bloomSemiJoin]] spends
  * one cheap pass over the dim side to build a Bloom filter
  * (`df.stat.bloomFilter` — a distributed treeAggregate, never a driver
  * collect of keys), probes it map-side over the fact scan (codegen'd
  * [[BloomMightContainLong]]), and only the surviving ~1%+fpp of rows
  * pay the shuffle for the exact semi join. No false negatives ⇒ the
  * result is identical to the un-prefiltered join.
  */
object BloomOps {

  /** Serialize a built filter for embedding in an expression. */
  private def toBytes(bf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Membership-probe Column over `key` for a filter built from `dim`.
    *
    * An EMPTY build side would make `bloom_filter_agg` return NULL bytes
    * (Spark NPEs deserializing them); semantically no key can match, so
    * the probe degenerates to constant false and the planner prunes the
    * scan entirely.
    */
  def mightContain(dim: DataFrame, dimKey: String, key: Column,
      expectedItems: Long, fpp: Double): Column =
    if (dim.select(dimKey).take(1).isEmpty) lit(false)
    else {
      val bf = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
      GraftColumns.column(BloomMightContainLong(toBytes(bf),
        GraftColumns.expression(key.cast("long"))))
    }

  /** Exact left-semi join of `fact` against `dim`, Bloom-prefiltered
    * map-side so only probable matches reach the shuffle.
    */
  def bloomSemiJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      expectedItems: Long = 1L << 20, fpp: Double = 0.01): DataFrame = {
    val pre = fact.filter(
      mightContain(dim, dimKey, col(factKey), expectedItems, fpp))
    pre.join(dim, pre(factKey) === dim(dimKey), "left_semi")
  }
}
