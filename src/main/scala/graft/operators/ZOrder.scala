package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton-curve) data layout — the multi-dimensional
  * clustering a lakehouse runs so parquet min/max stats prune on EVERY
  * clustered column, not just the leading sort key (the OPTIMIZE
  * ZORDER idea, e.g. Delta Lake's, re-expressed with plain Spark
  * repartitionByRange).
  *
  * Why it matters at 100 TB: a linear `orderBy(a)` layout gives each
  * file a narrow `a` range but the FULL `b` range — predicates on `b`
  * read every file. Interleaving the bit-planes of per-column bucket
  * ranks gives every file a bounded span on BOTH columns (a z-range of
  * length 4^k covers ~2^k buckets per dimension), so min/max skipping
  * works for either predicate. ZOrderSpec measures exactly this from
  * the written files' own column spans.
  *
  * Bucketing is uniform over each column's [min, max] (collected once
  * — 2 scalars per column, driver state). Uniform buckets keep the
  * z-value a pure per-row expression; for heavily skewed columns,
  * range-quantile bucketing slots in at the same place (swap
  * [[bucketExpr]]) — the skew caveat every z-order implementation
  * carries.
  */
object ZOrder {

  /** Bits per dimension; 2 dims × 8 bits = 16-bit z-values. */
  val Bits = 8

  private def bucketExpr(c: Column, mn: Column, mx: Column): Column = {
    val buckets = 1 << Bits
    // scale to [0, buckets-1]; degenerate (constant) columns land in 0
    least(lit(buckets - 1), greatest(lit(0),
      floor((c.cast("double") - mn) / (mx - mn + lit(1e-12)) * buckets)
        .cast("int")))
  }

  /** Morton interleave of two bucket ranks: bit i of `a` → bit 2i, bit
    * i of `b` → bit 2i+1. Static [[Bits]]-step arithmetic — pure
    * codegen expression, no UDF.
    */
  private def morton(a: Column, b: Column): Column =
    (0 until Bits).map { i =>
      (shiftright(a, i).bitwiseAND(lit(1)) * lit(1L << (2 * i))) +
        (shiftright(b, i).bitwiseAND(lit(1)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)

  /** The z-value expression for (cA, cB) given their collected bounds. */
  def zValue(cA: Column, cB: Column,
      boundsA: (Double, Double), boundsB: (Double, Double)): Column =
    morton(
      bucketExpr(cA, lit(boundsA._1), lit(boundsA._2)),
      bucketExpr(cB, lit(boundsB._1), lit(boundsB._2)))

  /** Write `df` z-ordered on (colA, colB) into `numFiles` parquet
    * files: range-partition on the z-value (each file owns a
    * contiguous z-range = a bounded rectangle union in (A, B) space),
    * sort within partitions so row groups inherit the locality, drop
    * the helper column before writing. Column bounds are one tiny
    * 4-scalar aggregate.
    */
  def writeZOrdered(df: DataFrame, colA: String, colB: String,
      path: String, numFiles: Int = 8): Unit = {
    val b = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).head()
    val z = zValue(col(colA), col(colB),
      (b.getDouble(0), b.getDouble(1)), (b.getDouble(2), b.getDouble(3)))
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
