package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

/** Z-order layout: measured from the written files' own column spans —
  * every file must have a BOUNDED span on BOTH clustered columns,
  * where a linear sort layout leaves the non-leading column's span at
  * ~100% per file (no skipping possible).
  */
class ZOrderSpec extends SparkFunSuite {

  /** Per-file fractional span of `c` (file's (max−min) / global range),
    * averaged over the layout's files.
    */
  private def avgSpan(dir: String, c: String, lo: Double, hi: Double): Double = {
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
      .map(_.getPath)
    assert(files.length > 1, s"expected a multi-file layout in $dir")
    val spans = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head()
      (r.getDouble(1) - r.getDouble(0)) / (hi - lo)
    }
    spans.sum / spans.length
  }

  test("z-ordered files bound BOTH column spans; linear sort leaves the second at ~1") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_partkey", "l_suppkey", "l_quantity")
    val b = li.agg(
      min(col("l_partkey")).cast("double"), max(col("l_partkey")).cast("double"),
      min(col("l_suppkey")).cast("double"), max(col("l_suppkey")).cast("double"))
      .head()
    val (aLo, aHi, bLo, bHi) = (b.getDouble(0), b.getDouble(1),
      b.getDouble(2), b.getDouble(3))

    val zDir = tmpDir("zorder")
    ZOrder.writeZOrdered(li, "l_partkey", "l_suppkey", zDir, numFiles = 8)
    val linDir = tmpDir("linear")
    li.repartitionByRange(8, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(linDir)

    // layout preserves the data exactly
    assert(spark.read.parquet(zDir).count() == li.count())

    val zA = avgSpan(zDir, "l_partkey", aLo, aHi)
    val zB = avgSpan(zDir, "l_suppkey", bLo, bHi)
    val linA = avgSpan(linDir, "l_partkey", aLo, aHi)
    val linB = avgSpan(linDir, "l_suppkey", bLo, bHi)
    info(f"zorder spans: a=$zA%.3f b=$zB%.3f; linear: a=$linA%.3f b=$linB%.3f")
    // linear: leading column tightly bounded, second column useless
    assert(linA < 0.35, s"linear layout's leading span should be tight, got $linA")
    assert(linB > 0.9, s"linear layout's second column span should be ~1, got $linB")
    // z-order: BOTH columns bounded — min/max skipping works for either
    assert(zA < 0.75 && zB < 0.75,
      s"z-order must bound both spans, got a=$zA b=$zB")
    assert(math.max(zA, zB) < linB,
      "z-order's worst span must beat the linear layout's useless column")
  }

  test("z-value: interleave is monotone in both bucket ranks and deterministic") {
    val s = spark; import s.implicits._
    val grid = (for (a <- 0 until 16; b <- 0 until 16)
      yield (a.toLong, b.toLong)).toDF("a", "b")
    val z = grid.select(col("a"), col("b"),
      ZOrder.zValue(col("a"), col("b"), (0.0, 255.0), (0.0, 255.0)).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // distinct inputs → distinct z-values (it's a bijection on the grid)
    assert(z.values.toSet.size == z.size)
    // doubling a coordinate moves the z-value in the same direction
    assert(z((2L, 0L)) > z((1L, 0L)) && z((0L, 2L)) > z((0L, 1L)))
  }
}
