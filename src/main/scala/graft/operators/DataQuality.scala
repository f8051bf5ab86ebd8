package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Schema-driven data-quality profiling — the generic face of the
  * oracle-checked `a_dq_report` query: per-column completeness,
  * approximate cardinality, and value bounds for ANY table, computed in
  * ONE pass (a single aggregate with 4 expressions per column — no
  * per-column scans). Distinct counts use HLL (`approx_count_distinct`):
  * a profile is a diagnostic, and the exact alternative would cost one
  * Expand row per column per input row at 100 TB. The pivot to tall
  * audit form is a zero-shuffle `stack` over the 1-row aggregate.
  */
object DataQuality {

  /** Tall per-column profile: (column, n_rows, null_count,
    * completeness, approx_distinct, min_value, max_value).
    *
    * Built entirely from typed Columns — raw column names never enter
    * SQL text (internal aliases are index-based), so names containing
    * quotes/backticks profile fine and the "ANY table" contract holds.
    * The pivot to tall form is a zero-shuffle explode over the 1-row
    * aggregate (same cost class as the `stack` it replaces). An empty
    * table reports completeness 1.0 (vacuously complete — no row is
    * missing a value) rather than NaN, keeping downstream JSON valid.
    */
  def profile(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq
    // col() parses its argument as an attribute path, so a name
    // containing a backtick needs backtick-quoting with doubling —
    // the one place a name-derived string appears, and it's escaped.
    def c0(c: String) = col("`" + c.replace("`", "``") + "`")
    val aggs = Seq(count(lit(1)).as("__n")) ++
      cols.zipWithIndex.flatMap { case (c, i) =>
        Seq(
          sum(when(c0(c).isNull, 1).otherwise(0)).cast("long")
            .as(s"__null_$i"),
          approx_count_distinct(c0(c)).as(s"__nd_$i"),
          min(c0(c)).cast("string").as(s"__min_$i"),
          max(c0(c)).cast("string").as(s"__max_$i"))
      }
    val a = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("column"),
        col(s"__null_$i").as("null_count"),
        col(s"__nd_$i").as("approx_distinct"),
        col(s"__min_$i").as("min_value"),
        col(s"__max_$i").as("max_value"))
    }
    a.select(col("__n"), explode(array(entries: _*)).as("e"))
      .select(col("e.column").as("column"), col("__n").as("n_rows"),
        col("e.null_count").as("null_count"),
        when(col("__n") === 0, lit(1.0))
          .otherwise(round(lit(1.0) - col("e.null_count").cast("double") /
            col("__n").cast("double"), 6)).as("completeness"),
        col("e.approx_distinct").as("approx_distinct"),
        col("e.min_value").as("min_value"),
        col("e.max_value").as("max_value"))
  }

  /** Columns whose completeness falls below `minCompleteness` — the
    * gate a pipeline fails on (empty = healthy).
    */
  def completenessViolations(profiled: DataFrame,
      minCompleteness: Double): DataFrame =
    profiled.filter(col("completeness") < minCompleteness)
      .select("column", "completeness", "null_count", "n_rows")
}
