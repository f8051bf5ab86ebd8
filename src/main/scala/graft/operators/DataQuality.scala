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
    */
  def profile(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq
    val aggs = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1).otherwise(0)).cast("long")
          .as(s"__null_$c"),
        approx_count_distinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val a = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', `__null_$c`, `__nd_$c`, `__min_$c`, `__max_$c`").mkString(", ")
    a.select(col("__n"), expr(
      s"stack(${cols.length}, $stackArgs) as " +
        "(column, null_count, approx_distinct, min_value, max_value)"))
      .select(col("column"), col("__n").as("n_rows"), col("null_count"),
        round(lit(1.0) - col("null_count").cast("double") /
          col("__n").cast("double"), 6).as("completeness"),
        col("approx_distinct"), col("min_value"), col("max_value"))
  }

  /** Columns whose completeness falls below `minCompleteness` — the
    * gate a pipeline fails on (empty = healthy).
    */
  def completenessViolations(profiled: DataFrame,
      minCompleteness: Double): DataFrame =
    profiled.filter(col("completeness") < minCompleteness)
      .select("column", "completeness", "null_count", "n_rows")
}
