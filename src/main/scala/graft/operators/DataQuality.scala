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

  /** One [[profile]] row as a value — the unit the drift gate compares
    * and the dq report serializes (bounded by schema width, never row
    * data).
    */
  final case class ColumnProfile(
      column: String,
      nRows: Long,
      nullCount: Long,
      completeness: Double,
      approxDistinct: Long,
      minValue: Option[String],
      maxValue: Option[String])

  /** [[profile]] collected to typed values, ordered by column. */
  def collectProfile(df: DataFrame): Seq[ColumnProfile] =
    profile(df).orderBy("column").collect().toSeq.map { r =>
      ColumnProfile(r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4),
        Option(r.getString(5)), Option(r.getString(6)))
    }

  /** One drift finding: `metric` ∈ presence | completeness |
    * approx_distinct | min_bound | max_bound, with both sides rendered
    * for the report.
    */
  final case class Drift(
      column: String, metric: String, baseline: String, current: String)

  /** Anomaly-detection drift between two profiles of the same logical
    * table — the operational upgrade of the one-shot profile (and of
    * the reference's count-only validation, A35): instead of absolute
    * thresholds, each run is judged against the LAST run's recorded
    * profile, so "normal" is whatever the pipeline actually produces
    * and the gate fires on CHANGE. (Deequ's AnomalyCheck shape.)
    *
    * Rules, all tolerance-gated:
    *  - presence: a baseline column MISSING from the current profile is
    *    drift; a NEW current column is benign (additive schema
    *    evolution — same stance as the resync schema gate).
    *  - completeness: an absolute DROP > `tolerance` (a rise is fine —
    *    fewer nulls is not an anomaly).
    *  - approx_distinct: relative change > `tolerance` in either
    *    direction (cardinality collapse = a constant-stuck column;
    *    explosion = a key leaking into a categorical). HLL noise is
    *    ~2% at default rsd, so tolerances below ~0.1 will flake.
    *  - bounds (NUMERIC columns only): the observed range escaping the
    *    baseline range by > `tolerance` × baseline span on either end.
    *    Relative-to-span keeps growing time/id columns quiet (a day's
    *    growth on a years-wide column is ≪ tolerance) while a price
    *    going negative or an outlier decade out fires. Non-numeric
    *    bounds are skipped — lexicographic span is not a distance.
    */
  def drift(
      baseline: Seq[ColumnProfile],
      current: Seq[ColumnProfile],
      tolerance: Double): Seq[Drift] = {
    require(tolerance >= 0, "tolerance must be >= 0")
    val cur = current.map(p => p.column -> p).toMap
    baseline.sortBy(_.column).flatMap { b =>
      cur.get(b.column) match {
        case None =>
          Seq(Drift(b.column, "presence", "present", "missing"))
        case Some(c) =>
          val comp =
            if (c.completeness < b.completeness - tolerance)
              Some(Drift(b.column, "completeness",
                b.completeness.toString, c.completeness.toString))
            else None
          val dist = {
            val rel = math.abs(c.approxDistinct - b.approxDistinct).toDouble /
              math.max(b.approxDistinct, 1L)
            if (rel > tolerance)
              Some(Drift(b.column, "approx_distinct",
                b.approxDistinct.toString, c.approxDistinct.toString))
            else None
          }
          def num(v: Option[String]): Option[Double] =
            v.flatMap(_.toDoubleOption).filter(d => !d.isNaN)
          val bounds = (num(b.minValue), num(b.maxValue),
              num(c.minValue), num(c.maxValue)) match {
            case (Some(bLo), Some(bHi), Some(cLo), Some(cHi)) =>
              // span 0 (constant column): any change in a bound is an
              // escape, scaled off the magnitude instead
              val span = math.max(bHi - bLo, math.max(math.abs(bHi), 1.0) * 1e-9)
              val lo = if (cLo < bLo - tolerance * span)
                Some(Drift(b.column, "min_bound",
                  b.minValue.get, c.minValue.get)) else None
              val hi = if (cHi > bHi + tolerance * span)
                Some(Drift(b.column, "max_bound",
                  b.maxValue.get, c.maxValue.get)) else None
              Seq(lo, hi).flatten
            case _ => Nil
          }
          comp.toSeq ++ dist.toSeq ++ bounds
      }
    }
  }
}
