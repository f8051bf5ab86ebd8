package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

/** One-pass schema-driven profiling: exact completeness/bounds on a
  * hand-built frame, and the gate's violation selection.
  */
class DataQualitySpec extends SparkFunSuite {

  private def frame = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, Some("a"), Some(10.0)),
      (2L, None, Some(20.0)),
      (3L, Some("c"), None),
      (4L, Some("c"), Some(40.0))
    ).toDF("id", "tag", "score")
  }

  test("profile: exact nulls, completeness, bounds per column") {
    val p = DataQuality.profile(frame).orderBy("column").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(5), r.getString(6)))
      .toMap
    assert(p("id") == ((4L, 0L, 1.0, "1", "4")))
    assert(p("tag") == ((4L, 1L, 0.75, "a", "c")))
    assert(p("score") == ((4L, 1L, 0.75, "10.0", "40.0")))
  }

  test("completeness gate flags only columns under the threshold") {
    val prof = DataQuality.profile(frame)
    val bad = DataQuality.completenessViolations(prof, 0.9)
      .collect().map(_.getString(0)).toSet
    assert(bad == Set("tag", "score"))
    assert(DataQuality.completenessViolations(prof, 0.5).collect().isEmpty)
  }

  test("profile survives exotic column names and empty tables (ADVICE r11)") {
    val s = spark
    import s.implicits._
    // names with quotes/backticks previously broke the stack() SQL text
    val exotic = Seq((1L, "x")).toDF("we`ird", "qu'ote")
    val pe = DataQuality.profile(exotic).collect()
    assert(pe.map(_.getString(0)).toSet == Set("we`ird", "qu'ote"))
    assert(pe.forall(_.getDouble(3) == 1.0))
    // an empty table must report defined completeness, not NaN
    // (MigrateCli writes these values straight into a JSON report)
    val empty = DataQuality.profile(frame.limit(0)).collect()
    assert(empty.length == 3)
    assert(empty.forall(r => r.getLong(1) == 0L && r.getDouble(3) == 1.0))
    assert(empty.forall(r => !r.getDouble(3).isNaN))
  }

  test("profile on a real testdata table runs one pass and covers all columns") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val p = DataQuality.profile(docs).collect()
    assert(p.map(_.getString(0)).toSet == docs.columns.toSet)
    assert(p.forall(_.getDouble(3) == 1.0)) // synthetic data has no nulls
  }
}
