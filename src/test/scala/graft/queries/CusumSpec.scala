package graft.queries

import graft.SparkFunSuite

/** e_cusum's window-function closed form
  * (S_i = P_i − min(0, min_{j≤i} P_j)) must equal the literal CUSUM
  * recursion S_i = max(0, S_{i−1} + (x_i − target)) — replayed here in
  * plain Scala over the query's own hourly series.
  */
class CusumSpec extends SparkFunSuite {

  test("closed form equals the recursion on real data") {
    val rows = EventQueries.defs("e_cusum")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getString(0))
    byType.foreach { case (tpe, rs) =>
      // rows arrive ordered (event_type, h); recompute the target the
      // query derived (FLOOR division — the DuckDB `//` semantics both
      // engines now share)
      val xs = rs.map(_.getLong(2))
      val target = Math.floorDiv(xs.sum, xs.length.toLong)
      var s = 0L
      rs.zip(xs).foreach { case (row, x) =>
        s = math.max(0L, s + (x - target))
        assert(row.getLong(3) == s,
          s"$tpe @ ${row.getString(1)}: closed form ${row.getLong(3)} != recursion $s")
        assert(row.getBoolean(4) == (s > 3L * math.max(target, 1L)))
      }
    }
  }

  test("a detector over a flat series never flags") {
    // all hours equal → psum stays 0 → cusum 0 everywhere; sanity on
    // the closed form's degenerate case via a synthetic frame
    val s = spark; import s.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val hourly = Seq(("a", "01", 100L), ("a", "02", 100L), ("a", "03", 100L))
      .toDF("event_type", "h", "xs")
    val wAll = Window.partitionBy(col("event_type"))
    val wRun = Window.partitionBy(col("event_type")).orderBy(col("h"))
    val out = hourly
      .withColumn("tot", sum(col("xs")).over(wAll))
      .withColumn("nh", count(lit(1)).over(wAll))
      .withColumn("target", expr("tot div nh"))
      .withColumn("psum", sum(col("xs") - col("target")).over(wRun))
      .withColumn("cusum",
        col("psum") - least(min(col("psum")).over(wRun), lit(0L)))
      .select("cusum").collect().map(_.getLong(0))
    assert(out.forall(_ == 0L))
  }

  test("negative per-type sum: target floors like DuckDB //, not trunc") {
    // refund-heavy series: tot = −5 over 2 hours → floor(−5/2) = −3,
    // where trunc div would give −2 and silently diverge from the
    // oracle (the r14 ADVICE case). Replays the query's exact target
    // expression on a synthetic frame.
    val s = spark; import s.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val hourly = Seq(("r", "01", -1L), ("r", "02", -4L))
      .toDF("event_type", "h", "xs")
    val wAll = Window.partitionBy(col("event_type"))
    val got = hourly
      .withColumn("tot", sum(col("xs")).over(wAll))
      .withColumn("nh", count(lit(1)).over(wAll))
      .withColumn("target", expr("(tot - pmod(tot, nh)) div nh"))
      .select("target").collect().map(_.getLong(0))
    assert(got.forall(_ == Math.floorDiv(-5L, 2L)),
      s"target must floor to -3: ${got.toSeq}")
  }
}
