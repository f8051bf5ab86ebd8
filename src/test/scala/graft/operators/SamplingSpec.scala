package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

/** The sort-free negative-sampling operator: plan shape (no Sort, two
  * broadcasts, map-only fact), FK validity, and hash determinism.
  */
class SamplingSpec extends SparkFunSuite {

  private lazy val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
  private lazy val part = spark.read.parquet(s"$sf0001/part.parquet")
    .select(col("p_partkey"), col("p_type").as("neg_type"))

  private def sampled = Sampling.negativeSample(li, part,
    Seq("l_orderkey", "l_linenumber"), "l_partkey", "p_partkey")

  test("operator plan is sort-free with broadcast joins only") {
    val plan = sampled.queryExecution.executedPlan.toString
    assert(!plan.contains("Sort "),
      s"library operator must not pay a global sort:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "dim joins must broadcast")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"))
  }

  test("every negative is a valid FK; collisions flagged not dropped") {
    val rows = sampled.collect()
    assert(rows.length == li.count())
    val valid = part.select("p_partkey").collect().map(_.getLong(0)).toSet
    assert(rows.forall(r => valid.contains(r.getAs[Long]("neg_key"))))
    // the collision flag is exactly neg == pos
    assert(rows.forall(r =>
      r.getAs[Boolean]("collision") ==
        (r.getAs[Long]("neg_key") == r.getAs[Long]("pos_key"))))
  }

  test("draws are deterministic: two runs produce identical pairs") {
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[Long]("l_orderkey"), r.getAs[Int]("l_linenumber"),
        r.getAs[Long]("pos_key"), r.getAs[Long]("neg_key"))
    val a = sampled.collect().map(key).sorted.toSeq
    val b = sampled.collect().map(key).sorted.toSeq
    assert(a == b && a.nonEmpty)
  }
}
