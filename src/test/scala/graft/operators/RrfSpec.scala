package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

/** Reciprocal-rank fusion unit semantics on hand-built rankings, where
  * the expected fusion is computable by hand.
  */
class RrfSpec extends SparkFunSuite {

  private def df(rows: Seq[(Long, Long, Int)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("qid", "id", "rank")
  }

  test("item in both lists outranks items in one list") {
    // q0: list A ranks (10, 11), list B ranks (11, 12).
    val fused = Similarity.rrfFuse(
      df(Seq((0L, 10L, 1), (0L, 11L, 2))),
      df(Seq((0L, 11L, 1), (0L, 12L, 2))), k = 10)
      .orderBy("rank").collect()
    // 11 appears in both (1/62 + 1/61) > 10 (1/61) > 12 (1/62)
    assert(fused.map(_.getLong(2)).toSeq == Seq(11L, 10L, 12L))
    val expected11 = 1.0 / 62 + 1.0 / 61
    assert(math.abs(fused(0).getDouble(3) -
      math.rint(expected11 * 1e6) / 1e6) < 1e-9)
  }

  test("single-list items score 1/(c+rank); ties break by id") {
    // both items only in list A at the same rank via two queries is
    // impossible; craft a tie: rank 1 in A only vs rank 1 in B only.
    val fused = Similarity.rrfFuse(
      df(Seq((0L, 20L, 1))),
      df(Seq((0L, 21L, 1))), k = 10)
      .orderBy("rank").collect()
    assert(fused.length == 2)
    // identical scores 1/61 → lower id first
    assert(fused.map(_.getLong(2)).toSeq == Seq(20L, 21L))
    assert(fused(0).getDouble(3) == fused(1).getDouble(3))
  }

  test("k truncates the fused list per query independently") {
    val a = df((1 to 5).map(i => (0L, i.toLong, i)) ++
      (1 to 5).map(i => (1L, (100 + i).toLong, i)))
    val fused = Similarity.rrfFuse(a, df(Seq.empty), k = 3)
    val byQ = fused.collect().groupBy(_.getLong(0))
    assert(byQ(0L).length == 3 && byQ(1L).length == 3)
  }
}
