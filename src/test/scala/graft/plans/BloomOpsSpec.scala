package graft.plans

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class BloomOpsSpec extends SparkFunSuite {

  test("mightContain: no false negatives over the dim key set") {
    val s = graft.SparkTestBase.spark
    import s.implicits._
    val dim = (0L until 500L).filter(_ % 7 == 0).toDF("k")
    val fact = (0L until 500L).toDF("k")
    val kept = fact.filter(
        BloomOps.mightContain(dim, "k", col("k"), expectedItems = 1000, fpp = 0.03))
      .as[Long].collect().toSet
    // every true member must survive the probe
    assert((0L until 500L).filter(_ % 7 == 0).forall(kept.contains))
  }

  test("bloomSemiJoin ≡ plain left-semi join (exactness despite fpp)") {
    val s = graft.SparkTestBase.spark
    import s.implicits._
    val fact = (0L until 2000L).map(i => (i, i % 13)).toDF("id", "key")
    val dim = Seq(1L, 3L, 8L).toDF("dkey")
    val viaBloom = BloomOps.bloomSemiJoin(fact, dim, "key", "dkey",
        expectedItems = 100, fpp = 0.2) // high fpp on purpose
      .orderBy("id").as[(Long, Long)].collect().toSeq
    val plain = fact.join(dim, col("key") === col("dkey"), "left_semi")
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(viaBloom == plain)
  }

  test("probe filter evaluates in codegen and prunes most non-members") {
    val s = graft.SparkTestBase.spark
    import s.implicits._
    val dim = (0L until 100L).toDF("k")
    val fact = (0L until 100000L).toDF("k")
    val pre = fact.filter(
      BloomOps.mightContain(dim, "k", col("k"), expectedItems = 100, fpp = 0.01))
    val n = pre.count()
    // 100 members + ~1% fpp of 99900 non-members; allow generous slack
    assert(n >= 100 && n < 100 + 5000, s"prefilter kept $n rows")
  }
}
