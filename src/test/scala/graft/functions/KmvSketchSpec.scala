package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

/** The typed KMV Aggregator (bounded mergeable state) must equal the
  * x_kmv_distinct query formulation (global per-group sort + row_number)
  * bit-for-bit on the same hash input — the proof that the scale shape
  * computes the same result.
  */
class KmvSketchSpec extends SparkFunSuite {

  test("KMV UDAF estimate == query-formulation estimate per group") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val hashed = li.select(col("l_returnflag"),
      conv(substring(md5(col("l_orderkey").cast("string")), 1, 8), 16, 10)
        .cast("long").as("h"))
    val kmv = udaf(new KmvSketch(64))
    val viaAgg = hashed.groupBy("l_returnflag").agg(kmv(col("h")).as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("l_returnflag")).orderBy(col("h"))
    val viaQuery = hashed.distinct()
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 64)
      .select(col("l_returnflag"),
        (lit(63.0) * lit(4294967296.0) / col("h").cast("double")).as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    assert(viaAgg.keySet == viaQuery.keySet)
    viaAgg.foreach { case (flag, est) =>
      assert(est == viaQuery(flag), s"mismatch for $flag")
    }
    // sanity: estimates in a plausible band of the exact counts
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct("l_orderkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    viaAgg.foreach { case (flag, est) =>
      assert(math.abs(est / exact(flag) - 1) < 0.5, s"$flag: $est vs ${exact(flag)}")
    }
  }

  test("KMV UDAF below k distinct values is exact") {
    val s = spark
    import s.implicits._
    val small = (1 to 10).map(i => ("g", i.toLong * 1000003)).toDF("g", "h")
    val kmv = udaf(new KmvSketch(64))
    val est = small.groupBy("g").agg(kmv(col("h"))).head().getDouble(1)
    assert(est == 10.0)
  }
}
