package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite
import graft.model.PartitionId

class ValidateSpec extends SparkFunSuite {

  private def li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    .withColumn("part", date_format(col("l_shipdate"), "yyyy-MM"))

  test("checksum gate passes for a faithful copy, fails for a corrupted one") {
    val src = Validate.checksumByPartition(li, Seq("part"))
    // faithful copy: same data, different row order / partitioning
    val copy = li.repartition(7).sortWithinPartitions("l_quantity")
    val dst = Validate.checksumByPartition(copy, Seq("part"))
    assert(Validate.checksumsMatch(src, dst))

    // corrupted copy: same COUNTS but values changed in one partition —
    // the count gate would pass, the checksum gate must not.
    val corrupted = li.withColumn("l_quantity",
      when(col("part") === "1995-02", col("l_quantity") + 1)
        .otherwise(col("l_quantity")))
    val bad = Validate.checksumByPartition(corrupted, Seq("part"))
    assert(bad.values.map(_._1).sum == src.values.map(_._1).sum) // counts equal
    assert(!Validate.checksumsMatch(src, bad))
  }

  test("checksum detects a missing partition on either side") {
    val src = Validate.checksumByPartition(li, Seq("part"))
    val dst = Validate.checksumByPartition(
      li.filter(col("part") =!= "1995-01"), Seq("part"))
    assert(!Validate.checksumsMatch(src, dst))
    assert(!Validate.checksumsMatch(dst, src))
  }

  test("saltedCount equals plain groupBy count") {
    val events = graft.sources.Sources.table(spark, sf0001, "events")
    val plain = events.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Salting.saltedCount(events, "event_type")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("saltedSum equals plain decimal sum") {
    val li0 = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val dec = col("l_quantity").cast(org.apache.spark.sql.types.DataTypes
      .createDecimalType(18, 2))
    val plain = li0.groupBy("l_returnflag").agg(sum(dec).as("sum"))
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    val salted = Salting.saltedSum(li0, "l_returnflag", dec)
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    assert(salted == plain)
  }

  test("saltedJoin is row-identical to the plain inner join") {
    // events.user_id is the (potentially hot) big-side key; customer is
    // the replicated small side.
    val events = graft.sources.Sources.table(spark, sf0001, "events")
      .select(col("event_id"), col("user_id"))
    val cust = spark.read.parquet(s"$sf0001/customer.parquet")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val plain = events.join(cust, Seq("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(t => (t._1, t._2))
    val salted = Salting.saltedJoin(events, cust, "user_id", saltBuckets = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(t => (t._1, t._2))
    assert(salted.length == plain.length)
    assert(salted.sameElements(plain))
  }
}
