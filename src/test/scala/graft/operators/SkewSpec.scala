package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.SparkFunSuite
import graft.sources.Sources

/** Skew-mitigation correctness: salting must never change results —
  * only the exchange layout. Equality is checked against the plain
  * unsalted formulation on real testdata, plus structural checks that
  * the salt actually spreads the key space.
  */
class SkewSpec extends SparkFunSuite {

  private def events = Sources.table(spark, sf0001, "events")

  test("saltedAgg == plain groupBy (counts and exact decimal sums)") {
    val salted = Skew.saltedAgg(
      events, keys = Seq("event_type"),
      seed = col("event_id"), buckets = 16,
      partials = Seq(count(lit(1)).as("pc"),
        sum(col("value").cast(DecimalType(18, 2))).as("pv")),
      finals = Seq(sum(col("pc")).as("cnt"),
        sum(col("pv")).as("sv")))
      .select(col("event_type"), col("cnt"), col("sv").cast("double").as("sv"))
    val plain = events.groupBy("event_type")
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sv"))
    assert(salted.collect().toSet == plain.collect().toSet)
  }

  test("saltedJoin == plain join (row multiplicity preserved)") {
    val dim = events.select("event_type").distinct()
      .withColumn("tag", upper(col("event_type")))
    val salted = Skew.saltedJoin(events, dim, "event_type",
      seed = col("event_id"), buckets = 16)
      .groupBy("tag").agg(count(lit(1)).as("n"))
    val plain = events.join(dim, Seq("event_type"))
      .groupBy("tag").agg(count(lit(1)).as("n"))
    assert(salted.collect().toSet == plain.collect().toSet)
  }

  test("saltedAgg plan: (key, salt) exchange feeding a key-only exchange") {
    val salted = Skew.saltedAgg(
      events, keys = Seq("event_type"),
      seed = col("event_id"), buckets = 16,
      partials = Seq(count(lit(1)).as("pc")),
      finals = Seq(sum(col("pc")).as("cnt")))
    salted.collect()
    // AdaptiveSparkPlan prints final then initial plan — final only
    val plan = salted.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val saltedEx = "hashpartitioning\\(event_type#\\d+, __salt".r
      .findAllMatchIn(plan).length
    val plainEx = "hashpartitioning\\(event_type#\\d+, \\d+\\)".r
      .findAllMatchIn(plan).length
    assert(saltedEx == 1, s"expected one (key, salt) exchange:\n$plan")
    assert(plainEx == 1, s"expected one key-only exchange:\n$plan")
  }

  test("salt spreads each key over many buckets") {
    val spread = events
      .select(col("event_type"), Skew.salt(col("event_id"), 16).as("s"))
      .groupBy("event_type")
      .agg(countDistinct(col("s")).as("nb"))
      .agg(min(col("nb")).as("min_nb"))
      .head().getLong(0)
    // 1000+ rows per type across 16 buckets: every bucket should hit
    assert(spread >= 12, s"salt spread too narrow: min buckets $spread")
  }

  test("salt is deterministic and in range") {
    val bad = events
      .select(Skew.salt(col("event_id"), 16).as("s"))
      .filter(col("s") < 0 || col("s") >= 16)
      .count()
    assert(bad == 0)
    val a = events.select(col("event_id"), Skew.salt(col("event_id"), 16).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = events.select(col("event_id"), Skew.salt(col("event_id"), 16).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("AQE skew-join splits the hot partition — and where the manual salt still rules") {
    // The division of labor this library documents (Skew scaladoc):
    // AQE's OptimizeSkewedJoin handles a HIGH-CARDINALITY key domain
    // with heavy hitters — it splits an oversized shuffle partition
    // into several tasks at runtime, replicating the other side's
    // matching partition, with no plan changes needed. The manual
    // saltedAgg/saltedJoin remain necessary when the LOGICAL key
    // domain is tiny (6-value event_type): a hash exchange on the raw
    // key can use at most |domain| reducers no matter how AQE splits
    // partitions, and AQE never splits HashAggregate partitions at
    // all. This case proves the AQE half actually fires on this
    // session's config so the boundary is measured, not assumed.
    val s = spark
    val keep = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(k =>
      k -> util.Try(s.conf.get(k)).toOption.flatMap(Option(_))).toMap
    try {
      s.conf.set("spark.sql.adaptive.enabled", "true")
      s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // scale the detector to test-sized data: a partition is skewed if
      // > 32 KB and > 2x the median; split targets ~16 KB
      s.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "32768")
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16384")
      // force a sort-merge join: broadcasting the dim would dissolve
      // the shuffle AQE is supposed to repair
      s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      // one heavy hitter inside a wide domain: 90% of 200k fact rows
      // share key 0, the rest spread over 1000 keys
      val fact = s.range(200000L).select(
        when(col("id") % 10 < 9, 0L).otherwise(col("id") % 1000L).as("k"),
        col("id").as("payload"))
      val dim = s.range(1000L).select(col("id").as("k"),
        concat(lit("dim_"), col("id")).as("name"))
      val joined = fact.join(dim, "k")
      // execute THIS df's own plan (count() would build a separate
      // aggregate execution and leave joined's AQE plan unfinalized)
      assert(joined.queryExecution.toRdd.count() === 200000L)
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("isFinalPlan=true"), plan.take(500))
      assert(plan.contains("skew=true"),
        s"OptimizeSkewedJoin did not fire on the hot partition:\n${plan.take(4000)}")
    } finally keep.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }
}
