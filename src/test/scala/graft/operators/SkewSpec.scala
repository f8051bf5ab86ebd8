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
}
