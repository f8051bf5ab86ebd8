package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkFunSuite
import graft.sources.Sources

/** Streaming specs: each streaming query's complete output must equal its
  * batch twin over the same file (SURVEY.md §7.5 hard part 6 — no
  * reference ground truth exists for streaming, so the batch semantics
  * are the oracle).
  */
class EventStreamsSpec extends SparkFunSuite {

  /** File stream sources require a DIRECTORY; stage the single parquet
    * file into a temp dir via symlink.
    */
  private lazy val eventsPath: String = {
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$sf0001/events.parquet"))
    dir.toString
  }
  private def batchEvents = Sources.table(spark, sf0001, "events")

  test("tumbling stream == batch groupBy on complete data") {
    val stream = EventStreams.readEvents(spark, eventsPath)
    EventStreams.runToMemory(
      EventStreams.tumblingCounts(stream), "tumble_out", OutputMode.Complete())
    val got = spark.sql(
      "SELECT win_start, event_type, cnt FROM tumble_out")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val want = batchEvents
      .groupBy(date_trunc("hour", col("ts")).as("win_start"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("sliding stream: every event lands in exactly two windows") {
    val stream = EventStreams.readEvents(spark, eventsPath)
    EventStreams.runToMemory(
      EventStreams.slidingCounts(stream), "slide_out", OutputMode.Complete())
    val total = spark.sql("SELECT sum(cnt) FROM slide_out").head().getLong(0)
    assert(total == 2 * batchEvents.count())
  }

  test("session windows: per-user event totals preserved") {
    val stream = EventStreams.readEvents(spark, eventsPath)
    EventStreams.runToMemory(
      EventStreams.sessionAgg(stream), "sess_out", OutputMode.Complete())
    val streamed = spark.sql(
      "SELECT user_id, sum(n_events) AS n FROM sess_out GROUP BY user_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = batchEvents.groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
  }

  test("stream dedup keeps all unique event_ids") {
    val stream = EventStreams.readEvents(spark, eventsPath)
    EventStreams.runToMemory(EventStreams.dedupStream(stream), "dedup_out")
    assert(spark.sql("SELECT count(DISTINCT event_id) FROM dedup_out").head().getLong(0)
      == batchEvents.select("event_id").distinct().count())
  }

  test("stream-static enrichment == batch left join (per-segment totals)") {
    val stream = EventStreams.readEvents(spark, eventsPath)
    val dim = Sources.table(spark, sf0001, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    EventStreams.runToMemory(
      EventStreams.enrichWithDim(stream, dim, "user_id", "c_custkey"),
      "enrich_out")
    val got = spark.sql(
      "SELECT coalesce(c_mktsegment, 'UNKNOWN') AS seg, count(*) AS n " +
        "FROM enrich_out GROUP BY 1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = batchEvents
      .join(dim, col("user_id") === col("c_custkey"), "left")
      .groupBy(coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("seg"))
      .count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("stream-stream click/purchase join == batch time-bounded join") {
    val stream = EventStreams.readEvents(spark, eventsPath)
    EventStreams.runToMemory(
      EventStreams.clickPurchaseJoin(stream), "ss_join_out")
    val got = spark.sql(
      "SELECT c_user, count(*) AS n FROM ss_join_out GROUP BY c_user")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val e = batchEvents
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    val want = c.join(p, col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"))
      .groupBy("c_user").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("flatMapGroupsWithState streaming funnel == batch conditional-min chain") {
    val stream = EventStreams.readEvents(spark, eventsPath)
    EventStreams.runToMemory(
      EventStreams.funnelStages(spark, stream), "funnel_out",
      OutputMode.Update())
    // final stage per user (max across updates) → stage-reach counts
    val got = spark.sql(
      """SELECT sum(CASE WHEN s >= 1 THEN 1 ELSE 0 END) AS n_view,
        |  sum(CASE WHEN s >= 2 THEN 1 ELSE 0 END) AS n_click,
        |  sum(CASE WHEN s >= 3 THEN 1 ELSE 0 END) AS n_purchase
        |FROM (SELECT user_id, max(stage) AS s FROM funnel_out
        |  GROUP BY user_id)""".stripMargin)
      .head()
    // batch twin: the e_funnel conditional-min chain
    val e = batchEvents
    val tv = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("tv"))
    val tc = e.filter(col("event_type") === "click")
      .join(tv, "user_id").filter(col("ts") >= col("tv"))
      .groupBy("user_id").agg(min("ts").as("tc"))
    val tp = e.filter(col("event_type") === "purchase")
      .join(tc, "user_id").filter(col("ts") >= col("tc"))
      .groupBy("user_id").agg(min("ts").as("tp"))
    val want = tv.join(tc, Seq("user_id"), "left")
      .join(tp, Seq("user_id"), "left")
      .agg(count(col("tv")), count(col("tc")), count(col("tp")))
      .head()
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) ==
      (want.getLong(0), want.getLong(1), want.getLong(2)))
  }

  test("checkpointed parquet file sink is exactly-once across restarts") {
    val outDir = tmpDir("stream_sink")
    val ckpt = tmpDir("stream_ckpt")
    def runOnce(): Unit = {
      val stream = EventStreams.readEvents(spark, eventsPath)
        .select("event_id", "user_id", "event_type")
      val q = stream.writeStream
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    val afterFirst = spark.read.parquet(outDir).count()
    assert(afterFirst == batchEvents.count())
    // restart with the same checkpoint and no new input: the sink's
    // transaction log must prevent any re-emission
    runOnce()
    assert(spark.read.parquet(outDir).count() == afterFirst)
    assert(spark.read.parquet(outDir).select("event_id").distinct().count()
      == batchEvents.select("event_id").distinct().count())
  }

  test("mapGroupsWithState running totals match batch aggregation") {
    val stream = EventStreams.readEvents(spark, eventsPath)
    EventStreams.runToMemory(
      EventStreams.runningUserTotals(spark, stream), "state_out",
      OutputMode.Update())
    // final state per user (last update) must equal the batch totals
    val streamed = spark.sql(
      "SELECT user_id, max(n_events) AS n FROM state_out GROUP BY user_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = batchEvents.groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
  }
}
