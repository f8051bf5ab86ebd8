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

  test("dropDuplicatesWithinWatermark suppresses same-id different-ts duplicates") {
    // stage the events file TWICE with the duplicate copy's timestamps
    // nudged +1ms — the at-least-once redelivery artifact that
    // dropDuplicates(event_id, ts) would NOT suppress
    val s = spark
    import org.apache.spark.sql.functions.{col, expr}
    val dir = java.nio.file.Files.createTempDirectory("events_dup")
    // normalized batch read (ts as session-zone TimestampType) so the
    // staged parquet matches EventStreams.rawSchema
    val raw = Sources.table(s, sf0001, "events")
    // the file stream source lists FILES (not nested dirs): stage each
    // copy as a single flat parquet file inside the stream directory
    def stageFlat(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("dup_stage")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get
      java.nio.file.Files.move(
        java.nio.file.Paths.get(part), dir.resolve(name))
    }
    stageFlat(raw, "a.parquet")
    stageFlat(raw.withColumn("ts",
      col("ts") + expr("INTERVAL 1 MILLISECOND")), "b.parquet") // +1 ms
    val stream = EventStreams.readEvents(s, dir.toString)
    EventStreams.runToMemory(EventStreams.dedupStreamByKey(stream), "dedup_wm_out")
    val got = s.sql("SELECT count(*) FROM dedup_wm_out").head().getLong(0)
    // one row per distinct event_id, despite every id appearing twice
    assert(got == raw.select("event_id").distinct().count())
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

  test("stream-stream join under RocksDB state store: identical output") {
    // Stream-stream join state is the operator that actually MOTIVATES
    // RocksDB — both sides buffer rows until the watermark passes, and
    // at 100 TB/day that buffer outgrows executor heap long before any
    // windowed agg does. Rerun the inner-join case with state in the
    // RocksDB provider and require bit-identical grouped output.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    EventStreams.withRocksDbStateStore(spark) {
      assert(spark.conf.get(key) == EventStreams.RocksDbProvider)
      val stream = EventStreams.readEvents(spark, eventsPath)
      EventStreams.runToMemory(
        EventStreams.clickPurchaseJoin(stream), "ss_join_rocks")
    }
    assert(spark.conf.getOption(key) == before)
    val got = spark.sql(
      "SELECT c_user, count(*) AS n FROM ss_join_rocks GROUP BY c_user")
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
    assert(got == want && got.nonEmpty)
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

  // ---- multi-micro-batch harness: one parquet file per batch, mtime
  // ordering + maxFilesPerTrigger=1 so the file source replays the files
  // as SEPARATE micro-batches (AvailableNow honors the per-trigger cap).

  private val mbSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("event_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("ts",
      org.apache.spark.sql.types.TimestampType),
    org.apache.spark.sql.types.StructField("user_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("event_type",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("value",
      org.apache.spark.sql.types.DoubleType)))

  private def mbRows(rows: Seq[(Long, String, Long, String, Double)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"),
        col("user_id"), col("event_type"), col("value"))
  }

  /** Write each batch as one file into a watched dir; mtimes ascend so
    * the file source's oldest-first ordering replays them in sequence.
    */
  private def writeBatches(batches: Seq[org.apache.spark.sql.DataFrame]): String = {
    val dir = java.nio.file.Files.createTempDirectory("mb_events")
    batches.zipWithIndex.foreach { case (df, i) =>
      val tmp = java.nio.file.Files.createTempDirectory("mb_tmp")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = tmp.toFile.listFiles()
        .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).get
      val dest = dir.resolve(f"batch$i%03d.parquet")
      java.nio.file.Files.move(part.toPath, dest)
      java.nio.file.Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 60000L))
    }
    dir.toString
  }

  private def readMicroBatched(dir: String) =
    spark.readStream.schema(mbSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)

  test("gap-fill stream across micro-batches == batch e_gapfill (zero-fill + LOCF)") {
    // two micro-batches; per-type hour gaps WITHIN a batch (click skips
    // 11:00-12:00), ACROSS batches (click skips 14:00-15:00 spanning
    // the batch boundary), and a type that first appears in batch 2.
    val b0 = mbRows(Seq(
      (1L, "2026-01-01 10:15:00", 1L, "click", 10.0),
      (2L, "2026-01-01 10:45:00", 2L, "click", 5.5),
      (3L, "2026-01-01 13:05:00", 1L, "click", 2.25),
      (4L, "2026-01-01 11:00:00", 3L, "view", 1.0)))
    val b1 = mbRows(Seq(
      (5L, "2026-01-01 16:30:00", 1L, "click", 7.0),
      (6L, "2026-01-01 14:10:00", 3L, "view", 3.0),
      (7L, "2026-01-01 15:00:00", 4L, "purchase", 9.9)))
    val dir = writeBatches(Seq(b0, b1))
    EventStreams.runToMemory(
      EventStreams.gapFillStream(spark, readMicroBatched(dir)),
      "gapfill_out")
    // batch twin: the oracle-checked e_gapfill query over the union,
    // staged as an events table dir
    val sfLike = java.nio.file.Files.createTempDirectory("gap_sf").toString
    b0.unionByName(b1).write.mode("overwrite")
      .parquet(s"$sfLike/events.parquet")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(3),
        Option(r.get(4)).map(_.asInstanceOf[Double]))).toSet
    val got = rows(spark.sql(
      "SELECT event_type, win_start, cnt, filled, locf_sum FROM gapfill_out"))
    val want = rows(graft.SparkEntry.queries("e_gapfill")(spark, sfLike))
    assert(got.nonEmpty && got == want)
    // the interesting rows really exist: zero-filled gap hours carrying
    // the previous hour's sum forward, including across the batch split
    assert(got.contains(("click", "2026-01-01 12:00", 0L, true, Some(15.5))))
    assert(got.contains(("click", "2026-01-01 15:00", 0L, true, Some(2.25))))
    // frontier state survives the production state store too
    EventStreams.withRocksDbStateStore(spark) {
      EventStreams.runToMemory(
        EventStreams.gapFillStream(spark, readMicroBatched(dir)),
        "gapfill_rocks")
    }
    assert(rows(spark.sql(
      "SELECT event_type, win_start, cnt, filled, locf_sum FROM gapfill_rocks"))
      == want)
  }

  test("CUSUM stream across micro-batches == batch e_cusum given its targets") {
    // hour-monotone ingestion split across two micro-batches, with a
    // drift (hours 13-14 spike) large enough to flag; the batch twin
    // derives the per-type target from the FULL series, the stream
    // detects against that frozen reference (the operator's contract).
    val b0 = mbRows(Seq(
      (1L, "2026-01-01 10:10:00", 1L, "click", 1.0),
      (2L, "2026-01-01 10:40:00", 2L, "click", 1.5),
      (3L, "2026-01-01 11:05:00", 1L, "click", 2.0),
      (4L, "2026-01-01 12:20:00", 3L, "click", 1.25),
      (5L, "2026-01-01 10:30:00", 4L, "view", 3.0),
      (6L, "2026-01-01 11:45:00", 4L, "view", 2.5)))
    val b1 = mbRows(Seq(
      (7L, "2026-01-01 13:15:00", 1L, "click", 1.0),
      (8L, "2026-01-01 14:50:00", 2L, "click", 200.0),
      (9L, "2026-01-01 14:05:00", 3L, "click", 300.0),
      (10L, "2026-01-01 13:30:00", 4L, "view", 2.0)))
    val dir = writeBatches(Seq(b0, b1))
    val sfLike = java.nio.file.Files.createTempDirectory("cusum_sf").toString
    b0.unionByName(b1).write.mode("overwrite")
      .parquet(s"$sfLike/events.parquet")
    val want = graft.SparkEntry.queries("e_cusum")(spark, sfLike).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    // derive the stream's reference values exactly as the batch does:
    // per-type trunc-mean of the hourly micro-unit sums
    val targets = want.groupBy(_._1).map { case (t, rs) =>
      t -> rs.map(_._3).sum / rs.length
    }
    EventStreams.runToMemory(
      EventStreams.cusumStream(spark, readMicroBatched(dir), targets),
      "cusum_out")
    def got(tbl: String) = spark.sql(
      s"SELECT event_type, h, xs, cusum, flagged FROM $tbl").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    assert(got("cusum_out").toSet == want.toSet)
    assert(want.exists(_._5), "the drift must actually flag")
    // detector state survives the production state store too
    EventStreams.withRocksDbStateStore(spark) {
      EventStreams.runToMemory(
        EventStreams.cusumStream(spark, readMicroBatched(dir), targets),
        "cusum_rocks")
    }
    assert(got("cusum_rocks").toSet == want.toSet)
  }

  test("left-outer stream-stream join: watermark-driven null emission == batch left join") {
    // batch 0: user 1 clicks and never purchases; user 2 clicks and
    // purchases 5 min later. batches 1-3: far-future click+purchase
    // pairs for throwaway users whose only job is to advance BOTH
    // sides' watermarks (each side's watermark node sees only its own
    // event type post-filter, and the global watermark is the MIN of
    // the two) past user 1's join window (10:00 + 30 min bound + 10 min
    // delay), forcing the state store to emit the click once with null
    // purchase columns.
    def tick(id: Long, ts: String, uid: Long) = Seq(
      (id, ts, uid, "click", 0.0), (id + 1, ts, uid, "purchase", 0.0))
    val dir = writeBatches(Seq(
      mbRows(Seq(
        (1L, "2026-01-01 10:00:00", 1L, "click", 0.0),
        (2L, "2026-01-01 10:00:00", 2L, "click", 0.0),
        (3L, "2026-01-01 10:05:00", 2L, "purchase", 42.0))),
      mbRows(tick(90L, "2026-01-01 13:00:00", 90L)),
      mbRows(tick(92L, "2026-01-01 16:00:00", 91L)),
      mbRows(tick(94L, "2026-01-01 19:00:00", 92L))))
    val stream = readMicroBatched(dir)
    EventStreams.runToMemory(
      EventStreams.clickPurchaseLeftJoin(stream), "lo_join_out")
    val got = spark.sql(
      "SELECT click_id, purchase_id, p_value FROM lo_join_out WHERE c_user IN (1, 2)")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2)))
      .toSet
    // batch twin: left join over the closed input, same condition
    assert(got == Set((1L, -1L, -1.0), (2L, 3L, 42.0)))
  }

  test("funnel across micro-batches: state persists and latches on first") {
    // user 2 proves cross-batch state: view in batch 0, click in batch 1
    // → stage 2. user 1 proves the DOCUMENTED latch-on-first semantics:
    // batch 0 latches tv = 10:20; batch 1 delivers an EARLIER view
    // (10:05) plus a click (10:10) and purchase (10:30) that would reach
    // stage 3 under exact whole-history semantics — but tv cannot be
    // retroactively lowered, the 10:10 click precedes the latched view,
    // so the user stays at stage 1 in every emission.
    val dir = writeBatches(Seq(
      mbRows(Seq(
        (1L, "2026-01-01 10:20:00", 1L, "view", 0.0),
        (2L, "2026-01-01 10:10:00", 2L, "view", 0.0))),
      mbRows(Seq(
        (3L, "2026-01-01 10:05:00", 1L, "view", 0.0),
        (4L, "2026-01-01 10:10:00", 1L, "click", 0.0),
        (5L, "2026-01-01 10:30:00", 1L, "purchase", 0.0),
        (6L, "2026-01-01 10:20:00", 2L, "click", 0.0)))))
    val stream = readMicroBatched(dir)
    EventStreams.runToMemory(
      EventStreams.funnelStages(spark, stream), "funnel_mb_out",
      OutputMode.Update())
    val emissions = spark.sql(
      "SELECT user_id, stage FROM funnel_mb_out")
      .collect().map(r => r.getLong(0) -> r.getInt(1))
    // Update mode emits once per user per batch that touched the user:
    // user 1 appears in both batches, both times at stage 1 (the latch);
    // user 2 advances 1 → 2 across the batch boundary (state persisted).
    assert(emissions.count(_._1 == 1L) == 2)
    assert(emissions.filter(_._1 == 1L).forall(_._2 == 1))
    assert(emissions.filter(_._1 == 2L).map(_._2).sorted.toSeq == Seq(1, 2))
    // contrast: exact whole-history batch semantics on the SAME closed
    // input reach stage 3 for user 1 — the monotone-latch divergence is
    // real and intentional, not an artifact of the assertion.
    val all = mbRows(Seq(
      (1L, "2026-01-01 10:20:00", 1L, "view", 0.0),
      (3L, "2026-01-01 10:05:00", 1L, "view", 0.0),
      (4L, "2026-01-01 10:10:00", 1L, "click", 0.0),
      (5L, "2026-01-01 10:30:00", 1L, "purchase", 0.0)))
    val tv = all.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("tv"))
    val tc = all.filter(col("event_type") === "click")
      .join(tv, "user_id").filter(col("ts") >= col("tv"))
      .groupBy("user_id").agg(min("ts").as("tc"))
    val tp = all.filter(col("event_type") === "purchase")
      .join(tc, "user_id").filter(col("ts") >= col("tc"))
      .groupBy("user_id").agg(min("ts").as("tp"))
    assert(tp.count() == 1) // exact semantics: user 1 reaches purchase
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

  test("foreachBatch JDBC sink: complete, restart-safe, replay-idempotent") {
    val url = "jdbc:derby:memory:streamsink;create=true"
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement().executeUpdate(
      "CREATE TABLE events_sink (event_id BIGINT, user_id BIGINT, batch_id BIGINT)")
    finally conn.close()
    val ckpt = tmpDir("jdbc_sink_ckpt")
    def run(checkpoint: String): Unit = {
      val stream = EventStreams.readEvents(spark, eventsPath)
        .select(col("event_id"), col("user_id"))
      // plain identifiers pass through UNQUOTED, so the lowercase name
      // resolves via Derby's own case normalization — the legacy
      // behavior callers of unquoted DDL depend on
      EventStreams.sinkToJdbc(stream, url, "events_sink", checkpoint,
        Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
    }
    def sinkCount(): Long = {
      val c = java.sql.DriverManager.getConnection(url)
      try {
        val rs = c.createStatement().executeQuery("SELECT count(*) FROM events_sink")
        rs.next(); rs.getLong(1)
      } finally c.close()
    }
    run(ckpt)
    val want = batchEvents.count()
    assert(sinkCount() == want)
    // restart with the SAME checkpoint and no new input: nothing re-emits
    run(ckpt)
    assert(sinkCount() == want)
    // full REPLAY (fresh checkpoint, same sink): batch ids repeat, each
    // batch deletes its own prior rows before appending — count unchanged
    run(tmpDir("jdbc_sink_ckpt2"))
    assert(sinkCount() == want)
  }

  test("JDBC sink survives a reserved-word table name (identifier quoting)") {
    // DELETE FROM ORDER is a syntax error; DELETE FROM "ORDER" is a
    // table. Reserved words are lexically plain identifiers, so the
    // caller passes the name PRE-QUOTED and the sink trusts it verbatim
    // on both the driver-side delete and the distributed append.
    val url = "jdbc:derby:memory:streamsink_q;create=true"
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement().executeUpdate(
      """CREATE TABLE "ORDER" (event_id BIGINT, user_id BIGINT, batch_id BIGINT)""")
    finally conn.close()
    def run(checkpoint: String): Unit = {
      val stream = EventStreams.readEvents(spark, eventsPath)
        .select(col("event_id"), col("user_id"))
      EventStreams.sinkToJdbc(stream, url, "\"ORDER\"", checkpoint,
        Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
    }
    def sinkCount(): Long = {
      val c = java.sql.DriverManager.getConnection(url)
      try {
        val rs = c.createStatement().executeQuery("""SELECT count(*) FROM "ORDER"""")
        rs.next(); rs.getLong(1)
      } finally c.close()
    }
    run(tmpDir("jdbc_sink_q_ckpt"))
    val want = batchEvents.count()
    assert(sinkCount() == want)
    // replay with a fresh checkpoint: the quoted delete keeps it idempotent
    run(tmpDir("jdbc_sink_q_ckpt2"))
    assert(sinkCount() == want)
  }

  test("keyed upsert JDBC sink: exactly-once under batch replay AND task retry") {
    val url = "jdbc:derby:memory:upsertsink;create=true"
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    locally {
      val conn = java.sql.DriverManager.getConnection(url)
      try conn.createStatement().executeUpdate(
        "CREATE TABLE events_upsert (event_id BIGINT PRIMARY KEY, " +
          "user_id BIGINT, value DOUBLE)")
      finally conn.close()
    }
    val props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    def run(checkpoint: String): Unit = {
      val stream = EventStreams.readEvents(spark, eventsPath)
        .select(col("event_id"), col("user_id"), col("value"))
      EventStreams.sinkToJdbcUpsert(stream, url, "events_upsert",
        Seq("event_id"), checkpoint, props)
    }
    def snapshot(): (Long, Double) = {
      val c = java.sql.DriverManager.getConnection(url)
      try {
        val rs = c.createStatement().executeQuery(
          "SELECT count(*), sum(value) FROM events_upsert")
        rs.next(); (rs.getLong(1), rs.getDouble(2))
      } finally c.close()
    }
    run(tmpDir("upsert_ckpt"))
    val (n0, sum0) = snapshot()
    val want = batchEvents.count()
    assert(n0 == want)
    assert(math.abs(sum0 - batchEvents.agg(sum("value")).head().getDouble(0)) < 1e-6)

    // --- simulate a RETRIED TASK: re-run one partition's committed
    // write. This is the case delete-then-append cannot cover (the
    // partition's JDBC transaction committed, the batch still succeeds,
    // no later delete runs). The upsert must be a no-op on state.
    val batchDf = batchEvents.select(col("event_id"), col("user_id"), col("value"))
    val someRows = batchDf.limit(500).collect().iterator
    EventStreams.upsertPartition(someRows, batchDf.schema, url,
      "events_upsert", Seq("event_id"), props)
    assert(snapshot() == ((n0, sum0)))

    // --- simulate a BATCH REPLAY: re-run the whole micro-batch body.
    EventStreams.upsertBatch(batchDf, url, "events_upsert", Seq("event_id"), props)
    assert(snapshot() == ((n0, sum0)))

    // --- full stream replay with a fresh checkpoint: still idempotent.
    run(tmpDir("upsert_ckpt2"))
    assert(snapshot() == ((n0, sum0)))

    // --- the UPDATE path actually updates: replay a slice with doubled
    // values; count unchanged, those keys carry the new values.
    val doubled = batchDf.limit(100)
      .withColumn("value", col("value") * 2)
    EventStreams.upsertBatch(doubled, url, "events_upsert", Seq("event_id"), props)
    val (n1, _) = snapshot()
    assert(n1 == want)
    val keys = doubled.select("event_id").collect().map(_.getLong(0)).toSet
    val c = java.sql.DriverManager.getConnection(url)
    val gotVals = try {
      val rs = c.createStatement().executeQuery(
        s"SELECT event_id, value FROM events_upsert WHERE event_id IN " +
          s"(${keys.take(20).mkString(",")})")
      Iterator.continually(rs).takeWhile(_.next())
        .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    } finally c.close()
    val wantVals = doubled.filter(col("event_id").isin(keys.take(20).toSeq: _*))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(gotVals == wantVals)
  }

  test("stateful agg under RocksDB state store matches batch; conf restored") {
    // Same assertion as the tumbling test, but with state held in the
    // RocksDB provider — the disk-backed store a 100 TB/day deployment
    // needs (heap-resident HDFSBacked state OOMs long before that).
    // Verifies the provider actually loads (rocksdbjni is in the distro)
    // and produces identical results, and that the helper restores the
    // session conf on exit.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    EventStreams.withRocksDbStateStore(spark) {
      assert(spark.conf.get(key) == EventStreams.RocksDbProvider)
      val stream = EventStreams.readEvents(spark, eventsPath)
      EventStreams.runToMemory(
        EventStreams.tumblingCounts(stream), "tumble_rocks",
        OutputMode.Complete())
    }
    assert(spark.conf.getOption(key) == before)
    val got = spark.sql("SELECT win_start, event_type, cnt FROM tumble_rocks")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val want = batchEvents
      .groupBy(date_trunc("hour", col("ts")).as("win_start"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("stream-stream join state is watermark-bounded, not history-bounded (RocksDB)") {
    // The deployability claim behind clickPurchaseJoin's two-sided time
    // bound: replay 30 days of events as 24 time-ordered micro-batches
    // under the RocksDB provider and read numRowsTotal off the state
    // metrics per batch. A join whose state tracked STREAM HISTORY
    // would grow linearly with ingested rows; the watermark-bounded
    // join must plateau at the rows inside its ~40-minute window —
    // i.e. state stays O(one slice's join-side rows) with a one-batch
    // eviction lag, regardless of how much history has flowed through.
    val slices = 24
    val profile = EventStreams.withRocksDbStateStore(spark) {
      EventStreams.stateSizeProfile(spark, batchEvents, slices,
        tmpDir("state_profile"), s => EventStreams.clickPurchaseJoin(s))
    }
    // AvailableNow appends one zero-input watermark-flush batch after
    // the data — keep the data batches (slice k ↔ batch k) for the
    // per-slice bounds
    val data = profile.filter(_._1 > 0)
    assert(data.size == slices, s"expected $slices data batches in $profile")
    // the join subscribes to the event source TWICE (click and purchase
    // branches), so progress input rows are 2× the file rows
    val ingested = data.map(_._1).sum
    assert(ingested == 2 * batchEvents.count())
    // per-slice join-input rows (clicks+purchases), same slice formula
    val b = batchEvents.agg(min(col("ts")).cast("long").as("lo"),
      max(col("ts")).cast("long").as("hi")).head()
    val (lo, span) = (b.getLong(0), b.getLong(1) - b.getLong(0) + 1)
    val cp = batchEvents
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(floor((col("ts").cast("long") - lo) * slices / span)
        .as("slice"))
      .count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    data.zipWithIndex.drop(1).foreach { case ((_, state), k) =>
      val window = cp.getOrElse(k.toLong, 0L) + cp.getOrElse(k - 1L, 0L)
      // factor 3 covers the join's dual state representation plus
      // boundary rows still inside the watermark+bound window
      assert(state <= 3 * window + 20,
        s"batch $k state $state exceeds the watermark window bound " +
          s"(${3 * window + 20}) — state is growing with history")
    }
    // headline: after 30 days of history the state holds a small
    // fraction of what was ingested
    assert(profile.last._2 * 4 < ingested,
      s"final state ${profile.last._2} vs ingested $ingested")
  }
}
