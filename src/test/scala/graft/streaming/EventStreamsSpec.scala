package graft.streaming

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class EventStreamsSpec extends SparkSpec {
  import EventStreams._
  import spark.implicits._

  // base offset keeps event times strictly above the initial watermark
  // (epoch 0), which would otherwise drop the first event as late
  private def ts(minutes: Long) = new Timestamp((600 + minutes) * 60_000L)

  test("hourlyCounts on a stream emits finalized windows after the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = hourlyCounts(mem.toDF(), watermark = "30 minutes")
      .writeStream.format("memory").queryName("hourly_test")
      .outputMode("append").start()
    try {
      // hour 0: two clicks; hour 1: one view
      mem.addData(
        Event(1, ts(5), 1, "click", 1.0),
        Event(2, ts(20), 2, "click", 2.0),
        Event(3, ts(70), 1, "view", 5.0))
      q.processAllAvailable()
      // watermark is still inside hour 1 → nothing finalized yet
      // push event time far ahead → hour 0 and 1 windows close
      mem.addData(Event(4, ts(300), 3, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("hourly_test")
        .select("hour_start", "event_type", "n", "sum_value")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(rows == Set(
        (ts(0), "click", 2L, 3.0),
        (ts(60), "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("hourlyP95 emits finalized sketch windows that equal the batch twin exactly") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = hourlyP95(mem.toDF(), watermark = "30 minutes")
      .writeStream.format("memory").queryName("p95_test")
      .outputMode("append").start()
    try {
      val evs = (1 to 40).map(i =>
        Event(i, ts(i % 55), i, "click", i * 2.5)) :+
        Event(41, ts(70), 41, "view", 7.0)
      mem.addData(evs: _*)
      q.processAllAvailable()
      mem.addData(Event(99, ts(300), 9, "view", 1.0)) // advance watermark
      q.processAllAvailable()
      val streamed = spark.table("p95_test")
        .select("hour_start", "p95", "n")
        .as[(Timestamp, Double, Long)].collect().toSet
      assert(streamed.map(_._1) == Set(ts(0), ts(60)))
      // batch twin over the same events: bit-identical sketches ⇒
      // EXACTLY equal estimates, merge order and triggering be damned
      val batch = hourlyP95(spark.createDataset(evs).toDF())
        .select("hour_start", "p95", "n")
        .as[(Timestamp, Double, Long)].collect()
        .filter(r => r._1 == ts(0) || r._1 == ts(60)).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("hourlyCounts batch twin produces the q22 shape on static data") {
    val batch = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val out = hourlyCounts(batch)
    assert(out.count() > 0)
    assert(out.columns.toSeq ==
      Seq("hour_start", "event_type", "n", "sum_value"))
  }

  test("dedupEvents drops replayed ids within the watermark, batch twin dedups exactly") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = dedupEvents(mem.toDF(), Seq("event_id"), watermark = "30 minutes")
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      mem.addData(
        Event(1, ts(5), 1, "click", 1.0),
        Event(1, ts(5), 1, "click", 1.0),   // same-batch replay
        Event(2, ts(6), 2, "view", 2.0))
      q.processAllAvailable()
      mem.addData(Event(1, ts(7), 1, "click", 1.0))  // cross-batch replay
      q.processAllAvailable()
      val ids = spark.table("dedup_test").select("event_id")
        .as[Long].collect().toSeq.sorted
      assert(ids == Seq(1L, 2L))
    } finally q.stop()
    // batch twin: plain exact dedup
    val batch = Seq(
      Event(7, ts(0), 1, "c", 1.0), Event(7, ts(0), 1, "c", 1.0))
      .toDF()
    assert(dedupEvents(batch, Seq("event_id")).count() == 1)
  }

  test("enrich joins a broadcast dimension onto each micro-batch, left-outer") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val dim = Seq((1L, "emea"), (2L, "apac")).toDF("user_id", "region")
    val q = enrich(mem.toDF(), dim, Seq("user_id"))
      .select("event_id", "user_id", "region")
      .writeStream.format("memory").queryName("enrich_test")
      .outputMode("append").start()
    try {
      mem.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(1), 2, "view", 2.0),
        Event(3, ts(2), 99, "click", 3.0)) // no dim row → region null
      q.processAllAvailable()
      val rows = spark.table("enrich_test")
        .as[(Long, Long, Option[String])].collect().toSet
      assert(rows == Set(
        (1L, 1L, Some("emea")), (2L, 2L, Some("apac")), (3L, 99L, None)))
    } finally q.stop()
  }

  test("intervalJoin pairs each purchase with clicks in its lookback window, stream-stream") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val buys = MemoryStream[Event]
    val joined = intervalJoin(
      buys.toDF().select($"user_id", $"ts".as("buy_ts"),
        $"event_id".as("buy_id")),
      clicks.toDF().select($"user_id", $"ts".as("click_ts"),
        $"event_id".as("click_id")),
      "user_id", "buy_ts", "click_ts", lookback = "30 minutes",
      watermark = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("ij_test")
      .outputMode("append").start()
    try {
      clicks.addData(
        Event(100, ts(0), 1, "click", 0),   // within 30 min of buy@20
        Event(101, ts(15), 1, "click", 0),  // within
        Event(102, ts(19), 2, "click", 0),  // other user
        Event(103, ts(60), 1, "click", 0))  // after the buy
      buys.addData(Event(200, ts(20), 1, "purchase", 0))
      q.processAllAvailable()
      // push both watermarks forward so results finalize (distinct
      // users so the pushers can't join with each other)
      clicks.addData(Event(110, ts(300), 8, "click", 0))
      buys.addData(Event(210, ts(300), 9, "purchase", 0))
      q.processAllAvailable()
      val out = spark.table("ij_test")
        .select("buy_id", "click_id").as[(Long, Long)].collect().toSet
      assert(out == Set((200L, 100L), (200L, 101L)))
    } finally q.stop()
  }

  test("intervalJoin batch twin matches the as-of-family semantics on static frames") {
    val buys = Seq((1L, ts(20), 200L)).toDF("user_id", "buy_ts", "buy_id")
    val clicks = Seq(
      (1L, ts(0), 100L), (1L, ts(15), 101L),
      (2L, ts(19), 102L), (1L, ts(60), 103L))
      .toDF("user_id", "click_ts", "click_id")
    val out = intervalJoin(buys, clicks, "user_id", "buy_ts", "click_ts",
        lookback = "30 minutes")
      .select("buy_id", "click_id").as[(Long, Long)].collect().toSet
    assert(out == Set((200L, 100L), (200L, 101L)))
  }

  test("upsertSink merges micro-batches latest-wins into a parquet target") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/tmp/graft_upsert_sink"
    val ckpt = "/tmp/graft_upsert_ckpt"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    val mem = MemoryStream[Event]
    val q = upsertSink(
      mem.toDF().select($"event_id", $"value", $"ts"),
      dir, ckpt, Seq("event_id"), "value")
    try {
      mem.addData(Event(1, ts(0), 1, "a", 1.0), Event(2, ts(1), 1, "a", 1.0))
      q.processAllAvailable()
      mem.addData(Event(1, ts(2), 1, "a", 2.0), Event(3, ts(3), 1, "a", 1.0))
      q.processAllAvailable()
      val state = spark.read.parquet(dir)
        .select("event_id", "value").as[(Long, Double)].collect().toSet
      assert(state == Set((1L, 2.0), (2L, 1.0), (3L, 1.0)))
    } finally q.stop()
  }

  test("sessionize closes sessions on event-time gaps and timeouts") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = sessionize(mem.toDS(), gapMinutes = 10, watermark = "5 minutes")
      .writeStream.format("memory").queryName("session_test")
      .outputMode("append").start()
    try {
      // user 1: events at 0,5 min (one session), then 30 min (new session)
      mem.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(5), 1, "click", 2.0),
        Event(3, ts(30), 1, "view", 3.0))
      q.processAllAvailable()
      // advance watermark far enough to time out the open session
      mem.addData(Event(9, ts(120), 2, "click", 0.5))
      q.processAllAvailable()
      mem.addData(Event(10, ts(300), 2, "click", 0.5))
      q.processAllAvailable()
      val sess = spark.table("session_test")
        .filter($"user_id" === 1)
        .select("start_ts", "end_ts", "n_events", "sum_value")
        .as[(Timestamp, Timestamp, Long, Double)].collect().toSet
      assert(sess == Set(
        (ts(0), ts(5), 2L, 3.0),
        (ts(30), ts(30), 1L, 3.0)))
    } finally q.stop()
  }

  test("soak: intervalJoin state stays watermark-bounded across 100 micro-batches") {
    // MemoryStream, not a rate source: batch boundaries and event times
    // must be deterministic for the state-size assertion to be exact.
    implicit val sqlCtx = spark.sqlContext
    val lmem = MemoryStream[Event]
    val rmem = MemoryStream[Event]
    val left = lmem.toDF().select($"user_id", $"ts".as("buy_ts"),
      $"event_id".as("buy_id"))
    val right = rmem.toDF().select($"user_id", $"ts".as("click_ts"),
      $"event_id".as("click_id"))
    val q = intervalJoin(left, right, "user_id", "buy_ts", "click_ts",
        lookback = "10 minutes", watermark = "30 minutes")
      .writeStream.format("memory").queryName("soak_ij")
      .outputMode("append").start()
    try {
      var id = 0L
      (0 until 100).foreach { b =>
        val t = b * 10L // event time advances 10 minutes per batch
        lmem.addData(Event(id + 1, ts(t), b % 5, "buy", 1.0))
        rmem.addData(Event(id + 2, ts(t), b % 5, "click", 1.0),
          Event(id + 3, ts(t - 5), b % 5, "click", 1.0))
        id += 3
        q.processAllAvailable()
      }
      // 1000 event-minutes ingested (300 rows); buffered join state may
      // only hold ~watermark+lookback = 40 minutes of both sides. An
      // eviction regression (watermark not applied to the buffers)
      // would leave ~300 rows here.
      val totalState = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(totalState > 0 && totalState < 120,
        s"join buffers not watermark-bounded: $totalState state rows")
      // inner joins emit on match: same-ts and ts-5 clicks pair with
      // every purchase, so output grows with the stream
      assert(spark.table("soak_ij").count() >= 150)
    } finally q.stop()
  }

  test("soak: upsertSink converges over 50 batches and replays idempotently") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/tmp/graft_upsert_soak"
    Seq(dir, s"${dir}_ckpt", s"${dir}_ckpt2").foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    val mem = MemoryStream[Event]
    val q = upsertSink(mem.toDF().select($"event_id", $"value", $"ts"),
      dir, s"${dir}_ckpt", Seq("event_id"), "value")
    try {
      (0 until 50).foreach { b =>
        // rotating 20-key space, strictly increasing version
        mem.addData(Event(b % 20, ts(b), 1, "a", b.toDouble),
          Event((b + 7) % 20, ts(b), 1, "a", b.toDouble))
        q.processAllAvailable()
      }
      val fin = spark.read.parquet(dir).select("event_id", "value")
        .as[(Long, Double)].collect().toMap
      val expected = (0 until 50)
        .flatMap(b => Seq((b % 20).toLong -> b.toDouble,
          ((b + 7) % 20).toLong -> b.toDouble))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
      assert(fin == expected)
      // replay: a fresh query (new checkpoint) re-merges the final
      // batch into the same target — latest-wins must be a no-op
      val mem2 = MemoryStream[Event]
      val q2 = upsertSink(mem2.toDF().select($"event_id", $"value", $"ts"),
        dir, s"${dir}_ckpt2", Seq("event_id"), "value")
      try {
        mem2.addData(Event(49 % 20, ts(49), 1, "a", 49.0),
          Event((49 + 7) % 20, ts(49), 1, "a", 49.0))
        q2.processAllAvailable()
      } finally q2.stop()
      val replayed = spark.read.parquet(dir).select("event_id", "value")
        .as[(Long, Double)].collect().toMap
      assert(replayed == fin, "replaying an already-applied batch changed the target")
    } finally q.stop()
  }
}
