package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{FakeDecoder, Multimodal}
import graft.streaming.EventStreams

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** events.parquet copied into its own dir (streams read directories). */
  private lazy val eventsDir: String = {
    val d = Files.createTempDirectory("graft-events")
    Files.copy(
      Path.of("/root/testdata/sf0.001/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  test("readEventStream: empty dir falls back to the declared schema; junk errors surface") {
    // empty (no data files yet): the declared fallback schema is used and
    // the stream is analyzable — a stream may legitimately start before
    // its first files land
    val empty = Files.createTempDirectory("graft-empty-stream")
    try {
      val s = EventStreams.readEventStream(spark, empty.toString)
      assert(s.isStreaming && s.columns.contains("ts_ns"))
    } finally Files.deleteIfExists(empty)

    // a dir WITH data files that fail the batch peek is a real error and
    // must throw, not silently pick a schema (the pre-r8 behavior)
    val junk = Files.createTempDirectory("graft-junk-stream")
    try {
      Files.write(junk.resolve("part-0000.parquet"),
        "this is not parquet".getBytes("UTF-8"))
      intercept[Exception] {
        EventStreams.readEventStream(spark, junk.toString)
      }
    } finally {
      Files.deleteIfExists(junk.resolve("part-0000.parquet"))
      Files.deleteIfExists(junk)
    }
  }

  test("session_window equals a driver islands reference on adversarial gaps (ties, exact 30-min boundaries)") {
    // the st03 oracle's replay assumptions, pinned as a unit property:
    // identical-ts events share a session; a gap of EXACTLY the window
    // size starts a new session (session end is exclusive); micros
    // precision decides boundary events
    val gapUs = 1800000000L // 30 min
    val rnd = new scala.util.Random(13)
    val events = (1 to 300).map { i =>
      val user = rnd.nextInt(4).toLong
      val base = 1700000000000000L + rnd.nextInt(5) * gapUs
      val us = rnd.nextInt(6) match {
        case 0 => base                      // duplicate-ts candidates
        case 1 => base + gapUs              // exact boundary
        case 2 => base + gapUs - 1L         // just inside
        case 3 => base + gapUs + 1L         // just outside
        case _ => base + math.abs(rnd.nextLong() % (3L * gapUs))
      }
      (i.toLong, user, us)
    }
    def refSessions(evs: Seq[(Long, Long, Long)]): Map[(Long, Long), Long] =
      evs.groupBy(_._2).flatMap { case (user, rows) =>
        val sorted = rows.map(_._3).sorted
        val sessions = sorted.foldLeft(List.empty[List[Long]]) {
          case (Nil, us) => List(List(us))
          case (cur :: done, us) =>
            if (us - cur.head >= gapUs) List(us) :: cur :: done
            else (us :: cur) :: done
        }
        sessions.map(s => (user, s.min) -> s.size.toLong)
      }
    val df = spark.createDataFrame(events).toDF("event_id", "user_id", "us")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(col("us")))
    val got = df
      .groupBy(org.apache.spark.sql.functions.session_window(col("ts"), "30 minutes"),
        col("user_id"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .selectExpr("user_id", "unix_micros(session_window.start) AS start_us", "n")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == refSessions(events), {
      val want = refSessions(events)
      s"diff: got-only=${got.toSet -- want.toSet} want-only=${want.toSet -- got.toSet}"
    })
  }

  test("sliding window() assignment equals the 4-offset epoch arithmetic (st02's oracle replay)") {
    // every event lands in exactly window/slide = 4 epoch-aligned
    // windows with starts (floor(sec/900) - k) * 900, k = 0..3 — the
    // arithmetic the st02 DuckDB oracle uses
    val rnd = new scala.util.Random(29)
    val events = (1 to 200).map { i =>
      // arbitrary micros incl. sub-second parts and 900s-boundary hits
      val us = 1700000000000000L + (rnd.nextInt(100000) * 900000L) +
        (if (rnd.nextBoolean()) 0L else rnd.nextInt(900000000))
      (i.toLong, us)
    }
    val want = events.flatMap { case (_, us) =>
      val sec = us / 1000000L
      (0 to 3).map(k => (sec / 900L - k) * 900L)
    }.groupBy(identity).map { case (ws, xs) => ws -> xs.size.toLong }
    val df = spark.createDataFrame(events).toDF("event_id", "us")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(col("us")))
    val got = df
      .groupBy(org.apache.spark.sql.functions.window(
        col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .selectExpr("CAST(unix_micros(w.start) DIV 1000000 AS BIGINT) AS ws", "n")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want,
      s"diff: got-only=${got.toSet -- want.toSet} want-only=${want.toSet -- got.toSet}")
  }

  test("streaming tumbling window equals the batch computation") {
    val stream = EventStreams.readEventStream(spark, eventsDir)
    val streamed = EventStreams.runToMemory(
      spark, EventStreams.tumblingCounts(stream, "1 hour"), "t_tumbling")
      .select(col("window.start").as("ws"), col("event_type"), col("n"))

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batch = EventStreams.tumblingCounts(
      EventStreams.normalize(spark.read.parquet(eventsDir)), "1 hour")
      .select(col("window.start").as("ws"), col("event_type"), col("n"))

    val s = streamed.collect().map(r => (r.get(0).toString, r.getString(1)) -> r.getLong(2)).toMap
    val b = batch.collect().map(r => (r.get(0).toString, r.getString(1)) -> r.getLong(2)).toMap
    assert(s == b, s"stream=${s.size} batch=${b.size}")
    assert(b.nonEmpty)
  }

  test("session windows produce bounded per-user sessions") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batch = EventStreams.sessionCounts(
      EventStreams.normalize(spark.read.parquet(eventsDir)), "30 minutes")
    val rows = batch.collect()
    assert(rows.nonEmpty)
    // session event counts sum to the total event count
    assert(rows.map(_.getAs[Long]("n_events")).sum ==
      spark.read.parquet(eventsDir).count())
  }

  test("sliding windows: each event lands in window/slide buckets") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batch = EventStreams.slidingUsers(
      EventStreams.normalize(spark.read.parquet(eventsDir)), "1 hour", "15 minutes")
    assert(batch.count() > 0)
  }

  test("watermark drops late data and bounds window state (append mode)") {
    import java.sql.Timestamp
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-late").toString
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType),
      StructField("value", DoubleType)))
    def write(batch: Seq[(Long, String, Double)], file: String): Unit = {
      val rows = batch.map { case (u, t, v) =>
        org.apache.spark.sql.Row(u, Timestamp.valueOf(t), v) }
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
        .write.mode("overwrite").parquet(s"$dir/$file")
    }
    write(Seq(
      (1L, "2024-01-01 10:05:00", 1.0),
      (1L, "2024-01-01 10:15:00", 1.0),
      (1L, "2024-01-01 10:29:00", 1.0)), "b1")

    val stream = spark.readStream.schema(schema).parquet(s"$dir/*")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"))
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("late_test")
      .trigger(Trigger.ProcessingTime("500 milliseconds")).start()
    try {
      q.processAllAvailable() // watermark -> 10:29 - 10min = 10:19
      // batch 2: one event far below the watermark + one advancing it
      write(Seq(
        (1L, "2024-01-01 09:00:30", 99.0), // LATE: window closed, must drop
        (1L, "2024-01-01 11:00:00", 1.0)), "b2")
      q.processAllAvailable()
      write(Seq((1L, "2024-01-01 12:00:00", 1.0)), "b3") // flush 11:00 window
      q.processAllAvailable()
      val windows = spark.table("late_test")
        .select(col("window.start").cast("string"), col("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(!windows.keySet.exists(_.contains("09:00")),
        s"late event created a window: $windows")
      assert(windows("2024-01-01 10:00:00") == 1L)
      assert(windows("2024-01-01 10:10:00") == 1L)
      assert(windows("2024-01-01 11:00:00") == 1L)
    } finally q.stop()
  }

  test("stateful sessionize (mapGroupsWithState) matches the window-function result") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = EventStreams.normalize(spark.read.parquet(eventsDir))
    val stateful = EventStreams.statefulSessionize(raw, gapSeconds = 1800L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // independent computation via the oracle-checked st01 query shape
    val viaSql = SparkEntry.queries("st01_user_sessions")(spark,
      "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(stateful == viaSql)
  }

  test("stream-stream interval join equals its batch computation") {
    import org.apache.spark.sql.streaming.Trigger
    val mkStream = () => EventStreams.readEventStream(spark, eventsDir, "1 hour")
    val views = mkStream().filter(col("event_type") === "view")
    val purchases = mkStream().filter(col("event_type") === "purchase")
    // stream-stream joins emit in append mode; aggregate the sink table
    val joined = EventStreams.intervalJoin(views, purchases, "30 minutes")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("ssj")
      .groupBy(col("l_user")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batch = EventStreams.normalize(spark.read.parquet(eventsDir))
    val expected = EventStreams.intervalJoin(
        batch.filter(col("event_type") === "view"),
        batch.filter(col("event_type") === "purchase"), "30 minutes")
      .groupBy(col("l_user")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == expected)
    assert(expected.nonEmpty)
  }

  /** Write one parquet file of event-schema rows (ts in NANOS, like the
    * driver tables) under `dir/name`. */
  private def writeEventFile(
      dir: String, name: String, rows: Seq[(Long, Long, String)]): Unit = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val data = rows.zipWithIndex.map { case ((u, sec, et), i) =>
      org.apache.spark.sql.Row(i.toLong, sec * 1000000000L, u, et, 1.0, "{}")
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data, 1), schema)
      .write.mode("overwrite").parquet(s"$dir/$name")
  }

  test("streaming sessionize: EVENT-TIME TIMEOUT expires state and emits the session") {
    import org.apache.spark.sql.streaming.Trigger
    val base = 1700000000L
    val dir = Files.createTempDirectory("graft-sess").toString
    writeEventFile(dir, "b1", Seq(
      (1L, base, "view"), (1L, base + 10, "view"), (1L, base + 20, "view")))
    val sessions = EventStreams.statefulSessionizeStreaming(
      EventStreams.readEventStream(spark, s"$dir/*", "10 minutes"),
      gapSeconds = 60L)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_timeout")
      .trigger(Trigger.ProcessingTime("500 milliseconds")).start()
    try {
      q.processAllAvailable()
      // session still open: nothing emitted, state held
      assert(spark.table("sess_timeout").isEmpty)
      // a much later event advances the watermark past lastEvent + gap →
      // the no-data batch fires the event-time timeout for user 1
      writeEventFile(dir, "b2", Seq((99L, base + 7200, "view")))
      q.processAllAvailable()
      val rows = spark.table("sess_timeout").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      assert(rows.keySet == Set(1L),
        s"expected only the timed-out user-1 session, got $rows")
      assert(rows(1L) == ((base, base + 20, 3L)))
    } finally q.stop()
  }

  test("streaming sessionize: out-of-order event above the watermark extends, never rewinds") {
    import org.apache.spark.sql.streaming.Trigger
    val base = 1700000000L
    val dir = Files.createTempDirectory("graft-sess-ooo").toString
    writeEventFile(dir, "b1", Seq(
      (1L, base, "view"), (1L, base + 30, "view"), (1L, base + 55, "view")))
    val sessions = EventStreams.statefulSessionizeStreaming(
      EventStreams.readEventStream(spark, s"$dir/*", "10 minutes"),
      gapSeconds = 60L)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_ooo")
      .trigger(Trigger.ProcessingTime("500 milliseconds")).start()
    try {
      q.processAllAvailable()
      // out-of-order but above the watermark: t=base+10 arrives AFTER
      // t=base+55 was absorbed — must merge into the span, not rewind it
      writeEventFile(dir, "b2", Seq((1L, base + 10, "view")))
      q.processAllAvailable()
      // advance the watermark far past lastSec + gap → timeout emits
      writeEventFile(dir, "b3", Seq((99L, base + 7200, "view")))
      q.processAllAvailable()
      val rows = spark.table("sess_ooo").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      assert(rows.keySet == Set(1L), s"got $rows")
      // span stays [base, base+55]; the late event only adds to the count
      assert(rows(1L) == ((base, base + 55, 4L)), s"got ${rows(1L)}")
    } finally q.stop()
  }

  test("interval join: late event beyond the watermark is DROPPED, not joined") {
    import org.apache.spark.sql.streaming.Trigger
    val base = 1700000000L
    val ldir = Files.createTempDirectory("graft-ij-left").toString
    val rdir = Files.createTempDirectory("graft-ij-right").toString
    writeEventFile(ldir, "l1", Seq((1L, base, "view"), (2L, base + 60, "view")))
    // user 1's purchase is on time; user 99 only advances the watermark
    writeEventFile(rdir, "r1", Seq(
      (1L, base + 600, "purchase"), (99L, base + 10800, "purchase")))
    val joined = EventStreams.intervalJoin(
      EventStreams.readEventStream(spark, s"$ldir/*", "10 minutes"),
      EventStreams.readEventStream(spark, s"$rdir/*", "10 minutes"),
      "30 minutes")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ij_late")
      .trigger(Trigger.ProcessingTime("500 milliseconds")).start()
    try {
      q.processAllAvailable()
      // the GLOBAL watermark is the min across both streams — advance the
      // left side too, so it passes base+10200 on both
      writeEventFile(ldir, "l2", Seq((98L, base + 10800, "view")))
      q.processAllAvailable()
      // user 2's matching purchase arrives AFTER the global watermark moved
      // to base+10200: inside the join interval, but late → dropped
      writeEventFile(rdir, "r2", Seq((2L, base + 720, "purchase")))
      q.processAllAvailable()
      val users = spark.table("ij_late").select(col("l_user"))
        .collect().map(_.getLong(0)).toSet
      assert(users == Set(1L),
        s"late right-side event must not join; joined users: $users")
    } finally q.stop()
  }

  test("streaming curation: filters + exact dedup with bounded state (duality with batch)") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-cur-stream").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("ts", TimestampType),
      StructField("text", StringType)))
    val good =
      "the quick brown fox is one of the animals that live in the forest " +
      "and it hunts for food while the sun is up in the sky over the trees"
    def write(file: String, rows: Seq[(Long, String, String)]): Unit = {
      val data = rows.map { case (id, t, txt) =>
        org.apache.spark.sql.Row(id, java.sql.Timestamp.valueOf(t), txt) }
      spark.createDataFrame(spark.sparkContext.parallelize(data, 1), schema)
        .write.mode("overwrite").parquet(s"$dir/$file")
    }
    write("b1", Seq(
      (1L, "2024-01-01 10:00:00", good),
      (2L, "2024-01-01 10:01:00", "too short"),
      (3L, "2024-01-01 10:02:00", good + " but different tail entirely")))
    val stream = spark.readStream.schema(schema).parquet(s"$dir/*")
    val curated = graft.operators.Curation.curateStream(
      stream, "doc_id", "text", "ts", watermark = "1 hour")
    val q = curated.writeStream.outputMode("append")
      .format("memory").queryName("cur_stream")
      .trigger(Trigger.ProcessingTime("500 milliseconds")).start()
    try {
      q.processAllAvailable()
      // batch 2: an exact duplicate of doc 1 within the watermark → dropped
      write("b2", Seq(
        (4L, "2024-01-01 10:30:00", good),
        (5L, "2024-01-01 10:31:00", good + " yet another distinct variant")))
      q.processAllAvailable()
      val ids = spark.table("cur_stream").select(col("doc_id"))
        .collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 3L, 5L),
        s"expected dup 4 and short 2 dropped, got $ids")
    } finally q.stop()
  }

  test("dedupLinesKeepFirstStream: watermarked first-owner equals batch keep-first") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-linedup-stream").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("ts", TimestampType),
      StructField("text", StringType)))
    def write(file: String, rows: Seq[(Long, String, String)]): Unit = {
      val data = rows.map { case (id, t, txt) =>
        org.apache.spark.sql.Row(id, java.sql.Timestamp.valueOf(t), txt) }
      spark.createDataFrame(spark.sparkContext.parallelize(data, 1), schema)
        .write.mode("overwrite").parquet(s"$dir/$file")
    }
    // docs arrive ONE PER MICRO-BATCH in id order (the documented contract
    // under which stream ownership == batch's min-(id,pos) ownership); no
    // intra-doc duplicate lines (the documented arbitrary-occurrence case)
    val d1 = "alpha alpha alpha one\nshort\nbeta beta beta two"
    val d2 = "alpha alpha alpha one\ngamma gamma gamma three"
    val d3 = "beta beta beta two\ndelta delta delta four"
    val d4 = "alpha alpha alpha one\nbeta beta beta two" // fully owned
    val stream = spark.readStream.schema(schema).parquet(s"$dir/*")
    val out = graft.operators.Dedup.dedupLinesKeepFirstStream(
      stream, "doc_id", "text", "ts",
      watermark = "10 seconds", windowDur = "1 minute")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("linedup_stream")
      .trigger(Trigger.ProcessingTime("500 milliseconds")).start()
    try {
      write("b1", Seq((1L, "2024-01-01 10:00:00", d1)))
      q.processAllAvailable()
      write("b2", Seq((2L, "2024-01-01 10:00:05", d2)))
      q.processAllAvailable()
      write("b3", Seq((3L, "2024-01-01 10:00:10", d3)))
      q.processAllAvailable()
      write("b4", Seq((4L, "2024-01-01 10:00:15", d4)))
      q.processAllAvailable()
      // flush: advance the watermark far past the 10:00-10:01 window so
      // the append-mode groups close and emit
      write("b5", Seq((99L, "2024-01-01 10:30:00", "flush marker line xyz")))
      q.processAllAvailable()
      val got = spark.table("linedup_stream")
        .select(col("doc_id"), col("text"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      // batch reference over the same docs (same ownership: id order)
      import spark.implicits._
      val batchDocs = Seq((1L, d1), (2L, d2), (3L, d3), (4L, d4))
        .toDF("doc_id", "text")
      val want = graft.operators.Dedup
        .dedupLinesKeepFirst(batchDocs, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got.contains(1L) && got.contains(2L) && got.contains(3L))
      for (id <- Seq(1L, 2L, 3L)) assert(got(id) == want(id),
        s"doc $id: stream='${got(id)}' batch='${want(id)}'")
      // doc 4 is fully owned elsewhere: batch emits it with empty text,
      // the stream emits NO row — the documented divergence, pinned
      assert(want(4L) == "" && !got.contains(4L))
    } finally q.stop()
  }

  test("urlDedupStream: first arrival owns each canonical URL; junk rows all survive") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-urldup-stream").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("ts", TimestampType),
      StructField("url", StringType)))
    def write(file: String, rows: Seq[(Long, String, String)]): Unit = {
      val data = rows.map { case (id, t, u) =>
        org.apache.spark.sql.Row(id, java.sql.Timestamp.valueOf(t), u) }
      spark.createDataFrame(spark.sparkContext.parallelize(data, 1), schema)
        .write.mode("overwrite").parquet(s"$dir/$file")
    }
    val stream = spark.readStream.schema(schema).parquet(s"$dir/*")
    val out = graft.operators.Dedup.urlDedupStream(
      stream, "doc_id", "url", "ts", watermark = "10 seconds")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("urldup_stream")
      .trigger(Trigger.ProcessingTime("500 milliseconds")).start()
    try {
      write("b1", Seq(
        (1L, "2024-01-01 10:00:00", "http://a.com/x?utm_source=nl"),
        (2L, "2024-01-01 10:00:00", "junk one")))
      q.processAllAvailable()
      write("b2", Seq(
        (3L, "2024-01-01 10:00:05", "HTTP://A.COM:80/x"), // dup of id 1
        (4L, "2024-01-01 10:00:05", "http://a.com/y"),
        (5L, "2024-01-01 10:00:05", "junk two")))
      q.processAllAvailable()
      val got = spark.table("urldup_stream")
        .select(col("doc_id"), col("url_canon"))
        .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      // first arrival owns http://a.com/x; the re-canonicalized copy
      // (id 3) drops; both unparseable rows survive with null canonical
      assert(got.keySet == Set(1L, 2L, 4L, 5L), s"got $got")
      assert(got(1L) == Some("http://a.com/x"))
      assert(got(4L) == Some("http://a.com/y"))
      assert(got(2L).isEmpty && got(5L).isEmpty)
    } finally q.stop()
  }

  test("nearDupAgainstIndex works as a stream-static join (stateless per batch)") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val index = graft.operators.Dedup.minhashIndex(corpus, "doc_id", "text")
      .localCheckpoint() // static side materialized once
    val knownText = corpus.orderBy("doc_id").limit(1)
      .select(col("text")).head().getString(0)
    val dir = Files.createTempDirectory("graft-inc-dedup").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def write(file: String, rows: Seq[(Long, String)]): Unit =
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          rows.map { case (i, t) => org.apache.spark.sql.Row(i, t) }, 1),
        schema).write.mode("overwrite").parquet(s"$dir/$file")
    write("b1", Seq((200000L, knownText),
      (200001L, "novel streaming text qwerty asdf zxcv poiu lkjh mnbv " +
        "unseen tokens only here")))
    val stream = spark.readStream.schema(schema).parquet(s"$dir/*")
    val hits = graft.operators.Dedup.nearDupAgainstIndex(
      stream, "doc_id", "text", index)
    val q = hits.writeStream.outputMode("append")
      .format("memory").queryName("inc_dedup")
      .trigger(Trigger.ProcessingTime("500 milliseconds")).start()
    try {
      q.processAllAvailable()
      val ids = spark.table("inc_dedup").select(col("id"))
        .collect().map(_.getLong(0)).toSet
      assert(ids == Set(200000L),
        s"streamed dup must match, novel must not: $ids")
    } finally q.stop()
  }

  test("winnowing + CDC run on STREAMS: row-local selection is streaming-legal") {
    // the first winnowing cut used a window function (illegal on
    // streams); the row-local form and cdcChunks are stateless
    // projections, so arriving docs can be checked against a static
    // corpus fingerprint index — the incremental-dedup shape
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val index = graft.operators.Dedup
      .winnowingFingerprints(corpus, "doc_id", "text")
      .select(col("fp"), col("doc_id").as("corpus_id"))
      .localCheckpoint()
    val knownText = corpus.orderBy("doc_id").limit(1)
      .select(col("text")).head().getString(0)
    val dir = Files.createTempDirectory("graft-stream-fp").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(300000L, knownText),
        org.apache.spark.sql.Row(300001L,
          "fresh streaming words zanzibar quixotic vellum " +
            "ytterbium numinous gossamer lambent")), 1),
      schema).write.mode("overwrite").parquet(s"$dir/b1")
    val stream = spark.readStream.schema(schema).parquet(s"$dir/*")
    // fingerprint the arriving docs and join the static index
    val flagged = graft.operators.Dedup
      .winnowingFingerprints(stream, "doc_id", "text")
      .join(index, Seq("fp"))
      .select(col("doc_id"), col("corpus_id"))
    val q = flagged.writeStream.outputMode("append")
      .format("memory").queryName("stream_fp")
      .trigger(Trigger.ProcessingTime("500 milliseconds")).start()
    try {
      q.processAllAvailable()
      val ids = spark.table("stream_fp").select(col("doc_id"))
        .collect().map(_.getLong(0)).toSet
      assert(ids == Set(300000L),
        s"known doc must share fingerprints, novel must not: $ids")
    } finally q.stop()
    // cdcChunks on the same stream: chunks flow statelessly
    val chunks = graft.operators.Dedup.cdcChunks(stream, "doc_id", "text")
    val q2 = chunks.writeStream.outputMode("append")
      .format("memory").queryName("stream_cdc")
      .trigger(Trigger.ProcessingTime("500 milliseconds")).start()
    try {
      q2.processAllAvailable()
      assert(spark.table("stream_cdc").count() > 0)
    } finally q2.stop()
  }

  test("blocklist gate + z-value run on STREAMS: row-local policy/layout is streaming-legal") {
    // both are stateless projections, so the ingest-time gate and the
    // layout key compute per micro-batch with zero state — and must
    // equal the batch computation on the same rows
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-stream-bl").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val rows = Seq(
      org.apache.spark.sql.Row(1L, "a clean page"),
      org.apache.spark.sql.Row(2L, "the bad word appears"),
      org.apache.spark.sql.Row(3L, "badge of honor"))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(s"$dir/b1")
    val stream = spark.readStream.schema(schema).parquet(s"$dir/*")
    def gated(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Curation.blocklistGate(df, "doc_id", "text", Seq("bad"))
        .withColumn("z", graft.operators.Layout.zValue(Seq(
          graft.operators.Layout.quantize(col("doc_id"), 0L, 15L, 2),
          graft.operators.Layout.quantize(col("n_hits"), 0L, 3L, 2)), 2))
    val q = gated(stream).writeStream.outputMode("append")
      .format("memory").queryName("stream_bl")
      .trigger(Trigger.ProcessingTime("500 milliseconds")).start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("stream_bl")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getBoolean(2), r.getLong(3))).toSet
      val batch = gated(spark.read.parquet(s"$dir/b1"))
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getBoolean(2), r.getLong(3))).toSet
      assert(streamed == batch && streamed.size == 3)
      assert(streamed.count(!_._3) == 1) // only doc 2 is gated out
    } finally q.stop()
    // turnStats is the same class of row-local projection: its own
    // stream≡batch pin (a plain-text doc parses as role-less lines,
    // so n_bad_role >= 1 and keep = false on every row)
    def qaStats(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Conversations.turnStats(df, "doc_id", "text")
        .select(col("doc_id"), col("n_turns"), col("n_bad_role"), col("keep"))
    val q2 = qaStats(stream).writeStream.outputMode("append")
      .format("memory").queryName("stream_qa")
      .trigger(Trigger.ProcessingTime("500 milliseconds")).start()
    try {
      q2.processAllAvailable()
      val streamed = spark.table("stream_qa")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getLong(2), r.getBoolean(3))).toSet
      val batch = qaStats(spark.read.parquet(s"$dir/b1"))
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getLong(2), r.getBoolean(3))).toSet
      assert(streamed == batch && streamed.size == 3)
      assert(streamed.forall(t => t._3 >= 1L && !t._4))
    } finally q2.stop()
  }

  test("PQ encode + JL projection run on STREAMS: literal-model projections are streaming-legal") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    import graft.operators.Similarity
    val corpus = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // train once on the static corpus; encode arrivals forever
    val books = Similarity.Ivf.pqTrain(corpus, "vec_id", "embedding",
      m = 2, subDim = 32, k = 4, iters = 1)
    val batchRef = Similarity.Ivf.pqEncodeWith(corpus, "vec_id", "embedding",
        books, subDim = 32)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    val jlRef = Similarity.Ivf.randomProjectInt(corpus, "vec_id",
        "embedding", inDim = 64, outDim = 4, salt = "st")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val dir = Files.createTempDirectory("graft-pq-stream").toString
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    corpus.orderBy("vec_id").limit(3).write.mode("overwrite")
      .parquet(s"$dir/b1")
    val stream = spark.readStream.schema(schema).parquet(s"$dir/*")
    val out = Similarity.Ivf.pqEncodeWith(stream, "vec_id", "embedding",
        books, subDim = 32)
      .join(Similarity.Ivf.randomProjectInt(stream, "vec_id", "embedding",
          inDim = 64, outDim = 4, salt = "st")
        .filter(col("dim") === 0L)
        .select(col("vec_id"), col("y_micro")),
        Seq("vec_id"))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("pq_stream")
      .trigger(Trigger.ProcessingTime("500 milliseconds")).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("pq_stream").collect()
      assert(rows.length == 3)
      rows.foreach { r =>
        val id = r.getLong(0)
        assert((r.getLong(1), r.getLong(2), r.getLong(3)) == batchRef(id),
          s"streamed PQ codes of $id diverge from batch")
        assert(r.getLong(4) == jlRef((id, 0L)),
          s"streamed JL projection of $id diverges from batch")
      }
    } finally q.stop()
  }

  test("flagContaminated: bloom decontamination is stream-static and stateless") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    import graft.functions.{PortableBloom, TextFunctions}
    import spark.implicits._
    // static eval set; bloom built ONCE before the stream starts
    val evalDocs = Seq(
      "alpha beta gamma delta epsilon zeta eta theta",
      "one two three four five six seven").toDF("text")
    val testGrams = evalDocs
      .select(explode(TextFunctions.wordGrams(col("text"), 5)).as("g"))
      .localCheckpoint()
    val bloom = PortableBloom.build(testGrams, col("g"), numWords = 64)
    val dir = Files.createTempDirectory("graft-bloom-stream").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def write(file: String, rows: Seq[(Long, String)]): Unit =
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          rows.map { case (i, t) => org.apache.spark.sql.Row(i, t) }, 1),
        schema).write.mode("overwrite").parquet(s"$dir/$file")
    write("b1", Seq(
      (1L, "prefix alpha beta gamma delta epsilon zeta suffix"), // shares a 5-gram
      (2L, "wholly novel tokens with no overlap whatsoever here at all")))
    val stream = spark.readStream.schema(schema).parquet(s"$dir/*")
    val hits = graft.operators.Decontaminate.flagContaminated(
      stream, "doc_id", "text", testGrams, "g", bloom, nGram = 5)
    val q = hits.writeStream.outputMode("append")
      .format("memory").queryName("bloom_decon")
      .trigger(Trigger.ProcessingTime("500 milliseconds")).start()
    try {
      q.processAllAvailable()
      val ids = spark.table("bloom_decon").select(col("doc_id"))
        .collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L), s"contaminated doc flagged, clean doc not: $ids")
      // batch twin: same definition, same answer
      val batch = graft.operators.Decontaminate.flagContaminated(
        spark.read.schema(schema).parquet(s"$dir/*"),
        "doc_id", "text", testGrams, "g", bloom, nGram = 5)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      assert(batch == Set(1L))
    } finally q.stop()
  }

  test("foreachBatch nearDupMicroBatch: dups INSIDE one micro-batch are caught") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val index = graft.operators.Dedup.minhashIndex(corpus, "doc_id", "text")
      .localCheckpoint()
    val knownText = corpus.orderBy("doc_id").limit(1)
      .select(col("text")).head().getString(0)
    val novel = "streaming intra batch twin document qwerty asdf zxcv " +
      "poiu lkjh mnbv unseen tokens only here"
    val dir = Files.createTempDirectory("graft-microbatch-dedup").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    // ONE file => ONE micro-batch holding a corpus dup + an intra-batch twin
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(300000L, knownText),
        org.apache.spark.sql.Row(300001L, novel),
        org.apache.spark.sql.Row(300002L, novel)), 1),
      schema).write.mode("overwrite").parquet(s"$dir/b1")
    val stream = spark.readStream.schema(schema).parquet(s"$dir/*")
    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        collected.synchronized {
          collected ++= graft.operators.Dedup
            .nearDupMicroBatch(batch, "doc_id", "text", index)
            .collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
        }
        ()
      }
      .trigger(Trigger.ProcessingTime("500 milliseconds")).start()
    try {
      q.processAllAvailable()
      val got = collected.synchronized(collected.toSet)
      assert(got.exists { case (id, _, src) => id == 300000L && src == "corpus" },
        s"corpus dup missed in micro-batch: $got")
      assert(got.contains((300002L, 300001L, "batch")),
        s"intra-batch twin slipped through: $got")
    } finally q.stop()
  }

  test("multimodal: deterministic fake decode through real partition plumbing") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val feats = Multimodal.featureTable(docs, "doc_id", "text", "image",
      new FakeDecoder)
    val n = docs.count()
    assert(feats.count() == n)
    val r = feats.orderBy(col("doc_id")).head()
    assert(r.getAs[String]("kind") == "image")
    assert(r.getAs[Long]("sizeBytes") > 0L)
    assert(r.getAs[scala.collection.Seq[Float]]("bandMeans").length == 4)
    // deterministic across runs
    val again = Multimodal.featureTable(docs, "doc_id", "text", "image",
      new FakeDecoder).orderBy(col("doc_id")).head()
    assert(r.getAs[Long]("checksum") == again.getAs[Long]("checksum"))
  }

  test("HLL registers and Count-Min cells aggregate on a stream (complete mode) equal to batch") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    import graft.operators.Sketches
    val dir = Files.createTempDirectory("graft-sketch-stream").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def write(file: String, rows: Seq[(Long, String)]): Unit =
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          rows.map { case (i, t) => org.apache.spark.sql.Row(i, t) }, 1),
        schema).write.mode("overwrite").parquet(s"$dir/$file")
    val b1 = Seq((1L, "alpha beta gamma delta"), (2L, "beta epsilon zeta"))
    val b2 = Seq((3L, "alpha eta theta iota kappa"), (4L, "lambda mu nu"))
    write("b1", b1)
    write("b2", b2)
    val batch = spark.read.schema(schema).parquet(s"$dir/*")
    val stream = spark.readStream.schema(schema).parquet(s"$dir/*")
    // both sketches are plain bounded-domain aggregations, so the SAME
    // definition runs as a streaming query in complete mode — the
    // incremental-sketch shape (registers/cells maintained as rows
    // arrive) with no operator changes
    val qh = Sketches.hllRegisters(stream, "text", p = 4)
      .writeStream.outputMode("complete")
      .format("memory").queryName("hll_stream")
      .trigger(Trigger.AvailableNow()).start()
    val qc = Sketches.countMinCells(stream, "text", d = 2, w = 16)
      .writeStream.outputMode("complete")
      .format("memory").queryName("cm_stream")
      .trigger(Trigger.AvailableNow()).start()
    try {
      qh.processAllAvailable()
      qc.processAllAvailable()
      val hllStream = spark.table("hll_stream").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val hllBatch = Sketches.hllRegisters(batch, "text", p = 4).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(hllStream == hllBatch && hllBatch.nonEmpty)
      val cmStream = spark.table("cm_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val cmBatch = Sketches.countMinCells(batch, "text", d = 2, w = 16)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(cmStream == cmBatch && cmBatch.nonEmpty)
    } finally { qh.stop(); qc.stop() }
  }

  test("maintainGroupSumsStream: signed-delta fold over two microbatches equals batch") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-sums-stream").toString
    val schema = StructType(Seq(
      StructField("key", StringType), StructField("status", StringType),
      StructField("v", LongType)))
    def write(file: String, rows: Seq[(String, String, Long)]): Unit = {
      val data = rows.map { case (k, st, v) =>
        org.apache.spark.sql.Row(k, st, v) }
      spark.createDataFrame(spark.sparkContext.parallelize(data, 1), schema)
        .write.mode("overwrite").parquet(s"$dir/$file")
    }
    // day 1: three groups arrive (one with a null key — excluded)
    write("b1", Seq(
      ("a", "added", 10L), ("a", "added", 20L), ("b", "added", 5L),
      ("c", "added", 7L), (null, "added", 99L)))
    val stream = spark.readStream.schema(schema).parquet(s"$dir/*")
    val totals = graft.operators.Incremental.maintainGroupSumsStream(
      stream, "key", "status", Seq("v"))
    val q = totals.writeStream.outputMode("complete")
      .format("memory").queryName("sums_stream")
      .trigger(Trigger.ProcessingTime("500 milliseconds")).start()
    try {
      q.processAllAvailable()
      assert(spark.table("sums_stream")
        .as[(String, Long, Long)].collect().toSet ==
        Set(("a", 2L, 30L), ("b", 1L, 5L), ("c", 1L, 7L)))
      // day 2: one doc of "a" changes value, "b" empties, "d" appears
      write("b2", Seq(
        ("a", "changed_old", 20L), ("a", "changed_new", 21L),
        ("b", "removed", 5L), ("d", "added", 3L)))
      q.processAllAvailable()
      val got = spark.table("sums_stream")
        .as[(String, Long, Long)].collect().toSet
      // emptied "b" disappears (the batch rule), "a" folds to 31
      assert(got == Set(("a", 2L, 31L), ("c", 1L, 7L), ("d", 1L, 3L)))
      // duality: the same operator over the batch union of all deltas
      // gives the identical totals
      val batch = spark.read.schema(schema).parquet(s"$dir/*")
      val asBatch = graft.operators.Incremental.maintainGroupSumsStream(
        batch, "key", "status", Seq("v"))
        .as[(String, Long, Long)].collect().toSet
      assert(asBatch == got)
    } finally q.stop()
  }

  test("maintainKeepFirstStream: stateful election over two microbatches " +
      "equals batch") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-keeper-stream").toString
    val schema = StructType(Seq(
      StructField("key", StringType), StructField("id", LongType),
      StructField("pass", BooleanType), StructField("status", StringType)))
    def write(file: String, rows: Seq[(String, Long, Boolean, String)]): Unit = {
      val data = rows.map { case (k, i, p, st) =>
        org.apache.spark.sql.Row(k, i, p, st) }
      spark.createDataFrame(spark.sparkContext.parallelize(data, 1), schema)
        .write.mode("overwrite").parquet(s"$dir/$file")
    }
    // day 1: key a owned by id 1 (3 fails the gate and never holds
    // ownership); key b owned by its only passing member; null key drops
    write("b1", Seq(
      ("a", 1L, true, "added"), ("a", 2L, true, "added"),
      ("a", 3L, false, "added"), ("b", 5L, true, "added"),
      (null, 9L, true, "added")))
    val stream = spark.readStream.schema(schema).parquet(s"$dir/*")
    val keepers = graft.operators.Incremental.maintainKeepFirstStream(
      stream, "key", "id", "pass", "status")
    val q = keepers.writeStream.outputMode("update")
      .format("memory").queryName("keeper_stream")
      .trigger(Trigger.ProcessingTime("500 milliseconds")).start()
    try {
      q.processAllAvailable()
      assert(spark.table("keeper_stream")
        .as[(String, Option[Long], Long)].collect().toSet ==
        Set(("a", Some(1L), 2L), ("b", Some(5L), 1L)))
      // day 2: a's keeper is removed (election falls to 2), b's only
      // member flips to failing via a change (tombstone), c appears
      write("b2", Seq(
        ("a", 1L, true, "removed"),
        ("b", 5L, true, "changed_old"), ("b", 5L, false, "changed_new"),
        ("c", 7L, true, "added")))
      q.processAllAvailable()
      val emissions = spark.table("keeper_stream")
        .as[(String, Option[Long], Long)].collect().toSet
      assert(emissions == Set(
        ("a", Some(1L), 2L), ("b", Some(5L), 1L), // day-1 emissions
        ("a", Some(2L), 1L), ("b", None, 0L), ("c", Some(7L), 1L)))
      // duality holds for ONE step's deltas (the operator's contract —
      // a multi-step union carries no ordering, so only streaming can
      // replay it): the batch fold of day 1 alone is day 1's election
      val asBatch = graft.operators.Incremental.maintainKeepFirstStream(
        spark.read.schema(schema).parquet(s"$dir/b1"),
        "key", "id", "pass", "status")
        .as[(String, Option[Long], Long)].collect().toSet
      assert(asBatch == Set(("a", Some(1L), 2L), ("b", Some(5L), 1L)))
      // and the streaming END state equals the batch election over the
      // NET day-2 membership — the incremental==batch invariant the
      // non-streaming maintainKeepFirst proves via wp05
      val signals = Seq(
        ("a", 2L, true), ("a", 3L, false), ("b", 5L, false),
        ("c", 7L, true)).toDF("key", "id", "pass")
      val batchElection = signals.filter(col("pass"))
        .groupBy("key")
        .agg(org.apache.spark.sql.functions.min("id").as("keep_id"))
        .as[(String, Long)].collect().toSet
      val endState = Set(("a", 2L), ("c", 7L)) // day-2 emissions, keepers
      assert(batchElection == endState)
    } finally q.stop()
  }

  test("maintainMinKStream: stateful min-k over two microbatches equals " +
      "the batch sample of the net membership") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mink-stream").toString
    val schema = StructType(Seq(
      StructField("key", StringType), StructField("id", LongType),
      StructField("status", StringType)))
    def write(file: String, rows: Seq[(String, Long, String)]): Unit = {
      val data = rows.map { case (kk, i, st) =>
        org.apache.spark.sql.Row(kk, i, st) }
      spark.createDataFrame(spark.sparkContext.parallelize(data, 1), schema)
        .write.mode("overwrite").parquet(s"$dir/$file")
    }
    write("b1", Seq(
      ("a", 1L, "added"), ("a", 2L, "added"), ("a", 3L, "added"),
      ("a", 4L, "added"), ("b", 10L, "added"), (null, 9L, "added")))
    val stream = spark.readStream.schema(schema).parquet(s"$dir/*")
    val samples = graft.operators.Incremental.maintainMinKStream(
      stream, "key", "id", "status", k = 2, salt = "mks")
    val q = samples.writeStream.outputMode("update")
      .format("memory").queryName("mink_stream")
      .trigger(Trigger.ProcessingTime("500 milliseconds")).start()
    try {
      q.processAllAvailable()
      // day 2: one of a's members leaves (whoever it is, the sample
      // re-derives from the remaining membership), b empties, c appears
      write("b2", Seq(
        ("a", 2L, "removed"), ("b", 10L, "removed"), ("c", 20L, "added")))
      q.processAllAvailable()
      val rows = spark.table("mink_stream")
        .as[(String, Seq[Long], Long)].collect()
      // duality: each key's final emission (distinguished by n_members —
      // a shrank 4 -> 3, b tombstoned, c appeared) equals the batch
      // operator over the NET membership, ranks included
      val net = Seq(("a", 1L), ("a", 3L), ("a", 4L), ("c", 20L))
        .toDF("key", "id")
      val batch = graft.operators.Sampling.stratifiedFixedSample(
        net, "id", "key", k = 2, salt = "mks")
        .orderBy("key", "sample_rank")
        .as[(String, Long, Long)].collect()
        .groupBy(_._1).map { case (kk, rs) =>
          kk -> rs.sortBy(_._3).map(_._2).toSeq
        }
      val aFinal = rows.filter(r => r._1 == "a" && r._3 == 3L)
      assert(aFinal.length == 1)
      assert(aFinal.head._2 == batch("a"))
      val cFinal = rows.filter(_._1 == "c")
      assert(cFinal.length == 1 && cFinal.head._2 == batch("c"))
      // b's tombstone
      assert(rows.exists(r => r._1 == "b" && r._2.isEmpty && r._3 == 0L))
      // and day-1's full-membership emission for a was also the batch
      // sample of {1,2,3,4}
      val day1A = rows.filter(r => r._1 == "a" && r._3 == 4L)
      val batch1 = graft.operators.Sampling.stratifiedFixedSample(
        Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L)).toDF("key", "id"),
        "id", "key", k = 2, salt = "mks")
        .orderBy("sample_rank").as[(String, Long, Long)].collect()
        .sortBy(_._3).map(_._2).toSeq
      assert(day1A.length == 1 && day1A.head._2 == batch1)
    } finally q.stop()
  }

  test("maintainPairCountsStream: signed winnowing deltas over two " +
      "microbatches equal the batch pair table") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    import spark.implicits._
    import graft.operators.{Dedup, Incremental}
    val dir = Files.createTempDirectory("graft-pairs-stream").toString
    val twin = "alpha beta gamma delta epsilon zeta eta theta"
    val other = "completely different words appear here instead of those"
    // snapshot A: one twin pair; step 1 adds a third copy; step 2
    // removes a twin and REVISES the odd doc into a fourth copy
    val snapA = Seq((1L, twin), (2L, twin), (3L, other)).toDF("id", "text")
    val snapB = snapA.unionByName(Seq((4L, twin)).toDF("id", "text"))
    val snapC = Seq((2L, twin), (3L, twin), (4L, twin)).toDF("id", "text")
    def fps(d: org.apache.spark.sql.DataFrame) =
      Dedup.winnowingFingerprints(d, "id", "text", k = 2, w = 2)
    val diff0 = Seq((1L, "added"), (2L, "added"), (3L, "added"))
      .toDF("id", "status")
    val diff1 = Seq((4L, "added")).toDF("id", "status")
    val diff2 = Seq((1L, "removed"), (3L, "changed")).toDF("id", "status")
    // the REAL delta artifacts of the snapshot steps, from the factored
    // winnowing machinery (not hand-written rows) — including the
    // day-0 bootstrap (the stream starts from EMPTY state, so the
    // initial snapshot enters as an everything-added step, which the
    // operator produces from an empty prior)
    val (fpsA, d0) = Incremental.winnowingPairDeltas(
      fps(snapA).limit(0), fps(snapA), diff0, "id")
    val (fpsB, d1) = Incremental.winnowingPairDeltas(
      fpsA, fps(snapB.filter(col("id") === 4L)), diff1, "id")
    val (fpsC, d2) = Incremental.winnowingPairDeltas(
      fpsB, fps(snapC.filter(col("id") === 3L)), diff2, "id")
    val schema = StructType(Seq(
      StructField("id_a", LongType), StructField("id_b", LongType),
      StructField("d_shared", LongType)))
    d0.coalesce(1).write.parquet(s"$dir/b0")
    d1.coalesce(1).write.parquet(s"$dir/b1")
    val stream = spark.readStream.schema(schema).parquet(s"$dir/*")
    val pairs = graft.operators.Incremental.maintainPairCountsStream(stream)
    val q = pairs.writeStream.outputMode("complete")
      .format("memory").queryName("pairs_stream")
      .trigger(Trigger.ProcessingTime("500 milliseconds")).start()
    try {
      def live = spark.table("pairs_stream")
        .as[(Long, Long, Long)].collect().toSet
      def batchOf(f: org.apache.spark.sql.DataFrame) =
        Dedup.winnowingPairCounts(f, "id")
          .as[(Long, Long, Long)].collect().toSet
      q.processAllAvailable()
      val afterB = batchOf(fpsB)
      assert(live == afterB && afterB.nonEmpty)
      d2.coalesce(1).write.parquet(s"$dir/b2")
      q.processAllAvailable()
      val afterC = batchOf(fpsC)
      assert(live == afterC && afterC.nonEmpty)
      // the same table through the batch fold (maintainWinnowingPairs
      // applied per step over the stored state) — three-way agreement
      val (_, p1) = Incremental.maintainWinnowingPairs(
        fpsA, fps(snapB.filter(col("id") === 4L)), diff1,
        batchOf(fpsA).toSeq.toDF("id_a", "id_b", "n_shared"),
        "id")
      val (_, p2) = Incremental.maintainWinnowingPairs(
        fpsB, fps(snapC.filter(col("id") === 3L)), diff2,
        p1, "id")
      assert(p2.as[(Long, Long, Long)].collect().toSet == afterC)
      // removed-pair coverage: the (1, x) pairs died with doc 1
      assert(afterB.exists(_._1 == 1L) && !afterC.exists(_._1 == 1L))
    } finally q.stop()
  }

  test("maintainPairCountsStream: signed containment deltas maintain the " +
      "live decontamination table") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    import spark.implicits._
    import graft.operators.Incremental
    val dir = Files.createTempDirectory("graft-decon-stream").toString
    // fixed test suite: two docs sharing shingles with the train side
    val testPost = Seq(
      (100L, 1L), (100L, 2L), (100L, 3L),
      (200L, 3L), (200L, 4L)).toDF("test_id", "sh")
    def post(rows: (Long, Long)*) = rows.toDF("doc_id", "sh")
    // train snapshot A: doc 10 overlaps test 100 on {1,2}, doc 11 on {3}
    val postA = post((10L, 1L), (10L, 2L), (11L, 3L), (11L, 9L))
    // step 1: doc 12 arrives overlapping test 200 on {3,4}
    val postD1 = post((12L, 3L), (12L, 4L))
    val diff1 = Seq((12L, "added")).toDF("doc_id", "status")
    // step 2: doc 10 shrinks to {2} (changed), doc 11 is removed
    val postD2 = post((10L, 2L))
    val diff2 = Seq((10L, "changed"), (11L, "removed"))
      .toDF("doc_id", "status")
    val diff0 = Seq((10L, "added"), (11L, "added")).toDF("doc_id", "status")
    val (pA, d0) = Incremental.containmentDeltas(
      postA.limit(0), postA, diff0, testPost, "doc_id")
    val (pB, d1) = Incremental.containmentDeltas(
      pA, postD1, diff1, testPost, "doc_id")
    val (pC, d2) = Incremental.containmentDeltas(
      pB, postD2, diff2, testPost, "doc_id")
    val schema = StructType(Seq(
      StructField("test_id", LongType), StructField("doc_id", LongType),
      StructField("d_inter", LongType)))
    d0.unionByName(d1).coalesce(1).write.parquet(s"$dir/b1")
    val stream = spark.readStream.schema(schema).parquet(s"$dir/*")
    val inter = Incremental.maintainPairCountsStream(
      stream, "test_id", "doc_id", "d_inter", "inter")
    val q = inter.writeStream.outputMode("complete")
      .format("memory").queryName("decon_stream")
      .trigger(Trigger.ProcessingTime("500 milliseconds")).start()
    try {
      def live = spark.table("decon_stream")
        .as[(Long, Long, Long)].collect().toSet
      def batchOf(p: org.apache.spark.sql.DataFrame) = testPost
        .join(p, Seq("sh"))
        .groupBy(col("test_id"), col("doc_id"))
        .agg(count(lit(1)).as("inter"))
        .as[(Long, Long, Long)].collect().toSet
      q.processAllAvailable()
      assert(live == batchOf(pB) &&
        live == Set((100L, 10L, 2L), (100L, 11L, 1L), (100L, 12L, 1L),
          (200L, 11L, 1L), (200L, 12L, 2L)))
      d2.coalesce(1).write.parquet(s"$dir/b2")
      q.processAllAvailable()
      // doc 11's rows died with it; doc 10 fell to the {2} overlap
      assert(live == batchOf(pC) &&
        live == Set((100L, 10L, 1L), (100L, 12L, 1L), (200L, 12L, 2L)))
    } finally q.stop()
  }

  test("maintainRegisterMaxStream: stateful register fold over two " +
      "microbatches equals the batch register table") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    import spark.implicits._
    import graft.operators.Sketches
    val dir = Files.createTempDirectory("graft-regmax-stream").toString
    // snapshot A: three docs; snapshot B: doc 1 leaves, doc 3's text is
    // revised, doc 4 arrives — the full status alphabet in one step
    val snapA = Seq(
      (1L, "alpha beta gamma delta"), (2L, "epsilon zeta eta theta"),
      (3L, "iota kappa lambda mu")).toDF("doc_id", "text")
    val snapB = Seq(
      (2L, "epsilon zeta eta theta"), (3L, "nu xi omicron pi"),
      (4L, "rho sigma tau upsilon")).toDF("doc_id", "text")
    def contrib(d: org.apache.spark.sql.DataFrame) =
      Sketches.hllContrib(d, "doc_id", "text", p = 4)
    val cA = contrib(snapA)
    // the REAL per-step delta rows a snapshot step emits: the departed
    // ids' stored contributions signed out, the delta docs' fresh
    // contributions signed in (changed = old rows out + new rows in)
    val b1 = cA.withColumn("status", lit("added"))
    val b2 = cA.filter(col("doc_id") === 1L)
        .withColumn("status", lit("removed"))
      .unionByName(cA.filter(col("doc_id") === 3L)
        .withColumn("status", lit("changed_old")))
      .unionByName(contrib(snapB.filter(col("doc_id") === 3L))
        .withColumn("status", lit("changed_new")))
      .unionByName(contrib(snapB.filter(col("doc_id") === 4L))
        .withColumn("status", lit("added")))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("bucket", LongType),
      StructField("rho", LongType), StructField("status", StringType)))
    b1.select("doc_id", "bucket", "rho", "status")
      .coalesce(1).write.parquet(s"$dir/b1")
    val stream = spark.readStream.schema(schema).parquet(s"$dir/*")
    val regs = graft.operators.Incremental.maintainRegisterMaxStream(
      stream, "bucket", "doc_id", "rho", "status")
    val q = regs.writeStream.outputMode("update")
      .format("memory").queryName("regmax_stream")
      .trigger(Trigger.ProcessingTime("500 milliseconds")).start()
    try {
      q.processAllAvailable()
      // the fold keys as string (the twins' convention): cast back
      def emissions = spark.table("regmax_stream")
        .select(col("bucket").cast("long"), col("register"),
          col("n_contribs"))
        .as[(Long, Option[Long], Long)].collect().toSet
      def batchRegs(d: org.apache.spark.sql.DataFrame) =
        Sketches.hllRegisters(d, "text", p = 4)
          .as[(Long, Long)].collect().toMap
      // one-step duality: day 1 folds from empty state, so the emitted
      // registers ARE the batch table of snapshot A (with the per-key
      // contributor counts from the contribution frame)
      val contribCountsA = cA.groupBy("bucket").agg(count(lit(1)).as("n"))
        .as[(Long, Long)].collect().toMap
      val day1 = batchRegs(snapA).map { case (b, r) =>
        (b, Some(r), contribCountsA(b)) }.toSet
      assert(emissions == day1 && day1.nonEmpty)
      b2.select("doc_id", "bucket", "rho", "status")
        .coalesce(1).write.parquet(s"$dir/b2")
      q.processAllAvailable()
      // day 2 touches exactly b2's keys: each re-emits the batch
      // register of snapshot B, or a NULL tombstone if it emptied
      val regB = batchRegs(snapB)
      val contribCountsB = contrib(snapB).groupBy("bucket")
        .agg(count(lit(1)).as("n")).as[(Long, Long)].collect().toMap
      val touched = b2.select("bucket").distinct()
        .as[Long].collect().toSet
      assert(touched.nonEmpty)
      val day2 = touched.map { b =>
        regB.get(b) match {
          case Some(r) => (b, Some(r), contribCountsB(b))
          case None    => (b, None, 0L)
        }
      }
      assert(emissions == (day1 ++ day2))
      // the full status alphabet was exercised, including a tombstone
      assert(day2.exists(_._2.isEmpty))
      // END state == batch over snapshot B on every live key (untouched
      // keys carried day-1 emissions that already match snapshot B)
      val finalPerKey = (day1 ++ day2).groupBy(_._1).map { case (b, es) =>
        b -> (if (day2.exists(_._1 == b)) day2.find(_._1 == b).get
              else es.head)
      }
      regB.foreach { case (b, r) =>
        assert(finalPerKey(b)._2.contains(r), s"bucket $b register drift")
      }
    } finally q.stop()
  }
}
