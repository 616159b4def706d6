package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming over the events table (SURVEY §2.11 north-star:
  * the reference has no streaming surface; this is green-field design).
  *
  * The batch/stream duality is deliberate: each transform is written
  * against a plain DataFrame so the SAME function serves `spark.read` (the
  * driver's oracle checks) and `spark.readStream` (production). Watermarks
  * bound state at scale — a 1000-executor deployment aggregating 100 TB/day
  * of events keeps only `watermark` worth of window state in the store.
  */
object EventStreams {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** True iff `dir` exists and holds at least one visible data file at
    * ANY partition depth — the schema peek in [[readEventStream]] may only
    * fall back when this is false; a depth-limited probe would let a read
    * error on a multi-level-partitioned layout masquerade as "empty" and
    * silently pick the fallback schema. */
  private def hasDataFiles(spark: SparkSession, dir: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    def visible(n: String) = !n.startsWith("_") && !n.startsWith(".")
    def probe(p: org.apache.hadoop.fs.Path): Boolean =
      fs.listStatus(p).exists { st =>
        visible(st.getPath.getName) &&
          (st.isFile || (st.isDirectory && probe(st.getPath)))
      }
    fs.exists(path) && probe(path)
  }

  /** Schemas for streaming reads (streams cannot infer). The driver tables
    * historically stored `ts` as TIMESTAMP(NANOS) (which Spark 4 reads as
    * long nanos via the nanosAsLong conf); newer generations store
    * TIMESTAMP(MICROS) with isAdjustedToUTC=false (read as TIMESTAMP_NTZ).
    * `normalize` accepts either. */
  val eventSchemaNanos: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val eventSchemaMicros: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Normalize the raw events table to the engine contract regardless of
    * how the parquet encoded `ts`:
    *   - `ts`    TIMESTAMP (micros precision) for windowing / calendar ops;
    *   - `ts_ns` BIGINT epoch-nanos for ordering and second-exact integer
    *     arithmetic (never a double round-trip, which loses precision
    *     above 2^53 ns).
    * Nanos-long input keeps full nanos in `ts_ns` and truncates to micros
    * for `ts`; timestamp input derives `ts_ns = unix_micros * 1000`. The
    * NTZ→TIMESTAMP cast is wall-clock under the session time zone, which
    * the engine pins to UTC (GraftSession), so both paths agree with a
    * reader that treats the stored value as UTC (e.g. DuckDB `epoch_ns`). */
  def normalize(raw: DataFrame): DataFrame = raw.schema("ts").dataType match {
    case LongType =>
      raw.withColumnRenamed("ts", "ts_ns")
        .withColumn("ts", timestamp_micros(expr("CAST(ts_ns DIV 1000 AS BIGINT)")))
    case TimestampType =>
      raw.withColumn("ts_ns", expr("unix_micros(ts) * 1000L"))
    case TimestampNTZType =>
      raw.withColumn("ts", col("ts").cast(TimestampType))
        .withColumn("ts_ns", expr("unix_micros(ts) * 1000L"))
    case other =>
      throw new IllegalArgumentException(
        s"events.ts must be long-nanos or a timestamp type, got $other")
  }

  /** Tumbling-window counts+sums per event type. Works on batch or stream. */
  def tumblingCounts(events: DataFrame, window: String = "1 hour"): DataFrame =
    events
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** Sliding-window distinct users (approx at scale). */
  def slidingUsers(
      events: DataFrame, window: String = "1 hour", slide: String = "15 minutes"): DataFrame =
    events
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window, slide),
        col("event_type"))
      .agg(approx_count_distinct(col("user_id")).as("approx_users"))

  /** Session windows per user (native session_window operator). */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))

  /** Custom per-key state via `mapGroupsWithState` (SURVEY §2.11 stateful
    * path): sessionization with an explicit gap, one state record per user.
    * Works identically on batch (full-group fold) and streaming (GroupState
    * with ProcessingTime/EventTime timeouts would be added for unbounded
    * runs). Events inside a group are sorted by time in-memory — per-user
    * event counts are bounded, the USERS are what scales out. */
  def statefulSessionize(events: DataFrame, gapSeconds: Long): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupState
    val perUser = events
      .select(col("user_id").cast("long"),
        expr("CAST(ts_ns DIV 1000000000 AS BIGINT)").as("sec"))
      .as[(Long, Long)]
      .groupByKey(_._1)
    def fold(user: Long, rows: Iterator[(Long, Long)],
        state: GroupState[(Long, Long)]): (Long, Long, Long) = {
      val secs = rows.map(_._2).toArray
      java.util.Arrays.sort(secs)
      var sessions = 0L
      var events = 0L
      var last = Long.MinValue
      secs.foreach { s =>
        if (last == Long.MinValue || s - last > gapSeconds) sessions += 1
        last = s
        events += 1
      }
      (user, sessions, events)
    }
    perUser
      .mapGroupsWithState[(Long, Long), (Long, Long, Long)](
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)(fold)
      .toDF("user_id", "n_sessions", "n_events")
  }

  /** Per-user session state for the unbounded-stream sessionizer. */
  final case class SessionState(startSec: Long, lastSec: Long, nEvents: Long)

  /** Sessionization for UNBOUNDED streams: `flatMapGroupsWithState` with an
    * EVENT-TIME timeout, so per-user state expires `gapSeconds` after the
    * user's last event once the watermark passes — without this, an
    * ever-growing user population would grow the state store forever
    * (the `statefulSessionize` batch fold has no such concern).
    *
    * Emits one row per CLOSED session (append mode): a session closes
    * either when a later event from the same user arrives beyond the gap,
    * or when the event-time timeout fires. Sessions still open when the
    * stream ends stay unemitted — the streaming-correct behavior.
    *
    * Input must be watermarked (`readEventStream` does this). */
  def statefulSessionizeStreaming(events: DataFrame, gapSeconds: Long): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    def fold(
        user: Long,
        rows: Iterator[(Long, java.sql.Timestamp)],
        state: GroupState[SessionState]): Iterator[(Long, Long, Long, Long)] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator((user, s.startSec, s.lastSec, s.nEvents))
      } else {
        val secs = rows.map(_._2.getTime / 1000L).toArray
        java.util.Arrays.sort(secs)
        val closed = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
        var cur = state.getOption
        secs.foreach { s =>
          cur = cur match {
            // merge with min/max clamps: an out-of-order event above the
            // watermark but BEHIND the session's last event (s < lastSec)
            // must extend the span, never rewind it — a plain
            // lastSec := s would record a session ending before it starts
            case Some(c) if s - c.lastSec <= gapSeconds =>
              Some(SessionState(math.min(c.startSec, s),
                math.max(c.lastSec, s), c.nEvents + 1))
            case Some(c) =>
              closed += ((user, c.startSec, c.lastSec, c.nEvents))
              Some(SessionState(s, s, 1L))
            case None =>
              Some(SessionState(s, s, 1L))
          }
        }
        cur.foreach { c =>
          state.update(c)
          // timeout once the watermark passes last-event + gap (the
          // timestamp must sit beyond the current watermark, so floor it)
          state.setTimeoutTimestamp(math.max(
            state.getCurrentWatermarkMs() + 1000L,
            (c.lastSec + gapSeconds) * 1000L))
        }
        closed.iterator
      }
    }
    events.select(col("user_id").cast("long"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, (Long, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fold)
      .toDF("user_id", "session_start_sec", "session_end_sec", "n_events")
  }

  /** Open a file stream over a directory of event parquet, watermarked so
    * window state is bounded and late data beyond the bound is dropped. */
  def readEventStream(
      spark: SparkSession, dir: String, watermark: String = "10 minutes",
      maxFilesPerTrigger: Option[Int] = None,
      fallbackSchema: StructType = eventSchemaMicros): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Streams cannot infer schemas, and the stored `ts` type varies by
    // fixture generation — peek it with a batch read of the same path.
    // The fallback applies ONLY when there is nothing to peek yet (stream
    // started before the first files landed); any other failure is a real
    // IO/parse error and must surface, not silently pick a schema.
    val schema = scala.util.Try(spark.read.parquet(dir).schema) match {
      case scala.util.Success(s) => s
      case scala.util.Failure(_) if !hasDataFiles(spark, dir) =>
        log.warn(s"readEventStream: no data files under $dir yet; " +
          s"assuming fallback schema $fallbackSchema")
        fallbackSchema
      case scala.util.Failure(e) => throw e
    }
    val reader = spark.readStream.schema(schema)
    val withOpt = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
    normalize(withOpt.parquet(dir))
      .withWatermark("ts", watermark)
  }

  /** Stream-stream interval join: correlate two event streams on user
    * within a bounded event-time window (right event within [0, maxGap]
    * after the left). Both sides watermarked so join state is bounded —
    * the canonical funnel/attribution shape (view → purchase). Works on
    * batch DataFrames identically. */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      maxGap: String = "30 minutes"): DataFrame = {
    val l = left.select(col("user_id").as("l_user"), col("ts").as("l_ts"),
      col("event_type").as("l_type"))
    val r = right.select(col("user_id").as("r_user"), col("ts").as("r_ts"),
      col("event_type").as("r_type"))
    l.join(r,
      col("l_user") === col("r_user") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $maxGap"))
  }

  /** Drive a streaming aggregation to completion against a static dir and
    * return the result table (memory sink) — the local smoke path. */
  def runToMemory(
      spark: SparkSession,
      agg: DataFrame,
      name: String,
      outputMode: String = "update"): DataFrame = {
    val q: StreamingQuery = agg.writeStream
      .outputMode(outputMode)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
