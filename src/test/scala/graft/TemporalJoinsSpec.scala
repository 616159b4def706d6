package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TemporalJoins

/** NOTE on `WARN WindowExec: No Partition Defined` in the test log: emitted
  * by the naive per-row REFERENCE computations these property tests compare
  * against (tiny fixtures, deliberate), not by the production as-of/range
  * joins, whose plan shapes are pinned in PlanShapeSpec. */
class TemporalJoinsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def leftDf = Seq(
    // (event, key, ts)
    (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 5L),
    (4L, "b", 100L), (5L, "c", 50L)
  ).toDF("event", "k", "ts")

  private def rightDf = Seq(
    // (key, ts, v)
    ("a", 8L, 0.8), ("a", 15L, 1.5), ("a", 20L, 2.0),
    ("b", 200L, 9.9)
  ).toDF("k", "rts", "v")

  test("asofJoin backward: greatest right ts <= left ts, left rows preserved") {
    val out = TemporalJoins.asofJoin(leftDf, rightDf, "k", "ts", "rts", Seq("v"))
      .orderBy("event").collect()
    assert(out.length == 5)
    val byEvent = out.map(r => r.getAs[Long]("event") ->
      (Option(r.getAs[java.lang.Long]("matched_ts")), Option(r.getAs[java.lang.Double]("v")))).toMap
    assert(byEvent(1L) == (Some(8L), Some(0.8)))   // 8 <= 10 < 15
    assert(byEvent(2L) == (Some(20L), Some(2.0)))  // equal ts matches (inclusive)
    assert(byEvent(3L) == (None, None))            // nothing at or before 5
    assert(byEvent(4L) == (None, None))            // b's only right row is later
    assert(byEvent(5L) == (None, None))            // key c has no right rows
  }

  test("asofJoin strict: equal timestamps do not match") {
    val out = TemporalJoins.asofJoin(leftDf, rightDf, "k", "ts", "rts", Seq("v"),
      strict = true).orderBy("event").collect()
    val byEvent = out.map(r => r.getAs[Long]("event") ->
      Option(r.getAs[java.lang.Long]("matched_ts"))).toMap
    assert(byEvent(2L) == Some(15L)) // 20 excluded, falls back to 15
    assert(byEvent(1L) == Some(8L))
  }

  test("asofJoin forward: least right ts >= left ts") {
    val out = TemporalJoins.asofJoin(leftDf, rightDf, "k", "ts", "rts", Seq("v"),
      direction = "forward").orderBy("event").collect()
    val byEvent = out.map(r => r.getAs[Long]("event") ->
      Option(r.getAs[java.lang.Long]("matched_ts"))).toMap
    assert(byEvent(1L) == Some(15L))  // first at or after 10
    assert(byEvent(2L) == Some(20L))  // inclusive
    assert(byEvent(3L) == Some(8L))   // first at or after 5
    assert(byEvent(4L) == Some(200L))
    assert(byEvent(5L) == None)
  }

  test("asofJoin: null-ts left rows survive unmatched; null-ts right rows are dropped") {
    val l = Seq((1L, "a", java.lang.Long.valueOf(10L)),
      (2L, "a", null.asInstanceOf[java.lang.Long])).toDF("event", "k", "ts")
    val r = Seq(("a", java.lang.Long.valueOf(8L), 1.0),
      ("a", null.asInstanceOf[java.lang.Long], 666.0)).toDF("k", "rts", "v")
    for (dir <- Seq("backward", "forward")) {
      val out = TemporalJoins.asofJoin(l, r, "k", "ts", "rts", Seq("v"),
        direction = dir).orderBy("event").collect()
      assert(out.length == 2, dir)
      val nullRow = out.find(_.getAs[Long]("event") == 2L).get
      assert(nullRow.isNullAt(nullRow.fieldIndex("matched_ts")), dir)
      assert(nullRow.isNullAt(nullRow.fieldIndex("v")), dir)
      // the non-null row never matches the null-ts right row
      val r1 = out.find(_.getAs[Long]("event") == 1L).get
      assert(Option(r1.getAs[java.lang.Double]("v")) != Some(666.0), dir)
    }
  }

  test("asofJoin: a genuinely-null right value at the matched ts stays null (no stale back-fill)") {
    val l = Seq((1L, "a", 10L)).toDF("event", "k", "ts")
    val r = Seq(("a", 5L, java.lang.Double.valueOf(1.0)),
      ("a", 8L, null.asInstanceOf[java.lang.Double])).toDF("k", "rts", "v")
    val out = TemporalJoins.asofJoin(l, r, "k", "ts", "rts", Seq("v")).head()
    assert(out.getAs[Long]("matched_ts") == 8L)
    // the matched row's v IS null; per-column ignoreNulls would leak 1.0
    // from the older ts=5 row
    assert(out.isNullAt(out.fieldIndex("v")))
  }

  test("asofJoin: null keys never match (right dropped, left preserved unmatched)") {
    val l = Seq((1L, null.asInstanceOf[String], 10L), (2L, "a", 10L))
      .toDF("event", "k", "ts")
    val r = Seq((null.asInstanceOf[String], 5L, 9.9), ("a", 5L, 1.0))
      .toDF("k", "rts", "v")
    val out = TemporalJoins.asofJoin(l, r, "k", "ts", "rts", Seq("v"))
      .orderBy("event").collect()
    assert(out.length == 2)
    assert(out(0).isNullAt(out(0).fieldIndex("v"))) // null key: no match
    assert(out(1).getAs[Double]("v") == 1.0)
  }

  test("rangeJoin: non-integral bound columns are rejected, not truncated") {
    val points = Seq((1L, 1.5)).toDF("pid", "p")
    val intervals = Seq((100L, 1.2, 1.8)).toDF("iid", "lo", "hi")
    val ex = intercept[IllegalArgumentException] {
      TemporalJoins.rangeJoin(points, intervals, "p", "lo", "hi", bucketWidth = 10L)
    }
    assert(ex.getMessage.contains("integral"))
  }

  test("asofJoin: plans as one window over a union — no join operator") {
    val plan = TemporalJoins.asofJoin(leftDf, rightDf, "k", "ts", "rts", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("Join"), s"asofJoin must not plan a join:\n$plan")
  }

  test("asofJoin property: matches a naive per-row reference in all four modes") {
    val rnd = new scala.util.Random(7)
    val lrows = (1 to 400).map(i =>
      (i.toLong, s"k${rnd.nextInt(8)}", rnd.nextInt(200).toLong))
    // right side unique per (key, ts) for determinism
    val rrows = (1 to 300).map { i =>
      (s"k${rnd.nextInt(10)}", rnd.nextInt(200).toLong, i.toDouble)
    }.groupBy(t => (t._1, t._2)).map(_._2.head).toSeq
    val l = lrows.toDF("event", "k", "ts")
    val r = rrows.toDF("k", "rts", "v")
    val rByKey = rrows.groupBy(_._1)
    for (dir <- Seq("backward", "forward"); strict <- Seq(false, true)) {
      val got = TemporalJoins.asofJoin(l, r, "k", "ts", "rts", Seq("v"),
          direction = dir, strict = strict)
        .select("event", "matched_ts").collect()
        .map(x => x.getAs[Long]("event") ->
          Option(x.getAs[java.lang.Long]("matched_ts")).map(_.toLong))
        .toMap
      lrows.foreach { case (ev, k, ts) =>
        val cands = rByKey.getOrElse(k, Seq.empty).map(_._2)
        val expect =
          if (dir == "backward")
            cands.filter(t => if (strict) t < ts else t <= ts)
              .sorted.lastOption
          else
            cands.filter(t => if (strict) t > ts else t >= ts)
              .sorted.headOption
        assert(got(ev) == expect, s"dir=$dir strict=$strict event $ev key $k ts $ts")
      }
    }
  }

  test("asofJoin hotKeyBuckets: hot key spreads across tasks, output identical") {
    val rnd = new scala.util.Random(11)
    // one key with 100x the rows of the others
    val lrows = (1 to 2000).map(i =>
      (i.toLong, "hot", rnd.nextInt(100000).toLong)) ++
      (2001 to 2020).map(i => (i.toLong, s"k${i % 4}", rnd.nextInt(100000).toLong))
    // right side unique per (key, ts) for determinism
    val rrows = ((1 to 1000).map(i =>
      ("hot", rnd.nextInt(100000).toLong, i.toDouble)) ++
      (1 to 40).map(i => (s"k${i % 4}", rnd.nextInt(100000).toLong, -i.toDouble)))
      .groupBy(t => (t._1, t._2)).map(_._2.head).toSeq
    val l = lrows.toDF("event", "k", "ts")
    val r = rrows.toDF("k", "rts", "v")
    def snapshot(df: org.apache.spark.sql.DataFrame) =
      df.select("event", "matched_ts", "v").collect()
        .map(x => (x.getAs[Long]("event"),
          Option(x.getAs[java.lang.Long]("matched_ts")).map(_.toLong),
          Option(x.getAs[java.lang.Double]("v")).map(_.toDouble))).toSet
    for (dir <- Seq("backward", "forward"); strict <- Seq(false, true)) {
      val base = snapshot(TemporalJoins.asofJoin(
        l, r, "k", "ts", "rts", Seq("v"), dir, strict))
      val sharded = snapshot(TemporalJoins.asofJoin(
        l, r, "k", "ts", "rts", Seq("v"), dir, strict, hotKeyBuckets = 8))
      assert(sharded == base, s"dir=$dir strict=$strict")
    }
    val out = TemporalJoins.asofJoin(l, r, "k", "ts", "rts", Seq("v"),
      hotKeyBuckets = 8)
    // the window partitions by (key, bucket), still with no join operator
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("__bkt"), plan)
    assert(!plan.contains("Join"), s"sharded asofJoin must not plan a join:\n$plan")
    // and the hot key's rows genuinely occupy more than one task (AQE
    // coalescing off: at this toy size it folds everything into one
    // partition and would mask the sharding we're asserting)
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(coalesceKey)
    try {
      spark.conf.set(coalesceKey, "false")
      val hotTasks = out.filter(col("k") === "hot").rdd
        .mapPartitions(it => Iterator(it.size)).collect().count(_ > 0)
      assert(hotTasks > 1, s"hot key still serialized into $hotTasks task(s)")
    } finally spark.conf.set(coalesceKey, prev)
  }

  test("asofJoin auto hot-key: probe flips to sharded shape on skew only, output identical") {
    val rnd = new scala.util.Random(13)
    val lrows = (1 to 600).map(i =>
      (i.toLong, "hot", rnd.nextInt(100000).toLong)) ++
      (601 to 640).map(i => (i.toLong, s"k${i % 4}", rnd.nextInt(100000).toLong))
    val rrows = ((1 to 300).map(i =>
      ("hot", rnd.nextInt(100000).toLong, i.toDouble)) ++
      (1 to 40).map(i => (s"k${i % 4}", rnd.nextInt(100000).toLong, -i.toDouble)))
      .groupBy(t => (t._1, t._2)).map(_._2.head).toSeq
    val l = lrows.toDF("event", "k", "ts")
    val r = rrows.toDF("k", "rts", "v")
    def snapshot(df: org.apache.spark.sql.DataFrame) =
      df.select("event", "matched_ts", "v").collect()
        .map(x => (x.getAs[Long]("event"),
          Option(x.getAs[java.lang.Long]("matched_ts")).map(_.toLong),
          Option(x.getAs[java.lang.Double]("v")).map(_.toDouble))).toSet
    // skewed input + low threshold: the probe must flip to the sharded
    // shape (still join-free) and match the unsharded output exactly
    for (dir <- Seq("backward", "forward"); strict <- Seq(false, true)) {
      val base = snapshot(TemporalJoins.asofJoin(
        l, r, "k", "ts", "rts", Seq("v"), dir, strict))
      val auto = TemporalJoins.asofJoin(l, r, "k", "ts", "rts", Seq("v"),
        dir, strict, hotKeyBuckets = 0, autoHotKeyThreshold = 100L)
      val plan = auto.queryExecution.executedPlan.toString
      assert(plan.contains("__bkt"),
        s"dir=$dir strict=$strict: probe did not shard a 100x-threshold key:\n$plan")
      assert(!plan.contains("Join"), plan)
      assert(snapshot(auto) == base, s"dir=$dir strict=$strict")
    }
    // uniform input under the same threshold: the probe must keep the
    // plain single-sort plan (no __bkt column anywhere)
    val uni = TemporalJoins.asofJoin(
      l.filter(col("k") =!= "hot"), r.filter(col("k") =!= "hot"),
      "k", "ts", "rts", Seq("v"),
      hotKeyBuckets = 0, autoHotKeyThreshold = 100L)
    assert(!uni.queryExecution.executedPlan.toString.contains("__bkt"))
  }

  test("rangeJoin: hand-computed matches, half-open vs closed high") {
    val points = Seq((1L, 5L), (2L, 10L), (3L, 15L), (4L, 99L))
      .toDF("pid", "p")
    val intervals = Seq((100L, 0L, 10L), (200L, 10L, 20L)).toDF("iid", "lo", "hi")
    val halfOpen = TemporalJoins.rangeJoin(points, intervals, "p", "lo", "hi",
        bucketWidth = 7L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(halfOpen == Set((1L, 100L), (2L, 200L), (3L, 200L)))
    val closed = TemporalJoins.rangeJoin(points, intervals, "p", "lo", "hi",
        bucketWidth = 7L, inclusiveHigh = true)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(closed == Set((1L, 100L), (2L, 100L), (2L, 200L), (3L, 200L)))
  }

  test("rangeJoin: derived width (bucketWidth=0) matches the hand-picked constant") {
    val rnd = new scala.util.Random(5)
    val points = (1 to 500).map(i => (i.toLong, rnd.nextInt(10000).toLong))
      .toDF("pid", "p")
    val intervals = (1 to 100).map { i =>
      val lo = rnd.nextInt(10000).toLong
      (i.toLong * 1000, lo, lo + 50 + rnd.nextInt(100))
    }.toDF("iid", "lo", "hi")
    def run(w: Long) = TemporalJoins.rangeJoin(
      points, intervals, "p", "lo", "hi", bucketWidth = w)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(run(0L) == run(100L))
    assert(run(0L).nonEmpty)
  }

  test("rangeJoin: negative coordinates bucket correctly (floor, not truncate)") {
    val points = Seq((1L, -5L), (2L, -14L), (3L, 0L)).toDF("pid", "p")
    val intervals = Seq((100L, -15L, -1L), (200L, -3L, 4L)).toDF("iid", "lo", "hi")
    val got = TemporalJoins.rangeJoin(points, intervals, "p", "lo", "hi",
        bucketWidth = 7L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 100L), (2L, 100L), (3L, 200L)))
  }

  test("rangeJoin property: equals naive cross-filter on random data") {
    val rnd = new scala.util.Random(11)
    val pts = (1 to 300).map(i => (i.toLong, rnd.nextInt(400).toLong - 200L))
    val ivs = (1 to 60).map { i =>
      val lo = rnd.nextInt(400).toLong - 200L
      (1000L + i, lo, lo + rnd.nextInt(50).toLong)
    }
    val p = pts.toDF("pid", "p")
    val iv = ivs.toDF("iid", "lo", "hi")
    for (width <- Seq(3L, 17L, 100L); inclHigh <- Seq(false, true)) {
      val got = TemporalJoins.rangeJoin(p, iv, "p", "lo", "hi", width, inclHigh)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      val expect = (for {
        (pid, pv) <- pts
        (iid, lo, hi) <- ivs
        if pv >= lo && (if (inclHigh) pv <= hi else pv < hi)
      } yield (pid, iid)).toSet
      assert(got == expect, s"width=$width inclusiveHigh=$inclHigh")
    }
  }

  test("asof_index: binary-search cases (empty, before-first, exact, between, after-last)") {
    import graft.GraftFunctions.asofIndex
    val df = Seq(
      (1L, Seq(10L, 20L, 30L), 5L), (2L, Seq(10L, 20L, 30L), 10L),
      (3L, Seq(10L, 20L, 30L), 25L), (4L, Seq(10L, 20L, 30L), 99L),
      (5L, Seq.empty[Long], 7L)
    ).toDF("case", "arr", "ts")
    val got = df.select(col("case"), asofIndex(col("arr"), col("ts")).as("i"))
      .collect().map(r => r.getAs[Long]("case") ->
        Option(r.getAs[java.lang.Integer]("i")).map(_.toInt)).toMap
    assert(got == Map(1L -> None, 2L -> Some(1), 3L -> Some(2),
      4L -> Some(3), 5L -> None))
  }

  test("asofJoinIndexed: equals asofJoin(backward) on random data") {
    val rnd = new scala.util.Random(13)
    val lrows = (1 to 300).map(i =>
      (i.toLong, s"k${rnd.nextInt(6)}", rnd.nextInt(150).toLong))
    val rrows = (1 to 200).map { i =>
      (s"k${rnd.nextInt(8)}", rnd.nextInt(150).toLong, i.toDouble)
    }.groupBy(t => (t._1, t._2)).map(_._2.head).toSeq
    val l = lrows.toDF("event", "k", "ts")
    val r = rrows.toDF("k", "rts", "v")
    val viaWindow = TemporalJoins.asofJoin(l, r, "k", "ts", "rts", Seq("v"))
      .select("event", "matched_ts", "v").collect()
      .map(x => (x.getAs[Long]("event"),
        Option(x.getAs[java.lang.Long]("matched_ts")),
        Option(x.getAs[java.lang.Double]("v")))).toSet
    val tl = TemporalJoins.compactTimeline(r, "k", "rts", Seq("v"))
    val viaIndex = TemporalJoins.asofJoinIndexed(l, tl, "k", "ts", Seq("v"))
      .select("event", "matched_ts", "v").collect()
      .map(x => (x.getAs[Long]("event"),
        Option(x.getAs[java.lang.Long]("matched_ts")),
        Option(x.getAs[java.lang.Double]("v")))).toSet
    assert(viaIndex == viaWindow)
  }

  test("compactTimeline: per-key cap fails fast") {
    val r = Seq.tabulate(50)(i => ("hot", i.toLong, i.toDouble)).toDF("k", "rts", "v")
    val ex = intercept[Exception] {
      // count() would prune the guarded aggregate away — read the array
      TemporalJoins.compactTimeline(r, "k", "rts", Seq("v"), maxPerKey = 10)
        .agg(sum(size(col("__asof_ts")))).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("compactTimeline")), ex.getMessage)
  }

  test("asofJoinIndexed: runs on a STREAMING left against the static timeline") {
    import java.nio.file.Files
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-asof-stream").toString
    val schema = StructType(Seq(
      StructField("event", LongType), StructField("k", StringType),
      StructField("ts", LongType)))
    def write(batch: Seq[(Long, String, Long)], file: String): Unit =
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          batch.map { case (e, k, t) => org.apache.spark.sql.Row(e, k, t) }, 1),
        schema).write.mode("overwrite").parquet(s"$dir/$file")
    write(Seq((1L, "a", 10L), (2L, "a", 4L), (3L, "b", 50L)), "b1")

    val timeline = TemporalJoins.compactTimeline(
      Seq(("a", 5L, 0.5), ("a", 9L, 0.9), ("c", 1L, 0.1)).toDF("k", "rts", "v"),
      "k", "rts", Seq("v"))
    val stream = spark.readStream.schema(schema).parquet(s"$dir/*")
    val joined = TemporalJoins.asofJoinIndexed(stream, timeline, "k", "ts", Seq("v"))
    assert(joined.isStreaming)
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("asof_stream")
      .trigger(Trigger.ProcessingTime("500 milliseconds")).start()
    try {
      q.processAllAvailable()
      write(Seq((4L, "a", 7L)), "b2") // second micro-batch probes the same timeline
      q.processAllAvailable()
      val got = spark.table("asof_stream")
        .collect().map(r => r.getAs[Long]("event") ->
          ((Option(r.getAs[java.lang.Long]("matched_ts")),
            Option(r.getAs[java.lang.Double]("v"))))).toMap
      assert(got == Map(
        1L -> ((Some(9L), Some(0.9))),  // greatest ts <= 10
        2L -> ((None, None)),           // before a's first snapshot
        3L -> ((None, None)),           // key b has no timeline
        4L -> ((Some(5L), Some(0.5))))) // batch 2, ts 7 -> snapshot 5
    } finally q.stop()
  }

  test("rangeJoin: a degenerate giant interval fails fast instead of exploding") {
    val points = Seq((1L, 5L)).toDF("pid", "p")
    val intervals = Seq((100L, 0L, 100000000L)).toDF("iid", "lo", "hi")
    val ex = intercept[Exception] {
      TemporalJoins.rangeJoin(points, intervals, "p", "lo", "hi",
        bucketWidth = 10L, maxCellsPerInterval = 64).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("rangeJoin")), ex.getMessage)
  }
}
