package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query MEDIAN seconds.
  *
  * Methodology (so the "within 2x of baseline" gate is adjudicable on a
  * shared box whose single-run noise is itself ~2x):
  *   - every parquet table is pre-touched once, so alphabetically-early
  *     queries stop absorbing first-read page-cache costs;
  *   - the session is warmed (codegen compiler, FS init, the widest
  *     expression DAG) before any timing;
  *   - each query runs `SPARK_GRAFT_BENCH_ITERS` times (default 3) and
  *     reports the median; iterations are ROUND-ROBIN (all queries once,
  *     then again, ...) so a transient load burst on the shared box lands
  *     on one iteration of many queries instead of all iterations of one
  *     query — back-to-back repeats would share the burst and the median
  *     would keep it.
  *
  * Artifact durability (a timed-out run must still leave a parseable
  * record — an empty artifact is strictly worse than a 1-pass median):
  *   - after EVERY round-robin pass two JSON lines are printed: the
  *     complete one (full lane names), then a COMPACT one (lane-id keys:
  *     the unique prefix before the first '_', e.g. "q17" for
  *     q17_events_hourly) tagged `"keys":"lane_prefix"`. A consumer that
  *     tails stdout takes the LAST line — the compact one fits entirely
  *     inside a 2,000-char tail capture at the full 91-lane catalog,
  *     which the full line does not (a truncated tail is how round 6's
  *     driver artifact ended up unparseable). Full names + raw samples
  *     live in docs/BENCH_full_last_run.json;
  *   - the pass budget (measured query time; stops STARTING new passes
  *     once exceeded) is DERIVED from the catalog — certified per-lane
  *     cost x current lane count x iters x 1.3 headroom, falling back to
  *     laneCount x iters x [[PerLaneAllowanceS]] — so catalog growth can
  *     never silently make 3 passes unfittable again (round 11's 480 s
  *     constant was sized for 147 lanes; at 158 lanes every driver run
  *     was guaranteed to budget-hit at 2 passes).
  *     `SPARK_GRAFT_BENCH_BUDGET_S` remains an explicit override; on a
  *     slow host the run self-truncates to fewer passes instead of
  *     overrunning the driver's wall limit; the emitted line carries
  *     `"budget_hit": true`;
  *   - docs/BENCH_full_latest.json is only overwritten by a CLEAN final
  *     pass (no errors, no budget hit, not contaminated, >= 2 passes), so
  *     "latest" always points at a valid bench baseline;
  *     docs/BENCH_full_last_run.json records every run unconditionally.
  *
  * Contamination guard (round 9's artifact was a single pass taken under
  * co-tenant load, with lanes at up to 67x their clean medians — a run
  * like that must stamp itself unusable instead of posing as a baseline):
  *   - a fixed CPU-bound probe (xxhash64 over a 2^24 range — zero I/O,
  *     zero shuffle, so its runtime tracks only available CPU) is timed
  *     once before the sweep and once after every pass;
  *   - the capture carries `"probe_s"` (all samples) and
  *     `"contaminated": true` when the probe MEDIAN exceeds 1.5x the
  *     committed quiet-box reference (`PROBE_REF_S`, overridable via
  *     SPARK_GRAFT_BENCH_PROBE_REF_S for other hardware) — median, not
  *     max, so one transient burst in a clean 3-pass run doesn't
  *     false-flag medians that round-robin already absorbed;
  *   - a contaminated or single-pass capture never overwrites
  *     docs/BENCH_full_latest.json ([[certifiable]]).
  *
  * Per-lane plausibility guard (the CPU probe's I/O blind spot — see
  * [[implausibleLanes]]): lane medians are compared to the committed
  * certified medians; in a probe-quiet run, more than
  * `SPARK_GRAFT_BENCH_MAX_IMPLAUSIBLE` (default 3) lanes over 3x their
  * certified median stamps the capture `"implausible": true` (flagged
  * lanes listed in `"implausible_lanes"`) and refuses certification.
  *
  * Per-lane certified bands: each lane entry in the docs artifacts
  * carries `"band":[lo,hi]` — the min/max of certified medians the lane
  * has ever recorded (carried forward from the prior _latest, extended
  * with this capture's median) — so round-over-round drift adjudication
  * reads a same-code spread band instead of re-measuring. A lane the
  * plausibility guard FLAGGED never extends its band nor replaces its
  * baseline median, even when the capture certifies overall
  * ([[laneRecord]] — round 13's per-lane laundering loophole). A lane
  * whose cost LEGITIMATELY changed re-seeds only via the explicit
  * `SPARK_GRAFT_BENCH_RESEED` list the builder sets alongside the code
  * change (the driver never sets it).
  * The reported "total" is the sum of medians.
  */
object Bench {
  /** Quiet-box seconds for [[probeSeconds]]' fixed op, measured on the
    * reference 32-thread box (local[32], warm codegen). */
  val ProbeRefS = 0.30

  /** Fallback per-lane budget allowance when no certified baseline exists
    * to derive from: the catalog's clean per-lane mean is ~1.05 s
    * (166.2 s / 158 lanes on the round-11 certified capture); 1.25 s gives
    * ~19% headroom for noisier windows while staying BELOW the certified
    * per-lane cost x 1.3 path, so a committed baseline (the normal case)
    * actually drives the budget instead of the floor always winning. */
  val PerLaneAllowanceS = 1.25

  /** Derive the pass budget from the catalog instead of a constant.
    *
    * Round 11's round-end artifact was guaranteed non-certifiable because
    * the 480 s constant was sized for a 147-lane catalog and the catalog
    * had grown to 158 lanes (~166 s/clean pass; 3 passes ≈ 500 s > 480) —
    * every driver invocation budget-hit at 2 passes. A budget derived
    * from the catalog size can't silently fall behind it:
    *   - with a committed certified baseline: scale its per-lane cost to
    *     the CURRENT lane count, times iters, times 1.3 headroom (the
    *     documented same-code certified spread on this box is ~1.19x);
    *   - without one (fresh checkout): laneCount x iters x
    *     [[PerLaneAllowanceS]];
    *   - never below the no-baseline floor, so a certified capture taken
    *     in an unusually quiet window can't starve the next run. */
  private[graft] def derivedBudgetS(
      laneCount: Int,
      iters: Int,
      certified: Option[(Double, Int)]): Double = {
    val floor = laneCount * iters * PerLaneAllowanceS
    certified match {
      case Some((total, lanes)) if lanes > 0 && total > 0.0 =>
        math.max((total / lanes) * laneCount * iters * 1.3, floor)
      case _ => floor
    }
  }

  private[graft] def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  /** Load-spiked box? The probe is pure CPU, so a median meaningfully
    * above the quiet-box reference means co-tenant load ate the cores
    * the lane timings ran on. */
  private[graft] def contaminated(
      probes: Seq[Double], refS: Double, factor: Double = 1.5): Boolean =
    probes.nonEmpty && median(probes) > refS * factor

  /** May this capture become docs/BENCH_full_latest.json? Only a full,
    * error-free, budget-clean, uncontaminated, PLAUSIBLE, multi-pass
    * run — a single-pass median is one sample wearing a median's name. */
  private[graft] def certifiable(
      passes: Int, iters: Int, nErrors: Int, budgetHit: Boolean,
      isContaminated: Boolean, isImplausible: Boolean = false): Boolean =
    passes == iters && passes >= 2 && nErrors == 0 && !budgetHit &&
      !isContaminated && !isImplausible

  /** Per-lane plausibility vs the committed certified medians — the CPU
    * probe's I/O blind spot. The probe is xxhash64 over `range` (zero
    * I/O, zero shuffle), so co-tenant DISK/shuffle contention sails past
    * it: round 11's driver snapshot stamped itself "uncontaminated"
    * (probe medians 0.25-0.28 s) while dd06 read 22.5x its certified
    * median on identical code. Lane medians themselves are the I/O-aware
    * signal: on identical code the certified same-code spread tops out
    * around 1.9x on sub-second lanes, so a lane over 3x its committed
    * certified median in an otherwise "clean" run is a contention
    * fingerprint, and several of them together mean the capture is not a
    * baseline. Returns the flagged lane names (sorted, for the artifact).
    * Lanes with no certified median (new this round) are never flagged. */
  private[graft] def implausibleLanes(
      medians: Seq[(String, Double)],
      certified: Map[String, Double],
      factor: Double = 3.0): Seq[String] =
    medians.collect {
      case (name, v) if certified.get(name).exists(c => c > 0.0 && v > c * factor) => name
    }.sorted

  /** Parse a docs/BENCH_full_*.json capture (our own writer's format) into
    * per-lane (median, optional certified band). Regex over the known
    * shape — the file is machine-written by [[main]], not arbitrary JSON. */
  private[graft] def parseCertified(
      doc: String): Map[String, (Double, Option[(Double, Double)])] = {
    val entry =
      """"([A-Za-z0-9_]+)":\{"median":([-0-9.eE+]+),"samples":\[[^\]]*\](?:,"band":\[([-0-9.eE+]+),([-0-9.eE+]+)\])?\}""".r
    entry.findAllMatchIn(doc).map { m =>
      val band = Option(m.group(3)).map(lo => (lo.toDouble, m.group(4).toDouble))
      m.group(1) -> (m.group(2).toDouble, band)
    }.toMap
  }

  /** Total + lane count of a parsed certified capture, for
    * [[derivedBudgetS]]. */
  private[graft] def certifiedTotalLanes(
      doc: String): Option[(Double, Int)] = {
    val lanes = parseCertified(doc)
    val total = """"total":([-0-9.eE+]+)""".r.findFirstMatchIn(doc)
      .map(_.group(1).toDouble)
    total.filter(_ => lanes.nonEmpty).map(t => (t, lanes.size))
  }

  /** Extend a lane's certified band with this capture's median: the band
    * is the min/max of CERTIFIED medians the lane has ever recorded, so
    * round-over-round drift adjudication reads a same-code spread band
    * instead of re-measuring (round 11 spent real effort re-litigating
    * g05/g11 noise that a band would have answered from the file). */
  private[graft] def extendBand(
      prior: Option[(Double, Double)],
      median: Double): (Double, Double) = prior match {
    case Some((lo, hi)) => (math.min(lo, median), math.max(hi, median))
    case None           => (median, median)
  }

  /** The band a capture's artifact may carry for one lane. A band is by
    * definition the spread of CERTIFIED medians — so only a certifiable
    * capture extends it; a refused capture carries the prior certified
    * band through UNCHANGED (round 12's implausible round-end artifact
    * carried bands whose hi was its own 6.2x noise reading — data that
    * reads like certified lineage but isn't), and a refused capture
    * with no certified prior carries no band at all rather than
    * fabricating one from unvetted numbers. */
  private[graft] def bandForCapture(
      prior: Option[(Double, Double)],
      median: Double,
      isCertifiable: Boolean): Option[(Double, Double)] =
    if (isCertifiable) Some(extendBand(prior, median)) else prior

  /** The (baseline median, band) one lane may contribute to the CERTIFIED
    * baseline artifact. The round-13 loophole: a capture with <= 3 flagged
    * lanes still certifies as a whole (co-tenant noise on a couple of
    * lanes shouldn't discard 180+ clean medians), but the band-write loop
    * then extended EVERY lane's band — including the flagged lanes
    * themselves — so g08's 10.7x noise median (samples 1.89/12.04/26.5 s)
    * became its band hi AND its next plausibility baseline, raising its
    * own 3x fence to 36 s. A FLAGGED lane must carry its prior certified
    * median and prior band regardless of whether the capture certifies
    * overall — per-lane implausibility is the same refusal as whole-
    * capture implausibility, applied at lane granularity.
    *
    * `prior` is the lane's committed entry: (certified median, band);
    * a flagged lane always has one ([[implausibleLanes]] never flags a
    * lane without a certified median). */
  /** Drop the certified priors of explicitly re-seeded lanes (matched by
    * name prefix): they become "new" lanes for this run — never flagged
    * by [[implausibleLanes]], band/baseline re-seeded from this capture
    * when it certifies. See the SPARK_GRAFT_BENCH_RESEED note in [[main]]. */
  private[graft] def applyReseed[V](
      certified: Map[String, V], reseed: Seq[String]): Map[String, V] =
    certified.filter { case (k, _) => !reseed.exists(k.startsWith) }

  private[graft] def laneRecord(
      prior: Option[(Double, Option[(Double, Double)])],
      median: Double,
      isCertifiable: Boolean,
      isFlagged: Boolean): (Double, Option[(Double, Double)]) = {
    val priorBand = prior.flatMap(_._2).orElse(prior.map(m => (m._1, m._1)))
    val band = bandForCapture(priorBand, median, isCertifiable && !isFlagged)
    val med = if (isFlagged) prior.map(_._1).getOrElse(median) else median
    (med, band)
  }

  /** Pre-sweep quiet-window wait: probe until the box is quiet or the
    * attempt budget runs out, so a sweep isn't burned into a capture the
    * guard will refuse anyway (round 10's round-end artifact was exactly
    * that — a 480 s budget spent on a load-spiked run the guard then
    * rejected). Pure decision loop over injected `probe`/`sleep` (spec-
    * testable); returns (last probe sample, attempts used). The LAST
    * sample is the one that enters the capture's probe record — it
    * describes the box the sweep actually starts on. */
  private[graft] def awaitQuietWindow(
      probe: () => Double,
      refS: Double,
      maxTries: Int,
      sleep: () => Unit,
      log: String => Unit = System.err.println): (Double, Int) = {
    var tries = 1
    var last = probe()
    while (contaminated(Seq(last), refS) && tries < maxTries) {
      log(f"[bench] pre-sweep probe $last%.3f s > 1.5x ref $refS%.3f s — " +
        f"box busy; waiting before retry (attempt $tries%d/$maxTries%d). " +
        "On slower hardware set SPARK_GRAFT_BENCH_PROBE_REF_S.")
      sleep()
      last = probe()
      tries += 1
    }
    (last, tries)
  }

  /** One timed run of the fixed CPU probe (call once untimed to warm its
    * codegen before trusting the clock). */
  private def probeSeconds(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    spark.range(1L << 24)
      .selectExpr("max(xxhash64(concat(cast(id AS string), '-probe')))")
      .collect()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt.max(1)
    // the committed certified baseline drives the budget AND the per-lane
    // plausibility fence; absent or unreadable file degrades to the
    // catalog-size fallback budget and no plausibility checks
    val certifiedDoc: Option[String] =
      try Some(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("docs/BENCH_full_latest.json")), "UTF-8"))
      catch { case _: Throwable => None }
    // EXPLICIT re-seed list (comma-separated lane-name prefixes): a lane
    // whose cost LEGITIMATELY changed this round (new work added to it)
    // would otherwise be flagged >3x its stale certified median forever —
    // and the per-lane guard would carry that stale baseline forever.
    // Listing it here drops its certified prior for THIS run: it is
    // treated as a new lane (never flagged; band re-seeds from this
    // capture's median when the capture certifies). The builder sets this
    // deliberately alongside the code change; the driver never does —
    // the anti-laundering default stays intact for every unlisted lane.
    val reseed = sys.env.get("SPARK_GRAFT_BENCH_RESEED")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)
    val certifiedLanes = applyReseed(
      certifiedDoc.map(parseCertified).getOrElse(Map.empty), reseed)
    val certifiedMedians = certifiedLanes.view.mapValues(_._1).toMap
    // budget DERIVED from the catalog (round 11's 480 s constant was sized
    // for 147 lanes and could never fit 3 passes of the grown 158-lane
    // catalog — every round-end driver run was guaranteed to budget-hit);
    // the env var stays as an explicit override for profiling loops
    val laneCount = SparkEntry.queries.size
    val budgetS = sys.env.get("SPARK_GRAFT_BENCH_BUDGET_S").map(_.toDouble)
      .getOrElse(derivedBudgetS(laneCount, iters,
        certifiedDoc.flatMap(certifiedTotalLanes)))
    val maxImplausible = sys.env
      .getOrElse("SPARK_GRAFT_BENCH_MAX_IMPLAUSIBLE", "3").toInt
    val probeRefS = sys.env.getOrElse("SPARK_GRAFT_BENCH_PROBE_REF_S",
      ProbeRefS.toString).toDouble
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.prepare(spark)
    // absorb one-time session costs (codegen compiler, FS init) so they
    // don't land on whichever query happens to run first
    spark.range(1000).selectExpr("sum(id)").collect()
    // pre-touch every table the catalog reads once: first read pays
    // page-cache and footer-parse costs that would otherwise land on
    // whichever query reads the table first (alphabetical order made that
    // systematic). A bare count() only reads footers, so hash ALL columns
    // — that decompresses every column page through the OS cache once.
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings"))
      // max, not sum: summing 64-bit hashes overflows under ANSI mode
      spark.read.parquet(s"$sfDir/$t.parquet")
        .selectExpr("max(xxhash64(struct(*)))").collect()
    // events.parquet needs the nanos flag; touch via the entry helper
    try SparkEntry.queries("q17_events_hourly")(spark, sfDir).count()
    catch { case _: Throwable => () }
    // the curation DAG is the widest expression tree in the suite; compile
    // its codegen once on 32 synthetic rows so cu01 (3rd alphabetically)
    // measures steady-state work, not the one-time janino compile
    val warmDocs = spark.range(32).selectExpr(
      "id AS doc_id",
      "concat('the and of to in is that it for was warm doc ', id) AS text")
    val (wc, wd) = graft.operators.Curation.curate(
      warmDocs, "doc_id", "text",
      graft.operators.Curation.Config(
        minTokens = 1L, minQuality = -100L, keepLangs = Seq("en", "und")))
    wc.count(); wd.count()
    // warm the probe's codegen so the first TIMED probe measures CPU, not
    // the janino compile; then take the pre-sweep sample — waiting out a
    // bounded number of busy-box windows first so the sweep isn't spent
    // on a capture the certification guard will refuse
    probeSeconds(spark)
    val quietTries = sys.env.getOrElse("SPARK_GRAFT_BENCH_QUIET_TRIES", "8")
      .toInt.max(1)
    val quietWaitS = sys.env.getOrElse("SPARK_GRAFT_BENCH_QUIET_WAIT_S", "30")
      .toDouble.max(0.0)
    val (preProbe, _) = awaitQuietWindow(
      () => probeSeconds(spark), probeRefS, quietTries,
      () => Thread.sleep((quietWaitS * 1000).toLong))
    val probes = scala.collection.mutable.ListBuffer(preProbe)
    // optional lane filter for local profiling loops (comma-separated
    // name prefixes, e.g. "bp01,cu01"); the driver never sets it. An
    // empty/whitespace value is treated as UNSET — Some(Seq()) would
    // filter out every lane and "succeed" with an empty run.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    // a failing query must be VISIBLE in the artifact, not a silent
    // time-to-exception folded into the median: failed iterations are
    // excluded from samples and the query lands in "errors" instead
    val errors = scala.collection.mutable.SortedSet.empty[String]
    def r3(v: Double): String = f"$v%.3f"
    // Build + print the artifact from whatever samples exist so far. A
    // query that failed EVERY iteration has no median and no entry in
    // "queries" — its name in "errors" is the record.
    // compact stdout keys: the lane-id prefix before the first '_' is
    // unique across the catalog (q17, ann03, dd04, ...); fall back to the
    // full name if a future lane ever collides
    val laneIds: Map[String, String] = {
      val pref = ordered.map { case (n, _) => n -> n.takeWhile(_ != '_') }
      val counts = pref.groupBy(_._2).view.mapValues(_.size).toMap
      pref.map { case (n, p) => n -> (if (counts(p) == 1) p else n) }.toMap
    }
    def emit(passes: Int, budgetHit: Boolean): Unit = {
      val results = ordered.flatMap { case (name, _) =>
        val xs = samples(name)
        if (xs.nonEmpty) Some(name -> median(xs)) else None
      }
      val errJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
      val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
      val dirty = contaminated(probes.toSeq, probeRefS)
      // the probe's I/O blind spot: lane medians vs the committed certified
      // medians catch disk/shuffle contention the CPU probe can't see
      val flagged = implausibleLanes(results, certifiedMedians)
      val implausible = flagged.size > maxImplausible
      val probeJson = probes.map(r3).mkString("[", ",", "]")
      val flaggedJson = flagged.map("\"" + _ + "\"").mkString("[", ",", "]")
      val guardTag = s""","probe_s":$probeJson,"probe_ref_s":${r3(probeRefS)},"contaminated":$dirty,"implausible_lanes":$flaggedJson,"implausible":$implausible"""
      def line(key: String => String, tag: String): String = {
        val qs = results.map { case (k, v) => "\"" + key(k) + "\":" + r3(v) }
          .mkString("{", ",", "}")
        s"""{"metric":"total","value":${r3(total)},"unit":"sec"$tag,"queries":$qs,"errors":$errJson,"sf":"$sfDir","iters":$iters,"passes":$passes,"budget_hit":$budgetHit$guardTag}"""
      }
      // full-precision copy (with every raw sample) written to docs/ — the
      // authoritative per-lane record; _latest only ever holds a CLEAN
      // final capture so it stays a valid comparison baseline
      // a lane-filtered profiling run must not touch EITHER committed
      // docs artifact: last_run promises the full catalog just as the
      // baseline does; filtered runs report via stdout only
      try if (only.isEmpty) {
        val isCert = certifiable(passes, iters, errors.size, budgetHit,
          dirty, implausible)
        val flaggedSet = flagged.toSet
        // per-lane certified band + baseline median ([[laneRecord]]): the
        // band extends with THIS capture's median only when the capture
        // certifies AND the lane itself is unflagged; a flagged lane in an
        // otherwise-certifying capture carries its PRIOR certified median
        // as the baseline value (round 13's loophole let g08's 10.7x noise
        // become its own plausibility fence). last_run records the run's
        // RAW medians unconditionally — only the baseline artifact
        // substitutes; samples stay raw in both.
        def fullDoc(protectFlagged: Boolean): Array[Byte] = {
          val entries = results.map { case (k, v) =>
            val (med, band) = laneRecord(
              certifiedLanes.get(k), v, isCert, flaggedSet.contains(k))
            val medOut = if (protectFlagged) med else v
            val bandJson = band
              .map { case (lo, hi) => s""","band":[$lo,$hi]""" }.getOrElse("")
            ("\"" + k + "\":{\"median\":" + medOut + ",\"samples\":[" +
              samples(k).reverse.mkString(",") + s"]$bandJson}", medOut)
          }
          val qs = entries.map(_._1).mkString("{", ",", "}")
          // writer invariant (parseCertified round-trip): total == sum of
          // the medians WRITTEN, so the protected doc sums protected ones
          val docTotal = entries.map(_._2).sum
          (s"""{"total":$docTotal,"queries":$qs,"errors":$errJson,"sf":"$sfDir","iters":$iters,"passes":$passes,"budget_hit":$budgetHit$guardTag}
              |""").stripMargin.getBytes("UTF-8")
        }
        java.nio.file.Files.write(
          java.nio.file.Paths.get("docs/BENCH_full_last_run.json"),
          fullDoc(protectFlagged = false))
        if (isCert)
          java.nio.file.Files.write(
            java.nio.file.Paths.get("docs/BENCH_full_latest.json"),
            fullDoc(protectFlagged = true))
        else if (passes == iters &&
            certifiable(passes, iters, errors.size, budgetHit,
              isContaminated = false)) {
          // otherwise-clean run refused for guard findings: print EVERY
          // applicable diagnostic — the earlier either/or branching left
          // a doubly-bad (contaminated AND implausible) run with no
          // explanation at all, the exact mystery readout both messages
          // exist to prevent
          if (implausible)
            // per-lane implausibility: the CPU probe may have seen a quiet
            // box but lane medians say I/O contention — name the lanes so
            // the reader sees the fingerprint, not a mystery
            System.err.println(
              s"[bench] capture NOT certified: ${flagged.size} lanes read " +
                s">3x their committed certified medians " +
                s"(I/O contention fingerprint): ${flagged.mkString(", ")}")
          if (dirty)
            // contamination: say so explicitly — on a slower box than the
            // 0.30 s reference this reads as a permanent load problem
            // unless the override knob is surfaced
            System.err.println(
              f"[bench] capture NOT certified: probe median " +
                f"${median(probes.toSeq)}%.3f s vs ref $probeRefS%.3f s " +
                "(1.5x fence). If this box is simply slower than the " +
                "reference, set SPARK_GRAFT_BENCH_PROBE_REF_S.")
        }
      } catch { case _: Throwable => () }
      println(line(identity, ""))
      println(line(laneIds, ",\"keys\":\"lane_prefix\""))
    }
    var measuredNanos = 0L
    var pass = 0
    var budgetHit = false
    while (pass < iters && !budgetHit) {
      pass += 1
      for ((name, fn) <- ordered) {
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case _: Throwable => false }
        val dtNanos = System.nanoTime() - t0
        measuredNanos += dtNanos
        if (ok) samples(name) = dtNanos / 1e9 :: samples(name) else errors += name
      }
      // budget check AFTER a completed pass: never truncate mid-pass (that
      // would bias the pass's medians toward alphabetically-early queries)
      budgetHit = pass < iters && measuredNanos / 1e9 > budgetS
      // post-pass probe: was the box still quiet while this pass ran?
      probes += probeSeconds(spark)
      emit(pass, budgetHit)
    }
    spark.stop()
  }
}
