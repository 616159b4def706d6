package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the settings this engine assumes.
  *
  * Local mode is a stand-in for a real cluster: `shuffle.partitions` is
  * sized to cores (not the 200 default), AQE is on so plans re-shape at
  * runtime (skew joins, partition coalescing) exactly as they would on a
  * 1000-executor deployment at 100 TB.
  */
object GraftSession {
  def local(
      cores: Int = Runtime.getRuntime.availableProcessors(),
      appName: String = "graft"): SparkSession = {
    val s = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // functions arrive via the extensions injection path — no manual
      // registration; externally built sessions use prepare() instead
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // the extension path already populated the registry — mark it so a
    // later prepare() doesn't re-register (and WARN) over the injection
    s.conf.set(RegisteredFlag, "true")
    s
  }

  /** Conf key marking a session whose function registry is already
    * populated. Session-local (RuntimeConfig), so two concurrent sessions
    * each register exactly once. */
  private val RegisteredFlag = "spark.graft.functionsRegistered"

  /** Apply engine settings + function registration to an externally built
    * session (e.g. the driver's Verify/Bench sessions).
    *
    * Idempotent per session: `SparkEntry` calls this on every catalog
    * query, and re-running `createOrReplaceTempFunction` for all ~14
    * functions each time emitted a `SimpleFunctionRegistry … replaced`
    * WARN per function per query — enough log noise to bury a one-line
    * bench artifact. The flag lives in the session conf rather than a JVM
    * global so a fresh session (new registry) still gets registered. */
  def prepare(s: SparkSession): SparkSession = {
    if (!s.conf.getOption(RegisteredFlag).contains("true")) {
      GraftFunctions.register(s)
      s.conf.set(RegisteredFlag, "true")
    }
    // Driver fixtures have stored events.ts as TIMESTAMP(NANOS) in some
    // generations; this session conf makes Spark read that as long nanos
    // (EventStreams.normalize adapts either encoding). Set here — once,
    // before any events read — not inside lane builders: a lane mutating
    // session state is a footgun for every lane that runs after it.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // NOTE (round-14 optimization, measured and rejected): flipping
    // spark.sql.adaptive.coalescePartitions.parallelismFirst to false
    // (size-targeted coalescing) cut the 32-near-empty-task stages of
    // the tiny lanes but cost the mid-size lanes their parallelism
    // (q09 1.4 s -> 2.3 s, g05c 6.0 -> 7.2 s at sf0.1) — the default
    // parallelism-first coalescing is the right trade on BOTH this box
    // and a busy cluster, where the core count is the scarce resource.
    s
  }
}
