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
      .config("spark.ui.enabled", "false")
      // functions arrive via the extensions injection path — no manual
      // registration; externally built sessions use prepare() instead
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Apply engine settings + function registration to an externally built
    * session (e.g. the driver's Verify/Bench sessions). Idempotent. */
  def prepare(s: SparkSession): SparkSession = {
    GraftFunctions.register(s)
    s
  }
}
