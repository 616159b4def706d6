package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test JVM. */
object SparkTestSession {
  lazy val spark: SparkSession = GraftSession.local(cores = 8, appName = "graft-test")
}
