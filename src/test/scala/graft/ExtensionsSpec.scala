package graft

import org.scalatest.funsuite.AnyFunSuite

/** The extensions path is REAL end-to-end here: the shared test session is
  * built with `withExtensions(new GraftExtensions)` and GraftSession.local
  * performs no manual registration — every SQL resolution of a graft
  * function in the whole suite goes through the injected builders. This
  * spec just pins that directly.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("injected functions resolve from pure SQL on the extensions-built session") {
    val s = SparkTestSession.spark
    val c = s.sql(
      "SELECT cosine_sim(array(CAST(3 AS FLOAT), CAST(0 AS FLOAT)), " +
        "array(CAST(1 AS FLOAT), CAST(0 AS FLOAT))) AS c," +
        " simhash64(array('a','b')) AS h," +
        " rolling_fingerprint('hello world document', 4) AS fp")
      .head()
    assert(math.abs(c.getDouble(0) - 1.0) < 1e-12)
    assert(c.getLong(1) != 0L)
    val i = SparkTestSession.spark.sql(
      "SELECT asof_index(array(CAST(10 AS BIGINT), CAST(20 AS BIGINT)), " +
        "CAST(15 AS BIGINT)) AS i").head().getInt(0)
    assert(i == 1)
  }

  test("prepare() covers externally built sessions (temp registration)") {
    // newSession shares the context but gets fresh session state without
    // temp functions; extensions travel with it, prepare() must also work
    val fresh = SparkTestSession.spark.newSession()
    GraftSession.prepare(fresh)
    val v = fresh.sql("SELECT l2_norm(array(CAST(3 AS FLOAT), CAST(4 AS FLOAT))) AS n")
      .head().getDouble(0)
    assert(math.abs(v - 5.0) < 1e-12)
  }
}
