package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Joins

class JoinsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // multiset of pairs (co-occurrence counts matter, not just the set)
  private def pairBag(df: DataFrame): Map[(Long, Long), Long] =
    df.as[(Long, Long)].collect().groupBy(identity)
      .map { case (k, v) => k -> v.length.toLong }

  private def uniform = (for (g <- 1 to 50; i <- 1 to 5)
    yield (g.toLong, (g * 100 + i).toLong)).toDF("g", "item")

  // one group holds 300 of the 400 rows — the hot key the grouped shape
  // must not serialize into a single task's collected array
  private def skewed = ((1 to 300).map(i => (0L, i.toLong)) ++
    (for (g <- 1 to 20; i <- 1 to 5) yield (g.toLong, (g * 1000 + i).toLong)))
    .toDF("g", "item")

  test("groupedPairs and selfJoinPairs produce the identical pair multiset") {
    for (df <- Seq(uniform, skewed)) {
      val a = pairBag(Joins.groupedPairs(df, "g", "item"))
      val b = pairBag(Joins.selfJoinPairs(df, "g", "item"))
      assert(a == b)
      assert(a.nonEmpty)
    }
  }

  test("adaptivePairs picks the grouped shape on uniform groups") {
    val out = Joins.adaptivePairs(uniform, "g", "item", hotGroupThreshold = 100)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      s"uniform groups must take the no-join grouped shape:\n$plan")
    assert(pairBag(out) == pairBag(Joins.selfJoinPairs(uniform, "g", "item")))
  }

  test("adaptivePairs flips to the spread-out join on a hot group") {
    val out = Joins.adaptivePairs(skewed, "g", "item", hotGroupThreshold = 100)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Join"),
      s"a hot group must take the spread-out self-join shape:\n$plan")
    assert(pairBag(out) == pairBag(Joins.groupedPairs(skewed, "g", "item")))
  }
}
