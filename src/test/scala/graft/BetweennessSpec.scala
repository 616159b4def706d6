package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Betweenness

class BetweennessSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def bc(edges: Seq[(Long, Long)], k: Int = 100): Map[Long, Double] =
    Betweenness.approx(edges.toDF("src", "dst"), k = k)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("path graph 1-2-3: middle vertex carries all dependency") {
    // all-sources (k >= |V|) = exact Brandes, directed-both-ways convention:
    // pair (1,3) contributes via 2 from both endpoints -> 2.0
    val m = bc(Seq((1L, 2L), (2L, 3L)))
    assert(m(2L) == 2.0)
    assert(m(1L) == 0.0 && m(3L) == 0.0)
  }

  test("star graph: center mediates all (n-1)(n-2) directed pairs") {
    val edges = (2L to 6L).map(i => (1L, i))
    val m = bc(edges)
    assert(m(1L) == 5.0 * 4.0) // n-1 = 5 leaves
    assert((2L to 6L).forall(m(_) == 0.0))
  }

  test("path graph 1-2-3-4: exact dependencies") {
    // undirected betweenness: v2 = pairs {1-3,1-4} + ... classic result:
    // bc(2) = bc(3) = 2 (undirected); directed-both-ways doubles it
    val m = bc(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(m(2L) == 4.0 && m(3L) == 4.0)
    assert(m(1L) == 0.0 && m(4L) == 0.0)
  }

  test("diamond: equal-weight split across the two shortest paths") {
    // 1->2->4, 1->3->4 (undirected): sigma(4 from 1) = 2, each of 2,3
    // carries 0.5 per direction of the (1,4) pair -> 1.0 each
    val m = bc(Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)))
    assert(math.abs(m(2L) - 1.0) < 1e-12)
    assert(math.abs(m(3L) - 1.0) < 1e-12)
  }

  test("sampling: k=2 of a path still ranks the middle highest, scaled") {
    val m = Betweenness.approx(
      Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"), k = 2, seed = 7L)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    // scaled = raw * 3/2
    m.foreach { case (_, (raw, scaled)) =>
      assert(math.abs(scaled - raw * 1.5) < 1e-12)
    }
  }
}
