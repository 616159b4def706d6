package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Louvain

class LouvainSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def clique(ids: Seq[Long]): Seq[(Long, Long)] =
    for { a <- ids; b <- ids if a < b } yield (a, b)

  test("two cliques joined by a bridge resolve to two communities") {
    val edges = (clique(1L to 5L) ++ clique(11L to 15L) :+ ((5L, 11L)))
      .toDF("src", "dst")
    val comm = Louvain.run(edges, sweepsPerLevel = 8, levels = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val c1 = (1L to 5L).map(comm).toSet
    val c2 = (11L to 15L).map(comm).toSet
    assert(c1.size == 1, s"clique 1 split: $comm")
    assert(c2.size == 1, s"clique 2 split: $comm")
    assert(c1 != c2, s"cliques merged: $comm")
  }

  test("found partition beats the trivial ones on modularity") {
    val edges = (clique(1L to 5L) ++ clique(11L to 15L) :+ ((5L, 11L)))
      .toDF("src", "dst")
    val comm = Louvain.run(edges)
    val q = Louvain.modularity(edges, comm)
    // known optimum for two 5-cliques + bridge is ~0.476
    assert(q > 0.4, s"modularity $q")
    // singleton partition has Q < 0
    val singletons = comm.select($"id", $"id".as("community"))
    assert(Louvain.modularity(edges, singletons) < q)
  }

  test("three-community ring of cliques") {
    val edges = (clique(1L to 4L) ++ clique(11L to 14L) ++ clique(21L to 24L) ++
      Seq((4L, 11L), (14L, 21L), (24L, 1L))).toDF("src", "dst")
    val comm = Louvain.run(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L to 4L, 11L to 14L, 21L to 24L).forall(g =>
      g.map(comm).toSet.size == 1), s"clique split: $comm")
    assert(comm.values.toSet.size == 3, s"expected 3 communities: $comm")
  }

  test("empty edge set yields empty membership (no crash)") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Louvain.run(empty).isEmpty)
  }

  test("deterministic across runs") {
    val edges = (clique(1L to 5L) ++ clique(11L to 15L) :+ ((5L, 11L)))
      .toDF("src", "dst")
    val a = Louvain.run(edges).collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = Louvain.run(edges).collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
  }
}
