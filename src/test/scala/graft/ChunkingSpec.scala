package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Chunking

class ChunkingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("chunk: overlapping windows cover every token, last window may be short") {
    val docs = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = Chunking.chunk(docs, "doc_id", "text", window = 4, stride = 3)
      .orderBy("chunk_idx").collect()
    assert(chunks.length == 3) // starts at tokens 1, 4, 7
    assert(chunks.map(_.getAs[String]("chunk_text")).toSeq == Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"))
    assert(chunks.map(_.getAs[Long]("n_tokens")).toSeq == Seq(4L, 4L, 4L))
  }

  test("chunk: document shorter than the window yields exactly one chunk") {
    val docs = Seq((1L, "a b"), (2L, "only")).toDF("doc_id", "text")
    val chunks = Chunking.chunk(docs, "doc_id", "text", window = 4, stride = 3)
      .collect()
    assert(chunks.length == 2)
    assert(chunks.forall(_.getAs[Long]("chunk_idx") == 0L))
  }

  test("chunk: ragged tail window is shorter, never empty") {
    val docs = Seq((1L, (1 to 9).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = Chunking.chunk(docs, "doc_id", "text", window = 4, stride = 3)
      .orderBy("chunk_idx").collect()
    // starts 1, 4, 7: last covers t7 t8 t9 (3 tokens)
    assert(chunks.length == 3)
    assert(chunks.last.getAs[Long]("n_tokens") == 3L)
    assert(chunks.last.getAs[String]("chunk_text") == "t7 t8 t9")
  }

  test("chunk: null-text documents are dropped, not emitted as null chunks") {
    val docs = Seq((1L, "a b c"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val chunks = Chunking.chunk(docs, "doc_id", "text", window = 4, stride = 3)
      .collect()
    assert(chunks.length == 1)
    assert(chunks.head.getAs[Long]("id") == 1L)
    assert(chunks.head.getAs[String]("chunk_text") == "a b c")
  }

  test("packGreedy: next-fit bins respect the budget; oversized chunk gets its own bin") {
    // one doc per chunk so sizes are easy to stage: 3,4,2,5 then a 9
    val chunks = Seq(
      (10L, 0L, 3L), (11L, 0L, 4L), (12L, 0L, 2L), (13L, 0L, 5L),
      (14L, 0L, 9L)
    ).toDF("id", "chunk_idx", "n_tokens")
    val bins = Chunking.packGreedy(chunks, maxTokens = 7L, numGroups = 1)
      .collect().sortBy(_.bin)
    assert(bins.map(_.total_tokens).toSeq == Seq(7L, 7L, 9L))
    assert(bins.map(_.chunk_keys.toSeq).toSeq == Seq(
      Seq("10:0", "11:0"), Seq("12:0", "13:0"), Seq("14:0")))
    assert(bins.forall(b => b.total_tokens <= 7L || b.n_chunks == 1L))
  }

  test("packGreedy is deterministic across group counts (per-group order fixed)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val chunks = Chunking.chunk(docs, "doc_id", "text", window = 64, stride = 48)
    def run(g: Int) = Chunking.packGreedy(chunks, maxTokens = 256L, numGroups = g)
      .collect().map(b => (b.group, b.bin) -> b.chunk_keys.toSeq).toMap
    assert(run(8) == run(8)) // same grouping twice -> identical bins
    val total8 = run(8).values.map(_.length).sum
    val total4 = Chunking.packGreedy(chunks, 256L, 4)
      .collect().map(_.n_chunks).sum
    assert(total8.toLong == total4) // every chunk packed exactly once
  }

  test("packGreedy: adversarially small numGroups streams whole corpus through one group") {
    // numGroups=1 puts EVERY chunk in one pack group — the shape that
    // OOM'd the old toArray scan. The streaming scan must produce the
    // exact layout a driver-side sequential next-fit produces.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val chunks = Chunking.chunk(docs, "doc_id", "text", window = 64, stride = 48)
    val bins = Chunking.packGreedy(chunks, maxTokens = 256L, numGroups = 1)
      .collect().sortBy(_.bin)
    assert(bins.forall(_.group == 0L))
    assert(bins.map(_.bin).toSeq == bins.indices.map(_.toLong)) // dense bin ids
    // reference: sequential next-fit over the driver-collected chunk list
    val seq = chunks.select("id", "chunk_idx", "n_tokens")
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    val expected = scala.collection.mutable.ArrayBuffer.empty[(Seq[String], Long)]
    seq.foreach { case (id, idx, nTok) =>
      val key = s"$id:$idx"
      expected.lastOption match {
        case Some((ks, tot)) if tot + nTok <= 256L =>
          expected(expected.length - 1) = (ks :+ key, tot + nTok)
        case _ => expected += ((Seq(key), nTok))
      }
    }
    assert(bins.map(_.chunk_keys.toSeq).toSeq == expected.map(_._1).toSeq)
    assert(bins.map(_.total_tokens).toSeq == expected.map(_._2).toSeq)
  }
}
