package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Document chunking + sequence packing — the two shapes between a curated
  * corpus and a training run at scale.
  *
  * Chunking is pure Column work (stays in WholeStageCodegen, one pass,
  * no shuffle): each document explodes into overlapping token windows.
  * Packing greedily fills bins up to a token budget; the greedy scan is
  * inherently sequential, so it runs per PACK GROUP (`idCol % numGroups`)
  * via `flatMapGroups` — groups scale out, the per-group scan is bounded,
  * and the grouping is deterministic (no hash involved) so results
  * reproduce across engines and runs.
  */
object Chunking {

  /** Overlapping token windows: (id, chunk_idx, chunk_text, n_tokens).
    *
    * Windows start every `stride` tokens and span `window` tokens; the
    * last window may be shorter but is never empty; a document shorter
    * than `window` yields exactly one chunk. `stride < window` gives
    * overlap (the usual training-data setting).
    */
  def chunk(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      window: Int = 256,
      stride: Int = 192): DataFrame = {
    require(window > 0 && stride > 0, "window and stride must be positive")
    val toks = tokens(col(textCol))
    val n = size(toks)
    // number of windows so every token is covered: 1 + ceil((n-window)/stride)
    val nChunks = when(n <= window, lit(1L))
      .otherwise(lit(1L) + ceil((n - lit(window)).cast("double") / stride)
        .cast("long"))
    docs
      .select(col(idCol).as("id"), toks.as("__toks"), nChunks.as("__nc"))
      .select(col("id"),
        posexplode(transform(
          sequence(lit(0L), col("__nc") - 1L),
          i => slice(col("__toks"), (i * stride + 1L).cast("int"),
            lit(window)))))
      .select(col("id"), col("pos").cast("long").as("chunk_idx"),
        array_join(col("col"), " ").as("chunk_text"),
        size(col("col")).cast("long").as("n_tokens"))
  }

  /** One packed training sequence: the chunks assigned to one bin. */
  final case class PackedBin(
      group: Long, bin: Long, n_chunks: Long, total_tokens: Long,
      chunk_keys: Array[String])

  /** Greedy first-fit-in-order packing of chunks into bins of at most
    * `maxTokens` tokens (a chunk larger than the budget gets a bin of its
    * own). Chunks are processed in (id, chunk_idx) order within their
    * pack group, so output is deterministic. Returns one row per bin with
    * the member chunk keys ("id:chunk_idx"). */
  def packGreedy(
      chunks: DataFrame,
      maxTokens: Long,
      numGroups: Int = 64): Dataset[PackedBin] = {
    require(maxTokens > 0 && numGroups > 0)
    val spark = chunks.sparkSession
    import spark.implicits._
    chunks
      .select(pmod(col("id"), lit(numGroups.toLong)).as("group"),
        col("id"), col("chunk_idx"), col("n_tokens"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (group, it) =>
        val sorted = it.toArray.sortBy(r => (r._2, r._3))
        val bins = scala.collection.mutable.ArrayBuffer
          .empty[(scala.collection.mutable.ArrayBuffer[String], Long)]
        sorted.foreach { case (_, id, idx, nTok) =>
          val key = s"$id:$idx"
          bins.lastOption match {
            case Some((keys, tot)) if tot + nTok <= maxTokens =>
              keys += key
              bins(bins.length - 1) = (keys, tot + nTok)
            case _ =>
              bins += ((scala.collection.mutable.ArrayBuffer(key), nTok))
          }
        }
        bins.zipWithIndex.iterator.map { case ((keys, tot), b) =>
          PackedBin(group, b.toLong, keys.length.toLong, tot, keys.toArray)
        }
      }
  }
}
