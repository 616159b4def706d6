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
  * — groups scale out, and the grouping is deterministic (no hash
  * involved) so results reproduce across engines and runs. The per-group
  * scan STREAMS over a secondary sort (`repartition(group)` +
  * `sortWithinPartitions`): heap per task is one open bin (≤ maxTokens
  * keys), not the whole group, so a 100 TB corpus with few groups cannot
  * OOM an executor — Spark's sort spills to disk, the scan never
  * materializes.
  */
object Chunking {

  /** Overlapping token windows: (id, chunk_idx, chunk_text, n_tokens).
    *
    * Windows start every `stride` tokens and span `window` tokens; the
    * last window may be shorter but is never empty; a document shorter
    * than `window` yields exactly one chunk. `stride < window` gives
    * overlap (the usual training-data setting). Null-text documents are
    * dropped (a null token array would otherwise propagate null chunks).
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
      .filter(col("__toks").isNotNull)
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

  /** Greedy NEXT-FIT packing of chunks into bins of at most `maxTokens`
    * tokens: each chunk goes into the currently open bin if it fits, else
    * opens a new one (a chunk larger than the budget gets a bin of its
    * own; earlier bins are never revisited, unlike first-fit). Chunks are
    * processed in (id, chunk_idx) order within their pack group, so
    * output is deterministic. Returns one row per bin with the member
    * chunk keys ("id:chunk_idx").
    *
    * Scale shape: a secondary sort — `repartition($"group")` co-locates
    * each group, `sortWithinPartitions(group, id, chunk_idx)` orders it
    * (Spark's external sort, spills to disk), and `mapPartitions` streams
    * the greedy scan with O(one open bin) heap. No group is ever
    * materialized in memory, so per-task memory is bounded by `maxTokens`
    * keys regardless of corpus size or `numGroups`. */
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
      .repartition(col("group"))
      .sortWithinPartitions("group", "id", "chunk_idx")
      .as[(Long, Long, Long, Long)]
      .mapPartitions { rows =>
        // Groups arrive contiguous (leading sort key). Stream with one
        // open bin of state; flush on group change, bin overflow, and
        // end-of-partition (the appended None sentinel).
        var group = -1L
        var bin = 0L
        var tot = 0L
        var keys = scala.collection.mutable.ArrayBuffer.empty[String]
        def flush(): Iterator[PackedBin] =
          if (keys.isEmpty) Iterator.empty
          else Iterator.single(
            PackedBin(group, bin, keys.length.toLong, tot, keys.toArray))
        (rows.map(Option(_)) ++ Iterator(None)).flatMap {
          case Some((g, id, idx, nTok)) =>
            val key = s"$id:$idx"
            if (g != group) {
              val out = flush()
              group = g; bin = 0L; tot = nTok
              keys = scala.collection.mutable.ArrayBuffer(key)
              out
            } else if (tot + nTok <= maxTokens) {
              keys += key; tot += nTok
              Iterator.empty
            } else {
              val out = flush()
              bin += 1L; tot = nTok
              keys = scala.collection.mutable.ArrayBuffer(key)
              out
            }
          case None => flush()
        }
      }
  }
}
