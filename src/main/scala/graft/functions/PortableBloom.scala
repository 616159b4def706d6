package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Bloom filter with a pure-`Column` membership probe.
  *
  * The 100 TB decontamination shape (GPT-3 appendix C / PaLM style: drop
  * training documents sharing a 13-gram with an eval set) filters a huge
  * corpus against a SMALL key set. The wrong plan shuffles the corpus's
  * n-grams into a join; the right plan broadcasts a bits-sized summary of
  * the key set and drops ~everything BEFORE any join — the join then only
  * confirms the bloom's survivors (the filter has no false negatives, so
  * pre-filter + exact confirm ≡ exact semi-join, just without moving the
  * corpus).
  *
  * Everything here is RNG-free and engine-portable, in the same spirit as
  * [[PortableHash]]: the two probe hashes are the first and second 32-bit
  * words of ONE md5 of the key, and probe j tests bit `(h1 + j*h2) mod m`
  * (classic Kirsch–Mitzenmacher double hashing; h1 + j*h2 < 2^35, no
  * overflow). The probe compiles to codegen'd `element_at`/bit-ops over a
  * literal `array<bigint>` — no UDF, no shuffle, stays inside
  * whole-stage codegen next to the scan it guards.
  *
  * Driver-side state is the bit array itself: `numWords*8` bytes (64 KiB
  * at the default sizing), plus transiently the collected distinct bit
  * positions during [[build]] — bounded by `numBits` regardless of key
  * count, so the build collect can never be driver-large. The key SET
  * being small is inherent to the decontamination use case — the
  * eval/benchmark suite is tiny relative to the corpus; the corpus side
  * never leaves the executors.
  */
object PortableBloom {

  /** First and second 32-bit words of md5(key) as two independent probe
    * hashes — one digest, two halves. SQL twin:
    * `('0x' || substr(md5(c), 1, 8))::BIGINT` and `substr(md5(c), 9, 8)`. */
  def hashPair(c: Column): (Column, Column) = {
    val hex = md5(c.cast("binary"))
    (conv(substring(hex, 1, 8), 16, 10).cast("long"),
      conv(substring(hex, 9, 8), 16, 10).cast("long"))
  }

  /** An immutable built filter. `words` is little-endian within each
    * 64-bit word: bit i of the filter is `(words(i/64) >> (i%64)) & 1`. */
  final case class Filter(words: Array[Long], numProbes: Int) {
    require(words.nonEmpty && numProbes >= 1)
    val numBits: Long = words.length * 64L

    /** Pure-Column membership test from the (h1, h2) probe-hash pair.
      * False positives possible; false negatives impossible for any key
      * whose positions were set by [[build]].
      *
      * Sizing ceiling: the word array ships to executors as an
      * `array<bigint>` LITERAL inside the task binary, which Java
      * serialization boxes per element — fine through ~10⁵ words
      * (≲ 1 MB filters), wasteful beyond. Filters that large mean an
      * eval side in the millions of keys; size by the rule of thumb in
      * [[build]] and keep the key side eval-suite-shaped. */
    def mightContain(h1: Column, h2: Column): Column = {
      val w = lit(words)
      (0 until numProbes)
        .map { j =>
          val pos = (h1 + lit(j.toLong) * h2) % lit(numBits)
          val word = element_at(w,
            call_function("div", pos, lit(64L)).cast("int") + lit(1))
          // functions.shiftright only takes a literal shift; the SQL
          // function of the same name accepts a column operand
          call_function("shiftright", word, (pos % lit(64L)).cast("int"))
            .bitwiseAND(lit(1L)) === lit(1L)
        }
        .reduce(_ && _)
    }

    /** Driver twin of [[mightContain]] over a raw key string — the spec
      * gate that pins the Column probe to this definition. */
    def contains(key: String): Boolean = {
      val d = PortableHash.md5.digest(key.getBytes("UTF-8"))
      val h1 = PortableHash.first32(d)
      val h2 = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      (0 until numProbes).forall { j =>
        val pos = h1 + j.toLong * h2
        val b = pos % numBits
        ((words((b / 64L).toInt) >>> (b % 64L).toInt) & 1L) == 1L
      }
    }
  }

  /** Build a [[Filter]] over the distinct values of `key` in `keys`.
    *
    * ONE job, and the driver only ever receives the filter itself: probe
    * positions fold into per-word OR masks DISTRIBUTEDLY (`bit_or` — a
    * partial-aggregable reduction, so each task pre-ORs its masks before
    * the exchange), and the collect is at most `numWords` (index, mask)
    * pairs — 16 bytes per populated word, independent of key count. A
    * 2²⁶-bit filter collects ≤ 1M pairs; the first cut collected
    * distinct bit POSITIONS instead and OOM'd a 550k-doc build at
    * exactly that sizing.
    *
    * The guard is on saturation — an oversized key side drives FPR → 1
    * and the pre-filter stops filtering — more than half the bits set
    * (FPR ≳ 3% at 5 probes) fails fast with a resize message.
    * Correctness never depends on the FPR (the confirm join removes
    * false positives); the guard protects the SPEED contract.
    *
    * Default sizing: 8192 words = 524,288 bits (64 KiB), 5 probes →
    * FPR ≈ 5e-4 at a 26k-key eval set, ≈ 6e-6 at 5k keys. Rule of thumb
    * when sizing up: keep bits ≥ 16× keys (the saturation guard trips at
    * ~4.4× with 5 probes). */
  def build(
      keys: DataFrame,
      key: Column,
      numWords: Int = 8192,
      numProbes: Int = 5): Filter = {
    require(numWords >= 1 && numProbes >= 1)
    val numBits = numWords * 64L
    val (h1, h2) = hashPair(col("__k"))
    // no key-level distinct: bit_or is idempotent, so duplicate keys OR
    // the same bits — and dropping it removes the build's only
    // string-width exchange (what remains is (int, long) mask pairs with
    // map-side partial aggregation, ≤ numWords rows per task)
    val masks = keys.select(key.as("__k"))
      .select(explode(sequence(lit(0L), lit(numProbes - 1L))).as("__j"),
        h1.as("__h1"), h2.as("__h2"))
      .select(((col("__h1") + col("__j") * col("__h2")) % lit(numBits)).as("__p"))
      .select(call_function("div", col("__p"), lit(64L)).cast("int").as("__w"),
        call_function("shiftleft", lit(1L), (col("__p") % lit(64L)).cast("int"))
          .as("__m"))
      .groupBy(col("__w"))
      .agg(expr("bit_or(__m)").as("__mask"))
      .collect()
    val words = new Array[Long](numWords)
    var setBits = 0L
    masks.foreach { r =>
      words(r.getInt(0)) = r.getLong(1)
      setBits += java.lang.Long.bitCount(r.getLong(1))
    }
    require(setBits * 2L <= numBits,
      s"bloom saturated: $setBits of $numBits bits set — the " +
        "filter would pass ~everything; raise numWords or shrink the key side")
    Filter(words, numProbes)
  }
}
