package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{PortableBloom, TextFunctions}

/** Benchmark decontamination at corpus scale: flag training documents
  * sharing any word n-gram with an evaluation set (the published 13-gram
  * filter shape), with the corpus-side work done by a broadcast Bloom
  * filter instead of a shuffle.
  *
  * [[Dedup.ngramContainment]] (dc01) answers the symmetric question —
  * per (test, train) pair, how MUCH overlaps — and pays an inverted-index
  * join for it. This operator answers the production question — WHICH
  * train docs are contaminated at all — and its plan never shuffles the
  * corpus: n-gram explode (narrow) → codegen'd bloom bit-test (narrow,
  * drops ~everything; false-positive rate is sizing-controlled and only
  * ever costs confirm traffic, never correctness) → broadcast semi-join
  * against the exact eval-gram set (removes the false positives) → one
  * partial-aggregable count per doc. At 100 TB the only exchange is the
  * final per-doc aggregation over contaminated docs — a vanishing
  * fraction of the corpus by construction.
  */
object Decontaminate {

  /** Streaming twin: flag incoming documents that share an n-gram with a
    * PREBUILT eval-gram set — the same codegen bloom probe + broadcast
    * semi-join as the batch path, completely stateless per micro-batch
    * (stream-static join; no watermark, no state store). Build the
    * filter once from the static eval set (`PortableBloom.build`) and
    * reuse it across the stream's lifetime.
    *
    * Output: one row per matching (id, gram) OCCURRENCE; callers
    * aggregate or dropDuplicates as their sink requires. Works on batch
    * DataFrames too (one definition, both modes — same duality as
    * `Curation.curateStream`). */
  def flagContaminated(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      testGrams: DataFrame,
      gramCol: String,
      bloom: PortableBloom.Filter,
      nGram: Int = 13): DataFrame = {
    val grams = docs
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(col(idCol),
        explode(TextFunctions.wordGramsFromTokens(col("__toks"), nGram)).as("g"))
    val (h1, h2) = PortableBloom.hashPair(col("g"))
    grams
      .filter(bloom.mightContain(h1, h2))
      .join(broadcast(testGrams.select(col(gramCol).as("g"))),
        Seq("g"), "left_semi")
  }

  /** Per-train-doc contamination against `test`'s n-gram set.
    *
    * Output: (train_id, n_hits, n_grams, contamination) for train docs
    * with ≥ 1 matching n-gram occurrence — n_hits counts OCCURRENCES
    * (positions), n_grams is the doc's total n-gram count, contamination
    * their ratio; clean docs are absent. Exactness does not depend on
    * the bloom: the filter has no false negatives, so pre-filter + exact
    * semi-join ≡ exact semi-join.
    *
    * The eval set must be small relative to the corpus — inherent to
    * decontamination, and the precondition of the broadcast pattern
    * (`PortableBloom.build` fails fast on a key side that saturates the
    * filter). */
  def bloomDecontaminate(
      train: DataFrame,
      trainIdCol: String,
      trainTextCol: String,
      test: DataFrame,
      testTextCol: String,
      nGram: Int = 13,
      numWords: Int = 8192,
      numProbes: Int = 5): DataFrame = {
    // no .distinct() here: a semi-join build side dedups in its hash
    // table anyway, and PortableBloom.build dedups internally — an
    // explicit distinct would add the lane's only gram-string exchange
    // (PlanShapeSpec pins the plan gram-shuffle-free). localCheckpoint:
    // the frame feeds BOTH the bloom build and the confirm join's
    // broadcast — without it the eval split is scanned and re-exploded
    // twice.
    val testGrams = test
      .select(TextFunctions.tokens(col(testTextCol)).as("__toks"))
      .select(explode(
        TextFunctions.wordGramsFromTokens(col("__toks"), nGram)).as("g"))
      .localCheckpoint(false)
    val bloom = PortableBloom.build(testGrams, col("g"), numWords, numProbes)
    // tokens staged as an aliased column so the gram lambda reads a
    // row field — an inlined tokens(text) tree re-splits the text per
    // gram element (the cdcChunks HOF-eval rule, O(tokens²)/doc)
    val base = Dedup.ensureParallelism(train)
      .select(col(trainIdCol).as("train_id"), col(trainTextCol).as("__ttx"))
      .select(col("train_id"), TextFunctions.tokens(col("__ttx")).as("__toks"))
    // the hot path carries ONLY (train_id, gram): putting size(gs) next
    // to explode(gs) re-inlines the whole gram-array build into a
    // per-gram-row projection (measured ~17x the explode itself) —
    // per-doc totals join the hits aggregate below as a separate narrow
    // frame
    val grams = base.select(col("train_id"),
      explode(TextFunctions.wordGramsFromTokens(col("__toks"), nGram)).as("g"))
    val (h1, h2) = PortableBloom.hashPair(col("g"))
    val hits = grams
      .filter(bloom.mightContain(h1, h2))
      .join(broadcast(testGrams), Seq("g"), "left_semi")
      .groupBy(col("train_id"))
      .agg(count(lit(1)).as("n_hits"))
    // (train_id, n_grams) for every train doc — its own projection, so
    // the gram-array build runs once per doc, not once per gram row.
    // NO broadcast hint on the hits join: hits has one row per
    // CONTAMINATED doc, which is unbounded under heavy leakage (the 10x
    // adversarial corpus grows it 1000x) — AQE broadcasts it when it is
    // actually small, and the fallback shuffle moves only (id, long)
    // rows, never text or grams.
    // size() never enters a lambda, so the gram-array build runs once per
    // doc here; counting grams ≡ max(0, n_toks - n + 1) but the array
    // form keeps ONE gram definition for both frames
    val totals = base.select(col("train_id"),
      size(TextFunctions.wordGramsFromTokens(col("__toks"), nGram))
        .cast("long").as("n_grams"))
    totals
      .join(hits, Seq("train_id"))
      .select(col("train_id"), col("n_hits"), col("n_grams"),
        (col("n_hits").cast("double") / col("n_grams").cast("double"))
          .as("contamination"))
  }

  /** Cross-source n-gram overlap matrix: for every pair of sources, how
    * many DISTINCT word n-grams they share — the leak-observability
    * table a multi-source pipeline logs to see which corpora bleed into
    * which (the pairwise aggregate view of dc01's per-document
    * containment). Published-shape companion to the 13-gram filters:
    * the same gram stream, aggregated by provenance instead of by doc.
    *
    * Plan: one text scan -> (gram-hash, source) DISTINCT (gram-domain
    * agg, map-side combined; only 8-byte hashes + source keys move) ->
    * per-gram source set (bounded by the SOURCE DOMAIN, never corpus
    * size) -> pair explode (<= |sources|^2/2 per gram) -> source-pair
    * counts. Output rows are |sources|^2-bounded at any corpus size.
    *
    * Output: (source_a, source_b, n_shared_grams), source_a < source_b,
    * count desc / pair asc. */
  def crossSourceGramOverlap(
      docs: DataFrame,
      srcCol: String,
      textCol: String,
      nGram: Int = 5): DataFrame = {
    val grams = Dedup.ensureParallelism(docs)
      .select(col(srcCol).as("src"),
        TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(col("src"), explode(
        TextFunctions.wordGramsFromTokens(col("__toks"), nGram)).as("g"))
      .select(col("src"), graft.functions.PortableHash.h60(col("g")).as("gh"))
      .groupBy(col("gh"), col("src")).agg(count(lit(1)).as("__n")).drop("__n")
    val sets = grams.groupBy(col("gh"))
      .agg(sort_array(collect_set(col("src"))).as("srcs"))
      .filter(size(col("srcs")) >= 2)
    sets
      .select(explode(expr(
        """flatten(transform(srcs, (a, i) ->
          |  transform(slice(srcs, i + 2, size(srcs) - i - 1),
          |    b -> struct(a AS source_a, b AS source_b))))""".stripMargin))
        .as("p"))
      .groupBy(col("p.source_a").as("source_a"),
        col("p.source_b").as("source_b"))
      .agg(count(lit(1)).as("n_shared_grams"))
      .orderBy(desc("n_shared_grams"), col("source_a"), col("source_b"))
  }
}
