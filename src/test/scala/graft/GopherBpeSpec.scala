package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CorpusStats, Curation}

/** Gopher rule battery: each rule must fire on a document crafted to
  * violate exactly it; BPE training must reproduce the hand-computed
  * merge sequence of the classic Sennrich example. */
class GopherBpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val fiftyGood = // 50 words, mean len 3, two stopword types
    (1 to 25).map(_ => "the and").mkString(" ")

  test("gopherRules: each violation fires its own rule") {
    val docs = Seq(
      (1L, fiftyGood), // passes everything
      (2L, "the data short"), // < 50 words
      (3L, (1 to 50).map(_ => "a the").mkString(" ")), // mean len < 3
      (4L, (1 to 25).map(_ => "the hyperlongwordforms").mkString(" ")), // mean len > 10
      (5L, fiftyGood + " " + (1 to 6).map(_ => "#").mkString(" ")), // symbols > 10%
      (6L, (1 to 25).map(_ => "the 123").mkString(" ")), // alpha words < 80%
      (7L, (1 to 25).map(_ => "data rows").mkString(" ")), // < 2 stopwords
      (8L, (1 to 30).map(_ => "- the data point\n").mkString), // all lines bullets
      (9L, (1 to 30).map(_ => "the data trails ...\n").mkString) // all lines ellipsis
    ).toDF("doc_id", "text")
    val out = Curation.gopherRules(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap

    assert(out(1L).getAs[Boolean]("keep"))
    assert(!out(2L).getAs[Boolean]("r_word_count"))
    assert(!out(3L).getAs[Boolean]("r_mean_word_len"))
    assert(!out(4L).getAs[Boolean]("r_mean_word_len"))
    assert(!out(5L).getAs[Boolean]("r_symbol_ratio"))
    assert(!out(6L).getAs[Boolean]("r_alpha_words"))
    assert(!out(7L).getAs[Boolean]("r_stopwords"))
    assert(!out(8L).getAs[Boolean]("r_bullet_lines"))
    assert(!out(9L).getAs[Boolean]("r_ellipsis_lines"))
    for (id <- 2L to 9L) assert(!out(id).getAs[Boolean]("keep"))
    // counters sanity on the bullet doc: every line starts with '-'
    assert(out(8L).getAs[Long]("n_bullet_lines") >=
      out(8L).getAs[Long]("n_lines") - 1) // trailing '\n' adds an empty line
  }

  test("gopherRules: symbol thresholds are per-symbol, as published") {
    // 3 hashes + 3 ellipses over 56 words: each symbol is under its own
    // 10% fence (30 <= 56) but their SUM is not (60 > 56) — Rae et al.
    // apply the ratio per symbol, so this document must pass
    val doc = Seq((1L, fiftyGood + " # # # ... ... ..."))
      .toDF("doc_id", "text")
    val r = Curation.gopherRules(doc, "doc_id", "text").head()
    assert(r.getAs[Long]("n_words") == 56L)
    assert(r.getAs[Long]("n_hash") == 3L)
    assert(r.getAs[Long]("n_ellipsis") == 3L)
    assert(r.getAs[Boolean]("r_symbol_ratio"))
  }

  test("gopherRules: exact-integer thresholds at the boundary") {
    // exactly 50 words of exactly mean length 3 passes both rules
    val doc = Seq((1L, (1 to 25).map(_ => "the abc").mkString(" ")))
      .toDF("doc_id", "text")
    val r = Curation.gopherRules(doc, "doc_id", "text").head()
    assert(r.getAs[Long]("n_words") == 50L)
    assert(r.getAs[Long]("n_word_chars") == 150L)
    assert(r.getAs[Boolean]("r_word_count"))
    assert(r.getAs[Boolean]("r_mean_word_len"))
  }

  test("bpePairCounts matches a driver pair count") {
    val docs = Seq((1L, "low low low lower lower newest newest widest"))
      .toDF("doc_id", "text")
    val words = Map("low" -> 3L, "lower" -> 2L, "newest" -> 2L, "widest" -> 1L)
    val expected = words.toSeq
      .flatMap { case (w, n) => w.sliding(2).map(_ -> n) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val got = CorpusStats.bpePairCounts(docs, "text", topK = 100).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("bpeTrain reproduces hand-computed merges") {
    // step 1: 'l o' and 'o w' tie at 5 -> 'l o' (pair asc)
    // step 2: 'lo w' 5 (low x3 + lower x2) -> merge ('lo','w')
    // step 3: 'e s' and 's t' tie at 3 (newest x2 + widest) -> 'e s'
    val docs = Seq((1L, "low low low lower lower newest newest widest"))
      .toDF("doc_id", "text")
    val merges = CorpusStats.bpeTrain(docs, "text", steps = 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges(0) == ((1, "l", "o", 5L)))
    assert(merges(1) == ((2, "lo", "w", 5L)))
    assert(merges(2) == ((3, "e", "s", 3L)))
  }

  test("bpeEncode applies trained merges in order, within word boundaries") {
    val docs = Seq((1L, "low low low lower lower newest newest widest"))
      .toDF("doc_id", "text")
    val merges = CorpusStats.bpeTrain(docs, "text", steps = 3).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges == Seq(("l", "o"), ("lo", "w"), ("e", "s")))
    val enc = Seq((1L, "low lowest es tes"), (2L, ""), (3L, null))
      .toDF("doc_id", "text")
    val out = CorpusStats.bpeEncode(enc, "doc_id", "text", merges)
    // contract: docs PLUS pieces/n_pieces — input columns survive
    assert(out.columns.toSeq == Seq("doc_id", "text", "pieces", "n_pieces"))
    val got = out.orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0),
        r.getSeq[String](r.fieldIndex("pieces")).toSeq,
        r.getAs[Long]("n_pieces")))
    // low -> [low]; lowest = l o w e s t -> lo w e s t -> low e s t ->
    // low es t; es -> [es]; tes -> t es.
    // merges never cross word boundaries: "es tes" stays 2 words.
    assert(got(0)._2 == Seq("low", "low", "es", "t", "es", "t", "es"))
    assert(got(0)._3 == 7L)
    // empty AND null text both encode to [] / 0, rows kept
    assert(got(1)._2 == Seq() && got(1)._3 == 0L)
    assert(got(2)._2 == Seq() && got(2)._3 == 0L)
  }

  test("bpeEncodeViaVocab is output-identical to the row-local encoder") {
    // merges chosen so order matters (later merges see earlier symbols)
    val merges = Seq(("l", "o"), ("lo", "w"), ("e", "s"), ("es", "t"))
    val docs = Seq(
      (1L, "low lowest es tes"),
      (2L, "lowest lowest low"), // repeated words: one vocab fold each
      (3L, ""), (4L, null), (5L, "   "), // empty/null/whitespace-only
      (6L, "zq unseen estest")  // words sharing no merge at all
    ).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("doc_id")).collect()
        .map(r => (r.getLong(0),
          r.getSeq[String](r.fieldIndex("pieces")).toSeq,
          r.getAs[Long]("n_pieces"))).toSeq
    val rowLocal = rows(CorpusStats.bpeEncode(docs, "doc_id", "text", merges))
    val viaVocab = rows(
      CorpusStats.bpeEncodeViaVocab(docs, "doc_id", "text", merges))
    assert(viaVocab == rowLocal)
    // contract pin: input columns survive, in order, plus the two outputs
    assert(CorpusStats.bpeEncodeViaVocab(docs, "doc_id", "text", merges)
      .columns.toSeq == Seq("doc_id", "text", "pieces", "n_pieces"))
    // and the empty rows really encode to []/0 (not dropped by the join)
    assert(rowLocal.filter(r => r._1 >= 3L && r._1 <= 5L)
      .forall(r => r._2 == Seq() && r._3 == 0L))
  }

  test("bpeDecode round-trips a markEnd encoding (decode∘encode = identity)") {
    val merges = Seq(("l", "o"), ("lo", "w"), ("e", "s"), ("es", "t"))
    val docs = Seq(
      (1L, "low lowest es tes"),
      (2L, "already normal text"),
      (3L, "  Mixed   CASE  and \t spacing  "), // decode recovers the
      // NORMALIZED form: lowercased, single-spaced, trimmed
      (4L, ""), (5L, null)
    ).toDF("doc_id", "text")
    val normalized = trim(regexp_replace(
      lower(coalesce(col("text"), lit(""))), "\\s+", " "))
    val out = CorpusStats.bpeEncode(docs, "doc_id", "text", merges,
        markEnd = true)
      .select(col("doc_id"),
        CorpusStats.bpeDecode(col("pieces")).as("decoded"),
        normalized.as("want"))
    // the property: decode(encode(x)) == whitespace-normalized lower(x),
    // for every row including empty/null
    assert(out.filter(col("decoded") =!= col("want")).isEmpty)
    // marked and unmarked encodings have IDENTICAL piece boundaries —
    // the marker rides on the last piece, merges never see it
    val marked = CorpusStats.bpeEncode(docs, "doc_id", "text", merges,
        markEnd = true)
      .select(col("doc_id"), transform(col("pieces"),
        p => regexp_replace(p, "</w>", "")).as("pieces"))
    val unmarked = CorpusStats.bpeEncode(docs, "doc_id", "text", merges)
      .select(col("doc_id"), col("pieces"))
    def rows2(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("doc_id")).collect()
        .map(r => (r.getLong(0), r.getSeq[String](1).toSeq)).toSeq
    assert(rows2(marked) == rows2(unmarked))
    // the vocab-path encoder round-trips identically
    val viaVocab = CorpusStats.bpeEncodeViaVocab(docs, "doc_id", "text",
        merges, markEnd = true)
      .select(col("doc_id"),
        CorpusStats.bpeDecode(col("pieces")).as("decoded"),
        normalized.as("want"))
    assert(viaVocab.filter(col("decoded") =!= col("want")).isEmpty)
  }

  test("bpeEncodeViaVocab raises loudly on a null id (reassembly contract)") {
    // a null id can never rejoin its pieces — silent [] output would
    // masquerade as an empty document
    val docs = Seq((java.lang.Long.valueOf(1L), "low"),
      (null.asInstanceOf[java.lang.Long], "low"))
      .toDF("doc_id", "text")
    val ex = intercept[Exception] {
      CorpusStats.bpeEncodeViaVocab(docs, "doc_id", "text",
        Seq(("l", "o"))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("null doc_id")), msgs(ex).mkString("|"))
  }

  test("bpeEncodeViaVocab: checkUniqueIds raises eagerly on a duplicate id") {
    val dup = Seq((1L, "low"), (1L, "lower"), (2L, "low"))
      .toDF("doc_id", "text")
    // eager: the raise happens at CALL time, before any action
    val ex = intercept[IllegalArgumentException] {
      CorpusStats.bpeEncodeViaVocab(dup, "doc_id", "text",
        Seq(("l", "o")), checkUniqueIds = true)
    }
    assert(ex.getMessage.contains("duplicate doc_id=1"), ex.getMessage)
    // unique ids with the flag on: a plain pass-through
    val ok = Seq((1L, "low"), (2L, "low")).toDF("doc_id", "text")
    assert(CorpusStats.bpeEncodeViaVocab(ok, "doc_id", "text",
      Seq(("l", "o")), checkUniqueIds = true).count() == 2L)
  }

  test("bpeMergeOne: greedy non-overlap on a self-pair") {
    val df = Seq(Seq("a", "a", "a"), Seq("a", "a", "a", "a"), Seq("b"))
      .toDF("sym")
    val out = df.select(CorpusStats.bpeMergeOne(col("sym"), "a", "a").as("m"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("aa", "a"))
    assert(out(1) == Seq("aa", "aa"))
    assert(out(2) == Seq("b"))
  }
}
