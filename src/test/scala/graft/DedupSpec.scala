package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

class DedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy dog again and again today"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog again and again tonight"), // near dup of 1
    (4L, "completely unrelated content about databases and distributed query engines"),
    (5L, "yet another separate document mentioning graphs vertices and edges")
  ).toDF("doc_id", "text")

  test("exactGroups finds the exact duplicate group") {
    val groups = Dedup.exactGroups(docs, "doc_id", "text")
      .filter(col("n") > 1).collect()
    assert(groups.length == 1)
    assert(groups.head.getAs[Long]("n") == 2L)
    assert(groups.head.getAs[Long]("keep_id") == 1L)
  }

  test("exactDropIds keeps the smallest id") {
    val drops = Dedup.exactDropIds(docs, "doc_id", "text").collect()
    assert(drops.map(_.getLong(0)).toSet == Set(2L))
  }

  test("minhash LSH surfaces exact and near duplicates, not unrelated pairs") {
    val cands = Dedup.minhashCandidates(docs, "doc_id", "text",
        numHashes = 64, bands = 16, nGram = 3)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(cands.contains((1L, 2L)), s"exact dup pair missing from $cands")
    assert(cands((1L, 2L)) == 1.0)
    assert(cands.contains((1L, 3L)) || cands.contains((2L, 3L)),
      s"near dup pair missing from $cands")
    assert(!cands.contains((4L, 5L)))
  }

  test("fuzzyPairs: thresholded Levenshtein over candidates, drops far pairs") {
    val cands = Dedup.minhashCandidates(docs, "doc_id", "text",
        numHashes = 64, bands = 16, nGram = 3)
      .select("id_a", "id_b")
    val got = Dedup.fuzzyPairs(cands, docs, "doc_id", "text", maxDist = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // exact dup pair: distance 0; near dup differs by one word
    // ("today" -> "tonight": levenshtein("today","tonight") edits)
    assert(got.get((1L, 2L)).contains(0L), s"got $got")
    val near = got.get((1L, 3L)).orElse(got.get((2L, 3L)))
    assert(near.exists(d => d > 0L && d <= 10L), s"got $got")
    // driver replay of the classic DP pins the distances exactly
    def lev(a: String, b: String): Long = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length).toLong
    }
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for (((a, b), dist) <- got)
      assert(dist == lev(texts(a), texts(b)), s"pair ($a,$b)")
    // a tight threshold drops the near pair but keeps the exact one
    val tight = Dedup.fuzzyPairs(cands, docs, "doc_id", "text", maxDist = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tight == Set((1L, 2L)), s"got $tight")
  }

  test("nearDupResolve collapses chains to one survivor; dropNearDups keeps it") {
    // 1~2 exact, 1~3/2~3 near: whichever pairs survive confirmation, CC
    // must put all three in one cluster with min id 1 as the keeper
    val resolved = Dedup.nearDupResolve(docs, "doc_id", "text",
        threshold = 0.5, portable = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(resolved.get(1L).contains(1L))
    assert(resolved.get(2L).contains(1L))
    assert(resolved.get(3L).contains(1L), s"chain not collapsed: $resolved")
    assert(!resolved.contains(4L) && !resolved.contains(5L))
    val kept = Dedup.dropNearDups(docs, "doc_id", "text",
        threshold = 0.5, portable = true)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L, 5L))
    // the murmur (scale-path) family resolves identically on this corpus
    val murmur = Dedup.nearDupResolve(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(murmur == resolved)
  }

  test("simhash near-dup: exact + one-word-edit pairs found on long docs") {
    // simhash bit margins stabilise with token count: a one-token edit on a
    // ~60-token doc flips only low-margin bits, so some 16-bit block matches
    val base = ((1 to 60).map(i => s"tok$i") :+ "ending").mkString(" ")
    val edited = ((1 to 60).map(i => s"tok$i") :+ "changed").mkString(" ")
    val longDocs = Seq(
      (1L, base), (2L, base), (3L, edited),
      (4L, (1 to 60).map(i => s"other$i").mkString(" "))
    ).toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDup(longDocs, "doc_id", "text", maxHamming = 6)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs((1L, 2L)) == 0)
    assert(pairs.contains((1L, 3L)), s"near pair missing: $pairs")
    assert(pairs.keySet.forall { case (a, b) => b != 4L && a != 4L },
      s"unrelated doc paired: $pairs")
  }

  test("ngramJaccard computes exact jaccard (dup pair = 1.0)") {
    val j = Dedup.ngramJaccard(docs, "doc_id", "text", nGram = 3, threshold = 0.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(j((1L, 2L)) == 1.0)
    assert(j((1L, 3L)) > 0.5 && j((1L, 3L)) < 1.0)
    assert(!j.contains((4L, 5L)))
  }

  test("ngramContainment: asymmetric containment, hand-computed") {
    val train = Seq(
      (10L, "a b c d e"),  // superset of the test doc
      (11L, "b c d x y"),  // shares one of two test shingles
      (12L, "q w e r t")   // disjoint
    ).toDF("doc_id", "text")
    val test = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val got = Dedup.ngramContainment(train, "doc_id", "text",
        test, "doc_id", "text", nGram = 3)
      .collect()
      .map(r => (r.getAs[Long]("test_id"), r.getAs[Long]("train_id")) ->
        r.getAs[Double]("containment")).toMap
    // test shingles: {a b c, b c d}; doc 10 contains both (1.0 — where
    // Jaccard would dilute by doc 10's extra shingles), doc 11 one (0.5)
    assert(got == Map((1L, 10L) -> 1.0, (1L, 11L) -> 0.5))
  }

  test("ngramJaccard: self-join and grouped pair routes agree exactly") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def snap(thr: Int) = Dedup.ngramJaccard(corpus, "doc_id", "text",
      nGram = 3, threshold = 0.0, selfJoinPostingLength = thr)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val grouped = snap(Int.MaxValue) // every list via chained explode
    val joined = snap(1)             // every list via the sh self-join
    assert(grouped == joined)
    assert(grouped.nonEmpty)
  }

  test("ngramJaccard: prefix-filtered route equals full enumeration at every threshold") {
    // the threshold > 0 path (AllPairs/PPJoin prefix filtering) must find
    // EXACTLY the pairs the exhaustive path finds — including on a corpus
    // with planted near-dups and a hot boilerplate shingle shared by many
    // docs (the case the prefix order is designed to exclude)
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    import spark.implicits._
    val boiler = " the shared disclaimer sentence for every third document"
    val docs = corpus.select(col("doc_id"), concat(col("text"),
        when(col("doc_id") % 3 === 0, lit(boiler)).otherwise(lit("")))
      .as("text"))
    val exhaustive = Dedup.ngramJaccard(docs, "doc_id", "text",
        nGram = 3, threshold = 0.0)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    for (t <- Seq(0.25, 0.5, 0.8)) {
      val expected = exhaustive.filter { case (_, j) => j >= t }
      val prefixed = Dedup.ngramJaccard(docs, "doc_id", "text",
          nGram = 3, threshold = t)
        .collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      assert(prefixed == expected, s"threshold $t")
    }
    assert(exhaustive.exists { case (_, j) => j >= 0.25 },
      "fixture must exercise at least one above-threshold pair")
  }

  test("ngramContainment: prefix-filtered route equals full enumeration at every threshold") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    import spark.implicits._
    val boiler = " the shared disclaimer sentence for every third document"
    val docs = corpus.select(col("doc_id"), concat(col("text"),
        when(col("doc_id") % 3 === 0, lit(boiler)).otherwise(lit("")))
      .as("text"))
    val trainDocs = docs.filter(col("doc_id") % 10 =!= 0)
    val testDocs = docs.filter(col("doc_id") % 10 === 0)
    val full = Dedup.ngramContainment(trainDocs, "doc_id", "text",
        testDocs, "doc_id", "text", nGram = 3, minContainment = 0.0)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    for (t <- Seq(0.2, 0.5, 0.9)) {
      val expected = full.filter { case (_, c) => c >= t }
      val prefixed = Dedup.ngramContainment(trainDocs, "doc_id", "text",
          testDocs, "doc_id", "text", nGram = 3, minContainment = t)
        .collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      assert(prefixed == expected, s"threshold $t")
    }
    assert(full.exists { case (_, c) => c >= 0.2 },
      "fixture must exercise at least one above-threshold pair")
  }

  test("ngramJaccard emits exactly ONE row per pair on a real corpus") {
    // regression: (sa, sb) used to be labeled by collect_list arrival order,
    // splitting one pair into several groups with mixed-up set sizes and
    // undercounting the intersection (found by the dd03 DuckDB oracle)
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pairs = Dedup.ngramJaccard(corpus, "doc_id", "text",
      nGram = 3, threshold = 0.0)
    val dupGroups = pairs.groupBy("id_a", "id_b").count()
      .filter(col("count") > 1).collect()
    assert(dupGroups.isEmpty,
      s"pair emitted multiple times: ${dupGroups.mkString(",")}")
    // spot-check one pair against a driver-side exact computation
    val top = pairs.orderBy(desc("jaccard"), col("id_a"), col("id_b")).head()
    val (ia, ib, jSpark) = (top.getLong(0), top.getLong(1), top.getDouble(2))
    val texts = corpus.filter(col("doc_id").isin(ia, ib))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    def sh(t: String): Set[String] = {
      val ts = t.trim.toLowerCase.split("\\s+").toSeq
      (0 to ts.length - 3).map(i => ts.slice(i, i + 3).mkString(" ")).toSet
    }
    val (sa, sb) = (sh(texts(ia)), sh(texts(ib)))
    val expect = sa.intersect(sb).size.toDouble / sa.union(sb).size
    assert(jSpark == expect, s"pair ($ia,$ib): $jSpark != $expect")
  }

  test("nearDupAgainstIndex: incremental arrivals match the corpus index only") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val index = Dedup.minhashIndex(corpus, "doc_id", "text")
    val known = corpus.orderBy("doc_id").limit(1)
      .select(col("doc_id"), col("text")).head()
    val incoming = Seq(
      (100000L, known.getString(1)), // exact dup of an indexed doc
      (100001L, "a completely novel document about nothing indexed xyzzy " +
        "plugh quux flibber jabber wocky snark boojum vorpal")
    ).toDF("doc_id", "text")
    val hits = Dedup.nearDupAgainstIndex(incoming, "doc_id", "text", index)
      .dropDuplicates("id", "corpus_id")
      .collect()
    val byId = hits.groupBy(_.getLong(0))
    // the dup must hit its source with est 1.0; the novel doc hits nothing
    assert(byId.contains(100000L), s"dup not detected: ${hits.mkString(",")}")
    val dupHits = byId(100000L)
    assert(dupHits.exists(r =>
      r.getLong(1) == known.getLong(0) && r.getDouble(2) == 1.0))
    assert(!byId.contains(100001L),
      s"novel doc false-matched: ${byId.get(100001L).mkString(",")}")
  }

  test("saveMinhashIndex/loadMinhashIndex round-trip: same answers, mismatches fail fast") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val index = Dedup.minhashIndex(corpus, "doc_id", "text")
    val known = corpus.orderBy("doc_id").limit(1)
      .select(col("doc_id"), col("text")).head()
    val dir = java.nio.file.Files
      .createTempDirectory("graft-mhidx").toString
    Dedup.saveMinhashIndex(index, dir)
    val reloaded = Dedup.loadMinhashIndex(spark, dir)
    val incoming = Seq(
      (100000L, known.getString(1)),
      (100001L, "a completely novel document about nothing indexed xyzzy " +
        "plugh quux flibber jabber wocky snark boojum vorpal")
    ).toDF("doc_id", "text")
    def hits(idx: org.apache.spark.sql.DataFrame) =
      Dedup.nearDupAgainstIndex(incoming, "doc_id", "text", idx)
        .dropDuplicates("id", "corpus_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
    // id01-equivalent answers through the reloaded artifact
    assert(hits(reloaded) == hits(index))
    assert(hits(reloaded).contains((100000L, known.getLong(0), 1.0)))
    // querying with different parameters would SILENTLY miss dups —
    // the load must crash instead, naming the mismatched field
    val ex = intercept[IllegalArgumentException] {
      Dedup.loadMinhashIndex(spark, dir, bands = 8)
    }
    assert(ex.getMessage.contains("bands"), ex.getMessage)
    val ex2 = intercept[IllegalArgumentException] {
      Dedup.loadMinhashIndex(spark, dir, portable = true)
    }
    assert(ex2.getMessage.contains("portable"), ex2.getMessage)
    // a directory that is not an artifact at all
    val ex3 = intercept[IllegalArgumentException] {
      Dedup.loadMinhashIndex(spark,
        java.nio.file.Files.createTempDirectory("graft-empty").toString)
    }
    assert(ex3.getMessage.contains("_GRAFT_INDEX_META"), ex3.getMessage)
  }

  test("mergeIntoMinhashIndex: incremental build equals from-scratch; re-ingest is a no-op") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val half1 = corpus.filter(col("doc_id") % 2 === 0)
    val half2 = corpus.filter(col("doc_id") % 2 =!= 0)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-mhmerge").toString
    Dedup.saveMinhashIndex(Dedup.minhashIndex(half1, "doc_id", "text"), dir)
    val n = Dedup.mergeIntoMinhashIndex(spark, dir, half2, "doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("band", "bucket", "id").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    // merged artifact == the index built from the whole corpus at once
    val scratch = Dedup.minhashIndex(corpus, "doc_id", "text")
    val merged = Dedup.loadMinhashIndex(spark, dir)
    assert(rows(merged) == rows(scratch))
    assert(n == merged.count())
    // re-ingesting an already-indexed batch changes nothing
    val n2 = Dedup.mergeIntoMinhashIndex(spark, dir, half2, "doc_id", "text")
    assert(n2 == n)
    assert(rows(Dedup.loadMinhashIndex(spark, dir)) == rows(scratch))
    // no staging leftovers after a successful swap
    assert(!new java.io.File(s"$dir/index.staging").exists())
    // re-ingesting an id with CHANGED text keeps BOTH signatures
    // (deterministic — never a per-band mix), so the index grows and
    // incoming copies of the NEW text are still caught
    val changedText = "a completely rewritten document about xyzzy " +
      "plugh quux flibber jabber wocky snark boojum vorpal metasyntactic"
    val someId = half2.orderBy("doc_id").limit(1).head().getLong(0)
    val n3 = Dedup.mergeIntoMinhashIndex(spark, dir,
      Seq((someId, changedText)).toDF("doc_id", "text"), "doc_id", "text")
    assert(n3 > n2, s"changed-text re-ingest must add rows: $n3 vs $n2")
    val hits = Dedup.nearDupAgainstIndex(
      Seq((999999L, changedText)).toDF("doc_id", "text"),
      "doc_id", "text", Dedup.loadMinhashIndex(spark, dir))
      .dropDuplicates("id", "corpus_id").collect()
    assert(hits.exists(r => r.getLong(1) == someId && r.getDouble(2) == 1.0))
  }

  test("minhashIndex caps hot buckets to ONE representative (fan-out bounded, detection kept)") {
    // 30 identical docs: every (band, bucket) they share holds 30 rows.
    // With maxBucketSize=10 those buckets must degrade to the min-id
    // representative — NOT drop: an exact-dup crowd is over cap in EVERY
    // band, so dropping would blind the index to exactly the
    // most-duplicated content.
    val degenerate = "same degenerate text every time " +
      "lorem ipsum dolor sit amet consectetur adipiscing elit"
    val docs = ((1L to 30L).map(i => (i, degenerate)) ++
      Seq((100L, "one unique document about xyzzy plugh quux flibber"),
        (101L, "another unique document snark boojum vorpal jabber")))
      .toDF("doc_id", "text")
    val capped = Dedup.minhashIndex(docs, "doc_id", "text", maxBucketSize = 10)
    val sizes = capped.groupBy("band", "bucket").count().collect()
    assert(sizes.nonEmpty, "unique docs must keep their buckets")
    assert(sizes.forall(_.getLong(2) <= 10L),
      s"bucket above cap survived: ${sizes.mkString(",")}")
    assert(capped.filter(col("id") >= 100L).count() > 0)
    // the crowd survives as exactly its min id in each band
    val crowdIds = capped.filter(col("id") <= 30L)
      .select("id").distinct().collect().map(_.getLong(0)).toSet
    assert(crowdIds == Set(1L), s"expected one representative, got $crowdIds")
    // and an incoming 31st copy is STILL detected against the capped index
    val incoming = Seq((200L, degenerate)).toDF("doc_id", "text")
    val hits = Dedup.nearDupAgainstIndex(incoming, "doc_id", "text", capped)
      .dropDuplicates("id", "corpus_id").collect()
    assert(hits.exists(r => r.getLong(0) == 200L && r.getLong(1) == 1L &&
      r.getDouble(2) == 1.0),
      s"incoming copy of the capped crowd must match: ${hits.mkString(",")}")
  }

  test("nearDupMicroBatch catches intra-batch dups AND corpus dups in one pass") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val index = Dedup.minhashIndex(corpus, "doc_id", "text")
    val known = corpus.orderBy("doc_id").limit(1)
      .select(col("doc_id"), col("text")).head()
    val novel = "a completely novel document about nothing indexed xyzzy " +
      "plugh quux flibber jabber wocky snark boojum vorpal"
    val batch = Seq(
      (100000L, known.getString(1)), // dup of an indexed corpus doc
      (100001L, novel), // intra-batch dup pair: 100001 ~ 100002
      (100002L, novel)
    ).toDF("doc_id", "text")
    val hits = Dedup.nearDupMicroBatch(batch, "doc_id", "text", index)
      .collect()
    val corpusHits = hits.filter(_.getString(3) == "corpus")
    val batchHits = hits.filter(_.getString(3) == "batch")
    assert(corpusHits.exists(r =>
      r.getLong(0) == 100000L && r.getLong(1) == known.getLong(0)),
      s"corpus dup missed: ${hits.mkString(",")}")
    assert(batchHits.exists(r =>
      r.getLong(0) == 100002L && r.getLong(1) == 100001L &&
        r.getDouble(2) == 1.0),
      s"intra-batch dup missed: ${hits.mkString(",")}")
    // the novel pair must not corpus-match; the corpus dup not batch-match
    assert(!corpusHits.exists(r => r.getLong(0) == 100001L))
  }

  test("ensureParallelism: no-op on parallel input, repartitions narrow input") {
    // reference equality IS the no-exchange guarantee q38 relies on: an
    // already-parallel frame passes through untouched (no plan node added)
    val target = spark.sparkContext.defaultParallelism
    val wide = spark.range(1000).repartition(target).toDF()
    assert(Dedup.ensureParallelism(wide) eq wide)
    val narrow = spark.range(1000).coalesce(1).toDF()
    val fixed = Dedup.ensureParallelism(narrow)
    assert(fixed.queryExecution.toRdd.getNumPartitions == target)
  }

  test("nearDupClusters resolves transitive chains to one keeper") {
    // A~B and B~C but never A~C directly: pairwise dropping would keep C
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val clusters = Dedup.nearDupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters(1L) == 1L && clusters(2L) == 1L && clusters(3L) == 1L)
    assert(clusters(10L) == 10L && clusters(11L) == 10L)
  }

  test("embeddingNearDup finds identical embeddings via LSH buckets") {
    val vecs = Seq(
      (1L, Seq.fill(16)(0.5f)),
      (2L, Seq.fill(16)(0.5f)),
      (3L, (0 until 16).map(i => if (i % 2 == 0) 1f else -1f))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDup(vecs, "vec_id", "embedding",
        dim = 16, cosThreshold = 0.99, bitsPerTable = 4, tables = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("semanticNearDup: identical vectors pair within their cell; cross-cell pairs never emit") {
    // two identical vectors (one cluster), one near-opposite direction:
    // with 2 cells the opposite vector separates, so only (1,2) pairs
    val vecs = Seq(
      (1L, Seq.fill(16)(0.5f)),
      (2L, Seq.fill(16)(0.5f)),
      (3L, (0 until 16).map(i => if (i % 2 == 0) 1f else -1f)),
      (4L, (0 until 16).map(i => if (i % 2 == 0) 0.9f else -1.1f))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.semanticNearDup(vecs, "vec_id", "embedding",
        nCells = 2, cosThreshold = 0.9, portable = true)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    assert(pairs.keySet.contains((1L, 2L)), s"got $pairs")
    assert(math.abs(pairs((1L, 2L)) - 1.0) < 1e-12)
    // 3 and 4 are cosine-similar to each other (~0.99) but if they land
    // in the same cell they pair; if 1/2's cell differs they never pair
    // with 1/2 (blocking is by cell, not by similarity)
    assert(!pairs.keySet.exists { case (a, b) =>
      Set(a, b).intersect(Set(1L, 2L)).size == 1
    }, s"cross-cluster pair leaked: $pairs")
    // sanity against the LSH route on the same fixture: the shared
    // identical-vector pair is found by both blockings
    val lsh = Dedup.embeddingNearDup(vecs, "vec_id", "embedding",
        dim = 16, cosThreshold = 0.99, bitsPerTable = 4, tables = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.contains((1L, 2L)))
  }

  test("portable signatures: md5-exact, duplicate-detecting, sentinel on short docs") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // exact dup of 1
      (3L, "totally different words everywhere here now"),
      (4L, "too short")                            // < 3 tokens: sentinel sig
    ).toDF("doc_id", "text")
    val sigs = docs.select(col("doc_id").as("id"),
      Dedup.minhashSigColumnPortable(col("text"), 64, 3).as("sig"))
    val byId = sigs.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(byId(1L) == byId(2L))
    assert(byId(1L) != byId(3L))
    assert(byId(4L).forall(_ == Dedup.PortableP)) // sentinel everywhere
    assert(byId(1L).forall(v => v >= 0L && v < Dedup.PortableP))
    // the real banding code finds the dup pair at estimate 1.0
    val cands = Dedup.minhashCandidatesFromSigs(sigs, 64, 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(cands.exists(c => c._1 == 1L && c._2 == 2L && c._3 == 1.0))
    assert(!cands.exists(c => c._2 == 3L && c._3 > 0.5))

    // simhash60Portable on ONE token equals that token's md5-60 hash (every
    // set bit wins its vote 1-0) — pins the md5 derivation bit-for-bit
    val one = Seq((1L, "x")).toDF("doc_id", "text")
      .select(Dedup.simhash60Portable(col("text"))).head.getLong(0)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("x".getBytes("UTF-8"))
    val want = md.take(8).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL)) >>> 4
    assert(one == want)
    // and a 60-bit value with the FromSigs blocking finding exact dups
    val ssigs = docs.select(col("doc_id").as("id"),
      Dedup.simhash60Portable(col("text")).as("sig"))
    assert(ssigs.collect().forall(r => (r.getLong(1) >>> 60) == 0L))
    val spairs = Dedup.simhashNearDupFromSigs(ssigs, maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(spairs.contains((1L, 2L)))
  }

  test("nearDupResolveBy: survivor is the highest-priority cluster member") {
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today", 10L),
      (2L, "the quick brown fox jumps over the lazy dog again and again today", 90L),
      (3L, "the quick brown fox jumps over the lazy dog again and again tonight", 50L),
      (4L, "completely unrelated content about databases and distributed query engines", 99L)
    ).toDF("doc_id", "text", "pri")
    val got = Dedup.nearDupResolveBy(d, "doc_id", "text", "pri",
        threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // cluster {1,2,3} keeps stable min-id label 1, elects doc 2 (pri 90);
    // doc 4 is unclustered and absent
    assert(got == Set((1L, 1L, 2L), (2L, 1L, 2L), (3L, 1L, 2L)))
    val kept = Dedup.dropNearDupsBy(d, "doc_id", "text", "pri",
        threshold = 0.7)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 4L))
  }

  test("portable signatures: codegen expression == HOF/SQL twin, bit-for-bit") {
    // the expression path (tight JVM loop) must reproduce the SQL-composed
    // formulation the DuckDB oracle replays — on real docs AND edge cases
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(200)
    val edge = Seq(
      (9001L, ""),                            // empty → single empty token
      (9002L, "   leading  and   gaps  "),    // trim + \s+ collapse
      (9003L, "exactly three tokens"),        // boundary: one shingle
      (9004L, "two tokens"),                  // below nGram: sentinel
      (9005L, "café naïve 中文 über mix"), // multi-byte UTF-8
      (9006L, "a b c d e f g h i j k l m n o p q r s t u v w x y z")
    ).toDF("doc_id", "text")
    val docs = real.unionByName(edge)
    val cmp = docs.select(
      Dedup.minhashSigColumnPortable(col("text"), 16, 3).as("fast"),
      Dedup.minhashSigColumnPortableHof(col("text"), 16, 3).as("hof"),
      Dedup.simhash60Portable(col("text")).as("sfast"),
      Dedup.simhash60PortableHof(col("text")).as("shof"))
    val rows = cmp.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
      assert(r.getLong(2) == r.getLong(3))
    }
  }

  test("dupSpans: shared runs merge to maximal spans; gaps split them") {
    // A and B share tokens 0-5 ("a1".."a6") and 10-15 ("b1".."b6"),
    // with doc-unique middles — with k=3 the shared runs are duplicated
    // windows, the middles break them into TWO spans per doc
    val a = "a1 a2 a3 a4 a5 a6 xm1 xm2 xm3 xm4 b1 b2 b3 b4 b5 b6"
    val b = "a1 a2 a3 a4 a5 a6 ym1 ym2 ym3 ym4 b1 b2 b3 b4 b5 b6"
    val d = Seq((1L, a), (2L, b), (3L, "nothing in common here at all"))
      .toDF("doc_id", "text")
    val spans = Dedup.dupSpans(d, "doc_id", "text", k = 3, minDocs = 2)
      .orderBy("doc_id", "span_start").collect()
    assert(spans.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 0L, 6L), (1L, 10L, 16L), (2L, 0L, 6L), (2L, 10L, 16L)))
    // n_windows: a 6-token run has 4 3-grams
    assert(spans.forall(_.getAs[Long]("n_windows") == 4L))
  }

  test("dupSpans: adjacent windows merge, sub-k docs and unique text emit nothing") {
    val d = Seq(
      (1L, "p q r s t u v w"), // shares the whole 8-token run with 2
      (2L, "p q r s t u v w"),
      (3L, "too short"), // < k tokens: no windows at all
      (4L, "entirely different words everywhere in this one")
    ).toDF("doc_id", "text")
    val spans = Dedup.dupSpans(d, "doc_id", "text", k = 4, minDocs = 2)
      .orderBy("doc_id").collect()
    // one maximal span covering the whole run in each of docs 1 and 2
    assert(spans.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 0L, 8L), (2L, 0L, 8L)))
  }

  test("removeDupSpans: drops span tokens case-preserved, untouched docs byte-identical") {
    val a = "KEEP1 shared run of tokens here KEEP2 KEEP3"
    val b = "keepx shared run of tokens here keepy keepz"
    val untouched = "Totally   Unrelated    Whitespace   Preserved"
    val d = Seq((1L, a), (2L, b), (3L, untouched)).toDF("doc_id", "text")
    // k=5: "shared run of tokens here" (positions 1-5) is the only
    // duplicated window
    val out = Dedup.removeDupSpans(d, "doc_id", "text", k = 5, minDocs = 2)
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(out(0) == "KEEP1 KEEP2 KEEP3") // case kept, span gone
    assert(out(1) == "keepx keepy keepz")
    assert(out(2) == untouched) // not affected: original whitespace intact
  }

  test("removeDupSpans: a fully-duplicated doc empties to the zero-length string") {
    val t = "only this exact content twice over"
    val d = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    val out = Dedup.removeDupSpans(d, "doc_id", "text", k = 6, minDocs = 2)
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(out.toSeq == Seq("", ""))
  }

  test("sortedNeighborhoodPairs: rank-window pairs within blocks only, w bound holds") {
    // four docs share block "aaaaaaaa" and sort b < c < d < e; w = 3
    // pairs ranks at distance <= 2, so (1,4) at distance 3 is excluded;
    // doc 9 sits alone in block "zzzzzzzz" and never pairs
    val d = Seq(
      (1L, "aaaaaaaa b one"),
      (2L, "aaaaaaaa c two"),
      (3L, "aaaaaaaa d three"),
      (4L, "aaaaaaaa e four"),
      (9L, "zzzzzzzz lonely tail")).toDF("doc_id", "text")
    val pairs = Dedup.sortedNeighborhoodPairs(d, "doc_id", "text",
        keyLen = 24, blockLen = 8, w = 3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L), (2L, 4L)))
  }

  test("winnowingFingerprints: exact driver replay of the MOSS selection") {
    def h(s: String) = graft.functions.PortableHash.md5_32(s)
    val text = (0 until 30).map(i => s"t${(i * 11) % 13}").mkString(" ")
    val toks = text.split("\\s+")
    val hashes = toks.sliding(4).map(g => h(g.mkString(" "))).toSeq
    val expected = hashes.sliding(4).map(_.min).toSeq.distinct.sorted
    val d = Seq((1L, text)).toDF("doc_id", "text")
    val got = Dedup.winnowingFingerprints(d, "doc_id", "text", k = 4, w = 4)
      .collect().map(_.getLong(1)).sorted
    assert(got.toSeq == expected)
  }

  test("winnowingPairs: a shared w+k-1 token run guarantees a shared fingerprint") {
    val shared = "alpha beta gamma delta epsilon zeta eta" // 7 = w+k-1
    val d = Seq(
      (1L, s"one two three four five $shared"),
      (2L, s"$shared six seven eight nine ten"),
      (3L, "totally different words everywhere here now obviously"))
      .toDF("doc_id", "text")
    val pairs = Dedup.winnowingPairs(d, "doc_id", "text",
        k = 4, w = 4, minShared = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)), pairs.toSeq.toString)
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("cdcChunks: chunks partition each document; degenerate docs behave") {
    val base = (0 until 60).map(i => s"tok${i % 23}x$i").mkString(" ")
    val d = Seq((1L, base), (2L, "solo"), (3L, "  "), (4L, "a b"))
      .toDF("doc_id", "text")
    val rows = Dedup.cdcChunks(d, "doc_id", "text", k = 4, divisor = 4L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // whitespace-only doc: no rows; 1- and 2-token docs: one whole chunk
    assert(!rows.exists(_._1 == 3L))
    assert(rows.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 0L, 1L)))
    assert(rows.filter(_._1 == 4L).toSeq == Seq((4L, 0L, 0L, 2L)))
    // chunks PARTITION the token stream: starts are the running sums of
    // lengths, totals match the token count, and divisor 4 actually cut
    val c1 = rows.filter(_._1 == 1L).sortBy(_._2)
    assert(c1.length > 1, "divisor 4 over 57 windows should cut at least once")
    assert(c1.map(_._4).sum == 60L)
    assert(c1.scanLeft(0L)(_ + _._4).init.toSeq == c1.map(_._3).toSeq)
  }

  test("cdcChunks: boundaries re-synchronize after an insertion (the CDC point)") {
    val base = (0 until 80).map(i => s"w${i * 7 % 31}n$i").mkString(" ")
    val d = Seq((1L, base), (2L, s"inserted $base")).toDF("doc_id", "text")
    val ch = Dedup.cdcChunks(d, "doc_id", "text", k = 4, divisor = 8L)
      .select(col("doc_id"), col("chunk_idx"), col("chunk_h")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val aHashes = ch.filter(_._1 == 1L).map(_._3).toSet
    val bTail = ch.filter(t => t._1 == 2L && t._2 >= 1L).map(_._3)
    assert(bTail.nonEmpty, "the 80-token doc should cut more than one chunk")
    // every chunk of the shifted doc except its first re-synchronizes to
    // a chunk of the original — a fixed-stride chunker shares none
    assert(bTail.forall(aHashes.contains),
      s"unsynchronized chunks: ${bTail.filterNot(aHashes.contains).toSeq}")
  }

  test("dedupLinesKeepFirst: global first occurrence survives, later ones drop") {
    val d = Seq(
      (1L, "unique alpha line one\nshared sentence across documents\nunique alpha line two"),
      (2L, "shared sentence across documents\nunique beta line"),
      (3L, "unique gamma line\nshared sentence across documents")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupLinesKeepFirst(d, "doc_id", "text", minChars = 10)
      .orderBy("doc_id").select("text").as[String].collect()
    // doc 1 owns the shared line ((1, pos 1) is the min) — untouched
    assert(out(0) ==
      "unique alpha line one\nshared sentence across documents\nunique alpha line two")
    assert(out(1) == "unique beta line")
    assert(out(2) == "unique gamma line")
  }

  test("dedupLinesKeepFirst: intra-doc repeats keep the earliest position") {
    val d = Seq(
      (7L, "repeated inside document\nmiddle content line here\nrepeated inside document")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupLinesKeepFirst(d, "doc_id", "text")
      .select("text").as[String].head()
    assert(out == "repeated inside document\nmiddle content line here")
  }

  test("dedupLinesKeepFirst: short lines are exempt; CRLF normalizes on rewrite only") {
    val d = Seq(
      (1L, "--\nlong enough duplicated line\n--"),
      (2L, "--\nlong enough duplicated line"),
      // no duplicated >=minChars line: passes through BYTE-identical,
      // CRLF intact (only affected docs are rebuilt)
      (3L, "crlf untouched line\r\nsecond untouched line")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupLinesKeepFirst(d, "doc_id", "text", minChars = 10)
      .orderBy("doc_id").select("text").as[String].collect()
    assert(out(0) == "--\nlong enough duplicated line\n--") // owner + exempt shorts
    assert(out(1) == "--")                                  // dup dropped, short kept
    assert(out(2) == "crlf untouched line\r\nsecond untouched line")
  }

  test("corpusDiff: added/removed/changed named exactly; unchanged omitted or kept") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val neu = Seq((1L, "a"), (2L, "B2"), (4L, "d")).toDF("doc_id", "text")
    val diff = Dedup.corpusDiff(old, neu, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(diff == Seq((2L, "changed"), (3L, "removed"), (4L, "added")))
    val all = Dedup.corpusDiff(old, neu, "doc_id", "text", includeUnchanged = true)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(all == Seq((1L, "unchanged"), (2L, "changed"),
      (3L, "removed"), (4L, "added")))
    // a null id raises instead of fabricating a phantom added+removed pair
    val nullId = Seq((Some(1L), "a"), (None, "x"))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      Dedup.corpusDiff(nullId, neu, "doc_id", "text").collect()
    }
    assert(e.getMessage.contains("corpusDiff: null doc_id"))
    // null TEXT never reads as side-absence: same-null = unchanged,
    // null vs text = changed, null only-in-old = removed
    val oldN = Seq((1L, null), (2L, null), (3L, null))
      .toDF("doc_id", "text")
    val neuN = Seq((1L, null), (2L, "now set"))
      .toDF("doc_id", "text")
    val dn = Dedup.corpusDiff(oldN, neuN, "doc_id", "text",
      includeUnchanged = true)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(dn == Seq((1L, "unchanged"), (2L, "changed"), (3L, "removed")))
  }

  test("softDedupWeights: inverse cluster size over every doc, floor micro") {
    // docs 1,2,3 form one near-dup cluster (chain via 2); 4,5 unclustered
    val w = Dedup.softDedupWeights(docs, "doc_id", "text", threshold = 0.5)
      .orderBy("doc_id")
      .as[(Long, Long, Long)].collect()
    assert(w.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    val bySize = w.map(t => t._1 -> t._2).toMap
    assert(bySize(1L) == 3L && bySize(2L) == 3L && bySize(3L) == 3L, w.toSeq)
    assert(bySize(4L) == 1L && bySize(5L) == 1L)
    val byW = w.map(t => t._1 -> t._3).toMap
    assert(byW(1L) == 333333L && byW(4L) == 1000000L)
  }
}
