package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guards: the scale-critical plan properties
  * (pushdown, pruning, broadcast selection, distributed top-k) are asserted
  * on the actual executed plans so a refactor can't silently regress them.
  */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    // formatted mode prints full PushedFilters/ReadSchema (toString truncates)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }
  private def optimized(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.optimizedPlan.toString()
  }

  test("q13: range predicates reach the parquet scan (PushedFilters)") {
    val p = plan("q13_shipdate_window")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p)
    assert(p.contains("LessThanOrEqual(l_quantity"), p)
  }

  test("q13: column pruning — scan reads only the 4 needed columns") {
    val p = plan("q13_shipdate_window")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_orderkey"), readSchema)
    assert(!readSchema.contains("l_discount"), readSchema)
    assert(readSchema.contains("l_extendedprice"), readSchema)
  }

  test("q04: dimension joins broadcast (no shuffle join for small dims)") {
    val p = plan("q04_region_revenue")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q02: top-k plans as TakeOrderedAndProject, not global sort") {
    val p = plan("q02_top_parts")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q23: cosine kNN keeps TakeOrderedAndProject over the scored scan") {
    val p = plan("q23_knn_of_vec0")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("cosine_sim") || p.contains("cosinesimilarity"),
      s"custom expression missing from plan:\n$p")
  }

  test("q01: aggregation is partial+final hash agg (map-side combine)") {
    val p = plan("q01_agg_pricing")
    assert(p.contains("HashAggregate"), p)
    assert("partial_(sum|count)".r.findFirstIn(p).isDefined, p)
  }

  test("q07: anti join stays a join, not a filter-collect") {
    val o = optimized("q07_never_ordered_parts")
    assert(o.contains("Join LeftAnti"), o)
  }

  test("dedup queries never shuffle raw text: exchanges carry only ids/hashes") {
    val p = plan("dd01_minhash_candidates")
    // the exchange partitioning expressions must not include the text col
    val exchanges = p.linesIterator.filter(_.contains("hashpartitioning(")).toList
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(_.contains("text")), exchanges.mkString("\n"))
  }

  test("km01: assignment is a literal projection — no join, no hash exchange") {
    // centroids are driver-held literals (the MLlib shape), so the final
    // assignment plan must be scan -> project; the only exchange is the
    // lane's output sort (rangepartitioning). A Join or hashpartitioning
    // here means the corpus started shuffling again (the first cut's
    // groupBy(id) argmin moved one (id, vec) row per corpus row).
    val p = plan("km01_kmeans_int")
    assert(!p.contains("Join"), p)
    assert(!p.linesIterator.exists(_.contains("hashpartitioning(")), p)
  }

  test("id01: incremental probe exchanges carry signatures, never text") {
    val p = plan("id01_incremental_neardup")
    val exchanges = p.linesIterator.filter(_.contains("hashpartitioning(")).toList
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(_.contains("text")), exchanges.mkString("\n"))
  }

  test("nb01: model and class tables broadcast; exchanges never carry text") {
    val p = plan("nb01_nb_lang")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoop"), p)
    val exchanges = p.linesIterator.filter(_.contains("hashpartitioning(")).toList
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(_.contains("text#")), exchanges.mkString("\n"))
  }

  test("fp01: winnowing exchanges carry hashes and ids, never text") {
    val p = plan("fp01_winnowing")
    val exchanges = p.linesIterator.filter(_.contains("hashpartitioning(")).toList
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(_.contains("text#")), exchanges.mkString("\n"))
  }

  test("ivf assignCells: argmax is a partial hash agg, no window sort") {
    import org.apache.spark.sql.functions.col
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    // materialize the (tiny) centroid frame so its own row_number window
    // doesn't appear in the assign plan under test
    val cents = graft.operators.Similarity.Ivf.centroids(
      e, "vec_id", "embedding", nCells = 8).localCheckpoint()
    val assigned = graft.operators.Similarity.Ivf.assignCells(
      e, "vec_id", "embedding", cents)
    val p = assigned.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the ×nCells amplification fix: one partial-aggregable hash agg per
    // id, never a corpus×cells shuffle into a window sort
    assert(!p.contains("Window"), p)
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"), p)
    assert("partial_min".r.findFirstIn(p).isDefined, p)
  }

  test("q47: degree ranking pre-aggregates the fact side, then broadcasts it") {
    val p = plan("q47_part_degree_ranking")
    // OPTIONAL MATCH shape: the 6M-row side is aggregated to one row per
    // key BEFORE the join, and the dimension left-joins a broadcast of it —
    // the fact table itself is never shuffled against the dimension
    assert(p.contains("BroadcastHashJoin LeftOuter"), p)
    assert("HashAggregate[\\s\\S]*BroadcastExchange".r.findFirstIn(p).isDefined, p)
    // both scans read exactly one column (no comma inside the struct)
    val schemas = p.linesIterator.filter(_.contains("ReadSchema")).toList
    assert(schemas.nonEmpty && schemas.forall(s => !s.contains(",")),
      schemas.mkString("\n"))
  }

  test("aj01: as-of join plans as union + one window — no join, one exchange") {
    val p = plan("aj01_asof_purchase")
    // the whole as-of is ONE sort-shuffle on the key: a Join node would
    // mean the pair-materializing shape snuck back in
    assert(p.contains("Window"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin") &&
      !p.contains("NestedLoop"), p)
  }

  test("rj01: range join is a hash/merge equi-join on cells, never a nested loop") {
    val p = plan("rj01_range_join")
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
    assert(p.contains("Join"), p)
  }

  test("sp01: hash split plans with zero exchanges (map-side only)") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val p = graft.operators.Sampling.hashSplit(docs, "doc_id", "s",
        Seq("a" -> 0.9, "b" -> 0.1))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("Exchange"), p)
  }

  test("lm01: vocabulary model is a broadcast join; scoring agg map-side combines") {
    val p = plan("lm01_unigram_surprisal")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert("partial_(sum|count)".r.findFirstIn(p).isDefined, p)
  }

  test("corpus-stats exchanges never carry document text or gram strings") {
    // lm01/ti01 shuffle single tokens (the model keys), bp01 shuffles only
    // 8-byte gram hashes; raw `text` must stay inside its scan task
    for (q <- Seq("lm01_unigram_surprisal", "ti01_tfidf_terms",
        "bp01_boilerplate_score")) {
      val exchanges = plan(q).linesIterator
        .filter(_.contains("hashpartitioning(")).toList
      assert(exchanges.nonEmpty, q)
      assert(!exchanges.exists(_.contains("text#")),
        s"$q shuffles text:\n${exchanges.mkString("\n")}")
      if (q == "bp01_boilerplate_score")
        assert(!exchanges.exists(_.contains("gram#")),
          s"$q shuffles gram strings:\n${exchanges.mkString("\n")}")
    }
  }

  test("ss01: sketch exchanges carry sources and 60-bit hashes, never text or tokens") {
    val exchanges = plan("ss01_source_jaccard").linesIterator
      .filter(_.contains("hashpartitioning(")).toList
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(e => e.contains("text#") || e.contains("tok#")),
      s"ss01 shuffles text/tokens:\n${exchanges.mkString("\n")}")
  }

  test("qd01: quantile exchanges carry bin counts only — the value column never shuffles") {
    val p = plan("qd01_quantile_bins")
    val exchanges = p.linesIterator
      .filter(_.contains("hashpartitioning(")).toList
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(e => e.contains("n_chars#") || e.contains("text#")),
      s"qd01 shuffles raw values:\n${exchanges.mkString("\n")}")
    // the bin agg map-side combines before its exchange
    assert("partial_count".r.findFirstIn(p).isDefined, p)
  }

  test("url01: canonicalization is scan-local — zero exchanges before the output sort") {
    // the whole regexp chain must stay inside the scan task; the lane's
    // only exchange is its ORDER BY doc_id rangepartitioning
    val exchanges = plan("url01_canonical_urls").linesIterator
      .filter(_.contains("hashpartitioning(")).toList
    assert(exchanges.isEmpty,
      s"url01 shuffles before the sort:\n${exchanges.mkString("\n")}")
  }

  test("url02: dedup agg map-side combines; the raw url never shuffles") {
    val p = plan("url02_url_dedup")
    // partial min/count collapse per-task duplicates to the distinct-URL
    // domain before the exchange
    assert("partial_(min|count)".r.findFirstIn(p).isDefined, p)
    val exchanges = p.linesIterator
      .filter(_.contains("hashpartitioning(")).toList
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(_.contains("url#")),
      s"url02 shuffles the raw url:\n${exchanges.mkString("\n")}")
  }

  test("url03: domain-cap exchanges carry (domain, id, hash) rank rows, never the url") {
    val exchanges = plan("url03_domain_cap").linesIterator
      .filter(_.contains("hashpartitioning(")).toList
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(_.contains("url#")),
      s"url03 shuffles the raw url:\n${exchanges.mkString("\n")}")
  }

  test("url03: the domain extraction stays inside whole-stage codegen") {
    // round 12's regression: the Column-tier domain expression blew the
    // 64 KB janino method limit, Spark fell back to interpreted projection
    // (ERROR CodeGenerator + 5.6x the lane time). The compiled Catalyst
    // kernel must keep the scan-side projection codegen'd. AQE hides
    // codegen ids until the plan is final, so execute first.
    val df = SparkEntry.queries("url03_domain_cap")(spark, dir)
    // count() would plan a SEPARATE aggregate query; collect() finalizes
    // THIS df's adaptive plan (the capped output is small by construction)
    df.collect()
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("isFinalPlan=true"), p.linesIterator.take(3).mkString)
    // the Project that evaluates url_domain(...) must carry a codegen id
    val projIds = p.linesIterator.collect {
      case l if l.contains("Project") && l.contains("codegen id") => l
    }.toList
    assert(projIds.nonEmpty,
      s"no codegen'd Project in url03's final plan:\n$p")
    assert(!p.contains("CodegenFallback"), p)
  }

  test("wp02: acquire-tail exchanges never carry the raw url, html, or text") {
    // the funnel's dedup agg keys on the canonical; the cap moves salted
    // rank rows; the mixture agg moves domain-level counts — the synth
    // url, the markup, and the corpus text stay in the scan
    val exchanges = plan("wp02_web_acquire").linesIterator
      .filter(_.contains("hashpartitioning(")).toList
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(e =>
      e.contains("url#") || e.contains("__html#") || e.contains("text#")),
      s"wp02 shuffles raw payload:\n${exchanges.mkString("\n")}")
  }

  test("wp04: composed-funnel exchanges never carry the raw url, html, or text") {
    // wp03's robots-gated keepers through wp02's cap/mix tail: the
    // same narrow-frame discipline end to end
    val exchanges = plan("wp04_web_robots_acquire").linesIterator
      .filter(_.contains("hashpartitioning(")).toList
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(e =>
      e.contains("url#") || e.contains("__html#") || e.contains("text#")),
      s"wp04 shuffles raw payload:\n${exchanges.mkString("\n")}")
  }

  test("ch05: the packer exchanges narrow span rows, never the transcript") {
    // the one hash exchange is the pack-group repartition of
    // (group, id, turn_idx, role_len, content_len, trainable) rows
    val p = plan("ch05_packed_spans")
    val exchanges = p.linesIterator
      .filter(_.contains("hashpartitioning(")).toList
    assert(exchanges.nonEmpty)
    assert(!p.linesIterator.filter(_.contains("Exchange")).exists(e =>
      e.contains("transcript#") || e.contains("text#")),
      s"ch05 shuffles transcript text:\n$p")
  }

  test("rb03: policy frames stay bounded; exchanges carry verdicts, not paths") {
    // the gate's rule join broadcasts (rb01's pin); the schedule agg
    // moves (domain, counters) only
    val p = plan("rb03_fetch_schedule")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"robots rules should broadcast:\n$p")
    val exchanges = p.linesIterator
      .filter(_.contains("hashpartitioning(")).toList
    assert(!exchanges.exists(_.contains("__path#")),
      s"rb03 shuffles url paths:\n${exchanges.mkString("\n")}")
  }

  test("wp05: incremental maintenance broadcasts the delta; text never shuffles") {
    // the anti/semi joins against gone/touched take the delta-bounded
    // side as a broadcast — the stored signal table must not shuffle
    // for them, and no exchange may carry the corpus text
    val p = plan("wp05_incremental_acquire")
    assert(p.contains("BroadcastHashJoin"), p)
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toList
    assert(!exchanges.exists(e =>
      e.contains("text#") || e.contains("__html#")),
      s"wp05 shuffles corpus text:\n${exchanges.mkString("\n")}")
  }

  test("ch06: incremental prompt maintenance broadcasts the delta; transcripts stay put") {
    val p = plan("ch06_incremental_prompts")
    assert(p.contains("BroadcastHashJoin"), p)
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toList
    assert(!exchanges.exists(_.contains("transcript#")),
      s"ch06 shuffles transcripts:\n${exchanges.mkString("\n")}")
  }

  test("rb01: the rule frame broadcasts; URL paths never reach an exchange") {
    val p = plan("rb01_robots_gate")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"robots rules should broadcast:\n$p")
    val exchanges = p.linesIterator
      .filter(_.contains("hashpartitioning(")).toList
    assert(!exchanges.exists(_.contains("__path#")),
      s"rb01 shuffles url paths:\n${exchanges.mkString("\n")}")
  }

  test("ht01: HTML extraction is scan-local — zero exchanges before the output sort") {
    val exchanges = plan("ht01_html_extract").linesIterator
      .filter(_.contains("hashpartitioning(")).toList
    assert(exchanges.isEmpty,
      s"ht01 shuffles before the sort:\n${exchanges.mkString("\n")}")
  }

  test("lq01: language-report exchanges never carry text or the clean payload") {
    val p = plan("lq01_language_quality")
    val exchanges = p.linesIterator
      .filter(_.contains("hashpartitioning(")).toList
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(_.contains("text#")),
      s"lq01 shuffles text:\n${exchanges.mkString("\n")}")
    // the share agg map-side combines before its exchange
    assert("partial_(sum|count)".r.findFirstIn(p).isDefined, p)
  }

  test("pii01: redaction is scan-local — distributed top-k, zero exchanges") {
    val p = plan("pii01_redact")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange"), p)
  }

  test("sd01: dup-gram set broadcasts into the posting side; text never shuffles; span merge reuses the window's doc_id exchange") {
    val p = plan("sd01_dup_spans")
    // membership via broadcast semi-ish join (small dup set); at scale
    // Spark's size estimates flip this to a shuffle join on the 8-byte gh
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    val exchanges = p.linesIterator
      .filter(_.contains("hashpartitioning(")).toList
    assert(exchanges.nonEmpty, p)
    assert(!exchanges.exists(_.contains("text#")),
      s"sd01 shuffles text:\n${exchanges.mkString("\n")}")
    // exactly ONE exchange keyed by doc_id alone: the islands windows and
    // the (doc_id, span_id) groupBy all run on the same partitioning
    // (the other doc_id mention is the dup-set's (doc_id, gh) distinct)
    val docIdOnly = "hashpartitioning\\(doc_id#\\d+L?, \\d+\\)".r
    assert(exchanges.count(l => docIdOnly.findFirstIn(l).isDefined) == 1,
      s"span merge re-shuffled:\n${exchanges.mkString("\n")}")
  }

  test("g10: wedge join is an equi-join — no cartesian/nested-loop anywhere") {
    // the rb < rc rank filter must ride the src equi-join as a post-join
    // condition, never degrade the join itself to a nested loop
    val p = plan("g10_triangles")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("st04: interval join is an equi-join on user with a range condition, never a nested loop") {
    val p = plan("st04_interval_join")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("me01: token explode is map-local — exchanges carry slot bags, not tokens") {
    val p = plan("me01_hash_embed")
    val exchanges = p.linesIterator
      .filter(_.contains("hashpartitioning(")).toList
    assert(exchanges.nonEmpty, p)
    assert(!exchanges.exists(l => l.contains("text#") || l.contains("tok#")),
      s"me01 shuffles text/tokens:\n${exchanges.mkString("\n")}")
  }

  test("dc02: bloom bit-test is a pre-join Filter; the confirm join broadcasts — the corpus side never shuffle-joins") {
    val p = plan("dc02_bloom_decontam")
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("ShuffledHashJoin"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    // the codegen'd probe (element_at over the literal word array +
    // column-shift bit test) must be present as a plain Filter — if the
    // bloom ever became a join or a UDF this disappears
    assert(p.contains("shiftright"), p)
    // exchanges carry only the per-doc aggregation, never gram strings
    val exchanges = p.linesIterator
      .filter(_.contains("hashpartitioning(")).toList
    assert(!exchanges.exists(_.contains("g#")),
      s"dc02 shuffles gram strings:\n${exchanges.mkString("\n")}")
  }

  test("ds01: literal-LUT scoring — no join at all; only the docs-bounded per-doc agg exchanges") {
    val p = plan("ds01_dsir_select")
    assert(!p.contains("Join"), p)
    assert(p.contains("TakeOrderedAndProject"), p) // top-100 selection
    val exchanges = p.linesIterator
      .filter(_.contains("hashpartitioning(")).toList
    assert(exchanges.nonEmpty, p) // the one per-doc partial agg
    assert(!exchanges.exists(l => l.contains("f#") || l.contains("text#") ||
      l.contains("b#")),
      s"ds01 shuffles features/buckets:\n${exchanges.mkString("\n")}")
  }

  test("ng01: exchanges carry gram hashes and ids, never text or gram strings") {
    val p = plan("ng01_novel_ngrams")
    val exchanges = p.linesIterator
      .filter(_.contains("hashpartitioning(")).toList
    assert(exchanges.nonEmpty, p)
    assert(!exchanges.exists(l => l.contains("text#") || l.contains("g#")),
      s"ng01 shuffles text/grams:\n${exchanges.mkString("\n")}")
  }

  test("pd01: line-hash exchanges only; document text moves once, through the affected-docs join") {
    val p = plan("pd01_paragraph_dedup")
    // ownership + removal-list aggregation shuffle (id, pos, hash) only
    val exchanges = p.linesIterator
      .filter(_.contains("hashpartitioning(")).toList
    assert(!exchanges.exists(_.contains("line#")),
      s"pd01 shuffles raw line strings:\n${exchanges.mkString("\n")}")
  }

  test("sp06: stratified sample is two window rankings — no join anywhere") {
    val p = plan("sp06_stratified_sample")
    assert(!p.contains("Join"), p)
    assert(p.contains("RunningWindowFunction") || p.contains("Window"), p)
  }

  test("pq01: encode is a literal projection — no join, no hash exchange") {
    val p = plan("pq01_product_quant")
    assert(!p.contains("Join"), p)
    assert(!p.contains("hashpartitioning("), p)
  }

  test("jl01: projection is map-local — no join, no exchange at all") {
    val p = plan("jl01_random_projection")
    assert(!p.contains("Join"), p)
    assert(!p.contains("hashpartitioning("), p)
  }

  test("gq01: Gopher battery is row-local — no join, no hash exchange") {
    // the only exchange allowed is the final orderBy's range partitioning
    val p = plan("gq01_gopher_rules")
    assert(!p.contains("Join"), p)
    assert(!p.contains("hashpartitioning("), p)
  }

  test("hl01/cs01: sketch aggs are partial (map-side combined) on the scan side") {
    for (lane <- Seq("hl01_hll_registers", "cs01_countmin_cells")) {
      val p = plan(lane)
      // partial HashAggregate BEFORE the exchange: the shuffle carries
      // the sketch domain, not the token stream
      assert("HashAggregate[\\s\\S]*Exchange[\\s\\S]*HashAggregate".r
        .findFirstIn(p).isDefined, p)
      assert(!p.contains("Join"), p)
    }
  }

  test("zo01: z arithmetic is scan-local — one partial+final agg, no join") {
    val p = plan("zo01_zorder_buckets")
    assert(!p.contains("Join"), p)
    // the quantize/interleave math runs in the scan projection; the only
    // hash exchange is the 16-bucket aggregation (map-side combined)
    assert("HashAggregate[\\s\\S]*Exchange[\\s\\S]*HashAggregate".r
      .findFirstIn(p).isDefined, p)
    // scan reads only the two layout columns
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_orderkey"), readSchema)
    assert(readSchema.contains("l_partkey") && readSchema.contains("l_suppkey"),
      readSchema)
  }

  test("ch01: transcript battery is row-local — no join, no hash exchange") {
    val p = plan("ch01_turn_stats")
    assert(!p.contains("Join"), p)
    assert(!p.contains("hashpartitioning("), p)
  }

  test("ch03: render spans explode map-locally — no join, no hash exchange") {
    val p = plan("ch03_render_spans")
    assert(!p.contains("Join"), p)
    assert(!p.contains("hashpartitioning("), p)
    assert(p.contains("Generate"), p) // the per-turn explode
  }

  test("c402: blocklist gate is row-local — no join, no hash exchange") {
    val p = plan("c402_blocklist_gate")
    assert(!p.contains("Join"), p)
    assert(!p.contains("hashpartitioning("), p)
  }

  test("cd02: diff joins (id, digest) only — text is digested below the join") {
    val o = optimized("cd02_corpus_diff")
    // everything ABOVE the full-outer join (its output and the
    // status/sort stages) must be text-free: the md5 digest projection
    // sits in the join's children, so the one exchange carries
    // (doc_id, 32-hex digest), never document text
    val joinIdx = o.indexOf("Join FullOuter")
    assert(joinIdx >= 0, o)
    assert(!o.substring(0, joinIdx).contains("text#"), o.substring(0, joinIdx))
    val p = plan("cd02_corpus_diff")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
  }

  test("lm03: model tables broadcast; only (doc, bigram) granularity shuffles") {
    val p = plan("lm03_backoff_surprisal")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("pc01: pair explode sits ABOVE the vocab top-k, not on the corpus scan") {
    val p = optimized("pc01_bpe_pairs")
    // GlobalLimit(vocab cap) must appear below the generate (explode):
    // the pair stage runs over the capped vocabulary only
    val gen = p.indexOf("Generate")
    val lim = p.indexOf("GlobalLimit", gen)
    assert(gen >= 0 && lim > gen, p)
  }

  test("pp01: both elections ride ONE partial-combined aggregation — " +
      "no join, no per-group window") {
    val p = plan("pp01_preference_pairs")
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
    // partial aggregate before the exchange: the struct min/max
    // partials combine map-side, so only group-domain rows shuffle
    // (struct-typed min/max buffers aren't hash-aggregable, so the
    // planner picks SortAggregate — partial+final all the same)
    assert("(Sort|Hash)Aggregate[\\s\\S]*Exchange[\\s\\S]*(Sort|Hash)Aggregate".r
      .findFirstIn(p).isDefined, p)
  }

  test("hn01: retrieval joins carry postings and scores, never text; " +
      "the rank window sits above the aggregated score rows") {
    val o = optimized("hn01_hard_negatives")
    // every text column is consumed below the index builds (staged
    // frames); the joins and the window see only narrow columns
    val win = o.indexOf("Window")
    assert(win >= 0, o)
    assert(!o.substring(0, win).contains("text#"),
      o.substring(0, win))
    val p = plan("hn01_hard_negatives")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
  }
}
