package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Conversations

class ConversationsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def stats(rows: (Long, String)*) =
    Conversations.turnStats(rows.toDF("id", "t"), "id", "t")
      .orderBy("id").collect()

  test("turnStats: clean transcript passes; all counters hand-checked") {
    val out = stats(
      (1L, "system: be concise\nuser: what is two plus two\nassistant: four"))
      .head
    assert(out.getLong(1) == 3L) // n_turns
    assert(out.getString(2) == "system") // first_role
    assert((out.getLong(3), out.getLong(4), out.getLong(5)) == (1L, 1L, 1L))
    assert(out.getLong(6) == 0L) // n_bad_role
    assert(out.getLong(7) == 5L) // user_tokens
    assert(out.getLong(8) == 1L) // assistant_tokens
    assert(out.getLong(9) == 0L && out.getLong(10) == 0L)
    assert(out.getBoolean(11)) // keep
  }

  test("turnStats: each defect class is counted and gates keep") {
    val out = stats(
      (1L, "user: hi\nuser: hi again\nassistant: hello"), // repeat role
      (2L, "user: hi\nassistant: "), // empty assistant turn (trimmed)
      (3L, "user: hi\nnarrator speaks\nassistant: hello"), // bad role line
      (4L, "assistant: unprompted"), // opener must be system/user
      (5L, "user: never answered"), // no assistant turn
      (6L, " \n \n")) // empty transcript
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(6), r.getLong(9),
        r.getLong(10), r.getBoolean(11)))
    assert(out(0) == ((1L, 3L, 0L, 1L, 0L, false)))
    assert(out(1) == ((2L, 2L, 0L, 0L, 1L, false)))
    assert(out(2) == ((3L, 3L, 1L, 0L, 0L, false)))
    assert(out(3) == ((4L, 1L, 0L, 0L, 0L, false)))
    assert(out(4) == ((5L, 1L, 0L, 0L, 0L, false)))
    // empty: zero turns, null first_role, keep false
    assert(out(5) == ((6L, 0L, 0L, 0L, 0L, false)))
    val empty = stats((6L, " \n \n")).head
    assert(empty.isNullAt(2))
    // a NULL transcript is an empty one: ZEROS (never null counters —
    // the documented contract; getLong must not NPE), keep false
    val nt = Conversations.turnStats(
      Seq((Some(1L), Option.empty[String])).toDF("id", "t"), "id", "t")
      .head()
    assert((1 to 10).forall(i => !nt.isNullAt(i) || i == 2)) // first_role null ok
    assert(nt.getLong(1) == 0L && nt.getLong(7) == 0L && !nt.getBoolean(11))
  }

  test("promptDedup: normalized first-user-turn groups; promptless absent") {
    val docs = Seq(
      (1L, "user: What is RAIN\nassistant: water"),
      (2L, "system: hi\nuser: what  is  rain\nassistant: wet"), // same normalized
      (3L, "user: different question\nassistant: yes"),
      (4L, "system: no user turn\nassistant: unprompted"), // absent
      (5L, "assistant: reply first\nuser: what is rain")) // same group as 1/2
      .toDF("id", "t")
    val out = Conversations.promptDedup(docs, "id", "t")
      .orderBy("keep_id").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((3L, 1L), (1L, 3L)))
  }

  test("renderSpans: offsets substring-exact against the rendered string") {
    val docs = Seq(
      (1L, "user: hi\nassistant: yo"),
      (2L, "system: be kind\nuser: ask\nassistant: "),
      (3L, " \n ")) // empty transcript: no rows
      .toDF("id", "t")
    val out = Conversations.renderSpans(docs, "id", "t")
      .orderBy("id", "turn_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5), r.getString(6)))
    // doc 1: piece1 = 12+4+1+2+11 = 30; content spans hand-checked
    assert(out.filter(_._1 == 1L).toSeq == Seq(
      (1L, 1L, "user", 17L, 19L, false, out(0)._7),
      (1L, 2L, "assistant", 52L, 54L, true, out(0)._7)))
    assert(out.count(_._1 == 3L) == 0)
    // the self-verification the md5 column exists for: substring the
    // actual rendered string at every span and get the content back
    def render(t: String): String = t.split("\n").map(_.trim)
      .filter(_.nonEmpty).map { l =>
        val m = "^(system|user|assistant): ?".r.findFirstMatchIn(l)
        val role = m.map(_.group(1)).getOrElse("")
        val content = m.map(x => l.substring(x.end)).getOrElse(l)
        s"<|im_start|>$role\n$content<|im_end|>\n"
      }.mkString
    val byDoc = Map(1L -> render("user: hi\nassistant: yo"),
      2L -> render("system: be kind\nuser: ask\nassistant: "))
    for ((id, _, role, s, e, _, md5hex) <- out) {
      val r = byDoc(id)
      val content = r.substring(s.toInt, e.toInt)
      assert(!content.contains("<|im_start|>") && (e - s) >= 0)
      assert(r.substring(s.toInt - role.length - 1, s.toInt - 1) == role ||
        role.isEmpty)
      assert(md5hex == java.security.MessageDigest.getInstance("MD5")
        .digest(r.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    }
    // empty assistant turn: zero-width trainable span
    val last = out.filter(t => t._1 == 2L && t._2 == 3L).head
    assert(last._4 == last._5 && last._6)
  }

  test("turnStats: CRLF transcripts and role-prefix case-sensitivity") {
    val out = stats(
      (1L, "user: hi\r\nassistant: hello\r\n"),
      (2L, "User: hi\nassistant: hello")) // wrong case = bad role line
    assert(out(0).getLong(1) == 2L && out(0).getBoolean(11))
    assert(out(1).getLong(6) == 1L && !out(1).getBoolean(11))
  }

  // ------------------------------------------------------------------
  // packRenderSpans — the ch→pk bridge contract
  // ------------------------------------------------------------------

  private def render(role: String, content: String): String =
    s"<|im_start|>$role\n$content<|im_end|>\n"

  test("packRenderSpans: budget, atomicity, and bin-local rebase") {
    // two conversations in one pack group (numGroups = 1): conv 1 is
    // longer than the 120-char budget and must split at a TURN boundary
    val docs = Seq(
      (1L, "user: please explain rain\nassistant: water falls from " +
        "clouds when droplets grow heavy\nuser: thanks\nassistant: anytime"),
      (2L, "user: hi\nassistant: hello"))
      .toDF("id", "t")
    val turns = docs.as[(Long, String)].collect().toMap.map {
      case (id, t) => id -> t.split("\n").toSeq.map { l =>
        val i = l.indexOf(": ")
        (l.substring(0, i), l.substring(i + 2))
      }
    }
    val spans = Conversations.renderSpans(docs, "id", "t")
    val bins = Conversations.packRenderSpans(spans, "id",
      maxChars = 120L, numGroups = 1).collect().sortBy(b => (b.group, b.bin))
    assert(bins.length >= 2, "the long conversation must split")
    // every bin respects the budget unless it is a single oversized turn
    bins.foreach(b => assert(b.total_chars <= 120L || b.n_turns == 1L,
      s"bin ${b.bin} over budget: ${b.total_chars}"))
    bins.foreach { b =>
      // rebuild the bin's rendered stream from its member turns and
      // check each span's REBASED offsets index its exact content —
      // the self-verifying property renderSpans pins per conversation,
      // carried through the pack
      val members = b.span_keys.toSeq.map { k =>
        val Array(id, idx, s, e) = k.split(":").map(_.toLong)
        val (role, content) = turns(id)(idx.toInt - 1)
        (role, content, s, e)
      }
      val stream = members.map(m => render(m._1, m._2)).mkString
      assert(stream.length.toLong == b.total_chars)
      members.foreach { case (_, content, s, e) =>
        assert(e - s == content.length.toLong)
        assert(stream.substring(s.toInt, e.toInt) == content,
          s"rebased span [$s,$e) does not index its content")
      }
      // trainable_chars = assistant content only
      val expectTrain = members.collect {
        case ("assistant", c, _, _) => c.length.toLong }.sum
      assert(b.trainable_chars == expectTrain)
    }
    // atomicity: every span lives in exactly one bin (no turn key twice)
    val allKeys = bins.flatMap(_.span_keys.map(_.split(":").take(2).mkString(":")))
    assert(allKeys.distinct.length == allKeys.length)
    assert(allKeys.length == spans.count().toInt)
  }

  test("shardPackedBins: monotone along pack order, ≈equal char mass") {
    val bins = (0L until 4L).flatMap(g => (0L until 25L).map(b =>
      (g, b, 3L, 90L + (g * 25L + b) % 40L, 30L)))
      .toDF("group", "bin", "n_turns", "total_chars", "trainable_chars")
    val sharded = Conversations.shardPackedBins(bins, nShards = 5)
      .orderBy("group", "bin")
      .select("group", "bin", "total_chars", "shard")
      .as[(Long, Long, Long, Int)].collect()
    // shard ids are non-decreasing along deterministic (group, bin)
    // order — a writer's files are contiguous slices of the pack order
    assert(sharded.map(_._4).sliding(2).forall(w => w(0) <= w(1)))
    assert(sharded.map(_._4).distinct.sorted.toSeq == (0 until 5))
    // each shard's char mass within one max-bin of the even split
    val tot = sharded.map(_._3).sum
    val byShard = sharded.groupBy(_._4).view.mapValues(_.map(_._3).sum)
    val maxBin = sharded.map(_._3).max
    byShard.values.foreach(m =>
      assert(math.abs(m - tot / 5) <= maxBin + tot % 5,
        s"shard mass $m vs even ${tot / 5}"))
    // degenerate single shard
    val one = Conversations.shardPackedBins(bins, nShards = 1)
      .select("shard").distinct().as[Int].collect().toSeq
    assert(one == Seq(0))
  }

  test("packRenderSpans: oversized single turn gets its own bin; order kept") {
    val docs = Seq(
      (4L, "user: " + ("x " * 200).trim + "\nassistant: ok"))
      .toDF("id", "t")
    val spans = Conversations.renderSpans(docs, "id", "t")
    val bins = Conversations.packRenderSpans(spans, "id",
      maxChars = 100L, numGroups = 4).collect().sortBy(_.bin)
    assert(bins.length == 2)
    assert(bins(0).n_turns == 1L && bins(0).total_chars > 100L)
    assert(bins(1).n_turns == 1L && bins(1).total_chars <= 100L)
    // group is id % numGroups, deterministic
    assert(bins.forall(_.group == 0L))
    // bins partition the turn sequence in (id, turn_idx) order
    assert(bins(0).span_keys.head.startsWith("4:1:") &&
      bins(1).span_keys.head.startsWith("4:2:"))
  }

  test("preferencePairs: elections, tie rules, margin, and the " +
      "self-pair guard") {
    val scored = Seq(
      // g1: chosen = score-50 tie broken to min id 2; rejected = the
      // score-10 tie broken to min id 1
      (1L, "g1", 10L), (2L, "g1", 50L), (3L, "g1", 50L), (4L, "g1", 10L),
      (5L, "g2", 30L), // singleton group -> dropped (n_cands < 2)
      (6L, "g3", 20L), (7L, "g3", 21L), // gap exactly 1 clears margin 1
      (8L, "g4", 20L), (9L, "g4", 20L) // all tied
    ).toDF("id", "grp", "score")
    val out = Conversations.preferencePairs(
        scored, "id", "grp", "score", margin = 1L)
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      ("g1", 2L, 50L, 1L, 10L, 4L),
      ("g3", 7L, 21L, 6L, 20L, 2L)))
    // margin 0: the all-tied group still drops — chosen and rejected
    // both elect the min id, and the self-pair guard rejects the pair
    val m0 = Conversations.preferencePairs(
      scored, "id", "grp", "score", margin = 0L)
    assert(m0.filter(col("grp") === "g4").count() == 0L)
    assert(m0.filter(col("grp") === "g1").count() == 1L)
    // negative ids raise: the chosen election negates ids in its
    // max-struct, which would invert their tie order
    val neg = Seq((-1L, "g", 1L), (2L, "g", 2L)).toDF("id", "grp", "score")
    val e = intercept[Exception] {
      Conversations.preferencePairs(neg, "id", "grp", "score").collect()
    }
    assert(e.getMessage.contains("preferencePairs"))
  }
}
