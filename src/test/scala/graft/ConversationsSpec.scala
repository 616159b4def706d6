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
}
