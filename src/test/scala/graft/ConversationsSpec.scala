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

  test("turnStats: CRLF transcripts and role-prefix case-sensitivity") {
    val out = stats(
      (1L, "user: hi\r\nassistant: hello\r\n"),
      (2L, "User: hi\nassistant: hello")) // wrong case = bad role line
    assert(out(0).getLong(1) == 2L && out(0).getBoolean(11))
    assert(out(1).getLong(6) == 1L && !out(1).getBoolean(11))
  }
}
