package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Structure QA for CONVERSATION (SFT/chat) training data — the checks
  * every instruction-tuning pipeline runs before transcripts reach a
  * chat template: are turns well-formed, do roles alternate, is there
  * an assistant reply to learn from, are any turns empty?
  *
  * Transcript contract (the common plain-text interchange shape): one
  * turn per line, `role: content` with role ∈ system|user|assistant.
  * Lines that don't match the role grammar are COUNTED (`n_bad_role`)
  * rather than silently skipped or fatal — on a real SFT dump, a bad
  * prefix is a data bug the report exists to surface.
  *
  * Everything is row-local Column work (split + higher-order functions
  * over the turn array) — one text scan, ZERO shuffle at any corpus
  * size; the battery composes in front of `Curation.curate` like
  * `gopherRules` does.
  */
object Conversations {

  // ': ?' — the line trim runs before parsing, so an EMPTY turn arrives
  // as "role:" with no trailing space and must still parse as its role
  private val RoleRe = "^(system|user|assistant): ?"

  /** Content of the FIRST user turn (null when the transcript has no
    * user turn) — the dedup key for instruction-level dedup. Same
    * trim/role grammar as [[turnStats]]. */
  def firstUserPrompt(transcript: Column): Column = {
    val turns = filter(
      transform(split(transcript, "\r?\n"), l => trim(l)),
      l => length(l) > 0)
    val userTurns = filter(turns,
      l => regexp_extract(l, RoleRe, 1) === "user")
    regexp_replace(try_element_at(userTurns, lit(1)), RoleRe, "")
  }

  /** THE one normalized prompt digest (md5 of the space-joined
    * lowercase tokens of the first user turn; null when promptless) —
    * shared by [[promptDedup]], the composed ch04 lane and its measure
    * harness, so the normalization can never drift between them. */
  def promptFingerprint(transcript: Column): Column =
    TextFunctions.md5Fingerprint(
      array_join(TextFunctions.tokens(firstUserPrompt(transcript)), " "))

  /** Instruction-level exact dedup — collapse transcripts that ask the
    * SAME (case/whitespace-normalized) first user prompt, the standard
    * prompt-diversity pass on SFT dumps (near-identical instructions
    * with different sampled replies otherwise overweight one behavior).
    * Keep-first-by-id, the [[Dedup.exactGroups]] contract; transcripts
    * with no user turn have no instruction and are absent (run
    * [[turnStats]]' gate first — they fail it anyway).
    *
    * Scale: the prompt digests scan-side; the one exchange is the
    * distinct-prompt group aggregation (map-side combined), never the
    * transcript text.
    *
    * Output: (prompt_fp, n_copies, keep_id = min id). */
  def promptDedup(
      docs: DataFrame, idCol: String, transcriptCol: String): DataFrame =
    docs
      .select(col(idCol),
        promptFingerprint(col(transcriptCol)).as("prompt_fp"))
      .filter(col("prompt_fp").isNotNull)
      .groupBy(col("prompt_fp"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keep_id"))

  /** Chat-template rendering with LOSS-MASK offsets — the bridge from a
    * QA'd transcript to trainable text: each turn renders as
    * `<|im_start|>role\ncontent<|im_end|>\n` (the ChatML-style markup
    * shape), and each turn's CONTENT span is reported as [start, end)
    * character offsets into the rendered string, with
    * `trainable = (role == assistant)` — exactly the span set an SFT
    * loss mask keeps. Offsets are exact integer arithmetic over piece
    * lengths, so they replay in any engine; `rendered_md5` rides on
    * every row to tie the offsets to the actual rendered text
    * (self-verifying: substring(rendered, start, end) IS the content,
    * spec-pinned).
    *
    * Lines that fail the role grammar render with an empty role —
    * deterministic garbage-in-garbage-out; gate with [[turnStats]]
    * first (`keep` already rejects them). Per-turn offsets cost
    * O(turns²) row-local arithmetic (turns are conversation-sized by
    * contract); nothing shuffles, the output explode is map-local.
    *
    * Output: one row per turn — (idCol, turn_idx 1-based, role, start,
    * end, trainable, rendered_md5); empty transcripts yield no rows. */
  def renderSpans(
      docs: DataFrame, idCol: String, transcriptCol: String): DataFrame = {
    val turns = filter(
      transform(split(col(transcriptCol), "\r?\n"), l => trim(l)),
      l => length(l) > 0)
    val pre = 12L // "<|im_start|>"
    val post = 11L // "<|im_end|>\n"
    def pieceLen(role: Column, content: Column): Column =
      lit(pre) + length(role).cast("long") + lit(1L) +
        length(content).cast("long") + lit(post)
    docs
      .select(col(idCol), turns.as("__turns"))
      .withColumn("__roles",
        transform(col("__turns"), l => regexp_extract(l, RoleRe, 1)))
      .withColumn("__contents",
        transform(col("__turns"), l => regexp_replace(l, RoleRe, "")))
      .withColumn("__lens",
        zip_with(col("__roles"), col("__contents"), pieceLen))
      .withColumn("__rendered_md5", md5(
        concat_ws("", zip_with(col("__roles"), col("__contents"),
          (r, c) => concat(lit("<|im_start|>"), r, lit("\n"),
            c, lit("<|im_end|>\n")))).cast("binary")))
      // sequence(1, 0) DESCENDS — the empty transcript needs the guard
      .withColumn("__idx",
        when(size(col("__turns")) === 0,
          array().cast("array<int>"))
          .otherwise(sequence(lit(1), size(col("__turns")))))
      .select(col(idCol), col("__roles"), col("__contents"),
        col("__lens"), col("__rendered_md5"),
        explode(col("__idx")).as("turn_idx"))
      .select(
        col(idCol),
        col("turn_idx").cast("long").as("turn_idx"),
        element_at(col("__roles"), col("turn_idx")).as("role"),
        (aggregate(slice(col("__lens"), lit(1), col("turn_idx") - 1),
          lit(0L), (a, x) => a + x) +
          lit(pre) +
          length(element_at(col("__roles"), col("turn_idx"))).cast("long") +
          lit(1L)).as("start"),
        col("__rendered_md5").as("rendered_md5"),
        element_at(col("__contents"), col("turn_idx")).as("__content"))
      .select(col(idCol), col("turn_idx"), col("role"), col("start"),
        (col("start") + length(col("__content")).cast("long")).as("end"),
        (col("role") === "assistant").as("trainable"),
        col("rendered_md5"))
  }

  /** Per-document turn-structure battery.
    *
    * Output columns (one row per input row):
    *   - `n_turns`: non-empty lines
    *   - `first_role`: opener's role (null on an empty transcript, ""
    *     on an unrecognized prefix)
    *   - `n_system` / `n_user` / `n_assistant`: per-role turn counts
    *   - `n_bad_role`: lines missing a recognized `role: ` prefix
    *   - `user_tokens` / `assistant_tokens`: whitespace-token volume
    *     per learnable side (the mask denominators)
    *   - `n_repeat_role`: adjacent turns sharing a role (alternation
    *     violations; system prompts count like any other turn)
    *   - `n_empty_turns`: turns with a recognized role and empty
    *     content
    *   - `keep`: the composed gate — at least one assistant turn, a
    *     system-or-user opener, and zero bad/repeat/empty findings.
    *
    * Empty transcripts (no non-empty lines) yield zeros and
    * `keep = false` (nothing to learn from). */
  def turnStats(docs: DataFrame, idCol: String, transcriptCol: String): DataFrame = {
    // one turn per non-empty line; CRLF tolerated like cleanLines.
    // coalesce: a NULL transcript is an empty one — without it every
    // counter propagates null (breaking the documented zeros contract
    // and any getLong consumer) and keep is false only by
    // three-valued-logic accident
    val turns = coalesce(
      filter(
        transform(split(col(transcriptCol), "\r?\n"), l => trim(l)),
        l => length(l) > 0),
      array().cast("array<string>"))
    val roles = transform(col("__turns"),
      l => regexp_extract(l, RoleRe, 1))
    val contents = transform(col("__turns"),
      l => regexp_replace(l, RoleRe, ""))
    def roleCount(r: String): Column =
      size(filter(col("__roles"), x => x === r)).cast("long")
    def roleTokens(r: String): Column =
      aggregate(
        zip_with(col("__roles"), col("__contents"),
          (role, content) => when(role === r,
            TextFunctions.tokenCountNonEmpty(content)).otherwise(0L)),
        lit(0L), (acc, x) => acc + x)
    docs
      .select(col(idCol), turns.as("__turns"))
      .select(col(idCol), col("__turns"), roles.as("__roles"))
      .withColumn("__contents", contents)
      .select(
        col(idCol),
        size(col("__turns")).cast("long").as("n_turns"),
        // null on an empty transcript; "" on an unrecognized prefix
        try_element_at(col("__roles"), lit(1)).as("first_role"),
        roleCount("system").as("n_system"),
        roleCount("user").as("n_user"),
        roleCount("assistant").as("n_assistant"),
        size(filter(col("__roles"), x => x === "")).cast("long")
          .as("n_bad_role"),
        roleTokens("user").as("user_tokens"),
        roleTokens("assistant").as("assistant_tokens"),
        // adjacent same-role pairs; sequence(2, n) DESCENDS when n < 2,
        // so the short-array case is guarded explicitly
        when(size(col("__roles")) < 2, 0L).otherwise(
          size(filter(sequence(lit(2), size(col("__roles"))),
            i => element_at(col("__roles"), i) ===
              element_at(col("__roles"), i - 1))).cast("long"))
          .as("n_repeat_role"),
        size(filter(
          zip_with(col("__roles"), col("__contents"),
            (role, content) =>
              role =!= "" && length(trim(content)) === 0),
          x => x)).cast("long").as("n_empty_turns"))
      .withColumn("keep",
        col("n_assistant") >= 1L &&
          coalesce(col("first_role").isin("system", "user"), lit(false)) &&
          col("n_bad_role") === 0L &&
          col("n_repeat_role") === 0L &&
          col("n_empty_turns") === 0L)
  }

  /** One packed training sequence of rendered chat turns. `span_keys`
    * entries are `id:turn_idx:start:end` with start/end REBASED to the
    * bin's own rendered concatenation. */
  final case class PackedSpans(
      group: Long, bin: Long, n_turns: Long, n_convs: Long,
      total_chars: Long, trainable_chars: Long, span_keys: Array[String])

  /** The ch→pk bridge: pack [[renderSpans]] output into fixed-budget
    * training sequences — what a trainer does with rendered SFT data.
    *
    * Contract (pinned): the packing unit is one whole RENDERED TURN —
    * an assistant (loss-masked) span is NEVER split across pack
    * boundaries. Conversations longer than the budget split at turn
    * boundaries only; when a turn opens a new bin its loss-mask offsets
    * REBASE to the new bin's rendered stream (start = chars already in
    * the bin + the `<|im_start|>role\n` prefix), so every emitted span
    * indexes directly into its own bin's text — no cross-bin offset
    * arithmetic at training time. Greedy NEXT-FIT in (id, turn_idx)
    * order per deterministic pack group (`id % numGroups`), exactly the
    * `Chunking.packGreedy` discipline: a turn goes into the open bin if
    * `total + piece <= maxChars`, else opens a new one (an oversized
    * single turn gets a bin of its own).
    *
    * Scale shape (shared with packGreedy): `repartition(group)` +
    * `sortWithinPartitions` secondary sort, then a streaming
    * mapPartitions scan holding ONE open bin of state — per-task heap
    * is bounded by maxChars keys, never a group or a conversation, and
    * only (id, turn_idx, 3 small longs, bool) rows shuffle — the
    * rendered TEXT never moves (offsets are pure arithmetic over the
    * span frame; the trainer re-renders from the source or joins the
    * bins back by key).
    *
    * Output: one row per bin — (group, bin, n_turns, n_convs,
    * total_chars, trainable_chars, span_keys); `trainable_chars` sums
    * assistant CONTENT lengths (the unmasked loss positions),
    * `total_chars` the full rendered piece lengths. */
  def packRenderSpans(
      spans: DataFrame,
      idCol: String,
      maxChars: Long,
      numGroups: Int = 64): org.apache.spark.sql.Dataset[PackedSpans] = {
    require(maxChars > 0 && numGroups > 0, "maxChars and numGroups must be positive")
    val spark = spans.sparkSession
    import spark.implicits._
    // piece length replays renderSpans' arithmetic: 12 ("<|im_start|>")
    // + role + 1 ("\n") + content + 11 ("<|im_end|>\n") — recovered
    // from the span frame alone, so the text column is never needed
    spans
      .select(pmod(col(idCol), lit(numGroups.toLong)).as("group"),
        col(idCol).cast("long").as("id"),
        col("turn_idx"),
        length(col("role")).cast("long").as("role_len"),
        (col("end") - col("start")).as("content_len"),
        col("trainable"))
      .repartition(col("group"))
      .sortWithinPartitions("group", "id", "turn_idx")
      .as[(Long, Long, Long, Long, Long, Boolean)]
      .mapPartitions { rows =>
        var group = -1L
        var bin = 0L
        var tot = 0L
        var train = 0L
        var nTurns = 0L
        var nConvs = 0L
        var lastId = Long.MinValue
        var keys = scala.collection.mutable.ArrayBuffer.empty[String]
        def flush(): Iterator[PackedSpans] =
          if (nTurns == 0L) Iterator.empty
          else Iterator.single(PackedSpans(
            group, bin, nTurns, nConvs, tot, train, keys.toArray))
        def reset(): Unit = {
          tot = 0L; train = 0L; nTurns = 0L; nConvs = 0L
          lastId = Long.MinValue
          keys = scala.collection.mutable.ArrayBuffer.empty[String]
        }
        (rows.map(Option(_)) ++ Iterator(None)).flatMap {
          case Some((g, id, idx, roleLen, contentLen, trainable)) =>
            val piece = contentLen + roleLen + 24L
            val out =
              if (g != group) {
                val o = flush(); group = g; bin = 0L; reset(); o
              } else if (tot + piece > maxChars) {
                val o = flush(); bin += 1L; reset(); o
              } else Iterator.empty
            val s = tot + 13L + roleLen // past "<|im_start|>role\n"
            keys += s"$id:$idx:$s:${s + contentLen}"
            tot += piece
            if (trainable) train += contentLen
            nTurns += 1L
            if (id != lastId) { nConvs += 1L; lastId = id }
            out
          case None => flush()
        }
      }
  }

  /** Assign [[packRenderSpans]] bins to `nShards` ≈equal-character
    * output shards, preserving the deterministic (group, bin) pack
    * order — the last step before a trainer's writer
    * `.partitionBy("shard")`s the packed sequences into size-targeted
    * files. `shard = floor(chars_before * nShards / total_chars)`
    * along (group, bin) order, all exact long arithmetic (the
    * `shardByTokens` formula over bins instead of documents).
    *
    * Scale shape: no corpus-sized window anywhere — the pack GROUPS
    * are the bounded slice domain by construction (numGroups rows), so
    * the per-group char subtotals prefix-sum on that tiny frame
    * (broadcast back) and each bin pays only a within-group window,
    * exactly the two-level `shardByTokens` discipline.
    *
    * Input must carry (group, bin, total_chars); all columns pass
    * through plus `shard`. Bound: total_chars_sum × nShards < 2^63. */
  def shardPackedBins(bins: DataFrame, nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val reserved = Seq("__gpre", "__gcum", "__gtot", "shard")
    require(!reserved.exists(bins.columns.contains),
      s"input must not carry reserved columns ${reserved.mkString("/")}")
    // per-group subtotals: numGroups-domain rows — the orderBy window's
    // single task is trivially small; exclusive prefix = group offset
    val slices = bins.groupBy(col("group"))
      .agg(sum(col("total_chars")).as("__gt"))
      .withColumn("__gpre",
        coalesce(sum(col("__gt")).over(
          Window.orderBy(col("group"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    // grand total from the numGroups-row subtotal frame — never a
    // second full pass over the bins pipeline
    val tot = slices.agg(sum(col("__gt")).as("__gtot"))
    val wf = Window.partitionBy(col("group")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, -1)
    bins
      .join(broadcast(slices.select(col("group"), col("__gpre"))),
        Seq("group"))
      .crossJoin(broadcast(tot))
      .withColumn("__gcum",
        col("__gpre") +
          coalesce(sum(col("total_chars")).over(wf), lit(0L)))
      .withColumn("shard",
        when(col("__gtot") <= 0L, lit(0))
          .otherwise(least(lit(nShards - 1),
            call_function("div", col("__gcum") * nShards, col("__gtot"))
              .cast("int"))))
      .drop("__gpre", "__gcum", "__gtot")
  }

  /** Preference-pair assembly — the DPO/RLHF reward-data step: for each
    * prompt group (candidate responses sharing a [[promptFingerprint]]),
    * elect the CHOSEN response (highest score, ties to the smallest id)
    * and the REJECTED one (lowest score, ties to the smallest id), and
    * keep the pair only when the group has ≥ 2 candidates and the score
    * gap clears `margin` (a pair whose chosen barely beats its rejected
    * teaches the reward model noise). With margin = 0 an all-tied group
    * drops via the chosen ≠ rejected guard rather than emitting a
    * self-pair. Scores are the caller's integers (a reward-model
    * output, [[graft.functions.TextFunctions.qualityScore]], a rubric
    * sum) — the election is score-agnostic.
    *
    * Scale: ONE aggregation over (group, score, id) — both elections
    * ride the same groupBy as struct min/max (field-ordered
    * comparison), so partials map-side combine and no per-group window
    * materializes the candidate lists (struct-typed min/max buffers
    * plan as SortAggregate rather than HashAggregate — partial+final
    * all the same, PlanShapeSpec-pinned). The tie-to-smallest-id
    * CHOSEN election negates the id inside the max-struct; ids must be
    * non-negative (raised below), the frame every catalog id satisfies.
    *
    * Output: (groupCol, chosen_id, chosen_score, rejected_id,
    * rejected_score, n_cands). */
  def preferencePairs(
      scored: DataFrame,
      idCol: String,
      groupCol: String,
      scoreCol: String,
      margin: Long = 1L): DataFrame = {
    require(margin >= 0L, "negative margin would admit inverted pairs")
    val guarded = when(col(idCol) < 0L, raise_error(lit(
      s"preferencePairs: negative $idCol — the chosen election negates " +
        "ids inside its max-struct, which would invert their tie order")))
      .otherwise(col(idCol))
    scored
      .select(col(groupCol), col(scoreCol).cast("long").as("__s"),
        guarded.cast("long").as("__i"))
      .groupBy(col(groupCol))
      .agg(
        max(struct(col("__s").as("s"), (-col("__i")).as("ni"))).as("__c"),
        min(struct(col("__s").as("s"), col("__i").as("i"))).as("__r"),
        count(lit(1)).as("n_cands"))
      .select(col(groupCol),
        (-col("__c.ni")).as("chosen_id"), col("__c.s").as("chosen_score"),
        col("__r.i").as("rejected_id"), col("__r.s").as("rejected_score"),
        col("n_cands"))
      .filter(col("n_cands") >= 2L &&
        col("chosen_id") =!= col("rejected_id") &&
        col("chosen_score") - col("rejected_score") >= lit(margin))
  }
}
