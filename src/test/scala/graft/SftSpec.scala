package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Sft

class SftSpec extends AnyFunSuite {
  import TestSpark._

  private def turnsOf(rows: (Long, String)*) = {
    import spark.implicits._
    Sft.parseTurns(rows.toSeq.toDF("conv_id", "text"))
  }

  test("parseTurns: roles, content, 0-token empty turns, unlabeled lines") {
    val got = turnsOf(
      (1L, "system: be helpful\nuser: hi there\nassistant: hello"),
      (2L, "user: solo"),
      (3L, "no role prefix\nuser: ok"),
      (4L, "user: \nassistant: fine"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getString(3), r.getLong(4)))).toMap
    assert(got((1L, 0L)) == (("system", "be helpful", 2L)))
    assert(got((1L, 1L)) == (("user", "hi there", 2L)))
    assert(got((1L, 2L)) == (("assistant", "hello", 1L)))
    assert(got((2L, 0L)) == (("user", "solo", 1L)))
    // unlabeled line: role '' and the whole line as content
    assert(got((3L, 0L)) == (("", "no role prefix", 3L)))
    // empty content after the prefix counts 0 tokens
    assert(got((4L, 0L)) == (("user", "", 0L)))
  }

  test("validateConversations: alternation, system handling, final-assistant") {
    val v = Sft.validateConversations(turnsOf(
        (1L, "system: s\nuser: a\nassistant: b"),          // valid
        (2L, "user: a\nassistant: b\nuser: c\nassistant: d"), // valid, no system
        (3L, "assistant: starts wrong\nuser: x"),           // bad alternation + bad end
        (4L, "user: a\nuser: b"),                           // two users in a row
        (5L, "user: a\nassistant: "),                       // empty final turn
        (6L, "system: s\nuser: a")))                        // ends on user
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(v(1L) == ((3L, 0L, 1L, 1L, 1L)))
    assert(v(2L) == ((4L, 0L, 1L, 1L, 1L)))
    assert(v(3L)._3 == 0L && v(3L)._5 == 0L)
    assert(v(4L)._3 == 0L)
    assert(v(5L) == ((2L, 1L, 1L, 1L, 0L))) // structure ok, empty turn kills it
    assert(v(6L)._4 == 0L && v(6L)._5 == 0L)
  }

  test("parseTurns + validateConversations: tool turns ride the automaton") {
    // tool parses as a first-class role
    val got = turnsOf((1L, "user: run it\nassistant: calling\ntool: exit 0\nassistant: done"))
      .collect().map(r => r.getLong(1) -> ((r.getString(2), r.getString(3))))
      .toMap
    assert(got(2L) == (("tool", "exit 0")))
    val v = Sft.validateConversations(turnsOf(
        // assistant → tool → assistant: valid
        (1L, "user: a\nassistant: b\ntool: t\nassistant: c"),
        // chained tool results: tool → tool is rejected (tool must be
        // followed by assistant)
        (2L, "user: a\nassistant: b\ntool: t\ntool: u\nassistant: c"),
        // tool directly after user: invalid
        (3L, "user: a\ntool: t\nassistant: c"),
        // tool as the opener: invalid
        (4L, "tool: t\nassistant: c"),
        // tool-final: alternation fine up to it, but ends_assistant = 0
        (5L, "user: a\nassistant: b\ntool: t"),
        // with a leading system turn
        (6L, "system: s\nuser: a\nassistant: b\ntool: t\nassistant: c")))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(v(1L) == ((4L, 0L, 1L, 1L, 1L)))
    assert(v(2L)._3 == 0L && v(2L)._5 == 0L)
    assert(v(3L)._3 == 0L)
    assert(v(4L)._3 == 0L)
    assert(v(5L)._3 == 1L && v(5L)._4 == 0L && v(5L)._5 == 0L)
    assert(v(6L) == ((5L, 0L, 1L, 1L, 1L)))
  }

  test("truncateToBudget: system kept, longest whole-turn suffix fits") {
    // turns: system(2) user(4) assistant(4) user(4) assistant(4)
    val t = turnsOf((1L,
      "system: a b\nuser: c d e f\nassistant: g h i j\n" +
      "user: k l m n\nassistant: o p q r"))
    def kept(budget: Long) =
      Sft.truncateToBudget(t, budget)
        .collect().map(_.getLong(1)).toSet
    // budget 10: system(2) + last two turns (8) = 10 fits; adding turn 1
    // (4 more) would not
    assert(kept(10L) == Set(0L, 3L, 4L))
    // budget 18: everything (2 + 16)
    assert(kept(18L) == Set(0L, 1L, 2L, 3L, 4L))
    // budget 5: system + final turn only
    assert(kept(6L) == Set(0L, 4L))
    // budget 1: even the system turn is over budget -> nothing survives
    assert(kept(1L) == Set.empty[Long])
    // no-system conversation: plain suffix rule
    val t2 = turnsOf((2L, "user: a b\nassistant: c d"))
    assert(Sft.truncateToBudget(t2, 2L).collect().map(_.getLong(1)).toSet ==
      Set(1L))
  }

  test("renderTranscript: parse round-trips to the exact input text") {
    import spark.implicits._
    val texts = Seq(
      (1L, "system: be helpful\nuser: hi there\nassistant: hello"),
      (2L, "user: a\nassistant: b\nuser: c\nassistant: d"),
      (3L, "user: just one"))
    val back = Sft.renderTranscript(Sft.parseTurns(texts.toDF("conv_id", "text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back == texts.toMap)
  }

  test("escape/unescape: bijection on newline- and backslash-bearing content") {
    import spark.implicits._
    // every adversarial shape: bare newline, bare backslash, literal
    // backslash-n that must NOT decode, backslash before newline,
    // runs of backslashes, trailing/leading escapes, empty
    val nasty = Seq(
      "plain", "", "line1\nline2", "a\\nb", "a\\\nb", "\\", "\\\\",
      "\\\\\\", "ends with \\", "\nstarts", "trail\n", "\\n", "a\n\nb",
      "tab\tkeeps", "mix \\ and \n and \\n all three",
      "cr\rhere", "crlf\r\ninside", "ends with cr\r", "\\r literal")
    val df = nasty.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "raw")
    val got = df.select(col("id"),
        Sft.unescapeTurnText(Sft.escapeTurnText(col("raw"))).as("rt"),
        Sft.escapeTurnText(col("raw")).as("esc"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2))))
      .toMap
    for ((s, i) <- nasty.zipWithIndex) {
      assert(got(i.toLong)._1 == s, s"round-trip broke on <$s>")
      // escaped form is single-line: the interchange invariant (no raw
      // newline OR carriage return — a raw CR would merge with the line
      // separator under parseTurns' CRLF normalization)
      assert(!got(i.toLong)._2.contains("\n") &&
        !got(i.toLong)._2.contains("\r"),
        s"escaped form still multi-line for <$s>")
    }
  }

  test("escape/unescape: property — bijection over the collision alphabet") {
    import spark.implicits._
    // exhaustive short strings + seeded random long ones over exactly the
    // characters that can collide in the escaped form: backslash, 'n',
    // newline (plus separators). One batched Spark pass for all cases.
    val alpha = Array('\\', 'n', '\n', 'a', ' ', '\t', '\r', 'r')
    val rnd = new scala.util.Random(421)
    val rand = Seq.fill(800)(
      (0 until rnd.nextInt(13)).map(_ => alpha(rnd.nextInt(alpha.length)))
        .mkString)
    val enum3 = for {
      a <- alpha; b <- alpha; c <- alpha
    } yield s"$a$b$c"
    val cases = (rand ++ enum3).distinct
    val got = cases.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "raw")
      .select(col("id"), col("raw"),
        Sft.unescapeTurnText(Sft.escapeTurnText(col("raw"))).as("rt"),
        Sft.escapeTurnText(col("raw")).as("esc"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getString(2) == r.getString(1),
        s"round-trip broke on <${r.getString(1).replace("\n", "\\u000a")}>")
      assert(!r.getString(3).contains("\n") && !r.getString(3).contains("\r"),
        s"escaped form multi-line for <${r.getString(1).replace("\n", "\\u000a")}>")
    }
  }

  test("parseTurns: CRLF transcripts normalize — no trailing \\r in content") {
    import spark.implicits._
    val lf = "system: be helpful\nuser: hi\\nthere\nassistant: ok"
    val crlf = lf.replace("\n", "\r\n")
    val a = Sft.parseTurns(Seq((1L, lf)).toDF("conv_id", "text")).collect()
      .map(r => r.getLong(1) -> ((r.getString(2), r.getString(3), r.getLong(4))))
      .toMap
    val b = Sft.parseTurns(Seq((1L, crlf)).toDF("conv_id", "text")).collect()
      .map(r => r.getLong(1) -> ((r.getString(2), r.getString(3), r.getLong(4))))
      .toMap
    assert(b == a)
    assert(!a.values.exists(_._2.contains("\r")))
    // render of the CRLF parse is the LF-canonical text
    assert(Sft.renderTranscript(
        Sft.parseTurns(Seq((1L, crlf)).toDF("conv_id", "text")))
      .collect().head.getString(1) == lf)
  }

  test("parseTurns: escaped newlines decode to multi-line content") {
    val got = turnsOf(
      (1L, "user: first\\nsecond line\nassistant: ok"),
      // literal backslash-n survives as backslash-n (double-escaped)
      (2L, "user: keep \\\\n literal\nassistant: fine"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(3), r.getLong(4)))).toMap
    assert(got((1L, 0L)) == (("first\nsecond line", 3L)))
    assert(got((1L, 1L)) == (("ok", 1L)))
    assert(got((2L, 0L)) == (("keep \\n literal", 3L)))
  }

  test("render ∘ parse identity on transcripts with escaped multi-line turns") {
    import spark.implicits._
    val texts = Seq(
      (1L, "system: be\\nhelpful\nuser: hi\nassistant: a\\nb\\nc"),
      (2L, "user: code:\\n  x = 1\\n  y = 2\nassistant: looks\\ngood"),
      (3L, "user: backslash \\\\ then\\nnewline\nassistant: ok"))
    val back = Sft.renderTranscript(Sft.parseTurns(texts.toDF("conv_id", "text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back == texts.toMap)
  }

  test("parse ∘ render identity on turn rows with embedded newlines") {
    import spark.implicits._
    val turns = Seq(
      (1L, 0L, "user", "multi\nline\nquestion"),
      (1L, 1L, "assistant", "answer with \\ backslash\nand newline"),
      (2L, 0L, "user", "single"),
      (2L, 1L, "assistant", "also\n\nblank line inside"))
      .toDF("conv_id", "turn_idx", "role", "content")
      .withColumn("n_tokens", Sft.tokenCount(col("content")))
    val back = Sft.parseTurns(Sft.renderTranscript(turns))
      .select("conv_id", "turn_idx", "role", "content", "n_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getString(3), r.getLong(4)))).toMap
    val want = turns.collect().map(r => (r.getLong(0), r.getLong(1)) ->
      ((r.getString(2), r.getString(3), r.getLong(4)))).toMap
    assert(back == want)
  }

  test("truncateToBudget: tokenCol switches the budget currency") {
    import spark.implicits._
    // same turns, a BPE-ish count 3x the whitespace one: the whitespace
    // budget keeps everything, the same budget in the custom currency
    // keeps only the suffix that fits
    val t = turnsOf((1L, "user: a b\nassistant: c d\nuser: e f\nassistant: g h"))
      .withColumn("n_custom", col("n_tokens") * 3)
    assert(Sft.truncateToBudget(t, 8L)
      .collect().map(_.getLong(1)).toSet == Set(0L, 1L, 2L, 3L))
    assert(Sft.truncateToBudget(t, 8L, tokenCol = "n_custom")
      .collect().map(_.getLong(1)).toSet == Set(3L))
    // spans in the custom currency: offsets scale with it
    val sp = Sft.lossMaskSpans(t, tokenCol = "n_custom")
      .collect().map(r => r.getLong(1) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(sp(0L) == ((0L, 6L)) && sp(3L) == ((18L, 24L)))
  }

  test("pipeline composition: gate filters, truncation precedes spans") {
    import spark.implicits._
    val texts = Seq(
      (1L, "user: a b c\nassistant: d e f"),     // valid
      (2L, "user: a\nuser: b"),                  // invalid: alternation + end
      (3L, "user: a b c d e\nassistant: f g h")) // valid, truncates at 6
    val turns = Sft.parseTurns(texts.toDF("conv_id", "text"))
    val valid = Sft.validateConversations(turns)
      .filter(col("valid") === 1).select("conv_id")
    val spans = Sft.lossMaskSpans(
        Sft.truncateToBudget(turns.join(valid, "conv_id"), maxTokens = 6))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // invalid conversation contributes nothing
    assert(!spans.keys.exists(_._1 == 2L))
    // conv 1 fits whole: offsets over both turns
    assert(spans((1L, 0L)) == ((0L, 3L, 0L)))
    assert(spans((1L, 1L)) == ((3L, 6L, 1L)))
    // conv 3: only the final turn fits budget 6 — spans START AT 0 over
    // the SURVIVING turns (truncation happens before offsetting)
    assert(spans.get((3L, 0L)).isEmpty)
    assert(spans((3L, 1L)) == ((0L, 3L, 1L)))
  }

  test("tokenCount: whitespace-regex currency, newlines separate, empties drop") {
    import spark.implicits._
    val got = Seq("a b", "a\nb", "a\n\nb", "", " ", "\n", "one",
        "a\tb c\nd")
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "c")
      .select(col("id"), Sft.tokenCount(col("c")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 2L, 1L -> 2L, 2L -> 2L, 3L -> 0L, 4L -> 0L,
      5L -> 0L, 6L -> 1L, 7L -> 4L))
  }

  test("lossMaskSpans: contiguous half-open offsets, assistant-only mask") {
    val got = Sft.lossMaskSpans(turnsOf(
        (1L, "system: a b\nuser: c d e\nassistant: f")))
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got(0L) == ((0L, 2L, 0L)))
    assert(got(1L) == ((2L, 5L, 0L)))
    assert(got(2L) == ((5L, 6L, 1L)))
    // empty turn: zero-width span, still a row
    val e = Sft.lossMaskSpans(turnsOf((2L, "user: \nassistant: x")))
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(e(0L) == ((0L, 0L, 0L)) && e(1L) == ((0L, 1L, 1L)))
  }

  test("packConversations: whole conversations fill bins, spillover like the doc packer") {
    // conv 8k -> shard 0 with totals 3, 4, 5 tokens; seqLen 6:
    // conv 0 (3) starts bin 0, conv 8 (4) spills to bin 1 (cum 7 - 4 = 3
    // -> floor(3/6) = 0? no: bin = floor((cum - n)/seqLen) = start offset
    // bin; conv 8 starts at 3 -> bin 0, conv 16 starts at 7 -> bin 1
    val t = turnsOf(
      (0L, "user: a b\nassistant: c"),
      (8L, "user: a b c\nassistant: d"),
      (16L, "user: a b c d\nassistant: e"))
    val got = Sft.packConversations(t, seqLen = 6, shards = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(0L) == ((0L, 3L, 3L, 0L)))
    assert(got(8L) == ((0L, 4L, 7L, 0L)))
    assert(got(16L) == ((0L, 5L, 12L, 1L)))
    // a conversation is one row — it can never split across bins
    assert(got.size == 3)
  }

  test("packConversations: empty input yields an empty frame, not an error") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long, String, String, Long)]
      .toDF("conv_id", "turn_idx", "role", "content", "n_tokens")
    assert(Sft.packConversations(empty).collect().isEmpty)
  }

  test("preferencePairs: per-group argmax/argmin, ties to min id, singletons drop") {
    import spark.implicits._
    // same (lang, source): long stopword-rich doc beats punctuation soup;
    // one singleton group must emit nothing
    val d = Seq(
      (1L, "the cat sat on the mat and it is that good", "en", "s0", 40L),
      (2L, "x! y! z! !!!! ????", "en", "s0", 20L),
      (3L, "the cat sat on the mat and it is that good", "en", "s0", 40L), // tie with 1
      (4L, "alone here", "zh", "s1", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Sft.preferencePairs(d).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.size == 1) // zh/s1 is a singleton -> dropped
    val (chosen, rejected, margin) = got(("en", "s0"))
    assert(chosen == 1L)   // tie between 1 and 3 -> min id
    assert(rejected == 2L)
    assert(margin > 0.0)
  }
}
