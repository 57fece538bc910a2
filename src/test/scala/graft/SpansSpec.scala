package graft

import graft.core.{Dict, TaggedSentence}
import graft.spans.Spans
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the BIO→span FSM (Convert_to_darpa_xml.py:15-94
  * semantics incl. orphan-I handling) + span↔BIO round-trip property
  * (FIXTURES.md §C). */
class SpansSpec extends AnyFunSuite {

  private def sent(tokens: Seq[String], tags: Seq[String]): TaggedSentence = {
    var pos = 0
    val starts = tokens.map { t => val s = pos; pos += t.length + 1; s }
    val ends = tokens.zip(starts).map { case (t, s) => s + t.length }
    TaggedSentence("r", "p", 0, tokens.toArray, starts.toArray,
      ends.toArray, tags.toArray)
  }

  test("B/I chain extracts one span with correct offsets and text") {
    val m = Spans.extract(sent(
      Seq("He", "met", "Ada", "Lovelace", "today"),
      Seq("O", "O", "B-PER", "I-PER", "O")))
    assert(m.size == 1)
    assert(m.head.text == "Ada Lovelace")
    assert(m.head.tag == "PER")
    assert(m.head.start == 7 && m.head.end == 19)
  }

  test("orphan I- after O starts a new span (xml.py:62-67)") {
    val m = Spans.extract(sent(
      Seq("x", "Lovelace", "y"), Seq("O", "I-PER", "O")))
    assert(m.map(x => (x.text, x.tag)) == Seq(("Lovelace", "PER")))
  }

  test("I- after different type starts a new span") {
    val m = Spans.extract(sent(
      Seq("Bank", "Kenya"), Seq("B-ORG", "I-GPE")))
    assert(m.map(x => (x.text, x.tag)) ==
      Seq(("Bank", "ORG"), ("Kenya", "GPE")))
  }

  test("adjacent B-X B-X are two spans") {
    val m = Spans.extract(sent(
      Seq("Kenya", "Somalia"), Seq("B-GPE", "B-GPE")))
    assert(m.size == 2)
  }

  test("span at sentence end is flushed") {
    val m = Spans.extract(sent(Seq("in", "Nairobi"), Seq("O", "B-GPE")))
    assert(m.map(_.text) == Seq("Nairobi"))
  }

  test("round-trip: spans → BIO → spans is identity on random valid tags") {
    val r = new java.util.Random(42)
    val types = Dict.entityTypes
    (1 to 500).foreach { _ =>
      val n = 1 + r.nextInt(12)
      // build a random VALID BIO sequence
      val tags = new Array[String](n)
      var i = 0
      while (i < n) {
        if (r.nextInt(3) == 0) {
          val t = types(r.nextInt(types.size))
          tags(i) = s"B-$t"; i += 1
          while (i < n && r.nextInt(2) == 0) { tags(i) = s"I-$t"; i += 1 }
        } else { tags(i) = "O"; i += 1 }
      }
      val tokens = (0 until n).map(j => s"t$j")
      val s0 = sent(tokens, tags.toSeq)
      val spans = Spans.extract(s0)
      // spans → BIO
      val rebuilt = Array.fill(n)("O")
      spans.foreach { m =>
        val idxs = (0 until n).filter(j =>
          s0.starts(j) >= m.start && s0.ends(j) <= m.end)
        rebuilt(idxs.head) = s"B-${m.tag}"
        idxs.tail.foreach(j => rebuilt(j) = s"I-${m.tag}")
      }
      assert(rebuilt.toSeq == tags.toSeq)
    }
  }

  test("relational window twin == typed FSM on a token table") {
    val spark0 = TestSpark.spark
    import spark0.implicits._
    val r = new java.util.Random(99)
    val types = Dict.entityTypes
    val sents = (0 until 40).map { sid =>
      val n = 1 + r.nextInt(10)
      val tags = (0 until n).map { _ =>
        val k = r.nextInt(10)
        if (k < 5) "O"
        else if (k < 8) s"B-${types(r.nextInt(4))}"
        else s"I-${types(r.nextInt(4))}" // includes orphan I
      }
      sent((0 until n).map(j => s"w${sid}_$j"), tags)
        .copy(path = s"p$sid")
    }
    val typed = sents.flatMap(Spans.extract)
      .map(m => (m.repo + "/" + m.path, m.sentIdx.toLong, m.start, m.end,
        m.text, m.tag)).toSet
    val tokenTable = sents.flatMap { s =>
      s.tokens.indices.map(i => ("r/" + s.path, s.sentIdx, i,
        s.tokens(i), s.starts(i), s.ends(i), s.tags(i)))
    }.toDF("doc", "sent", "idx", "token", "start", "end", "tag")
    val rel = Spans.fromTokenTable(tokenTable)
      .collect().map(r0 => (r0.getString(0), r0.getInt(1).toLong,
        r0.getInt(2), r0.getInt(3), r0.getString(5), r0.getString(4))).toSet
    assert(rel == typed)
  }
}
