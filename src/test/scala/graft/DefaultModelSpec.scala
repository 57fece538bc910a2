package graft

import graft.core.Dict
import graft.crf.{Crf, DefaultModel}
import graft.features.Features
import org.scalatest.funsuite.AnyFunSuite

/** The pipeline's default weights are fitted from data (DefaultModel),
  * and the fit is gaz-dominant: gazetteer feature log-odds outweigh
  * every competing term by a margin larger than any legal transition,
  * which is the property the q55-q58 dictionary-forced oracles rest
  * on. Pure driver-side — no SparkSession. */
class DefaultModelSpec extends AnyFunSuite {

  private def argmax(a: Array[Float]): Int =
    a.indices.maxBy(i => (a(i), -i)) // first max wins

  private def margin(a: Array[Float]): Float = {
    val sorted = a.sortBy(-_)
    sorted(0) - sorted(1)
  }

  test("training data is labeled and non-trivial") {
    val d = DefaultModel.trainingData
    assert(d.size > 1000)
    val tags = d.flatMap(_.tags)
    assert(tags.count(_ != Dict.O) > 500) // entities present
    assert(tags.count(_ == Dict.O) > 5000) // fillers present
    // every B tag type occurs
    for (t <- Dict.entityTypes)
      assert(tags.contains(Dict.tagId(s"B-$t")), s"no B-$t in training")
  }

  test("fitted gaz log-odds pick the dictionary tag per mark, with a " +
      "real margin") {
    val w = Crf.emissionWeights
    for ((t, ti) <- Dict.entityTypes.zipWithIndex) {
      val bEmit = Crf.emit(1 << (Features.B_GAZ + ti), w)
      assert(argmax(bEmit) == Dict.tagId(s"B-$t"), s"B_GAZ[$t] argmax")
      assert(margin(bEmit) > 4f, s"B_GAZ[$t] margin ${margin(bEmit)}")
      val iEmit = Crf.emit(1 << (Features.I_GAZ + ti), w)
      assert(argmax(iEmit) == Dict.tagId(s"I-$t"), s"I_GAZ[$t] argmax")
      assert(margin(iEmit) > 4f, s"I_GAZ[$t] margin ${margin(iEmit)}")
      // with CAPITALIZED noise riding along, still dominant
      val bCap = Crf.emit(
        (1 << (Features.B_GAZ + ti)) | (1 << Features.CAPITALIZED), w)
      assert(argmax(bCap) == Dict.tagId(s"B-$t"))
    }
    val oEmit = Crf.emit(
      (1 << Features.O_GAZ) | (1 << Features.CAPITALIZED), w)
    assert(argmax(oEmit) == Dict.O, "O_GAZ+CAP must decode O")
  }

  private def expectedFromMasks(masks: Array[Int]): Seq[String] =
    masks.toSeq.map { m =>
      val b = (0 until 4).find(t =>
        (m & (1 << (Features.B_GAZ + t))) != 0)
      val i = (0 until 4).find(t =>
        (m & (1 << (Features.I_GAZ + t))) != 0)
      if (b.isDefined) "B-" + Dict.entityTypes(b.get)
      else if (i.isDefined) "I-" + Dict.entityTypes(i.get)
      else "O"
    }

  private def decodeOf(toks: Array[String]): Seq[String] =
    Crf.viterbi(
      Features.sentenceBits(toks, Dict.gazIndex)
        .map(Crf.emit(_, Crf.emissionWeights)),
      Crf.transitions).toSeq.map(Dict.tags)

  test("decode handles ADJACENT dictionary matches (B→B and bigram " +
      "boundaries) — the wide q55 eligibility rests on this") {
    val cases = Seq(
      "spark spark",                  // same entry twice, touching
      "spark hash join",              // 1-token then 2-token, touching
      "hash join spark",              // 2-token then 1-token
      "merge sort big data",          // two bigrams back-to-back
      "spark customer today",         // ORG then PER, touching
      "key value fast scan query line") // three touching GPE bigrams
    for (text <- cases) {
      val toks = text.split(' ')
      val masks = Features.sentenceBits(toks, Dict.gazIndex)
      // fixture sanity: no token carries two gaz marks (no overlap)
      assert(masks.forall(m => java.lang.Integer.bitCount(
        (m >>> Features.B_GAZ) & 0xFF) <= 1), s"overlapping fixture: $text")
      assert(decodeOf(toks) == expectedFromMasks(masks), text)
    }
  }

  test("decode equals dictionary matching on every non-overlapping " +
      "sentence (the q55 oracle's premise, checked on held-out data)") {
    // seed 13: disjoint from the fit seed (7) and the P/R gate seed (42)
    var sentences = 0
    var skippedOverlap = 0
    for (i <- 0L until 300L) {
      val gen = graft.core.Corpus.genFile(i, 13L, 300L)
      graft.segment.Segmenter.segment(gen.file.content).foreach {
        case (sIdx, toks, ss, es) =>
          val masks = Features.sentenceBits(toks, Dict.gazIndex)
          val gazBits = masks.map(_ >>> Features.B_GAZ)
          val overlapping = gazBits.exists(b =>
            java.lang.Integer.bitCount(b & 0xFF) > 1)
          if (overlapping) skippedOverlap += 1
          else {
            sentences += 1
            val decoded = Crf.viterbi(
              masks.map(Crf.emit(_, Crf.emissionWeights)),
              Crf.transitions).map(Dict.tags)
            val expected = masks.map { m =>
              val ti = (0 until 4).find(t =>
                (m & (1 << (Features.B_GAZ + t))) != 0)
              val tii = (0 until 4).find(t =>
                (m & (1 << (Features.I_GAZ + t))) != 0)
              if (ti.isDefined) "B-" + Dict.entityTypes(ti.get)
              else if (tii.isDefined) "I-" + Dict.entityTypes(tii.get)
              else "O"
            }
            assert(decoded.toSeq == expected.toSeq,
              s"file $i sent $sIdx: ${toks.mkString(" ")}")
          }
      }
    }
    info(s"checked $sentences sentences ($skippedOverlap overlap-skipped)")
    assert(sentences > 1000)
  }

  test("fitted transitions carry the exact wall structure") {
    for (i <- 0 until Crf.K + 2; j <- 0 until Crf.K + 2) {
      if (Crf.walls(i)(j))
        assert(Crf.transitions(i)(j) == Crf.WALL, s"($i,$j) not walled")
      else
        assert(Crf.transitions(i)(j) > -20f && Crf.transitions(i)(j) <= 0f,
          s"($i,$j) legal weight out of log-prob range: " +
            Crf.transitions(i)(j))
    }
  }
}
