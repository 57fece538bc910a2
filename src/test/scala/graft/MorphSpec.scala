package graft

import graft.features.Morph
import org.scalatest.funsuite.AnyFunSuite

/** ex_morph semantics goldens (segnerfts.py:104-115, 706-728). */
class MorphSpec extends AnyFunSuite {

  test("18 feature sets, not the reference's stale 23-slot constant") {
    assert(Morph.featureSets.length == 18)
    assert(Morph.featureNames.length == 18)
  }

  test("empty analyzer (eng/deu/amh/som) -> every feature false") {
    val f = Morph.features("Running", Morph.EmptyAnalyzer)
    assert(f.forall(_ == false))
    assert(Morph.bits("word", Morph.forLang("eng")) == 0)
    assert(Morph.bits("Wort", Morph.forLang("deu")) == 0)
  }

  test("gloss strings split on '-' AND '.'") {
    val a = new Morph.SuffixStubAnalyzer(Seq("koo" -> "POSS.1SG"))
    val f = Morph.featureNames.zip(Morph.features("manakoo", a)).toMap
    assert(f("m_poss"), "POSS from dot-separated gloss")
    assert(f("m_persnum"), "1SG from dot-separated gloss")
    assert(!f("m_pl"))
  }

  test("union over ALL parses (BEST_PARSE=False)") {
    val a = new Morph.SuffixStubAnalyzer(
      Seq("ani" -> "NOM", "ni" -> "DAT")) // both match 'gurbaani'
    val f = Morph.featureNames.zip(Morph.features("gurbaani", a)).toMap
    assert(f("m_nom") && f("m_dat"))
  }

  test("PL tag sets both plural and person-number (shared tag)") {
    val f = Morph.featureNames
      .zip(Morph.features("namoota", Morph.forLang("orm"))).toMap
    assert(f("m_pl") && f("m_persnum"))
    assert(!f("m_nom") && !f("m_gender"))
  }

  test("no parse -> all false; suffix must be proper (token longer)") {
    val a = new Morph.SuffixStubAnalyzer(Seq("oota" -> "PL"))
    assert(Morph.features("xyz", a).forall(_ == false))
    assert(Morph.features("oota", a).forall(_ == false),
      "whole-token suffix is not a parse")
  }

  test("bits mask matches boolean vector") {
    val a = Morph.forLang("orm")
    val f = Morph.features("namoota", a)
    val m = Morph.bits("namoota", a)
    f.zipWithIndex.foreach { case (b, i) =>
      assert(((m >> i) & 1) == (if (b) 1 else 0))
    }
  }
}
