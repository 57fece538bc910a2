package graft

import graft.core.Dict
import graft.features.Features
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the 24 indicator features (segnerfts.py semantics,
  * SURVEY.md §2.3). */
class FeaturesSpec extends AnyFunSuite {
  import Features._

  private def has(m: Int, f: Int) = (m & (1 << f)) != 0

  test("type/token features on curated tokens") {
    val m1 = tokenBits("Vereinigten")
    assert(has(m1, CAPITALIZED) && has(m1, LONG_TOKEN) &&
      has(m1, CONTAINS_LATIN) && !has(m1, ALL_UPPER) &&
      !has(m1, NON_LETTER))
    val m2 = tokenBits("NATO")
    assert(has(m2, ALL_UPPER) && has(m2, CAPITALIZED) && !has(m2, MIXED_CASE))
    // reference all(isupper) is false when any char is a digit
    val m3 = tokenBits("NAT0")
    assert(!has(m3, ALL_UPPER) && has(m3, DIGITS) && has(m3, NON_LETTER))
    val m4 = tokenBits("McCarthy")
    assert(has(m4, MIXED_CASE) && has(m4, CAPITALIZED))
    // internal period: len>2 and '.' strictly inside
    assert(has(tokenBits("U.N"), INTERNAL_PERIOD))
    assert(!has(tokenBits("UN."), INTERNAL_PERIOD))
    assert(!has(tokenBits("ab"), INTERNAL_PERIOD))
    assert(has(tokenBits("Mr."), TITLE))
    assert(has(tokenBits("Ministry"), HEAD_ORG))
    assert(has(tokenBits("River"), HEAD_LOC))
    assert(has(tokenBits("Republic"), HEAD_GPE))
    assert(has(tokenBits("from"), PREP_FROM) && has(tokenBits("From"), PREP_FROM))
    assert(has(tokenBits("in"), PREP_IN))
    assert(has(tokenBits("ኢትዮጵያ"), CONTAINS_ETHIOPIC))
    assert(!has(tokenBits("ኢትዮጵያ"), CONTAINS_LATIN))
  }

  test("gazetteer B/I/O marking incl. overlapping entries") {
    val toks = "he saw the apache software foundation in addis ababa".split(' ')
    val masks = Features.sentenceBits(toks, Dict.gazIndex)
    val orgIdx = Dict.entityTypes.indexOf("ORG")
    val gpeIdx = Dict.entityTypes.indexOf("GPE")
    assert(has(masks(3), B_GAZ + orgIdx))   // apache
    assert(has(masks(4), I_GAZ + orgIdx))   // software
    assert(has(masks(5), I_GAZ + orgIdx))   // foundation
    assert(has(masks(7), B_GAZ + gpeIdx))   // addis
    assert(has(masks(8), I_GAZ + gpeIdx))   // ababa
    assert(has(masks(0), O_GAZ) && has(masks(6), O_GAZ))
    assert(!has(masks(3), O_GAZ))
  }

  test("case-insensitive multi-token match from the code stratum") {
    val toks = "the hash join beats merge sort".split(' ')
    val masks = Features.sentenceBits(toks, Dict.gazIndex)
    val orgIdx = Dict.entityTypes.indexOf("ORG")
    assert(has(masks(1), B_GAZ + orgIdx) && has(masks(2), I_GAZ + orgIdx))
    assert(has(masks(4), B_GAZ + orgIdx) && has(masks(5), I_GAZ + orgIdx))
  }
}
