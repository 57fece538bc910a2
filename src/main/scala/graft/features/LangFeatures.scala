package graft.features

import graft.core.LangDict

/** Reference-parity `segnerfts.extract` for all six languages
  * (utils/segnerfts/segnerfts.py:681-749 composition over the
  * extractors at 122-678): 15 type/token features plus the 9
  * case-sensitive gazetteer B/I/O features.
  *
  * This is the user-visible per-language surface; the engine's own
  * decode path keeps [[Features.tokenBits]] (the eng slice fitted into
  * models/eng.fitted). Two reference quirks are reproduced here and NOT
  * in the eng slice:
  *   - MIXED_CASE tests "some char of w[1:] is upper AND some is NOT
  *     upper" (segnerfts.py:132-136) — digits/punctuation count as
  *     not-upper, not only lowercase letters;
  *   - DIGITS matches the full Unicode Number category `\p{Number}`
  *     (segnerfts.py:147-148), not just decimal digits.
  */
object LangFeatures {

  import Features.{CAPITALIZED, ALL_UPPER, MIXED_CASE, INTERNAL_PERIOD,
    NON_LETTER, DIGITS, LONG_TOKEN, CONTAINS_LATIN, CONTAINS_ETHIOPIC,
    TITLE, HEAD_ORG, HEAD_LOC, HEAD_GPE, PREP_FROM, PREP_IN,
    B_GAZ, I_GAZ, O_GAZ}

  /** 15 type/token feature bits of one token (indices 0-14, reference
    * extractor order segnerfts.py:681-696). */
  def typeTokenBits(lang: String, w: String): Int = {
    var m = 0
    val n = w.length
    if (n > 0 && Character.isUpperCase(w.charAt(0))) m |= 1 << CAPITALIZED
    if (w.forall(Character.isUpperCase)) m |= 1 << ALL_UPPER
    if (n > 1) {
      val rest = w.substring(1)
      if (rest.exists(Character.isUpperCase) &&
          rest.exists(c => !Character.isUpperCase(c))) m |= 1 << MIXED_CASE
    }
    if (n > 2 && w.substring(1, n - 1).contains('.'))
      m |= 1 << INTERNAL_PERIOD
    if (w.exists { c =>
      val t = Character.getType(c)
      !(Character.isLetter(c) ||
        t == Character.NON_SPACING_MARK ||
        t == Character.COMBINING_SPACING_MARK ||
        t == Character.ENCLOSING_MARK)
    }) m |= 1 << NON_LETTER
    if (w.exists { c =>
      val t = Character.getType(c)
      t == Character.DECIMAL_DIGIT_NUMBER ||
        t == Character.LETTER_NUMBER || t == Character.OTHER_NUMBER
    }) m |= 1 << DIGITS
    if (n > 8) m |= 1 << LONG_TOKEN
    if (w.exists(c => Character.UnicodeScript.of(c) ==
        Character.UnicodeScript.LATIN)) m |= 1 << CONTAINS_LATIN
    if (w.exists(c => Character.UnicodeScript.of(c) ==
        Character.UnicodeScript.ETHIOPIC)) m |= 1 << CONTAINS_ETHIOPIC
    if (LangDict.isTitle(lang, w)) m |= 1 << TITLE
    if (LangDict.isOrgHead(lang, w)) m |= 1 << HEAD_ORG
    if (LangDict.isLocHead(lang, w)) m |= 1 << HEAD_LOC
    if (LangDict.isGpeHead(lang, w)) m |= 1 << HEAD_GPE
    if (LangDict.isPrepFrom(lang, w)) m |= 1 << PREP_FROM
    if (LangDict.isPrepIn(lang, w)) m |= 1 << PREP_IN
    m
  }

  /** Gazetteer B/I/O bits (indices 15-23): EXACT token-tuple sliding
    * match per label (ex_b_gaz/ex_i_gaz/ex_o_gaz, segnerfts.py:55-85 —
    * case-sensitive, every matching entry marks its positions). */
  def gazBits(tokens: Array[String], gaz: LangDict.Gaz): Array[Int] = {
    val n = tokens.length
    val masks = new Array[Int](n)
    val covered = new Array[Boolean](n)
    graft.core.Dict.entityTypes.zipWithIndex.foreach { case (label, ti) =>
      gaz.getOrElse(label, Vector.empty).foreach { entry =>
        val len = entry.length
        var i = 0
        while (i + len <= n) {
          var k = 0
          var ok = true
          while (ok && k < len) { ok = tokens(i + k) == entry(k); k += 1 }
          if (ok) {
            masks(i) |= 1 << (B_GAZ + ti)
            var p = 0
            while (p < len) { covered(i + p) = true; p += 1 }
            var q = 1
            while (q < len) { masks(i + q) |= 1 << (I_GAZ + ti); q += 1 }
          }
          i += 1
        }
      }
    }
    var i = 0
    while (i < n) { if (!covered(i)) masks(i) |= 1 << O_GAZ; i += 1 }
    masks
  }

  /** `segnerfts.extract_type_token_level`: per-token 15-dim 0/1 rows. */
  def extract(lang: String, tokens: Array[String]): Array[Array[Int]] =
    tokens.map { w =>
      val m = typeTokenBits(lang, w)
      Array.tabulate(15)(f => (m >> f) & 1)
    }

  /** `segnerfts.extract_type_token_gaz`: per-token 24-dim 0/1 rows. */
  def extractWithGaz(lang: String, tokens: Array[String],
      gaz: LangDict.Gaz): Array[Array[Int]] = {
    val g = gazBits(tokens, gaz)
    tokens.indices.toArray.map { i =>
      val m = typeTokenBits(lang, tokens(i)) | g(i)
      Array.tabulate(24)(f => (m >> f) & 1)
    }
  }

  /** The reference's slice views (segnerfts.py:739-749, 766-781):
    * TYPE = extractors 0-8, TOKEN = 9-14, GAZ = 15-23. */
  def extractTypeLevel(lang: String, tokens: Array[String])
      : Array[Array[Int]] =
    tokens.map { w =>
      val m = typeTokenBits(lang, w)
      Array.tabulate(9)(f => (m >> f) & 1)
    }

  def extractTokenLevel(lang: String, tokens: Array[String])
      : Array[Array[Int]] =
    tokens.map { w =>
      val m = typeTokenBits(lang, w)
      Array.tabulate(6)(f => (m >> (TITLE + f)) & 1)
    }

  def extractGazFeatures(tokens: Array[String], gaz: LangDict.Gaz)
      : Array[Array[Int]] =
    gazBits(tokens, gaz).map(m =>
      Array.tabulate(9)(f => (m >> (B_GAZ + f)) & 1))
}
