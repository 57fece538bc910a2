package graft.features

/** The reference's morphological gloss features.
  *
  * Reference semantics (`utils/segnerfts/segnerfts.py`):
  *  - 18 feature sets at `segnerfts.py:706-728` (the constants
  *    `MORPH_START, MORPH_END = 24, 47` at :736 claim 23 slots, but the
  *    extractor list holds 18 — python slicing truncates silently, so
  *    18 IS the reference's behavior);
  *  - `ex_morph` (:104-115): token → analyzer parses (ALL parses:
  *    `BEST_PARSE = False`, :13) → each parse's gloss string split on
  *    `[-.]` (:98-101) → union over parses → feature_i = (union ∩
  *    featureSet_i) nonempty; a token with no parse is False for every
  *    feature.
  *
  * The analyzer is PLUGGABLE, and in this library the Ethiopic ones are
  * STUBBED: the reference's orm/tir analyzers are a parser-combinator
  * morphology engine needing external resources (epitran, NLTK corpora,
  * pickled dictionaries — `orm_morph.py:6-26`) that cannot ship in an
  * offline library. Like the media codecs (Multimodal.decodeStub), the
  * analyzer is the drop-in point; the gloss algebra around it — the
  * actual operator — is real and oracle-gated (q54). eng/deu/amh/som
  * return no parses in the reference (`segnerfts.py:89-94`):
  * [[Morph.EmptyAnalyzer]] reproduces that exactly, so English decode
  * pipelines are bit-identical with or without the morph block.
  */
object Morph {

  trait Analyzer extends Serializable {
    /** All morphological parses of a token, each a gloss string whose
      * `[-.]`-separated segments are gloss tags (reference
      * representation_name/channel = 'gloss'). */
    def parses(token: String): Seq[String]
  }

  /** The reference's eng/deu/amh/som behavior: no parses ever. */
  object EmptyAnalyzer extends Analyzer {
    override def parses(token: String): Seq[String] = Nil
  }

  /** ==== STUB ==== deterministic suffix-table fake standing in for
    * the real orm/tir analyzers (which need epitran + NLTK + pickled
    * dictionaries). Matches every table suffix independently (a token
    * can yield several parses — exercising the all-parses union the
    * reference gets from BEST_PARSE=False). A real analyzer replaces
    * ONLY this class. */
  final class SuffixStubAnalyzer(table: Seq[(String, String)])
      extends Analyzer {
    override def parses(token: String): Seq[String] = {
      val lower = token.toLowerCase
      table.collect {
        case (suf, gloss) if lower.length > suf.length &&
            lower.endsWith(suf) =>
          s"${token.dropRight(suf.length)}-$gloss"
      }
    }
  }

  /** Default stub table (gloss tags drawn from [[featureSets]] so the
    * plumbing is testable; the SUFFIXES are a fake, not linguistics). */
  val stubTable: Seq[(String, String)] = Seq(
    "oota" -> "PL", "ni" -> "NOM", "tiin" -> "INST", "dhaf" -> "DAT",
    "irraa" -> "ABL", "koo" -> "POSS.1SG")

  def forLang(lang: String): Analyzer = lang match {
    case "orm" | "tir" => new SuffixStubAnalyzer(stubTable)
    case _ => EmptyAnalyzer // eng/deu/amh/som: segnerfts.py:89-94
  }

  /** The 18 gloss sets, verbatim from segnerfts.py:706-728, in slot
    * order. Names are ours; sets are the reference's. */
  val featureNames: IndexedSeq[String] = IndexedSeq(
    "m_persnum", "m_obj", "m_poss", "m_obl", "m_gender", "m_pl",
    "m_def", "m_nom", "m_gen", "m_dat", "m_inst", "m_abl", "m_conj",
    "m_tense", "m_pol", "m_juss", "m_inf", "m_adj")

  val featureSets: IndexedSeq[Set[String]] = IndexedSeq(
    Set("1SG", "1PL", "2SG", "2PL", "3SG", "3PL", "PL"), // person-number
    Set("OBJ"),
    Set("POSS"),
    Set("OBL"),
    Set("FEM", "MASC", "F", "M"), // gender
    Set("PL"),
    Set("DEF"),
    Set("NOM"),
    Set("GEN"),
    Set("DAT"),
    Set("INST"),
    Set("ABL"),
    Set("AND", "CONJ"),
    Set("PST", "PRS", "PAST", "PRES"), // tense
    Set("AFF", "NEG"), // polarity
    Set("JUSS"),
    Set("INF"),
    Set("ADJ"))

  private val glossDelim = "[-.]"

  /** Union of gloss segments over ALL parses (BEST_PARSE=False). */
  def glossSet(parses: Seq[String]): Set[String] =
    parses.iterator.flatMap(_.split(glossDelim)).toSet

  /** The 18 booleans for one token. */
  def features(token: String, analyzer: Analyzer): IndexedSeq[Boolean] = {
    val g = glossSet(analyzer.parses(token))
    if (g.isEmpty) featureSets.map(_ => false)
    else featureSets.map(fs => fs.exists(g.contains))
  }

  /** Bitmask form (bit i = featureSets(i)), the shape the fused decode
    * kernel consumes — for eng it is constantly 0, which is exactly
    * why the kernel omits the block (segnerfts.py:89-94; SURVEY §2.3). */
  def bits(token: String, analyzer: Analyzer): Int = {
    val f = features(token, analyzer)
    var m = 0; var i = 0
    while (i < f.length) { if (f(i)) m |= 1 << i; i += 1 }
    m
  }
}
