package graft.crf

import graft.core.{Dict, LangDict, Sentence, TaggedSentence}
import graft.features.LangFeatures

/** Per-language decode models for the language-generic KG pipeline
  * (r4 verdict #1).
  *
  * The reference's `test_1` runs one pipeline for any of the six
  * languages (main.py:485-565 is language-generic via `args.lang`;
  * features dispatch per language at utils/features.py:5-13) with a
  * DyNet model trained per language on LDC packages that do not ship
  * in-tree. What DOES ship per language is the feature surface
  * ([[LangFeatures]]) and the gazetteer (utils/gaz.csv → tir/orm
  * columns), so the honest re-expression is the same scheme the eng
  * default model uses ([[DefaultModel]]): a closed-form count-based
  * fit over a deterministic planted corpus whose labels are the
  * dictionary semantics. The fit runs on the 24-dim [[LangFeatures]]
  * masks (15 per-language type/token features + 9 gaz B/I/O features)
  * and shares [[FitCrf.weights]]' counts→weights arithmetic, so the
  * served shapes are exactly [[Crf.emissionWeights]]/
  * [[Crf.transitions]] and the standard fused Viterbi kernel decodes
  * unchanged.
  *
  * Model-sized everything: the gaz is a ~1.3k-row dimension table,
  * the planted corpus ~3 sentences/entry, and the fit is driver-side
  * like [[DefaultModel]] (pure function of the word lists — no
  * SparkSession, no corpus scan).
  */
object LangModel {

  import Crf.K
  private val F = graft.features.Features.numFeatures

  val emptyGaz: LangDict.Gaz = Map("GPE" -> Vector(), "LOC" -> Vector(),
    "ORG" -> Vector(), "PER" -> Vector())

  /** The reference gazetteer per language (tir/orm carry entries, the
    * rest are empty — segnerfts.py:20-49). Loaded once per JVM. */
  lazy val refGaz: Map[String, LangDict.Gaz] =
    LangDict.loadGaz(LangDict.gazCsvRows())

  def gazFor(lang: String): LangDict.Gaz =
    refGaz.getOrElse(lang, emptyGaz)

  /** Labeled entries of a gaz in canonical order: label in
    * [[Dict.entityTypes]] order, entries distinct and sorted — the
    * deterministic iteration every consumer (fit, q66 corpus, oracle
    * row_number) shares. */
  def orderedEntries(gaz: LangDict.Gaz): Vector[(String, Vector[String])] =
    Dict.entityTypes.flatMap { label =>
      gaz.getOrElse(label, Vector.empty).distinct
        .sortBy(_.mkString(" "))
        .map(label -> _)
    }

  /** Deterministic in-language O-token pool: the language's title +
    * preposition surfaces that are NOT a token of any gaz entry (so a
    * planted filler never accidentally begins/continues a dictionary
    * match by construction; serve-time accidents are the eligibility
    * filter's job). Falls back to neutral markers for a language with
    * no word lists. */
  def fillerPool(lang: String, gaz: LangDict.Gaz): Vector[String] = {
    val gazToks = gaz.values.flatten.flatten.toSet
    val preps = Vector("ካብ", "ኣብ", "irraa", "keessa", "itti", "ilaa",
      "ee", "from", "in", "von", "im").filter(w =>
      LangDict.isPrepFrom(lang, w) || LangDict.isPrepIn(lang, w))
    val pool = (LangDict.titles.get(lang).map(_.words.toVector)
      .getOrElse(Vector.empty) ++ preps)
      .distinct.sorted.filterNot(gazToks)
    if (pool.nonEmpty) pool else Vector("·", "::", "—")
  }

  /** Planted labeled corpus: per entry, a framed sentence
    * (filler, entry…, filler), the bare entry, and a two-entry
    * adjacency sentence with its successor (teaches the
    * entity→entity transition bigrams the serve corpus can contain);
    * plus pure-O filler sentences. Tags are the planting — i.e. the
    * dictionary semantics, exactly like [[DefaultModel]]'s synthetic
    * labels. */
  def trainingData(lang: String, gaz: LangDict.Gaz)
      : Seq[(Array[String], Array[Int])] = {
    val entries = orderedEntries(gaz)
    val pool = fillerPool(lang, gaz)
    def tagsOf(label: String, len: Int): Array[Int] =
      Array.tabulate(len)(i =>
        Dict.tagId((if (i == 0) "B-" else "I-") + label))
    val planted = entries.zipWithIndex.flatMap { case ((label, e), i) =>
      val f1 = pool(i % pool.size)
      val f2 = pool((i + 1) % pool.size)
      val framed = ((f1 +: e :+ f2).toArray,
        (Dict.O +: tagsOf(label, e.length) :+ Dict.O).toArray)
      val bare = (e.toArray, tagsOf(label, e.length))
      val adj = entries((i + 1) % entries.size) match {
        case (label2, e2) =>
          ((e ++ e2).toArray, tagsOf(label, e.length) ++
            tagsOf(label2, e2.length))
      }
      Seq(framed, bare, adj)
    }
    val oSents = (0 until math.max(4, entries.size / 4)).map { i =>
      val toks = Array.tabulate(3 + i % 4)(j =>
        pool((i + j) % pool.size))
      (toks, Array.fill(toks.length)(Dict.O))
    }
    planted ++ oSents
  }

  /** Closed-form fit over the 24-dim mask features only (no
    * word-identity dictionaries — the per-language default decode is
    * mask-driven exactly like the eng [[DefaultModel]] path, which is
    * what makes it dictionary-provable on non-overlapping-match docs,
    * the q55/q66 oracle enabler). Shares [[FitCrf.weights]]. */
  def fit(lang: String, gaz: LangDict.Gaz): Ensemble.Model = {
    val data = trainingData(lang, gaz)
    val tagCount = new Array[Long](K)
    val featCount = Array.ofDim[Long](K, F)
    val bigram = Array.ofDim[Long](K + 2, K + 2)
    data.foreach { case (words, tags) =>
      if (words.nonEmpty) {
        val gbits = LangFeatures.gazBits(words, gaz)
        var i = 0
        while (i < words.length) {
          val t = tags(i)
          tagCount(t) += 1
          var m = LangFeatures.typeTokenBits(lang, words(i)) | gbits(i)
          while (m != 0) {
            val f = java.lang.Integer.numberOfTrailingZeros(m)
            featCount(t)(f) += 1
            m &= m - 1
          }
          i += 1
        }
        bigram(Crf.START)(tags(0)) += 1
        i = 0
        while (i < tags.length - 1) {
          bigram(tags(i))(tags(i + 1)) += 1; i += 1
        }
        bigram(tags(tags.length - 1))(Crf.END) += 1
      }
    }
    val counts = FitCrf.Counts(tagCount.sum, tagCount, featCount,
      Map.empty, Map.empty, new Array[Long](K), bigram)
    val m = FitCrf.weights(counts)
    Ensemble.Model(m.featW, m.trans)
  }

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Ensemble.Model]()

  /** Per-JVM memoized default model of a language (reference gaz). */
  def fitted(lang: String): Ensemble.Model =
    cache.computeIfAbsent(lang, l => fit(l, gazFor(l)))

  // ---- per-language dictionary surfaces for post-process + linking ---

  private def lower(s: String): String =
    s.toLowerCase(java.util.Locale.ROOT)

  /** Lookup table of a language's gaz (lowercased entry string →
    * label, multi-label entries dropped) — the per-language twin of
    * [[Dict.lookupTable]] for [[graft.postprocess.PostProcess]], so a
    * non-eng corpus is never fixed up against English entries. */
  def lookupTable(gaz: LangDict.Gaz): Map[String, String] =
    orderedEntries(gaz)
      .map { case (label, e) => lower(e.mkString(" ")) -> label }
      .groupBy(_._1)
      .collect { case (k, vs) if vs.map(_._2).distinct.size == 1 =>
        k -> vs.head._2
      }

  /** [[lookupTable]] re-indexed by first token (the shape
    * [[Dict.lookupIndex]] serves the insertion probe). */
  def lookupIndex(gaz: LangDict.Gaz)
      : Map[String, Vector[(Vector[String], String)]] =
    lookupTable(gaz).toVector
      .map { case (text, tag) => (text.split(' ').toVector, tag) }
      .groupBy(_._1.head)
      .view.mapValues(_.sortBy(e => (-e._1.length, e._1.mkString(" "))))
      .toMap

  /** Entity-link index of a language's gaz for [[graft.link.Linker]]:
    * lowercased-first-token → (lowercased entry tokens, label, id),
    * ids assigned over [[orderedEntries]] (label order, then entry
    * string — the canonical order the q69 oracle's row_number
    * recomputes). Entries lowercase for the similarity probe exactly
    * like [[Dict.gazIndex]]; the id space stays on the ORIGINAL
    * distinct entries. No two same-bucket same-label entries share a
    * token set in the reference gaz (LangModelSpec guards it), so an
    * exact-surface mention's argmax is unique at score 1.0. */
  def linkIndex(gaz: LangDict.Gaz)
      : Map[String, Vector[(Vector[String], String, Int)]] =
    orderedEntries(gaz).zipWithIndex
      .map { case ((label, e), id) => (e.map(lower), label, id) }
      .groupBy(_._1.head)
      .view.mapValues(_.sortBy(e => (-e._1.length, e._3)).toVector)
      .toMap

  /** Language-scoped KB id: tir/orm entry ids both start at 0, so the
    * id space carries the language (`tir:Q00001`). */
  def kbId(lang: String)(entryId: Int): String =
    f"$lang%s:Q${entryId + 1}%05d"

  /** Decode one sentence with a language's features + gaz + model:
    * the per-language twin of [[Crf.decodeSentence]], shared by the
    * routed pipeline kernel and tests. */
  def decodeSentence(s: Sentence, lang: String, gaz: LangDict.Gaz,
      m: Ensemble.Model): TaggedSentence = {
    val gbits = LangFeatures.gazBits(s.tokens, gaz)
    val em = Array.tabulate(s.tokens.length) { i =>
      Crf.emit(LangFeatures.typeTokenBits(lang, s.tokens(i)) | gbits(i),
        m.emissions)
    }
    val path = Crf.viterbi(em, m.transitions)
    TaggedSentence(s.repo, s.path, s.sentIdx, s.tokens, s.starts,
      s.ends, path.map(Dict.tags))
  }
}
