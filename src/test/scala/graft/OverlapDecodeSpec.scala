package graft

import graft.core.Dict
import graft.crf.Crf
import graft.features.Features
import org.scalatest.funsuite.AnyFunSuite

/** Proof obligation for the q50 full-corpus decode oracle
  * (Queries7.o50): on every overlap/containment pattern realizable in
  * the documents corpus, the fitted Viterbi decoder equals the
  * token-local resolution rule the oracle implements in SQL.
  *
  * Scope: the corpus vocabulary is the 31 lowercase words (TESTDATA),
  * so realizable patterns are those among the all-lowercase gazetteer
  * entries. Uppercase-entry patterns (e.g. `Mount Kenya` ⊃ `Kenya`)
  * are NOT token-local — Viterbi keeps the containing entry there —
  * and are excluded by the vocabulary check below; if the generator
  * ever emitted them, q50 would fail loudly (hash mismatch), not
  * silently. */
class OverlapDecodeSpec extends AnyFunSuite {

  private def ruleTags(toks: Array[String]): Array[String] = {
    val lower = toks.map(_.toLowerCase)
    val bl = Array.fill[String](toks.length)(null)
    val il = Array.fill[String](toks.length)(null)
    for {
      i <- toks.indices
      entries <- Dict.gazIndex.get(lower(i)).toSeq
      (etoks, label, _) <- entries
      if i + etoks.length <= toks.length &&
        etoks.indices.forall(k => lower(i + k) == etoks(k))
    } {
      if (bl(i) == null || label > bl(i)) bl(i) = label
      (i + 1 until i + etoks.length).foreach { t =>
        if (il(t) == null || label > il(t)) il(t) = label
      }
    }
    Array.tabulate(toks.length) { t =>
      if (bl(t) != null && il(t) != null && bl(t) == il(t)) "I-" + bl(t)
      else if (bl(t) != null) "B-" + bl(t)
      else if (il(t) != null) "I-" + il(t)
      else "O"
    }
  }

  private def kernelTags(toks: Array[String]): Array[String] =
    Crf.viterbi(
      Features.sentenceBits(toks, Dict.gazIndex)
        .map(Crf.emit(_, Crf.emissionWeights)),
      Crf.transitions).map(Dict.tags)

  /** All-lowercase entries = the ones expressible over the corpus
    * vocabulary. */
  private val lowerEntries =
    Dict.gazetteer.filter(_._1.forall(t => t == t.toLowerCase))

  private def witnesses(): Seq[Array[String]] = {
    val out = scala.collection.mutable.ArrayBuffer[Array[String]]()
    for ((e1, _) <- lowerEntries; (e2, _) <- lowerEntries
        if e1 != e2) {
      for (s <- 1 until e1.length) {
        val ov = e1.length - s
        if (ov < e2.length &&
          (0 until ov).forall(k => e1(s + k) == e2(k))) {
          val t = (e1 ++ e2.drop(ov)).toArray
          out += t
          out += (Array("the") ++ t ++ Array("agg")).toArray
        }
      }
      for (s <- 0 to e1.length - e2.length if e2.length < e1.length)
        if (e2.indices.forall(k => e2(k) == e1(s + k))) {
          out += e1.toArray
          out += (Array("the") ++ e1 ++ Array("agg")).toArray
        }
    }
    // alternating-pair chains (merge sort / sort merge) to length 5
    for ((e1, _) <- lowerEntries; (e2, _) <- lowerEntries
      if e1.length == 2 && e2.length == 2 &&
        e1(1) == e2(0) && e2(1) == e1(0)) {
      out += (e1 ++ Vector(e1(0))).toArray
      out += (e1 ++ e1).toArray
      out += (e1 ++ e1 ++ Vector(e1(0))).toArray
      out += (Array("the") ++ e1 ++ e1 ++ Vector(e1(0)) ++
        Array("agg")).toArray
    }
    out.toSeq
  }

  test("realizable overlap patterns exist (the spec is not vacuous)") {
    assert(witnesses().size >= 10)
  }

  test("kernel decode == token-local rule on every realizable " +
      "overlap/containment pattern") {
    for (t <- witnesses()) {
      val k = kernelTags(t)
      val r = ruleTags(t)
      assert(k.sameElements(r),
        s"${t.mkString(" ")}: kernel=${k.mkString(" ")} rule=${r.mkString(" ")}")
    }
  }

  test("non-overlapping matches and O fillers follow the same rule " +
      "(the rule subsumes plain dictionary decoding)") {
    val cases = Seq(
      "the spark line", "hash join spark", "spark spark",
      "key value fast scan query line", "a big data the",
      "customer merge sort window agg")
    for (text <- cases) {
      val t = text.split(" ")
      assert(kernelTags(t).sameElements(ruleTags(t)), text)
    }
  }

  test("uppercase gazetteer tokens never occur in the corpus " +
      "vocabulary (the oracle's scope condition)") {
    val upperToks = Dict.gazetteer.flatMap(_._1)
      .filterNot(t => t == t.toLowerCase)
      .map(_.toLowerCase).toSet
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val path = s"/root/testdata/$sf/documents.parquet"
      if (new java.io.File(path).exists()) {
        val spark = org.apache.spark.sql.SparkSession.builder()
          .master("local[4]").config("spark.ui.enabled", "false")
          .getOrCreate()
        import org.apache.spark.sql.functions._
        val vocab = spark.read.parquet(path)
          .select(explode(split(lower(col("text")), "\\s+")).as("w"))
          .distinct().collect().map(_.getString(0)).toSet
        assert(vocab.intersect(upperToks).isEmpty,
          s"$sf corpus contains uppercase-entry tokens")
      }
    }
  }
}
