package graft.segment

import graft.core.{Sentence, SourceFile}
import org.apache.spark.sql.Dataset

/** content → sentences/tokens with absolute char offsets.
  *
  * The reference consumes pre-tokenized CoNLL blocks separated by blank
  * lines (dataloaders/data_loader.py:243-258) or one-sentence-per-line
  * whitespace text (data_loader.py:293-303). For the source-code corpus
  * we segment by line (code is line-oriented) and tokenize on whitespace
  * runs, keeping [start, end) char offsets into `content` — the
  * provenance the reference discards and then has to fuzzily reconstruct
  * (post_process.py:363-414); keeping it makes the EDL merge an exact
  * join (SURVEY.md §2.5).
  *
  * Pure, allocation-light, and applied as a narrow typed flatMap — no
  * shuffle; fuses with featurize+Viterbi into one stage at any scale.
  */
object Segmenter {

  /** Tokenize one content string. Returns (sentIdx, tokens, starts, ends)
    * per non-empty line. */
  def segment(content: String): IndexedSeq[(Int, Array[String], Array[Int], Array[Int])] = {
    val out = Vector.newBuilder[(Int, Array[String], Array[Int], Array[Int])]
    var lineStart = 0
    var sentIdx = 0
    val n = content.length
    while (lineStart <= n) {
      var lineEnd = content.indexOf('\n', lineStart)
      if (lineEnd < 0) lineEnd = n
      // tokenize [lineStart, lineEnd)
      val toks = Array.newBuilder[String]
      val ss = Array.newBuilder[Int]
      val es = Array.newBuilder[Int]
      var i = lineStart
      var count = 0
      while (i < lineEnd) {
        while (i < lineEnd && Character.isWhitespace(content.charAt(i))) i += 1
        if (i < lineEnd) {
          val s = i
          while (i < lineEnd && !Character.isWhitespace(content.charAt(i))) i += 1
          toks += content.substring(s, i); ss += s; es += i; count += 1
        }
      }
      if (count > 0) {
        out += ((sentIdx, toks.result(), ss.result(), es.result()))
        sentIdx += 1
      }
      lineStart = lineEnd + 1
      if (lineEnd == n) lineStart = n + 1
    }
    out.result()
  }

  def sentences(files: Dataset[SourceFile]): Dataset[Sentence] = {
    import files.sparkSession.implicits._
    files.flatMap { f =>
      segment(f.content).map { case (i, t, s, e) =>
        Sentence(f.repo, f.path, i, t, s, e)
      }
    }
  }
}
