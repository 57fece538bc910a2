package graft.pipeline

import graft.core.{Mention, SourceFile}
import graft.crf.Crf
import graft.segment.Segmenter
import graft.spans.Spans
import org.apache.spark.sql.Dataset

/** End-to-end mention detection: corpus → sentences → featurize →
  * Viterbi → spans. Segment/featurize/decode/extract are all narrow
  * typed transforms over broadcast model state — the whole stage runs
  * shuffle-free regardless of input size (SURVEY.md §3.1). */
object Pipeline {
  def mentions(files: Dataset[SourceFile]): Dataset[Mention] =
    Spans.fromTagged(Crf.tag(Segmenter.sentences(files)))
}
