package graft.pipeline

import graft.core.{Mention, Sentence, SourceFile}
import graft.crf.Crf
import graft.io.TableIO
import graft.link.Linker
import graft.postprocess.PostProcess
import graft.segment.Segmenter
import graft.spans.Spans
import graft.triples.Triples
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** End-to-end KG construction (SURVEY.md §3.1 lifecycle, §7.2 modules):
  *
  *   corpus → segment → featurize → Viterbi → spans      (narrow, fused)
  *          → post-process (vote/fix-up/insert shuffles on doc/text key)
  *          → link (broadcast dict, narrow)
  *          → canonicalize (iterative min-label propagation)
  *          → (subj, pred, obj) triples
  *
  * Scale notes: the decode stage is shuffle-free and embarrassingly
  * parallel; post-processing keys by (repo, path) — mega-repos are
  * salted by the natural (repo, path) composite so single files, not
  * repos, bound a task; checkpointing per stage via [[TableIO]] gives
  * resume + per-partition lineage (north rule).
  */
object Pipeline {

  def mentions(files: Dataset[SourceFile]): Dataset[Mention] =
    Spans.fromTagged(Crf.tag(Segmenter.sentences(files)))

  def postProcessed(files: Dataset[SourceFile]): Dataset[Mention] = {
    val sents = Segmenter.sentences(files)
    val raw = Spans.fromTagged(Crf.tag(sents))
    PostProcess(sents, raw)
  }

  def triples(files: Dataset[SourceFile]): DataFrame =
    Triples.materialize(Linker.link(postProcessed(files)))

  /** Checkpointed variant: every stage lands in `root/<stage>` with a
    * `_lineage.json` sidecar; a re-run with the same snapshot id
    * resumes from the last committed stage (north rule resumability). */
  def triplesCheckpointed(files: Dataset[SourceFile], root: String,
      snapshot: String): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    val sents = Segmenter.sentences(files)
    val rawM = TableIO.writeStage(
      Spans.fromTagged(Crf.tag(sents)).toDF(),
      root, "mentions_raw", snapshot).as[Mention]
    val post = TableIO.writeStage(
      PostProcess(sents, rawM).toDF(), root, "mentions_post", snapshot)
      .as[Mention]
    val linked = TableIO.writeStage(
      Linker.link(post).toDF(), root, "mentions_linked", snapshot)
      .as[Linker.LinkedMention]
    TableIO.writeStage(Triples.materialize(linked), root, "triples",
      snapshot, partitionCols = Seq("pred"))
  }

  /** Salt a skewed key: `repo` → `repo#<salt>` with `buckets` salts —
    * used before groupBys keyed only by repo when mega-repos dominate
    * (SURVEY.md §7.6.5). Exposed for stages that aggregate per repo. */
  def saltRepo(df: DataFrame, buckets: Int = 16): DataFrame =
    df.withColumn("repo_salted",
      concat(col("repo"), lit("#"),
        pmod(xxhash64(col("path")), lit(buckets)).cast("string")))
}
