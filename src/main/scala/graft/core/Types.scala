package graft.core

/** Core row types of the KG-construction pipeline.
  *
  * Shapes mirror the reference's implicit row model (SURVEY.md §1.1):
  * sentences as token arrays (reference: dataloaders/data_loader.py:243-258),
  * mentions as (doc, start, end, text, tag) records (reference:
  * utils/post_process.py:29-33), triples as (subj, pred, obj).
  */

/** One row of the primary input table (BASELINE.json input_hint):
  * an Iceberg-shaped source-code corpus row. */
final case class SourceFile(
    repo: String,
    path: String,
    commit: String,
    lang: String,
    content: String)

/** One sentence of one file, with char offsets into `content`.
  * `starts(i)`/`ends(i)` are [start, end) char offsets of `tokens(i)`. */
final case class Sentence(
    repo: String,
    path: String,
    sentIdx: Int,
    tokens: Array[String],
    starts: Array[Int],
    ends: Array[Int])

/** Sentence after feature extraction: `feats(i)` is the packed 0/1
  * indicator vector of token i (SURVEY.md §2.3; reference
  * utils/segnerfts/segnerfts.py:747-749). `wordScores(i)` is the
  * dictionary/gazetteer emission contribution per tag for token i. */
final case class EncodedSentence(
    repo: String,
    path: String,
    sentIdx: Int,
    tokens: Array[String],
    starts: Array[Int],
    ends: Array[Int],
    feats: Array[Array[Float]])

/** Sentence after Viterbi decode: one BIO tag per token. */
final case class TaggedSentence(
    repo: String,
    path: String,
    sentIdx: Int,
    tokens: Array[String],
    starts: Array[Int],
    ends: Array[Int],
    tags: Array[String])

/** An entity-mention span (reference EDL record,
  * utils/Convert_to_darpa_xml.py:15-94). Offsets are char offsets
  * into the file content; `docId = repo + "/" + path`. */
final case class Mention(
    repo: String,
    path: String,
    sentIdx: Int,
    start: Int,
    end: Int,
    text: String,
    tag: String,
    conf: Double)

/** A knowledge-graph triple. */
final case class Triple(subj: String, pred: String, obj: String)
