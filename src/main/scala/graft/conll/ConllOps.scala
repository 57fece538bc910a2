package graft.conll

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reference file-format operators (SURVEY.md §2.1, §2.2): CoNLL
  * block scan, IO→BIO / BIO→BIOES relabels, Oromo normalization,
  * Brown-cluster densification, DARPA-EDL sink formatting, and the
  * pretrained-embedding text scan. All relational — windows + column
  * expressions; the formats are tiny-dimension inputs in the reference,
  * so these ops are exercised on inline fixtures (FIXTURES.md §B).
  */
object ConllOps {

  /** CoNLL block scan (data_loader.py:243-258): a text file of
    * `word POS chunk NER` lines with blank-line sentence separators →
    * (sentId, tokenIdx, word, pos, chunk, tag). The sessionizer is a
    * running count of blank lines (one window over line number —
    * exactly the events-gap pattern). Input: (lineno, line). */
  def conllScan(lines: DataFrame): DataFrame = {
    val w = Window.orderBy("lineno")
    lines
      .withColumn("isBlank", (trim(col("line")) === "").cast("int"))
      .withColumn("sentId",
        sum("isBlank").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("isBlank") === 0)
      .withColumn("f", split(trim(col("line")), "\\s+"))
      // reference reads fields[0] and fields[-1] (data_loader.py:94-96)
      .select(col("sentId"),
        (row_number().over(Window.partitionBy("sentId")
          .orderBy("lineno")) - 1).as("tokenIdx"),
        col("f").getItem(0).as("word"),
        element_at(col("f"), 2).as("pos"),
        element_at(col("f"), 3).as("chunk"),
        element_at(col("f"), -1).as("tag"))
  }

  /** IO→BIO relabel (eval/IO2BIO.py:3-25): I- becomes B- at sentence
    * start or after O / a different type. */
  def io2bio(tokens: DataFrame): DataFrame = {
    val w = Window.partitionBy("sentId").orderBy("tokenIdx")
    tokens
      .withColumn("prevTag", lag("tag", 1).over(w))
      .withColumn("bio",
        when(col("tag").startsWith("I-") &&
          (col("prevTag").isNull || col("prevTag") === "O" ||
            substring(col("prevTag"), 3, 1000) =!=
              substring(col("tag"), 3, 1000)),
          concat(lit("B-"), substring(col("tag"), 3, 1000)))
          .otherwise(col("tag")))
      .drop("prevTag")
  }

  /** BIO→BIOES relabel (eval/IO2BIOES.py:3-41): next-tag-dependent —
    * B- with no same-type I- following becomes S-; I- at chunk end
    * becomes E-. */
  def bio2bioes(tokens: DataFrame): DataFrame = {
    val w = Window.partitionBy("sentId").orderBy("tokenIdx")
    val nextTag = lead("tag", 1).over(w)
    val typ = substring(col("tag"), 3, 1000)
    val continues = nextTag.isNotNull &&
      nextTag.startsWith("I-") && substring(nextTag, 3, 1000) === typ
    tokens.withColumn("bioes",
      when(col("tag") === "O", "O")
        .when(col("tag").startsWith("B-") && continues, col("tag"))
        .when(col("tag").startsWith("B-") && !continues,
          concat(lit("S-"), typ))
        .when(col("tag").startsWith("I-") && continues, col("tag"))
        .otherwise(concat(lit("E-"), typ)))
  }

  /** The reference's 8 ordered Oromo rewrite rules, verbatim
    * (utils/orm_norm/ormnorm.py:6-15; the orm_morph.py:48-57 variant
    * omits the final s+consonant rule). Java regex keeps Python's
    * leftmost-alternative and backreference semantics. */
  /** The consonant alternation of ormnorm.py's dedup/fortition rules,
    * in the reference's order (shared with the q36 oracle builder). */
  val ormConsonants: Seq[String] = Seq(
    "b", "c", "ch", "d", "dh", "f", "g", "h", "j", "k", "l", "m", "n",
    "ny", "p", "ph", "q", "r", "s", "sh", "t", "v", "w", "x", "y", "z")

  val ormPatterns: Seq[(String, String)] = {
    val cons = ormConsonants.mkString("(", "|", ")")
    Seq(
      ("([aeiou])(\\1)", "$1"),
      (cons + "\\1", "$1"),
      ("ph", "p"),
      ("q", "k"),
      ("x", "t"),
      ("c([^h]|\\b)", "ch$1"),
      ("ai", "ayi"),
      ("s" + cons, "f$1"))
  }

  /** Oromo normalization (utils/orm_norm/ormnorm.py:17-28) as a column
    * expression, exact reference semantics:
    *  - ALL-upper tokens (every char a \p{Lu}; any digit/punct breaks
    *    it, matching Python all(isupper)) return UNCHANGED — not even
    *    case-folded;
    *  - Capitalized tokens (first \p{Lu}, rest all \p{Ll}) normalize
    *    lowercased then re-capitalize;
    *  - everything else normalizes lowercased (mixed case is lost,
    *    as in the reference). Deterministic and idempotent. */
  def ormNormalize(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val normalized = ormPatterns.foldLeft(lower(c)) {
      case (acc, (p, r)) => regexp_replace(acc, p, r)
    }
    when(c.rlike("^\\p{Lu}+$"), c)
      .when(c.rlike("^\\p{Lu}\\p{Ll}*$"),
        concat(upper(substring(normalized, 1, 1)),
          substring(normalized, 2, 100000)))
      .otherwise(normalized)
  }

  /** Brown-cluster densification (utils/features.py:16-29): 3-col TSV
    * (bitstring, word, freq) → word → dense cluster id: binary string →
    * int (conv base 2) → dense_rank over distinct ids. */
  def brownClusters(rows: DataFrame): DataFrame = {
    rows
      .withColumn("rawId", conv(col("bits"), 2, 10).cast("long"))
      .withColumn("clusterId",
        dense_rank().over(Window.orderBy("rawId")) - 1)
      .select(col("word"), col("clusterId"))
  }

  /** DARPA-EDL sink formatting (post_process.py:29-33): the 8-field TSV
    * record, byte-exact:
    * sysId \t docId-ann-N \t text \t docId:start-end \t NIL \t TYPE \t NAM \t 1.0
    * N is the per-doc 1-based mention ordinal in (start, end) order. */
  def edlRecords(mentions: DataFrame, sysId: String): DataFrame = {
    val w = Window.partitionBy("doc").orderBy("start", "end")
    mentions
      .withColumn("n", row_number().over(w))
      .select(concat_ws("\t",
        lit(sysId),
        concat(col("doc"), lit("-ann-"), col("n")),
        col("text"),
        concat(col("doc"), lit(":"), col("start"), lit("-"), col("end")),
        lit("NIL"), col("tag"), lit("NAM"), lit("1.0")).as("record"))
      .orderBy("record")
  }

  /** Pretrained-embedding text scan (utils/util.py:88-116): lines
    * `word v1..vd`; keep rows with exactly dim+1 fields; vector =
    * doubles. Lowercase fallback handled by the consumer via
    * coalesce(emb[word], emb[lower(word)]). */
  def embeddingScan(lines: DataFrame, dim: Int): DataFrame =
    lines
      .withColumn("f", split(col("line"), "\\s+"))
      .filter(size(col("f")) === dim + 1)
      .select(col("f").getItem(0).as("word"),
        slice(col("f"), 2, dim).cast("array<double>").as("vec"))

  /** Vocab→embedding lookup with the reference's lowercase fallback
    * (utils/util.py:97-110: exact surface first, lowercased surface
    * second, miss → null for the caller's init policy). Broadcast-size
    * embedding tables join twice; both joins broadcast. */
  def embeddingLookup(vocab: DataFrame, emb: DataFrame): DataFrame = {
    val exact = emb.select(col("word").as("w_exact"),
      col("vec").as("v_exact"))
    val lower0 = emb.groupBy(lower(col("word")).as("w_lower"))
      .agg(first(col("vec")).as("v_lower"))
    vocab
      .join(broadcast(exact), col("word") === col("w_exact"), "left")
      .join(broadcast(lower0), lower(col("word")) === col("w_lower"),
        "left")
      .select(col("word"),
        coalesce(col("v_exact"), col("v_lower")).as("vec"),
        (col("v_exact").isNull && col("v_lower").isNotNull)
          .as("used_fallback"))
  }

  /** File-scale CoNLL scan → whole sentences, scale-safe (r6): the
    * round-5 shape routed the whole file through [[conllScan]]'s
    * single-partition sessionizer window (219k rows in ONE task on
    * eng.train, and a straight scale-killer on a bigger file). The
    * sessionizer is a running blank count, so it decomposes into the
    * classic two-pass prefix sum: pass 1 counts blanks/lines per
    * split (a tiny collect), pass 2 stamps each line's sentId =
    * blanks-before from its split's offset — no global window, no
    * zipWithIndex job, line order pinned by textFile's split-order
    * stability. Output is identical to the old path (same sentIds,
    * same per-sentence token order via the lineno sort): sentences
    * that span a split boundary are stitched by the groupBy.
    * DOCSTART separator lines are kept as 1-token O sentences,
    * exactly as the reference loader does (data_loader.py:243-258
    * has no special case). */
  def conllFileSentences(spark: SparkSession, path: String)
      : org.apache.spark.sql.Dataset[ConllSentence] = {
    import spark.implicits._
    val lines = spark.sparkContext.textFile(path)
    // pass 1: per-split (blank count, line count) → prefix offsets
    val counts = lines.mapPartitionsWithIndex { (pid, it) =>
      var blanks = 0L; var n = 0L
      it.foreach { l => if (l.trim.isEmpty) blanks += 1; n += 1 }
      Iterator.single((pid, blanks, n))
    }.collect().sortBy(_._1)
    val blankOff = counts.scanLeft(0L)(_ + _._2)
    val lineOff = counts.scanLeft(0L)(_ + _._3)
    val bOff = spark.sparkContext.broadcast((blankOff, lineOff))
    // pass 2: sentId = blanks strictly before the line (the window's
    // running sum over isBlank, filter isBlank == 0 — same ids);
    // reference reads fields[0] and fields[-1] (data_loader.py:94-96)
    val toks = lines.mapPartitionsWithIndex { (pid, it) =>
      val (bo, lo) = bOff.value
      var sent = bo(pid)
      var lineno = lo(pid)
      it.flatMap { l =>
        val t = l.trim
        lineno += 1
        if (t.isEmpty) { sent += 1; Iterator.empty }
        else {
          val f = t.split("\\s+")
          Iterator.single((sent, lineno, f(0), f(f.length - 1)))
        }
      }
    }.toDF("sentId", "lineno", "word", "tag")
    toks.groupBy("sentId")
      .agg(sort_array(collect_list(
        struct(col("lineno"), col("word"), col("tag")))).as("arr"))
      .select(col("sentId"),
        expr("transform(arr, x -> x.word)").as("words"),
        expr("transform(arr, x -> x.tag)").as("tags"))
      .as[ConllSentence]
  }

  /** Inline CoNLL fixture (FIXTURES.md §B.1): deterministic, covers
    * B/I chains, orphan I-, adjacent B-X B-X, type switch, MISC,
    * all-caps, digits, internal periods. */
  def conllFixture(spark: SparkSession): DataFrame = {
    import spark.implicits._
    ConllFixture.lines.zipWithIndex
      .map { case (l, i) => (i.toLong, l) }
      .toDF("lineno", "line")
  }
}

/** One scanned CoNLL sentence (public top-level: Spark codegen calls
  * the encoder accessors directly). */
final case class ConllSentence(sentId: Long, words: Array[String],
    tags: Array[String])

/** The fixture lines as data (shared with the DuckDB oracle, which
  * receives them as an inline VALUES list). */
object ConllFixture {
  val lines: Seq[String] = Seq(
    "EU NNP I-NP I-ORG",
    "rejects VBZ I-VP O",
    "German JJ I-NP I-MISC",
    "call NN I-NP O",
    ". . O O",
    "",
    "Peter NNP I-NP I-PER",
    "Blackburn NNP I-NP I-PER",
    "",
    "BRUSSELS NNP I-NP I-LOC",
    "1996-08-22 CD I-NP O",
    "",
    "The DT I-NP O",
    "European NNP I-NP I-ORG",
    "Commission NNP I-NP I-ORG",
    "said VBD I-VP O",
    "Mr. NNP I-NP O",
    "U.N. NNP I-NP I-ORG",
    "officials NNS I-NP O",
    "",
    "Germany NNP I-NP I-LOC",
    "Britain NNP I-NP I-LOC",
    "France NNP I-NP I-LOC",
    "")
}
