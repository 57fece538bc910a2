package graft

import graft.conll.ConllOps
import graft.core.{Dict, Sentence}
import graft.crf.FitCrf
import graft.eval.SpanPRF1
import graft.io.ModelIO
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's command-line surface (main.py `--mode train/test`
  * and the commands shell scripts), Spark-first: a spark-submit-able
  * entry point over
  * the library so a reference user can run their workflows unchanged
  * in shape. Modes:
  *
  * {{{
  * fit   --train <conll> --out <modelDir> [--k 0.1] [--min-count 2]
  *       [--rare-max 2] [--lambda 0]          closed-form fit (seconds)
  * train --out <modelDir> [--epochs 300] [--lr 1.0] [--l2 3e-5]
  *       discriminative trainWords over the in-tree eng data
  * tag   [--model <modelDir>] --in <conll> --out <dir>
  *       decode + write `word NNP NP tag` prediction lines (main.py
  *       sink format); --model defaults to the shipped
  *       models/eng.fitted artifact
  * eval  [--model <modelDir>] --test <conll>  per-type + micro P/R/F1
  * kg    --corpus <sfDir with documents.parquet> --out <dir>
  *       [--authors <WL-xml dir>]   full KG pipeline → (subj, pred,
  *       obj) parquet; --authors feeds the DF-genre author→PER
  *       fix-up precedence (extract_authors.py input)
  * features --lang <amh|deu|eng|orm|som|tir> --in <one-sentence-per-
  *       line text> --out <dir> [--gaz [--gaz-csv <path>]]
  *       per-token segnerfts.extract parity rows (15-dim type/token,
  *       24-dim with --gaz's case-sensitive B/I/O match) → parquet
  * }}}
  *
  * All modes read/write CoNLL text or parquet; MISC maps to the GPE
  * slot as everywhere (FitEval.tagIdOf).
  */
object Cli {

  private def arg(args: Array[String], name: String): Option[String] = {
    val i = args.indexOf(name)
    // a following flag token is NOT a value: `tag --model --in x`
    // means --model is missing, not --model="--in"
    if (i >= 0 && i + 1 < args.length && !args(i + 1).startsWith("--"))
      Some(args(i + 1))
    else None
  }

  /** Required flag: usage error, not a bare NoSuchElementException. */
  private def req(args: Array[String], name: String): String =
    arg(args, name).getOrElse(
      sys.error(s"missing required flag $name <value>"))

  def session(): SparkSession = {
    val s = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER",
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Decode a CoNLL file under a fitted model → tagged token table
    * (sentId, tokenIdx, word, tag). */
  def tagFile(spark: SparkSession, model: FitCrf.FittedModel,
      path: String): DataFrame = {
    import spark.implicits._
    val sents = ConllOps.conllFileSentences(spark, path)
      .map(s => Sentence("cli", "in", s.sentId.toInt, s.words,
        Array.tabulate(s.words.length)(i => i),
        Array.tabulate(s.words.length)(i => i + 1)))
    FitCrf.tag(sents, model)
      .flatMap(ts => ts.tokens.indices.map(i =>
        (ts.sentIdx.toLong, i, ts.tokens(i), ts.tags(i))))
      .toDF("sentId", "tokenIdx", "word", "tag")
  }

  /** Write tagged tokens as the reference's prediction-line format —
    * one text file of `word\tNNP\tNP\ttag` lines in sentence/token
    * order (main.py:75-82 sink). */
  def writePredictions(tagged: DataFrame, out: String): Unit =
    graft.conll.Scans.conllSinkLines(tagged)
      .select("line")
      .coalesce(1).write.mode("overwrite").text(out)

  /** Span P/R/F1 of a fitted model on a gold CoNLL file: returns the
    * per-type frame (same shape as SpanPRF1.evaluate) and prints the
    * micro line. */
  def evalModel(spark: SparkSession, model: FitCrf.FittedModel,
      testPath: String): DataFrame = {
    import spark.implicits._
    val testSents = ConllOps.conllFileSentences(spark, testPath)
      .map(s => (s.sentId, s.words, s.tags.map(FitEval.tagIdOf)))
    val gold = FitEval.spansOf(testSents.map { case (id, words, tags) =>
      graft.core.TaggedSentence("eng", "test", id.toInt, words,
        Array.tabulate(words.length)(i => i),
        Array.tabulate(words.length)(i => i + 1),
        tags.map(Dict.tags))
    })
    val pred = FitEval.spansOf(
      FitCrf.tag(FitEval.toSentences(testSents), model))
    val perType = SpanPRF1.evaluate(pred, gold)
    val rows = perType.collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val tp = rows.map(_._1).sum.toDouble
    val fp = rows.map(_._2).sum
    val fn = rows.map(_._3).sum
    val p = tp / math.max(tp + fp, 1)
    val rc = tp / math.max(tp + fn, 1)
    val f1 = if (p + rc == 0) 0.0 else 2 * p * rc / (p + rc)
    println(f"micro P=$p%.4f R=$rc%.4f F1=$f1%.4f")
    perType
  }

  /** The per-language `segnerfts.extract` surface over
    * one-sentence-per-line text (setE whitespace scan shape,
    * data_loader.py:293-303): 15-dim type/token rows, or 24-dim with
    * the case-sensitive gazetteer B/I/O features when `gaz` is given. */
  def featuresFrame(spark: SparkSession, lang: String, in: String,
      gaz: Option[graft.core.LangDict.Gaz] = None): DataFrame = {
    import spark.implicits._
    val bGaz = spark.sparkContext.broadcast(gaz)
    spark.read.textFile(in).rdd.zipWithIndex()
      .toDF("line", "sentId").as[(String, Long)]
      .flatMap { case (line, sid) =>
        val toks = line.trim.split("\\s+").filter(_.nonEmpty)
        val rows = bGaz.value match {
          case Some(g) =>
            graft.features.LangFeatures.extractWithGaz(lang, toks, g)
          case None => graft.features.LangFeatures.extract(lang, toks)
        }
        toks.indices.map(i => (sid, i, toks(i), rows(i)))
      }
      .toDF("sentId", "tokenIdx", "token", "features")
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Cli <fit|train|tag|eval|kg> ...")
    val spark = session()
    args(0) match {
      case "fit" =>
        val trainPath = arg(args, "--train").getOrElse(FitEval.trainPath)
        val out = req(args, "--out")
        val model = FitCrf.fit(FitEval.labeled(spark, trainPath),
          k = arg(args, "--k").map(_.toDouble).getOrElse(0.1),
          minCount = arg(args, "--min-count").map(_.toLong).getOrElse(2L),
          rareMax = arg(args, "--rare-max").map(_.toLong).getOrElse(2L),
          lambda = arg(args, "--lambda").map(_.toFloat).getOrElse(0f))
        ModelIO.saveFitted(spark, model, out)
        println(s"fitted model (vocab ${model.wordW.size}) -> $out")
      case "train" =>
        val out = req(args, "--out")
        val model = FitEval.trainFullModel(spark,
          epochs = arg(args, "--epochs").map(_.toInt).getOrElse(300),
          lr = arg(args, "--lr").map(_.toDouble).getOrElse(1.0),
          l2 = arg(args, "--l2").map(_.toDouble).getOrElse(3e-5))
        ModelIO.saveFitted(spark, model, out)
        println(s"trained model (vocab ${model.wordW.size}) -> $out")
      case "tag" =>
        // default = the shipped in-repo artifact (ShipModel), so the
        // best trained model serves without --model or retraining
        val model = ModelIO.loadFitted(spark,
          arg(args, "--model").getOrElse(ShipModel.defaultPath))
        val out = req(args, "--out")
        writePredictions(tagFile(spark, model, req(args, "--in")),
          out)
        println(s"predictions -> $out")
      case "eval" =>
        val model = ModelIO.loadFitted(spark,
          arg(args, "--model").getOrElse(ShipModel.defaultPath))
        evalModel(spark, model, req(args, "--test"))
          .orderBy("tag").show(20, truncate = false)
      case "kg" =>
        val corpus = req(args, "--corpus")
        val out = req(args, "--out")
        // decode language (reference test_1 is language-generic);
        // defaults to eng, which keeps the historical behavior
        val lang = arg(args, "--lang").getOrElse("eng")
        require(graft.core.LangDict.langs.contains(lang),
          s"unknown --lang $lang (expect one of " +
            graft.core.LangDict.langs.mkString("/") + ")")
        // optional WL-XML author dir → lookupFixup's DF-genre
        // author→PER precedence (extract_authors.py input)
        val authors = arg(args, "--authors")
          .map(graft.pipeline.Pipeline.authorsFromXmlDir(spark, _))
          .getOrElse(Set.empty[String])
        import spark.implicits._
        graft.pipeline.Pipeline.triples(
          graft.core.Corpus.fromDocuments(spark, corpus)
            .as[graft.core.SourceFile], authors, lang)
          .write.mode("overwrite").partitionBy("pred").parquet(out)
        println(s"triples($lang) -> $out")
      case "features" =>
        // required, not defaulted: a mistyped flag must fail loudly
        // instead of silently emitting English features (ADVICE r4)
        val lang = req(args, "--lang")
        require(graft.core.LangDict.langs.contains(lang),
          s"unknown --lang $lang (expect one of " +
            graft.core.LangDict.langs.mkString("/") + ")")
        val out = req(args, "--out")
        val gaz =
          if (args.contains("--gaz"))
            Some(graft.core.LangDict.loadGaz(
              graft.core.LangDict.gazCsvRows(
                arg(args, "--gaz-csv")
                  .getOrElse("/root/reference/utils/gaz.csv")))(lang))
          else None
        featuresFrame(spark, lang, req(args, "--in"), gaz)
          .write.mode("overwrite").parquet(out)
        println(s"features($lang${if (gaz.isDefined) "+gaz" else ""})" +
          s" -> $out")
      case other => sys.error(s"unknown mode: $other")
    }
    spark.stop()
  }
}
