package graft

import graft.crf.FitCrf
import graft.io.ModelIO

/** The CLI façade end-to-end: fit → save → load → tag → eval on a
  * real (small) CoNLL file — the workflow a reference user runs via
  * `main.py --mode train/test`, as library calls. */
class CliSpec extends SparkTestBase {

  private val testPath = FitEval.testPath
  private lazy val available = new java.io.File(testPath).exists()

  test("fit -> save -> load -> tag -> eval roundtrip on eng.test") {
    assume(available)
    val s = spark
    // fit on the (small) test file itself — the spec checks plumbing,
    // not generalization; EngModelSpec gates real train/test quality
    val model = FitCrf.fit(FitEval.labeled(spark, testPath),
      k = 0.1, minCount = 2, rareMax = 2, lambda = 0f)
    val dir = java.nio.file.Files.createTempDirectory("cli").toString
    ModelIO.saveFitted(spark, model, s"$dir/m")
    val loaded = ModelIO.loadFitted(spark, s"$dir/m")
    // tag writes the reference's prediction-line format — exercise the
    // ACTUAL write path (a multi-column frame through text() throws)
    val tagged = Cli.tagFile(spark, loaded, testPath)
    assert(tagged.count() > 40000) // eng.test tokens
    Cli.writePredictions(tagged, s"$dir/pred")
    val written = spark.read.text(s"$dir/pred").collect()
      .map(_.getString(0))
    assert(written.length > 40000)
    assert(written.take(5).forall(_.split('\t').length == 4))
    // eval on the fit file: train==test here, so F1 must be high —
    // this checks the whole serve+score path, not model quality
    val perType = Cli.evalModel(spark, loaded, testPath).collect()
    val tp = perType.map(_.getLong(1)).sum.toDouble
    val fp = perType.map(_.getLong(2)).sum
    val fn = perType.map(_.getLong(3)).sum
    val f1 = 2 * tp / (2 * tp + fp + fn)
    info(f"self-fit self-eval F1=$f1%.4f")
    assert(f1 >= 0.85, f"self-eval F1 $f1%.4f unexpectedly low")
  }

  test("the shipped artifact serves through the CLI default path " +
      "(tag without --model)") {
    assume(available)
    assume(new java.io.File(ShipModel.defaultPath).exists())
    val loaded = ModelIO.loadFitted(spark, ShipModel.defaultPath)
    assert(loaded.clusterW.nonEmpty) // the Brown block rode along
    val tagged = Cli.tagFile(spark, loaded, testPath)
    assert(tagged.filter("tag <> 'O'").count() > 3000)
  }

  test("missing required flag is a usage error, not a bare " +
      "NoSuchElementException; a flag token is never taken as a value") {
    val e = intercept[RuntimeException] {
      Cli.main(Array("kg", "--corpus")) // --corpus has no value
    }
    assert(e.getMessage.contains("missing required flag --corpus"))
    val e2 = intercept[RuntimeException] {
      // --out followed by another flag: NOT a value
      Cli.main(Array("kg", "--corpus", "/tmp/x", "--out", "--foo"))
    }
    assert(e2.getMessage.contains("missing required flag --out"))
  }

  test("features mode: segnerfts parity rows over line-per-sentence " +
      "text, 15-dim plain and 24-dim with gaz") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("clifeat")
    val in = dir.resolve("deu.txt")
    java.nio.file.Files.writeString(in,
      "Vereinigten Arabischen Republik\nHerr Schwarzwald\n")
    val plain = Cli.featuresFrame(spark, "deu", in.toString).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getSeq[Int](3)))
      .sortBy(x => (x._1, x._2))
    assert(plain.length == 5 && plain.forall(_._4.length == 15))
    // README golden, through the CLI path
    assert(plain(2)._3 == "Republik" &&
      plain(2)._4 == Seq(1, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0, 0))
    assert(plain(3)._4(graft.features.Features.TITLE) == 1)   // Herr
    assert(plain(4)._4(graft.features.Features.HEAD_LOC) == 1) // -wald
    val gaz: graft.core.LangDict.Gaz = Map(
      "GPE" -> Vector(Vector("Herr")), "LOC" -> Vector(),
      "ORG" -> Vector(), "PER" -> Vector())
    val withGaz =
      Cli.featuresFrame(spark, "deu", in.toString, Some(gaz)).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](3)))
        .sortBy(x => (x._1, x._2))
    assert(withGaz.forall(_._3.length == 24))
    assert(withGaz(3)._3(graft.features.Features.B_GAZ) == 1)
    assert(withGaz(4)._3(graft.features.Features.O_GAZ) == 1)
  }
}
