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
}
