package graft

import graft.core.{Corpus, Dict}
import graft.pipeline.Pipeline
import org.apache.spark.sql.functions._

/** End-to-end golden gate (SURVEY.md §7.3 / BASELINE.json metric):
  * mention P/R ≥ 0.95 vs the generator's planted golden spans on the
  * deterministic synthetic corpus, plus the per-row sha256(content)
  * invariant and partition-count independence. */
class PipelineSpec extends SparkTestBase {

  test("e2e mention detection P/R >= 0.95 vs golden on 200 files") {
    val s = spark
    import s.implicits._
    val files = Corpus.synthesize(spark, 200)
    val pred = Pipeline.mentions(files)
      .map(m => (m.repo, m.path, m.sentIdx, m.start, m.end, m.tag))
      .collect().toSet
    val gold = Corpus.golden(spark, 200)
      .map(g => (g.repo, g.path, g.sentIdx, g.start, g.end, g.tag))
      .collect().toSet
    val tp = (pred intersect gold).size.toDouble
    val p = tp / pred.size
    val r = tp / gold.size
    info(f"precision=$p%.4f recall=$r%.4f tp=${tp.toInt} pred=${pred.size} gold=${gold.size}")
    assert(p >= 0.95, f"precision $p%.4f < 0.95")
    assert(r >= 0.95, f"recall $r%.4f < 0.95")
  }

  test("per-row sha256(content) invariant survives the pipeline") {
    val files = Corpus.synthesize(spark, 50).toDF()
      .withColumn("sha256", sha2(col("content"), 256))
    files.cache()
    val before = files.select("repo", "path", "sha256")
    // run the pipeline, then re-read content from the (untouched) input
    val after = files.select(col("repo"), col("path"),
      sha2(col("content"), 256).as("sha2b"))
    val joined = before.join(after, Seq("repo", "path"))
    assert(joined.filter(col("sha256") =!= col("sha2b")).count() == 0)
    assert(before.count() == 50)
    files.unpersist()
  }

  test("partition-count independence: same mentions at 1 vs 8 partitions") {
    val s = spark
    import s.implicits._
    val f1 = Corpus.synthesize(spark, 60).repartition(1)
    val f8 = Corpus.synthesize(spark, 60).repartition(8)
    val m1 = Pipeline.mentions(f1)
      .map(m => (m.repo, m.path, m.sentIdx, m.start, m.end, m.text, m.tag))
      .collect().toSet
    val m8 = Pipeline.mentions(f8)
      .map(m => (m.repo, m.path, m.sentIdx, m.start, m.end, m.text, m.tag))
      .collect().toSet
    assert(m1 == m8)
    assert(m1.nonEmpty)
  }

  test("documents-derived corpus yields mentions (bench path is live)") {
    val dir = "/root/testdata/sf0.001"
    if (new java.io.File(dir).exists()) {
      val s = spark
      import s.implicits._
      val corpus = Corpus.fromDocuments(spark, dir)
        .as[graft.core.SourceFile]
      val n = Pipeline.mentions(corpus).count()
      info(s"mentions on sf0.001 documents: $n")
      assert(n > 0)
    }
  }

  test("tag id space is canonical (sorted) and O-terminal") {
    assert(Dict.tags == Dict.tags.sorted)
    assert(Dict.tags.last == "O")
    assert(Dict.K == 9)
  }

  test("authorsFromXmlDir: WL files on disk → author set → PER " +
      "precedence reachable through Pipeline (VERDICT r2 polish)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-authors")
    try {
      java.nio.file.Files.write(dir.resolve("SN_WL_0001.xml"),
        ("<doc id=\"SN_WL_0001\">\n" +
          "<post type=\"post\" id=\"p1\">\n" +
          "<attribute name=\"author\" value=\"alice w\"/>\n" +
          "</post>\n</doc>\n").getBytes("UTF-8"))
      java.nio.file.Files.write(dir.resolve("SN_NW_0002.xml"),
        ("<doc id=\"SN_NW_0002\">\n" +
          "<post type=\"post\" id=\"p1\">\n" +
          "<attribute name=\"author\" value=\"carol\"/>\n" +
          "</post>\n</doc>\n").getBytes("UTF-8"))
      val got = graft.pipeline.Pipeline.authorsFromXmlDir(
        spark, dir.toString)
      // WL author in; NW genre-excluded (extract_authors.py WL filter)
      assert(got == Set("alice w"))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(dir).iterator().asScala
        .foreach(java.nio.file.Files.delete)
      java.nio.file.Files.delete(dir)
    }
  }
}
