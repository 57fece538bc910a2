package graft

import graft.core.{Corpus, Dict, SourceFile}
import graft.io.TableIO
import graft.pipeline.Pipeline
import org.apache.spark.sql.functions._

class TriplesSpec extends SparkTestBase {

  test("e2e triples: same-entity mentions canonicalize to one subject") {
    val s = spark
    import s.implicits._
    val files = Corpus.synthesize(spark, 100)
    val triples = Pipeline.triples(files).cache()
    assert(triples.count() > 0)
    // every linked dictionary entity resolves to exactly one subject:
    // sameAs obj (KB id) ↔ subj must be 1:1
    val fanout = triples.filter(col("pred") === "sameAs")
      .groupBy("obj").agg(countDistinct("subj").as("n"))
      .filter(col("n") > 1).count()
    assert(fanout == 0, "a KB id split across canonical subjects")
    // hasType per subject is unique (type-gated node keys)
    val multiType = triples.filter(col("pred") === "hasType")
      .groupBy("subj").agg(countDistinct("obj").as("n"))
      .filter(col("n") > 1).count()
    assert(multiType == 0)
    triples.unpersist()
  }

  test("triples P/R vs reference-semantics golden >= 0.95 (BASELINE gate)") {
    val s = spark
    import s.implicits._
    val n = 150
    val files = Corpus.synthesize(spark, n)
    // golden triples: derived from planted mentions + the dictionary —
    // the reference-semantics expectation (SURVEY.md §7.3)
    val golden = Corpus.golden(spark, n)
      .collect()
      .flatMap { g =>
        val subj = s"m:${g.tag}:${g.text.toLowerCase}"
        val entry = Dict.gazetteer.zipWithIndex.find { case ((t, l), _) =>
          t.mkString(" ").equalsIgnoreCase(g.text) && l == g.tag
        }
        val canonical = entry.map { case (_, id) => s"e:${Dict.kbId(id)}" }
          .map(e => if (e < subj) e else subj).getOrElse(subj)
        Seq((canonical, "hasType", g.tag),
          (canonical, "mentionedIn", s"${g.repo}/${g.path}")) ++
          entry.map { case (_, id) => (canonical, "sameAs", Dict.kbId(id)) }
      }.toSet
    val got = Pipeline.triples(files)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .filter(_._2 != "label").toSet
    val tp = (got intersect golden).size.toDouble
    val p = tp / got.size
    val r = tp / golden.size
    info(f"triple precision=$p%.4f recall=$r%.4f")
    assert(p >= 0.95 && r >= 0.95, f"P=$p%.3f R=$r%.3f")
  }

  test("checkpointed pipeline resumes and writes lineage sidecars") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_ckpt").toString
    val files = Corpus.synthesize(spark, 40)
    val t1 = Pipeline.triplesCheckpointed(files, root, "snap1")
      .orderBy("subj", "pred", "obj").collect()
    // lineage sidecars exist with rows recorded
    val lin = TableIO.committedSnapshot(root, "triples")
    assert(lin.contains("snap1"))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "mentions_raw", "_lineage.json")))
    // resume: same snapshot → identical output (read from checkpoint)
    val t2 = Pipeline.triplesCheckpointed(files, root, "snap1")
      .orderBy("subj", "pred", "obj").collect()
    assert(t1.map(_.toString).toSeq == t2.map(_.toString).toSeq)
  }

  test("checkpointed pipeline routes lang: orm checkpoints == direct " +
      "routed triples, and resume still holds") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_ckpt_orm").toString
    val g = graft.core.LangDict.loadGaz(graft.core.LangDict.gazCsvRows())
    val files = Queries8.eligibleLangSents(g)
      .collect { case ("orm", sid, toks) =>
        graft.core.SourceFile("orm", f"orm/$sid%05d.txt", "c0", "orm",
          toks.mkString(" "))
      }.take(30).toDS()
    val ckpt = Pipeline.triplesCheckpointed(files, root, "snapO", "orm")
      .orderBy("subj", "pred", "obj").collect().map(_.toString).toSeq
    val direct = Pipeline.triples(files, lang = "orm")
      .orderBy("subj", "pred", "obj").collect().map(_.toString).toSeq
    assert(ckpt == direct && ckpt.nonEmpty)
    // language-scoped ids flowed through the checkpointed link stage
    assert(ckpt.exists(_.contains("orm:Q")))
    val again = Pipeline.triplesCheckpointed(files, root, "snapO", "orm")
      .orderBy("subj", "pred", "obj").collect().map(_.toString).toSeq
    assert(again == ckpt)
  }

  test("post-processing does not damage e2e golden P/R") {
    val s = spark
    import s.implicits._
    val files = Corpus.synthesize(spark, 100)
    val pred = Pipeline.postProcessed(files)
      .map(m => (m.repo, m.path, m.sentIdx, m.start, m.end, m.tag))
      .collect().toSet
    val gold = Corpus.golden(spark, 100)
      .map(g => (g.repo, g.path, g.sentIdx, g.start, g.end, g.tag))
      .collect().toSet
    val tp = (pred intersect gold).size.toDouble
    assert(tp / pred.size >= 0.95 && tp / gold.size >= 0.95)
  }
}
