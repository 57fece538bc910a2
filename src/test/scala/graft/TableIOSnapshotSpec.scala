package graft

import graft.conll.ConllOps
import graft.core.Corpus
import graft.io.TableIO
import org.apache.spark.sql.functions._

class TableIOSnapshotSpec extends SparkTestBase {

  test("content-derived snapshot id: order-independent, change-sensitive") {
    val a = Corpus.synthesize(spark, 40).toDF()
    val id1 = TableIO.snapshotId(a)
    val id2 = TableIO.snapshotId(a.repartition(7)) // different order
    assert(id1 == id2)
    val changed = a.withColumn("content",
      when(col("path").endsWith(".md"),
        concat(col("content"), lit("x"))).otherwise(col("content")))
    assert(TableIO.snapshotId(changed) != id1)
  }

  test("embedding lookup uses exact first, lowercase fallback second " +
      "(util.py:97-110)") {
    val s = spark
    import s.implicits._
    val emb = Seq(
      ("Paris", Seq(1.0, 0.0)),
      ("paris", Seq(0.5, 0.5)),
      ("tokyo", Seq(0.0, 1.0))).toDF("word", "vec")
    val vocab = Seq("Paris", "Tokyo", "unknown").toDF("word")
    val got = ConllOps.embeddingLookup(vocab, emb)
      .collect().map(r => r.getString(0) ->
        (Option(r.getSeq[Double](1)), r.getBoolean(2))).toMap
    assert(got("Paris") == (Some(Seq(1.0, 0.0)), false)) // exact wins
    assert(got("Tokyo") == (Some(Seq(0.0, 1.0)), true))  // fallback
    assert(got("unknown")._1.isEmpty)
  }
}
