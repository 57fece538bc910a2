package graft.io

import graft.crf.Ensemble.Model
import org.apache.spark.sql.SparkSession

/** Model save/load as a Parquet artifact (replaces the reference's
  * DyNet model.save/populate, models/model_builder.py:30-43, and the
  * vocab pickle at utils/util.py:119-127): weights are rows
  * (matrix, row, values) — engine-readable, diffable, versionable.
  * Loaded driver-side and broadcast, as everywhere else. */
object ModelIO {

  def save(spark: SparkSession, model: Model, path: String): Unit = {
    import spark.implicits._
    val rows =
      model.emissions.zipWithIndex.map { case (r, i) =>
        ("emissions", i, r.toSeq)
      } ++ model.transitions.zipWithIndex.map { case (r, i) =>
        ("transitions", i, r.toSeq)
      }
    rows.toSeq.toDF("matrix", "row", "values")
      .repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  def load(spark: SparkSession, path: String): Model = {
    val rows = spark.read.parquet(path)
      .collect()
      .map(r => (r.getString(0), r.getInt(1),
        r.getSeq[Float](2).toArray))
    def mat(name: String) = rows.filter(_._1 == name)
      .sortBy(_._2).map(_._3)
    Model(mat("emissions"), mat("transitions"))
  }

  /** Persist a closed-form [[graft.crf.FitCrf.FittedModel]] (word and
    * shape dictionaries included) as one generic (matrix, key, values)
    * parquet — same diffable/versionable shape as [[save]]. */
  def saveFitted(spark: SparkSession, m: graft.crf.FitCrf.FittedModel,
      path: String): Unit = {
    import spark.implicits._
    val rows: Seq[(String, String, Seq[Float])] =
      m.featW.zipWithIndex.map { case (r, i) =>
        ("featW", i.toString, r.toSeq)
      }.toSeq ++
      m.trans.zipWithIndex.map { case (r, i) =>
        ("trans", i.toString, r.toSeq)
      } ++
      m.wordW.map { case (w, a) => ("word", w, a.toSeq) } ++
      m.shapeW.map { case (s, a) => ("shape", s.toString, a.toSeq) } ++
      m.clusters.map { case (w, c) => ("clusterOf", w, Seq(c.toFloat)) } ++
      m.clusterW.map { case (c, a) => ("clusterW", c.toString, a.toSeq) } ++
      Seq(("shapeDefault", "", m.shapeDefault.toSeq),
        ("lambda", "", Seq(m.lambda)))
    rows.toDF("matrix", "key", "values")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  def loadFitted(spark: SparkSession, path: String)
      : graft.crf.FitCrf.FittedModel = {
    val rows = spark.read.parquet(path).collect()
      .map(r => (r.getString(0), r.getString(1),
        r.getSeq[Float](2).toArray))
    def mat(name: String) = rows.filter(_._1 == name)
      .sortBy(_._2.toInt).map(_._3)
    graft.crf.FitCrf.FittedModel(
      mat("featW"),
      rows.filter(_._1 == "word").map(r => r._2 -> r._3).toMap,
      rows.filter(_._1 == "shape").map(r => r._2.toInt -> r._3).toMap,
      rows.find(_._1 == "shapeDefault").get._3,
      mat("trans"),
      rows.find(_._1 == "lambda").get._3(0),
      // absent in pre-cluster artifacts → empty maps (back-compat)
      rows.filter(_._1 == "clusterOf")
        .map(r => r._2 -> r._3(0).toInt).toMap,
      rows.filter(_._1 == "clusterW")
        .map(r => r._2.toInt -> r._3).toMap)
  }
}
