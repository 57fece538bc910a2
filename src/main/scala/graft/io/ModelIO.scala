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
}
