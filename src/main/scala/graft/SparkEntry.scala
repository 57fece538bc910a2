package graft

import graft.core.{Corpus, SourceFile}
import graft.pipeline.Pipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator from SURVEY.md §2, run against
  * the driver-provided parquet tables under `sfDir` (TESTDATA.md).
  * Every SQL-expressible entry has a DuckDB oracle in [[oracleSql]]
  * producing identical column names (the driver hash-compares after
  * sorting columns by name). Non-relational kernels (Viterbi decode,
  * greedy post-processing) are rows-only entries.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: end-to-end mention
    * detection over the documents-derived corpus. */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val corpus = Corpus.fromDocuments(spark, "/root/testdata/sf0.001")
      .as[SourceFile]
    Pipeline.mentions(corpus).toDF()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all ++ Queries2.all ++ Queries3.all ++ Queries4.all ++
      Queries5.all ++ Queries6.all ++ Queries7.all ++ Queries8.all ++
      Queries9.all ++ Queries10.all

  def oracleSql: Map[String, String] = Queries.oracles ++ Queries2.oracles ++
    Queries3.oracles ++ Queries4.oracles ++ Queries5.oracles ++
    Queries6.oracles ++ Queries7.oracles ++ Queries8.oracles ++
    Queries9.oracles ++ Queries10.oracles
}
