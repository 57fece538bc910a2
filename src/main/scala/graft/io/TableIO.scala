package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Iceberg-contract table layer over directory-partitioned Parquet
  * (SURVEY.md §7.4 — no Iceberg runtime jar ships offline, so the
  * contract is emulated; the interface is kept to read/writeStage so a
  * real Iceberg catalog is a drop-in via spark.sql.catalog.* config).
  *
  * Per stage write:
  *  - data under `<root>/<table>/` (optionally partitioned);
  *  - `_lineage.json` sidecar: snapshot id (caller-supplied content
  *    hash of the input), stage name, wall latency, total rows and
  *    per-partition row counts — the per-partition lineage + metrics
  *    the north rule requires;
  *  - idempotent resume: writeStage with a snapshot id that already
  *    committed is a no-op returning the stored table (checkpointed
  *    pipelines restart from the last finished stage).
  */
object TableIO {

  final case class Lineage(
      table: String, snapshot: String, rows: Long,
      latencyMs: Long, partitions: Map[String, Long])

  private def lineagePath(root: String, table: String) =
    Paths.get(root, table, "_lineage.json")

  /** Committed snapshot id of a table, if any. */
  def committedSnapshot(root: String, table: String): Option[String] = {
    val p = lineagePath(root, table)
    if (Files.exists(p)) {
      val s = Files.readString(p)
      "\"snapshot\"\\s*:\\s*\"([^\"]*)\"".r
        .findFirstMatchIn(s).map(_.group(1))
    } else None
  }

  def read(spark: SparkSession, root: String, table: String): DataFrame =
    spark.read.parquet(s"$root/$table")

  /** Content-derived snapshot id of an input corpus: order-independent
    * fold (sum of xxhash64) over the per-row sha256(content) invariant
    * column — the same input always resumes, any changed row forces
    * recompute (north rule: per-row sha256 invariant + resumability,
    * tied together). */
  def snapshotId(files: DataFrame): String = {
    import org.apache.spark.sql.functions._
    // decimal sum: a long sum overflows under ANSI mode at corpus scale
    val r = files
      .select(xxhash64(sha2(col("content"), 256))
        .cast("decimal(38,0)").as("h"))
      .agg(sum("h").as("s"), count(lit(1)).as("n"))
      .collect()(0)
    s"sha-${r.getDecimal(0).toBigInteger.toString(16)}-${r.getLong(1)}"
  }

  /** Write a pipeline stage. Returns the (re-)read table so downstream
    * stages consume the checkpoint, not the lineage-heavy plan. */
  def writeStage(df: DataFrame, root: String, table: String,
      snapshot: String, partitionCols: Seq[String] = Nil): DataFrame = {
    val spark = df.sparkSession
    if (committedSnapshot(root, table).contains(snapshot))
      return read(spark, root, table) // resume: stage already committed
    val t0 = System.nanoTime()
    val writer = df.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*)
     else writer).parquet(s"$root/$table")
    val written = read(spark, root, table)
    val partCounts: Map[String, Long] =
      if (partitionCols.nonEmpty)
        written.groupBy(partitionCols.map(col): _*).count()
          .collect()
          .map(r => (0 until partitionCols.size)
            .map(i => String.valueOf(r.get(i))).mkString("/") -> r.getLong(partitionCols.size))
          .toMap
      else Map("<unpartitioned>" -> written.count())
    val rows = partCounts.values.sum
    val latency = (System.nanoTime() - t0) / 1000000
    val parts = partCounts.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${k.replace("\"", "'")}": $v""" }
      .mkString("{", ", ", "}")
    Files.createDirectories(Paths.get(root, table))
    Files.writeString(lineagePath(root, table),
      s"""{"table": "$table", "snapshot": "$snapshot", "rows": $rows,
         | "latencyMs": $latency, "partitions": $parts}""".stripMargin)
    written
  }
}
