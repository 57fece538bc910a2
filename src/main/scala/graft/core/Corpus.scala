package graft.core

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic corpus (FIXTURES.md §A).
  *
  * Generates the engine's primary input table
  * `(repo, path, commit, lang, content)` (BASELINE.json input_hint) with
  * planted entity mentions drawn from [[Dict.gazetteer]], plus the golden
  * span side-output used by the e2e P/R gate (SURVEY.md §7.3). Pure
  * function of (seed, nFiles): generation is distributed (one seeded RNG
  * per row derived from the row index) so it scales with the cluster and
  * is partition-count independent.
  */
object Corpus {

  /** ~5% of repos own ~50% of files: quartic skew on a uniform draw
    * (FIXTURES.md repo rule) — exercises salting / AQE skew handling. */
  private def repoOf(rng: java.util.Random, nRepos: Int): Int = {
    val u = rng.nextDouble()
    math.min(nRepos - 1, (nRepos * u * u * u * u).toInt)
  }

  private val exts = Vector("scala", "java", "py", "md", "txt")

  final case class GoldenMention(
      repo: String, path: String, sentIdx: Int,
      start: Int, end: Int, text: String, tag: String)

  final case class Generated(file: SourceFile, golden: Seq[GoldenMention])

  /** Generate one file from its global index. Deterministic. */
  def genFile(idx: Long, seed: Long, nFiles: Long): Generated = {
    val rng = new java.util.Random(seed * 1000003L + idx * 2654435761L)
    val nRepos = math.max(4, (nFiles / 20L).toInt)
    val repoId = repoOf(rng, nRepos)
    val repo = f"org${repoId % 97}%03d/repo$repoId%04d"
    val ext = exts((idx % exts.size).toInt)
    val path = f"src/pkg${idx % 13}%02d/File$idx%06d.$ext"
    val nSents = 1 + rng.nextInt(12)
    val sb = new StringBuilder
    val golden = Vector.newBuilder[GoldenMention]
    var s = 0
    while (s < nSents) {
      if (sb.nonEmpty) sb.append('\n')
      val nWords = 3 + rng.nextInt(8)
      val entityAt =
        if (rng.nextDouble() < 0.6) 1 + rng.nextInt(nWords) else -1
      var w = 0
      var first = true
      while (w < nWords) {
        if (!first) sb.append(' ')
        if (w == entityAt) {
          val (toks, label) = Dict.gazetteer(rng.nextInt(Dict.gazetteer.size))
          val start = sb.length
          sb.append(toks.mkString(" "))
          golden += GoldenMention(repo, path, s, start, sb.length,
            toks.mkString(" "), label)
        } else {
          val f0 = Dict.filler(rng.nextInt(Dict.filler.size))
          sb.append(if (first) f0.capitalize else f0)
        }
        first = false
        w += 1
      }
      sb.append(" .")
      s += 1
    }
    val content = sb.toString
    val commit = Sha.hex(repo + path + idx).take(40)
    Generated(SourceFile(repo, path, commit, ext, content), golden.result())
  }

  /** Distributed corpus table. */
  def synthesize(spark: SparkSession, nFiles: Long, seed: Long = 42L)
      : Dataset[SourceFile] = {
    import spark.implicits._
    spark.range(0, nFiles, 1,
        math.max(1, math.min(64, nFiles / 64 + 1)).toInt)
      .as[Long].mapPartitions(_.map(i => genFile(i, seed, nFiles).file))
  }

  /** Golden planted mentions for the same (seed, nFiles). */
  def golden(spark: SparkSession, nFiles: Long, seed: Long = 42L)
      : Dataset[GoldenMention] = {
    import spark.implicits._
    spark.range(0, nFiles, 1,
        math.max(1, math.min(64, nFiles / 64 + 1)).toInt)
      .as[Long].flatMap(i => genFile(i, seed, nFiles).golden)
  }

  /** Derive the input-hint-shaped corpus from the driver-provided
    * `documents` table (TESTDATA.md) — used by Verify/Bench so all
    * correctness/throughput runs read the shared fixtures. Repo ids are
    * skewed (density ∝ id) to keep the salting path honest. content is
    * the document text verbatim (per-row sha256 invariant is computed
    * on it, never mutated). */
  def fromDocuments(spark: SparkSession, sfDir: String): DataFrame = {
    // the local fixture is a single small parquet file (1 split) — spread
    // it over the cores or the whole decode stage runs as one task; a
    // real corpus arrives pre-partitioned and skips this shuffle
    spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
      .select(
        concat(lit("repo"),
          floor(sqrt(pmod(col("doc_id") * 2654435761L, lit(1024))))
            .cast("string")).as("repo"),
        concat(lit("doc/"), col("source"), lit("/"),
          col("doc_id").cast("string"), lit(".txt")).as("path"),
        substring(sha2(concat(col("doc_id").cast("string"), col("text")),
          256), 1, 40).as("commit"),
        col("lang"),
        col("text").as("content"))
  }
}

/** Driver-side SHA-256 helper (the per-row invariant column uses Spark's
  * codegen'd `sha2` in plans; this is for generation/tests only). */
object Sha {
  def hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
}
