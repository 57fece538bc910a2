package graft

import graft.conll.{ConllFixture, ConllOps}
import graft.functions.RollingHash
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fourth batch: reference file-format operators over the inline CoNLL
  * fixture (the oracle receives the identical lines as a VALUES list),
  * plus the native codegen'd rolling-hash expression. */
object Queries4 {

  private def fixtureValues: String = ConllFixture.lines.zipWithIndex
    .map { case (l, i) => s"($i, '${l.replace("'", "''")}')" }
    .mkString(", ")

  /** Shared oracle CTE: the CoNLL scan in SQL (blank-line running sum
    * sessionizer, fields[0]/[-1]). */
  private[graft] def conllCte: String =
    s"""raw(lineno, line) AS (VALUES $fixtureValues),
       |scan AS (
       |  SELECT sentId,
       |    row_number() OVER (PARTITION BY sentId ORDER BY lineno) - 1
       |      AS tokenIdx,
       |    f[1] AS word, f[2] AS pos, f[3] AS chunk, f[-1] AS tag
       |  FROM (
       |    SELECT lineno, string_split_regex(trim(line), '\\s+') AS f,
       |      CAST(sum(CASE WHEN trim(line) = '' THEN 1 ELSE 0 END)
       |        OVER (ORDER BY lineno ROWS UNBOUNDED PRECEDING) AS BIGINT)
       |        AS sentId,
       |      trim(line) = '' AS isBlank
       |    FROM raw)
       |  WHERE NOT isBlank)""".stripMargin

  private def q30(s: SparkSession, dir: String): DataFrame =
    ConllOps.conllScan(ConllOps.conllFixture(s))
      .orderBy("sentId", "tokenIdx")

  private def o30: String =
    s"""WITH $conllCte
       |SELECT sentId, tokenIdx, word, pos, chunk, tag
       |FROM scan ORDER BY sentId, tokenIdx""".stripMargin

  private def q31(s: SparkSession, dir: String): DataFrame =
    ConllOps.io2bio(ConllOps.conllScan(ConllOps.conllFixture(s)))
      .select("sentId", "tokenIdx", "word", "bio")
      .orderBy("sentId", "tokenIdx")

  private[graft] val bioSql =
    """CASE WHEN tag LIKE 'I-%' AND (prevTag IS NULL OR prevTag = 'O'
      |    OR substr(prevTag, 3) <> substr(tag, 3))
      |  THEN 'B-' || substr(tag, 3) ELSE tag END""".stripMargin

  private def o31: String =
    s"""WITH $conllCte,
       |lagged AS (
       |  SELECT *, lag(tag) OVER (PARTITION BY sentId ORDER BY tokenIdx)
       |    AS prevTag
       |  FROM scan)
       |SELECT sentId, tokenIdx, word, $bioSql AS bio
       |FROM lagged ORDER BY sentId, tokenIdx""".stripMargin

  private def q32(s: SparkSession, dir: String): DataFrame = {
    val bio = ConllOps.io2bio(ConllOps.conllScan(ConllOps.conllFixture(s)))
      .select(col("sentId"), col("tokenIdx"), col("word"),
        col("bio").as("tag"))
    ConllOps.bio2bioes(bio)
      .select("sentId", "tokenIdx", "word", "bioes")
      .orderBy("sentId", "tokenIdx")
  }

  private def o32: String =
    s"""WITH $conllCte,
       |lagged AS (
       |  SELECT *, lag(tag) OVER (PARTITION BY sentId ORDER BY tokenIdx)
       |    AS prevTag
       |  FROM scan),
       |bio AS (
       |  SELECT sentId, tokenIdx, word, $bioSql AS tag
       |  FROM lagged),
       |led AS (
       |  SELECT *, lead(tag) OVER (PARTITION BY sentId ORDER BY tokenIdx)
       |    AS nextTag
       |  FROM bio)
       |SELECT sentId, tokenIdx, word,
       |  CASE WHEN tag = 'O' THEN 'O'
       |    WHEN tag LIKE 'B-%' AND nextTag LIKE 'I-%'
       |      AND substr(nextTag, 3) = substr(tag, 3) THEN tag
       |    WHEN tag LIKE 'B-%' THEN 'S-' || substr(tag, 3)
       |    WHEN tag LIKE 'I-%' AND nextTag LIKE 'I-%'
       |      AND substr(nextTag, 3) = substr(tag, 3) THEN tag
       |    ELSE 'E-' || substr(tag, 3) END AS bioes
       |FROM led ORDER BY sentId, tokenIdx""".stripMargin

  /** Brown-cluster densification over an inline fixture. */
  private val brownRows = Seq(
    ("0010", "apple", 5L), ("0010", "pear", 3L), ("10", "bank", 9L),
    ("0001", "run", 2L), ("111", "the", 100L), ("110", "dog", 7L))

  private def q33(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    ConllOps.brownClusters(brownRows.toDF("bits", "word", "freq"))
      .orderBy("word")
  }

  private def o33: String = {
    val vals = brownRows.map { case (b, w, f) => s"('$b', '$w', $f)" }
      .mkString(", ")
    // DuckDB has no conv(): fold the bit chars (identical result)
    s"""WITH raw(bits, word, freq) AS (VALUES $vals),
       |ids AS (
       |  SELECT word, list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    list_transform(string_split(bits, ''),
       |      ch -> CAST(CASE WHEN ch = '1' THEN 1 ELSE 0 END AS BIGINT))),
       |    (a, x) -> a * 2 + x) AS rawId
       |  FROM raw)
       |SELECT word,
       |  CAST(dense_rank() OVER (ORDER BY rawId) AS INT) - 1 AS clusterId
       |FROM ids ORDER BY word""".stripMargin
  }

  /** Byte-exact DARPA-EDL records from rule-derived mentions over the
    * shared documents table (post_process.py:29-33 format). */
  private def q34(s: SparkSession, dir: String): DataFrame = {
    val mentions = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("idx", "word")))
      .filter(col("word").isin("spark", "customer"))
      .select(concat(lit("DOC_"), col("doc_id")).as("doc"),
        col("idx").as("start"), (col("idx") + 1).as("end"),
        col("word").as("text"),
        when(col("word") === "spark", "ORG").otherwise("PER").as("tag"))
    ConllOps.edlRecords(mentions, "GRAFT_EDL")
  }

  private def o34: String =
    """SELECT 'GRAFT_EDL' || chr(9) || doc || '-ann-' || n || chr(9) ||
      |  text || chr(9) || doc || ':' || start || '-' || "end" ||
      |  chr(9) || 'NIL' || chr(9) || tag || chr(9) || 'NAM' || chr(9)
      |  || '1.0' AS record
      |FROM (
      |  SELECT *, row_number() OVER (PARTITION BY doc
      |    ORDER BY start, "end") AS n
      |  FROM (
      |    SELECT 'DOC_' || doc_id AS doc, i - 1 AS start, i AS "end",
      |      w[i] AS text,
      |      CASE WHEN w[i] = 'spark' THEN 'ORG' ELSE 'PER' END AS tag
      |    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |         LATERAL (SELECT unnest(generate_series(1, len(w))) AS i)
      |    WHERE w[i] IN ('spark', 'customer')))
      |ORDER BY record""".stripMargin

  /** Native codegen'd rolling-hash expression — same oracle hash as the
    * column-math q21 (proves the custom Expression's semantics). */
  private def q35(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        RollingHash.rolling_hash(col("text")).as("fp_native"))
      .orderBy("doc_id")

  private def o35: String = {
    val M = graft.text.TextOps.M
    s"""SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(string_split(text, ''),
       |    ch -> CAST(ascii(ch) AS BIGINT))),
       |  (acc, x) -> (acc * 31 + x) % $M) AS fp_native
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Oromo normalization — oracled since round 3. RE2 has no
    * backreferences, but the two backref rules unroll into literal
    * per-letter passes: doubled-vowel collapse → 5 replaces, doubled
    * consonant (incl. digraphs) → one replace per alternation member
    * in the reference's order. Single-pass-regex vs sequential-pass
    * equivalence holds on every realizable corpus token (validated on
    * the full vocab; a corpus word where a replacement manufactures a
    * new double — e.g. `cchch` — would fail the gate loudly). The
    * remaining rules (captures, \\b) are RE2-native. Golden parity vs
    * the reference also lives in ConllOpsSpec. */
  private def q36(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w")).distinct()
      .select(col("w"), ConllOps.ormNormalize(col("w")).as("norm"))
      .orderBy("w")

  private def o36: String = {
    val cons = ConllOps.ormConsonants
    var e = "lower(w)"
    def rep(p: String, r: String): Unit =
      e = s"regexp_replace($e, '$p', '$r', 'g')"
    "aeiou".foreach(v => rep(s"$v$v", s"$v"))
    cons.foreach(c => rep(s"$c$c", c))
    rep("ph", "p"); rep("q", "k"); rep("x", "t")
    rep("c([^h]|\\b)", "ch\\1")
    rep("ai", "ayi")
    rep(s"s(${cons.mkString("|")})", "f\\1")
    s"""WITH w AS (
       |  SELECT DISTINCT unnest(string_split(text, ' ')) AS w
       |  FROM documents),
       |n AS (SELECT w, $e AS n FROM w)
       |SELECT w, CASE
       |  WHEN regexp_matches(w, '^[[:upper:]]+$$') THEN w
       |  WHEN regexp_matches(w, '^[[:upper:]][[:lower:]]*$$')
       |    THEN upper(substr(n, 1, 1)) || substr(n, 2)
       |  ELSE n END AS norm
       |FROM n ORDER BY w""".stripMargin
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_conll_scan" -> (q30 _),
    "q31_io2bio" -> (q31 _),
    "q32_bio2bioes" -> (q32 _),
    "q33_brown_clusters" -> (q33 _),
    "q34_edl_records" -> (q34 _),
    "q35_native_rolling_hash" -> (q35 _),
    "q36_orm_normalize" -> (q36 _))

  val oracles: Map[String, String] = Map(
    "q30_conll_scan" -> o30,
    "q31_io2bio" -> o31,
    "q32_bio2bioes" -> o32,
    "q33_brown_clusters" -> o33,
    "q34_edl_records" -> o34,
    "q35_native_rolling_hash" -> o35,
    "q36_orm_normalize" -> o36)
}
