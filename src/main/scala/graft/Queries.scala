package graft

import graft.core.{Corpus, SourceFile}
import graft.pipeline.Pipeline
import graft.spans.Spans
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The operator inventory (SURVEY.md §2) exposed as driver-checkable
  * queries over the shared parquet fixtures (TESTDATA.md).
  *
  * Conventions (driver compare = per-column value hash after sorting
  * columns by name):
  *  - every computed column aliased identically in Spark and DuckDB;
  *  - deterministic ORDER BY everywhere;
  *  - doubles rounded (4dp) or cast to bigint when integral;
  *  - `doc(dir, spark)` etc. read the same parquet the oracle reads.
  */
object Queries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** documents exploded to (doc_id, idx, word) — shared base for the
    * text-side relational operators. */
  private def words(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("idx", "word")))

  // ---- §2.4 aggregations -------------------------------------------

  /** Word-frequency vocab build (data_loader.py:132-158). */
  private def q01(s: SparkSession, dir: String): DataFrame =
    words(s, dir).groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("word")

  private val o01 =
    """SELECT word, count(*) AS cnt
      |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |GROUP BY word ORDER BY word""".stripMargin

  /** Contiguous canonical id assignment (data_loader.py:107-130,
    * nondeterministic dict order replaced by sorted order — SURVEY §1.4).
    * id 0 reserved for padding => ids start at 1 (data_loader.py:58-64). */
  private def q02(s: SparkSession, dir: String): DataFrame =
    vocabIds(words(s, dir)).orderBy("word")

  /** Scale-safe canonical vocab ids (r5 verdict #3): the old
    * `row_number().over(Window.orderBy("word"))` moved the WHOLE
    * distinct vocabulary through ONE partition (WindowExec warns; at
    * 10^8–10^9 distinct words that single-partition sort is a straight
    * scale-killer). Replacement: range-partitioned global sort +
    * per-partition prefix-sum offsets — `zipWithIndex` runs one
    * lightweight partition-size count job, then stamps contiguous
    * indexes without any single-partition exchange. Ids are identical
    * (contiguous 1..N in lexicographic word order; the sort is total
    * because words are distinct, so ids are deterministic regardless
    * of partition boundaries). Kept `int` to preserve the declared
    * schema of row_number; the id space holds to 2^31 — at a larger
    * vocabulary widen to long alongside the oracle. */
  private[graft] def vocabIds(wordRows: DataFrame): DataFrame = {
    val spark = wordRows.sparkSession
    import spark.implicits._
    wordRows.select("word").distinct().orderBy("word")
      .as[String].rdd.zipWithIndex()
      .map { case (w, i) => (w, (i + 1).toInt) }
      .toDF("word", "id")
  }

  private val o02 =
    """SELECT word, row_number() OVER (ORDER BY word) AS id
      |FROM (SELECT DISTINCT unnest(string_split(text, ' ')) AS word
      |      FROM documents)
      |ORDER BY word""".stripMargin

  /** Character vocabulary (data_loader.py:97-99). */
  private def q03(s: SparkSession, dir: String): DataFrame =
    words(s, dir)
      .select(explode(split(col("word"), "")).as("ch"))
      .filter(col("ch") =!= "")
      .distinct().orderBy("ch")

  private val o03 =
    """SELECT DISTINCT ch FROM (
      |  SELECT unnest(string_split(word, '')) AS ch FROM (
      |    SELECT unnest(string_split(text, ' ')) AS word FROM documents))
      |WHERE ch <> '' ORDER BY ch""".stripMargin

  /** n-gram frequency + deterministic top-K (post_process.py:161-179,
    * 294; tie-break pinned to (count desc, ngram asc) — SURVEY §2.6). */
  private def q04(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(explode(expr(
        "transform(sequence(0, greatest(size(w)-3, -1)), " +
          "i -> concat_ws(' ', w[i], w[i+1], w[i+2]))")).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("ngram")).limit(20)

  private val o04 =
    """SELECT ngram, count(*) AS cnt FROM (
      |  SELECT unnest([array_to_string(w[i:i+2], ' ')
      |                 for i in generate_series(1, len(w)-2)]) AS ngram
      |  FROM (SELECT string_split(text, ' ') AS w FROM documents))
      |GROUP BY ngram ORDER BY cnt DESC, ngram ASC LIMIT 20""".stripMargin

  // ---- input-hint invariant ----------------------------------------

  /** Per-row sha256(content) invariant column (BASELINE.json input_hint). */
  private def q05(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), sha2(col("text"), 256).as("sha"))
      .orderBy("doc_id")

  private val o05 =
    "SELECT doc_id, sha256(text) AS sha FROM documents ORDER BY doc_id"

  // ---- §2.7 window / sequence ops ----------------------------------

  /** BIO→span extraction as a window FSM (Convert_to_darpa_xml.py:15-94;
    * SURVEY §2.7). Tags derived deterministically from the shared token
    * table (B/I/orphan-I all exercised). */
  def tagRuleSql(c: String): String =
    s"""CASE WHEN $c = 'hash' THEN 'B-ORG' WHEN $c = 'join' THEN 'I-ORG'
       | WHEN $c = 'key' THEN 'B-GPE' WHEN $c = 'value' THEN 'I-GPE'
       | WHEN $c = 'spark' THEN 'B-PER' ELSE 'O' END""".stripMargin

  private def q06(s: SparkSession, dir: String): DataFrame = {
    val tok = words(s, dir)
      .select(col("doc_id").as("doc"), lit(0).as("sent"), col("idx"),
        col("word").as("token"), col("idx").as("start"),
        col("idx").as("end"), expr(tagRuleSql("word")).as("tag"))
    Spans.fromTokenTable(tok)
      .select(col("doc"), col("start"), col("end"), col("tag"), col("text"))
      .orderBy("doc", "start")
  }

  private val o06 =
    s"""WITH tok AS (
       |  SELECT doc_id AS doc, idx, word AS token,
       |         ${tagRuleSql("word")} AS tag
       |  FROM (SELECT doc_id, unnest(string_split(text,' ')) AS word,
       |               generate_subscripts(string_split(text,' '), 1) - 1 AS idx
       |        FROM documents)),
       |fsm AS (
       |  SELECT *, CASE WHEN tag = 'O' THEN NULL ELSE substr(tag, 3) END AS typ,
       |    lag(CASE WHEN tag = 'O' THEN NULL ELSE substr(tag, 3) END)
       |      OVER (PARTITION BY doc ORDER BY idx) AS prevTyp
       |  FROM tok),
       |marked AS (
       |  SELECT *, CASE WHEN typ IS NOT NULL AND (substr(tag,1,1) = 'B'
       |      OR prevTyp IS NULL OR prevTyp <> typ) THEN 1 ELSE 0 END AS isStart
       |  FROM fsm),
       |sp AS (
       |  SELECT *, sum(isStart) OVER (PARTITION BY doc ORDER BY idx
       |    ROWS UNBOUNDED PRECEDING) AS spanId
       |  FROM marked WHERE typ IS NOT NULL)
       |SELECT doc, min(idx) AS start, max(idx) AS "end", min(typ) AS tag,
       |       string_agg(token, ' ' ORDER BY idx) AS text
       |FROM sp GROUP BY doc, spanId ORDER BY doc, start""".stripMargin

  // ---- classic relational (scan → filter → agg → join → sort) ------

  /** Pushdown-friendly scan+agg (TPC-H Q1 shape; SURVEY §2.4). */
  private def q07(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") < lit("1998-09-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity")).cast("bigint").as("sum_qty"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag", "l_linestatus")

  private val o07 =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  count(*) AS cnt
      |FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-09-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Broadcast-dimension join chain customer→nation→region + agg
    * (the reference's joins are all small-dim lookups — SURVEY §2.5). */
  private def q08(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("c_acctbal")), 2).as("bal"))
      .orderBy("r_name")

  private val o08 =
    """SELECT r_name, count(*) AS cnt, round(sum(c_acctbal), 2) AS bal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  /** Gap-based sessionization (the CoNLL blank-line sessionizer pattern,
    * data_loader.py:243-258, applied to the events table). */
  private def q09(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t(s, dir, "events")
      .withColumn("prev", lag(unix_timestamp(col("ts")), 1).over(w))
      .withColumn("newSess",
        (col("prev").isNull ||
          unix_timestamp(col("ts")) - col("prev") > 1800).cast("int"))
      .groupBy("user_id")
      .agg(sum("newSess").as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  private val o09 =
    """SELECT user_id, CAST(sum(newSess) AS BIGINT) AS n_sessions,
      |  count(*) AS n_events
      |FROM (
      |  SELECT user_id, CASE WHEN prev IS NULL
      |      OR epoch(ts) - prev > 1800 THEN 1 ELSE 0 END AS newSess
      |  FROM (SELECT user_id, ts, lag(epoch(ts)) OVER
      |          (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |        FROM events))
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---- the non-relational kernels (rows-only checks) ---------------

  /** Full mention detection: segment → featurize → Viterbi → spans over
    * the documents-derived corpus (SURVEY §2.8, §3.1). Oracled since
    * round 3 (Queries7.o50): the overlap-resolution behavior of the
    * fitted decoder is token-local on this corpus's realizable match
    * configurations (OverlapDecodeSpec), which makes the FULL decode
    * SQL-expressible — not just the non-overlapping q55 subset. */
  private def q50(s: SparkSession, dir: String): DataFrame =
    Queries7.mentionsV(s, dir)
      .orderBy("repo", "path", "sentIdx", "start")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_vocab_count" -> (q01 _),
    "q02_vocab_ids" -> (q02 _),
    "q03_char_vocab" -> (q03 _),
    "q04_ngram_top20" -> (q04 _),
    "q05_sha256_invariant" -> (q05 _),
    "q06_bio_spans" -> (q06 _),
    "q07_scan_agg" -> (q07 _),
    "q08_dim_join" -> (q08 _),
    "q09_sessionize" -> (q09 _),
    "q50_viterbi_mentions" -> (q50 _))

  val oracles: Map[String, String] = Map(
    "q01_vocab_count" -> o01,
    "q02_vocab_ids" -> o02,
    "q03_char_vocab" -> o03,
    "q04_ngram_top20" -> o04,
    "q05_sha256_invariant" -> o05,
    "q06_bio_spans" -> o06,
    "q07_scan_agg" -> o07,
    "q08_dim_join" -> o08,
    "q09_sessionize" -> o09)
}
