package graft.conll

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Remaining reference scans (SURVEY.md §2.1) as relational operators
  * over line/row inputs, plus the skew-safe repo aggregation pattern.
  */
object Scans {

  /** setE.conll TSV scan (data_loader.py:321-343;
    * post_process.py:197-206): tab-separated rows; word at c0, doc
    * file id at c3, char start/end at c6/c7; doc genre =
    * docfile.split('_')[1]. */
  def setEConllScan(rows: DataFrame): DataFrame =
    rows
      .withColumn("f", split(col("line"), "\t"))
      .select(
        col("f").getItem(0).as("word"),
        col("f").getItem(3).as("doc"),
        split(col("f").getItem(3), "_").getItem(1).as("genre"),
        col("f").getItem(6).cast("int").as("start"),
        col("f").getItem(7).cast("int").as("end"))

  /** Gazetteer CSV scan (segnerfts.py:25-49): header CSV with
    * `;`-separated variant lists; unlabeled single-token English rows
    * default to GPE (segnerfts.py:40-44). Input: (english, label)
    * columns pre-parsed from CSV. Output: one row per (variant,
    * label). */
  def gazetteerScan(rows: DataFrame): DataFrame =
    rows
      .select(explode(split(col("english"), ";")).as("variant"),
        col("label"))
      .select(trim(col("variant")).as("variant"),
        when(col("label").isNull || col("label") === "",
          when(size(split(trim(col("variant")), "\\s+")) === 1,
            lit("GPE")).otherwise(lit(null)))
          .otherwise(col("label")).as("label"))
      .filter(col("variant") =!= "" && col("label").isNotNull)

  /** Lookup-table load with ambiguity removal (post_process.py:36-69):
    * multi-file union of (span, label) rows; spans mapped to >1
    * distinct label are dropped (50-55). */
  def lookupTableScan(rows: DataFrame): DataFrame =
    rows
      .groupBy(lower(col("span")).as("span"))
      .agg(collect_set(col("label")).as("labels"))
      .filter(size(col("labels")) === 1)
      .select(col("span"), col("labels").getItem(0).as("label"))

  /** Author-list XML scan (utils/extract_authors.py:6-26) without a
    * DOM parser (none ships offline): WL-genre files only
    * (`fname.split('_')[1] == "WL"`, extract_authors.py:11-13);
    * `<attribute name="author" value="X"/>` elements inside post
    * blocks are collected as a DISTINCT author set
    * (extract_authors.py:18-22 collects into a set). Relational form:
    * post-block membership is a running sum of open/close markers
    * over line numbers (the same sessionizer pattern as the CoNLL
    * scan; the reference's xpath parent constraint (any element with
    * attribute type='post') is approximated by `type="post"` open and
    * `</post>` close lines —
    * a real LTF corpus with single-line documents would instead split
    * the post element out first), and the value extraction is one
    * RE2-safe regexp_extract_all. Input rows: (fname, lineno, line).
    * Output: one row per distinct author, ordered. */
  def authorXmlScan(rows: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("fname").orderBy("lineno")
    rows
      .filter(element_at(split(col("fname"), "_"), 2) === "WL")
      .withColumn("opens",
        sum(when(col("line").contains("type=\"post\""), 1).otherwise(0))
          .over(w))
      .withColumn("closes",
        sum(when(col("line").contains("</post>"), 1).otherwise(0))
          .over(w))
      // inside a post block: the opening line counts, the closing
      // line's extraction still belongs to the block it closes
      .filter(col("opens") > col("closes") -
        when(col("line").contains("</post>"), 1).otherwise(0))
      .select(explode(expr(
        """regexp_extract_all(line,
          |'<attribute[^>]*name="author"[^>]*value="([^"]*)"', 1)"""
          .stripMargin.replace("\n", ""))).as("author"))
      .filter(col("author") =!= "")
      .distinct()
      .orderBy("author")
  }

  /** CoNLL prediction sink (main.py:75-82, 529-537): the
    * `word\tNNP\tNP\ttag` line format, one blank line between
    * sentences (flattened here as ordered rows; the blank-line framing
    * is the writer's concern). */
  def conllSinkLines(tokens: DataFrame): DataFrame =
    tokens
      .select(col("sentId"), col("tokenIdx"),
        concat_ws("\t", col("word"), lit("NNP"), lit("NP"), col("tag"))
          .as("line"))
      .orderBy("sentId", "tokenIdx")

  /** Ensemble-split sink (utils/split_train_ensemble.py:5-31): seeded
    * shuffle of sentences into N train shards — `randomSplit` with a
    * pinned seed replaces the numpy shuffle. */
  def ensembleSplit(df: DataFrame, n: Int, seed: Long = 42L)
      : Array[DataFrame] =
    df.randomSplit(Array.fill(n)(1.0), seed)

  /** Two-phase skew-safe per-repo aggregation (SURVEY.md §7.6.5, north
    * rule's mega-repo salting): counts per repo via salted partial
    * aggregation then final merge. Results identical to a direct
    * groupBy(repo); the salted shuffle bounds any single task by
    * 1/buckets of the hottest repo. */
  def saltedRepoCounts(df: DataFrame, buckets: Int = 16): DataFrame =
    df
      .withColumn("salt", pmod(xxhash64(col("path")), lit(buckets)))
      .groupBy(col("repo"), col("salt"))
      .agg(count(lit(1)).as("partial"))
      .groupBy(col("repo"))
      .agg(sum(col("partial")).as("n"))
}
