package graft

import graft.multimodal.Multimodal
import graft.text.TextOps
import graft.vectors.VectorOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Third query batch: the training-data pipeline operators (dedup
  * suite, language ID, quality, token counts, fingerprints, ANN) plus
  * fact-fact join and per-group top-k. */
object Queries3 {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    s.read.parquet(s"$dir/$n.parquet")

  private val M = TextOps.M

  /** DuckDB re-statement of the rolling hash fold (list_reduce has no
    * init arg → prepend 0; identical fold order to Spark aggregate). */
  private def duckHash(sExpr: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($sExpr, ''), ch -> " +
      s"CAST(ascii(ch) AS BIGINT))), (acc, x) -> (acc * 31 + x) % $M)"

  // ---- dedup suite ---------------------------------------------------

  private def q14(s: SparkSession, dir: String): DataFrame =
    TextOps.exactDupGroups(docs(s, dir)).orderBy("sha")

  private val o14 =
    """SELECT sha256(text) AS sha, min(doc_id) AS keep_id,
      |  count(*) AS n
      |FROM documents GROUP BY sha ORDER BY sha""".stripMargin

  private def q15(s: SparkSession, dir: String): DataFrame =
    TextOps.dedupKeepList(docs(s, dir)).orderBy("doc_id")

  private val o15 =
    """SELECT doc_id, first_value(doc_id) OVER
      |  (PARTITION BY sha256(text) ORDER BY doc_id) AS keep
      |FROM documents ORDER BY doc_id""".stripMargin

  private def q16(s: SparkSession, dir: String): DataFrame =
    TextOps.minhashSignature(docs(s, dir)).orderBy("doc_id")

  private def o16: String = {
    val mh = (0 until 8).map { j =>
      val a = 2 * j + 3; val b = 7919 * (j + 1)
      s"list_min(list_transform(shs, x -> (x * $a + $b) % $M)) AS mh$j"
    }.mkString(",\n  ")
    s"""WITH sh AS (
       |  SELECT doc_id, list_transform(
       |    [array_to_string(w[i:i+7], ' ')
       |     for i in generate_series(1, greatest(len(w)-7, 0))],
       |    s -> ${duckHash("s")}) AS shs
       |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))
       |SELECT doc_id, $mh
       |FROM sh WHERE len(shs) > 0 ORDER BY doc_id""".stripMargin
  }

  private def q17(s: SparkSession, dir: String): DataFrame =
    TextOps.simhash(docs(s, dir)).orderBy("doc_id")

  private def o17: String = {
    val fp = (0 until 16).map { i =>
      s"CASE WHEN list_sum(list_transform(ths, h -> ((h >> $i) & 1) * 2 - 1)) > 0 " +
        s"THEN ${1L << i} ELSE 0 END"
    }.mkString(" + ")
    s"""SELECT doc_id, CAST($fp AS BIGINT) AS simhash
       |FROM (SELECT doc_id, list_transform(string_split(text, ' '),
       |        s -> ${duckHash("s")}) AS ths
       |      FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  // ---- text analysis ---------------------------------------------------

  private def q18(s: SparkSession, dir: String): DataFrame =
    TextOps.languageId(docs(s, dir)).orderBy("doc_id")

  private def o18: String = {
    val langs = TextOps.stopwords.toSeq.sortBy(_._1).map { case (l, sw) =>
      s"('$l', [${sw.map(w => s"'$w'").mkString(",")}])"
    }.mkString(", ")
    s"""WITH sw(swlang, words) AS (VALUES $langs),
       |scored AS (
       |  SELECT doc_id, sw.swlang AS lang,
       |    len(list_filter(string_split(text, ' '),
       |        t -> list_contains(words, t))) /
       |      CAST(len(string_split(text, ' ')) AS DOUBLE) AS score
       |  FROM documents CROSS JOIN sw),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY doc_id
       |    ORDER BY score DESC, lang ASC) AS rk
       |  FROM scored)
       |SELECT doc_id,
       |  CASE WHEN score > 0 THEN lang ELSE 'und' END AS lang_pred,
       |  round(score, 4) AS lang_score
       |FROM ranked WHERE rk = 1 ORDER BY doc_id""".stripMargin
  }

  private def q19(s: SparkSession, dir: String): DataFrame =
    TextOps.qualityScore(docs(s, dir)).orderBy("doc_id")

  private def o19: String = {
    val en = TextOps.stopwords("en").map(w => s"'$w'").mkString(",")
    s"""SELECT doc_id,
       |  length(text) AS n_chars_q,
       |  len(string_split(text, ' ')) AS n_tokens,
       |  round(len(list_distinct(string_split(text, ' '))) /
       |    CAST(len(string_split(text, ' ')) AS DOUBLE), 4)
       |    AS distinct_ratio,
       |  round(length(regexp_replace(text, '[^\\p{L}\\p{N} ]', '', 'g')) /
       |    CAST(length(text) AS DOUBLE), 4) AS alpha_ratio,
       |  round(len(list_filter(string_split(text, ' '),
       |      t -> list_contains([$en], t))) /
       |    CAST(len(string_split(text, ' ')) AS DOUBLE), 4)
       |    AS stopword_ratio,
       |  round(list_sum(list_transform(string_split(text, ' '),
       |      t -> length(t))) /
       |    CAST(len(string_split(text, ' ')) AS DOUBLE), 4)
       |    AS mean_token_len
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  private def q20(s: SparkSession, dir: String): DataFrame =
    TextOps.tokenCounts(docs(s, dir)).orderBy("doc_id")

  private val o20 =
    """SELECT doc_id,
      |  len(string_split_regex(text, '\s+')) AS ws_tokens,
      |  len(regexp_extract_all(text, '[\p{L}\p{N}]+|[^\p{L}\p{N}\s]'))
      |    AS bpeish_tokens,
      |  greatest(CAST(ceil(length(text) / 4.0) AS BIGINT), 1) AS bpe_floor
      |FROM documents ORDER BY doc_id""".stripMargin

  private def q21(s: SparkSession, dir: String): DataFrame =
    TextOps.fingerprint(docs(s, dir)).orderBy("doc_id")

  private def o21: String =
    s"""SELECT doc_id, ${duckHash("text")} AS fp,
       |  ${duckHash("substr(text, 1, 64)")} AS fp_prefix
       |FROM documents ORDER BY doc_id""".stripMargin

  private def q22(s: SparkSession, dir: String): DataFrame =
    TextOps.lshCandidates(docs(s, dir)).orderBy("doc_a", "doc_b")

  private def o22: String = {
    val mh = (0 until 8).map { j =>
      val a = 2 * j + 3; val b = 7919 * (j + 1)
      s"list_min(list_transform(shs, x -> (x * $a + $b) % $M)) AS mh$j"
    }.mkString(",\n  ")
    val bandRows = (0 until 4).map { bnd =>
      s"SELECT doc_id, '${bnd}_' || mh${2 * bnd} || '_' || mh${2 * bnd + 1} AS bh FROM sig"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH sh AS (
       |  SELECT doc_id, list_transform(
       |    [array_to_string(w[i:i+7], ' ')
       |     for i in generate_series(1, greatest(len(w)-7, 0))],
       |    s -> ${duckHash("s")}) AS shs
       |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
       |sig AS (SELECT doc_id, $mh FROM sh WHERE len(shs) > 0),
       |banded AS (
       |  $bandRows),
       |reps AS (
       |  SELECT bh, min(doc_id) AS doc_a
       |  FROM banded GROUP BY bh HAVING count(*) > 1)
       |SELECT DISTINCT r.doc_a, b.doc_id AS doc_b
       |FROM banded b JOIN reps r USING (bh) WHERE b.doc_id <> r.doc_a
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // ---- vector similarity ----------------------------------------------

  /** Session-shared unit vectors of the embeddings table (r6): q23,
    * q24, q45 and q46 each re-scanned and re-normalized the table;
    * one eager localCheckpoint behind a temp view (the established
    * eligV pattern) serves all four. Fresh sessions derive it cold. */
  private[graft] def unitV(s: SparkSession, dir: String): DataFrame = {
    val view = "graft_unitvec_" +
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
    if (!s.catalog.tableExists(view)) {
      VectorOps.withUnitVec(t(s, dir, "embeddings"))
        .select(col("vec_id"), col("unit"))
        .localCheckpoint(true)
        .createOrReplaceTempView(view)
    }
    s.table(view)
  }

  private def q23(s: SparkSession, dir: String): DataFrame =
    VectorOps.bruteForceTopKKernelOnUnits(unitV(s, dir), k = 5)
      .orderBy("id_a", "rk")

  /** The oracle mirrors the Spark fold order exactly (index-order
    * multiply-add over doubles) so the rounded cosine is bit-stable. */
  private val o23 =
    """WITH u AS (
      |  SELECT vec_id, list_transform(generate_series(1, len(embedding)),
      |    i -> embedding[i]::DOUBLE / sqrt(list_reduce(
      |      list_prepend(0.0::DOUBLE,
      |        list_transform(generate_series(1, len(embedding)),
      |          j -> embedding[j]::DOUBLE * embedding[j]::DOUBLE)),
      |      (a, x) -> a + x))) AS unit
      |  FROM embeddings),
      |pairs AS (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |    round(list_reduce(list_prepend(0.0::DOUBLE,
      |      list_transform(generate_series(1, len(a.unit)),
      |        i -> a.unit[i] * b.unit[i])), (x, y) -> x + y), 4) AS cos
      |  FROM u a JOIN u b ON a.vec_id <> b.vec_id),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY id_a
      |    ORDER BY cos DESC, id_b ASC) AS rk
      |  FROM pairs)
      |SELECT id_a, id_b, cos, rk FROM ranked WHERE rk <= 5
      |ORDER BY id_a, rk""".stripMargin

  /** LSH-bucketed ANN — rows-only (the hyperplane signature uses sin();
    * cross-engine libm sign flips near zero would make an oracle
    * flaky). Parity with brute force is asserted in VectorOpsSpec. */
  private def q24(s: SparkSession, dir: String): DataFrame =
    VectorOps.lshNeighborsOnUnits(unitV(s, dir)).orderBy("id_a", "rk")

  /** Oracle for the LSH-bucketed ANN — possible since the hyperplane
    * became integer-hash Rademacher signs (round 1's sin() variant had
    * cross-libm sign flips): both engines normalize, project, bucket,
    * and rank with pinned index-order folds, so rows hash-match. */
  private def o24: String = {
    val signs = (0 until 6).map { p =>
      val comp = s"(CASE WHEN ((((i - 1) * 40503 + ${p + 1} * 104729) " +
        s"% 2147483648) * 2654435761) % 2147483648 < 1073741824 " +
        s"THEN 1.0 ELSE -1.0 END)"
      s"""CASE WHEN list_reduce(list_prepend(0.0::DOUBLE,
         |    list_transform(generate_series(1, len(unit)),
         |      i -> unit[i] * $comp)), (a, x) -> a + x) >= 0
         |  THEN '1' ELSE '0' END""".stripMargin
    }.mkString(" ||\n  ")
    s"""WITH u AS (
       |  SELECT vec_id, list_transform(generate_series(1, len(embedding)),
       |    i -> embedding[i]::DOUBLE / sqrt(list_reduce(
       |      list_prepend(0.0::DOUBLE,
       |        list_transform(generate_series(1, len(embedding)),
       |          j -> embedding[j]::DOUBLE * embedding[j]::DOUBLE)),
       |      (a, x) -> a + x))) AS unit
       |  FROM embeddings),
       |s AS (
       |  SELECT vec_id, unit,
       |  $signs AS sig
       |  FROM u),
       |pairs AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |    round(list_reduce(list_prepend(0.0::DOUBLE,
       |      list_transform(generate_series(1, len(a.unit)),
       |        i -> a.unit[i] * b.unit[i])), (x, y) -> x + y), 4) AS cos
       |  FROM s a JOIN s b ON a.sig = b.sig AND a.vec_id <> b.vec_id),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY id_a
       |    ORDER BY cos DESC, id_b ASC) AS rk
       |  FROM pairs)
       |SELECT id_a, id_b, cos, rk FROM ranked WHERE rk <= 5
       |ORDER BY id_a, rk""".stripMargin
  }

  private def q25(s: SparkSession, dir: String): DataFrame =
    VectorOps.centroids(t(s, dir, "embeddings"))
      .select(col("label"), posexplode(col("centroid")).as(Seq("dim", "v")))
      .select(col("label"), col("dim"), round(col("v"), 4).as("mean_v"))
      .orderBy("label", "dim")

  private val o25 =
    """SELECT label, i - 1 AS dim,
      |  round(avg(embedding[i]::DOUBLE), 4) + 0.0 AS mean_v
      |FROM embeddings,
      |     LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i)
      |GROUP BY label, dim ORDER BY label, dim""".stripMargin

  // ---- multimodal plumbing over the binary fixture ---------------------
  // The fixture payloads come from Multimodal.mediaByte's pure integer
  // formula, so the oracle recomputes the same (media_id, byte) grid
  // relationally and checks the decode stats without any blob I/O.

  private def q26(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.synthesize(s, 300)
    Multimodal.extractFeatures(media).toDF()
      .select("media_id", "kind", "n_bytes", "byte_mean", "byte_entropy_q")
      .orderBy("media_id")
  }

  private val o26 =
    """WITH media AS (
      |  SELECT i,
      |    CASE CAST(i % 3 AS INT) WHEN 0 THEN 'image'
      |      WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |    8 + ((i+1)*48271 % 65521) % 24 AS w,
      |    8 + ((i+1)*16807 % 65521) % 24 AS h
      |  FROM range(0, 300) t(i)),
      |grid AS (
      |  SELECT i, kind, n_bytes, j,
      |    ((i+1)*40503 + (j+1)*65429) % 65521 AS a
      |  FROM (SELECT i, kind, w*h AS n_bytes,
      |          unnest(generate_series(0, w*h - 1)) AS j
      |        FROM media))
      |SELECT i AS media_id, kind, CAST(n_bytes AS INT) AS n_bytes,
      |  round(CAST(sum(((a*a + 7*a + j) % 65521) % 256) AS DOUBLE)
      |    / count(*), 4) AS byte_mean,
      |  count(DISTINCT ((a*a + 7*a + j) % 65521) % 256) AS byte_entropy_q
      |FROM grid
      |GROUP BY i, kind, n_bytes
      |ORDER BY media_id""".stripMargin

  // ---- fact-fact shuffle join + per-group top-k ------------------------

  private def q27(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice")), 2).as("total_price"))
      .orderBy("o_orderpriority")

  private val o27 =
    """SELECT o_orderpriority, count(*) AS n_items,
      |  round(sum(l_extendedprice), 2) AS total_price
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  private def q28(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(desc("value"), asc("event_id"))
    t(s, dir, "events")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("user_id"), col("event_id"),
        round(col("value"), 4).as("value"), col("rk"))
      .orderBy("user_id", "rk")
  }

  private val o28 =
    """SELECT user_id, event_id, round(value, 4) AS value, rk
      |FROM (SELECT user_id, event_id, value, row_number() OVER
      |        (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rk
      |      FROM events)
      |WHERE rk <= 3 ORDER BY user_id, rk""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q14_exact_dedup" -> (q14 _),
    "q15_dedup_keeplist" -> (q15 _),
    "q16_minhash_sig" -> (q16 _),
    "q17_simhash" -> (q17 _),
    "q18_langid" -> (q18 _),
    "q19_quality_score" -> (q19 _),
    "q20_token_counts" -> (q20 _),
    "q21_fingerprint" -> (q21 _),
    "q22_lsh_candidates" -> (q22 _),
    "q23_ann_bruteforce" -> (q23 _),
    "q24_ann_lsh" -> (q24 _),
    "q25_centroids" -> (q25 _),
    "q26_multimodal_features" -> (q26 _),
    "q27_fact_join" -> (q27 _),
    "q28_topk_per_group" -> (q28 _))

  val oracles: Map[String, String] = Map(
    "q14_exact_dedup" -> o14,
    "q15_dedup_keeplist" -> o15,
    "q16_minhash_sig" -> o16,
    "q17_simhash" -> o17,
    "q18_langid" -> o18,
    "q19_quality_score" -> o19,
    "q20_token_counts" -> o20,
    "q21_fingerprint" -> o21,
    "q22_lsh_candidates" -> o22,
    "q23_ann_bruteforce" -> o23,
    "q24_ann_lsh" -> o24,
    "q25_centroids" -> o25,
    "q26_multimodal_features" -> o26,
    "q27_fact_join" -> o27,
    "q28_topk_per_group" -> o28)
}
