package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline operators over a document table
  * (doc_id, text, ...): deduplication (exact, MinHash/LSH, SimHash,
  * n-gram Jaccard), language ID, quality scoring, token counting, and
  * document fingerprinting. All pure column expressions / joins —
  * codegen-friendly, no UDFs — so every operator inherits predicate
  * pushdown and whole-stage codegen.
  *
  * The arithmetic hash used throughout is an explicit 31-polynomial
  * rolling hash mod 2^61-1 computed with column expressions: it is
  * reproducible in any SQL engine (the DuckDB oracles re-state it),
  * unlike engine-builtin hashes.
  */
object TextOps {

  /** Mersenne prime 2^31-1: acc < 2^31 keeps acc*31+x < 2^36, well
    * inside Long — the fold never overflows, in Spark or in the DuckDB
    * oracle re-statement. */
  val M: Long = (1L << 31) - 1

  /** Column-expression rolling hash of a string: codepoint polynomial
    * in base 31 mod 2^31-1; aggregate() folds sequentially so the
    * order is pinned. */
  def rollingHash(c: Column): Column =
    aggregate(
      transform(split(c, ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, x) => pmod(acc * 31 + x, lit(M)))

  // ---- exact dedup ---------------------------------------------------

  /** Exact duplicates by content hash: keep the min doc_id per group,
    * report group size. Hash-groupBy — one shuffle on the digest. */
  def exactDupGroups(docs: DataFrame): DataFrame =
    docs.groupBy(sha2(col("text"), 256).as("sha"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n"))

  // ---- MinHash / LSH -------------------------------------------------

  /** MinHash signature: for hash function j, h_j(x) = (a_j·x + b_j)
    * mod M over shingle rolling-hashes; signature(j) = min over
    * shingles. a/b derived from a fixed seed table — deterministic.
    * One narrow pass (no shuffle): signatures computed per row. */
  def minhashSignature(docs: DataFrame, k: Int = 8, numHashes: Int = 8)
      : DataFrame = {
    // native shingle-hash expression: value-identical to the
    // transform/aggregate column form (ShingleHashesSpec), one
    // generated loop instead of per-char lambda dispatch
    val sh = graft.functions.ShingleHashes.shingle_hashes(col("text"), k)
    val sig = (0 until numHashes).map { j =>
      val a = 2 * j + 3; val b = 7919 * (j + 1)
      array_min(transform(col("shs"),
        x => pmod(x * a + b, lit(M)))).as(s"mh$j")
    }
    docs.withColumn("shs", sh)
      .filter(size(col("shs")) > 0)
      .select(col("doc_id") +: sig: _*)
  }

  /** LSH banding: docs sharing any band (of `rows` consecutive minhash
    * values) become candidates. Star pairing per bucket: every member
    * links to the bucket's MIN doc_id instead of to every other member,
    * so a bucket of c near-identical docs (the boilerplate/licence-file
    * case that dominates a 100 TB corpus) emits c−1 pairs, not c(c−1)/2
    * — total output is O(docs·bands) by construction, with the SAME
    * connected components as the all-pairs candidate graph (every
    * bucket stays one component through its representative), which is
    * the invariant dedup clustering consumes. Shuffles key on the band
    * hash only. */
  def lshCandidates(docs: DataFrame, k: Int = 8, numHashes: Int = 8,
      bands: Int = 4): DataFrame = {
    val rows = numHashes / bands
    val sig = minhashSignature(docs, k, numHashes)
    // bh strings embed the band index, so bh alone is the bucket key
    val banded = sig.select(col("doc_id"), explode(array(
      (0 until bands).map { b =>
        concat_ws("_", lit(b) +:
          (0 until rows).map(r => col(s"mh${b * rows + r}")): _*)
      }: _*)).as("bh"))
    val reps = banded.groupBy("bh")
      .agg(min("doc_id").as("doc_a"), count(lit(1)).as("sz"))
      .filter(col("sz") > 1)
      .drop("sz")
    banded.join(reps, Seq("bh"))
      .filter(col("doc_id") =!= col("doc_a"))
      .select(col("doc_a"), col("doc_id").as("doc_b")).distinct()
  }

  // ---- SimHash -------------------------------------------------------

  /** b-bit SimHash over token rolling-hashes: bit i of the fingerprint
    * is 1 iff the majority of tokens have bit i set in their hash.
    * Pure column math (transform + aggregate over bit positions). */
  def simhash(docs: DataFrame, bits: Int = 16): DataFrame = {
    // 1-token shingles == per-token rolling hashes
    val tokHashes =
      graft.functions.ShingleHashes.shingle_hashes(col("text"), 1)
    val bitSums = (0 until bits).map { i =>
      aggregate(col("ths"),
        lit(0L),
        (acc, h) => acc + shiftright(h, i) % 2 * 2 - 1).as(s"b$i")
    }
    val fp = (0 until bits).map { i =>
      when(col(s"b$i") > 0, lit(1L << i)).otherwise(0L)
    }.reduce(_ + _)
    docs.withColumn("ths", tokHashes)
      .select(col("doc_id") +: bitSums: _*)
      .select(col("doc_id"), fp.as("simhash"))
  }

  // ---- language ID ---------------------------------------------------

  /** Stopword sets per language (top function words; public knowledge). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "den"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "de", "du"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "que", "en"))

  /** n-gram/stopword heuristic language ID: score per language =
    * fraction of tokens in that language's stopword set; argmax with
    * deterministic (score desc, lang asc) tie-break; 'und'
    * (undetermined) when no stopword hits. */
  def languageId(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val scores = stopwords.toSeq.sortBy(_._1).map { case (lang, sw) =>
      (size(filter(toks, t => t.isin(sw.map(lit(_)): _*)))
        .cast("double") / size(toks)).as(s"s_$lang")
    }
    // sort by (-score, lang) ascending = (score desc, lang asc) —
    // deterministic argmax tie-break
    val best = stopwords.keys.toSeq.sorted
      .map(l => struct((col(s"s_$l") * -1).as("negscore"),
        lit(l).as("lang")))
    docs.select(col("doc_id") +: scores: _*)
      .withColumn("pick", sort_array(array(best: _*))(0))
      .select(col("doc_id"),
        when(col("pick.negscore") < 0, col("pick.lang")).otherwise("und")
          .as("lang_pred"),
        round(col("pick.negscore") * -1, 4).as("lang_score"))
  }

  // ---- quality scoring ----------------------------------------------

  /** Document quality signals: length, token stats, punctuation /
    * non-alpha ratio, stopword ratio, repetition (distinct/total
    * tokens). The classic pre-training quality filter features. */
  def qualityScore(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    docs.select(
      col("doc_id"),
      length(col("text")).as("n_chars_q"),
      size(toks).as("n_tokens"),
      round(size(array_distinct(toks)).cast("double") / size(toks), 4)
        .as("distinct_ratio"),
      round(
        length(regexp_replace(col("text"), "[^\\p{L}\\p{N} ]", ""))
          .cast("double") / length(col("text")), 4).as("alpha_ratio"),
      round(size(filter(toks,
        t => t.isin(stopwords("en").map(lit(_)): _*)))
        .cast("double") / size(toks), 4).as("stopword_ratio"),
      round(aggregate(toks, lit(0L), (a, t) => a + length(t))
        .cast("double") / size(toks), 4).as("mean_token_len"))
  }

  // ---- token counting -------------------------------------------------

  /** Whitespace token count + a BPE-ish subword estimate (regex splits
    * on letter/digit/punct boundaries; ~chars/4 floor like common BPE
    * heuristics). */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(split(col("text"), "\\s+")).as("ws_tokens"),
      // letter/digit runs or single non-space punct — RE2-safe (the
      // oracle uses the identical pattern; no lookarounds)
      size(expr(
        "regexp_extract_all(text, '[\\\\p{L}\\\\p{N}]+|[^\\\\p{L}\\\\p{N}\\\\s]', 0)"))
        .as("bpeish_tokens"),
      greatest(ceil(length(col("text")) / 4).cast("bigint"), lit(1L))
        .as("bpe_floor"))

  // ---- fingerprinting --------------------------------------------------

  /** Rolling-hash document fingerprint (order-sensitive, unlike the
    * exact-dup sha: 'a b' vs 'b a' differ) + first-64-chars prefix hash
    * for locality bucketing. */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      rollingHash(col("text")).as("fp"),
      rollingHash(substring(col("text"), 1, 64)).as("fp_prefix"))

  // ---- within-group dedup keep-list (window op) ------------------------

  /** Canonical keep-list: within each exact-dup group keep the lowest
    * doc_id; emit (doc_id, keep) pairs for all docs. */
  def dedupKeepList(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy("sha").orderBy("doc_id")
    docs.select(col("doc_id"), sha2(col("text"), 256).as("sha"))
      .withColumn("keep", first("doc_id").over(w))
      .select(col("doc_id"), col("keep"))
  }
}
