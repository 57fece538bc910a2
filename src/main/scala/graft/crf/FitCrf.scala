package graft.crf

import graft.core.{Dict, Sentence, TaggedSentence}
import graft.features.Features
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.{col, count, lit, sum, first}

/** Closed-form CRF weight fitting — SURVEY.md §7.3's "correctness
  * linchpin" delivered as written: emission weights are count-based
  * log-odds with add-k smoothing over φ = §2.3 discrete features ∪
  * word-identity/shape dictionaries, and transitions are log bigram
  * frequencies of tag pairs with the −1000 wall structure of
  * decoders.py:17-25 / model_builder.py:13-22 (generalized to the 4th
  * type slot). No iterative training — the fit is one pass of counting,
  * fully deterministic.
  *
  * Execution model: counting is relational (flatMap to a token frame,
  * then groupBy aggregations), so it scales like any other aggregation
  * — partial aggregation map-side, one shuffle per count family, and
  * only model-sized results (vocab pruned by minCount, shape classes,
  * a (K+2)² bigram grid) ever reach the driver. The same
  * counts→weights arithmetic backs [[fitLocal]], the driver-side twin
  * used to derive the pipeline's default weights from the synthetic
  * labeled corpus without a SparkSession.
  */
object FitCrf {

  import Crf.{K, START, END, WALL}
  private val F = Features.numFeatures
  private val N2 = K + 2

  /** One labeled sentence: surface tokens + gold tag ids. */
  final case class TaggedTokens(words: Array[String], tags: Array[Int])

  /** All count statistics the closed-form fit needs. Model-sized. */
  final case class Counts(
      n: Long,                              // total tokens
      tagCount: Array[Long],                // K
      featCount: Array[Array[Long]],        // K × F: c(feature f, tag t)
      wordTag: Map[String, Array[Long]],    // vocab word → per-tag counts
      shapeTag: Map[Int, Array[Long]],      // rare-token shape → per-tag
      rareTag: Array[Long],                 // per-tag totals, rare tokens
      bigram: Array[Array[Long]])           // (K+2)²: tag-pair counts

  /** The fitted model. `featW`/`trans` have the exact shapes
    * [[Crf.emissionWeights]]/[[Crf.transitions]] serve, so the fused
    * decode kernels run unchanged on fitted weights. */
  final case class FittedModel(
      featW: Array[Array[Float]],           // K × F log-odds
      wordW: Map[String, Array[Float]],     // word → per-tag log-odds
      shapeW: Map[Int, Array[Float]],       // OOV backoff by shape class
      shapeDefault: Array[Float],           // unseen shape class
      trans: Array[Array[Float]],           // (K+2)² log bigram + walls
      lambda: Float,                        // feature-term mixing weight
      // Brown-cluster features (features.py:16-29 consumed them as a
      // model input; here they are extra φ dims): word → dense cluster
      // id, and cluster id → per-tag weights, ADDITIVE on top of the
      // word/shape backoff chain whenever the word's cluster is known.
      // Both empty = the pre-cluster model, byte-identical behavior.
      clusters: Map[String, Int] = Map.empty,
      clusterW: Map[Int, Array[Float]] = Map.empty)

  /** Shape class of a token = its word-only feature bits (0-14).
    * Context-free by construction, so it is constant per surface. */
  def shapeOf(mask: Int): Int = mask & 0x7FFF

  // ---- distributed counting -------------------------------------------

  /** Count statistics in three relational aggregations over one
    * token frame. minCount prunes the vocabulary BEFORE collect (the
    * 100 TB guard: the driver only ever sees the pruned vocab); words
    * with total count ≤ rareMax estimate the OOV shape distribution
    * (the rare-word population is the unbiased stand-in for unseen
    * words). */
  def countStats(data: Dataset[TaggedTokens], minCount: Long = 2,
      rareMax: Long = 1): Counts = {
    val spark = data.sparkSession
    import spark.implicits._
    val bGaz = spark.sparkContext.broadcast(Dict.gazIndex)
    val toks = data.flatMap { s =>
      val masks = Features.sentenceBits(s.words, bGaz.value)
      Iterator.range(0, s.words.length)
        .map(i => (s.words(i), s.tags(i), masks(i)))
    }.toDF("word", "tag", "mask")
      // consumed by two independent aggregations — materialize once;
      // lazy localCheckpoint ties block lifetime to this plan
      .localCheckpoint(false)

    // (a) per-tag totals + per-feature-bit conditional counts (K rows)
    val featCols = (0 until F).map(f =>
      sum((col("mask").bitwiseAND(lit(1 << f)) =!= 0).cast("long"))
        .as(s"f$f"))
    val featRows = toks.groupBy("tag")
      .agg(count(lit(1)).as("c"), featCols: _*).collect()
    val tagCount = new Array[Long](K)
    val featCount = Array.ofDim[Long](K, F)
    featRows.foreach { r =>
      val t = r.getInt(0)
      tagCount(t) = r.getLong(1)
      var f = 0
      while (f < F) { featCount(t)(f) = r.getLong(2 + f); f += 1 }
    }
    val n = tagCount.sum

    // (b) per-word per-tag counts; shape is constant per surface so it
    // rides along with first(). Vocab rows (≥ minCount) become the
    // word dictionary; rare rows (≤ rareMax) fold into shape classes.
    val tagCols = (0 until K).map(t =>
      sum((col("tag") === t).cast("long")).as(s"t$t"))
    val wordRows = toks.groupBy("word")
      .agg(count(lit(1)).as("cw"),
        (first(shapeCol(col("mask"))).as("shape") +: tagCols): _*)
    // row layout: word(0), cw(1), shape(2), t0..t8(3..K+2)
    val vocab = wordRows.filter(col("cw") >= minCount).collect()
      .map { r =>
        r.getString(0) -> (3 to K + 2).map(r.getLong).toArray
      }.toMap
    val shapeRows = wordRows.filter(col("cw") <= rareMax)
      .groupBy("shape")
      .agg(sum(col("t0")).as("t0"),
        (1 until K).map(t => sum(col(s"t$t")).as(s"t$t")): _*)
      .collect()
    val shapeTag = shapeRows.map { r =>
      r.getInt(0) -> (1 to K).map(r.getLong).toArray
    }.toMap
    val rareTag = new Array[Long](K)
    shapeTag.values.foreach { a =>
      var t = 0; while (t < K) { rareTag(t) += a(t); t += 1 }
    }

    // (c) tag bigrams including the virtual START/END boundaries
    val bigram = bigramStats(data)

    Counts(n, tagCount, featCount, vocab, shapeTag, rareTag, bigram)
  }

  /** Bigram counts alone (section (c) of [[countStats]]): one narrow
    * flatMap + one map-side-combined aggregate — no featurization, no
    * vocabulary aggregations. The transition-fit gate (q29) consumes
    * ONLY this matrix, so computing it directly skips ~3/4 of
    * countStats' work (guide §1.2: don't compute what you throw
    * away). */
  def bigramStats(data: Dataset[TaggedTokens]): Array[Array[Long]] = {
    val spark = data.sparkSession
    import spark.implicits._
    val bigRows = data.flatMap { s =>
      val t = s.tags
      if (t.isEmpty) Iterator.empty
      else Iterator.single((START, t(0))) ++
        Iterator.range(0, t.length - 1).map(i => (t(i), t(i + 1))) ++
        Iterator.single((t(t.length - 1), END))
    }.toDF("from", "to").groupBy("from", "to")
      .agg(count(lit(1)).as("c")).collect()
    val bigram = Array.ofDim[Long](N2, N2)
    bigRows.foreach(r => bigram(r.getInt(0))(r.getInt(1)) = r.getLong(2))
    bigram
  }

  private def shapeCol(mask: org.apache.spark.sql.Column) =
    mask.bitwiseAND(lit(0x7FFF))

  /** Driver-side counting twin over in-memory labeled sentences —
    * identical statistics, no SparkSession (used to derive the
    * pipeline's default weights at class-init). */
  def countLocal(data: Seq[TaggedTokens], minCount: Long = 2,
      rareMax: Long = 1): Counts = {
    val tagCount = new Array[Long](K)
    val featCount = Array.ofDim[Long](K, F)
    val wordTag = scala.collection.mutable.Map[String, Array[Long]]()
    val wordShape = scala.collection.mutable.Map[String, Int]()
    val bigram = Array.ofDim[Long](N2, N2)
    data.foreach { s =>
      if (s.words.nonEmpty) {
        val masks = Features.sentenceBits(s.words, Dict.gazIndex)
        var i = 0
        while (i < s.words.length) {
          val t = s.tags(i)
          tagCount(t) += 1
          var m = masks(i)
          while (m != 0) {
            val f = java.lang.Integer.numberOfTrailingZeros(m)
            featCount(t)(f) += 1
            m &= m - 1
          }
          val w = s.words(i)
          val arr = wordTag.getOrElseUpdate(w, new Array[Long](K))
          arr(t) += 1
          wordShape(w) = shapeOf(masks(i))
          i += 1
        }
        bigram(START)(s.tags(0)) += 1
        i = 0
        while (i < s.tags.length - 1) {
          bigram(s.tags(i))(s.tags(i + 1)) += 1; i += 1
        }
        bigram(s.tags(s.tags.length - 1))(END) += 1
      }
    }
    val shapeTag = scala.collection.mutable.Map[Int, Array[Long]]()
    val rareTag = new Array[Long](K)
    val vocab = Map.newBuilder[String, Array[Long]]
    wordTag.foreach { case (w, arr) =>
      val cw = arr.sum
      if (cw >= minCount) vocab += (w -> arr)
      if (cw <= rareMax) {
        val sArr = shapeTag.getOrElseUpdate(wordShape(w), new Array[Long](K))
        var t = 0
        while (t < K) { sArr(t) += arr(t); rareTag(t) += arr(t); t += 1 }
      }
    }
    Counts(tagCount.sum, tagCount, featCount, vocab.result(),
      shapeTag.toMap, rareTag, bigram)
  }

  // ---- counts → weights (pure arithmetic, shared by both paths) ------

  /** Add-k log-odds of a binary event: how much more likely under tag t
    * than under the rest. a/at = event count / population under t;
    * b/bt = same under ¬t. */
  private def logOdds(a: Long, at: Long, b: Long, bt: Long,
      k: Double): Float =
    (math.log((a + k) / (at + 2 * k)) -
      math.log((b + k) / (bt + 2 * k))).toFloat

  /** Closed-form weights from counts (SURVEY.md §7.3). */
  def weights(c: Counts, k: Double = 0.5, lambda: Float = 1f)
      : FittedModel = {
    val featW = Array.tabulate(K, F) { (t, f) =>
      val cf = (0 until K).map(c.featCount(_)(f)).sum
      logOdds(c.featCount(t)(f), c.tagCount(t),
        cf - c.featCount(t)(f), c.n - c.tagCount(t), k)
    }
    val wordW = c.wordTag.map { case (w, arr) =>
      val cw = arr.sum
      w -> Array.tabulate(K)(t => logOdds(arr(t), c.tagCount(t),
        cw - arr(t), c.n - c.tagCount(t), k))
    }
    val rareN = c.rareTag.sum
    val shapeW = c.shapeTag.map { case (s, arr) =>
      val cs = arr.sum
      s -> Array.tabulate(K)(t => logOdds(arr(t), c.rareTag(t),
        cs - arr(t), math.max(rareN - c.rareTag(t), 0L), k))
    }
    // unseen shape class: the rare-population tag prior as log-odds
    val shapeDefault = Array.tabulate(K) { t =>
      logOdds(c.rareTag(t), math.max(rareN, 1L),
        c.rareTag.sum - c.rareTag(t), math.max(rareN, 1L), k)
    }
    FittedModel(featW, wordW, shapeW, shapeDefault,
      transWeights(c.bigram, k), lambda)
  }

  /** Transition block from bigram counts: log P(to | from) over legal
    * targets, reference wall structure pinned regardless of counts
    * (decoders.py:17-25, 48-58). Dict.walls, not Crf.walls: this path
    * runs inside DefaultModel.fitted, which Crf's own lazy weights
    * call into — touching Crf here would re-create the init cycle.
    * Factored out of [[weights]] so the transition-only gate (q29) can
    * pair it with [[bigramStats]] without the full fit. */
  def transWeights(bigram: Array[Array[Long]], k: Double)
      : Array[Array[Float]] =
    Array.tabulate(N2, N2) { (i, j) =>
      if (Dict.walls(i)(j)) WALL
      else {
        val row = (0 until N2).map(bigram(i)(_)).sum
        // add-k over the LEGAL (non-walled) targets of this row only,
        // so each row is a normalized log P(to|from): walls remove a
        // per-row-varying number of targets (e.g. the 4 I-tags from O)
        val legal = (0 until N2).count(j2 => !Dict.walls(i)(j2))
        math.log((bigram(i)(j) + k) / (row + k * legal)).toFloat
      }
    }

  /** fit = count → weights, distributed. */
  def fit(data: Dataset[TaggedTokens], k: Double = 0.5,
      minCount: Long = 2, rareMax: Long = 1, lambda: Float = 1f)
      : FittedModel =
    weights(countStats(data, minCount, rareMax), k, lambda)

  /** fit on the driver (pipeline-default derivation; tests). */
  def fitLocal(data: Seq[TaggedTokens], k: Double = 0.5,
      minCount: Long = 2, rareMax: Long = 1, lambda: Float = 1f)
      : FittedModel =
    weights(countLocal(data, minCount, rareMax), k, lambda)

  /** Closed-form fit WITH Brown-cluster features: clusterW is the
    * per-cluster per-tag log-odds over the RARE population (count ≤
    * rareMax — the same OOV stand-in shapeW is fitted on), and the
    * served cluster map is gated to words WITHOUT a wordW row, so the
    * additive cluster term refines only the OOV/backoff regime (for
    * in-vocab words the word-identity row already subsumes the
    * cluster, and naive-Bayes-adding correlated evidence would
    * double-count). One extra distributed aggregation over [[fit]]. */
  def fitWithClusters(data: Dataset[TaggedTokens],
      clusters: Map[String, Int], k: Double = 0.5, minCount: Long = 2,
      rareMax: Long = 1, lambda: Float = 1f): FittedModel = {
    val spark = data.sparkSession
    import spark.implicits._
    val c = countStats(data, minCount, rareMax)
    val m = weights(c, k, lambda)
    val bC = spark.sparkContext.broadcast(clusters)
    // rare-population (cluster, tag) counts: per-word totals gate the
    // rare rows, the broadcast map keys them by cluster
    val toks = data.flatMap(s => s.words.zip(s.tags)).toDF("word", "tag")
    val rareWords = toks.groupBy("word")
      .agg(count(lit(1)).as("cw"))
      .filter(col("cw") <= rareMax)
      .select("word")
    val clusterRows = toks.join(rareWords, "word")
      .flatMap { r =>
        bC.value.get(r.getString(0)).map(cid => (cid, r.getInt(1)))
      }
      .toDF("cid", "tag").groupBy("cid", "tag")
      .agg(count(lit(1)).as("n")).collect()
    val clusterTag = clusterRows.groupBy(_.getInt(0)).map {
      case (cid, rows) =>
        val arr = new Array[Long](K)
        rows.foreach(r => arr(r.getInt(1)) = r.getLong(2))
        cid -> arr
    }
    val rareN = c.rareTag.sum
    val clusterW = clusterTag.map { case (cid, arr) =>
      val cs = arr.sum
      cid -> Array.tabulate(K)(t => logOdds(arr(t), c.rareTag(t),
        cs - arr(t), math.max(rareN - c.rareTag(t), 0L), k))
    }.toMap
    val served = clusters.filter { case (w, _) =>
      !m.wordW.contains(w) &&
        !m.wordW.contains(w.toLowerCase(java.util.Locale.ROOT))
    }
    m.copy(clusters = served, clusterW = clusterW)
  }

  // ---- serving ---------------------------------------------------------

  /** Emission vector of one token under a fitted model: word-identity
    * score (exact surface, then lowercase fallback — util.py:97-110
    * policy — then shape-class backoff) + λ · discrete-feature
    * log-odds. */
  def emit(word: String, mask: Int, m: FittedModel): Array[Float] = {
    val base = m.wordW.getOrElse(word,
      m.wordW.getOrElse(word.toLowerCase(java.util.Locale.ROOT),
        m.shapeW.getOrElse(shapeOf(mask), m.shapeDefault)))
    // Brown-cluster term (same exact-then-lowercase policy as words);
    // null when the model carries no clusters or the word none
    val cw: Array[Float] =
      if (m.clusters.isEmpty) null
      else {
        val cid = m.clusters.get(word)
          .orElse(m.clusters.get(word.toLowerCase(java.util.Locale.ROOT)))
        cid.flatMap(m.clusterW.get).orNull
      }
    val out = new Array[Float](K)
    var t = 0
    while (t < K) {
      var s = base(t)
      if (cw != null) s += cw(t)
      if (m.lambda != 0f) {
        var mm = mask
        while (mm != 0) {
          val f = java.lang.Integer.numberOfTrailingZeros(mm)
          s += m.lambda * m.featW(t)(f)
          mm &= mm - 1
        }
      }
      out(t) = s
      t += 1
    }
    out
  }

  /** Fused decode under a fitted model — same narrow mapPartitions
    * shape as [[Crf.tag]]; the model broadcasts once (vocab is
    * minCount-pruned and corpus-size-independent in the row limit). */
  def tag(sentences: Dataset[Sentence], m: FittedModel)
      : Dataset[TaggedSentence] = {
    val spark = sentences.sparkSession
    import spark.implicits._
    val bM = spark.sparkContext.broadcast(m)
    val bGaz = spark.sparkContext.broadcast(Dict.gazIndex)
    sentences.mapPartitions { it =>
      val model = bM.value; val gaz = bGaz.value
      it.map { s =>
        val masks = Features.sentenceBits(s.tokens, gaz)
        val em = Array.tabulate(s.tokens.length)(i =>
          emit(s.tokens(i), masks(i), model))
        val path = Crf.viterbi(em, model.trans)
        TaggedSentence(s.repo, s.path, s.sentIdx, s.tokens, s.starts,
          s.ends, path.map(Dict.tags))
      }
    }
  }
}
