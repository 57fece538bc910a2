package graft.crf

import graft.core.{Dict, Sentence, TaggedSentence}
import graft.features.Features
import org.apache.spark.sql.Dataset

/** Linear-CRF scoring + BIO-constrained Viterbi decoding.
  *
  * Re-derivation of the reference's CRF decode path (SURVEY.md §2.8,
  * §7.3): emission scores are a linear model over the discrete feature
  * templates (replacing the BiLSTM — models/decoders.py:121-154), the
  * transition matrix carries the reference's exact virtual-tag and BIO
  * constraint structure (models/decoders.py:17-25, 48-58;
  * models/model_builder.py:13-22), and decoding replicates
  * models/decoders.py:156-196 including the START-init values, the
  * virtual-tag exclusion ([:-2] slices) and numpy's first-max argmax
  * tie-break (lowest tag id wins).
  */
object Crf {

  val K: Int = Dict.K          // 9 real tags, lexicographic ids
  val START: Int = K           // virtual (decoders.py:48-58)
  val END: Int = K + 1
  val WALL = -1000f            // constraint value (decoders.py:17-25)
  val NEG = -2000f             // non-START init (decoders.py:168-170)

  /** BIO/virtual-tag wall STRUCTURE — the constraint set of
    * decoders.py:17-25 / model_builder.py:13-22 plus the START-column /
    * END-row walls of decoders.py:48-58. A pure structural constant
    * (no weights), shared by the fitted default, [[CrfTrainer]] and
    * [[FitCrf]]. Lives in [[Dict]] (a forwarding def, no monitor) so
    * the DefaultModel → FitCrf.weights path never re-enters Crf —
    * concurrent first access of Crf.emissionWeights and
    * DefaultModel.fitted would otherwise deadlock on opposite-order
    * lazy-val monitors. */
  def walls: Array[Array[Boolean]] = Dict.walls

  /** Default emission weights W(tag)(feature), K × 24 — FITTED, not
    * hand-set: closed-form log-odds (SURVEY.md §7.3) over the labeled
    * synthetic training corpus, derived once per JVM by
    * [[DefaultModel]]. The eng model over the reference's real CoNLL
    * data is fitted by the same code path ([[FitCrf]]; gated by
    * EngModelSpec). */
  lazy val emissionWeights: Array[Array[Float]] = DefaultModel.fitted.featW

  /** Default (K+2)² transition matrix T(from)(to): log bigram
    * frequencies fitted from the labeled synthetic training corpus
    * ([[DefaultModel]]), with [[walls]] pinned at −1000 exactly where
    * constrained_transition_init puts them. */
  lazy val transitions: Array[Array[Float]] = DefaultModel.fitted.trans

  /** Emission score of one token from its feature bitmask. */
  def emit(mask: Int, w: Array[Array[Float]]): Array[Float] = {
    val out = new Array[Float](K)
    var t = 0
    while (t < K) {
      var s = 0f
      var m = mask
      while (m != 0) {
        val f = java.lang.Integer.numberOfTrailingZeros(m)
        s += w(t)(f)
        m &= m - 1
      }
      out(t) = s
      t += 1
    }
    out
  }

  /** Viterbi decode over per-token emission vectors (length K each).
    * Exact semantics of decoders.py:156-196: init START=0 / else −2000;
    * DP over all K+2 source tags; real tags only as targets; first-max
    * argmax; terminal step adds T(·, END). Returns tag ids. */
  def viterbi(emissions: Array[Array[Float]],
      trans: Array[Array[Float]]): Array[Int] = {
    val T = emissions.length
    if (T == 0) return Array.empty
    val prev = new Array[Float](K + 2)
    java.util.Arrays.fill(prev, NEG)
    prev(START) = 0f
    val back = Array.ofDim[Int](T, K)
    val cur = new Array[Float](K + 2)
    var t = 0
    while (t < T) {
      val em = emissions(t)
      var to = 0
      while (to < K) {
        var bestFrom = 0
        var best = prev(0) + trans(0)(to)
        var from = 1
        while (from < K + 2) {
          val s = prev(from) + trans(from)(to)
          if (s > best) { best = s; bestFrom = from } // first max wins
          from += 1
        }
        cur(to) = best + em(to)
        back(t)(to) = bestFrom
        to += 1
      }
      cur(START) = NEG; cur(END) = NEG
      System.arraycopy(cur, 0, prev, 0, K + 2)
      t += 1
    }
    // terminal transition to END (decoders.py:184-187)
    var bestTag = 0
    var best = prev(0) + trans(0)(END)
    var tag = 1
    while (tag < K) {
      val s = prev(tag) + trans(tag)(END)
      if (s > best) { best = s; bestTag = tag }
      tag += 1
    }
    val path = new Array[Int](T)
    path(T - 1) = bestTag
    var i = T - 1
    while (i > 0) {
      path(i - 1) = back(i)(path(i))
      i -= 1
    }
    path
  }

  private def logSumExp(xs: Array[Double]): Double = {
    var mx = xs(0); var i = 1
    while (i < xs.length) { if (xs(i) > mx) mx = xs(i); i += 1 }
    if (mx == Double.NegativeInfinity) return mx
    var s = 0.0; i = 0
    while (i < xs.length) { s += math.exp(xs(i) - mx); i += 1 }
    mx + math.log(s)
  }

  /** Forward algorithm — the CRF log-partition (decoders.py:66-93,
    * log_sum_exp_dim_0 util.py:130-143). Train-only in the reference
    * (the denominator of the NLL loss); provided for completeness so a
    * max-likelihood fit has its kernels. One delta, documented: the
    * reference lets the sum range over virtual START/END mid-path and
    * relies on −1000 walls to suppress them (their e^-1000 mass
    * underflows to zero in float anyway); this sums over real-tag
    * paths exactly — same value, cleaner math, and the brute-force
    * twin in CrfLossSpec enumerates the identical path space. */
  def forward(emissions: Array[Array[Float]],
      trans: Array[Array[Float]]): Double = {
    val T = emissions.length
    require(T > 0, "forward of an empty sentence is undefined")
    var alpha = Array.tabulate(K)(to =>
      (trans(START)(to) + emissions(0)(to)).toDouble)
    val buf = new Array[Double](K)
    var t = 1
    while (t < T) {
      val next = new Array[Double](K)
      var to = 0
      while (to < K) {
        var from = 0
        while (from < K) {
          buf(from) = alpha(from) + trans(from)(to)
          from += 1
        }
        next(to) = logSumExp(buf) + emissions(t)(to)
        to += 1
      }
      alpha = next
      t += 1
    }
    var tag = 0
    while (tag < K) { buf(tag) = alpha(tag) + trans(tag)(END); tag += 1 }
    logSumExp(buf)
  }

  /** Gold-path score (decoders.py:95-108): START-prefixed transition
    * chain + emissions + terminal T(last, END). */
  def goldScore(emissions: Array[Array[Float]],
      trans: Array[Array[Float]], tags: Array[Int]): Double = {
    require(tags.length == emissions.length && tags.nonEmpty)
    var s = (trans(START)(tags(0)) + emissions(0)(tags(0))).toDouble
    var t = 1
    while (t < tags.length) {
      s += trans(tags(t - 1))(tags(t)) + emissions(t)(tags(t))
      t += 1
    }
    s + trans(tags.last)(END)
  }

  /** Per-sentence CRF negative log-likelihood
    * (decoders.py:110-140: forward − gold; the reference's unused
    * `interp_crf_score` branch is dead code and not implemented). */
  def nll(emissions: Array[Array[Float]],
      trans: Array[Array[Float]], tags: Array[Int]): Double =
    forward(emissions, trans) - goldScore(emissions, trans, tags)

  /** Per-token softmax-classifier decode (decoders.py:241-269): argmax
    * over the emission scores token by token — NO transition
    * structure, np.argmax first-max tie-break. The reference's
    * independent-classification alternative to the chain CRF. */
  def classify(emissions: Array[Array[Float]]): Array[Int] =
    emissions.map { em =>
      var best = 0
      var i = 1
      while (i < em.length) {
        if (em(i) > em(best)) best = i // first max wins
        i += 1
      }
      best
    }

  /** The classifier's mean per-token NLL (decoders.py:246-261:
    * pickneglogsoftmax averaged over tokens). */
  def classifierNll(emissions: Array[Array[Float]],
      tags: Array[Int]): Double = {
    require(tags.length == emissions.length && tags.nonEmpty)
    var s = 0.0
    var t = 0
    while (t < tags.length) {
      val em = emissions(t).map(_.toDouble)
      s += logSumExp(em) - em(tags(t))
      t += 1
    }
    s / tags.length
  }

  /** Classifier decode over a sentence stream — same fused narrow
    * kernel shape as [[tag]], transitions unused. */
  def classifyTag(sentences: Dataset[Sentence],
      w: Array[Array[Float]]): Dataset[TaggedSentence] = {
    val spark = sentences.sparkSession
    import spark.implicits._
    val bW = spark.sparkContext.broadcast(w)
    val bGaz = spark.sparkContext.broadcast(Dict.gazIndex)
    sentences.mapPartitions { it =>
      val w0 = bW.value; val gaz = bGaz.value
      it.map { s =>
        val masks = Features.sentenceBits(s.tokens, gaz)
        val path = classify(masks.map(emit(_, w0)))
        TaggedSentence(s.repo, s.path, s.sentIdx, s.tokens, s.starts,
          s.ends, path.map(Dict.tags))
      }
    }
  }

  /** Brute-force exact decode for property tests (enumerates all K^T
    * paths). Tie-break matches the DP's first-max backtrace exactly:
    * among max-score paths, the one whose REVERSED tag sequence is
    * lexicographically smallest — the final argmax picks the lowest
    * final tag first (decoders.py:186), then each backpointer picks the
    * lowest source tag (decoders.py:180). */
  def bruteForce(emissions: Array[Array[Float]],
      trans: Array[Array[Float]]): (Array[Int], Float) = {
    val T = emissions.length
    var bestPath: Array[Int] = null
    var bestScore = Float.NegativeInfinity
    def revLess(a: List[Int], b: Array[Int]): Boolean = {
      // a is already reversed (head = last tag); compare vs b reversed
      var i = 0
      var cur = a
      while (cur.nonEmpty) {
        val x = cur.head
        val y = b(b.length - 1 - i)
        if (x != y) return x < y
        cur = cur.tail; i += 1
      }
      false
    }
    def rec(t: Int, prevTag: Int, score: Float, path: List[Int]): Unit = {
      if (t == T) {
        val s = score + trans(prevTag)(END)
        if (s > bestScore ||
            (s == bestScore && revLess(path, bestPath))) {
          bestScore = s; bestPath = path.reverse.toArray
        }
      } else {
        var tag = 0
        while (tag < K) {
          rec(t + 1, tag,
            score + trans(prevTag)(tag) + emissions(t)(tag), tag :: path)
          tag += 1
        }
      }
    }
    rec(0, START, 0f, Nil)
    (bestPath, bestScore)
  }

  /** Decode one sentence in place: features → emissions → Viterbi.
    * Shared by [[tag]] and the fully-fused corpus kernel in
    * [[graft.pipeline.Pipeline]]. */
  def decodeSentence(s: Sentence, w: Array[Array[Float]],
      tr: Array[Array[Float]],
      gaz: Map[String, Vector[(Vector[String], String, Int)]])
      : TaggedSentence = {
    val masks = Features.sentenceBits(s.tokens, gaz)
    val em = masks.map(emit(_, w))
    val path = viterbi(em, tr)
    TaggedSentence(s.repo, s.path, s.sentIdx, s.tokens, s.starts,
      s.ends, path.map(Dict.tags))
  }

  /** The fused featurize→emit→Viterbi kernel: one narrow mapPartitions
    * stage, broadcast weights, no shuffle (SURVEY.md §4 custom piece 1).
    * Scales linearly with cores — zero cross-sentence state. */
  def tag(sentences: Dataset[Sentence]): Dataset[TaggedSentence] =
    tag(sentences, emissionWeights, transitions)

  /** Same kernel with explicit weights — the serve path for a model
    * trained by [[CrfTrainer]] / loaded via [[graft.io.ModelIO]]. */
  def tag(sentences: Dataset[Sentence], w: Array[Array[Float]],
      tr: Array[Array[Float]]): Dataset[TaggedSentence] = {
    val spark = sentences.sparkSession
    import spark.implicits._
    val bW = spark.sparkContext.broadcast(w)
    val bT = spark.sparkContext.broadcast(tr)
    val bGaz = spark.sparkContext.broadcast(Dict.gazIndex)
    sentences.mapPartitions { it =>
      val w0 = bW.value; val tr0 = bT.value; val gaz = bGaz.value
      it.map(decodeSentence(_, w0, tr0, gaz))
    }
  }
}
