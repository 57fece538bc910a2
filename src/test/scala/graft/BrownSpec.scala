package graft

import graft.features.Brown
import org.apache.spark.sql.functions._

/** The Brown-cluster trainer: distributional structure is recovered,
  * output is deterministic, and the TSV round-trips through the same
  * densification the reference's reader applies. */
class BrownSpec extends SparkTestBase {

  // two distributional classes: A-words are always followed by
  // B-words and vice versa — the class-bigram objective is maximized
  // exactly by the A/B split
  private val aWords = Seq("alpha", "apex", "arc")
  private val bWords = Seq("bolt", "brim", "bay")
  private def corpus: Seq[Array[String]] = {
    // deterministic pseudo-random pairing, no RNG (varied pairs so no
    // single (a,b) dominates)
    for (i <- 0 until 60) yield Array(
      aWords(i % 3), bWords((i / 3) % 3),
      aWords((i / 2) % 3), bWords(i % 3))
  }

  test("exchange recovers the two distributional classes") {
    val s = spark
    import s.implicits._
    val tsv = Brown.cluster(corpus.toDS(), numClusters = 2, passes = 3)
      .collect().map(r => r.getString(1) -> r.getString(0)).toMap
    val aBits = aWords.map(tsv).distinct
    val bBits = bWords.map(tsv).distinct
    assert(aBits.size == 1, s"A-words split: $aBits")
    assert(bBits.size == 1, s"B-words split: $bBits")
    assert(aBits.head != bBits.head, "A and B merged")
  }

  test("objective never decreases across exchange passes (each move " +
      "is argmax by construction — spot-check via stability)") {
    val s = spark
    import s.implicits._
    val (uni, big) = Brown.corpusCounts(corpus.toDS())
    val freq = uni.map(_._2)
    val cls1 = Brown.exchange(freq, big, 2, 1)
    val cls3 = Brown.exchange(freq, big, 2, 3)
    // converged: extra passes change nothing on this fixture
    assert(cls1.toSeq == cls3.toSeq)
  }

  test("deterministic: same input → identical TSV, bitstrings are " +
      "distinct per cluster and round-trip through the q33 scan") {
    val s = spark
    import s.implicits._
    val t1 = Brown.cluster(corpus.toDS(), numClusters = 2)
      .orderBy("word").collect().toSeq
    val t2 = Brown.cluster(corpus.toDS(), numClusters = 2)
      .orderBy("word").collect().toSeq
    assert(t1 == t2)
    val tsv = Brown.cluster(corpus.toDS(), numClusters = 2)
    val dense = graft.conll.ConllOps.brownClusters(tsv)
    val ids = dense.select("clusterId").distinct()
      .as[Int].collect().sorted.toSeq
    assert(ids == Seq(0, 1), s"dense ids: $ids")
    // clusterMap = the same densification as a Map
    val m = Brown.clusterMap(tsv)
    assert(m.keySet == (aWords ++ bWords).toSet)
    assert(m.values.toSet == Set(0, 1))
  }

  test("pruning bounds driver state: minCount drops singletons before " +
      "collect") {
    val s = spark
    import s.implicits._
    val withRare = corpus :+ Array("alpha", "zonk")
    val (uni, big) = Brown.corpusCounts(withRare.toDS(), minCount = 2)
    assert(!uni.exists(_._1 == "zonk"))
    // bigrams touching the pruned word are dropped too
    val ids = uni.map(_._1).zipWithIndex.toMap
    assert(big.forall { case (x, y, _) => x < uni.length && y < uni.length })
    assert(ids.contains("alpha"))
  }

  test("driver-memory guard: an oversized pruned table fails BEFORE " +
      "collect with the knobs to raise") {
    val s = spark
    import s.implicits._
    val e = intercept[IllegalStateException] {
      Brown.corpusCounts(corpus.toDS(), maxDriverRows = 2)
    }
    assert(e.getMessage.contains("minCount"))
    assert(e.getMessage.contains("maxDriverRows"))
  }

  test("clusterMapByBits keeps numerically-equal bitstrings distinct " +
      "('010' vs '10' are different tree leaves)") {
    val s = spark
    import s.implicits._
    val tsv = Seq(("010", "apple", 5L), ("10", "bank", 9L),
      ("010", "pear", 3L)).toDF("bits", "word", "freq")
    // reader-parity densify conflates them (int(bits,2) == 2 for both)
    assert(Brown.clusterMap(tsv).values.toSet.size == 1)
    val byBits = Brown.clusterMapByBits(tsv)
    assert(byBits("apple") == byBits("pear"))
    assert(byBits("apple") != byBits("bank"))
  }
}
