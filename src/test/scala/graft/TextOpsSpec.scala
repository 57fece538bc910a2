package graft

import graft.text.TextOps
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkTestBase {

  private lazy val docs = {
    val s = spark
    import s.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the bank"),
      (1L, "the quick brown fox jumps over the lazy dog near the river"),
      (2L, "completely different text with unique words only here"),
      (3L, "the quick brown fox jumps over the lazy dog near the bank"),
      (4L, "der hund ist ein guter hund und das ist gut"))
      .toDF("doc_id", "text")
  }

  test("exact dedup groups identical texts, keeps min doc_id") {
    val got = TextOps.exactDupGroups(docs)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got.contains((0L, 2L))) // docs 0 and 3 identical
    assert(got.count(_._2 == 1L) == 3)
  }

  test("dedup keep-list maps dups to the canonical id") {
    val got = TextOps.dedupKeepList(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(0L) == 0L && got(3L) == 0L)
    assert(got(1L) == 1L && got(2L) == 2L)
  }

  test("minhash: identical docs identical sigs; near-dups share most; " +
      "distinct docs differ") {
    val sig = TextOps.minhashSignature(docs, k = 4, numHashes = 8)
      .collect().map(r => r.getLong(0) ->
        (1 to 8).map(r.getLong)).toMap
    assert(sig(0L) == sig(3L))
    val shared01 = sig(0L).zip(sig(1L)).count { case (a, b) => a == b }
    val shared02 = sig(0L).zip(sig(2L)).count { case (a, b) => a == b }
    assert(shared01 > shared02)
    assert(shared02 == 0)
  }

  test("LSH candidates find exact+near dups, not unrelated docs") {
    val pairs = TextOps.lshCandidates(docs, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 3L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("simhash: identical texts equal; near-dups closer than distinct") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val fp = TextOps.simhash(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(0L) == fp(3L))
    assert(ham(fp(0L), fp(1L)) <= ham(fp(0L), fp(2L)))
  }

  test("language id picks en for English, de for German") {
    val got = TextOps.languageId(docs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(0L) == "en")
    assert(got(4L) == "de")
  }

  test("quality + token counts are consistent") {
    val q = TextOps.qualityScore(docs).filter(col("doc_id") === 0)
      .collect().head
    assert(q.getAs[Int]("n_tokens") == 12)
    assert(q.getAs[Double]("alpha_ratio") == 1.0) // letters+spaces only
    val t = TextOps.tokenCounts(docs).filter(col("doc_id") === 0)
      .collect().head
    assert(t.getAs[Int]("ws_tokens") == 12)
    assert(t.getAs[Int]("bpeish_tokens") == 12) // no punct in fixture
  }

  test("LSH star pairing: 1000-copy duplicate cluster emits 999 pairs, " +
      "all to the min doc_id (never O(c^2))") {
    val s = spark
    import s.implicits._
    val boiler = "the same boilerplate licence text repeated in every " +
      "file verbatim word for word"
    val rows = (0L until 1000L).map(i => (i, boiler)) :+
      (2000L, "totally unrelated content words nothing shared here at all")
    val pairs = TextOps.lshCandidates(rows.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length == 999)
    assert(pairs.forall(_._1 == 0L))
    assert(pairs.map(_._2).toSet == (1L until 1000L).toSet)
  }

  test("LSH star pairing keeps near-dups connected (components match " +
      "the all-pairs candidate graph)") {
    val pairs = TextOps.lshCandidates(docs, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // union-find over the star pairs: 0,1,3 must share a component
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
    assert(find(0L) == find(3L)) // exact dups
    assert(find(0L) == find(1L)) // near-dup
    assert(find(2L) != find(0L) && find(4L) != find(0L))
  }

  test("fingerprint is order-sensitive, rolling hash is stable") {
    val s = spark
    import s.implicits._
    val two = Seq((0L, "a b"), (1L, "b a")).toDF("doc_id", "text")
    val fps = TextOps.fingerprint(two)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(0L) != fps(1L))
    // hand-computed: 'a b' = ((0*31+97)*31+32)*31+98 mod (2^31-1)
    assert(fps(0L) == ((97L * 31 + 32) * 31 + 98) % TextOps.M)
  }
}
