package graft

import graft.functions.ShingleHashes
import graft.text.TextOps
import org.apache.spark.sql.functions._

class ShingleHashesSpec extends SparkTestBase {

  test("native shingle hashes == column-math twin (slice+concat_ws+" +
      "rolling hash) for k in 1..4") {
    val s = spark
    import s.implicits._
    val df = Seq(
      "a b c d e f",
      "single",
      "two words",
      "x", // shorter than k
      "repeated repeated repeated repeated").toDF("text")
    (1 to 4).foreach { k =>
      // NB the n<k guard: Spark sequence(1, 0) is DESCENDING [1, 0],
      // not empty — the unguarded form emits bogus shingles for short
      // texts (the native expression returns [] there)
      val twin = expr(
        s"if(size(split(text,' ')) < $k, array(), " +
          s"transform(transform(sequence(1, size(split(text,' '))-${k - 1}), " +
          s"i -> concat_ws(' ', slice(split(text,' '), i, $k))), s -> " +
          s"aggregate(transform(split(s, ''), ch -> ascii(ch)), 0L, " +
          s"(acc, x) -> pmod(acc * 31 + x, ${TextOps.M}L))))")
      val bad = df
        .select(ShingleHashes.shingle_hashes(col("text"), k).as("native"),
          twin.as("twin"))
        .filter(not(col("native") <=> col("twin")))
        .count()
      assert(bad == 0, s"k=$k")
    }
  }

  test("hand value: 1-token shingle of 'a b' = [hash(a), hash(b)]") {
    val s = spark
    import s.implicits._
    val got = Seq("a b").toDF("text")
      .select(ShingleHashes.shingle_hashes(col("text"), 1).as("h"))
      .collect().head.getSeq[Long](0)
    assert(got == Seq(97L, 98L))
  }
}
