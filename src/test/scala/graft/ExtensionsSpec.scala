package graft

import graft.functions.{ArrayDotExpr, RollingHash}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** GraftExtensions is active on the shared test session via
  * `spark.sql.extensions` (SparkTestBase) — exactly how a
  * spark-submit user would enable it. */
class ExtensionsSpec extends SparkTestBase {

  test("SQL surface: rolling_hash / shingle_hashes / array_dot registered") {
    val r = spark.sql(
      """SELECT rolling_hash('abc') AS rh,
        |       shingle_hashes('a b c', 2) AS sh,
        |       array_dot(array(1D, 2D), array(3D, 4D)) AS d""".stripMargin)
      .head
    assert(r.getLong(0) == RollingHash.hash(UTF8String.fromString("abc")))
    assert(r.getSeq[Long](1).length == 2) // "a b", "b c"
    assert(r.getDouble(2) == 11.0)
  }

  test("SQL rolling_hash equals the column-math fold on real text") {
    val s = spark
    import s.implicits._
    val docs = Seq("src code tokens", "x", "a  b").toDF("text")
    docs.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      "SELECT text, rolling_hash(text) AS h FROM ext_docs")
    val viaApi = docs.select(col("text"),
      graft.functions.RollingHash.rolling_hash(col("text")).as("h"))
    assert(viaSql.collect().toSeq.sortBy(_.getString(0)) ==
      viaApi.collect().toSeq.sortBy(_.getString(0)))
  }

  test("optimizer rule: aggregate(zip_with *) plan rewritten to array_dot") {
    val s = spark
    import s.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)))
      .toDF("a", "b") // Array[Double] encoder → containsNull = false
      .repartition(2) // keep ConvertToLocalRelation from pre-evaluating
    val q = df.select(expr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
      .as("dot"))
    val opt = q.queryExecution.optimizedPlan
    assert(opt.expressions.exists(_.exists(_.isInstanceOf[ArrayDotExpr])),
      s"expected ArrayDotExpr in optimized plan:\n$opt")
    assert(q.head.getDouble(0) == 32.0)
  }

  test("rewrite preserves null-on-length-mismatch semantics") {
    val s = spark
    import s.implicits._
    val df = Seq((Array(1.0, 2.0), Array(1.0))).toDF("a", "b")
    val q = df.select(expr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
      .as("dot"))
    assert(q.head.isNullAt(0))
  }

  test("rewrite can be disabled with spark.graft.nativeDotRewrite=false") {
    val s = spark
    import s.implicits._
    spark.conf.set("spark.graft.nativeDotRewrite", "false")
    try {
      val df = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
        .repartition(2)
      val q = df.select(expr(
        "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
        .as("dot"))
      val opt = q.queryExecution.optimizedPlan
      assert(!opt.expressions.exists(_.exists(_.isInstanceOf[ArrayDotExpr])))
      assert(q.head.getDouble(0) == 11.0)
    } finally spark.conf.unset("spark.graft.nativeDotRewrite")
  }
}
