package graft

import graft.functions.RollingHash
import graft.text.TextOps
import org.apache.spark.sql.functions._

class RollingHashSpec extends SparkTestBase {

  test("native expression == column-math twin on varied strings") {
    val s = spark
    import s.implicits._
    val df = Seq("", "a", "a b", "the quick brown fox",
      "punct!@# and DIGITS 123", "repeated repeated repeated")
      .toDF("t")
      .select(col("t"),
        RollingHash.rolling_hash(col("t")).as("native"),
        TextOps.rollingHash(col("t")).as("twin"))
    assert(df.filter(col("native") =!= col("twin")).count() == 0)
    assert(df.filter(col("native").isNull).count() == 0)
  }

  test("codegen path actually generates (no fallback) and value is exact") {
    val s = spark
    import s.implicits._
    val one = Seq("a b").toDF("t")
      .select(RollingHash.rolling_hash(col("t")).as("h"))
    // hand value: ((97*31+32)*31+98) mod (2^31-1)
    assert(one.collect().head.getLong(0) ==
      ((97L * 31 + 32) * 31 + 98) % RollingHash.M)
    // over a real (non-local) scan the expression stays inside
    // WholeStageCodegen — no CodegenFallback node in the plan
    // (a literal input constant-folds to LocalTableScan, which proves
    // the interpreted path instead)
    val dir = "/root/testdata/sf0.001"
    if (new java.io.File(dir).exists()) {
      val q = spark.read.parquet(s"$dir/documents.parquet")
        .select(RollingHash.rolling_hash(col("text")).as("h"))
      val plan = q.queryExecution.executedPlan.toString
      // "*(n)" prefix = the operator runs inside WholeStageCodegen
      assert(plan.contains("*(1) Project [rolling_hash("), plan)
      assert(!plan.contains("CodegenFallback"), plan)
      assert(q.filter(col("h").isNull).count() == 0)
    }
  }

  test("null input yields null, not a crash") {
    val s = spark
    import s.implicits._
    val df = Seq(Some("x"), None).toDF("t")
      .select(RollingHash.rolling_hash(col("t")).as("h"))
    assert(df.filter(col("h").isNull).count() == 1)
  }
}
