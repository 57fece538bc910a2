package graft

import org.apache.spark.sql.functions._

/** Co-located joins via bucketing (SCALE.md): two tables bucketed by
  * the join key join WITHOUT a shuffle — the physical plan has zero
  * Exchange operators. At 100 TB this is the difference between
  * re-shuffling the corpus per join and reading co-located buckets;
  * locally it proves the engine's outputs are written join-ready. */
class BucketingSpec extends SparkTestBase {

  test("bucketed self-join plans with no exchange; values match unbucketed") {
    val s = spark
    import s.implicits._
    // force the sort-merge path: a broadcast join of these tiny
    // tables would plan a BroadcastExchange and hide the property
    // under test (co-location makes the SHUFFLE exchange vanish)
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val docs = (0L until 200L)
      .map(i => (i, s"repo${i % 7}", s"text $i")).toDF("doc_id", "repo", "text")

    docs.write.mode("overwrite")
      .bucketBy(8, "doc_id").sortBy("doc_id")
      .saveAsTable("bkt_docs")
    docs.select(col("doc_id"), length(col("text")).as("n"))
      .write.mode("overwrite")
      .bucketBy(8, "doc_id").sortBy("doc_id")
      .saveAsTable("bkt_stats")
    try {
      val j = s.table("bkt_docs").join(s.table("bkt_stats"), "doc_id")
        .select(col("doc_id"), col("repo"), col("n"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n${plan.take(800)}")
      val expect = docs
        .join(docs.select(col("doc_id"), length(col("text")).as("n")),
          "doc_id")
        .select(col("doc_id"), col("repo"), col("n"))
        .collect().map(_.toString).sorted.toSeq
      assert(j.collect().map(_.toString).sorted.toSeq == expect)
    } finally {
      s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      s.sql("DROP TABLE IF EXISTS bkt_docs")
      s.sql("DROP TABLE IF EXISTS bkt_stats")
    }
  }
}
