package graft

import graft.vectors.VectorOps
import org.apache.spark.sql.functions._

class VectorOpsSpec extends SparkTestBase {

  private lazy val emb = {
    val s = spark
    import s.implicits._
    // 3 tight clusters in 4-d + one orthogonal loner
    Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0),
      (1L, Array(0.9f, 0.1f, 0f, 0f), 0),
      (2L, Array(0.95f, 0.05f, 0f, 0f), 0),
      (3L, Array(0f, 1f, 0f, 0f), 1),
      (4L, Array(0f, 0.9f, 0.1f, 0f), 1),
      (5L, Array(0f, 0f, 0f, 1f), 2))
      .toDF("vec_id", "embedding", "label")
  }

  test("brute-force top-k: nearest neighbor is the same cluster") {
    val top1 = VectorOps.bruteForceTopK(emb, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(1L, 2L).contains(top1(0L)))
    assert(top1(3L) == 4L && top1(4L) == 3L)
    // loner's best is low-cosine but deterministic (id tie-break)
    assert(top1(5L) == 0L)
  }

  test("cosine values are exact for hand-computable vectors") {
    val rows = VectorOps.bruteForceTopK(emb, k = 5)
      .filter(col("id_a") === 0 && col("id_b") === 3)
      .collect()
    assert(rows.head.getDouble(2) == 0.0) // orthogonal
  }

  test("LSH top-1 equals the best IN-BUCKET candidate (the exact LSH " +
      "contract, for any signature)") {
    // full exact ranking: (id_a, id_b) -> cos with the pinned tie-break
    val ranked = VectorOps.bruteForceTopK(emb, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    val sigs = VectorOps.withUnitVec(emb)
      .withColumn("sig",
        VectorOps.hyperplaneSignature(col("unit"), 2))
      .select("vec_id", "sig")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val lsh = VectorOps.lshNeighbors(emb, planes = 2, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = ranked.groupBy(_._1).flatMap { case (a, rows) =>
      rows.sortBy(_._3).map(_._2)
        .find(b => sigs(b) == sigs(a)).map(a -> _)
    }
    assert(lsh == expected)
    assert(lsh.nonEmpty)
  }

  test("centroids are element-wise means per label") {
    val c = VectorOps.centroids(emb)
      .collect().map(r => r.getInt(0) ->
        r.getSeq[Double](1)).toMap
    assert(math.abs(c(1)(1) - 0.95) < 1e-6) // (1.0+0.9)/2
    assert(c(2)(3) == 1.0)
    assert(c.keySet == Set(0, 1, 2))
  }

  test("native array_dot is bit-equal to the column-math fold") {
    val dir = "/root/testdata/sf0.001"
    if (new java.io.File(dir).exists()) {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
      val both = e.select(
        VectorOps.dot(col("v"), col("v")).as("native"),
        VectorOps.dotColumnMath(col("v"), col("v")).as("twin"))
      assert(both.filter(col("native") =!= col("twin")).count() == 0)
    }
  }

  test("top-k kernel == relational window twin, row for row") {
    val dir = "/root/testdata/sf0.001"
    if (new java.io.File(dir).exists()) {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val key = (df: org.apache.spark.sql.DataFrame) =>
        df.orderBy("id_a", "rk").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
            r.getInt(3))).toSeq
      assert(key(VectorOps.bruteForceTopKKernel(e, 5).select(
          col("id_a"), col("id_b"), col("cos"), col("rk"))) ==
        key(VectorOps.bruteForceTopK(e, 5)))
    }
  }

  test("cosine near-dup finds only the tight same-direction pairs") {
    val pairs = VectorOps.cosineNearDup(emb, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L), (0L, 2L), (1L, 2L), (3L, 4L)))
  }

  test("IVF ANN: top-1 matches brute force when truth shares the cell") {
    val bf = VectorOps.bruteForceTopK(emb, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ivf = VectorOps.ivfNeighbors(emb, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // cluster members (labels 0 and 1) must agree with brute force
    Seq(0L, 1L, 2L, 3L, 4L).foreach { id =>
      assert(ivf.get(id).contains(bf(id)), s"ivf($id)")
    }
  }

  test("real embeddings table: every vector gets k neighbors, " +
      "cos within [-1, 1]") {
    val dir = "/root/testdata/sf0.001"
    if (new java.io.File(dir).exists()) {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val got = VectorOps.bruteForceTopK(e, k = 3).cache()
      val n = e.count()
      assert(got.count() == n * 3)
      assert(got.filter(col("cos") > 1.0001 || col("cos") < -1.0001)
        .count() == 0)
      got.unpersist()
    }
  }
}
