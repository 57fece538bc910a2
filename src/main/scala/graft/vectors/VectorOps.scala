package graft.vectors

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>):
  * brute-force cosine top-k as the exact baseline, and an LSH
  * (random-hyperplane signature) bucketed variant as the scale path.
  * Everything is `zip_with`/`aggregate` column math — codegen'd, no
  * UDFs, no driver-side loops.
  */
object VectorOps {

  /** Dot product of two array<double> columns: the native codegen'd
    * expression ([[graft.functions.ArrayDot]]) — identical
    * index-ascending IEEE fold to
    * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` (bit-equal results,
    * asserted in VectorOpsSpec) at a fraction of the per-element
    * lambda-dispatch cost. */
  def dot(a: Column, b: Column): Column =
    graft.functions.ArrayDot.array_dot(a, b)

  /** The column-math twin (kept for the equivalence test). */
  def dotColumnMath(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), _ + _)

  def norm(a: Column): Column = sqrt(dot(a, a))

  private def asDouble(c: Column): Column =
    transform(c, x => x.cast("double"))

  /** Normalize once up front: cosine becomes a plain dot product, so
    * the pairwise stage does one fused multiply-add pass per pair.
    * The norm is computed once per vector into its own column — put
    * inside the transform lambda it would re-evaluate per ELEMENT
    * (O(d²) per vector). */
  def withUnitVec(emb: DataFrame, vecCol: String = "embedding")
      : DataFrame =
    emb.withColumn("nrm", norm(asDouble(col(vecCol))))
      .withColumn("unit",
        transform(asDouble(col(vecCol)), x => x / col("nrm")))
      .drop("nrm")

  /** Exact brute-force cosine top-k neighbors per vector.
    * Cost model: |V|² dot products through one shuffle-free cross
    * join against a broadcast right side (embedding dims are small;
    * for |V| beyond broadcast limits use [[lshNeighbors]]). */
  def bruteForceTopK(emb: DataFrame, k: Int = 5): DataFrame = {
    val u = withUnitVec(emb).select(
      col("vec_id"), col("unit")).localCheckpoint(true)
    // spread the probe side: a small-SF table is ONE split, and a
    // broadcast nested-loop join inherits the probe's partitioning —
    // without this the |V|² scan runs on a single core
    val a = u.repartition(u.sparkSession.sparkContext.defaultParallelism)
      .select(col("vec_id").as("id_a"), col("unit").as("ua"))
    val b = u.select(col("vec_id").as("id_b"), col("unit").as("ub"))
    val pairs = a.join(broadcast(b), col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(dot(col("ua"), col("ub")), 4).as("cos"))
    val w = Window.partitionBy("id_a")
      .orderBy(desc("cos"), asc("id_b")) // deterministic tie-break
    pairs.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("id_a"), col("id_b"), col("cos"), col("rk"))
  }

  /** Kernel twin of [[bruteForceTopK]]: same |V|² dot products, but
    * the top-k selection runs as a bounded heap inside one
    * `mapPartitions` pass instead of materializing |V|² join rows and
    * window-sorting them — no shuffle at all, and the pair rows that
    * lose never exist. Bit-identical output (same normalize-once unit
    * vectors, same index-ascending dot fold, same HALF_UP round(4),
    * same (cos desc, id_b asc) tie-break): the q23 oracle and the
    * relational twin both confirm. Valid under exactly the same
    * precondition as the broadcast in [[bruteForceTopK]] — |V|·d
    * doubles must fit one executor; past that, LSH/IVF. */
  def bruteForceTopKKernel(emb: DataFrame, k: Int = 5): DataFrame =
    bruteForceTopKKernelOnUnits(
      withUnitVec(emb).select(col("vec_id"), col("unit")), k)

  /** [[bruteForceTopKKernel]] over a prebuilt (vec_id, unit) frame —
    * the r6 query gate derives the unit vectors ONCE per session
    * (Queries3.unitV) and feeds all four vector operators, instead of
    * each re-scanning and re-normalizing the embeddings table. */
  def bruteForceTopKKernelOnUnits(units: DataFrame, k: Int = 5)
      : DataFrame = {
    val spark = units.sparkSession
    import spark.implicits._
    val u = units.select(col("vec_id"), col("unit"))
      .as[(Long, Seq[Double])]
    val all: Array[(Long, Array[Double])] =
      u.collect().map { case (id, v) => (id, v.toArray) }.sortBy(_._1)
    val bAll = spark.sparkContext.broadcast(all)
    // a small-SF embeddings table arrives as ONE parquet split; the
    // probe side must spread across cores or the whole |V|² scan runs
    // single-threaded (2000 rows is 1 input partition but 4M dots)
    u.repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { it =>
      val vs = bAll.value
      it.flatMap { case (idA, uaSeq) =>
        val ua = uaSeq.toArray
        // bounded selection: worst-first ordering so the head is the
        // candidate to evict; (cos desc, id_b asc) = keep the entry
        // with LOWER cos (or equal cos and HIGHER id) as "worse"
        val heap = new scala.collection.mutable.PriorityQueue[(Double, Long)]()(
          Ordering.by { case (cos, idB) => (-cos, idB) })
        var j = 0
        while (j < vs.length) {
          val (idB, ub) = vs(j)
          if (idB != idA) {
            var d = 0.0; var i = 0
            val n = math.min(ua.length, ub.length)
            while (i < n) { d += ua(i) * ub(i); i += 1 }
            // round only contenders: if d is more than one 4-dp
            // rounding step below the current worst, round(d) < worst
            // is certain and the candidate cannot place (even on the
            // id tie-break, which needs equal rounded cos)
            if (heap.size < k || d >= heap.head._1 - 6e-5) {
              // valueOf (decimal-string repr), not new BigDecimal(d):
              // Spark's Round on DoubleType goes through
              // BigDecimal(double) == valueOf semantics
              val cos = java.math.BigDecimal.valueOf(d)
                .setScale(4, java.math.RoundingMode.HALF_UP)
                .doubleValue()
              if (heap.size < k) heap.enqueue((cos, idB))
              else {
                val (wc, wi) = heap.head
                if (cos > wc || (cos == wc && idB < wi)) {
                  heap.dequeue(); heap.enqueue((cos, idB))
                }
              }
            }
          }
          j += 1
        }
        val ranked: Seq[(Double, Long)] = heap.dequeueAll.reverse
        ranked.zipWithIndex.map {
          case ((cos, idB), rk0) => (idA, idB, cos, rk0 + 1)
        }
      }
    }.toDF("id_a", "id_b", "cos", "rk")
  }

  /** Deterministic pseudo-random hyperplane: component j of plane p is
    * a Rademacher ±1 drawn from pure BIGINT hash arithmetic (multiply
    * mod 2^31, top bit as the sign) — bit-reproducible in ANY SQL
    * engine, unlike the round-1 sin() variant whose libm last-ulp sign
    * flips made q24 un-oracle-able. Random-sign hyperplanes are the
    * standard SimHash/SRP construction (Charikar 2002). The projection
    * folds in index order (zip_with + sequential aggregate), so the
    * float sum — and therefore the sign pattern — is bit-identical
    * across engines. Sign pattern over `planes` planes = bucket key. */
  def hyperplaneSignature(unit: Column, planes: Int): Column =
    concat_ws("", (0 until planes).map { p =>
      val comp = transform(sequence(lit(0), size(unit) - 1), j => {
        val x = pmod(j.cast("long") * 40503L + lit((p + 1L) * 104729L),
          lit(2147483648L))
        val b = pmod(x * 2654435761L, lit(2147483648L))
        when(b < 1073741824L, lit(1.0d)).otherwise(lit(-1.0d))
      })
      val h = aggregate(zip_with(unit, comp, (x, y) => x * y),
        lit(0.0d), _ + _)
      when(h >= 0, "1").otherwise("0")
    }: _*)

  /** LSH-bucketed approximate neighbors: vectors sharing a
    * random-hyperplane sign signature are candidates; exact cosine is
    * computed only within buckets. One shuffle keyed by signature —
    * O(|V|·bucket) not O(|V|²); at 100 TB the bucket join partitions
    * by signature and never materializes the full cross product. */
  def lshNeighbors(emb: DataFrame, planes: Int = 6, k: Int = 5)
      : DataFrame =
    lshNeighborsOnUnits(
      withUnitVec(emb).select(col("vec_id"), col("unit"))
        .localCheckpoint(true), planes, k)

  /** [[lshNeighbors]] over a prebuilt, already-materialized
    * (vec_id, unit) frame (see [[bruteForceTopKKernelOnUnits]]). */
  def lshNeighborsOnUnits(units: DataFrame, planes: Int = 6, k: Int = 5)
      : DataFrame = {
    val u = units.select(col("vec_id"), col("unit"))
      .withColumn("sig", hyperplaneSignature(col("unit"), planes))
    val a = u.select(col("vec_id").as("id_a"), col("unit").as("ua"),
      col("sig"))
    val b = u.select(col("vec_id").as("id_b"), col("unit").as("ub"),
      col("sig"))
    val pairs = a.join(b, Seq("sig"))
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(dot(col("ua"), col("ub")), 4).as("cos"))
    val w = Window.partitionBy("id_a")
      .orderBy(desc("cos"), asc("id_b"))
    pairs.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("id_a"), col("id_b"), col("cos"), col("rk"))
  }

  /** Embedding-cosine near-duplicate pairs: all (a, b) with
    * cosine ≥ threshold. Exact baseline for the dedup suite's
    * embedding modality (LSH/IVF are the scale paths). */
  def cosineNearDup(emb: DataFrame, threshold: Double): DataFrame =
    cosineNearDupOnUnits(
      withUnitVec(emb).select(col("vec_id"), col("unit"))
        .localCheckpoint(true), threshold)

  /** [[cosineNearDup]] over a prebuilt, already-materialized
    * (vec_id, unit) frame (see [[bruteForceTopKKernelOnUnits]]). */
  def cosineNearDupOnUnits(units: DataFrame, threshold: Double)
      : DataFrame = {
    val u = units.select(col("vec_id"), col("unit"))
    // same probe-side spread as bruteForceTopK: BNLJ parallelism =
    // probe partitions
    val a = u.repartition(u.sparkSession.sparkContext.defaultParallelism)
      .select(col("vec_id").as("id_a"), col("unit").as("ua"))
    val b = u.select(col("vec_id").as("id_b"), col("unit").as("ub"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(dot(col("ua"), col("ub")), 4).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** IVF-style ANN: vectors are assigned to their nearest per-label
    * centroid (the coarse quantizer — [[centroids]] is the training
    * step); search touches only same-cell pairs. The cell join keys on
    * the centroid id, so cost is O(|V|·cell), and at scale the shuffle
    * partitions by cell — the 100 TB path when the broadcast
    * brute-force is impossible. */
  def ivfNeighbors(emb: DataFrame, k: Int = 5): DataFrame =
    ivfNeighborsOnUnits(emb,
      withUnitVec(emb).select(col("vec_id"), col("unit")), k)

  /** [[ivfNeighbors]] with the unit vectors prebuilt (the centroid
    * training still reads the raw `emb` frame — it needs `label`). */
  def ivfNeighborsOnUnits(emb: DataFrame, units: DataFrame, k: Int = 5)
      : DataFrame = {
    // centroids quantized to 6 dp (HALF_UP): cell assignment then
    // depends on quantized values, shrinking the cross-engine
    // divergence window from every-ulp (raw float means differ by
    // summation order) to means landing within an ulp of a .5e-6
    // decimal boundary — not provably zero, but the q46 gate is
    // deterministic for a fixed dataset and the quantizer is
    // approximate by design (recall unaffected)
    val cents = centroids(emb)
      .select(col("label").as("cid"), col("centroid"))
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray
        .map(v => java.math.BigDecimal.valueOf(v)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue())))
      .sortBy(_._1)
    val spark = emb.sparkSession
    val bC = spark.sparkContext.broadcast(cents)
    import spark.implicits._
    val assigned = units
      .select(col("vec_id"), col("unit"))
      .as[(Long, Seq[Double])]
      .mapPartitions { it =>
        val cs = bC.value
        it.map { case (id, unit) =>
          var best = 0; var bestDot = Double.NegativeInfinity
          cs.foreach { case (cid, c) =>
            var d = 0.0; var i = 0
            while (i < c.length && i < unit.length) {
              d += c(i) * unit(i); i += 1
            }
            if (d > bestDot) { bestDot = d; best = cid }
          }
          (id, unit, best)
        }
      }.toDF("vec_id", "unit", "cell")
      .localCheckpoint(true)
    val a = assigned.select(col("vec_id").as("id_a"),
      col("unit").as("ua"), col("cell"))
    val b = assigned.select(col("vec_id").as("id_b"),
      col("unit").as("ub"), col("cell"))
    val pairs = a.join(b, Seq("cell"))
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(dot(col("ua"), col("ub")), 4).as("cos"))
    val w = Window.partitionBy("id_a")
      .orderBy(desc("cos"), asc("id_b"))
    pairs.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("id_a"), col("id_b"), col("cos"), col("rk"))
  }

  /** Centroid per label (the IVF coarse-quantizer training step):
    * element-wise mean via posexplode + groupBy — partial aggregation
    * map-side, one shuffle on (label, dim). */
  def centroids(emb: DataFrame): DataFrame =
    emb.select(col("label"),
        posexplode(transform(col("embedding"), x => x.cast("double")))
          .as(Seq("dim", "v")))
      .groupBy("label", "dim").agg(avg("v").as("mean_v"))
      .groupBy("label")
      .agg(transform(
        array_sort(collect_list(struct(col("dim"), col("mean_v")))),
        s => s.getField("mean_v")).as("centroid"))
}
