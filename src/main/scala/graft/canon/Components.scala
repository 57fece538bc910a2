package graft.canon

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components by iterative hash-partitioned min-label
  * propagation over a DataFrame edge list (SURVEY.md §4 custom piece 3;
  * the canonicalization stage the north rule adds on top of the
  * reference's per-string vote dictionaries, post_process.py:294-313).
  *
  * Algorithm (public; the classic Pregel-style min propagation):
  * every vertex starts labeled with its own id; each round every vertex
  * takes the min label over itself and its neighbors; stop when no
  * label changed. Rounds = graph diameter. Scale properties:
  *  - edges are symmetrized once, then every round is one
  *    shuffle-on-src aggregation — partitioning is stable across
  *    rounds (same key), so AQE reuses exchange layout;
  *  - `localCheckpoint` every round cuts lineage so plans don't grow
  *    (100-round lineage would OOM the driver at scale);
  *  - convergence check piggybacks on the aggregation (one `count`
  *    of changed labels), not a collect of labels.
  *
  * Entity-canonicalization graphs are near-star-shaped (mentions ↔ KB
  * ids), so diameter — and round count — is small (≤ ~4) regardless of
  * corpus size.
  */
object Components {

  /** @param edges two LongType columns `src`, `dst` (undirected pairs)
    * @param exactRounds when the caller KNOWS the graph diameter
    *        (e.g. the linker's mention↔entity edges form bipartite
    *        stars — diameter 2), run exactly that many rounds with no
    *        convergence-count jobs: same labels, ~half the scheduling
    *        overhead per round
    * @return (id: Long, component: Long) — component = min vertex id
    *         reachable; isolated vertices absent from `edges` are
    *         the caller's to union in. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 50,
      exactRounds: Option[Int] = None): DataFrame = {
    val spark = edges.sparkSession
    // symmetrize + dedup once
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint(true)
    exactRounds.foreach { n =>
      var i = 0
      while (i < n) {
        val fromNeighbors = sym
          .join(labels, sym("dst") === labels("id"))
          .select(sym("src").as("id"), col("component"))
        labels = fromNeighbors.union(labels)
          .groupBy("id").agg(min("component").as("component"))
          .localCheckpoint(i == n - 1) // eager only on the last round
        i += 1
      }
      return labels
    }
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // one shuffle-join + one aggregation per round; the old label
      // rides along (isOld) so convergence detection needs no second
      // join, and its count() action doubles as the materialization of
      // the lazily-checkpointed round result
      val fromNeighbors = sym
        .join(labels, sym("dst") === labels("id"))
        .select(sym("src").as("id"), col("component"),
          lit(0).as("isOld"))
      val merged = fromNeighbors
        .union(labels.withColumn("isOld", lit(1)))
        .groupBy("id").agg(
          min("component").as("component"),
          max(when(col("isOld") === 1, col("component"))).as("old"))
        .localCheckpoint(false)
      val changed = merged.filter(col("component") < col("old")).count()
      labels = merged.select(col("id"), col("component"))
      converged = changed == 0
      iter += 1
    }
    labels
  }

  /** Map arbitrary string node ids to stable Longs (xxhash64 — 64-bit
    * collision odds negligible at any realistic node count) and back. */
  def stringComponents(spark: SparkSession, edgePairs: DataFrame,
      exactRounds: Option[Int] = None): DataFrame = {
    // edgePairs: (a: String, b: String)
    val e = edgePairs.select(
      xxhash64(col("a")).as("src"), xxhash64(col("b")).as("dst"))
    val comps = connectedComponents(e, exactRounds = exactRounds)
    val nodes = edgePairs.select(col("a").as("node"))
      .union(edgePairs.select(col("b").as("node"))).distinct()
      .withColumn("id", xxhash64(col("node")))
    nodes.join(comps, "id").select(col("node"), col("component"))
  }
}
