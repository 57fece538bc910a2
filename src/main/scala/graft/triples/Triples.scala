package graft.triples

import graft.canon.Components
import graft.link.Linker.LinkedMention
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Canonicalization + (subj, pred, obj) materialization.
  *
  * The reference's terminal output is the 8-field EDL record — in
  * effect (doc:span, type, NIL) triples (post_process.py:29-33,
  * utils/Convert_to_darpa_xml.py:6-12). The north star widens this to a
  * canonicalized knowledge graph: mentions with the same canonical
  * entity collapse to one subject via connected components over the
  * mention-text ↔ KB-id link graph, then four predicates materialize:
  * hasType, label, mentionedIn, sameAs (SURVEY.md §7.2 steps 9-10).
  */
object Triples {

  /** Canonical node keys. Mention nodes key by (tag, lowercased text)
    * so homonyms of different types never merge; entity nodes by KB id. */
  private def mentionNode = concat(lit("m:"), col("tag"), lit(":"),
    lower(col("text")))
  private def entityNode = concat(lit("e:"), col("entityId"))

  /** Build the full triple table from linked mentions.
    * Stages: edge build (narrow) → connected components (iterative,
    * see [[Components]]) → canonical-subject join → triple union.
    * The docId carries repo/path so output can partition by repo. */
  def materialize(linked: Dataset[LinkedMention]): DataFrame = {
    val spark = linked.sparkSession
    // materialization barrier: the CC loop and the subject join each
    // spawn exchange subtrees over `df`; if the blocks are cold they
    // race to compute the whole upstream pipeline concurrently (observed
    // as tasks blocked on each other's block locks + duplicated
    // compute). Eager localCheckpoint materializes once before fan-out
    // AND ties block lifetime to this RDD (ContextCleaner frees it when
    // the plan is dropped) instead of pinning the session CacheManager.
    val df = linked.toDF().localCheckpoint(true)
    val nodes = df.select(mentionNode.as("a"),
      when(col("entityId") =!= "NIL", entityNode).otherwise(mentionNode)
        .as("b"))
    // the link graph is bipartite stars by construction (every mention
    // node has exactly one edge: to its entity node, or a self-loop) —
    // diameter 2, so exactly 2 propagation rounds suffice and the
    // convergence-count jobs are skipped
    val comps = Components.stringComponents(spark, nodes,
      exactRounds = Some(2))
    // canonical subject = lexicographically-min node string of the
    // component (stable across runs and partitionings, unlike raw
    // hash ids)
    val canon = comps.groupBy("component")
      .agg(min("node").as("subj"))
    val withSubj = df
      .withColumn("node", mentionNode)
      .join(comps, "node")
      .join(canon, "component")
    // single-pass emission: one scan explodes all four predicates per
    // mention, one distinct dedups — vs 4 join+distinct branches that
    // would re-run the subject join per predicate
    withSubj.select(col("subj"), explode(array(
        struct(lit("hasType").as("pred"), col("tag").as("obj")),
        struct(lit("label").as("pred"), lower(col("text")).as("obj")),
        struct(lit("mentionedIn").as("pred"),
          concat(col("repo"), lit("/"), col("path")).as("obj")),
        struct(lit("sameAs").as("pred"),
          when(col("entityId") =!= "NIL", col("entityId")).as("obj"))))
        .as("po"))
      .select(col("subj"), col("po.pred").as("pred"), col("po.obj").as("obj"))
      .filter(col("obj").isNotNull) // drops sameAs rows for NIL mentions
      .distinct()
  }
}
