package graft

import graft.core.{Mention, Sentence, SourceFile}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sub-step probe for the triples stage (StageBench flagged it as the
  * one non-scaling stage). Builds the linked-mention input once, then
  * times each internal step at the given parallelism. */
object TriplesProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val rep = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPLICATION", "256").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val files = Bench.corpus(spark, sfDir, rep).as[SourceFile]
    val ments = graft.pipeline.Pipeline.mentions(files)
      .localCheckpoint(true).as[Mention]
    val sents = graft.segment.Segmenter.sentences(files)
      .localCheckpoint(true).as[Sentence]
    val post = graft.postprocess.PostProcess(sents, ments)
      .localCheckpoint(true).as[Mention]
    val linked = time("link+checkpoint") {
      graft.link.Linker.link(post).localCheckpoint(true)
        .as[graft.link.Linker.LinkedMention]
    }
    println(s"linked rows: ${linked.count()}")
    val df = time("pruned checkpoint") {
      linked.toDF().select("repo", "path", "text", "tag", "entityId")
        .localCheckpoint(true)
    }
    val mentionNode = concat(lit("m:"), col("tag"), lit(":"),
      lower(col("text")))
    val nodes = time("nodes distinct") {
      val n = df.select(mentionNode.as("a"),
        when(col("entityId") =!= "NIL",
          concat(lit("e:"), col("entityId"))).otherwise(mentionNode)
          .as("b")).distinct().localCheckpoint(true)
      println(s"  distinct nodes: ${n.count()}")
      n
    }
    val comps = time("CC 2 rounds") {
      val c = graft.canon.Components.stringComponents(spark, nodes,
        exactRounds = Some(2)).localCheckpoint(true)
      println(s"  comps: ${c.count()}")
      c
    }
    val canon = comps.groupBy("component").agg(min("node").as("subj"))
    val withSubj = df.withColumn("node", mentionNode)
      .join(comps, "node").join(canon, "component")
    time("dims distinct")(println("  dims: " + withSubj
      .select(col("subj"), col("tag"), lower(col("text")).as("lt"),
        col("entityId")).distinct().count()))
    time("places distinct")(println("  places: " + withSubj
      .select(col("subj"), concat(col("repo"), lit("/"), col("path"))
        .as("obj")).distinct().count()))
    time("full materialize") {
      println("  triples: " + graft.triples.Triples.materialize(linked)
        .count())
    }
    spark.stop()
  }
}
