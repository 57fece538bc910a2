package graft
import graft.core.SourceFile
import graft.pipeline.Pipeline
import org.apache.spark.sql.SparkSession
object IsoBench {
  def main(args: Array[String]): Unit = {
    def once(cpus: Int, rep: Int): Double = {
      val spark = SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false").getOrCreate()
      try {
        spark.sparkContext.setLogLevel("ERROR")
        import spark.implicits._
        val files = Bench.corpus(spark, "/root/testdata/sf0.1", rep).as[SourceFile]
        val t0 = System.nanoTime()
        Pipeline.mentions(files).count()
        (System.nanoTime() - t0) / 1e9
      } finally {
        spark.stop()
        SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      }
    }
    once(8, 64); once(32, 64) // warm
    val samples = (1 to 2).flatMap(_ => Seq(8 -> once(8, 8192), 32 -> once(32, 8192)))
    val lo = samples.filter(_._1 == 8).map(_._2).min
    val hi = samples.filter(_._1 == 32).map(_._2).min
    println(f"DECODE8192 lo=$lo%.1f hi=$hi%.1f eff=${(lo / hi) / 4}%.3f samples=${samples.map(s => f"${s._1}:${s._2}%.1f").mkString(",")}")
  }
}
