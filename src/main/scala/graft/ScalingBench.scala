package graft

import org.apache.spark.sql.SparkSession

/** Two-parallelism-level scaling evidence (BASELINE.json north_rule:
  * N vs 4N executors; sandbox stand-in per the driver instruction =
  * the same job at local[N] and local[4N] on identical input).
  *
  * Runs the full KG pipeline at local[lo] and local[hi] in fresh
  * sessions (warm-up run first at each level to exclude JIT/classload),
  * prints one JSON line with both throughputs and the scaling
  * efficiency throughput(hi) / ((hi/lo) · throughput(lo)).
  */
object ScalingBench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val lo = sys.env.getOrElse("SPARK_GRAFT_SCALE_LO", "8").toInt
    val hi = sys.env.getOrElse("SPARK_GRAFT_SCALE_HI", "32").toInt
    // compute-dominated workload: at the default 256x replication the
    // parallel fraction dwarfs the ~10s of fixed per-job latency that
    // local-mode scheduling costs regardless of data size
    val rep = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPLICATION", "256").toInt
    def once(cpus: Int): (Double, Long) = {
      // fresh session per run: cache() entries registered inside the
      // pipeline match by canonicalized plan, so a reused session would
      // let a timed run silently consume the previous run's caches and
      // measure only the post-cache stages
      val spark = session(cpus)
      try Bench.runPipeline(spark, sfDir, rep)
      finally {
        spark.catalog.clearCache()
        spark.stop()
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
      }
    }
    def measure(cpus: Int): (Double, Long) = {
      once(cpus) // warm-up (JIT, classload, codegen cache persist per JVM)
      val r1 = once(cpus)
      val r2 = once(cpus)
      if (r1._1 < r2._1) r1 else r2 // best of 2 timed runs
    }
    val (loSec, triples) = measure(lo)
    val (hiSec, _) = measure(hi)
    val loTps = triples / loSec
    val hiTps = triples / hiSec
    val eff = hiTps / ((hi.toDouble / lo) * loTps)
    println(s"""{"metric":"scaling","sf":"$sfDir","triples":$triples,""" +
      s""""replication":$rep,""" +
      s""""lo_cpus":$lo,"lo_sec":$loSec,"lo_triples_per_sec":$loTps,""" +
      s""""hi_cpus":$hi,"hi_sec":$hiSec,"hi_triples_per_sec":$hiTps,""" +
      s""""scaling_efficiency":$eff}""")
  }
}
