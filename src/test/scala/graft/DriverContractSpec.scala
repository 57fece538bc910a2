package graft

/** Guards the driver contract itself: entry() smoke, queries/oracle
  * map consistency. A regression here zeroes a whole round even if
  * every operator is correct, so it gets its own spec. */
class DriverContractSpec extends SparkTestBase {

  test("entry() returns rows on sf0.001 (driver smoke check)") {
    if (new java.io.File("/root/testdata/sf0.001").exists()) {
      assert(SparkEntry.entry(spark).count() > 0)
    }
  }

  test("every oracle key has a queries entry; no empty SQL") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql
    assert(os.keySet.subsetOf(qs),
      s"orphan oracles: ${os.keySet -- qs}")
    assert(os.values.forall(_.trim.nonEmpty))
  }

  test("every gate query executes at sf0.001 (no-throw smoke)") {
    val dir = "/root/testdata/sf0.001"
    if (new java.io.File(dir).exists()) {
      val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          try { fn(spark, dir).count(); None }
          catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
      }
      assert(failures.isEmpty, failures.mkString("\n"))
    }
  }

  test("the bench tail-safe line stays short and well-formed (the " +
      "driver's tail window must capture a complete JSON object)") {
    val line = Bench.shortJson(123456.789, 7.0534, 89598L, "32",
      "/root/testdata/sf0.1")
    assert(line.getBytes("UTF-8").length <= 250, line.length.toString)
    assert(line.startsWith("{") && line.endsWith("}"))
    // minimal JSON sanity without a parser dependency: balanced
    // braces, the metric key, no raw newlines
    assert(line.contains("\"metric\":\"pipeline_triples_per_sec\""))
    assert(line.contains("\"value\":") && line.contains("\"sf\":"))
    assert(!line.contains("\n") && line.count(_ == '{') == 1)
  }

  test("query ids are unique across Queries* batches") {
    val batches = Seq(Queries.all, Queries2.all, Queries3.all,
      Queries4.all, Queries5.all, Queries6.all, Queries7.all,
      Queries8.all, Queries9.all, Queries10.all)
    val total = batches.map(_.size).sum
    assert(SparkEntry.queries.size == total,
      "duplicate query id silently shadowed across batches")
  }

  test("every oracle references a registered query (a rename cannot " +
      "silently drop a correctness gate)") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without a query: $missing")
  }
}
