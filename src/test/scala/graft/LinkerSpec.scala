package graft

import graft.core.{Dict, Mention}
import graft.link.Linker
import org.scalatest.funsuite.AnyFunSuite

class LinkerSpec extends AnyFunSuite {

  test("jaro-winkler golden values (public algorithm)") {
    assert(Linker.jaro("abc", "abc") == 1.0)
    assert(Linker.jaro("abc", "xyz") == 0.0)
    assert(math.abs(Linker.jaroWinkler("MARTHA", "MARHTA") - 0.9611) < 0.0005)
    assert(math.abs(Linker.jaroWinkler("DIXON", "DICKSONX") - 0.8133) < 0.0005)
    assert(Linker.jaroWinkler("", "x") == 0.0)
  }

  test("jaccard on token sets") {
    assert(Linker.jaccard(Set("a", "b"), Set("a", "b")) == 1.0)
    assert(Linker.jaccard(Set("a", "b"), Set("b", "c")) == 1.0 / 3)
    assert(Linker.jaccard(Set.empty, Set.empty) == 1.0)
  }

  test("exact dictionary mention links to its KB id; garbage goes NIL") {
    val spark = TestSpark.spark
    import spark.implicits._
    val ms = Seq(
      Mention("r", "p", 0, 0, 12, "Ada Lovelace", "PER", 1.0),
      Mention("r", "p", 0, 20, 26, "zzzzzz", "PER", 1.0),
      // same text, wrong type: type-gated candidates → NIL
      Mention("r", "p", 1, 0, 12, "Ada Lovelace", "ORG", 1.0)).toDS()
    val linked = Linker.link(ms).collect().sortBy(_.sentIdx)
    val adaId = Dict.kbId(Dict.gazetteer.indexWhere(
      _._1 == Vector("Ada", "Lovelace")))
    assert(linked(0).entityId == adaId && linked(0).score == 1.0)
    assert(linked(1).entityId == "NIL")
    assert(linked(2).entityId == "NIL")
  }

  test("near-miss surface form still links above threshold") {
    val spark = TestSpark.spark
    import spark.implicits._
    // token overlap 1/2 + high JW → blended above 0.75
    val ms = Seq(Mention("r", "p", 0, 0, 8, "Ada Lovelace's", "PER", 1.0))
      .toDS()
    val got = Linker.link(ms).collect().head
    assert(got.entityId != "NIL")
    assert(got.entityName == "ada lovelace")
  }
}
