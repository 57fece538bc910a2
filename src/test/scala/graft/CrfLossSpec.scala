package graft

import graft.crf.Crf
import org.scalatest.funsuite.AnyFunSuite

/** Forward / gold-path / NLL kernels vs brute-force enumeration
  * (decoders.py:66-140 semantics on the rebuilt linear model). */
class CrfLossSpec extends AnyFunSuite {

  private def randEmissions(T: Int, seed: Int): Array[Array[Float]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(T)(Array.fill(Crf.K)((rng.nextDouble() * 4 - 2).toFloat))
  }

  private def allPaths(T: Int): Iterator[Array[Int]] = {
    def rec(t: Int, acc: List[Int]): Iterator[Array[Int]] =
      if (t == T) Iterator.single(acc.reverse.toArray)
      else (0 until Crf.K).iterator.flatMap(k => rec(t + 1, k :: acc))
    rec(0, Nil)
  }

  test("forward == log sum exp of every path's gold score (T=1,2,3)") {
    val trans = Crf.transitions
    for (t <- 1 to 3; seed <- Seq(1, 7)) {
      val em = randEmissions(t, seed)
      val scores = allPaths(t)
        .map(p => Crf.goldScore(em, trans, p)).toArray
      val mx = scores.max
      val expected = mx + math.log(scores.map(s => math.exp(s - mx)).sum)
      val got = Crf.forward(em, trans)
      assert(math.abs(got - expected) < 1e-6, s"T=$t seed=$seed")
    }
  }

  test("NLL >= 0 for every path, and minimal at the Viterbi path") {
    val trans = Crf.transitions
    val em = randEmissions(3, 42)
    val viterbiNll = Crf.nll(em, trans, Crf.viterbi(em, trans))
    allPaths(3).foreach { p =>
      val n = Crf.nll(em, trans, p)
      assert(n >= -1e-9)
      assert(n >= viterbiNll - 1e-9,
        s"path ${p.mkString(",")} beat the Viterbi path")
    }
  }

  test("walled paths carry ~zero probability mass") {
    val trans = Crf.transitions
    val em = randEmissions(2, 5)
    // O -> I-GPE is walled; its gold score must sit ~1000 below Z
    val illegal = Array(graft.core.Dict.O, graft.core.Dict.tagId("I-GPE"))
    val z = Crf.forward(em, trans)
    assert(z - Crf.goldScore(em, trans, illegal) > 900)
  }
}
