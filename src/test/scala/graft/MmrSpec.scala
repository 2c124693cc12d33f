package graft

import graft.operators.Mmr
import org.scalatest.funsuite.AnyFunSuite

class MmrSpec extends AnyFunSuite {

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("diversify demotes near-duplicates of already-picked candidates") {
    // two tight clusters + one outlier; relevance favors cluster A
    val a1 = (1L, 0.95, vec(1, 0, 0))
    val a2 = (2L, 0.94, vec(0.999, 0.01, 0)) // near-dup of a1
    val b1 = (3L, 0.80, vec(0, 1, 0))
    val c1 = (4L, 0.50, vec(0, 0, 1))
    val picks = Mmr.diversify(Seq(a1, a2, b1, c1), k = 3, lambda = 0.5)
    assert(picks.map(_.id) == Seq(1L, 3L, 4L),
      s"the a1-duplicate must lose to the novel clusters, got ${picks.map(_.id)}")
    assert(picks.map(_.pickOrder) == Seq(1, 2, 3))
  }

  test("lambda = 1 reduces to pure relevance ranking") {
    val cands = Seq(
      (1L, 0.9, vec(1, 0)), (2L, 0.8, vec(1, 0.001)), (3L, 0.7, vec(0, 1)))
    val picks = Mmr.diversify(cands, k = 3, lambda = 1.0)
    assert(picks.map(_.id) == Seq(1L, 2L, 3L))
  }

  test("ties break on the smaller id and k caps at the candidate count") {
    val cands = Seq((5L, 0.5, vec(1, 0)), (2L, 0.5, vec(0, 1)))
    val picks = Mmr.diversify(cands, k = 10, lambda = 1.0)
    assert(picks.map(_.id) == Seq(2L, 5L))
    assert(picks.size == 2)
  }

  test("first pick's score is λ·relevance (empty-set similarity term is 0)") {
    val picks = Mmr.diversify(Seq((1L, 0.8, vec(1, 0))), k = 1, lambda = 0.5)
    assert(math.abs(picks.head.mmrScore - 0.4) < 1e-12)
  }
}
