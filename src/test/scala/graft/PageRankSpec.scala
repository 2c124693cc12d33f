package graft

import graft.operators.PageRank
import org.apache.spark.sql.functions._

/** Integer power-iteration PageRank: determinism, mass accounting, and
  * the structural properties the hash gate relies on.
  */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  // star graph: 1..4 each point at 0 (w=1); 0 points at 1 (w=1); 5 isolated
  private lazy val vertices = (0L to 5L).toDF("id")
  private lazy val edges =
    (Seq((1L, 0L, 1L), (2L, 0L, 1L), (3L, 0L, 1L), (4L, 0L, 1L), (0L, 1L, 1L)))
      .toDF("src", "dst", "w")

  test("zero iterations returns the uniform start mass") {
    val r = PageRank.weighted(vertices, edges, iterations = 0).collect()
    assert(r.length == 6 && r.forall(_.getLong(1) == 1000000000000L / 6))
  }

  test("hub accumulates mass; isolated vertex holds exactly the teleport") {
    val r = PageRank.weighted(vertices, edges, iterations = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val teleport = (1000000000000L * 15 / 100) / 6
    assert(r(5L) == teleport)                      // no in-edges → teleport only
    assert(r(0L) == r.values.max)                  // star center dominates
    assert(r(2L) == r(3L) && r(3L) == r(4L))       // symmetric spokes tie exactly
    assert(r(1L) > r(2L))                          // 1 also receives from 0
  }

  test("mass is conserved up to truncation dust and dangling loss") {
    val r = PageRank.weighted(vertices, edges, iterations = 3).collect()
    val total = r.map(_.getLong(1)).sum
    // 5 is isolated (keeps teleport, its share of start mass dangles away);
    // truncation loses < 1 unit per (edge, iteration).
    assert(total <= 1000000000000L)
    assert(total > 600000000000L)
  }

  test("bit-identical under repartitioning (the hash-gate property)") {
    val a = PageRank.weighted(vertices, edges, 3)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val b = PageRank.weighted(vertices.repartition(7), edges.repartition(5), 3)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(a == b)
  }

  test("weights steer mass: heavier edge carries proportionally more") {
    val v = (0L to 2L).toDF("id")
    // 0 splits 3:1 between 1 and 2
    val e = Seq((0L, 1L, 3L), (0L, 2L, 1L)).toDF("src", "dst", "w")
    val r = PageRank.weighted(v, e, iterations = 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val teleport = (1000000000000L * 15 / 100) / 3
    val start = 1000000000000L / 3
    val damped = start * 85 / 100
    assert(r(1L) == teleport + damped * 3 / 4)
    assert(r(2L) == teleport + damped / 4)
  }
}
