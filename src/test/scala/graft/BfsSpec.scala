package graft

import graft.operators.Bfs

/** Min-plus BFS: path distances, sentinel semantics, round capping,
  * multi-source, and partitioning-independence.
  */
class BfsSpec extends SparkSpec {
  import spark.implicits._

  // path 0→1→2→3→4 plus isolated 5
  private lazy val vertices = (0L to 5L).toDF("id")
  private lazy val pathEdges =
    Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")

  private def run(rounds: Int, sources: Seq[Long] = Seq(0L)): Map[Long, Long] =
    Bfs.hopDistance(vertices, pathEdges, sources, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("path graph distances after enough rounds") {
    val d = run(rounds = 4)
    assert(d == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L,
      5L -> Bfs.Unreached))
  }

  test("round cap truncates discovery, not correctness") {
    val d = run(rounds = 2)
    assert(d(2L) == 2L && d(3L) == Bfs.Unreached && d(4L) == Bfs.Unreached)
  }

  test("zero rounds returns only the seeds") {
    val d = run(rounds = 0)
    assert(d(0L) == 0L && (1L to 5L).forall(d(_) == Bfs.Unreached))
  }

  test("multi-source takes the nearest seed") {
    val d = run(rounds = 4, sources = Seq(0L, 3L))
    assert(d(4L) == 1L && d(2L) == 2L && d(3L) == 0L)
  }

  test("duplicate edges and repartitioning change nothing") {
    val dup = pathEdges.union(pathEdges).repartition(7)
    val a = Bfs.hopDistance(vertices, dup, Seq(0L), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == run(rounds = 4))
  }
}
