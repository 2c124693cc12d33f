package graft

import graft.operators.{HyperAnf, Sketches}
import org.apache.spark.sql.functions._

/** HyperANF operator invariants: the max-merge round is EXACT over the
  * sketch algebra — a node's round-t counter must equal the HLL of its
  * exact t-ball (merge is associative/idempotent, so path multiplicity
  * and visit order cannot matter), and rounds are monotone/idempotent
  * at the fixpoint.
  */
class HyperAnfSpec extends SparkSpec {
  import spark.implicits._

  // 0→1→2→3 chain plus 0→2 shortcut and a 4→4 self-contained island
  private val edgeSeq = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 2L))
  private lazy val nodes = (0L to 4L).toDF("id")
  private lazy val edges = edgeSeq.toDF("src", "dst")

  private def balls(t: Int): Map[Long, Set[Long]] = {
    var b = (0L to 4L).map(v => v -> Set(v)).toMap
    (1 to t).foreach { _ =>
      b = b.map { case (v, s) =>
        v -> (s ++ s.flatMap(u => edgeSeq.filter(_._1 == u).map(_._2)))
      }
    }
    b
  }

  private def regsOf(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Long] =
    df.collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("bucket")) ->
      r.getAs[Long]("reg")).toMap

  test("round-t counter equals the HLL of the exact t-ball (merge exactness)") {
    var regs = HyperAnf.initRegisters(nodes, "id")
    (0 to 3).foreach { t =>
      if (t > 0) regs = HyperAnf.advance(regs, edges)
      val expect = balls(t).toSeq.flatMap { case (v, ball) =>
        ball.map(u => (v, u))
      }.toDF("id", "member")
      val direct = Sketches.hllRegisters(expect, "id", col("member"))
      assert(regsOf(regs) == regsOf(direct),
        s"round $t: advanced registers must equal the direct ball HLL")
    }
  }

  test("fixpoint: advancing past the diameter is a no-op; the island never grows") {
    val r3 = (1 to 3).foldLeft(HyperAnf.initRegisters(nodes, "id"))(
      (r, _) => HyperAnf.advance(r, edges))
    val r4 = HyperAnf.advance(r3, edges)
    assert(regsOf(r3) == regsOf(r4), "diameter reached — merge must be idempotent")
    // node 4 has no out-edges: its counter stays the singleton forever
    val island = regsOf(r4).keys.filter(_._1 == 4L)
    assert(island.size == 1, s"island counter must hold exactly {4}: $island")
  }
}
