package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HyperANF (Boldi, Rosa & Vigna, WWW 2011): the neighborhood function
  * N(t) = Σ_v |{u : v reaches u in ≤ t hops}|, estimated by ONE HLL
  * counter per node advanced through register max-merge over
  * out-edges — the standard large-graph distance-distribution /
  * effective-diameter machinery. Exact ball counts need all-pairs
  * reachability (O(n²) pairs held and re-distincted every round);
  * HyperANF's state is nodes × m registers, its round is one
  * edge-join + one (id, bucket) groupBy(max), and the merge is
  * associative/idempotent so rounds compose exactly like the BFS
  * min-plus relaxation the repo already gates. Because the counters
  * use the portable md5 HLL ([[Sketches.hllRegisters]]), a round-t
  * counter is BY CONSTRUCTION the HLL of the exact t-ball — the spec
  * asserts that equality, and the DuckDB oracle replays every round's
  * registers bit-for-bit.
  */
object HyperAnf {

  /** t = 0: each node's counter holds exactly {node}. */
  def initRegisters(nodes: DataFrame, idCol: String, p: Int = 9): DataFrame =
    Sketches.hllRegisters(
      nodes.select(col(idCol).as("id")), "id", col("id"), p)

  /** One round: c'(v) = c(v) ∪ ⋃_{v→u} c(u) — sparse register
    * max-merge. `edges` = (src, dst) directed, deduplicated.
    */
  def advance(regs: DataFrame, edges: DataFrame): DataFrame = {
    // unqualified, uniquely-named columns: dst/src live only in edges,
    // id/bucket/reg only in regs — iterated calls reuse the same edges
    // plan, and df("col") references would trip Spark's ambiguous-
    // self-join check once round t's plan contains round t−1's join
    val contrib = edges.join(regs, col("dst") === col("id"))
      .select(col("src").as("id"), col("bucket"), col("reg"))
    regs.unionByName(contrib)
      .groupBy(col("id"), col("bucket"))
      .agg(max(col("reg")).as("reg"))
  }
}
