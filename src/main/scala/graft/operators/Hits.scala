package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS hubs-and-authorities (Kleinberg 1999) by deterministic integer
  * power iteration — the directed-centrality complement of [[PageRank]]:
  * PageRank ranks by incoming random-walk mass, HITS separates "points
  * at good things" (hub) from "is pointed at by good things" (authority),
  * the natural readout on an asymmetric trade/linkage graph.
  *
  * Determinism contract (same family as PageRank's): scores are BIGINT
  * micro-units; each half-step is an integer weighted sum followed by a
  * MAX-normalization implemented as the integer quantization
  *   `q = (max(raw) div mass) + 1;  score = raw div q`
  * — every op (`*`, integer SUM, `div`, MAX) is order-independent and
  * truncates identically in Spark (`div`) and DuckDB (`//`) for
  * non-negative operands, so the result is bit-identical cross-engine
  * under any partitioning. Max-normalization (the classic L∞ variant of
  * HITS) is chosen over sum-normalization precisely because it keeps the
  * quantizer `q` a small scalar: scores stay ≤ mass, so the next raw sum
  * is bounded by mass · Σw — with the default mass 10⁸ that is int64-safe
  * while total edge weight Σw < 9·10¹⁰ (far past an sf100 lineitem count;
  * lift mass down a decade beyond that).
  *
  * Scale shape: two shuffles per iteration (groupBy dst for authorities,
  * groupBy src for hubs) over a cached edge relation; the normalization
  * scalar is a one-row aggregate broadcast back (never a data-sized
  * collect). Vertices keep a row via left joins so sinks/sources hold
  * exactly 0 on the side they lack edges for.
  */
object Hits {

  /** @param vertices one `id` column (any integral type)
    * @param edges    `src`, `dst`, `w` (positive integral weight)
    * @param iterations full HITS iterations (authority update then hub
    *                   update), fixed — a truncated power iteration, not
    *                   a convergence loop
    * @param massMicro L∞ score ceiling in micro-units
    * @return (id, auth_micro BIGINT, hub_micro BIGINT)
    */
  def run(vertices: DataFrame, edges: DataFrame, iterations: Int,
          massMicro: Long = 100000000L): DataFrame = {
    require(iterations >= 1)
    val e = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .cache()
    val v = vertices.select(col("id"))
    var h = v.select(col("id"), lit(massMicro).as("s"))
    var a = v.select(col("id"), lit(0L).as("s"))
    for (_ <- 1 to iterations) {
      // localCheckpoint per half-step: each `normalized` embeds its input
      // TWICE (the q scalar aggregate + the score join) and every
      // iteration embeds the previous one, so a lazy chain duplicates
      // subtrees exponentially in the iteration count — measured 8.7 s
      // for 2 iterations over a 625-row edge relation before the
      // checkpoints, 2.9 s after. The relations are node-sized, so the
      // materialization is O(|V|) per step — the same eager-truncation
      // discipline Betweenness/Bfs already use.
      a = normalized(v,
        e.join(h, e("src") === h("id"))
          .groupBy(col("dst").as("vid")).agg(sum(col("s") * col("w")).as("raw")),
        massMicro).localCheckpoint()
      h = normalized(v,
        e.join(a, e("dst") === a("id"))
          .groupBy(col("src").as("vid")).agg(sum(col("s") * col("w")).as("raw")),
        massMicro).localCheckpoint()
    }
    h.select(col("id"), col("s").as("hub_micro"))
      .join(a.select(col("id"), col("s").as("auth_micro")), Seq("id"))
      .select(col("id"), col("auth_micro"), col("hub_micro"))
  }

  /** raw(vid) → score(id) over ALL vertices: quantize by the scalar
    * `q = max(raw) div mass + 1` (one-row aggregate, broadcast), missing
    * vertices at exactly 0.
    */
  private def normalized(v: DataFrame, raw: DataFrame, mass: Long): DataFrame = {
    // integer `div`, NOT Column./: a double quotient near an integer can
    // round UP across the boundary where DuckDB's `//` truncates
    val q = raw.agg(max(col("raw")).as("m"))
      .select((expr(s"m div $mass") + lit(1L)).as("q"))
    v.join(raw, v("id") === raw("vid"), "left")
      .crossJoin(broadcast(q))
      .select(v("id"), coalesce(expr("raw div q"), lit(0L)).as("s"))
  }
}
