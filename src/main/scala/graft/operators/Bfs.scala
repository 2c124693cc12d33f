package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unweighted single/multi-source BFS (hop-count shortest path) by
  * min-plus relaxation — the reachability operator next to PageRank
  * (importance) and connected components (partition): "how many hops
  * from these seeds to every vertex", the lineage/provenance question
  * over a linkage graph.
  *
  * Determinism contract: distances are BIGINT hop counts; each round is
  *   dist' (v) = min( dist(v), min over edges (u,v) of dist(u) + 1 )
  * — pure integer `min`, which is order- and partitioning-independent,
  * so like PageRank/CC the iterative algorithm itself is hash-gateable
  * cross-engine with the rounds unrolled as oracle CTEs. Unreached
  * vertices hold the sentinel [[Bfs.Unreached]] (BFS over k rounds
  * bounds discovered distances by k, so any value > k is a safe
  * sentinel; 99 keeps the output human-readable).
  *
  * Scale shape: one shuffle per round (groupBy dst of the frontier
  * relaxation); the deduplicated edge relation is cached once and
  * reused. Rounds are a fixed count — the result is "distance within k
  * hops", a defined quantity at any scale (diameter-bounded graphs
  * converge; for unbounded diameters run ⌈log₂ d⌉ doubling rounds like
  * the CC loop instead). For graphs needing many rounds, truncate the
  * per-round lineage with `localCheckpoint`/`checkpoint` exactly as
  * documented on Dedup's pointer-doubling loop.
  */
object Bfs {

  val Unreached = 99L

  /** @param vertices one `id` column (integral)
    * @param edges    `src`, `dst` (directed; pass both directions for an
    *                 undirected walk). Deduplicated internally.
    * @param sources  seed vertex ids (distance 0)
    * @param rounds   relaxation rounds k — result is min(hops, k-capped)
    * @return (id, dist) with dist ∈ [0, rounds] ∪ {Unreached}
    */
  def hopDistance(vertices: DataFrame, edges: DataFrame, sources: Seq[Long],
                  rounds: Int): DataFrame = {
    require(rounds >= 0 && rounds < Unreached, s"rounds=$rounds")
    val e = edges.select(col("src"), col("dst")).distinct().cache()
    var dist = vertices.select(col("id"),
      when(col("id").isin(sources: _*), lit(0L)).otherwise(lit(Unreached)).as("d"))
    for (_ <- 1 to rounds) {
      val relaxed = e.join(dist, e("src") === dist("id"))
        .select(col("dst"), (col("d") + lit(1L)).as("dnext"))
        .groupBy(col("dst")).agg(min(col("dnext")).as("dr"))
      // localCheckpoint per round: `dist` feeds BOTH the relaxation and
      // the merge join, so a lazy chain duplicates each round's subtree
      // twice — 2^rounds plan blowup (measured on the nation family:
      // dozens of tiny replayed stages). The relation is node-sized, so
      // the eager cut is O(|V|) per round.
      dist = dist.join(relaxed, dist("id") === relaxed("dst"), "left")
        .select(dist("id"),
          least(col("d"), coalesce(col("dr"), lit(Unreached))).as("d"))
        .localCheckpoint()
    }
    dist.select(col("id"), col("d").as("dist"))
  }

  /** All-pairs hop distance as a SPARSE reached-pairs relation: every
    * vertex is a source simultaneously, so one k-round loop yields
    * d(s, v) ≤ k for all pairs — the input to closeness/eccentricity
    * centrality. Same min-plus integer relaxation (and therefore the
    * same cross-engine determinism contract) as [[hopDistance]], with
    * the source id carried as data; unreached pairs are simply ABSENT
    * (no sentinel rows — the relation stays |reached pairs|, not |V|²).
    *
    * Scale bound (stated, not hidden): the relation grows toward
    * |V| · reach(k), so this is for ENTITY-DOMAIN graphs — nations,
    * categories, labels — bounded domains like the centroid similarity
    * matrix, not the raw part/document graph (run per-source
    * [[hopDistance]] sweeps or hub sampling there).
    *
    * @return (s, id, dist) for reached pairs only, including (s, s, 0)
    */
  def allPairsHopDistance(vertices: DataFrame, edges: DataFrame,
                          rounds: Int): DataFrame = {
    require(rounds >= 0 && rounds < Unreached, s"rounds=$rounds")
    val e = edges.select(col("src"), col("dst")).distinct().cache()
    var dist = vertices.select(col("id").as("s"), col("id"), lit(0L).as("d"))
    for (_ <- 1 to rounds) {
      val relaxed = e.join(dist, e("src") === dist("id"))
        .select(col("s"), col("dst").as("id"), (col("d") + lit(1L)).as("d"))
      // same per-round lineage cut as hopDistance: `dist` appears in both
      // union legs, so laziness doubles the subtree every round — the
      // checkpoint keeps the plan linear in `rounds` at a cost bounded by
      // the reached-pairs relation this operator is contracted to
      dist = dist.unionAll(relaxed)
        .groupBy(col("s"), col("id")).agg(min(col("d")).as("d"))
        .localCheckpoint()
    }
    dist.select(col("s"), col("id"), col("d").as("dist"))
  }
}
