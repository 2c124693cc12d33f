package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Approximate betweenness centrality by k-source Brandes (Brandes
  * 2001 "A faster algorithm for betweenness centrality"; Brandes &
  * Pich 2007 for the source-sampling estimator) — the "who sits on the
  * paths" centrality beside PageRank/HITS (importance), closeness
  * (reach cost), and eccentricity (reach radius).
  *
  * Exact betweenness needs a full SSSP from EVERY vertex — O(|V|·|E|),
  * never 100 TB-shaped. The sampled form runs Brandes from k
  * deterministic sources and scales by n/k (an unbiased estimator of
  * the exact score); work is k bounded BFS sweeps plus k dependency
  * accumulations, each one keyed shuffle per layer — the same
  * round-count × scan-cost shape as the LPA/SSSP family.
  *
  * Determinism contract (what makes the iteration hash-gateable):
  *   - forward distances d(s,v) are BIGINT min-plus (order-independent),
  *     the [[Bfs.allPairsHopDistance]] loop with p0 restricted to the
  *     sampled sources;
  *   - path counts σ(s,v) are exact BIGINT sums over the BFS DAG,
  *     layer by layer (σ of a layer-l vertex sums its layer-(l-1)
  *     predecessors' σ — integer, order-independent);
  *   - dependencies δ(s,v) accumulate backward per layer; each term
  *     σ_sv/σ_sw · (1 + δ_sw) evaluates in double with one fixed
  *     parenthesization, rounds at 6, and sums in DECIMAL(38,6)
  *     (order-independent) — the established iterative-parity channel.
  *
  * Truncation semantics: distances, σ and δ are computed within the
  * `rounds`-hop horizon — "betweenness over paths of ≤ k hops", the
  * defined quantity at any scale (the same k-capped contract as
  * closeness/eccentricity). The all-sources relation is held to
  * entity-domain graphs by the |S|·reach bound; at larger |V| the
  * source sample is the scale knob (k stays fixed as |V| grows).
  */
object Betweenness {

  private val dec6 = DecimalType(38, 6)

  /** Unscaled dependency sums Σ_{s ∈ sources} δ_s(v) over the ≤`rounds`
    * BFS DAG — callers scale by n/k for the betweenness estimate.
    *
    * @param sources one `id` column: the sampled Brandes sources
    * @param edges   `src`, `dst` (directed; deduplicated internally)
    * @return (id, dep) for vertices with non-trivial dependency only
    *         (callers left-join and coalesce to 0)
    */
  def sourceDependencies(sources: DataFrame, edges: DataFrame,
                         rounds: Int): DataFrame = {
    require(rounds >= 2 && rounds < Bfs.Unreached, s"rounds=$rounds")
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint()

    // forward 1: multi-source hop distances (s, v, d) — the
    // Bfs.allPairsHopDistance loop with p0 restricted to the sources
    var dist = sources.select(col("id").as("s"), col("id").as("v"),
      lit(0L).as("d"))
    for (_ <- 1 to rounds) {
      dist = dist.unionAll(
          e.join(dist, e("src") === dist("v"))
            .select(col("s"), col("dst").as("v"), (col("d") + lit(1L)).as("d")))
        .groupBy(col("s"), col("v")).agg(min(col("d")).as("d"))
        .localCheckpoint()
    }

    // forward 2: shortest-path counts σ per BFS layer — layer l's σ is
    // the sum of layer-(l-1) predecessors' σ along edges that land
    // EXACTLY at distance l (the shortest-path DAG edges)
    val layerSig = new Array[DataFrame](rounds + 1)
    layerSig(0) = sources.select(col("id").as("s"), col("id").as("v"),
      lit(1L).as("sig")).localCheckpoint()
    for (l <- 1 to rounds) {
      layerSig(l) = e.join(layerSig(l - 1), e("src") === col("v"))
        .select(col("s"), col("dst").as("v"), col("sig"))
        .join(dist.filter(col("d") === l).select(col("s"), col("v")),
          Seq("s", "v"))
        .groupBy(col("s"), col("v")).agg(sum(col("sig")).as("sig"))
        .localCheckpoint()
    }

    // backward: dependency accumulation, deepest layer first —
    // δ(s,v) = Σ over DAG successors w of σ_sv/σ_sw · (1 + δ_sw);
    // the deepest layer's δ is 0 (its vertices have no successors
    // inside the horizon), and layer 0 is (s,s) — excluded by Brandes
    val eFwd = e.select(col("src").as("v"), col("dst").as("w"))
    var next = layerSig(rounds)
      .select(col("s"), col("v"), col("sig"), lit(0).cast(dec6).as("dlt"))
      .localCheckpoint()
    var acc: Option[DataFrame] = None
    for (l <- (rounds - 1) to 1 by -1) {
      val w = next.select(col("s"), col("v").as("w"),
        col("sig").as("w_sig"), col("dlt").as("w_dlt"))
      val term = round(col("sig").cast("double") / col("w_sig").cast("double") *
        (lit(1.0) + col("w_dlt").cast("double")), 6).cast(dec6)
      val cur = layerSig(l)
        .join(eFwd, Seq("v"), "left")
        .join(w, Seq("s", "w"), "left")
        .groupBy(col("s"), col("v"), col("sig"))
        .agg(coalesce(sum(term), lit(0).cast(dec6)).as("dlt"))
        .localCheckpoint()
      acc = Some(acc.map(_.unionAll(cur)).getOrElse(cur))
      next = cur
    }

    acc.map(_.groupBy(col("v").as("id"))
        .agg(sum(col("dlt")).cast(dec6).as("dep")))
      .getOrElse(sources.select(col("id"), lit(0).cast(dec6).as("dep"))
        .limit(0))
  }
}
