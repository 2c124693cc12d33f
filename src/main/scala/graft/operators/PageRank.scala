package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted PageRank by deterministic integer power iteration — the
  * iterative-graph-algorithm operator (entity importance over a linkage
  * graph: which sources dominate a dedup cluster, which nations anchor
  * the trade network). Complements the connected-components operator
  * (Dedup.duplicateClustersWithRounds): CC finds the partition, PageRank
  * ranks inside it.
  *
  * Determinism contract (what makes it hash-gateable cross-engine):
  * ranks are BIGINT micro-units of a fixed total mass; every step is
  * integer arithmetic — the out-share is the two-step truncation
  *   `(((r × dampingPct) div 100) × w) div totw`
  * which both Spark (`div`) and ANSI/DuckDB (`//`) truncate identically
  * for non-negative operands, and integer SUM is order-independent. No
  * float enters the loop, so the result is bit-identical regardless of
  * partitioning, shuffle order, or engine. The two-step ordering keeps
  * intermediates inside int64: r·damping ≤ 100·mass ≈ 10¹⁴, then ×w
  * stays < 2⁶³ for edge weights up to ~10⁴ × totw-relative — with the
  * default 10¹² mass, safe while max edge weight < 9·10⁶ (documented
  * bound; lift mass down a decade if a graph exceeds it).
  *
  * Scale shape: one shuffle per iteration (groupBy dst), edges+degrees
  * cached once and reused across iterations; vertices keep their rank
  * via a left join so isolated nodes hold exactly the teleport mass.
  * Dangling mass (outdeg = 0) is dropped, the standard simplification.
  * For web-scale graphs swap the per-iteration `r` lineage for
  * checkpoints exactly like the CC loop (Dedup.scala pointer-doubling
  * rounds); at 3–20 iterations over a cached edge relation the lineage
  * is a non-issue.
  */
object PageRank {

  /** @param vertices one `id` column (any integral type)
    * @param edges    `src`, `dst`, `w` (positive integral weight)
    * @param iterations power-iteration count (fixed, part of the result's
    *                   definition — this is a truncated power series, not
    *                   a convergence loop)
    * @param massMicro  total rank mass in micro-units (conserved up to
    *                   truncation dust and dangling loss)
    * @param dampingPct damping factor as an integer percentage
    * @return (id, rank_micro BIGINT)
    */
  def weighted(vertices: DataFrame, edges: DataFrame, iterations: Int,
               massMicro: Long = 1000000000000L, dampingPct: Int = 85): DataFrame = {
    require(iterations >= 0 && dampingPct >= 0 && dampingPct <= 100)
    // |V| is a scalar in the teleport formula — a one-row driver action,
    // not a collect of data.
    val nV = vertices.count()
    val deg = edges.groupBy(col("src")).agg(sum(col("w").cast("long")).as("totw"))
    val e = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .join(deg, "src").cache()
    val teleport = (massMicro * (100 - dampingPct) / 100) / nV
    var r = vertices.select(col("id"), lit(massMicro / nV).as("r"))
    for (_ <- 1 to iterations) {
      val contrib = e.join(r, e("src") === r("id"))
        .select(col("dst"),
          expr(s"(((r * $dampingPct) div 100) * w) div totw").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("inmass"))
      r = vertices.join(contrib, vertices("id") === contrib("dst"), "left")
        .select(vertices("id"),
          (lit(teleport) + coalesce(col("inmass"), lit(0L))).as("r"))
    }
    r.select(col("id"), col("r").as("rank_micro"))
  }

  /** Personalized PageRank: identical deterministic integer power
    * iteration, but ALL teleport mass returns to the seed set instead of
    * spreading uniformly — the "related items from these seeds"
    * recommendation primitive (random walk with restart). Non-seed
    * vertices start at 0 and receive rank only through edges, so with a
    * small seed set most of the graph stays at exactly 0 and the rank
    * relation is effectively sparse. Same int64 headroom bound as
    * [[weighted]].
    *
    * @param seeds one `id` column; must be ⊆ vertices. Teleport and the
    *              initial mass split massMicro/|seeds| evenly (integer
    *              division; the dust is dropped, same as the truncation
    *              dust of the flow step).
    */
  def personalized(vertices: DataFrame, edges: DataFrame, seeds: DataFrame,
                   iterations: Int, massMicro: Long = 1000000000000L,
                   dampingPct: Int = 85): DataFrame = {
    require(iterations >= 0 && dampingPct >= 0 && dampingPct <= 100)
    val nS = seeds.count()
    require(nS > 0, "personalized PageRank needs a non-empty seed set")
    val deg = edges.groupBy(col("src")).agg(sum(col("w").cast("long")).as("totw"))
    val e = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .join(deg, "src").cache()
    val seedSet = seeds.select(col("id").as("sid")).cache()
    val teleport = (massMicro * (100 - dampingPct) / 100) / nS
    var r = vertices.join(seedSet, vertices("id") === col("sid"), "left")
      .select(vertices("id"),
        when(col("sid").isNotNull, lit(massMicro / nS)).otherwise(lit(0L)).as("r"))
    for (_ <- 1 to iterations) {
      val contrib = e.join(r, e("src") === r("id"))
        .select(col("dst"),
          expr(s"(((r * $dampingPct) div 100) * w) div totw").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("inmass"))
      r = vertices.join(contrib, vertices("id") === contrib("dst"), "left")
        .join(seedSet, vertices("id") === col("sid"), "left")
        .select(vertices("id"),
          (when(col("sid").isNotNull, lit(teleport)).otherwise(lit(0L)) +
            coalesce(col("inmass"), lit(0L))).as("r"))
    }
    r.select(col("id"), col("r").as("rank_micro"))
  }
}
