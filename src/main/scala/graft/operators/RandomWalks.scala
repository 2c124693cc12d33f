package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic weighted random walks over an edge table — the walk-
  * generation stage of DeepWalk (Perozzi et al. 2014) / node2vec
  * (Grover & Leskovec 2016, the p=q=1 first-order case), which turns a
  * graph into skip-gram training sequences for embedding training.
  *
  * Determinism contract: step t of walk w draws
  *   r = md5_48(walk_id ":" t)  mod  Σ_out w(cur)
  * and advances along the out-edge whose cumulative-weight interval
  * [lo, hi) contains r — the inverse-CDF weighted pick with the repo's
  * portable hash in place of an RNG, so a DuckDB oracle (and an append
  * re-run) reproduces every step bit-for-bit. Neighbor intervals order
  * by dst, so they are a pure function of the edge SET (partitioning-
  * independent).
  *
  * Scale shape: intervals are precomputed once (two per-src windows
  * over the edge table — edge-sized, one shuffle); each step is ONE
  * src-keyed equi-join of the walk frontier against the interval table
  * with the interval test as a post-join filter. Frontiers are
  * data-parallel (millions of walks = a big DataFrame, never driver
  * state); steps are bounded by the caller. Walks whose current node
  * has no out-edge simply leave the frontier (inner-join semantics) —
  * the standard sink rule.
  */
object RandomWalks {

  /** Annotate directed weighted edges (src, dst, w) with the pick
    * intervals: lo/hi = cumulative weight before/after this edge in
    * dst order, totw = the node's total out-weight. Adjacent intervals
    * tile [0, totw) exactly — every draw lands on exactly one edge.
    *
    * Precondition (enforced): w > 0. A non-positive weight breaks the
    * tiling invariant silently — an empty or inverted interval, and
    * totw ≤ 0 flips `md5 % totw` negative so every walk at that node
    * dies with no error — so the guard raises per-row instead of
    * dropping (ADVICE r17; one codegen'd CASE, no extra pass).
    */
  def withIntervals(edges: DataFrame): DataFrame = {
    val wCum = Window.partitionBy(col("src")).orderBy(col("dst"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    edges
      .withColumn("w", when(col("w") > 0, col("w")).otherwise(raise_error(
        concat(lit("RandomWalks.withIntervals: edge weight must be > 0, got "),
          col("w").cast("string")))))
      .withColumn("hi", sum(col("w")).over(wCum))
      .withColumn("lo", col("hi") - col("w"))
      .withColumn("totw", sum(col("w")).over(Window.partitionBy(col("src"))))
  }

  /** Advance `starts` (walk_id: long, cur: long, path: string) through
    * `steps` weighted picks over [[withIntervals]]-annotated edges.
    * Returns the surviving frontier with the full '>'-joined path.
    */
  def walk(starts: DataFrame, edgesWithIntervals: DataFrame, steps: Int): DataFrame = {
    require(steps >= 1, s"steps=$steps must be >= 1")
    (1 to steps).foldLeft(starts) { (curDf, t) =>
      val r = TextAnalysis.md5Long48(
        concat_ws(":", col("walk_id").cast("string"), lit(t.toString))) % col("totw")
      curDf.join(edgesWithIntervals, col("cur") === col("src"))
        .filter(r >= col("lo") && r < col("hi"))
        .select(col("walk_id"), col("dst").cast("long").as("cur"),
          concat(col("path"), lit(">"), col("dst").cast("string")).as("path"))
    }
  }
}
