package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maximal-marginal-relevance (MMR) diversified reranking — the
  * standard serving-side fix for redundant top-k results (Carbonell &
  * Goldstein 1998): greedily pick the candidate maximizing
  * `λ·relevance − (1−λ)·max-similarity-to-already-picked`, so the
  * second copy of a near-duplicate hit is demoted in favor of novel
  * results.
  *
  * Execution shape: the SHORTLIST is the distributed part — an exact
  * (or ANN) top-`shortlist` that plans as TakeOrderedAndProject over
  * the corpus scan, ≤ shortlist rows per task, no corpus shuffle. The
  * greedy selection is inherently sequential in k and runs on the
  * driver over those ≤ shortlist collected rows — the same k-sized
  * collect the recall artifacts use, and exactly where a production
  * reranker runs (the serving node, after retrieval). Nothing
  * data-sized ever reaches the driver.
  *
  * Determinism/parity: relevance = 1 − distance with the distance
  * rounded to 6 decimals (the repo-wide distance contract); pairwise
  * similarity = 1 − cosine rounded the same way; each greedy score is
  * re-rounded before the argmax and ties break on the smaller id. The
  * rounding replicates Spark's `round` (BigDecimal.valueOf → HALF_UP),
  * which the oracle family has proven ≡ DuckDB `round` across decades,
  * so a DuckDB recursive-CTE greedy reproduces the selection exactly.
  */
object Mmr {

  final case class Pick(pickOrder: Int, id: Long, mmrScore: Double)

  /** Spark-`round(_, 6)` semantics (MathExpressions.Round on DOUBLE). */
  private def r6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Sequential double cosine distance ≡ [[graft.functions.CosineDistance]]. */
  private def cosineDist(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Greedy MMR over a shortlist of (id, relevance, vector). */
  def diversify(cands: Seq[(Long, Double, Array[Float])], k: Int,
                lambda: Double): Seq[Pick] = {
    val byId = cands.sortBy(_._1)
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float])]
    val picks = scala.collection.mutable.ArrayBuffer.empty[Pick]
    while (picks.size < math.min(k, byId.size)) {
      var bestId = -1L; var bestScore = Double.NegativeInfinity
      for ((id, rel, vec) <- byId if !selected.exists(_._1 == id)) {
        val mx =
          if (selected.isEmpty) 0.0
          else selected.map(s => r6(1.0 - cosineDist(vec, s._2))).max
        val score = r6(lambda * rel - (1.0 - lambda) * mx)
        if (score > bestScore) { bestScore = score; bestId = id }
      }
      val vec = byId.find(_._1 == bestId).get._3
      selected += ((bestId, vec))
      picks += Pick(picks.size + 1, bestId, bestScore)
    }
    picks.toSeq
  }

  /** Distributed shortlist → driver greedy → (pick_order, id, mmr_score). */
  def diversifiedSearch(corpus: DataFrame, vecCol: String, idCol: String,
                        queryVec: Array[Float], k: Int, shortlist: Int,
                        lambda: Double = 0.5): DataFrame = {
    val spark = corpus.sparkSession
    val top = Knn.search(corpus, vecCol, idCol, queryVec, shortlist)
      .select(col(idCol).cast("long").as("id"),
        round(col("distance_score"), 6).as("dist"), col(vecCol).as("vec"))
      .collect()
      .map(r => (r.getLong(0), 1.0 - r.getDouble(1),
        r.getSeq[Float](2).toArray))
    toDf(spark, diversify(top.toSeq, k, lambda), idCol)
  }

  def toDf(spark: SparkSession, picks: Seq[Pick], idCol: String): DataFrame = {
    import spark.implicits._
    picks.toDF("pick_order", "id", "mmr_score")
      .withColumnRenamed("id", idCol)
  }
}
