package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact (brute-force) k-nearest-neighbor search — the reference's
  * flagship query (`streamlit_app.py:55-73`):
  *
  * {{{
  * SELECT ..., COSINE_DISTANCE(addr_vec, TO_VECTOR(:q, 384)) AS distance_score
  * FROM hotels ORDER BY distance_score ASC FETCH FIRST k ROWS ONLY
  * }}}
  *
  * Spark shape: `withColumn(distance) → orderBy → limit(k)`, which Catalyst
  * plans as `TakeOrderedAndProject` — a per-partition bounded heap merged
  * on the driver. No shuffle of the corpus, no global sort: the same
  * physical algorithm Oracle's FETCH FIRST uses, but distributed. This is
  * the plan that survives 100 TB: each task returns ≤ k rows.
  *
  * Determinism: ties on distance are broken by `idCol` (the reference's
  * own ordering is nondeterministic on ties — SURVEY §7.3).
  */
object Knn {

  /** Distance metrics supported by the search API. */
  sealed trait Metric { def apply(a: Column, b: Column): Column }
  case object Cosine extends Metric { def apply(a: Column, b: Column): Column = cosineDistance(a, b) }
  case object L2 extends Metric { def apply(a: Column, b: Column): Column = l2Distance(a, b) }
  case object NegDot extends Metric { def apply(a: Column, b: Column): Column = -dotProduct(a, b) }

  /** The reference UI's k domain: the Streamlit slider pins top_k to
    * [1, 10] (`streamlit_app.py:209` — min_value=1, max_value=10), so an
    * out-of-range k is clamped to the domain edge, never an error.
    */
  val ReferenceMinK = 1
  val ReferenceMaxK = 10

  /** Clamp k into the reference UI's [1, 10] domain. */
  def clampK(k: Int): Int = math.min(math.max(k, ReferenceMinK), ReferenceMaxK)

  /** Reference-parity search: identical to [[search]] but with k clamped
    * to the slider range the reference exposes — the API a reference user
    * actually gets (they cannot ask Oracle for k = 10000 through the UI).
    */
  def referenceSearch(corpus: DataFrame, vecCol: String, idCol: String,
                      queryVec: Array[Float], k: Int,
                      metric: Metric = Cosine): DataFrame =
    search(corpus, vecCol, idCol, queryVec, clampK(k), metric)

  /** Exact top-k under `metric` for a single query vector. */
  def search(corpus: DataFrame, vecCol: String, idCol: String,
             queryVec: Array[Float], k: Int,
             metric: Metric = Cosine,
             distCol: String = "distance_score"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    corpus
      .withColumn(distCol, metric(col(vecCol), typedLit(queryVec)))
      .orderBy(col(distCol).asc, col(idCol).asc)
      .limit(k)
  }

  /** The reference's end-to-end entry point (`perform_similarity_search`,
    * streamlit_app.py:45-52): TEXT query → embed on the driver (one
    * vector → literal in the plan) → exact top-k. The corpus must have
    * been embedded with the same model.
    */
  def searchText(corpus: DataFrame, vecCol: String, idCol: String,
                 queryText: String, k: Int,
                 model: graft.functions.EmbeddingModel,
                 metric: Metric = Cosine): DataFrame =
    search(corpus, vecCol, idCol, model.encode(queryText), k, metric)

  /** Filtered (hybrid) search: relational predicate + KNN. The predicate
    * is applied *before* the distance so Catalyst pushes it into the scan
    * (partition/file pruning at scale).
    */
  def filteredSearch(corpus: DataFrame, predicate: Column, vecCol: String,
                     idCol: String, queryVec: Array[Float], k: Int,
                     metric: Metric = Cosine): DataFrame =
    search(corpus.filter(predicate), vecCol, idCol, queryVec, k, metric)

  /** Batch KNN: top-k per query for a whole table of queries.
    *
    * `queries` (small: query_id, query vector) is broadcast; the corpus —
    * the big side — streams through a BroadcastNestedLoopJoin without
    * shuffling, then a window ranked per query keeps k rows. At 100 TB the
    * corpus never moves; only (|queries| × k) rows survive the rank
    * filter. The rank shuffle is over corpus×queries rows — for very large
    * query batches switch to the ANN path (operators.Ann).
    */
  def batchSearch(corpus: DataFrame, queries: DataFrame,
                  corpusVecCol: String, corpusIdCol: String,
                  queryVecCol: String, queryIdCol: String,
                  k: Int, metric: Metric = Cosine): DataFrame = {
    val dist = metric(col(corpusVecCol), col(queryVecCol))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("distance_score").asc, col(corpusIdCol).asc)
    corpus
      .crossJoin(broadcast(queries))
      .withColumn("distance_score", dist)
      .withColumn("knn_rank", row_number().over(w))
      .filter(col("knn_rank") <= k)
  }

  /** Reference-parity result shaping (`streamlit_app.py:221-234`):
    * `match_score = round((1 − distance) × 100, 2)` and its display string,
    * sorted score-descending for RAG context assembly.
    */
  def withMatchScore(results: DataFrame, idCol: String,
                     distCol: String = "distance_score"): DataFrame =
    results
      .withColumn("match_score", round((lit(1.0) - col(distCol)) * 100.0, 2))
      .withColumn("display_score", concat(col("match_score").cast("string"), lit("%")))
      .orderBy(col("match_score").desc, col(idCol).asc)
}
