package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF-PQ — the composed index (Jégou et al., TPAMI 2011 §IV, "IVFADC"):
  * a coarse IVF quantizer routes each vector to a cluster, and product
  * quantization encodes the RESIDUAL (vector − assigned centroid), which
  * has far less energy than the raw vector and so quantizes with much
  * lower distortion at the same code budget. This is the layout every
  * large-scale vector engine ships as its default big-corpus index
  * (reference behavior anchor: the index options behind
  * `/root/reference/streamlit_app.py:55-73`'s vector store, re-expressed
  * Spark-first over the [[Ann]] coarse layer and the [[Pq]] codebooks).
  *
  * Why it is THE 100 TB shape — both scan-reduction axes compose in one
  * persisted layout:
  *   - rows: the store is written `partitionBy(cluster_id)`, so the
  *     query's probe filter is static partition pruning — only
  *     ~nprobe/nlist of the directories are opened at all;
  *   - bytes: each surviving row is scored from its `m` PQ codes (8
  *     bytes at m=8) — the vector column isn't in the store; the scan
  *     reads ~(nprobe/nlist)·(1/32) of the raw-vector bytes.
  *
  * Scoring is per-cluster ADC: for each probed cluster `c` the driver
  * precomputes the table of squared subspace distances between the
  * query RESIDUAL (q − centroid_c, double) and the shared residual
  * codebooks; a row in cluster `c` scores as m lookups in table_c + a
  * fixed left-associated add chain, dispatched by ONE codegen'd CASE on
  * `cluster_id` — no vector arithmetic anywhere in the scan.
  *
  * Determinism/parity contract (the late-bound DuckDB oracle mirrors
  * every step):
  *   - coarse centroids are the SQL-recomputable seeded kind
  *     ([[Ann.seededCentroids]]) or KMeans (then the oracle embeds the
  *     fitted literals — same contract as `ann_ivf_kmeans_rewrite`);
  *   - residuals are computed in DOUBLE on both engines (float widening
  *     is exact; double subtraction is IEEE-identical) — never
  *     round-tripped through float32;
  *   - code assignment = argmin of the same sqrt'd L2 with ties → lower
  *     code id ([[Ann.nearestCentroid]] struct-min ≡ the oracle's
  *     row_number tie rule);
  *   - ADC tables are computed ONCE driver-side and embedded as exact
  *     decimal literals on both engines; the per-row sum is a fixed
  *     left-associated chain;
  *   - top-k SELECTION runs on full-precision (adc, id); presentation
  *     rounds to 6 decimals and re-sorts on the rounded alias.
  */
object IvfPq {

  /** Residual column (double): vec − assigned centroid, elementwise.
    * Exact on both engines: float→double widening is lossless and the
    * subtraction is a single IEEE double op per element.
    */
  def withResidual(indexed: DataFrame, vecCol: String,
                   centroids: Array[Array[Float]]): DataFrame = {
    val centsD = typedLit(centroids.map(_.map(_.toDouble).toSeq).toSeq)
    indexed.withColumn("residual",
      zip_with(col(vecCol).cast("array<double>"),
        element_at(centsD, col("cluster_id") + 1), (a, b) => a - b))
  }

  /** Fit the composed index: coarse assignment, then residual PQ
    * codebooks (one KMeans per subspace over the residuals — at cluster
    * scale the fit runs on a driver-chosen sample, like [[Pq]]).
    */
  def fitResidualCodebooks(corpus: DataFrame, vecCol: String,
                           centroids: Array[Array[Float]], dim: Int,
                           m: Int, ksub: Int): Array[Array[Array[Float]]] = {
    val resid = withResidual(Ann.assignClusters(corpus, vecCol, centroids), vecCol, centroids)
    Pq.fitCodebooks(resid, "residual", dim, m, ksub)
  }

  /** Write-time build: persist ONLY (id, pq_codes) partitioned by
    * `cluster_id` — the IVFADC serving layout. Returns the path.
    */
  def writeIndex(corpus: DataFrame, vecCol: String, idCol: String,
                 centroids: Array[Array[Float]],
                 codebooks: Array[Array[Array[Float]]], path: String): Unit = {
    val resid = withResidual(Ann.assignClusters(corpus, vecCol, centroids), vecCol, centroids)
    Pq.encode(resid, "residual", codebooks)
      .select(col(idCol), col("cluster_id"), col("pq_codes"))
      .write.mode("overwrite").partitionBy("cluster_id").parquet(path)
  }

  def readIndex(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Per-probed-cluster ADC tables over the query's residuals. */
  def adcTables(queryVec: Array[Float], centroids: Array[Array[Float]],
                codebooks: Array[Array[Array[Float]]],
                probes: Seq[Int]): Seq[(Int, Array[Array[Double]])] =
    probes.map { c =>
      val qr = Array.tabulate(queryVec.length)(i =>
        queryVec(i).toDouble - centroids(c)(i))
      c -> Pq.adcTableD(qr, codebooks)
    }

  /** Probe + score + top-k over the persisted index: the probe filter
    * prunes partitions, the CASE-dispatched ADC chains score the codes,
    * TakeOrderedAndProject keeps k. Zero shuffles, zero vector reads.
    */
  def search(store: DataFrame, idCol: String, queryVec: Array[Float],
             centroids: Array[Array[Float]],
             codebooks: Array[Array[Array[Float]]],
             nprobe: Int, k: Int): DataFrame = {
    val probes = Ann.probeIds(queryVec, centroids, nprobe)
    val score = adcTables(queryVec, centroids, codebooks, probes)
      .foldLeft(lit(null).cast("double")) { case (acc, (c, t)) =>
        when(col("cluster_id") === c, Pq.adcScore(col("pq_codes"), t)).otherwise(acc)
      }
    store.filter(col("cluster_id").isin(probes: _*))
      .withColumn("adc_dist", score)
      .orderBy(col("adc_dist"), col(idCol))
      .limit(k)
  }
}
