package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate nearest-neighbor search via an IVF (inverted-file) index
  * — the scale path the reference never built (its corpus is 40 rows;
  * every search is a full scan, `streamlit_app.py:55-73`). At 100 TB a
  * full scan per query is untenable; IVF cuts the scanned fraction to
  * ~nprobe/nlist.
  *
  * Layout contract: `assignClusters` adds a `cluster_id` column; a
  * production deployment WRITES the corpus partitioned by it
  * (`df.write.partitionBy("cluster_id")`), so `search`'s
  * `cluster_id IN (probes)` filter becomes static partition pruning —
  * only the probed directories are read at all. Centroids are a tiny
  * sidecar (nlist × dim floats) broadcast to executors / kept on the
  * driver.
  *
  * Two centroid sources:
  *   - [[seededCentroids]]: the vectors of the `nlist` smallest ids —
  *     deterministic, SQL-reproducible (the DuckDB oracle recomputes the
  *     identical index), good enough for uniform corpora;
  *   - [[kmeansCentroids]]: Spark ML KMeans (k-means‖ init, fixed seed)
  *     — the quality path; the iterative float math is not
  *     SQL-recomputable, so its oracle row (`ann_ivf_kmeans_rewrite`)
  *     is built LATE from the fitted centroid literals, and the recall
  *     spec covers index quality.
  */
object Ann {

  /** Centroids = vectors of the `nlist` smallest ids (deterministic). */
  def seededCentroids(corpus: DataFrame, vecCol: String, idCol: String,
                      nlist: Int): Array[Array[Float]] =
    corpus.select(col(idCol), col(vecCol))
      .orderBy(col(idCol))
      .limit(nlist)
      .collect()
      .map(_.getSeq[Float](1).toArray)

  /** Spark ML KMeans centroids (fixed seed). */
  def kmeansCentroids(corpus: DataFrame, vecCol: String, nlist: Int,
                      seed: Long = 42L, maxIter: Int = 10): Array[Array[Float]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val vecs = corpus.select(array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(maxIter).fit(vecs)
    model.clusterCenters.map(_.toArray.map(_.toFloat))
  }

  /** Index of the nearest centroid (L2), ties → lower index. Evaluated
    * as one codegen'd expression per row: zip the centroid literal array
    * with its indices, take the lexicographic min of (distance, index)
    * structs. No shuffle — a projection.
    */
  def nearestCentroid(vec: Column, centroids: Array[Array[Float]]): Column = {
    val cents = typedLit(centroids.map(_.toSeq).toSeq)
    val idxs = sequence(lit(0), lit(centroids.length - 1))
    array_min(zip_with(cents, idxs, (c, i) =>
      struct(l2Distance(vec, c).as("d"), i.as("i")))).getField("i")
  }

  /** Corpus + `cluster_id` (write-time step of the index build). */
  def assignClusters(corpus: DataFrame, vecCol: String,
                     centroids: Array[Array[Float]]): DataFrame =
    corpus.withColumn("cluster_id", nearestCentroid(col(vecCol), centroids))

  /** The `nprobe` centroid indices closest to the query (driver-side —
    * centroids are tiny).
    */
  def probeIds(queryVec: Array[Float], centroids: Array[Array[Float]],
               nprobe: Int): Seq[Int] = {
    def l2(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val d = a(i).toDouble - b(i); acc += d * d; i += 1 }
      math.sqrt(acc)
    }
    centroids.zipWithIndex
      .map { case (c, i) => (l2(queryVec, c), i) }
      .sorted.take(nprobe).map(_._2).toSeq
  }

  /** IVF search: restrict to the probed clusters, exact top-k within.
    * With cluster-partitioned storage the IN-filter prunes partitions;
    * the inner search is the same TakeOrderedAndProject as exact KNN,
    * over ~nprobe/nlist of the data.
    */
  def search(indexed: DataFrame, vecCol: String, idCol: String,
             queryVec: Array[Float], k: Int,
             centroids: Array[Array[Float]], nprobe: Int,
             metric: Knn.Metric = Knn.Cosine): DataFrame = {
    val probes = probeIds(queryVec, centroids, nprobe)
    Knn.search(indexed.filter(col("cluster_id").isin(probes: _*)),
      vecCol, idCol, queryVec, k, metric)
  }

  // -------------------------------------------------------------------
  // Random-hyperplane LSH (sign-bucket) — the cosine-specific ANN
  // alternative to IVF: bucket = sign bits of projections onto nBits
  // seeded hyperplanes; near-cosine vectors agree on most signs.
  // -------------------------------------------------------------------

  /** Deterministic seeded hyperplanes (unit not required — only signs
    * matter).
    */
  def hyperplanes(dim: Int, nBits: Int, seed: Long = 42L): Array[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nBits)(Array.fill(dim)((rnd.nextGaussian()).toFloat))
  }

  /** md5-derived ±1 (Rademacher) hyperplanes — statistically equivalent
    * to gaussian planes for sign-LSH (only the projection SIGN is used,
    * and a ±1 plane is a valid random hyperplane draw), but every
    * component is recomputable in SQL
    * (`md5('tag:bit:j')`-parity — see the `ann_lsh_probe` oracle), so
    * the whole LSH path is hash-gated cross-engine, not spec-only.
    */
  def signPlanes(dim: Int, nBits: Int, tag: String = "lsh"): Array[Array[Float]] =
    Array.tabulate(nBits) { b =>
      Array.tabulate(dim) { j =>
        if (graft.functions.Md5.long48(s"$tag:$b:$j") % 2 == 0) 1.0f else -1.0f
      }
    }

  /** Packed sign-bucket id (LongType) of a vector under the planes. */
  def lshBucket(vec: Column, planes: Array[Array[Float]]): Column = {
    val planeLit = typedLit(planes.map(_.toSeq).toSeq)
    val idxs = sequence(lit(0), lit(planes.length - 1))
    aggregate(
      zip_with(planeLit, idxs, (p, i) =>
        when(dotProduct(vec, p) >= 0d, TextAnalysis.shl(lit(1L), i)).otherwise(0L)),
      lit(0L), (acc, x) => acc + x)
  }

  /** Corpus + `lsh_bucket` column (write-time step; partition or
    * bucket the stored corpus by it).
    */
  def assignLshBuckets(corpus: DataFrame, vecCol: String,
                       planes: Array[Array[Float]]): DataFrame =
    corpus.withColumn("lsh_bucket", lshBucket(col(vecCol), planes))

  /** Driver-side bucket of a single query vector. */
  def queryBucket(queryVec: Array[Float], planes: Array[Array[Float]]): Long = {
    var b = 0L
    planes.zipWithIndex.foreach { case (p, i) =>
      var dot = 0.0; var j = 0
      while (j < p.length) { dot += queryVec(j).toDouble * p(j); j += 1 }
      if (dot >= 0) b |= (1L << i)
    }
    b
  }

  /** All bucket ids within hamming distance ≤ radius of `bucket`
    * (multi-probe set; |set| = Σ C(nBits, r)).
    */
  def probeBuckets(bucket: Long, nBits: Int, radius: Int): Seq[Long] = {
    def flips(start: Int, left: Int, cur: Long): Seq[Long] =
      if (left == 0) Seq(cur)
      else (start until nBits).flatMap(i => flips(i + 1, left - 1, cur ^ (1L << i)))
    (0 to radius).flatMap(r => flips(0, r, bucket)).distinct
  }

  /** LSH search: restrict to buckets within `radius` sign flips of the
    * query bucket, exact top-k within. Same pruning contract as IVF:
    * bucket-partitioned storage turns the IN-filter into partition
    * pruning.
    */
  def lshSearch(bucketed: DataFrame, vecCol: String, idCol: String,
                queryVec: Array[Float], k: Int,
                planes: Array[Array[Float]], radius: Int = 1,
                metric: Knn.Metric = Knn.Cosine): DataFrame = {
    val probes = probeBuckets(queryBucket(queryVec, planes), planes.length, radius)
    Knn.search(bucketed.filter(col("lsh_bucket").isin(probes: _*)),
      vecCol, idCol, queryVec, k, metric)
  }

  /** Per-query recall@k of the LSH probe path against exact KNN — the
    * quality telemetry a production user tunes nBits/radius with,
    * computed distributed and deterministic (every rank on
    * (rounded dist, id)).
    *
    * Shape: the query set (a handful of rows) broadcasts onto ONE
    * corpus pass per branch; both branches rank with
    * `row_number ≤ k`, which Spark rewrites to WindowGroupLimit — each
    * map task forwards at most k rows per query to the one qid-keyed
    * shuffle, so the eval never shuffles the corpus itself. The ANN
    * branch restricts to buckets within `radius` sign flips BEFORE
    * ranking (the same candidate set the probe path scans).
    */
  def lshRecallEval(corpus: DataFrame, vecCol: String, idCol: String,
                    queries: DataFrame, qidCol: String, qVecCol: String,
                    planes: Array[Array[Float]], k: Int,
                    radius: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucketed = assignLshBuckets(corpus, vecCol, planes)
    val q = assignLshBuckets(
        queries.select(col(qidCol).as("qid"), col(qVecCol).as("qvec")), "qvec", planes)
      .withColumnRenamed("lsh_bucket", "qbucket")
    val scored = bucketed.crossJoin(broadcast(q))
      .select(col("qid"), col(idCol),
        round(cosineDistance(col(vecCol), col("qvec")), 6).as("dist"),
        expr("bit_count(lsh_bucket ^ qbucket)").as("hamming"))
    val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col(idCol))
    val exactTop = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).select("qid", idCol)
    val annTop = scored.filter(col("hamming") <= radius)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).select("qid", idCol)
    val nExact = exactTop.groupBy("qid").agg(count(lit(1)).as("n_exact"))
    val nAnn = annTop.groupBy("qid").agg(count(lit(1)).as("n_ann"))
    val overlap = exactTop.join(annTop, Seq("qid", idCol), "left_semi")
      .groupBy("qid").agg(count(lit(1)).as("n_overlap"))
    nExact.join(nAnn, Seq("qid"), "left").join(overlap, Seq("qid"), "left")
      .select(col("qid"),
        col("n_exact"),
        coalesce(col("n_ann"), lit(0L)).as("n_ann"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (coalesce(col("n_overlap"), lit(0L)) / lit(k).cast("double")).as("recall"))
      .orderBy(col("qid"))
  }

  /** Recall@k-vs-nprobe curve for the IVF probe path — the IVF twin of
    * [[lshRecallEval]], and THE number a production user tunes nprobe
    * against. One corpus pass scores every (query, point) pair
    * (queries broadcast); the exact branch and one branch per nprobe
    * value rank via `row_number ≤ k` (WindowGroupLimit — map tasks
    * forward ≤ k rows per query, the corpus never shuffles); probe
    * sets come from [[probeIds]] on the driver, exactly like the
    * serving path. Corpus-point queries guarantee every (nprobe, qid)
    * cell is populated: the query's own cluster is its rank-1 probe,
    * so the self-hit always survives.
    */
  def ivfRecallEval(corpus: DataFrame, vecCol: String, idCol: String,
                    queryVecs: Seq[(Long, Array[Float])],
                    centroids: Array[Array[Float]], k: Int,
                    nprobes: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = corpus.sparkSession
    import spark.implicits._
    val assigned = assignClusters(corpus, vecCol, centroids)
    val q = queryVecs.map { case (id, v) => (id, v.toSeq) }.toDF("qid", "qvec")
    val scored = assigned.crossJoin(broadcast(q))
      .select(col("qid"), col(idCol), col("cluster_id"),
        round(cosineDistance(col(vecCol), col("qvec")), 6).as("dist"))
    val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col(idCol))
    val exactTop = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).select("qid", idCol)
    val annTop = nprobes.map { p =>
      val allowed = queryVecs.flatMap { case (id, v) =>
        probeIds(v, centroids, p).map(cid => (id, cid))
      }.toDF("qid", "cid")
      scored.join(broadcast(allowed),
          scored("qid") === allowed("qid") && col("cluster_id") === col("cid"))
        .drop(allowed("qid")).drop("cid")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .select(lit(p).as("nprobe"), col("qid"), col(idCol))
    }.reduce(_ unionByName _)
    val exactSet = exactTop.toDF("eqid", "eid") // nq × k rows — broadcastable
    val perQuery = annTop
      .join(broadcast(exactSet),
        col("qid") === col("eqid") && col(idCol) === col("eid"), "left_semi")
      .groupBy(col("nprobe"), col("qid"))
      .agg(count(lit(1)).as("n_overlap"))
    perQuery.groupBy(col("nprobe"))
      .agg(count(lit(1)).as("n_queries"),
        sum(col("n_overlap")).as("sum_overlap"),
        (sum(col("n_overlap")).cast("double") /
          (lit(queryVecs.size) * lit(k)).cast("double")).as("mean_recall"),
        (min(col("n_overlap")).cast("double") / lit(k).cast("double")).as("min_recall"),
        (max(col("n_overlap")).cast("double") / lit(k).cast("double")).as("max_recall"))
      .orderBy(col("nprobe"))
  }

  /** Persist the cluster-assigned corpus partitioned by `cluster_id` —
    * the write-time half of the IVF index. Reads through
    * [[readIndexed]] + [[search]] then hit only the probed partition
    * directories (static partition pruning: the `cluster_id IN (…)`
    * filter never touches the other files).
    */
  def writeIndexed(corpus: DataFrame, vecCol: String,
                   centroids: Array[Array[Float]], path: String): Unit =
    assignClusters(corpus, vecCol, centroids)
      .write.mode("overwrite").partitionBy("cluster_id").parquet(path)

  /** The LSH twin of [[writeIndexed]]: persist the bucket-assigned
    * corpus partitioned by `lsh_bucket`, so a probe IN-filter (explicit
    * via [[lshSearch]] or injected by the transparent rewrite —
    * [[graft.plans.LshCatalog]]) becomes static partition pruning.
    */
  def writeLshIndexed(corpus: DataFrame, vecCol: String,
                      planes: Array[Array[Float]], path: String): Unit =
    assignLshBuckets(corpus, vecCol, planes)
      .write.mode("overwrite").partitionBy("lsh_bucket").parquet(path)

  /** The hybrid twin of [[writeIndexed]]/[[writeLshIndexed]]: BOTH index
    * columns assigned, two-level `cluster_id=…/lsh_bucket=…` directory
    * layout — so whichever probe filter [[graft.plans.IvfProbeRule]]'s
    * cost-based branch injects prunes directories statically. One write
    * serves two index families; the per-partition row counts the cost
    * model needs fall out of one bounded (≤ nlist·2^nBits rows) groupBy
    * over the written store.
    */
  def writeHybridIndexed(corpus: DataFrame, vecCol: String,
                         centroids: Array[Array[Float]],
                         planes: Array[Array[Float]], path: String): Unit =
    assignLshBuckets(assignClusters(corpus, vecCol, centroids), vecCol, planes)
      .write.mode("overwrite").partitionBy("cluster_id", "lsh_bucket").parquet(path)

  def readIndexed(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** recall@k of an ANN result against the exact top-k (both must carry
    * `idCol`). Driver-side on two k-row frames.
    */
  def recallAtK(annHits: DataFrame, exactHits: DataFrame, idCol: String): Double = {
    val ann = annHits.select(idCol).collect().map(_.get(0)).toSet
    val exact = exactHits.select(idCol).collect().map(_.get(0)).toSet
    if (exact.isEmpty) 1.0 else ann.intersect(exact).size.toDouble / exact.size
  }
}
