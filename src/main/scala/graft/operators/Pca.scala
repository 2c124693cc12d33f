package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PCA projection for embedding columns — the dimensionality-reduction
  * axis of a vector engine (PCA / PCA-whitening before quantization is
  * the standard preprocessing in the Jégou-family ANN stack; the
  * reference's fixed-dim store, `/root/reference/streamlit_app.py:55-73`,
  * is the behavior anchor for a dim-changing projection done engine-side).
  *
  * Spark-first split of the work:
  *   - FIT is one aggregate pass: per-component sums and the upper
  *     triangle of the second-moment (Gram) matrix — 64 + 64·65/2
  *     doubles — via map-side partial aggregation; the 64×64 eigen
  *     problem then solves on the DRIVER (cyclic Jacobi, deterministic
  *     for a given matrix) — never distribute an O(dim³) problem that
  *     fits in a cache line budget.
  *   - PROJECT is a pure per-row codegen'd projection: component j =
  *     Σᵢ (xᵢ − μᵢ)·vⱼᵢ with μ and the basis embedded as literals —
  *     sequential left-fold accumulation (the SQL mirror's list_sum
  *     order), no shuffle, no UDF.
  *
  * Parity contract: the fitted (mean, basis) pair is embedded as exact
  * decimal literals in BOTH engines by the late-bound oracle (floating
  * Gram accumulation is shuffle-order-dependent, so the basis is
  * run-scoped state exactly like fitted KMeans centroids); each
  * projected component and the projected-space distance use sequential
  * accumulation; eigenvector SIGNS are canonicalized (largest-|·|
  * component positive) so the basis is unique given the spectrum.
  */
object Pca {

  /** Mean vector and top-`k` eigenvectors (rows) of the covariance of
    * `vecCol`, via one distributed moment pass + driver-side Jacobi.
    */
  def fit(corpus: DataFrame, vecCol: String, dim: Int,
          k: Int): (Array[Double], Array[Array[Double]]) = {
    val v = col(vecCol).cast("array<double>")
    val sumCols =
      (0 until dim).map(i => sum(element_at(v, i + 1)).as(s"s_$i")) ++
        (for { i <- 0 until dim; j <- i until dim } yield
          sum(element_at(v, i + 1) * element_at(v, j + 1)).as(s"p_${i}_$j")) ++
        Seq(count(lit(1)).cast("double").as("n"))
    val r = corpus.agg(sumCols.head, sumCols.tail: _*).collect()(0)
    val n = r.getAs[Double]("n")
    val mean = Array.tabulate(dim)(i => r.getAs[Double](s"s_$i") / n)
    val cov = Array.ofDim[Double](dim, dim)
    for { i <- 0 until dim; j <- i until dim } {
      val c = r.getAs[Double](s"p_${i}_$j") / n - mean(i) * mean(j)
      cov(i)(j) = c; cov(j)(i) = c
    }
    val (vals, vecs) = jacobiEigen(cov)
    val order = vals.zipWithIndex.sortBy { case (ev, i) => (-ev, i) }.map(_._2)
    val basis = order.take(k).map { ei =>
      val vec = Array.tabulate(dim)(d => vecs(d)(ei))
      // canonical sign: the largest-|component| (lowest index on ties)
      // is positive — makes the basis unique given the spectrum
      val pivot = vec.indices.maxBy(d => (math.abs(vec(d)), -d))
      if (vec(pivot) < 0) vec.map(x => -x) else vec
    }
    (mean, basis)
  }

  /** Cyclic Jacobi eigensolver for a symmetric matrix: returns
    * (eigenvalues, eigenvector COLUMNS). Deterministic sweep order;
    * converges quadratically — 64×64 finishes in a handful of sweeps.
    */
  private[graft] def jacobiEigen(
      a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    while (sweep < 100 && offDiag(a) > 1e-11) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          if (math.abs(a(p)(q)) > 1e-14) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t = math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
                case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
                case x => x
              }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < n) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < n) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for { i <- a.indices; j <- a.indices if i != j } s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }

  /** Projected component j of `vecCol` under (mean, basis): a
    * sequential left-fold over zip_with — the codegen'd twin of the SQL
    * mirror's list_sum accumulation order.
    */
  def component(vecCol: Column, mean: Array[Double],
                basisRow: Array[Double]): Column =
    aggregate(
      zip_with(vecCol.cast("array<double>"),
        typedLit(mean.zip(basisRow).map { case (m, b) => Seq(m, b) }.toSeq),
        (x, mb) => (x - element_at(mb, 1)) * element_at(mb, 2)),
      lit(0.0), (acc, x) => acc + x)

  /** Corpus + projected columns `pc_0 … pc_{k−1}`. */
  def project(df: DataFrame, vecCol: String, mean: Array[Double],
              basis: Array[Array[Double]]): DataFrame =
    basis.zipWithIndex.foldLeft(df) { case (d, (row, j)) =>
      d.withColumn(s"pc_$j", component(col(vecCol), mean, row))
    }

  /** Driver-side projection of a query vector (same arithmetic order as
    * [[component]]: sequential over i).
    */
  def projectVec(q: Array[Float], mean: Array[Double],
                 basis: Array[Array[Double]]): Array[Double] =
    basis.map { row =>
      var acc = 0.0; var i = 0
      while (i < q.length) { acc += (q(i).toDouble - mean(i)) * row(i); i += 1 }
      acc
    }
}
