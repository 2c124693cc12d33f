package graft

import graft.operators.Pca
import org.apache.spark.sql.functions._

/** PCA tests: the Jacobi eigensolver against analytic spectra, basis
  * orthonormality, projection-vs-driver agreement, and the variance
  * ordering the principal axes must exhibit.
  */
class PcaSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf("sf0.001")).cache()

  test("jacobi eigensolver recovers an analytic 2×2 spectrum") {
    // [[3,1],[1,3]] has eigenvalues 4 and 2, eigenvectors (1,1)/√2, (1,−1)/√2
    val (vals, vecs) = Pca.jacobiEigen(Array(Array(3.0, 1.0), Array(1.0, 3.0)))
    val sorted = vals.sorted
    assert(math.abs(sorted(0) - 2.0) < 1e-12 && math.abs(sorted(1) - 4.0) < 1e-12)
    val hi = vals.indexOf(vals.max)
    val v = Array(vecs(0)(hi), vecs(1)(hi))
    assert(math.abs(math.abs(v(0)) - math.sqrt(0.5)) < 1e-12)
    assert(math.abs(v(0) - v(1)) < 1e-12, "eigenvector of λ=4 is (1,1) direction")
  }

  test("fitted basis is orthonormal; variance is ordered along it") {
    val (_, basis) = fitted
    for (i <- basis.indices) {
      val nrm = math.sqrt(basis(i).map(x => x * x).sum)
      assert(math.abs(nrm - 1.0) < 1e-8, s"row $i norm $nrm")
      for (j <- (i + 1) until basis.length) {
        val dot = basis(i).zip(basis(j)).map { case (a, b) => a * b }.sum
        assert(math.abs(dot) < 1e-8, s"rows $i,$j dot $dot")
      }
    }
    val (mean, b) = fitted
    val projected = Pca.project(emb, "embedding", mean, b)
    val vars = (0 until 4).map { j =>
      projected.agg(var_pop(col(s"pc_$j"))).collect()(0).getDouble(0)
    }
    assert(vars == vars.sortBy(-_),
      s"principal-component variances must be non-increasing: $vars")
  }

  test("engine projection agrees with driver-side projectVec") {
    val (mean, basis) = fitted
    val rows = Pca.project(emb, "embedding", mean, basis)
      .select(col("embedding") +: basis.indices.map(j => col(s"pc_$j")): _*)
      .limit(10).collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](0).toArray
      val want = Pca.projectVec(v, mean, basis)
      basis.indices.foreach { j =>
        assert(r.getDouble(j + 1) == want(j),
          s"pc_$j: engine ${r.getDouble(j + 1)} != driver ${want(j)}")
      }
    }
  }

  test("projection plan: no shuffle, no UDF") {
    val (mean, basis) = fitted
    val p = Pca.project(emb, "embedding", mean, basis)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"projection must not shuffle:\n$p")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
      s"projection must not use UDFs:\n$p")
  }

  private lazy val fitted = Pca.fit(emb, "embedding", dim = 64, k = 16)
}
