package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed element-wise vector-mean aggregator (SURVEY §2.9): the
  * centroid computation of an IVF refresh, as a single-pass
  * `Aggregator` with map-side partial aggregation — at scale each
  * partition reduces to one (sums, count) buffer of `dim` doubles
  * before the shuffle, vs. exploding |rows|×dim elements.
  *
  * (The oracle-checkable explode-based formulation lives in
  * `VectorQueries.centroidsByLabel`; this is the fast path, spec-tested
  * against it.)
  */
final case class CentroidBuffer(sums: Array[Double], var count: Long)

class CentroidAggregator(dim: Int)
    extends Aggregator[Seq[Float], CentroidBuffer, Seq[Float]] {

  override def zero: CentroidBuffer = CentroidBuffer(new Array[Double](dim), 0L)

  override def reduce(b: CentroidBuffer, v: Seq[Float]): CentroidBuffer = {
    var i = 0
    val n = math.min(dim, v.length)
    while (i < n) { b.sums(i) += v(i); i += 1 }
    b.count += 1
    b
  }

  override def merge(a: CentroidBuffer, b: CentroidBuffer): CentroidBuffer = {
    var i = 0
    while (i < dim) { a.sums(i) += b.sums(i); i += 1 }
    a.count += b.count
    a
  }

  override def finish(b: CentroidBuffer): Seq[Float] =
    if (b.count == 0L) Seq.fill(dim)(0.0f)
    else b.sums.map(s => (s / b.count).toFloat).toSeq

  override def bufferEncoder: Encoder[CentroidBuffer] = Encoders.product[CentroidBuffer]
  override def outputEncoder: Encoder[Seq[Float]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]()
}
