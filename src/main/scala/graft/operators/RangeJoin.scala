package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-range join: all (left, right) pairs with
  * `right.ts ∈ [left.ts − before, left.ts + after]`, per key.
  *
  * Spark has no native range join; the naive plan is a
  * BroadcastNestedLoopJoin (or a per-key cartesian) — O(n·m) within
  * key, a scale-killer on hot keys. This implementation turns the
  * range predicate into an EQUALITY join on coarse time buckets:
  *
  *   - bucket width = the full window span, so a left row's window
  *     overlaps AT MOST TWO buckets → left fanout ≤ 2, right fanout 1;
  *   - join on (keys…, bucket) runs as a plain shuffle hash/sort-merge
  *     join — linear shuffle, partitioned by key+time so a hot key's
  *     rows also spread over time buckets (built-in skew relief);
  *   - the exact window predicate filters the candidates after the
  *     join (bucket overlap ⊇ window overlap, never misses a pair).
  *
  * Inputs must have disjoint column names apart from `keys` (rename
  * before calling); both must carry a timestamp column.
  */
object RangeJoin {

  def timeRangeJoin(left: DataFrame, right: DataFrame,
                    leftTs: String, rightTs: String,
                    beforeUs: Long, afterUs: Long,
                    keys: Seq[String]): DataFrame = {
    val span = beforeUs + afterUs
    require(span > 0, s"window span must be positive, got [−$beforeUs, +$afterUs]")
    val lUs = unix_micros(col(leftTs))
    val rUs = unix_micros(col(rightTs))
    // exact integer floor-div (subtract the non-negative pmod remainder
    // first): double division would lose ulps on µs-scale magnitudes
    // and misbucket rows at window boundaries
    def bucketOf(us: org.apache.spark.sql.Column) =
      ((us - pmod(us, lit(span))) / span).cast("long")
    val l = left.withColumn("_bkt",
      explode(array_distinct(array(bucketOf(lUs - beforeUs), bucketOf(lUs + afterUs)))))
    val r = right.withColumn("_bkt", bucketOf(rUs))
    l.join(r, (keys :+ "_bkt").toSeq)
      .filter(rUs >= lUs - beforeUs && rUs <= lUs + afterUs)
      .drop("_bkt")
  }
}
