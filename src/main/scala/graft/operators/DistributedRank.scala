package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Global 1-based rank over a total ordering WITHOUT the single-partition
  * window: `row_number().over(Window.orderBy(...))` with no partitionBy
  * collapses the whole dataset into one task — the canonical 100 TB
  * anti-pattern (Spark even warns). This operator produces the identical
  * ranks with distributed mechanics:
  *
  *   1. `repartitionByRange` on the key (range exchange — the same
  *      machinery a global sort uses),
  *   2. `sortWithinPartitions`,
  *   3. one light pass counting rows per partition (a |partitions|-sized
  *      driver array — metadata, not data),
  *   4. a per-partition scan attaching `offset(p) + local row number`.
  *
  * Determinism: ranks depend only on the global order, so they are
  * partitioning-independent — but only if the ordering is TOTAL. Callers
  * must include a unique tiebreaker in `keys` (ties would otherwise get
  * arbitrary distinct ranks). Range-bound sampling may place boundary
  * rows differently run to run; with a total order the attached ranks
  * are still identical.
  *
  * The two passes over the sorted data (count, then rank) are the
  * textbook zip-with-index shape; the sorted intermediate is cached so
  * pass 2 doesn't recompute the exchange — callers running at a scale
  * where caching the sorted set is unaffordable should persist to disk
  * instead (the ranks don't change).
  */
object DistributedRank {

  /** @param df   input; all columns pass through
    * @param keys total-order key columns, ascending (include a unique
    *             tiebreaker — see object doc)
    * @param numPartitions range partitions (defaults to the session's
    *             shuffle parallelism)
    * @return df's columns plus `rank` (1-based BIGINT, dense in the
    *         sense of row_number — every row gets a distinct rank)
    */
  def byKey(df: DataFrame, keys: Seq[Column], numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(parts, keys: _*)
      .sortWithinPartitions(keys: _*)
      .cache()
    val counts = sorted.rdd
      .mapPartitionsWithIndex { (i, it) => Iterator((i, it.size.toLong)) }
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val ranked = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var r = offsets(i)
      it.map { row => r += 1; Row.fromSeq(row.toSeq :+ r) }
    }
    // the cache must OUTLIVE the returned plan: the offsets were computed
    // against THIS materialized partitioning, and an eager unpersist here
    // would let pass 2 recompute the range exchange with fresh sample
    // bounds — offsets would then belong to a different partitioning and
    // the ranks would silently skew. The session's cache lifecycle
    // (clearCache between queries; executor eviction under pressure is
    // safe because a partition recomputed FROM THE CACHED EXCHANGE keeps
    // its boundaries) owns the release.
    spark.createDataFrame(ranked, sorted.schema.add("rank", LongType, nullable = false))
  }
}
