package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftshim.ColumnShim

/** Bloom-filter membership as codegen-friendly Catalyst expressions.
  *
  * Spark ships `BloomFilterAggregate` / `BloomFilterMightContain` for
  * its own runtime row-group filtering (InjectRuntimeFilter) but does
  * not register them as SQL/DataFrame functions — these wrappers expose
  * them the same way the repo exposes column-valued bit shifts
  * (ColumnShim pattern). Both sides operate on a LONG key: the
  * aggregate `putLong`s each value, the predicate `mightContainLong`s
  * it, so callers must feed the SAME key expression to both (here:
  * the md5-derived 48-bit gram hash — already a long, no extra
  * xxhash64 pass needed).
  *
  * `mightContain`'s bloom argument must be foldable (a Literal) or a
  * scalar subquery — Spark enforces this because the plan ships the
  * serialized filter to every task. Build with [[bloomFilterAgg]],
  * collect the single binary row, and pass `lit(bytes)`.
  */
object BloomFunctions {

  /** Aggregate: serialized bloom filter over a LONG column.
    * `expectedItems` sizes the filter for the target false-positive
    * rate (Spark's default fpp ≈ 3%); the result is a BinaryType blob
    * whose size is O(expectedItems) BITS — the point of the bloom path:
    * an exact distinct-hash set needs 8 bytes per item broadcast, the
    * bloom needs ~9 bits per item at 3% fpp.
    */
  def bloomFilterAgg(longKey: Column, expectedItems: Long): Column =
    ColumnShim.column(
      new BloomFilterAggregate(ColumnShim.expression(longKey), expectedItems)
        .toAggregateExpression())

  /** Predicate: may `longKey` be in the serialized bloom `bloom`?
    * No false negatives; false positives at the filter's fpp.
    */
  def mightContain(bloom: Column, longKey: Column): Column =
    ColumnShim.column(BloomFilterMightContain(
      ColumnShim.expression(bloom), ColumnShim.expression(longKey)))
}
