package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document → training-sequence shaping: overlapping token-window
  * chunking (long docs split to fit a context length) and
  * concat-and-cut sequence packing (short docs share a sequence so no
  * budget is wasted on padding) — the two standard pretraining-corpus
  * transforms between "cleaned documents" and "model batches".
  */
object TextChunking {

  /** Overlapping token windows: window `i` covers tokens
    * `[i·(size−overlap), i·(size−overlap)+size)`; the final window may
    * be short; an empty token list yields one empty window (callers
    * filter `size(chunk) > 0`). Pure per-row HOF — no shuffle, linear
    * scan at any corpus size.
    */
  def chunkTokens(toks: Column, chunkSize: Int, overlap: Int): Column = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got size=$chunkSize overlap=$overlap")
    val step = chunkSize - overlap
    val nWindows =
      floor((greatest(size(toks), lit(1)) - 1).cast("double") / step).cast("int") + 1
    transform(sequence(lit(0), nWindows - 1), i => slice(toks, i * step + 1, lit(chunkSize)))
  }

  /** Concat-and-cut packing: within each `partitionCol` shard, docs are
    * laid out in `orderCol` order and cut every `seqLen` tokens;
    * `pack_id` = the sequence the doc's FIRST token lands in
    * (exclusive running sum ÷ seqLen). Deterministic — the layout is a
    * pure function of the ordering column, so reruns produce identical
    * shards. The running sum is per-shard (language, source, date …),
    * which is also what keeps it scalable: each shard's prefix sum is
    * an independent window, so parallelism = number of shards rather
    * than a single global sequential pass.
    */
  def packSequences(docs: DataFrame, tokenCount: Column, orderCol: Column,
                    partitionCol: Column, seqLen: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val w = Window.partitionBy(partitionCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val prior = coalesce(sum(tokenCount).over(w), lit(0L))
    docs.withColumn("pack_id",
      ((prior - pmod(prior, lit(seqLen.toLong))) / seqLen).cast("long"))
  }
}
