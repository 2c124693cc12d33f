package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton curve) data layout — multi-dimensional clustering
  * for file/row-group skipping, the layout-maintenance companion to
  * [[Compact]] (whose single-column range sort only helps predicates
  * on THAT column). Interleaving the bits of several columns' rank
  * buckets gives every output file a tight min/max envelope on ALL the
  * clustered dimensions at once, so parquet footer statistics prune
  * row groups for predicates on any subset of them — the mechanism
  * behind Delta/Iceberg `OPTIMIZE ZORDER BY`, re-expressed on plain
  * parquet with plain Spark operators.
  *
  * Scale shape: one O(columns) min/max aggregate (a single tiny row to
  * the driver — never the data), then one map-side codegen'd z-value
  * expression and ONE range-partitioned shuffle into right-sized,
  * sorted files. Nothing is collected, nothing is broadcast; 100 TB
  * lays out exactly like 1 GB, just with more range partitions.
  */
object ZOrder {

  /** Per-column [min, max] used to normalize values into bucket space.
    * Tiny (2 doubles per column) — safe to compute eagerly.
    */
  final case class ColRange(name: String, min: Double, max: Double)

  /** Min/max of each clustering column, cast through DOUBLE (covers
    * int/long/double/timestamp inputs uniformly; bucket resolution of
    * 2^bits makes sub-double precision irrelevant for layout).
    */
  def colRanges(df: DataFrame, cols: Seq[String]): Seq[ColRange] = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"${c}__min"),
        max(col(c).cast("double")).as(s"${c}__max")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.zipWithIndex.map { case (c, i) =>
      require(!row.isNullAt(2 * i) && !row.isNullAt(2 * i + 1),
        s"z-order column '$c' has no non-null values (empty input or all-null column)")
      ColRange(c, row.getDouble(2 * i), row.getDouble(2 * i + 1))
    }
  }

  /** The Morton z-value column: each input column is normalized to a
    * `bits`-bit bucket via its [min, max] range, and the bucket bits
    * are interleaved round-robin (column i contributes bit b to output
    * position b·n + i). Pure `functions._` arithmetic — whole-stage
    * codegen keeps it in the scan's generated loop. Total bits
    * (bits × cols) must fit a signed long.
    */
  def zValue(ranges: Seq[ColRange], bits: Int = 16): Column = {
    val n = ranges.length
    require(n >= 2, "z-order needs at least 2 columns (use a sort otherwise)")
    require(bits * n <= 62, s"bits($bits) x cols($n) must fit a signed long")
    val maxBucket = (1L << bits) - 1
    val buckets = ranges.map { r =>
      val span = r.max - r.min
      if (span <= 0d) lit(0L)
      else least(greatest(
        floor((col(r.name).cast("double") - lit(r.min)) / lit(span) * lit(maxBucket.toDouble))
          .cast("long"), lit(0L)), lit(maxBucket))
    }
    val terms = for {
      (b, i) <- buckets.zipWithIndex
      bit <- 0 until bits
    } yield shiftleft(shiftright(b, bit).bitwiseAND(lit(1L)), bit * n + i)
    terms.reduce(_ bitwiseOR _)
  }

  final case class LayoutStats(files: Long, bytes: Long)

  /** Write `df` to `outPath` as `nFiles` parquet files clustered on the
    * Morton curve of `cols`: range-partition by z-value (contiguous
    * curve segments per file), sort within each file (tight row-group
    * envelopes), drop the helper column before the write. Reports the
    * resulting layout via [[Compact.tableStats]].
    */
  def layout(spark: SparkSession, df: DataFrame, cols: Seq[String],
             outPath: String, nFiles: Int, bits: Int = 16): LayoutStats = {
    val z = zValue(colRanges(df, cols), bits)
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(outPath)
    val st = Compact.tableStats(spark, outPath)
    LayoutStats(st.files, st.bytes)
  }

  /** Clustering quality of an on-disk layout: for each file, the
    * fraction of each column's GLOBAL value range its rows span,
    * averaged over files and columns (1.0 ≈ every file covers the full
    * range, i.e. no skipping possible; small ≈ tight envelopes, good
    * skipping). Used by the spec to prove the curve clusters both
    * dimensions at once — and by operators to decide when a table has
    * degraded enough to re-layout.
    */
  def avgRangeCoverage(spark: SparkSession, path: String, cols: Seq[String]): Double = {
    val df = spark.read.parquet(path)
    val ranges = colRanges(df, cols)
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"${c}__min"),
      max(col(c).cast("double")).as(s"${c}__max")))
    val perFile = df.withColumn("__f", input_file_name())
      .groupBy(col("__f"))
      .agg(aggs.head, aggs.tail: _*)
    val covs = ranges.map { r =>
      val span = math.max(r.max - r.min, Double.MinPositiveValue)
      avg((col(s"${r.name}__max") - col(s"${r.name}__min")) / lit(span))
    }
    val row = perFile.agg(covs.head, covs.tail: _*).head()
    (0 until ranges.length).map(row.getDouble).sum / ranges.length
  }
}
