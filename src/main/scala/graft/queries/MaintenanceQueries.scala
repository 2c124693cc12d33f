package graft.queries

import graft.Tables
import graft.operators.Compact
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Driver-gate coverage for the maintenance operator: compaction was
  * spec-only (its file-level effects aren't SQL-expressible), but its
  * DATA FIDELITY is — the registered query reads a table that has been
  * fragmented and then compacted, and the oracle aggregates the
  * ORIGINAL fixture. A green row proves the rewrite is byte-faithful to
  * the row set through the driver's own hash gate, including an
  * order-independent md5 row-set checksum (not just sums, which
  * couldn't see a swapped pair of values).
  */
object MaintenanceQueries {

  /** One fragment→compact round trip per (sfDir, JVM): lineitem is
    * rewritten as 40 small files (the micro-batch-append pathology),
    * then `Compact.rewrite` collapses it with a range sort on
    * l_orderkey. The registered query reads the COMPACTED table.
    */
  private object CompactStore {
    private val done = scala.collection.concurrent.TrieMap.empty[String, String]

    def ensure(s: SparkSession, dir: String): String =
      done.getOrElseUpdate(dir, {
        val root = TmpStores.pidScopedPath("graft_compact_rt", dir)
        new scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
        val table = s"$root/lineitem"
        Tables.lineitem(s, dir).repartition(40).write.parquet(table)
        val (before, after) = Compact.rewrite(s, table,
          targetFileBytes = 128L * 1024 * 1024, sortCols = Seq("l_orderkey"))
        require(after.files < before.files,
          s"compaction must reduce the file count: $before -> $after")
        table
      })
  }

  private val compactRoundtrip = QueryDef(
    "maint_compact_roundtrip",
    "Small-file compaction data-fidelity gate: lineitem is fragmented " +
      "into 40 files, compacted (range-sorted on l_orderkey, atomic " +
      "swap), and the COMPACTED table is aggregated — row count, exact " +
      "decimal sums, key extrema, and an order-independent md5 row-set " +
      "checksum over the stable columns. The oracle computes the same " +
      "aggregates over the ORIGINAL fixture, so a green hash proves the " +
      "rewrite dropped, duplicated, and altered nothing.",
    (s, dir) => {
      val table = CompactStore.ensure(s, dir)
      val dec = org.apache.spark.sql.types.DecimalType(38, 6)
      // row fingerprint over columns with engine-stable string forms
      // (integers, flags, formatted timestamp — never raw doubles,
      // whose VARCHAR repr differs across engines)
      val rowKey = concat_ws("|",
        col("l_orderkey").cast("string"), col("l_linenumber").cast("string"),
        col("l_returnflag"), col("l_linestatus"),
        date_format(col("l_shipdate"), "yyyy-MM-dd"))
      val h = conv(substring(md5(rowKey), 1, 12), 16, 10).cast("decimal(38,0)")
      s.read.parquet(table)
        .agg(
          count(lit(1)).as("n_rows"),
          sum(col("l_extendedprice").cast(dec)).cast("double").as("sum_price"),
          sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
          min(col("l_orderkey")).as("min_key"), max(col("l_orderkey")).as("max_key"),
          sum(h).cast("decimal(38,0)").cast("string").as("rowset_fp"))
    },
    Some("""
      |SELECT count(*) AS n_rows,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
      |       min(l_orderkey) AS min_key, max(l_orderkey) AS max_key,
      |       CAST(CAST(SUM(CAST(('0x' || substring(md5(
      |         l_orderkey::VARCHAR || '|' || l_linenumber::VARCHAR || '|' ||
      |         l_returnflag || '|' || l_linestatus || '|' ||
      |         strftime(l_shipdate, '%Y-%m-%d')), 1, 12))::BIGINT AS DECIMAL(38,0)))
      |         AS DECIMAL(38,0)) AS VARCHAR) AS rowset_fp
      |FROM lineitem
      """.stripMargin.trim))

  val defs: Seq[QueryDef] = Seq(compactRoundtrip)
}
