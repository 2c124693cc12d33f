package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Session bootstrap + fixture-table loading shared by Verify / Bench /
  * tests.
  *
  * Scale notes (designed for a real cluster, tested on local[N]):
  *   - `spark.sql.shuffle.partitions` is set by the caller to match the
  *     local core count; on a cluster AQE coalesces post-shuffle
  *     partitions anyway (`spark.sql.adaptive.enabled=true`).
  *   - All fixture reads are plain parquet scans so Catalyst's column
  *     pruning / predicate pushdown apply (verify via
  *     `.explain("formatted")` → `PushedFilters`, `ReadSchema`).
  */
object GraftSession {

  /** Apply engine-required runtime confs + register graft SQL functions.
    * Idempotent; safe to call on a driver-provided session.
    */
  def prepare(spark: SparkSession): SparkSession = {
    // The driver's `events` fixture is parquet TIMESTAMP(NANOS,false),
    // which Spark refuses by default (PARQUET_TYPE_ILLEGAL). Read the
    // raw int64 nanos and convert explicitly (see Tables.events).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // Scan-parallelism floor (optimization guide §6, r21): FilePartition
    // sizing is maxSplitBytes = min(maxPartitionBytes, max(openCostInBytes,
    // totalBytes/minPartitionNum)) — with the 4 MB openCost default a
    // single ~10 MB fixture file scans as ~3 tasks no matter how many
    // cores the session has, and every expression-heavy pass over it runs
    // at 3/32 parallelism (measured: ml_logreg_gd's 9 GD iterations on 3
    // partitions, 1.5 s each; 0.2 s at full width). Lowering the
    // open-cost floor lets bytesPerCore = totalBytes/defaultParallelism
    // set the split instead. Scale posture: on a real many-file 100 TB
    // table splits are governed by maxPartitionBytes (128 MB) long before
    // either floor, so this only affects the small-single-file case (the
    // same guard Tables.documentsSpread applies query-side); open-cost
    // also only UNDER-weights per-file open overhead when packing many
    // small files — it never increases task counts. Env-overridable for
    // deployments that want the conservative object-store default back.
    spark.conf.set("spark.sql.files.openCostInBytes",
      sys.env.getOrElse("SPARK_GRAFT_OPEN_COST", (128 * 1024).toString))
    functions.VectorFunctions.registerAll(spark)
    // KNN→IVF-probe rewrite for IvfCatalog-registered tables (no-op on
    // everything else); extraOptimizations covers driver-provided
    // sessions that weren't built withExtensions(GraftExtensions)
    if (!spark.experimental.extraOptimizations.contains(plans.IvfProbeRule)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ plans.IvfProbeRule
    }
    spark
  }

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    prepare(spark)
  }
}

/** Typed access to the driver-generated fixture tables
  * (`/root/testdata/sf*`; schemas in FIXTURES.md).
  */
object Tables {
  def read(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = read(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame  = read(s, d, "documents")

  /** `documents` spread across the default parallelism. The fixture is a
    * single small parquet file (one row-group → one input partition); the
    * text pipelines do heavy per-row expression work, so a round-robin
    * repartition of a few MB buys full-core parallelism. On a real
    * many-file 100 TB corpus the scan already yields thousands of
    * partitions and this is unnecessary — it guards the small-file case.
    */
  def documentsSpread(s: SparkSession, d: String): DataFrame =
    // hash on the key, not round-robin: RoundRobinPartitioning sorts
    // every input partition first (sortBeforeRepartition, for retry
    // determinism) — a full-row sort of the text column for nothing
    documents(s, d).repartition(s.sparkContext.defaultParallelism, col("doc_id"))
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")

  /** `events` with `ts` as a microsecond TIMESTAMP (UTC session TZ).
    *
    * Fixture generations have stored `ts` two ways: nanosecond INT64
    * (which Spark's vectorized reader only surfaces as a raw long via
    * `legacy.parquet.nanosAsLong` — floor-truncated here to micros) and
    * plain microsecond TIMESTAMP (read as NTZ, normalized to the UTC
    * session TZ). tools/local_check.py branches on `typeof(ts)` the
    * same way, so both engines see identical µs instants either way.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = read(spark, sfDir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer `div`, NOT `/`: ns values ~1.7e18 exceed double's exact
        // integer range; a double division silently loses microseconds
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        // NTZ micros; session TZ is pinned UTC, so the cast re-types the
        // same wall-clock instant without shifting it
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }

  /** `events` with raw nanosecond `ts` (long) for exact-ns arithmetic. */
  def eventsRawNanos(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = read(spark, sfDir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _ =>
        // µs fixture: synthesize exact nanos (µs × 1000 stays < 2^63)
        df.withColumn("ts",
          unix_micros(col("ts").cast(org.apache.spark.sql.types.TimestampType)) * lit(1000L))
    }
  }
}
