package graft.queries

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver-gate coverage for the non-parquet batch sources/sinks
  * (SURVEY §2 S1/S2): the CSV and JSON-lines paths were spec-only
  * (SourcesSpec proves schema round-trips); these queries put their
  * DATA FIDELITY under the hash gate — `documents` (the table whose
  * free text exercises quoting, escaping, and unicode-ish content) is
  * written through each format, read back with an explicit schema, and
  * aggregated with an order-independent md5 row-set checksum that
  * includes md5(text). The oracle aggregates the ORIGINAL fixture, so
  * a green hash proves the format round-trip dropped, duplicated, and
  * corrupted nothing — the classic CSV failure modes (delimiter in a
  * field, quote-in-quote, whitespace trimming) all land in the text
  * fingerprint.
  *
  * Scale: both sinks are plain distributed writes (one file per task,
  * no shuffle); both reads are distributed scans with explicit schemas
  * (no inference pass over 100 TB).
  */
object SourceQueries {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private object CsvStore {
    def ensure(s: SparkSession, dir: String): String =
      TmpStores.memoizedTable("graft_csv_docs", dir) { root =>
        val table = s"$root/documents_csv"
        Tables.documents(s, dir)
          .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
          .write.option("header", "true").option("quoteAll", "true").csv(table)
        table
      }
  }

  private object JsonStore {
    def ensure(s: SparkSession, dir: String): String =
      TmpStores.memoizedTable("graft_json_docs", dir) { root =>
        val table = s"$root/documents_json"
        Tables.documents(s, dir)
          .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
          .write.json(table)
        table
      }
  }

  private def fidelityAgg(df: org.apache.spark.sql.DataFrame) = {
    val h = conv(substring(md5(concat_ws("|",
      col("doc_id").cast("string"), col("lang"), col("source"),
      col("n_chars").cast("string"), md5(col("text")))), 1, 12), 16, 10)
      .cast("decimal(38,0)")
    df.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(length(col("text")).cast("long")).as("sum_text_len"),
        sum(h).cast("decimal(38,0)").cast("string").as("rowset_fp"))
      .orderBy(col("lang"))
  }

  private val fidelitySql = """
    |SELECT lang, count(*) AS n_docs,
    |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
    |       CAST(SUM(length(text)) AS BIGINT) AS sum_text_len,
    |       CAST(CAST(SUM(CAST(('0x' || substring(md5(
    |         doc_id::VARCHAR || '|' || lang || '|' || source || '|' ||
    |         n_chars::VARCHAR || '|' || md5(text)), 1, 12))::BIGINT
    |         AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS VARCHAR) AS rowset_fp
    |FROM documents GROUP BY lang ORDER BY lang
    """.stripMargin.trim

  private val csvRoundtrip = QueryDef(
    "src_csv_roundtrip",
    "CSV sink/scan fidelity gate: documents written as quoted CSV " +
      "(header, quoteAll) and read back with an explicit schema — no " +
      "inference pass, the 100 TB contract. Per-lang aggregates with a " +
      "row-set checksum over md5(text); oracle = the original fixture.",
    (s, dir) => {
      val table = CsvStore.ensure(s, dir)
      fidelityAgg(s.read.schema(docSchema).option("header", "true").csv(table))
    },
    Some(fidelitySql))

  private val jsonRoundtrip = QueryDef(
    "src_json_roundtrip",
    "JSON-lines sink/scan fidelity gate: documents written as " +
      "newline-delimited JSON and read back with an explicit schema " +
      "(no inference). Same fidelity aggregate and oracle as the CSV " +
      "gate — a green hash proves string escaping round-trips exactly.",
    (s, dir) => {
      val table = JsonStore.ensure(s, dir)
      fidelityAgg(s.read.schema(docSchema).json(table))
    },
    Some(fidelitySql))

  private object OrcStore {
    def ensure(s: SparkSession, dir: String): String =
      TmpStores.memoizedTable("graft_orc_docs", dir) { root =>
        val table = s"$root/documents_orc"
        Tables.documents(s, dir)
          .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
          .write.orc(table)
        table
      }
  }

  private val orcRoundtrip = QueryDef(
    "src_orc_roundtrip",
    "ORC sink/scan fidelity gate: documents written as ORC and read " +
      "back with an explicit schema — the columnar non-parquet path " +
      "(typed encodings, no text-escaping layer to get wrong; what CAN " +
      "break is string/long codec round-trips, which the checksum " +
      "covers). Same fidelity aggregate and oracle as the CSV/JSON " +
      "gates; DuckDB has no ORC reader, so the oracle over the original " +
      "parquet fixture is exactly the cross-format proof wanted here.",
    (s, dir) => {
      val table = OrcStore.ensure(s, dir)
      fidelityAgg(s.read.schema(docSchema).orc(table))
    },
    Some(fidelitySql))

  /** One embedded-Derby database build per (fixture, JVM): documents
    * written through the generic `df.write.format("jdbc")` path — the
    * Spark mapping of the reference's ONLY real sink, an Oracle table
    * loaded row-by-row with INSERT (`ingest_hotels.py:27-34`). Derby
    * 10.16 ships in /opt/spark/jars (embedded, zero-egress), so the
    * JDBC write/read legs exercised here are the exact code paths a
    * reference user would point at Oracle: Spark's JdbcRelationProvider,
    * dialect type mapping (StringType→CLOB), batched PreparedStatement
    * inserts, and a partitioned parallel read.
    */
  private object JdbcStore {
    def ensure(s: SparkSession, dir: String): String =
      TmpStores.memoizedTable("graft_derby_docs", dir) { root =>
        // keep derby.log out of the process cwd (it would land in the
        // repo root on every sbt/driver run)
        System.setProperty("derby.stream.error.file", s"$root/derby.log")
        val url = s"jdbc:derby:$root/db;create=true"
        Tables.documents(s, dir)
          .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
          .write.format("jdbc")
          .option("url", url)
          .option("dbtable", "graft_docs")
          // bounded writer parallelism: a real RDBMS sink is connection-
          // limited — at 100 TB you size numPartitions to the DB's
          // ingest capacity, not the cluster's task count
          .option("numPartitions", "4")
          .option("batchsize", "1000")
          .mode("overwrite")
          .save()
        url
      }
  }

  private val jdbcRoundtrip = QueryDef(
    "src_jdbc_roundtrip",
    "JDBC sink/scan fidelity gate (the reference's Oracle INSERT sink, " +
      "ingest_hotels.py:27-34, re-expressed as Spark's generic JDBC " +
      "source): documents written into embedded Derby via batched " +
      "inserts with bounded writer parallelism, then read back as a " +
      "PARTITIONED parallel scan (partitionColumn=doc_id, 8 range " +
      "slices — the shape that makes a 100 TB JDBC read distributable; " +
      "an unpartitioned read would serialize the whole table through " +
      "one task). Bounds come from one min/max aggregate on the " +
      "fixture. Same per-lang fidelity aggregate and oracle as the " +
      "CSV/JSON/ORC gates — a green hash proves the dialect's " +
      "type-mapped round trip (BIGINT + CLOB) dropped, duplicated, " +
      "and corrupted nothing.",
    (s, dir) => {
      val url = JdbcStore.ensure(s, dir)
      val bounds = Tables.documents(s, dir)
        .agg(min(col("doc_id")), max(col("doc_id"))).head()
      val readBack = s.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "graft_docs")
        .option("partitionColumn", "doc_id")
        .option("lowerBound", bounds.getLong(0).toString)
        .option("upperBound", (bounds.getLong(1) + 1).toString)
        .option("numPartitions", "8")
        .load()
        .select(col("doc_id").cast("long"), col("text"), col("lang"),
          col("source"), col("n_chars").cast("long"))
      fidelityAgg(readBack)
    },
    Some(fidelitySql))

  /** One bucketed-layout build per (session, fixture): orders and
    * customer written as external tables bucketed+sorted on the
    * customer key. Table existence is the memo (catalog is
    * per-session); the files live under a pid-scoped tmp root.
    */
  private object BucketedStore {
    def ensure(s: SparkSession, dir: String): (String, String) = {
      val suffix = graft.functions.Md5.hex(dir).take(8)
      val (ot, ct) = (s"graft_bkt_orders_$suffix", s"graft_bkt_customer_$suffix")
      if (!s.catalog.tableExists(ot) || !s.catalog.tableExists(ct)) {
        val root = TmpStores.pidScopedPath("graft_bktstore", dir)
        s.sql(s"DROP TABLE IF EXISTS $ot")
        s.sql(s"DROP TABLE IF EXISTS $ct")
        Tables.orders(s, dir)
          .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
          .option("path", s"$root/orders").mode("overwrite").saveAsTable(ot)
        Tables.customer(s, dir)
          .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
          .option("path", s"$root/customer").mode("overwrite").saveAsTable(ct)
      }
      (ot, ct)
    }
  }

  private val bucketedJoin = QueryDef(
    "src_bucketed_join",
    "Co-located join via bucketed storage — the layout decision that " +
      "removes the dominant shuffle of a 100 TB fact⋈dim join: orders " +
      "and customer are written as external tables bucketed (8) and " +
      "sorted on the customer key, then joined and rolled up per " +
      "market segment. Bucketing provides the join's partitioning, so " +
      "the sort-merge path plans with ZERO exchanges below the join " +
      "(BucketingSpec asserts the plan; this query puts the write→" +
      "read→join DATA path under the hash gate — a green hash proves " +
      "the bucketed round trip lost/duplicated nothing). The oracle " +
      "joins the original fixtures: the layout is result-invisible by " +
      "construction. Revenue stays in exact decimal to the floor exit.",
    (s, dir) => {
      val (ot, ct) = BucketedStore.ensure(s, dir)
      s.table(ot).join(s.table(ct), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          countDistinct(col("c_custkey")).as("n_customers"),
          Queries.xsum(col("o_totalprice").cast(DecimalType(12, 2))).as("revenue"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""
      |SELECT c_mktsegment, count(*) AS n_orders,
      |       count(DISTINCT c_custkey) AS n_customers,
      |       CAST(FLOOR(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100) AS DOUBLE) / 100.0 AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1 ORDER BY c_mktsegment
      """.stripMargin.trim))

  val defs: Seq[QueryDef] =
    Seq(csvRoundtrip, jsonRoundtrip, orcRoundtrip, jdbcRoundtrip, bucketedJoin)
}
