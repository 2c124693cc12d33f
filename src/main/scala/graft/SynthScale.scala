package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Local fixture scale-up: replicate a fixture directory `factor`× with
  * remapped keys, preserving the structure each operator family is
  * sensitive to — the tool behind the BASELINE.md cross-SF decade
  * measurements (sf1 does not ship in this environment).
  *
  * Replication rules (replica k of `factor`):
  *   - tiny dims (`region`, `nation`) copy verbatim — duplicating them
  *     would break FK semantics, and their size is irrelevant;
  *   - every key column shifts by k × (max(key)+1), consistently across
  *     tables (`o_custkey` moves with `c_custkey`, `l_orderkey` with
  *     `o_orderkey`, …), so join fan-outs and group cardinalities scale
  *     exactly linearly;
  *   - `documents.text` gets a per-replica token suffix (every
  *     alphanumeric run `w` → `w zz<k>`-joined, bijective on tokens), so
  *     each replica's internal shingle/near-dup graph is ISOMORPHIC to
  *     the original while replicas stay pairwise disjoint in shingle
  *     space — near-dup pair counts scale ×factor, never ×factor²;
  *   - `embeddings.embedding` gets a deterministic per-(replica, dim)
  *     epsilon (~1e-3 cosine shift) — neighbor structure is preserved
  *     without creating `factor` exact copies of every vector, which
  *     would quadratically blow up the embedding near-dup blocks in a
  *     way real corpus growth does not;
  *   - `events.ts` keeps its time range (10× event density, same span) —
  *     window/session query output cardinality grows with users, not
  *     wall-time.
  *
  * Output is BENCH-ONLY (no DuckDB oracle runs at this size); row-count
  * sanity is asserted here instead. Usage:
  * `tools/run_main.sh graft.SynthScale <inDir> <outDir> <factor>`
  */
object SynthScale {

  def main(args: Array[String]): Unit = {
    val Array(inDir, outDir, factorS) = args
    val factor = factorS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def in(name: String): DataFrame = spark.read.parquet(s"$inDir/$name.parquet")
    def off(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).first().getLong(0) + 1L

    def write(name: String, df: DataFrame, expect: Long): Unit = {
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      val got = spark.read.parquet(s"$outDir/$name.parquet").count()
      require(got == expect, s"$name: wrote $got rows, expected $expect")
      System.err.println(s"[synth] $name: $got rows")
    }

    def replicate(base: DataFrame)(remap: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(k => remap(base, k)).reduce(_ unionByName _)

    // verbatim dims
    Seq("region", "nation").foreach { t =>
      val d = in(t); write(t, d, d.count())
    }

    val cust = in("customer"); val custOff = off(cust, "c_custkey")
    val supp = in("supplier"); val supOff = off(supp, "s_suppkey")
    val part = in("part"); val partOff = off(part, "p_partkey")
    val ord = in("orders"); val ordOff = off(ord, "o_orderkey")

    write("customer", replicate(cust) { (d, k) =>
      d.withColumn("c_custkey", col("c_custkey") + lit(k * custOff))
    }, cust.count() * factor)

    write("supplier", replicate(supp) { (d, k) =>
      d.withColumn("s_suppkey", col("s_suppkey") + lit(k * supOff))
    }, supp.count() * factor)

    write("part", replicate(part) { (d, k) =>
      d.withColumn("p_partkey", col("p_partkey") + lit(k * partOff))
    }, part.count() * factor)

    write("orders", replicate(ord) { (d, k) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(k * ordOff))
        .withColumn("o_custkey", col("o_custkey") + lit(k * custOff))
    }, ord.count() * factor)

    val li = in("lineitem")
    write("lineitem", replicate(li) { (d, k) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(k * ordOff))
        .withColumn("l_partkey", col("l_partkey") + lit(k * partOff))
        .withColumn("l_suppkey", col("l_suppkey") + lit(k * supOff))
    }, li.count() * factor)

    // events: ts stays raw int64 nanos (Tables.events reads either the
    // NANOS logical type or a plain long identically)
    val ev = in("events")
    val evOff = off(ev, "event_id"); val userOff = off(ev, "user_id")
    write("events", replicate(ev) { (d, k) =>
      d.withColumn("event_id", col("event_id") + lit(k * evOff))
        .withColumn("user_id", col("user_id") + lit(k * userOff))
    }, ev.count() * factor)

    val docs = in("documents"); val docOff = off(docs, "doc_id")
    write("documents", replicate(docs) { (d, k) =>
      val txt = if (k == 0) col("text")
        else regexp_replace(col("text"), "([A-Za-z0-9]+)", "$1zz" + k)
      d.withColumn("doc_id", col("doc_id") + lit(k * docOff))
        .withColumn("text", txt)
        .withColumn("n_chars", length(txt).cast("long"))
    }, docs.count() * factor)

    val emb = in("embeddings"); val vecOff = off(emb, "vec_id")
    write("embeddings", replicate(emb) { (d, k) =>
      val noisy = if (k == 0) col("embedding")
        else {
          // deterministic per-(vec, dim, replica) epsilon; keeps
          // replicas distinct without disturbing neighbor structure
          val idxs = sequence(lit(0), lit(63))
          zip_with(col("embedding"), idxs, (x, j) =>
            (x + (pmod(j * 2654435761L + lit(k * 97531L) + col("vec_id"), lit(1000L))
              - 500L).cast("double") * lit(1e-5)).cast("float"))
        }
      d.withColumn("vec_id", col("vec_id") + lit(k * vecOff))
        .withColumn("embedding", noisy)
    }, emb.count() * factor)

    spark.stop()
  }
}
