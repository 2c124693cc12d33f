package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.util.hashing.MurmurHash3

/** Text-embedding contract + a deterministic offline encoder.
  *
  * The reference embeds with `SentenceTransformer("all-MiniLM-L6-v2")`,
  * 384-d, L2-normalized (`ingest_hotels.py:6,23`; `streamlit_app.py:28,52`).
  * The engine is agnostic to *which* encoder fills the vector column — the
  * contract is (dim, unit L2 norm). This environment has no model
  * downloads, so [[HashingEmbedder]] is a seeded feature-hashing encoder
  * with the same contract; swap in a real model by implementing
  * [[EmbeddingModel]].
  */
trait EmbeddingModel extends Serializable {
  def dim: Int
  def encode(text: String): Array[Float]
  /** Batched entry point — the unit the distributed pipeline calls once
    * per partition iterator chunk (real models amortize inference over
    * the batch).
    */
  def encodeBatch(texts: Seq[String]): Seq[Array[Float]] = texts.map(encode)
}

/** Deterministic feature-hashing encoder: token → (murmur3 bucket, ±1
  * sign), accumulated then L2-normalized. Same text → same unit vector on
  * any JVM. Empty/blank text → basis vector e₀ (a real encoder never
  * returns the zero vector either).
  */
/** JVM-side md5 helpers mirroring the DuckDB-portable hash family
  * (`Duck.md5Long48`): lowercase hex digest, first 12 hex chars as a
  * non-negative 48-bit long. Shared by the portable embedder, the
  * multimodal stub decoder, and the LSH sign planes so every consumer
  * hashes identically to its SQL oracle.
  */
object Md5 {
  // per-thread digest instance: getInstance per call would pay a JCA
  // provider lookup + allocation PER TOKEN on the embedding hot path
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  def hexOfBytes(bytes: Array[Byte]): String = {
    val md = digest.get()
    md.reset()
    md.digest(bytes).map(b => f"${b & 0xff}%02x").mkString
  }
  def hex(s: String): String = hexOfBytes(s.getBytes("UTF-8"))
  /** First 12 hex chars as a non-negative 48-bit long (≡ DuckDB
    * `('0x' || substring(md5(s), 1, 12))::BIGINT`).
    */
  def long48(s: String): Long = java.lang.Long.parseLong(hex(s).substring(0, 12), 16)
}

/** Cross-engine-portable feature-hashing encoder: token → md5-derived
  * (bucket, ±1 sign), accumulated then L2-normalized — same contract as
  * [[HashingEmbedder]] (fixed dim, unit norm, e₀ fallback) but every
  * step is reproducible in ANSI-ish SQL, so the embed→KNN ingest
  * pipeline gets a hash-checkable DuckDB oracle:
  *
  *   - tokens: `lower` + split `[^a-z0-9]+` (≡ `Duck.toks`);
  *   - bucket = md5Long48(token) % dim;
  *   - sign   = +1 if the 13th md5 hex nibble < 8 else −1;
  *   - accumulate ±1 in Double (exact integers), norm = √Σw², each
  *     component quantized `(w/norm).toFloat` — IEEE round-to-nearest,
  *     ≡ DuckDB `CAST(w/norm AS FLOAT)` — so both engines hold
  *     bit-identical float32 vectors.
  */
final case class Md5PortableEmbedder(dim: Int = 64) extends EmbeddingModel {
  override def encode(text: String): Array[Float] = {
    val acc = new Array[Double](dim)
    // Locale.ROOT: the default-locale overload would produce dotless-ı
    // tokens under a tr/az JVM locale and break oracle parity with
    // DuckDB's locale-independent lower()
    val tokens = text.toLowerCase(java.util.Locale.ROOT).split("[^a-z0-9]+")
    var any = false
    tokens.foreach { t =>
      if (t.nonEmpty) {
        any = true
        val hex = Md5.hex(t)
        val idx = (java.lang.Long.parseLong(hex.substring(0, 12), 16) % dim).toInt
        val sign = if (Character.digit(hex.charAt(12), 16) < 8) 1.0 else -1.0
        acc(idx) += sign
      }
    }
    if (!any) acc(0) = 1.0
    var norm = 0.0
    var i = 0
    while (i < dim) { norm += acc(i) * acc(i); i += 1 }
    norm = math.sqrt(norm)
    val out = new Array[Float](dim)
    if (norm == 0.0) { out(0) = 1.0f }
    else { i = 0; while (i < dim) { out(i) = (acc(i) / norm).toFloat; i += 1 } }
    out
  }
}

final case class HashingEmbedder(dim: Int = 384, seed: Int = 42) extends EmbeddingModel {
  override def encode(text: String): Array[Float] = {
    val acc = new Array[Double](dim)
    // Locale.ROOT for locale-independent results (see Md5PortableEmbedder)
    val tokens = text.toLowerCase(java.util.Locale.ROOT).split("[^\\p{L}\\p{N}]+")
    var any = false
    tokens.foreach { t =>
      if (t.nonEmpty) {
        any = true
        val h = MurmurHash3.stringHash(t, seed)
        val idx = java.lang.Math.floorMod(h, dim)
        val sign = if (MurmurHash3.stringHash(t, seed + 1) >= 0) 1.0 else -1.0
        acc(idx) += sign
      }
    }
    if (!any) acc(0) = 1.0
    var norm = 0.0
    var i = 0
    while (i < dim) { norm += acc(i) * acc(i); i += 1 }
    norm = math.sqrt(norm)
    val out = new Array[Float](dim)
    if (norm == 0.0) { out(0) = 1.0f }
    else { i = 0; while (i < dim) { out(i) = (acc(i) / norm).toFloat; i += 1 } }
    out
  }
}

/** Calibrated-scale INT8 quantization wrapped around ANY
  * [[EmbeddingModel]] — the seam an ONNX-int8 model swap-in lands on
  * (r17 verdict #7): the pipeline keeps calling the same
  * `embedDataFrame(…, model)` and only the model VALUE changes. Encode
  * = base encode → symmetric int8 quantize at the CALIBRATED scale
  * (`amax`, the max |component| observed on a calibration corpus —
  * static post-training quantization's standard calibration) →
  * dequantize back to float32, so downstream operators see the same
  * Array[Float] contract and the quantization ERROR is exactly what a
  * deployed int8 model would exhibit. Arithmetic is SQL-replayable
  * half-up rounding (`floor(x·127/amax + 0.5)` clamped to ±127), so
  * the quantized seam gets the same bit-level DuckDB oracle as the
  * float seam (`txt_embed_quantized` hash-checks the error telemetry).
  */
final case class QuantizedEmbedder(base: EmbeddingModel, amax: Double)
    extends EmbeddingModel {
  require(amax > 0.0, s"calibrated scale amax=$amax must be > 0")
  override def dim: Int = base.dim
  override def encode(text: String): Array[Float] = {
    val x = base.encode(text)
    val out = new Array[Float](x.length)
    var i = 0
    while (i < x.length) {
      val q = math.floor(x(i).toDouble * 127.0 / amax + 0.5)
      val qc = math.max(-127.0, math.min(127.0, q))
      out(i) = (qc * amax / 127.0).toFloat
      i += 1
    }
    out
  }
}

object Embeddings {
  /** Column-level embedding (Scala UDF — fine for moderate widths; the
    * batched path below is the 100 TB shape).
    */
  def embedColumn(model: EmbeddingModel)(text: Column): Column = {
    val f = udf((s: String) => if (s == null) null else model.encode(s))
    f(text)
  }

  /** Batched, partition-local embedding over a whole DataFrame — the
    * distributed analog of the reference's ingest loop
    * (`ingest_hotels.py:21-34`), but set-oriented: one task per partition,
    * model initialized once per partition (in real deployments the model
    * is a broadcast variable / executor-local singleton, per
    * `streamlit_app.py:25-28`'s `@st.cache_resource`), rows embedded in
    * batches.
    */
  def embedDataFrame(df: DataFrame, textCol: String, outCol: String,
                     model: EmbeddingModel, batchSize: Int = 256): DataFrame = {
    val spark = df.sparkSession
    val bcModel = spark.sparkContext.broadcast(model)
    val schema = org.apache.spark.sql.types.StructType(
      df.schema.fields :+ org.apache.spark.sql.types.StructField(
        outCol,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, containsNull = false),
        nullable = true))
    val textIdx = df.schema.fieldNames.indexOf(textCol)
    require(textIdx >= 0, s"no column $textCol")
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      val m = bcModel.value
      rows.grouped(batchSize).flatMap { batch =>
        val vecs = m.encodeBatch(batch.map(r => Option(r.getString(textIdx)).getOrElse("")))
        batch.lazyZip(vecs).map { (r, v) =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ v.toSeq)
        }
      }
    }(enc)
  }
}
