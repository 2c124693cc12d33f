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
final case class HashingEmbedder(dim: Int = 384, seed: Int = 42) extends EmbeddingModel {
  override def encode(text: String): Array[Float] = {
    val acc = new Array[Double](dim)
    val tokens = text.toLowerCase.split("[^\\p{L}\\p{N}]+")
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
