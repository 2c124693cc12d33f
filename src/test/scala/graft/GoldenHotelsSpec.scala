package graft

import graft.functions.{Embeddings, HashingEmbedder}
import graft.functions.VectorFunctions._
import graft.operators.Knn
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end reference-parity golden test (SURVEY §5.4): replicate the
  * reference scenario on the 40-hotel corpus — ingest CSV → build
  * embed-text (`addr_text + ' ' + city`, ingest_hotels.py:22) → batch
  * embed (unit-norm vectors, ingest_hotels.py:23) → flagship exact
  * cosine KNN (streamlit_app.py:55-73) → match-score shaping
  * (streamlit_app.py:221-234). Data values from the reference corpus
  * (combined.csv); embeddings from the offline deterministic encoder
  * (the engine contract is dim + unit norm, not a specific model).
  */
class GoldenHotelsSpec extends SparkSpec {

  private val hotelSchema = StructType(Seq(
    StructField("name", StringType), StructField("addr_text", StringType),
    StructField("city", StringType), StructField("lat", DoubleType),
    StructField("lon", DoubleType), StructField("price_usd", DoubleType),
    StructField("rating", DoubleType), StructField("url", StringType)))

  private val model = HashingEmbedder(dim = 384, seed = 42)

  private lazy val hotels = {
    val csv = getClass.getResource("/hotels_golden.csv").getPath
    val raw = spark.read.option("header", "true").schema(hotelSchema).csv(csv)
    val withText = raw.withColumn("embed_text", concat_ws(" ", col("addr_text"), col("city")))
    Embeddings.embedDataFrame(withText, "embed_text", "addr_vec", model)
      .withColumn("addr_vec", assertDim(col("addr_vec"), 384))
      .cache()
  }

  test("ingest: 40 hotels, 384-d unit vectors, schema matches the reference table") {
    assert(hotels.count() == 40)
    assert(hotels.schema("addr_vec").dataType ==
      ArrayType(FloatType, containsNull = true) ||
      hotels.schema("addr_vec").dataType == ArrayType(FloatType, containsNull = false))
    val norms = hotels.select(l2Norm(col("addr_vec")).as("n")).collect().map(_.getDouble(0))
    norms.foreach(n => assert(math.abs(n - 1.0) < 1e-5, s"non-unit vector norm $n"))
  }

  test("flagship query: top-3 by cosine distance for a Goa beach query") {
    val qv = model.encode("beach resort near fort Goa")
    val hits = Knn.search(hotels, "addr_vec", "name", qv, k = 3)
    val rows = hits.select("name", "city", "price_usd", "rating", "url", "distance_score")
      .collect()
    assert(rows.length == 3)
    val ds = rows.map(_.getDouble(5))
    assert(ds.toSeq == ds.sorted.toSeq)
    // determinism: same query twice → identical ranking
    val again = Knn.search(hotels, "addr_vec", "name", qv, k = 3)
      .select("name").collect().map(_.getString(0))
    assert(rows.map(_.getString(0)).toSeq == again.toSeq)
  }

  test("searchText: the text-in results-out entry point equals encode+search") {
    val viaText = Knn.searchText(hotels, "addr_vec", "name",
      "beach resort near fort Goa", k = 4, model)
      .select("name").collect().map(_.getString(0)).toSeq
    val viaVec = Knn.search(hotels, "addr_vec", "name",
      model.encode("beach resort near fort Goa"), k = 4)
      .select("name").collect().map(_.getString(0)).toSeq
    assert(viaText == viaVec && viaText.length == 4)
  }

  test("match-score shaping matches the reference formula and ordering") {
    val qv = model.encode("hotel near Candolim fort")
    val scored = Knn.withMatchScore(
      Knn.search(hotels, "addr_vec", "name", qv, k = 5), "name")
    val rows = scored.select("name", "match_score", "display_score", "distance_score").collect()
    rows.foreach { r =>
      // Spark round() is HALF_UP (the reference's Python round is
      // HALF_EVEN — a documented 0.005-boundary divergence we accept)
      val expect = BigDecimal((1.0 - r.getDouble(3)) * 100.0)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(1) == expect)
      assert(r.getString(2) == s"${r.getDouble(1)}%")
    }
    val scores = rows.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("display shaping: bulk rename to UI names + rating format (P10/P13, streamlit_app.py:224-231,261)") {
    val qv = model.encode("beach stay")
    val shaped = Knn.withMatchScore(
      Knn.search(hotels, "addr_vec", "name", qv, k = 3), "name")
      .withColumnsRenamed(Map(
        "name" -> "Hotel", "addr_text" -> "Address", "city" -> "City",
        "price_usd" -> "Price (USD)", "rating" -> "Rating", "url" -> "Website"))
      .withColumn("Rating", format_number(least(greatest(col("Rating"), lit(0.0)), lit(5.0)), 1))
      .select("Hotel", "Address", "City", "Price (USD)", "Rating", "Website", "display_score")
    val rows = shaped.collect()
    assert(rows.length == 3)
    assert(shaped.columns.toSeq ==
      Seq("Hotel", "Address", "City", "Price (USD)", "Rating", "Website", "display_score"))
    rows.foreach { r =>
      assert(r.getAs[String]("Rating").matches("\\d\\.\\d"))
      assert(r.getAs[String]("display_score").endsWith("%"))
    }
  }

  test("wire-format round trip on real vectors (TO_VECTOR parity, P3∘P4)") {
    val back = hotels
      .withColumn("wire", vectorToString(col("addr_vec")))
      .withColumn("parsed", toVector(col("wire")))
      .filter(cosineDistance(col("parsed"), col("addr_vec")) > 1e-6)
    assert(back.count() == 0)
  }

  test("k clamp semantics: k above corpus size returns all, slider range 1..10 honored") {
    val qv = model.encode("any query")
    assert(Knn.search(hotels, "addr_vec", "name", qv, k = 100).count() == 40)
    (1 to 10).foreach { k =>
      assert(Knn.search(hotels, "addr_vec", "name", qv, k = k).count() == k)
    }
  }

  test("portable embedder e2e on the golden corpus: self-query ranks the hotel itself first") {
    // swap in the oracle-checkable encoder (same EmbeddingModel
    // contract) and run the reference flow: a hotel's own embed-text as
    // the query must return that hotel at distance ~0 rank 1 — the
    // model-swap seam the reference's @st.cache_resource loader implies
    val portable = graft.functions.Md5PortableEmbedder(dim = 64)
    val csv = getClass.getResource("/hotels_golden.csv").getPath
    val raw = spark.read.option("header", "true").schema(hotelSchema).csv(csv)
      .withColumn("embed_text", concat_ws(" ", col("addr_text"), col("city")))
    val corpus = Embeddings.embedDataFrame(raw, "embed_text", "addr_vec", portable).cache()
    val probe = corpus.select("name", "embed_text").collect().take(3)
    probe.foreach { r =>
      val top = Knn.searchText(corpus, "addr_vec", "name", r.getString(1), k = 1, portable)
        .select("name", "distance_score").collect()(0)
      assert(top.getString(0) == r.getString(0),
        s"self-query for ${r.getString(0)} returned ${top.getString(0)}")
      assert(top.getDouble(1) < 1e-9, s"self-distance ${top.getDouble(1)}")
    }
    corpus.unpersist()
  }
}
