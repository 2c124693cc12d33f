package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal plumbing tests: binary column round-trip, decode seam
  * schema/batching/determinism, frame sampling shape.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "hello multimodal world"),
    (2L, "a" * 200),
    (3L, "short")).toDF("doc_id", "text")

  test("withFakeMedia produces the UTF-8 bytes as BinaryType") {
    val d = Multimodal.withFakeMedia(docs, "text")
    assert(d.schema("media").dataType == BinaryType)
    val r = d.filter(col("doc_id") === 1L).select("media").collect()(0)
    assert(new String(r.getAs[Array[Byte]](0), "UTF-8") == "hello multimodal world")
  }

  test("decodeAndExtract appends the typed metadata struct and feature vector") {
    val out = Multimodal.decodeAndExtract(Multimodal.withFakeMedia(docs, "text"), "media")
    assert(out.schema("media_meta").dataType == Multimodal.mediaMetaType)
    assert(out.schema("media_features").dataType ==
      ArrayType(FloatType, containsNull = false))
    val r = out.filter(col("doc_id") === 1L)
      .select("media_meta.media_type", "media_meta.width", "media_meta.height",
        "media_meta.n_channels", "media_meta.duration_ms", "media_features")
      .collect()(0)
    assert(r.getString(0) == "stub")
    assert(r.getInt(1) >= 64 && r.getInt(1) < 64 + 1024)
    assert(r.getInt(3) >= 1 && r.getInt(3) <= 4)
    assert(r.getSeq[Float](5).length == 16)
  }

  test("decode is deterministic and null-safe") {
    val withNull = Multimodal.withFakeMedia(docs, "text")
      .withColumn("media", when(col("doc_id") === 3L, lit(null)).otherwise(col("media")))
    // compare everything except the raw bytes column (whose Row.toString
    // is an array identity hash)
    val proj = (df: org.apache.spark.sql.DataFrame) =>
      df.select("doc_id", "media_meta", "media_features").orderBy("doc_id").collect().toSeq
    val out1 = proj(Multimodal.decodeAndExtract(withNull, "media"))
    val out2 = proj(Multimodal.decodeAndExtract(withNull, "media"))
    assert(out1 == out2)
    val nullRow = out1.find(_.getLong(0) == 3L).get
    assert(nullRow.isNullAt(nullRow.fieldIndex("media_meta")))
    assert(nullRow.isNullAt(nullRow.fieldIndex("media_features")))
  }

  test("decode preserves partitioning (no shuffle through the seam)") {
    val d = Multimodal.withFakeMedia(docs.repartition(3), "text")
    val out = Multimodal.decodeAndExtract(d, "media")
    assert(out.rdd.getNumPartitions == 3)
    // the only Exchange in the plan is the input repartition itself —
    // the decode seam adds none
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length <= 2, s"decode should not shuffle:\n$plan")
  }

  test("resizeMedia: stub resize rewrites dims, shrinks payload, stays null-safe") {
    val decoded = Multimodal.decodeAndExtract(Multimodal.withFakeMedia(docs, "text"), "media")
    val resized = Multimodal.resizeMedia(decoded, "media", "media_meta", targetW = 32, targetH = 32)
    assert(resized.schema("media_meta").dataType == Multimodal.mediaMetaType)
    val r = resized.filter(col("doc_id") === 2L)
      .select("media", "media_meta.media_type", "media_meta.width", "media_meta.height")
      .collect()(0)
    val orig = decoded.filter(col("doc_id") === 2L).select("media").collect()(0)
    assert(r.getAs[Array[Byte]](0).length <= orig.getAs[Array[Byte]](0).length)
    assert(r.getString(1) == "stub/resized" && r.getInt(2) == 32 && r.getInt(3) == 32)
    // deterministic
    val again = Multimodal.resizeMedia(decoded, "media", "media_meta", 32, 32)
      .filter(col("doc_id") === 2L).select("media").collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(again, r.getAs[Array[Byte]](0)))
  }

  test("sampleFrames slices every stride-th fixed-size window of the bytes") {
    val d = Multimodal.withFakeMedia(docs.filter(col("doc_id") === 2L), "text")
    val frames = Multimodal.sampleFrames(d, "media", "doc_id", frameBytes = 16, stride = 4)
      .collect()
    // 200 bytes → ceil over 64-byte strides → 4 sampled frames (0,4,8,12)
    assert(frames.map(_.getAs[Int]("frame_no")).toSeq == Seq(0, 4, 8, 12))
    frames.dropRight(1).foreach(f => assert(f.getAs[Array[Byte]]("frame").length == 16))
    val all = new String(frames(0).getAs[Array[Byte]]("frame"), "UTF-8")
    assert(all == "a" * 16)
  }

  test("mm_audio_vad: rollup conserves windows and longest runs match a driver fold") {
    val out = graft.queries.Queries.queriesMap("mm_audio_vad")(spark, sf("sf0.001"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // driver-side replay of the deterministic window/energy contract
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def h48(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(12), 16)
    val docs = Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val perLang = docs.groupBy(_._2).map { case (lang, rows) =>
      var (wins, act, maxRun) = (0L, 0L, 0L)
      rows.foreach { case (_, _, text) =>
        val hx = md5hex(text)
        val nw = (h48(text) >> 22) % 600000 / 5000 + 1
        var run = 0L
        (0L until nw).foreach { w =>
          wins += 1
          if (h48(s"$hx:$w") % 1000 >= 500) { act += 1; run += 1; maxRun = math.max(maxRun, run) }
          else run = 0
        }
      }
      lang -> ((rows.length.toLong, wins, act, maxRun))
    }
    assert(out == perLang, s"\n$out\nvs\n$perLang")
  }

  test("phash hot-band cap drops a synthetic mega-bucket, keeps normal pairs") {
    import spark.implicits._
    // 30 byte-identical assets share every band (one bucket of 30);
    // two distinct near-dup assets live in small buckets. cap=10 must
    // drop the pileup's pairs and keep the honest pair reachable.
    val boiler = "identical boilerplate asset body repeated verbatim " * 3
    val docs = ((1L to 30L).map(i => (i, boiler)) ++ Seq(
      (101L, "a distinctive body about spark vector engines and parquet"),
      (102L, "a distinctive body about spark vector engines and parquet files")))
      .toDF("doc_id", "text")
    val d = graft.operators.Multimodal.withFakeMedia(docs, "text")
    val capped = graft.queries.MultimodalQueries.phashPairs(d,
      maxHamming = 48, maxBandSize = Some(10))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!capped.exists { case (a, b) => a <= 30 && b <= 30 },
      s"mega-bucket pairs must drop under the cap: $capped")
    assert(capped.contains((101L, 102L)),
      "small-bucket near-dup pair must survive the cap")
    // without the cap the pileup pairs come back
    val uncapped = graft.queries.MultimodalQueries.phashPairs(d,
      maxHamming = 48, maxBandSize = None)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.exists { case (a, b) => a <= 30 && b <= 30 })
  }

  test("mm_phash_near_dup: pairs replay from driver-computed frame sketches") {
    val out = graft.queries.Queries.queriesMap("mm_phash_near_dup")(
      spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty, "the dup-bearing fixture must yield near-dup assets")
    // driver replay: sketch = simhash over distinct 48-bit frame hashes
    val docs = Tables.documents(spark, sf("sf0.001"))
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def sketch(text: String): Long = {
      val bytes = text.getBytes("UTF-8")
      val hvs = (0 to (bytes.length - 1) / 64).map { i =>
        val frame = new String(bytes.slice(i * 64, i * 64 + 16), "UTF-8")
        graft.functions.Md5.long48(frame)
      }.distinct
      (0 until 48).map { b =>
        val vote = hvs.map(h => if (((h >> b) & 1L) == 1L) 1L else -1L).sum
        if (vote > 0) 1L << b else 0L
      }.sum
    }
    val sigs = docs.map { case (id, t) => id -> sketch(t) }.toMap
    out.foreach { case (a, b, ham) =>
      assert(a < b)
      assert(ham <= 12)
      val want = java.lang.Long.bitCount(sigs(a) ^ sigs(b)).toLong
      assert(ham == want, s"pair ($a,$b): hamming $ham != replay $want")
      // candidates come from band blocking: the pair must share a band
      val shares = (0 until 4).exists(band =>
        ((sigs(a) >> (band * 12)) & 4095L) == ((sigs(b) >> (band * 12)) & 4095L))
      assert(shares, s"pair ($a,$b) shares no band — not a valid candidate")
    }
  }

  test("frame↔cue as-of alignment: ties, leading frames, per-doc isolation") {
    import spark.implicits._
    val frames = Seq(
      (1L, 0L, 0L), (1L, 1L, 10L), (1L, 2L, 20L), // doc 1: cues at 0/10
      (2L, 0L, 5L),                               // doc 2: before any cue
      (2L, 1L, 15L)                               // doc 2: after cue 0 at 10
    ).toDF("doc_id", "frame_idx", "ts")
    val cues = Seq(
      (1L, 0L, 0L, "a"), (1L, 1L, 10L, "b"),
      (2L, 0L, 10L, "z")
    ).toDF("doc_id", "cue_idx", "ts", "cap")
    val out = graft.operators.Multimodal.alignFramesToCues(frames, cues)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (Option(r.get(2)).map(_.asInstanceOf[Long]), Option(r.getString(3))))
      .toMap
    assert(out((1L, 0L)) == (Some(0L), Some("a"))) // cue at exactly frame ts matches
    assert(out((1L, 1L)) == (Some(1L), Some("b"))) // tie at ts=10 prefers the cue
    assert(out((1L, 2L)) == (Some(1L), Some("b"))) // latest at-or-before carries
    assert(out((2L, 0L)) == (None, None))          // frame before any cue: null
    assert(out((2L, 1L)) == (Some(0L), Some("z"))) // doc 1's cue 'b' must not leak
    assert(out.size == 5)
  }
}
