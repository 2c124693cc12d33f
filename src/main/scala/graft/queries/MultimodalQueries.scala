package graft.queries

import graft.Tables
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal-column query surface: the binary media path over the
  * `documents` fixture (UTF-8 bytes stand in for real media — see
  * [[graft.operators.Multimodal]]).
  */
object MultimodalQueries {

  private val meta = QueryDef(
    "mm_media_meta",
    "Binary media column metadata: byte length, content hash, frame " +
      "count under the 64-byte-stride sampler — all computed on the " +
      "BINARY column (parity: DuckDB encode() → BLOB).",
    (s, dir) => {
      val d = Multimodal.withFakeMedia(Tables.documentsSpread(s, dir), "text")
      d.select(
        col("doc_id"),
        length(col("media")).cast("long").as("n_bytes"),
        md5(col("media")).as("media_md5"),
        (floor((length(col("media")) - 1) / 64.0).cast("long") + 1L).as("n_frames"))
        .orderBy(col("doc_id"))
    },
    Some("""
      |SELECT doc_id,
      |       octet_length(encode(text))::BIGINT AS n_bytes,
      |       md5(text) AS media_md5,
      |       (floor((octet_length(encode(text)) - 1) / 64.0)::BIGINT + 1) AS n_frames
      |FROM documents ORDER BY doc_id
      """.stripMargin.trim))

  private val decode = QueryDef(
    "mm_decode_features",
    "Stub-decoded media: metadata struct + feature vector via the " +
      "batched mapPartitions decode seam. The md5-based stub is fully " +
      "SQL-expressible (md5 of the UTF-8 stand-in bytes ≡ md5(text)), " +
      "so metadata bit-slices AND the float32 feature component are " +
      "hash-gated cross-engine.",
    (s, dir) => {
      val d = Multimodal.withFakeMedia(Tables.documentsSpread(s, dir), "text")
      Multimodal.decodeAndExtract(d, "media")
        .select(col("doc_id"),
          col("media_meta.width").as("width"),
          col("media_meta.height").as("height"),
          col("media_meta.n_channels").as("n_channels"),
          col("media_meta.duration_ms").as("duration_ms"),
          round(element_at(col("media_features"), 1).cast("double"), 6).as("f0"))
        .orderBy(col("doc_id"))
    },
    Some("""
      |WITH m AS (
      |  SELECT doc_id, md5(text) AS hx,
      |         ('0x' || substring(md5(text), 1, 12))::BIGINT AS h
      |  FROM documents
      |), tok AS (
      |  SELECT doc_id, unnest(list_transform(range(16), i -> substring(hx, i*2 + 1, 2))) AS t
      |  FROM m
      |), b AS (
      |  SELECT doc_id,
      |         (('0x' || substring(md5(t), 1, 12))::BIGINT % 16) AS bucket,
      |         CASE WHEN ('0x' || substring(md5(t), 13, 1))::BIGINT < 8 THEN 1 ELSE -1 END AS sign
      |  FROM tok
      |), acc AS (
      |  SELECT doc_id, bucket, sum(sign)::DOUBLE AS w FROM b GROUP BY 1, 2
      |), nrm AS (
      |  SELECT doc_id, sqrt(sum(w * w)) AS nn FROM acc GROUP BY doc_id
      |), f0 AS (
      |  SELECT n.doc_id,
      |         CASE WHEN n.nn = 0 THEN 1.0
      |              ELSE CAST(CAST(COALESCE(a.w, 0.0) / n.nn AS FLOAT) AS DOUBLE) END AS f0
      |  FROM nrm n LEFT JOIN acc a ON a.doc_id = n.doc_id AND a.bucket = 0
      |)
      |SELECT m.doc_id,
      |       (64 + m.h % 1024)::INT AS width,
      |       (64 + (m.h >> 10) % 1024)::INT AS height,
      |       (1 + (m.h >> 20) % 4)::INT AS n_channels,
      |       ((m.h >> 22) % 600000)::BIGINT AS duration_ms,
      |       round(f0.f0, 6) AS f0
      |FROM m JOIN f0 ON m.doc_id = f0.doc_id
      |ORDER BY m.doc_id
      """.stripMargin.trim))

  private val frameDedup = QueryDef(
    "mm_frame_dedup",
    "Frame-level video dedup: the 16-byte/stride-4 frame sampler runs " +
      "over the BINARY media column, every frame gets an md5 " +
      "fingerprint, and fingerprints seen in ≥ 2 distinct docs are the " +
      "cross-video duplicate frames (the primitive behind near-dup " +
      "video detection: shared intros, stock footage, re-uploads). " +
      "All map-side until one fingerprint-keyed aggregate; the " +
      "global shared-count total rides in as a broadcast single-row " +
      "aggregate, and the top-20 by spread is a TakeOrderedAndProject. " +
      "Parity: the fixture's UTF-8 stand-in media is ASCII (verified: " +
      "octet_length ≡ length), so DuckDB's VARCHAR substring slices " +
      "the same bytes Spark's BINARY substr does, and md5(VARCHAR) " +
      "hashes those bytes.",
    (s, dir) => {
      val d = Multimodal.withFakeMedia(Tables.documentsSpread(s, dir), "text")
      val frames = Multimodal.sampleFrames(d, "media", "doc_id")
      val shared = frames
        .groupBy(md5(col("frame")).as("fp"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_occ"),
          min(col("doc_id")).as("first_doc"))
        .filter(col("n_docs") >= 2)
      val total = shared.agg(count(lit(1)).as("n_shared_total"))
      shared.orderBy(col("n_docs").desc, col("fp")).limit(20)
        .crossJoin(broadcast(total))
        .select(col("fp"), col("n_docs"), col("n_occ"), col("first_doc"),
          col("n_shared_total"))
        .orderBy(col("n_docs").desc, col("fp"))
    },
    Some("""
      |WITH f AS (
      |  SELECT doc_id, md5(substring(text, i*64 + 1, 16)) AS fp
      |  FROM documents, unnest(range(((octet_length(encode(text)) - 1) // 64) + 1)) AS t(i)
      |), d AS (
      |  SELECT fp, count(distinct doc_id) AS n_docs, count(*) AS n_occ,
      |         min(doc_id) AS first_doc
      |  FROM f GROUP BY fp HAVING count(distinct doc_id) >= 2
      |), tot AS (SELECT count(*) AS n_shared_total FROM d)
      |SELECT fp, n_docs, n_occ, first_doc, n_shared_total
      |FROM (SELECT * FROM d ORDER BY n_docs DESC, fp LIMIT 20), tot
      |ORDER BY n_docs DESC, fp
      """.stripMargin.trim))

  /** Frame-sketch near-dup pairs over a media DataFrame — factored so
    * MultimodalSpec can drive the hot-band cap on a synthetic pileup.
    * Sketch = SimHash of the asset's distinct 48-bit frame
    * fingerprints; 4×12-bit banding; band buckets above
    * `maxBandSize` drop (the dedup_simhash cap, same bounded
    * hot-list broadcast).
    */
  private[graft] def phashPairs(d: org.apache.spark.sql.DataFrame,
                                  maxHamming: Int,
                                  maxBandSize: Option[Int] =
                                    Some(graft.operators.Dedup.DefaultMaxBandSize)): org.apache.spark.sql.DataFrame = {
    import graft.operators.TextAnalysis
    val frames = expr(
      "transform(sequence(0, (octet_length(media) - 1) div 64), " +
        "i -> substring(media, i*64 + 1, 16))")
    val hashes = array_distinct(transform(frames,
      f => TextAnalysis.md5Long48(f)))
    val sk = d.select(col("doc_id"),
      TextAnalysis.simhash48FromHashes(hashes).as("sig"))
    val bands = sk.select(col("doc_id"), col("sig"),
      explode(expr("transform(sequence(0, 3), " +
        "b -> concat(CAST(b AS STRING), ':', CAST((sig >> (b*12)) & 4095 AS STRING)))"))
        .as("band"))
      .cache()
    val pruned = maxBandSize match {
      case Some(cap) =>
        val hot = bands.groupBy(col("band"))
          .agg(count(lit(1)).as("n")).filter(col("n") > cap).select("band")
        bands.join(broadcast(hot), Seq("band"), "left_anti")
      case None => bands
    }
    pruned.as("x").join(pruned.as("y"),
        col("x.band") === col("y.band") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        TextAnalysis.hammingDistance(col("x.sig"), col("y.sig")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  private val phashNearDup = QueryDef(
    "mm_phash_near_dup",
    "Video-level perceptual-hash near-dup over the BINARY media " +
      "column: each asset's frame sampler output (the mm_frame_dedup " +
      "geometry — 16-byte frames at stride 64) hashes to distinct " +
      "48-bit frame fingerprints, and the asset's SKETCH is the " +
      "SimHash of that fingerprint set (per-bit ±1 votes, sign) — " +
      "assets sharing most frames land at small hamming distance, " +
      "which is how video near-dup works when re-uploads share intros " +
      "or stock footage but differ in a few frames (exact frame " +
      "sharing, mm_frame_dedup, misses the asset-level relation). " +
      "Sketches band into 4×12 bits; only band-sharing pairs are " +
      "candidates (never all-pairs — the dedup_simhash scale " +
      "contract, INCLUDING its default-on hot-band cap: band buckets " +
      "above " + graft.operators.Dedup.DefaultMaxBandSize + " assets " +
      "drop via a bounded hot-list broadcast anti-join, so a " +
      "pathological single-sketch pileup cannot put Σ bucket² pairs " +
      "in one task; like dedup_simhash, the cap never fires on the " +
      "tested fixtures, so the oracle omits it by the same contract); " +
      "hamming ≤ 12 verify, 25 closest pairs. The sketch " +
      "pass is a shuffle-free HOF projection over the binary column; " +
      "the band join shuffles (band, id, sig) only. Oracle recomputes " +
      "frames, fingerprints, votes, bands, and hamming in SQL (the " +
      "fixture's ASCII stand-in media makes DuckDB's VARCHAR " +
      "substring slice the same bytes Spark's BINARY substr does).",
    (s, dir) => phashPairs(Multimodal.withFakeMedia(
        Tables.documentsSpread(s, dir), "text"), maxHamming = 12)
      .orderBy(col("hamming"), col("id_a"), col("id_b")).limit(25),
    Some("""
      |WITH f AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |           range(((octet_length(encode(text)) - 1) // 64) + 1),
      |           i -> ('0x' || substring(md5(substring(text, i*64 + 1, 16)), 1, 12))::BIGINT))
      |         AS hvs
      |  FROM documents
      |), h AS (
      |  SELECT doc_id, unnest(hvs) AS hv FROM f
      |), bits AS (
      |  SELECT doc_id, b, sum(CASE WHEN (hv >> b) & 1 = 1 THEN 1 ELSE -1 END) AS vote
      |  FROM h CROSS JOIN (SELECT generate_series AS b FROM generate_series(0, 47))
      |  GROUP BY doc_id, b
      |), sim AS (
      |  SELECT doc_id, sum(CASE WHEN vote > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS sig
      |  FROM bits GROUP BY doc_id
      |), bands AS (
      |  SELECT doc_id, sig, unnest(list_transform(range(4),
      |    b -> b::VARCHAR || ':' || ((sig >> (b*12)) & 4095)::VARCHAR)) AS band
      |  FROM sim
      |), cand AS (
      |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
      |         bit_count(xor(x.sig, y.sig))::BIGINT AS hamming
      |  FROM bands x JOIN bands y ON x.band = y.band AND x.doc_id < y.doc_id
      |)
      |SELECT id_a, id_b, hamming FROM cand WHERE hamming <= 12
      |ORDER BY hamming, id_a, id_b LIMIT 25
      """.stripMargin.trim))

  private val audioVad = QueryDef(
    "mm_audio_vad",
    "Voice-activity detection over the stub-decoded audio column: the " +
      "media's stub duration (the decode query's bit-slice contract) " +
      "is cut into 5-second windows, per-window energy is the md5-" +
      "derived deterministic stand-in for an RMS frame energy (the " +
      "Spark plumbing — windows explode, islands, rollup — is what a " +
      "real PCM decoder would plug into), active = energy ≥ 500/1000. " +
      "Longest contiguous active run per clip via the islands pattern " +
      "(w − row_number is the run key). Per-language rollup: clips, " +
      "windows, activity share (one exact-integer division), longest " +
      "run. Window explosion is duration-bounded (≤120 rows/clip); " +
      "everything else is per-key integer work.",
    (s, dir) => {
      import graft.operators.TextAnalysis.md5Long48
      import org.apache.spark.sql.expressions.Window
      val base = Tables.documentsSpread(s, dir)
        .select(col("doc_id"), col("lang"), md5(col("text")).as("hx"),
          md5Long48(col("text")).as("h"))
        .withColumn("duration_ms", expr("(h >> 22) % 600000"))
        .withColumn("nw", expr("duration_ms div 5000 + 1"))
      val win = base.select(col("doc_id"), col("lang"), col("hx"), col("nw"),
          explode(sequence(lit(0L), col("nw") - 1)).as("w"))
        .withColumn("energy",
          md5Long48(concat(col("hx"), lit(":"), col("w").cast("string"))) % 1000)
        .withColumn("active", (col("energy") >= 500).cast("long"))
      val runs = win.filter(col("active") === 1)
        .withColumn("grp", col("w") - row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("w"))))
        .groupBy(col("doc_id"), col("grp")).agg(count(lit(1)).as("run"))
        .groupBy(col("doc_id")).agg(max(col("run")).as("longest"))
      val perDoc = win.groupBy(col("doc_id"), col("lang"))
        .agg(count(lit(1)).as("n_win"), sum(col("active")).as("n_act"))
        .join(runs, Seq("doc_id"), "left")
        .withColumn("longest", coalesce(col("longest"), lit(0L)))
      perDoc.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_clips"),
          sum(col("n_win")).as("n_windows"),
          sum(col("n_act")).as("n_active"),
          max(col("longest")).as("max_run"))
        .withColumn("activity_share",
          round(col("n_active").cast("double") / col("n_windows").cast("double"), 6))
        .orderBy(col("lang"))
    },
    Some("""
      |WITH base AS (
      |  SELECT doc_id, lang, md5(text) AS hx,
      |         ('0x' || substring(md5(text), 1, 12))::BIGINT AS h
      |  FROM documents
      |), dur AS (
      |  SELECT doc_id, lang, hx, ((h >> 22) % 600000) // 5000 + 1 AS nw FROM base
      |), win AS (
      |  SELECT doc_id, lang, hx, nw, unnest(range(0, nw)) AS w FROM dur
      |), scored AS (
      |  SELECT doc_id, lang, w,
      |         CASE WHEN ('0x' || substring(md5(hx || ':' || w::VARCHAR), 1, 12))::BIGINT % 1000 >= 500
      |              THEN 1 ELSE 0 END AS active
      |  FROM win
      |), runs AS (
      |  SELECT doc_id, max(cnt) AS longest FROM (
      |    SELECT doc_id, grp, count(*) AS cnt FROM (
      |      SELECT doc_id, w - row_number() OVER (PARTITION BY doc_id ORDER BY w) AS grp
      |      FROM scored WHERE active = 1
      |    ) GROUP BY doc_id, grp
      |  ) GROUP BY 1
      |), per_doc AS (
      |  SELECT s.doc_id, s.lang, count(*) AS n_win, SUM(s.active)::BIGINT AS n_act,
      |         COALESCE(any_value(r.longest), 0)::BIGINT AS longest
      |  FROM scored s LEFT JOIN runs r ON s.doc_id = r.doc_id
      |  GROUP BY 1, 2
      |)
      |SELECT lang, count(*) AS n_clips,
      |       SUM(n_win)::BIGINT AS n_windows,
      |       SUM(n_act)::BIGINT AS n_active,
      |       max(longest) AS max_run,
      |       round(SUM(n_act)::DOUBLE / SUM(n_win)::DOUBLE, 6) AS activity_share
      |FROM per_doc GROUP BY 1 ORDER BY lang
      """.stripMargin.trim))

  private val shotBoundaries = QueryDef(
    "mm_shot_boundaries",
    "Video shot-boundary detection over the stub-decoded media column " +
      "— the pre-processing cut a video-training pipeline runs before " +
      "sampling frames (one keyframe PER SHOT beats uniform sampling " +
      "that lands five frames in one static shot): per clip, the stub " +
      "frame count (bit-slice of the content hash) explodes into a " +
      "frame index, per-frame energy is the md5-derived deterministic " +
      "stand-in for a real frame histogram, and a boundary fires when " +
      "the frame-to-frame energy jump exceeds 700/1000 (the classic " +
      "absolute-difference detector). shot_id = running sum of " +
      "boundaries (one per-clip window pass — the CUSUM prefix-sum " +
      "shape), shot lengths from one (clip, shot) rollup. Per-language " +
      "rollup: clips, frames, shots, longest shot, mean shot length " +
      "as the exact truncated integer (frames·10⁶) div shots. Frame " +
      "explosion is duration-bounded (≤241 rows/clip); everything " +
      "downstream is per-key integer work.",
    (s, dir) => {
      import graft.operators.TextAnalysis.md5Long48
      import org.apache.spark.sql.expressions.Window
      val base = Tables.documentsSpread(s, dir)
        .select(col("doc_id"), col("lang"), md5(col("text")).as("hx"),
          md5Long48(col("text")).as("h"))
        .withColumn("nf", expr("(h >> 20) % 240 + 2"))
      val frames = base.select(col("doc_id"), col("lang"), col("hx"), col("nf"),
          explode(sequence(lit(0L), col("nf") - 1)).as("f"))
        .withColumn("energy",
          md5Long48(concat(col("hx"), lit(":f:"), col("f").cast("string"))) % 1000)
      val w = Window.partitionBy(col("doc_id")).orderBy(col("f"))
      val shots = frames
        .withColumn("prev", lag(col("energy"), 1).over(w))
        .withColumn("boundary",
          when(col("prev").isNotNull &&
            abs(col("energy") - col("prev")) > 700, 1L).otherwise(0L))
        .withColumn("shot_id", sum(col("boundary")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val perShot = shots.groupBy(col("doc_id"), col("lang"), col("shot_id"))
        .agg(count(lit(1)).as("len"))
      val perDoc = perShot.groupBy(col("doc_id"), col("lang"))
        .agg(sum(col("len")).as("n_frames"),
          count(lit(1)).as("n_shots"), max(col("len")).as("longest"))
      perDoc.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_clips"),
          sum(col("n_frames")).as("n_frames"),
          sum(col("n_shots")).as("n_shots"),
          max(col("longest")).as("longest_shot"))
        .withColumn("mean_shot_len_millionths",
          expr("n_frames * 1000000 div n_shots"))
        .orderBy(col("lang"))
    },
    Some("""
      |WITH base AS (
      |  SELECT doc_id, lang, md5(text) AS hx,
      |         ('0x' || substring(md5(text), 1, 12))::BIGINT AS h
      |  FROM documents
      |), nf AS (
      |  SELECT doc_id, lang, hx, (h >> 20) % 240 + 2 AS nf FROM base
      |), frames AS (
      |  SELECT doc_id, lang, unnest(range(0, nf)) AS f, hx FROM nf
      |), scored AS (
      |  SELECT doc_id, lang, f,
      |         ('0x' || substring(md5(hx || ':f:' || f::VARCHAR), 1, 12))::BIGINT % 1000 AS energy
      |  FROM frames
      |), marked AS (
      |  SELECT doc_id, lang, f, energy,
      |         CASE WHEN lag(energy) OVER w IS NOT NULL
      |               AND abs(energy - lag(energy) OVER w) > 700 THEN 1 ELSE 0 END AS boundary
      |  FROM scored WINDOW w AS (PARTITION BY doc_id ORDER BY f)
      |), shotted AS (
      |  SELECT doc_id, lang,
      |         SUM(boundary) OVER (PARTITION BY doc_id ORDER BY f
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS shot_id
      |  FROM marked
      |), per_shot AS (
      |  SELECT doc_id, lang, shot_id, count(*) AS len FROM shotted GROUP BY 1, 2, 3
      |), per_doc AS (
      |  SELECT doc_id, lang, SUM(len)::BIGINT AS n_frames,
      |         count(*)::BIGINT AS n_shots, max(len)::BIGINT AS longest
      |  FROM per_shot GROUP BY 1, 2
      |)
      |SELECT lang, count(*) AS n_clips,
      |       SUM(n_frames)::BIGINT AS n_frames,
      |       SUM(n_shots)::BIGINT AS n_shots,
      |       max(longest) AS longest_shot,
      |       (SUM(n_frames)::BIGINT * 1000000) // SUM(n_shots)::BIGINT AS mean_shot_len_millionths
      |FROM per_doc GROUP BY 1 ORDER BY lang
      """.stripMargin.trim))

  private val audioNearDup = QueryDef(
    "mm_audio_near_dup",
    "Audio fingerprint near-dup — the chromaprint-core shape: where " +
      "mm_phash_near_dup SimHashes an ORDER-FREE frame set, an audio " +
      "fingerprint is ORDER-SENSITIVE (the same sounds in a different " +
      "sequence are a different recording): per clip, the VAD window " +
      "energies (same stub seam, 'fp' salt) quantize to their " +
      "DELTA SIGNS — bit w = energy(w+1) > energy(w), the actual " +
      "chromaprint primitive — packed into a 48-bit sequence " +
      "fingerprint (first 49 windows; shorter clips keep leading " +
      "zeros). Re-encodes and exact re-uploads collide at hamming 0; " +
      "near-versions land within the hamming-≤6 verify. Banding is " +
      "the established 4×12-bit blocking (never all-pairs — the " +
      "dedup_simhash scale contract, INCLUDING its default-on " +
      "hot-band cap: short clips all pack near-zero fingerprints, so " +
      "without the cap a popular band bucket would put \u03a3 bucket\u00b2 " +
      "pairs in one task; like the phash gate, the cap never fires " +
      "on the tested fixtures, so the oracle omits it by the same " +
      "contract); the band join shuffles (band, id, fp) only; 25 " +
      "closest pairs by (hamming, ids).",
    (s, dir) => {
      import graft.operators.TextAnalysis.md5Long48
      import org.apache.spark.sql.expressions.Window
      val base = Tables.documentsSpread(s, dir)
        .select(col("doc_id"), md5(col("text")).as("hx"),
          md5Long48(col("text")).as("h"))
        .withColumn("nw", least(expr("(h >> 22) % 600000 div 5000 + 1"), lit(49L)))
      val win = base.select(col("doc_id"), col("hx"),
          explode(sequence(lit(0L), col("nw") - 1)).as("w"))
        .withColumn("energy",
          md5Long48(concat(col("hx"), lit(":fp:"), col("w").cast("string"))) % 1000)
      val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("w"))
      val fp = win
        .withColumn("nxt", lead(col("energy"), 1).over(wOrd))
        .filter(col("nxt").isNotNull)
        .withColumn("bit", when(col("nxt") > col("energy"), 1L).otherwise(0L))
        .groupBy(col("doc_id"))
        .agg(sum(expr("shiftleft(bit, CAST(w AS INT))")).as("fp"))
      val bands = fp.select(col("doc_id"), col("fp"),
        explode(expr("transform(sequence(0, 3), " +
          "b -> concat(CAST(b AS STRING), ':', CAST((fp >> (b*12)) & 4095 AS STRING)))"))
          .as("band"))
        .cache()
      // default-on hot-band cap (the dedup_simhash contract): short
      // clips pack few delta bits, so near-zero fingerprints pile into
      // shared bands — the cap drops buckets above the bound via a
      // bounded hot-list broadcast anti-join
      val hot = bands.groupBy(col("band"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > graft.operators.Dedup.DefaultMaxBandSize)
        .select("band")
      val pruned = bands.join(broadcast(hot), Seq("band"), "left_anti")
      val cand = pruned.as("x").join(pruned.as("y"),
          col("x.band") === col("y.band") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
          expr("CAST(bit_count(x.fp ^ y.fp) AS BIGINT)").as("hamming"))
        .distinct()
      cand.filter(col("hamming") <= 6)
        .orderBy(col("hamming"), col("id_a"), col("id_b")).limit(25)
    },
    Some("""
      |WITH base AS (
      |  SELECT doc_id, md5(text) AS hx,
      |         ('0x' || substring(md5(text), 1, 12))::BIGINT AS h
      |  FROM documents
      |), nw AS (
      |  SELECT doc_id, hx,
      |         least(((h >> 22) % 600000) // 5000 + 1, 49) AS nw
      |  FROM base
      |), win AS (
      |  SELECT doc_id, hx, unnest(range(0, nw)) AS w FROM nw
      |), scored AS (
      |  SELECT doc_id, w,
      |         ('0x' || substring(md5(hx || ':fp:' || w::VARCHAR), 1, 12))::BIGINT % 1000 AS energy
      |  FROM win
      |), bits AS (
      |  SELECT doc_id, w,
      |         CASE WHEN lead(energy) OVER (PARTITION BY doc_id ORDER BY w) > energy
      |              THEN 1::BIGINT ELSE 0::BIGINT END AS bit,
      |         lead(energy) OVER (PARTITION BY doc_id ORDER BY w) AS nxt
      |  FROM scored
      |), fp AS (
      |  SELECT doc_id, SUM(bit << CAST(w AS INTEGER))::BIGINT AS fp
      |  FROM bits WHERE nxt IS NOT NULL GROUP BY 1
      |), bands AS (
      |  SELECT doc_id, fp, unnest(list_transform(range(4),
      |    b -> b::VARCHAR || ':' || ((fp >> (b*12)) & 4095)::VARCHAR)) AS band
      |  FROM fp
      |), cand AS (
      |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
      |         bit_count(xor(x.fp, y.fp))::BIGINT AS hamming
      |  FROM bands x JOIN bands y ON x.band = y.band AND x.doc_id < y.doc_id
      |)
      |SELECT id_a, id_b, hamming FROM cand WHERE hamming <= 6
      |ORDER BY hamming, id_a, id_b LIMIT 25
      """.stripMargin.trim))

  private val captionAlign = QueryDef(
    "mm_caption_align",
    "Frame↔caption alignment — the multimodal sample-construction step " +
      "that turns (video, subtitle track) into the (image, text) pairs " +
      "a multimodal pretraining pipeline feeds the model: every " +
      "sampled frame (the 64-byte-stride sampler, one frame per 2000 " +
      "ms) is paired with the caption cue active at its timestamp " +
      "(token j of the document is a cue starting at j·1500 ms — the " +
      "deterministic stand-in subtitle track). The alignment is the " +
      "GENERAL union-window as-of, with both event kinds emitted from " +
      "ONE generator (per-doc cue + frame arrays concatenated and " +
      "exploded once — one corpus scan, half the pre-shuffle " +
      "intermediate of separate explodes; running max of the cue " +
      "struct over (ts, kind) order picks the latest cue at-or-before " +
      "each frame — ONE shuffle, never a per-key range join, hot " +
      "assets stay linear), " +
      "while the oracle replays the alignment in CLOSED FORM " +
      "(cue_idx = min(⌊4i/3⌋, n_cues−1)) — a green hash proves the " +
      "generic as-of machinery reproduces the arithmetic ground " +
      "truth. Per asset: frame/cue counts, distinct captions used, " +
      "and an order-independent md5 checksum over the aligned " +
      "(frame, cue, caption) triples, so every single pairing is " +
      "inside the gate.",
    (s, dir) => {
      val d = Multimodal.withFakeMedia(TextQueries.docToks(s, dir), "text")
        .filter(size(col("toks")) >= 1)
      // ONE generator emits cues AND frames as a tagged union (the
      // txt_dup_ngrams pattern) — the fused replacement for the two
      // separate explodes, which scanned the corpus twice and doubled
      // the corpus-sized pre-shuffle intermediate (r17 verdict #5).
      // Field order/names/types must match across the two branches for
      // array concat: (ts long, kind int, idx long, cap string).
      val cueEvents = transform(col("toks"), (cap, i) =>
        struct((i.cast("long") * lit(1500L)).as("ts"), lit(0).as("kind"),
          i.cast("long").as("idx"), cap.as("cap")))
      val frameEvents = transform(
        sequence(lit(0), expr("(octet_length(media) - 1) div 64")),
        i => struct((i.cast("long") * lit(2000L)).as("ts"), lit(1).as("kind"),
          i.cast("long").as("idx"), lit(null).cast("string").as("cap")))
      val tagged = d.select(col("doc_id"),
          explode(concat(cueEvents, frameEvents)).as("e"))
        .select(col("doc_id"), col("e.ts").as("ts"), col("e.kind").as("kind"),
          col("e.idx").as("idx"), col("e.cap").as("cap"))
      val aligned = Multimodal.alignTagged(tagged)
      val h = conv(substring(md5(concat_ws("|",
        col("frame_idx").cast("string"), col("cue_idx").cast("string"),
        col("cap"))), 1, 12), 16, 10).cast("decimal(38,0)")
      val nCues = d.select(col("doc_id"), size(col("toks")).cast("long").as("n_cues"))
      aligned.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_frames"),
          countDistinct(col("cap")).as("n_caps_used"),
          sum(h).cast("decimal(38,0)").cast("string").as("align_fp"))
        .join(nCues, Seq("doc_id"))
        .select(col("doc_id"), col("n_frames"), col("n_cues"),
          col("n_caps_used"), col("align_fp"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      |${Duck.docToks}
      |, b AS (
      |  SELECT t.doc_id, t.toks, len(t.toks)::BIGINT AS n_cues,
      |         ((octet_length(encode(d.text)) - 1) // 64) + 1 AS nf
      |  FROM tt t JOIN documents d USING (doc_id)
      |  WHERE len(t.toks) >= 1
      |), f AS (
      |  SELECT doc_id, n_cues, i,
      |         least((4 * i) // 3, n_cues - 1) AS cue_idx,
      |         toks[CAST(least((4 * i) // 3, n_cues - 1) + 1 AS INTEGER)] AS cap
      |  FROM (SELECT doc_id, toks, n_cues, unnest(range(nf)) AS i FROM b)
      |)
      |SELECT doc_id, count(*)::BIGINT AS n_frames, min(n_cues)::BIGINT AS n_cues,
      |       count(DISTINCT cap)::BIGINT AS n_caps_used,
      |       CAST(CAST(SUM(CAST(('0x' || substring(md5(
      |         i::VARCHAR || '|' || cue_idx::VARCHAR || '|' || cap), 1, 12))::BIGINT
      |         AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS VARCHAR) AS align_fp
      |FROM f GROUP BY doc_id ORDER BY doc_id
      """.stripMargin.trim))

  val defs: Seq[QueryDef] = Seq(meta, decode, frameDedup, phashNearDup, audioVad, captionAlign,
    shotBoundaries, audioNearDup)
}
