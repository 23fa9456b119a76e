package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for the LLM-data pipeline (north star).
  *
  * Media payloads are opaque `binary` columns + typed metadata
  * structs. The real decode libraries (image/audio codecs) are not in
  * this container, so `fakeDecode` below is a clearly-marked
  * deterministic STUB — but the Spark-side plumbing (schema, batch
  * iteration via mapPartitions, partition-locality, metadata
  * projection) is real and tested, and the stub's signature is
  * exactly what a JNI/codec-backed decoder would implement.
  */
object Multimodal {

  /** Media metadata schema a decoder emits per payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("ok", BooleanType)
  ))

  /** Attach a binary payload column (here: UTF-8 of `text` — the
    * testdata has no real media; the column type and everything
    * downstream treats it as opaque bytes).
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", col("text").cast("binary"))

  /** Byte-level metadata — pure builtins, oracle-checkable. */
  def payloadStats(docs: DataFrame): DataFrame =
    withPayload(docs).select(
      col("doc_id"),
      length(col("payload")).as("n_bytes"),
      md5(col("payload")).as("payload_md5"),
      lower(substring(hex(col("payload")), 1, 8)).as("head_hex")
    )

  /** 60-bit integer from the first 15 hex chars of MD5 — the stubs'
    * entropy source, chosen because it is bit-identical in any engine
    * (`conv(substr(md5(x),1,15),16,10)` in Spark SQL,
    * `('0x'||substr(md5(x),1,15))::BIGINT` in DuckDB), which is what
    * makes the decode/feature queries oracle-checkable.
    */
  def md5_60(md: java.security.MessageDigest, payload: Array[Byte]): Long = {
    md.reset()
    val d = md.digest(payload)
    // first 15 hex chars = 7.5 bytes, big-endian as hex reads
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xf0L) >> 4)
  }

  // === STUB ==========================================================
  /** Deterministic FAKE decode: derives plausible metadata from an
    * MD5 of the payload bytes. A real implementation would call an
    * image/audio codec here (the MessageDigest passed in stands in
    * for the per-partition codec handle, initialized once and reused
    * across rows); nothing else in the pipeline changes.
    */
  def fakeDecode(md: java.security.MessageDigest, payload: Array[Byte]): Row =
    if (payload == null || payload.isEmpty)
      Row("unknown", 0, 0, 0, false)
    else {
      val h = md5_60(md, payload)
      val mt = (h % 4) match {
        case 0 => "image"; case 1 => "audio"
        case 2 => "video"; case _ => "text"
      }
      Row(mt, ((h / 4L) % 1920L + 1L).toInt,
        ((h / 4096L) % 1080L + 1L).toInt,
        ((h / 4194304L) % 300L + 1L).toInt, true)
    }
  // === END STUB ======================================================

  /** Decode payloads partition-by-partition (the batch shape a real
    * codec needs: per-partition decoder init, streaming iteration, no
    * driver collect). Output: doc_id + media metadata struct.
    */
  def decodeMeta(docs: DataFrame): DataFrame = {
    val out = StructType(
      StructField("doc_id", LongType) +: mediaMetaSchema.fields.toSeq)
    val enc = org.apache.spark.sql.Encoders.row(out)
    withPayload(docs)
      .select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        // per-partition init (a real impl constructs the codec here)
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          val meta = fakeDecode(md, r.getAs[Array[Byte]]("payload"))
          Row.fromSeq(r.getLong(0) +: meta.toSeq)
        }
      }(enc)
  }

  /** Downstream-style projection over decoded metadata: filter by
    * type + aspect-ratio bucketing (what a training-data curation
    * step does after decode).
    */
  def frameSamplePlan(decoded: DataFrame): DataFrame =
    decoded
      .filter(col("ok") && col("media_type").isin("image", "video"))
      .select(
        col("doc_id"), col("media_type"), col("width"), col("height"),
        (col("width").cast("double") / col("height")).as("aspect"),
        least(col("n_frames"), lit(32)).as("frames_to_sample")
      )

  /** Per-frame sampling plan for video payloads — the row-level form
    * of [[frameSamplePlan]] (which only sizes the budget): emit one
    * row per frame a downstream extractor should decode, uniformly
    * spread over the clip by exact integer arithmetic. With
    * `n = n_frames` and `k = min(n, maxFrames)` frames sampled, slot
    * `p ∈ [0, k)` maps to `frame_idx = ⌊p·(n−1)/(k−1)⌋` (endpoints
    * included; for `k ≤ n` consecutive slots differ by ≥ 1, so
    * indices never repeat — the numerator steps by `n−1 ≥ k−1`), and
    * `pos_ppm = frame_idx·10⁶ div n` locates the frame for
    * timestamp-free consumers (the stub metadata has no fps; a real
    * decoder multiplies by `1000/fps` for ts_ms — the plan arithmetic
    * is unchanged).
    *
    * Scale shape: filter + one Generate per video row (fan-out
    * bounded by `maxFrames`), no shuffle, no UDF — the plan COLUMN
    * computation stays in whole-stage codegen and the real decode
    * happens downstream in the [[decodeMeta]]-style mapPartitions
    * batch (E2: per-partition codec init).
    */
  def frameSampleIndices(decoded: DataFrame,
      maxFrames: Int = 32): DataFrame = {
    require(maxFrames >= 1, s"maxFrames must be >= 1, got $maxFrames")
    decoded
      .filter(col("ok") && col("media_type") === "video")
      .select(col("doc_id"), col("n_frames").cast("long").as("n_frames"),
        least(col("n_frames").cast("long"), lit(maxFrames.toLong))
          .as("frames_sampled"))
      .select(col("doc_id"), col("n_frames"), col("frames_sampled"),
        explode(sequence(lit(0L), col("frames_sampled") - 1))
          .as("frame_pos"))
      .withColumn("frame_idx",
        expr("(frame_pos * (n_frames - 1)) " +
          "div greatest(frames_sampled - 1, 1)"))
      .withColumn("pos_ppm", expr("frame_idx * 1000000 div n_frames"))
  }

  /** Aspect-ratio bucket ladder — every (w, h) pair of `tile`
    * multiples with `w·h ≤ budget²`, both sides in
    * `[minSide, maxSide]`, and h maximal for its w (the bucket set
    * vision-training pipelines batch by, so a batch never mixes
    * shapes and nothing is center-cropped to a square). Deterministic
    * and parameter-bounded (≲ a few dozen rows), computed at plan
    * time — a literal table in BOTH engines, which is what makes the
    * assignment below oracle-checkable.
    */
  def aspectLadder(budget: Int = 512, tile: Int = 64,
      minSide: Int = 320, maxSide: Int = 1024): Seq[(Int, Int)] =
    (minSide to maxSide by tile).flatMap { w =>
      val h = math.min(
        (budget.toLong * budget / w / tile).toInt * tile, maxSide)
      if (h >= minSide) Some((w, h)) else None
    }

  /** Aspect-ratio bucketed batch plan — the vision-side sibling of
    * `Text.packGreedy` (text packs token budgets; image/video
    * training packs SHAPES): assign every decoded visual to the
    * [[aspectLadder]] bucket with the closest aspect ratio and roll
    * up per-bucket batch counts. The distance is exact-integer ppm,
    * `|w·bh − h·bw|·10⁶ div (h·bh)` (= ⌊|w/h − bw/bh|·10⁶⌋ by
    * cross-multiplication — no floats), with deterministic
    * `(dist, bw, bh)` tie-break. Per bucket: `n_media`, full+partial
    * `n_batches = ⌈n/batchSize⌉`, the last batch's `last_fill_ppm`
    * (the padding-waste signal — many near-empty tail batches means
    * the ladder is too fine for the corpus), and `max_dist_ppm` (the
    * worst stretch any member suffers when resized into the bucket).
    *
    * Scale shape: filter + a ≤-few-dozen-row broadcast cross join +
    * one min(struct) groupBy per doc + a ladder-bounded rollup — no
    * window over media rows, no shuffle wider than one row per
    * visual.
    */
  def aspectBucketPlan(decoded: DataFrame, batchSize: Int = 64,
      budget: Int = 512, tile: Int = 64, minSide: Int = 320,
      maxSide: Int = 1024): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val ladder = aspectLadder(budget, tile, minSide, maxSide)
    require(ladder.nonEmpty, "empty aspect ladder")
    val spark = decoded.sparkSession
    import spark.implicits._
    val ldf = ladder.toDF("bw", "bh")
    val assigned = decoded
      .filter(col("ok") && col("media_type").isin("image", "video"))
      .select(col("doc_id"), col("width").cast("long").as("w"),
        col("height").cast("long").as("h"))
      .crossJoin(broadcast(ldf))
      .select(col("doc_id"), col("bw"), col("bh"),
        expr("abs(w * bh - h * bw) * 1000000 div (h * bh)")
          .as("dist_ppm"))
      .groupBy(col("doc_id"))
      .agg(min(struct(col("dist_ppm"), col("bw"), col("bh")))
        .as("pick"))
      .select(col("pick.bw").as("bw"), col("pick.bh").as("bh"),
        col("pick.dist_ppm").as("dist_ppm"))
    assigned.groupBy(col("bw"), col("bh"))
      .agg(count(lit(1)).as("n_media"),
        max(col("dist_ppm")).as("max_dist_ppm"))
      .select(col("bw"), col("bh"),
        expr("cast(bw as bigint) * 1000000 div bh").as("aspect_ppm"),
        col("n_media"),
        expr(s"(n_media + ${batchSize - 1}) div $batchSize")
          .as("n_batches"),
        expr(s"(n_media - ((n_media + ${batchSize - 1}) div " +
          s"$batchSize - 1) * $batchSize) * 1000000 div $batchSize")
          .as("last_fill_ppm"),
        col("max_dist_ppm"))
      .orderBy(col("bw"), col("bh"))
  }

  /** Audio segmentation planning — the audio twin of
    * [[frameSamplePlan]] (video samples frames; audio models consume
    * fixed-length windows): for decoded audio payloads, emit one row
    * per `windowS`-second chunk with `overlapS` seconds of overlap
    * (the Whisper-style 30 s/stride recipe). Duration derives from
    * the stub metadata (`n_frames` seconds — a real decoder reports
    * duration; the chunk arithmetic downstream is identical), chunk
    * starts are `i·(windowS−overlapS)`, and the plan stops when a
    * window's start passes the end — all integer arithmetic, one
    * Generate per payload, no UDF.
    */
  def audioChunkPlan(decoded: DataFrame, windowS: Int = 30,
      overlapS: Int = 5): DataFrame = {
    require(windowS > overlapS && overlapS >= 0,
      s"need windowS > overlapS >= 0, got $windowS/$overlapS")
    val stride = windowS - overlapS
    decoded
      .filter(col("ok") && col("media_type") === "audio")
      .select(col("doc_id"), col("n_frames").cast("long")
        .as("duration_s"))
      .select(col("doc_id"), col("duration_s"),
        explode(sequence(lit(0L),
          greatest(expr(s"(duration_s - 1) div $stride"), lit(0L))))
          .as("chunk_idx"))
      .select(col("doc_id"), col("duration_s"), col("chunk_idx"),
        (col("chunk_idx") * stride).as("start_s"),
        least(col("chunk_idx") * stride + windowS,
          col("duration_s")).as("end_s"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** Per-source modality-mix audit — the dataset-composition table a
    * multimodal training recipe starts from (how much image vs audio
    * vs video vs text does each source contribute, and does a crawl
    * refresh shift it): decoded media types joined back to the doc's
    * source, reduced to (source × media_type) counts with the exact
    * ppm share of each source. One decode pass + one many-to-one id
    * join + one aggregation whose key domain is #sources × 4; the
    * share attach is a window over that aggregated frame, never the
    * corpus.
    */
  /** Magic-byte content sniffing — the trust-no-extension first pass
    * every media-ingest pipeline runs: classify each payload by its
    * leading bytes (JPEG ffd8ff, PNG 89504e47, RIFF 52494646, GIF
    * 474946, PDF 25504446; anything else `unknown`) and roll up
    * counts + byte mass per detected type. The content-derived twin
    * of [[modalityMix]]'s metadata view — a mismatch between the two
    * IS the mislabeled-payload alarm. One scan, hex-prefix
    * when-chain (flat, not nested — the 2^n lesson), type-domain
    * output.
    */
  def magicSniff(docs: DataFrame): DataFrame = {
    val hx = lower(substring(hex(col("payload")), 1, 8))
    val kind = when(hx.startsWith("ffd8ff"), "jpeg")
      .when(hx.startsWith("89504e47"), "png")
      .when(hx.startsWith("52494646"), "riff")
      .when(hx.startsWith("474946"), "gif")
      .when(hx.startsWith("25504446"), "pdf")
      .otherwise("unknown")
    // honor a caller-supplied binary payload column (true media
    // bytes can't ride the text stand-in — jpeg/png magics are not
    // valid UTF-8); derive from text only when absent
    val withP =
      if (docs.columns.contains("payload")) docs else withPayload(docs)
    val base = withP.select(
      kind.as("sniffed_type"),
      length(col("payload")).cast("long").as("n_bytes"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
    base
      .groupBy(col("sniffed_type"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bytes")).cast("long").as("total_bytes"))
      .withColumn("__all", sum(col("n_docs")).over(w))
      .withColumn("share_ppm", expr("n_docs * 1000000 div __all"))
      .drop("__all")
  }

  def modalityMix(docs: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
    decodeMeta(docs)
      .filter(col("ok"))
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"), col("media_type"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("src_total", sum(col("n_docs")).over(w))
      .withColumn("share_ppm",
        expr("n_docs * 1000000 div src_total"))
      .orderBy(col("source"), col("media_type"))
  }

  /** Resize planning over decoded metadata — pure metadata math (the
    * shape a curation step computes before invoking the codec):
    * scale to fit a 336×336 training tile preserving aspect.
    */
  def resizePlan(decoded: DataFrame, target: Int = 336): DataFrame =
    decoded
      .filter(col("ok") && col("width") > 0 && col("height") > 0)
      .select(
        col("doc_id"), col("width"), col("height"),
        least(
          lit(target).cast("double") / col("width"),
          lit(target).cast("double") / col("height")).as("scale"))
      .select(
        col("doc_id"), col("width"), col("height"), col("scale"),
        ceil(col("width") * col("scale")).cast("int").as("out_w"),
        ceil(col("height") * col("scale")).cast("int").as("out_h"))

  /** Deterministic per-epoch augmentation schedule — the
    * reproducibility primitive of a vision training pipeline: every
    * (image, epoch) pair gets its horizontal-flip bit, crop window,
    * and rotation bucket from the md5-60 draw of `"doc:epoch:aug"`,
    * so any worker (or a re-run months later) regenerates the
    * IDENTICAL augmentation stream with no stored state and no RNG
    * — the same engine-bitwise md5 family that makes the decode
    * stubs oracle-checkable. The crop keeps `cropKeepPpm` of each
    * side and slides the window by a draw-derived fraction of the
    * slack; `rot_bucket ∈ {-1, 0, 1}` (90° steps). Exact integer
    * arithmetic end to end.
    *
    * Shape at scale: scan-stage only — an `explode` over the
    * epoch sequence (k rows per image) and per-row hashing; no
    * shuffle, no state.
    */
  def augmentationPlan(
      decoded: DataFrame,
      epochs: Int = 2,
      cropKeepPpm: Long = 900000L
  ): DataFrame = {
    require(epochs >= 1 && cropKeepPpm >= 1 && cropKeepPpm <= 1000000L,
      s"epochs/cropKeepPpm invalid: $epochs/$cropKeepPpm")
    decoded
      .filter(col("ok") && col("width") > 0 && col("height") > 0)
      .select(col("doc_id"), col("width").cast("long").as("width"),
        col("height").cast("long").as("height"))
      .withColumn("epoch",
        explode(sequence(lit(0), lit(epochs - 1))))
      .withColumn("draw", expr(
        """CAST(conv(substr(md5(concat(CAST(doc_id AS STRING), ':',
          CAST(epoch AS STRING), ':aug')), 1, 15), 16, 10)
          AS BIGINT)"""))
      .withColumn("hflip", expr("draw % 2 = 1"))
      .withColumn("off_x_ppm", expr("(draw div 2) % 1000001"))
      .withColumn("off_y_ppm",
        expr("(draw div 2 div 1000001) % 1000001"))
      .withColumn("rot_bucket",
        expr("CAST((draw div 2 div 1000001 div 1000001) % 3 - 1 AS INT)"))
      .withColumn("crop_w", expr(s"width * $cropKeepPpm div 1000000"))
      .withColumn("crop_h", expr(s"height * $cropKeepPpm div 1000000"))
      .withColumn("crop_x",
        expr("(width - crop_w) * off_x_ppm div 1000000"))
      .withColumn("crop_y",
        expr("(height - crop_h) * off_y_ppm div 1000000"))
      .select(col("doc_id"), col("epoch"), col("width"),
        col("height"), col("hflip"), col("crop_x"), col("crop_y"),
        col("crop_w"), col("crop_h"), col("rot_bucket"))
  }

  // === STUB ==========================================================
  /** Deterministic FAKE feature extractor: derives a `dim`-float
    * embedding from per-dimension MD5s of the payload (`payload:j` →
    * low 24 bits → unit interval). A real implementation would run an
    * encoder model per batch here; schema, batching, and everything
    * downstream (ANN/centroid/near-dup over the feature column) is
    * identical. MD5-based so the feature queries are oracle-checkable
    * (see [[md5_60]]).
    */
  def fakeFeatures(
      md: java.security.MessageDigest,
      payload: Array[Byte],
      dim: Int
  ): Array[Float] = {
    val out = new Array[Float](dim)
    var j = 0
    while (j < dim) {
      val salted =
        (if (payload == null) Array.emptyByteArray else payload) ++
          s":$j".getBytes("UTF-8")
      val h = md5_60(md, salted)
      out(j) = ((h % (1L << 24)).toDouble / (1L << 24).toDouble).toFloat
      j += 1
    }
    out
  }
  // === END STUB ======================================================

  /** Feature extraction per partition (the mapPartitions batch shape
    * a real encoder needs: model loaded once per partition, rows
    * streamed through). Output composes with Vector.* — here the
    * embedding column is the media feature vector.
    */
  def extractFeatures(docs: DataFrame, dim: Int = 16): DataFrame = {
    val out = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("feature", ArrayType(FloatType, containsNull = false))))
    val enc = org.apache.spark.sql.Encoders.row(out)
    withPayload(docs)
      .select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        // per-partition init (a real impl loads the encoder here)
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          Row(r.getLong(0),
            fakeFeatures(md, r.getAs[Array[Byte]]("payload"), dim).toSeq)
        }
      }(enc)
  }

  /** Paired-modality consistency gate — the LAION-400M curation rule
    * for (text, image) training pairs: embed both sides with their
    * respective encoders, keep pairs whose CROSS-MODAL cosine clears
    * `tau` (a mismatched caption scores like a random pair and is
    * dropped; LAION used CLIP similarity ≥ 0.3 at web scale). Inputs
    * are two `(doc_id, feature)` frames — here produced by the
    * [[extractFeatures]] stub encoder; a real CLIP text/image tower
    * pair drops in with the same columns. Emits EVERY joined pair
    * with its score and the keep verdict (`cross_cos`, `keep`) so the
    * gate is auditable; docs missing either modality emit no row
    * (there is no pair to train on). Zero-norm embeddings score NaN
    * and are kept=false — the semanticSignatures guard, explicit
    * because ANSI sessions would otherwise raise DIVIDE_BY_ZERO.
    *
    * Shape at scale: one doc_id equi-join + map-side arithmetic —
    * embeddings are model-output-sized rows, the join is the shuffle
    * a pairing fundamentally needs, and nothing is corpus-quadratic.
    */
  def pairConsistency(
      textEmb: DataFrame,
      imageEmb: DataFrame,
      tau: Double = 0.9
  ): DataFrame = {
    val t = textEmb.select(col("doc_id"), col("feature").as("t_emb"))
    val i = imageEmb.select(col("doc_id"), col("feature").as("i_emb"))
    t.join(i, "doc_id")
      .select(col("doc_id"),
        when(Vector.decNorm(col("t_emb")) === 0.0 ||
            Vector.decNorm(col("i_emb")) === 0.0, lit(Double.NaN))
          .otherwise(Vector.decDot(col("t_emb"), col("i_emb")) /
            (Vector.decNorm(col("t_emb")) *
              Vector.decNorm(col("i_emb"))))
          .as("cross_cos"))
      .select(col("doc_id"), col("cross_cos"),
        (!isnan(col("cross_cos")) && col("cross_cos") >= tau)
          .as("keep"))
  }

  /** 60-bit perceptual hash of the media payload — STUB: md5-derived
    * (the same deterministic stand-in contract as [[fakeDecode]]; a
    * real pHash — DCT of the decoded, downscaled image — drops in
    * with the same 60-bit column and everything downstream is
    * unchanged). Because the stub hashes raw bytes, only
    * byte-identical payloads collide at hamming 0; a real pHash
    * additionally lands *visually* similar payloads within small
    * hamming distance — which is exactly what [[mediaNearDup]]'s
    * banding is built to catch.
    */
  def mediaPhash(docs: DataFrame): DataFrame =
    withPayload(docs).select(col("doc_id"),
      conv(substring(md5(col("payload")), 1, 15), 16, 10)
        .cast("long").as("phash"))

  /** Media near-duplicate pairs at hamming ≤ `maxHamming` over the
    * perceptual hash — the image-dedup shape at 100 TB, identical
    * pigeonhole banding to [[graft.ops.Text.simhashNearDup]]: split
    * the 60-bit hash into `maxHamming + 1` bands; any pair within
    * the distance budget matches exactly on ≥ 1 band (pigeonhole),
    * so only same-band-bucket pairs are compared — EXACT by theorem,
    * never n².
    */
  def mediaNearDup(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val nBands = maxHamming + 1
    require(maxHamming >= 0 && 60 % nBands == 0,
      s"maxHamming + 1 = $nBands must divide the 60-bit hash")
    val bandBits = 60 / nBands
    val sigs = mediaPhash(docs)
    val banded = sigs.select(col("doc_id"), col("phash"),
      explode(array((0 until nBands).map(i => struct(
        lit(i).as("band"),
        shiftright(col("phash"), i * bandBits)
          .bitwiseAND(lit((1L << bandBits) - 1)).as("bits"))): _*))
        .as("bk"))
      .select(col("doc_id"), col("phash"),
        col("bk.band").as("band"), col("bk.bits").as("bits"))
    banded.as("l")
      .join(banded.as("r"),
        col("l.band") === col("r.band") &&
          col("l.bits") === col("r.bits") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        col("l.phash").as("ph_a"), col("r.phash").as("ph_b"))
      .distinct()
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("ph_a").bitwiseXOR(col("ph_b")))
          .cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Payload nibble entropy — a compressibility proxy for opaque
    * media bytes a pipeline can compute without decoding anything:
    * Shannon entropy over the payload's 16 hex-nibble frequencies
    * (max 4 bits/nibble — already-compressed media sits near it,
    * text/padding far below; the store-raw vs recompress routing
    * signal). Exact in the q20-ln convention: per doc, each nibble
    * count contributes `c·(⌊ln n⌋_q20 − ⌊ln c⌋_q20)`, every ln of an
    * INTEGER, summed exactly and emitted as entropy mass plus the
    * per-byte milli-bits rate (one IEEE-free integer div; ln2 scale
    * pinned as the q20 constant 726817). Map-side only.
    */
  def payloadEntropy(docs: DataFrame): DataFrame = {
    val ln2q20 = 726817L // floor(ln 2 * 2^20)
    def lnq20(c: Column): Column =
      floor(log(c.cast("double")) * (1L << 20)).cast("long")
    val nib = withPayload(docs)
      .select(col("doc_id"),
        explode(split(lower(hex(col("payload"))), "")).as("nib"))
      .filter(col("nib") =!= "")
      .groupBy(col("doc_id"), col("nib"))
      .agg(count(lit(1)).as("c"))
    val tot = nib.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("n_distinct"))
    nib.join(tot, "doc_id")
      .groupBy(col("doc_id"))
      .agg(max(col("n")).as("n_nibbles"),
        max(col("n_distinct")).as("n_distinct"),
        sum(col("c") * (lnq20(col("n")) - lnq20(col("c"))))
          .as("h_mass_q20"))
      .withColumn("bits_per_nibble_milli",
        expr(s"h_mass_q20 * 1000 div (n_nibbles * $ln2q20)"))
  }

  /** Hamming histogram over the banded candidate pairs — WHERE the
    * pHash similarity mass sits, the measurement behind placing
    * [[mediaNearDup]]'s `maxHamming` (the media twin of the vec
    * family's cosine histogram / tau-placement read): a threshold
    * inside the candidate bulk means the banding is doing the
    * filtering, not the threshold. Same pigeonhole band join as the
    * dedup op, NO hamming cap — every same-band pair counts once,
    * bucketed by its exact distance.
    */
  def hammingHistogram(docs: DataFrame, nBands: Int = 4): DataFrame = {
    require(nBands >= 1 && 60 % nBands == 0,
      s"nBands $nBands must divide the 60-bit hash")
    val bandBits = 60 / nBands
    val sigs = mediaPhash(docs)
    val banded = sigs.select(col("doc_id"), col("phash"),
      explode(array((0 until nBands).map(i => struct(
        lit(i).as("band"),
        shiftright(col("phash"), i * bandBits)
          .bitwiseAND(lit((1L << bandBits) - 1)).as("bits"))): _*))
        .as("bk"))
      .select(col("doc_id"), col("phash"),
        col("bk.band").as("band"), col("bk.bits").as("bits"))
    banded.as("l")
      .join(banded.as("r"),
        col("l.band") === col("r.band") &&
          col("l.bits") === col("r.bits") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"),
        col("l.phash").as("ph_a"), col("r.phash").as("ph_b"))
      .distinct()
      .select(bit_count(col("ph_a").bitwiseXOR(col("ph_b")))
        .cast("int").as("hamming"))
      .groupBy(col("hamming"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("hamming"))
  }

  /** Media dedup survivors — the component/survivor pass that
    * completes the multimodal dedup loop the text side already has
    * ([[graft.ops.Text.dupClusters]] →
    * [[graft.ops.Text.dupClusterSurvivors]]): connected components
    * over the [[mediaNearDup]] pair graph (pointer-jumped min-label
    * propagation, shared implementation), then ONE max-struct
    * aggregation per cluster keeping the LARGEST payload (the
    * best-resolution proxy a byte-opaque pipeline has; a real decode
    * would rank on width×height through the same struct), ties to
    * the lowest doc_id. Singletons survive as their own cluster, so
    * the output is the full post-dedup media corpus manifest.
    */
  /** Storage-reclaim estimate of media dedup — the capacity-planning
    * number that decides whether the dedup pipeline is worth running
    * on a store: one summary row with total corpus bytes, bytes
    * reclaimable by EXACT dedup alone (identical payloads — free, a
    * hash rollup), bytes reclaimable by the full near-dup cluster
    * pass (keep the largest member per cluster, the
    * [[mediaDupSurvivors]] convention), and the exact ppm of the
    * store that near-dedup reclaims. Exact ≤ near by construction
    * (identical payloads are hamming-0 pairs). Same banded pair
    * graph + component pass as the survivors op, plus two
    * count-sized rollups — nothing new shuffles at scale.
    */
  def dedupSavings(
      docs: DataFrame,
      maxHamming: Int = 3,
      precomputedClusters: Option[DataFrame] = None
  ): DataFrame = {
    val bytes = withPayload(docs).select(col("doc_id"),
      length(col("payload")).cast("long").as("n_bytes"),
      md5(col("payload")).as("pm"))
    // r18 optimization: the banded pair graph + component pass is
    // shared with [[mediaDupSurvivors]] over the same corpus —
    // callers memoize ONE cluster assignment per session (the
    // cache:mm:dup_clusters bench line) instead of each query
    // re-running banding + iteration
    val perCluster = precomputedClusters
      .getOrElse(Text.dupClusters(docs,
        mediaNearDup(docs, maxHamming)
          .select(col("doc_a"), col("doc_b"))))
      .join(bytes, "doc_id")
      .groupBy(col("cluster"))
      .agg(sum(col("n_bytes")).as("__cb"),
        max(col("n_bytes")).as("__best"),
        count(lit(1)).as("__n"))
    val near = perCluster.agg(
      count(lit(1)).as("n_clusters"),
      sum(col("__n") - 1).cast("long").as("n_dropped"),
      sum(col("__cb") - col("__best")).cast("long")
        .as("neardup_reclaim_bytes"))
    val exact = bytes.groupBy(col("pm"), col("n_bytes"))
      .agg(count(lit(1)).as("__c"))
      .agg(sum((col("__c") - 1) * col("n_bytes")).cast("long")
        .as("exact_reclaim_bytes"))
    bytes.agg(count(lit(1)).as("n_docs"),
        sum(col("n_bytes")).cast("long").as("total_bytes"))
      .crossJoin(broadcast(exact))
      .crossJoin(broadcast(near))
      .select(col("n_docs"), col("total_bytes"), col("n_clusters"),
        col("n_dropped"), col("exact_reclaim_bytes"),
        col("neardup_reclaim_bytes"),
        expr("neardup_reclaim_bytes * 1000000 div total_bytes")
          .as("reclaim_ppm"))
  }

  def mediaDupSurvivors(
      docs: DataFrame,
      maxHamming: Int = 3,
      precomputedClusters: Option[DataFrame] = None
  ): DataFrame = {
    val clusters = precomputedClusters
      .getOrElse(Text.dupClusters(docs,
        mediaNearDup(docs, maxHamming)
          .select(col("doc_a"), col("doc_b"))))
    val bytes = withPayload(docs).select(col("doc_id"),
      length(col("payload")).cast("long").as("n_bytes"))
    clusters
      .join(bytes, "doc_id")
      .groupBy(col("cluster"))
      .agg(
        max(struct(col("n_bytes"), (-col("doc_id")).as("neg_id")))
          .as("__best"),
        count(lit(1)).as("n_members"))
      .select(col("cluster"),
        (-col("__best.neg_id")).cast("long").as("survivor_doc_id"),
        col("__best.n_bytes").as("best_bytes"),
        col("n_members"),
        (col("n_members") - 1).as("n_dropped"))
  }
}
