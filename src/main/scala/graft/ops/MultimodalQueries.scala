package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Registry for multimodal plumbing. All four queries are
  * oracle-checked: the stubs derive their fake outputs from MD5
  * (portable — `('0x'||substr(md5(x),1,15))::BIGINT` in DuckDB
  * equals `Multimodal.md5_60` bit-for-bit), so even the
  * mapPartitions decode/encode paths have exact SQL twins.
  */
object MultimodalQueries {

  /** Shared oracle fragment: the decoded-metadata twin of
    * `Multimodal.decodeMeta` (md5-derived fake codec output).
    */
  private val decodedCte =
    """decoded AS (
      |  SELECT doc_id,
      |    CASE h % 4 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      |      WHEN 2 THEN 'video' ELSE 'text' END AS media_type,
      |    CAST((h // 4) % 1920 + 1 AS INT) AS width,
      |    CAST((h // 4096) % 1080 + 1 AS INT) AS height,
      |    CAST((h // 4194304) % 300 + 1 AS INT) AS n_frames
      |  FROM (SELECT doc_id,
      |          CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS h
      |        FROM documents WHERE text IS NOT NULL AND text <> ''))"""
      .stripMargin

  type Q = (SparkSession, String) => DataFrame

  /** The planted-clone corpus three mm queries share (every 100th
    * doc re-added under a shifted id — see q_mm_phash_neardup's
    * rationale).
    */
  private def plantedDocs(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    docs.unionByName(docs.filter(col("doc_id") % 100 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000L))
  }

  /** Session-shared pHash near-dup pair graph over the planted
    * corpus (r18): q_mm_phash_neardup projects it and the
    * survivors/savings pair consume its components — before r18
    * each of the three re-ran banding + verify (~0.5 s apiece) and
    * the two component consumers each re-ran the dupClusters
    * iteration (~1 s apiece). Attributed as its own `cache:mm:*`
    * bench line (the text/vec sharedCacheBuilders pattern).
    */
  private[ops] def phashPairsDf(s: SparkSession, d: String): DataFrame =
    graft.Caches.persisted("mm", ("phash_pairs", s, d))(
      Multimodal.mediaNearDup(plantedDocs(s, d), maxHamming = 3))

  /** Session-shared component assignment over [[phashPairsDf]]. */
  private[ops] def dupClustersDf(s: SparkSession, d: String): DataFrame =
    graft.Caches.persisted("mm", ("dup_clusters", s, d))(
      graft.ops.Text.dupClusters(plantedDocs(s, d),
        phashPairsDf(s, d).select(col("doc_a"), col("doc_b")),
        cacheFamily = "mm"))

  val sharedCacheBuilders: Seq[(String, Q)] = Seq(
    "cache:mm:phash_pairs" -> ((s, d) => phashPairsDf(s, d)),
    "cache:mm:dup_clusters" -> ((s, d) => dupClustersDf(s, d))
  )

  val queries: Map[String, Q] = Map(
    "q_mm_payload_stats" -> ((s, d) =>
      Multimodal.payloadStats(Tables.documents(s, d))
        .orderBy(col("doc_id"))),
    "q_mm_decode_meta" -> ((s, d) =>
      Multimodal.frameSamplePlan(
        Multimodal.decodeMeta(Tables.documents(s, d)))
        .orderBy(col("doc_id"))),
    "q_mm_resize_plan" -> ((s, d) =>
      Multimodal.resizePlan(
        Multimodal.decodeMeta(Tables.documents(s, d)))
        .orderBy(col("doc_id"))),
    // deterministic per-epoch augmentation schedule from md5-60
    // draws: any worker regenerates the identical stream statelessly
    "q_mm_augment_plan" -> ((s, d) =>
      Multimodal.augmentationPlan(
        Multimodal.decodeMeta(Tables.documents(s, d)), epochs = 2)
        .orderBy(col("doc_id"), col("epoch"))),
    // per-source modality composition with exact ppm shares
    "q_mm_modality_mix" -> ((s, d) =>
      Multimodal.modalityMix(Tables.documents(s, d))),
    // Whisper-style 30s/5s-overlap audio window plan from decoded
    // durations — integer arithmetic, one Generate per payload
    "q_mm_audio_chunks" -> ((s, d) =>
      Multimodal.audioChunkPlan(
        Multimodal.decodeMeta(Tables.documents(s, d)))),
    // per-frame uniform sampling plan for video payloads (<= 32
    // frames/clip, exact integer spread with both endpoints)
    "q_mm_frame_sample" -> ((s, d) =>
      Multimodal.frameSampleIndices(
        Multimodal.decodeMeta(Tables.documents(s, d)))
        .orderBy(col("doc_id"), col("frame_pos"))),
    // aspect-ratio bucketed batch plan: ladder assignment by exact
    // ppm aspect distance, per-bucket batch counts + tail fill
    "q_mm_aspect_buckets" -> ((s, d) =>
      Multimodal.aspectBucketPlan(
        Multimodal.decodeMeta(Tables.documents(s, d)),
        batchSize = 64)),
    // feature extraction composed with vector math: per-media-feature
    // L2 norm (stubbed encoder; plumbing + composition under test)
    "q_mm_feature_norms" -> ((s, d) =>
      Multimodal.extractFeatures(Tables.documents(s, d))
        .select(col("doc_id"),
          Vector.decNorm(col("feature")).as("l2_norm"))
        .orderBy(col("doc_id"))),
    // paired-modality consistency gate (CLIP-score-style filter):
    // text tower = stub encoder over the doc text; image tower = stub
    // encoder over the doc's image bytes — stood in by the text, with
    // a deterministic slice of captions MISMATCHED (prefixed payload
    // ⇒ an unrelated embedding, scores like a random pair ≈ 0.75 for
    // all-positive stub features, well under τ = 0.9) and another
    // slice with no image at all (no pair → no row)
    "q_mm_pair_filter" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val imgDocs = docs.filter(col("doc_id") % 31 =!= 7)
        .select(col("doc_id"),
          when(col("doc_id") % 9 === 4,
            concat(lit("mismatched:"), col("text")))
            .otherwise(col("text")).as("text"))
      Multimodal.pairConsistency(
        Multimodal.extractFeatures(docs),
        Multimodal.extractFeatures(imgDocs), tau = 0.9)
        .orderBy(col("doc_id"))
    }),
    // perceptual-hash media near-dup: pigeonhole banding is exact, so
    // the brute-force n² hamming twin is the oracle (same contract as
    // q_text_simhash_neardup). The testdata has no byte-identical
    // payloads, so the query plants a deterministic duplicated slice
    // (every 100th doc re-added under a shifted id) on BOTH sides —
    // an empty result would make the green row vacuous
    "q_mm_phash_neardup" -> ((s, d) =>
      phashPairsDf(s, d).orderBy(col("doc_a"), col("doc_b"))),
    // payload nibble entropy: decode-free compressibility proxy,
    // exact q20-ln mass + milli-bits per nibble
    "q_mm_payload_entropy" -> ((s, d) =>
      Multimodal.payloadEntropy(Tables.documents(s, d))
        .orderBy(col("doc_id"))),
    // hamming histogram over the banded candidates: where the pHash
    // similarity mass sits (the maxHamming-placement read)
    "q_mm_hamming_histogram" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val planted = docs.filter(col("doc_id") % 100 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L)
      Multimodal.hammingHistogram(docs.unionByName(planted))
    }),
    // the component/survivor pass over the same planted-clone corpus
    // (r13 verdict item 8): phash pair graph → connected components
    // → keep the largest payload per cluster (ties lowest doc_id) —
    // the multimodal twin of q_text_cluster_survivors
    "q_mm_dup_survivors" -> ((s, d) =>
      Multimodal.mediaDupSurvivors(plantedDocs(s, d),
        maxHamming = 3,
        precomputedClusters = Some(dupClustersDf(s, d)))
        .orderBy(col("cluster"))),
    // content sniffing over planted ASCII magic prefixes (%PDF /
    // GIF8 / RIFF on doc_id%4 = 1/2/3) — counts, byte mass, ppm mix
    "q_mm_magic_sniff" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val planted = docs.withColumn("text",
        concat(
          when(pmod(col("doc_id"), lit(4L)) === 1, lit("%PDF"))
            .when(pmod(col("doc_id"), lit(4L)) === 2, lit("GIF8"))
            .when(pmod(col("doc_id"), lit(4L)) === 3, lit("RIFF"))
            .otherwise(lit("")),
          col("text")))
      Multimodal.magicSniff(planted).orderBy(col("sniffed_type"))
    }),
    // capacity-planning rollup of the same planted-clone corpus:
    // exact-dedup reclaim vs full near-dup-cluster reclaim in bytes
    // and exact ppm of the store
    "q_mm_dedup_savings" -> ((s, d) =>
      Multimodal.dedupSavings(plantedDocs(s, d),
        maxHamming = 3,
        precomputedClusters = Some(dupClustersDf(s, d))))
  )

  val oracle: Map[String, String] = Map(
    "q_mm_phash_neardup" ->
      """WITH d AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents
        |  WHERE doc_id % 100 = 0),
        |p AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT)
        |      AS phash
        |  FROM d)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
        |FROM p a JOIN p b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.phash, b.phash)) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin,
    // per-nibble counts -> exact q20-ln entropy mass; ln2 pinned as
    // the q20 constant 726817
    "q_mm_payload_entropy" ->
      """WITH hx AS (
        |  SELECT doc_id, lower(hex(encode(text))) AS h
        |  FROM documents),
        |pos AS (
        |  SELECT doc_id, UNNEST(range(1, length(h) + 1)) AS i, h
        |  FROM hx),
        |cnt AS (
        |  SELECT doc_id, substr(h, i, 1) AS nib,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM pos GROUP BY 1, 2),
        |tot AS (
        |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
        |    CAST(COUNT(*) AS BIGINT) AS n_distinct
        |  FROM cnt GROUP BY 1)
        |SELECT t.doc_id, t.n AS n_nibbles, t.n_distinct,
        |  CAST(SUM(c.c * (CAST(FLOOR(ln(t.n) * 1048576) AS BIGINT)
        |    - CAST(FLOOR(ln(c.c) * 1048576) AS BIGINT))) AS BIGINT)
        |    AS h_mass_q20,
        |  CAST(SUM(c.c * (CAST(FLOOR(ln(t.n) * 1048576) AS BIGINT)
        |    - CAST(FLOOR(ln(c.c) * 1048576) AS BIGINT))) AS BIGINT)
        |    * 1000 // (t.n * 726817) AS bits_per_nibble_milli
        |FROM cnt c JOIN tot t USING (doc_id)
        |GROUP BY t.doc_id, t.n, t.n_distinct
        |ORDER BY t.doc_id""".stripMargin,
    // banded candidates spelled as the 4-band OR; exact hamming
    "q_mm_hamming_histogram" ->
      """WITH d AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents
        |  WHERE doc_id % 100 = 0),
        |p AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT)
        |      AS phash
        |  FROM d)
        |SELECT CAST(bit_count(xor(a.phash, b.phash)) AS INT)
        |    AS hamming,
        |  CAST(COUNT(*) AS BIGINT) AS n_pairs
        |FROM p a JOIN p b ON a.doc_id < b.doc_id
        |WHERE ((a.phash >> 0) & 32767) = ((b.phash >> 0) & 32767)
        |   OR ((a.phash >> 15) & 32767) = ((b.phash >> 15) & 32767)
        |   OR ((a.phash >> 30) & 32767) = ((b.phash >> 30) & 32767)
        |   OR ((a.phash >> 45) & 32767) = ((b.phash >> 45) & 32767)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // components over the phash pair graph (min reachable doc_id,
    // the q_text_dup_clusters recursion) + largest-payload survivor
    "q_mm_dup_survivors" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents
        |  WHERE doc_id % 100 = 0),
        |p AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT)
        |      AS phash
        |  FROM d),
        |pr AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM p a JOIN p b ON a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.phash, b.phash)) <= 3),
        |e AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pr
        |  UNION ALL SELECT doc_b, doc_a FROM pr),
        |reach(doc_id, r) AS (
        |  SELECT doc_id, doc_id FROM d
        |  UNION
        |  SELECT reach.doc_id, e.dst
        |  FROM reach JOIN e ON reach.r = e.src),
        |cl AS (SELECT doc_id, MIN(r) AS cluster
        |       FROM reach GROUP BY doc_id),
        |b AS (SELECT doc_id,
        |        CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |      FROM d),
        |s AS (SELECT cl.cluster, b.n_bytes, b.doc_id
        |      FROM cl JOIN b USING (doc_id)),
        |g AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_members
        |      FROM s GROUP BY cluster),
        |w AS (SELECT cluster, doc_id AS survivor_doc_id,
        |        n_bytes AS best_bytes,
        |        ROW_NUMBER() OVER (PARTITION BY cluster
        |          ORDER BY n_bytes DESC, doc_id) AS rk
        |      FROM s)
        |SELECT w.cluster, w.survivor_doc_id, w.best_bytes,
        |  g.n_members, g.n_members - 1 AS n_dropped
        |FROM w JOIN g USING (cluster) WHERE w.rk = 1
        |ORDER BY cluster""".stripMargin,
    // same planted prefixes; hex-prefix CASE mirrors the when-chain
    "q_mm_magic_sniff" ->
      """WITH d AS (
        |  SELECT CASE WHEN doc_id % 4 = 1 THEN '%PDF'
        |    WHEN doc_id % 4 = 2 THEN 'GIF8'
        |    WHEN doc_id % 4 = 3 THEN 'RIFF'
        |    ELSE '' END || text AS text
        |  FROM documents),
        |s2 AS (
        |  SELECT lower(substr(hex(encode(text)), 1, 8)) AS hx,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |  FROM d),
        |k AS (
        |  SELECT CASE WHEN hx LIKE 'ffd8ff%' THEN 'jpeg'
        |    WHEN hx LIKE '89504e47%' THEN 'png'
        |    WHEN hx LIKE '52494646%' THEN 'riff'
        |    WHEN hx LIKE '474946%' THEN 'gif'
        |    WHEN hx LIKE '25504446%' THEN 'pdf'
        |    ELSE 'unknown' END AS sniffed_type, n_bytes
        |  FROM s2),
        |r AS (
        |  SELECT sniffed_type, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(n_bytes) AS BIGINT) AS total_bytes
        |  FROM k GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS al FROM r)
        |SELECT sniffed_type, n_docs, total_bytes,
        |  n_docs * 1000000 // t.al AS share_ppm
        |FROM r, t ORDER BY sniffed_type""".stripMargin,
    // survivors CTE stack + two count-sized rollups: exact reclaim
    // from the identical-payload groups, near reclaim from keeping
    // the largest member per component
    "q_mm_dedup_savings" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents
        |  WHERE doc_id % 100 = 0),
        |p AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT)
        |      AS phash
        |  FROM d),
        |pr AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM p a JOIN p b ON a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.phash, b.phash)) <= 3),
        |e AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pr
        |  UNION ALL SELECT doc_b, doc_a FROM pr),
        |reach(doc_id, r) AS (
        |  SELECT doc_id, doc_id FROM d
        |  UNION
        |  SELECT reach.doc_id, e.dst
        |  FROM reach JOIN e ON reach.r = e.src),
        |cl AS (SELECT doc_id, MIN(r) AS cluster
        |       FROM reach GROUP BY doc_id),
        |b AS (SELECT doc_id,
        |        CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |        md5(text) AS pm
        |      FROM d),
        |g AS (SELECT cl.cluster,
        |        CAST(SUM(b.n_bytes) AS BIGINT) AS cb,
        |        CAST(MAX(b.n_bytes) AS BIGINT) AS best,
        |        CAST(COUNT(*) AS BIGINT) AS n
        |      FROM cl JOIN b USING (doc_id) GROUP BY cl.cluster),
        |nr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_clusters,
        |         CAST(SUM(n - 1) AS BIGINT) AS n_dropped,
        |         CAST(SUM(cb - best) AS BIGINT)
        |           AS neardup_reclaim_bytes
        |       FROM g),
        |ex AS (SELECT CAST(SUM((c - 1) * n_bytes) AS BIGINT)
        |         AS exact_reclaim_bytes
        |       FROM (SELECT pm, n_bytes,
        |               CAST(COUNT(*) AS BIGINT) AS c
        |             FROM b GROUP BY pm, n_bytes)),
        |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |        CAST(SUM(n_bytes) AS BIGINT) AS total_bytes
        |      FROM b)
        |SELECT t.n_docs, t.total_bytes, nr.n_clusters, nr.n_dropped,
        |  ex.exact_reclaim_bytes, nr.neardup_reclaim_bytes,
        |  nr.neardup_reclaim_bytes * 1000000 // t.total_bytes
        |    AS reclaim_ppm
        |FROM t, nr, ex""".stripMargin,
    "q_mm_payload_stats" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |  md5(text) AS payload_md5,
        |  lower(substring(hex(encode(text)), 1, 8)) AS head_hex
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_mm_audio_chunks" ->
      s"""WITH $decodedCte,
         |a AS (
         |  SELECT doc_id, CAST(n_frames AS BIGINT) AS duration_s
         |  FROM decoded WHERE media_type = 'audio'),
         |c AS (
         |  SELECT doc_id, duration_s,
         |    UNNEST(generate_series(0,
         |      GREATEST((duration_s - 1) // 25, 0))) AS chunk_idx
         |  FROM a)
         |SELECT doc_id, duration_s, chunk_idx,
         |  chunk_idx * 25 AS start_s,
         |  LEAST(chunk_idx * 25 + 30, duration_s) AS end_s
         |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    "q_mm_modality_mix" ->
      s"""WITH $decodedCte,
         |j AS (
         |  SELECT d2.source, dec.media_type
         |  FROM decoded dec JOIN documents d2 USING (doc_id)),
         |a AS (
         |  SELECT source, media_type, COUNT(*) AS n_docs
         |  FROM j GROUP BY 1, 2),
         |t AS (
         |  SELECT source, CAST(SUM(n_docs) AS BIGINT) AS src_total
         |  FROM a GROUP BY 1)
         |SELECT a.source, a.media_type, a.n_docs, t.src_total,
         |  a.n_docs * 1000000 // t.src_total AS share_ppm
         |FROM a JOIN t USING (source)
         |ORDER BY source, media_type""".stripMargin,
    "q_mm_decode_meta" ->
      s"""WITH $decodedCte
         |SELECT doc_id, media_type, width, height,
         |  CAST(width AS DOUBLE) / height AS aspect,
         |  LEAST(n_frames, 32) AS frames_to_sample
         |FROM decoded WHERE media_type IN ('image', 'video')
         |ORDER BY doc_id""".stripMargin,
    "q_mm_frame_sample" ->
      s"""WITH $decodedCte,
         |v AS (
         |  SELECT doc_id, CAST(n_frames AS BIGINT) AS n_frames,
         |    LEAST(CAST(n_frames AS BIGINT), 32) AS frames_sampled
         |  FROM decoded WHERE media_type = 'video'),
         |e AS (
         |  SELECT doc_id, n_frames, frames_sampled,
         |    UNNEST(generate_series(0, frames_sampled - 1))
         |      AS frame_pos
         |  FROM v)
         |SELECT doc_id, n_frames, frames_sampled, frame_pos,
         |  (frame_pos * (n_frames - 1))
         |    // GREATEST(frames_sampled - 1, 1) AS frame_idx,
         |  (frame_pos * (n_frames - 1))
         |    // GREATEST(frames_sampled - 1, 1) * 1000000
         |    // n_frames AS pos_ppm
         |FROM e ORDER BY doc_id, frame_pos""".stripMargin,
    "q_mm_aspect_buckets" -> {
      val ladderSql = Multimodal.aspectLadder()
        .map { case (w, h) => s"($w, $h)" }.mkString(", ")
      s"""WITH $decodedCte,
         |l(bw, bh) AS (VALUES $ladderSql),
         |a AS (
         |  SELECT doc_id, CAST(width AS BIGINT) AS w,
         |    CAST(height AS BIGINT) AS h
         |  FROM decoded WHERE media_type IN ('image', 'video')),
         |sc AS (
         |  SELECT doc_id, bw, bh,
         |    ABS(w * bh - h * bw) * 1000000 // (h * bh) AS dist_ppm
         |  FROM a CROSS JOIN l),
         |pk AS (
         |  SELECT doc_id, bw, bh, dist_ppm,
         |    ROW_NUMBER() OVER (PARTITION BY doc_id
         |      ORDER BY dist_ppm, bw, bh) AS rk
         |  FROM sc),
         |g AS (
         |  SELECT bw, bh, COUNT(*) AS n_media,
         |    CAST(MAX(dist_ppm) AS BIGINT) AS max_dist_ppm
         |  FROM pk WHERE rk = 1 GROUP BY 1, 2)
         |SELECT bw, bh,
         |  CAST(bw AS BIGINT) * 1000000 // bh AS aspect_ppm,
         |  n_media,
         |  (n_media + 63) // 64 AS n_batches,
         |  (n_media - ((n_media + 63) // 64 - 1) * 64) * 1000000
         |    // 64 AS last_fill_ppm,
         |  max_dist_ppm
         |FROM g ORDER BY bw, bh""".stripMargin
    },
    "q_mm_resize_plan" ->
      s"""WITH $decodedCte,
         |s AS (
         |  SELECT doc_id, width, height,
         |    LEAST(336.0 / width, 336.0 / height) AS scale
         |  FROM decoded)
         |SELECT doc_id, width, height, scale,
         |  CAST(ceil(width * scale) AS INT) AS out_w,
         |  CAST(ceil(height * scale) AS INT) AS out_h
         |FROM s ORDER BY doc_id""".stripMargin,
    "q_mm_augment_plan" ->
      s"""WITH $decodedCte,
         |e AS (
         |  SELECT d.doc_id, CAST(d.width AS BIGINT) AS width,
         |    CAST(d.height AS BIGINT) AS height,
         |    CAST(UNNEST(generate_series(0, 1)) AS INT) AS epoch
         |  FROM decoded d),
         |dr AS (
         |  SELECT *, CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
         |    || ':' || CAST(epoch AS VARCHAR) || ':aug'), 1, 15))
         |    AS BIGINT) AS draw
         |  FROM e),
         |p AS (
         |  SELECT *, draw % 2 = 1 AS hflip,
         |    (draw // 2) % 1000001 AS off_x_ppm,
         |    (draw // 2 // 1000001) % 1000001 AS off_y_ppm,
         |    CAST((draw // 2 // 1000001 // 1000001) % 3 - 1 AS INT)
         |      AS rot_bucket,
         |    width * 900000 // 1000000 AS crop_w,
         |    height * 900000 // 1000000 AS crop_h
         |  FROM dr)
         |SELECT doc_id, epoch, width, height, hflip,
         |  (width - crop_w) * off_x_ppm // 1000000 AS crop_x,
         |  (height - crop_h) * off_y_ppm // 1000000 AS crop_y,
         |  crop_w, crop_h, rot_bucket
         |FROM p ORDER BY doc_id, epoch""".stripMargin,
    "q_mm_pair_filter" ->
      """WITH im AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 9 = 4 THEN 'mismatched:' || text
        |         ELSE text END AS itext
        |  FROM documents WHERE doc_id % 31 <> 7),
        |f AS (
        |  SELECT d.doc_id, t.j,
        |    CAST(CAST(CAST(('0x' || substr(
        |        md5(d.text || ':' || CAST(t.j AS VARCHAR)), 1, 15))
        |        AS BIGINT) % 16777216 AS DOUBLE) / 16777216.0 AS REAL)
        |      AS x,
        |    CAST(CAST(CAST(('0x' || substr(
        |        md5(im.itext || ':' || CAST(t.j AS VARCHAR)), 1, 15))
        |        AS BIGINT) % 16777216 AS DOUBLE) / 16777216.0 AS REAL)
        |      AS y
        |  FROM documents d JOIN im USING (doc_id),
        |       generate_series(0, 15) AS t(j)),
        |c AS (
        |  -- ordered SUMs pin every fp fold to dimension order (the
        |  -- q_mm_feature_norms contract)
        |  SELECT doc_id,
        |    SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) ORDER BY j)
        |      AS dot,
        |    sqrt(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
        |             ORDER BY j)) AS nx,
        |    sqrt(SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)
        |             ORDER BY j)) AS ny
        |  FROM f GROUP BY doc_id)
        |SELECT doc_id, dot / (nx * ny) AS cross_cos,
        |  dot / (nx * ny) >= 0.9 AS keep
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_mm_feature_norms" ->
      """WITH f AS (
        |  SELECT d.doc_id,
        |    list(CAST(CAST(CAST(('0x' || substr(
        |        md5(d.text || ':' || CAST(t.j AS VARCHAR)), 1, 15))
        |        AS BIGINT) % 16777216 AS DOUBLE) / 16777216.0 AS REAL)
        |      ORDER BY t.j) AS feature
        |  FROM documents d, generate_series(0, 15) AS t(j)
        |  GROUP BY d.doc_id)
        |SELECT doc_id,
        |  -- ordered SUM pins the fp fold to list order (Spark's
        |  -- decNorm folds in list order; arrival order is luck)
        |  sqrt(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
        |           ORDER BY i)) AS l2_norm
        |FROM (SELECT doc_id,
        |        CAST(generate_subscripts(feature, 1) AS INT) AS i,
        |        UNNEST(feature) AS x FROM f)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
