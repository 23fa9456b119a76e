package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal

/** Multimodal plumbing: binary payloads, partition-wise decode stub,
  * curation projection.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "hello world"), (2L, ""), (3L, "another doc")
  ).toDF("doc_id", "text")

  test("payload stats reflect utf-8 bytes") {
    val m = Multimodal.payloadStats(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n_bytes")).toMap
    assert(m == Map(1L -> 11, 2L -> 0, 3L -> 11))
  }

  test("md5_60 equals the oracle's ('0x'||substr(md5,1,15))::BIGINT") {
    val md = java.security.MessageDigest.getInstance("MD5")
    // md5('hello') = 5d41402abc4b2a76... → 0x5d41402abc4b2a7
    assert(Multimodal.md5_60(md, "hello".getBytes("UTF-8")) ==
      419982666956583591L)
    assert(Multimodal.md5_60(md, "hello".getBytes("UTF-8")) ==
      java.lang.Long.parseLong("5d41402abc4b2a7", 16))
  }

  test("decode stub is deterministic and total") {
    val a = Multimodal.decodeMeta(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("media_type"), r.getAs[Int]("width"))).toMap
    val b = Multimodal.decodeMeta(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("media_type"), r.getAs[Int]("width"))).toMap
    assert(a == b)
    assert(a(2L)._1 == "unknown")    // empty payload → ok=false path
    assert(a(1L)._2 >= 1)
  }

  test("frame-sample plan keeps only decodable visual media") {
    val out = Multimodal.frameSamplePlan(Multimodal.decodeMeta(docs))
    assert(out.columns.contains("aspect"))
    out.collect().foreach { r =>
      assert(Set("image", "video")(r.getAs[String]("media_type")))
      assert(r.getAs[Int]("frames_to_sample") <= 32)
    }
  }

  test("resize plan fits target tile preserving aspect") {
    Multimodal.resizePlan(Multimodal.decodeMeta(docs), target = 336)
      .collect().foreach { r =>
        val (w, h) = (r.getAs[Int]("out_w"), r.getAs[Int]("out_h"))
        assert(w <= 336 && h <= 336)
        assert(w == 336 || h == 336)   // scale-to-fit touches one edge
      }
  }

  test("feature stub: deterministic, fixed dim, composes with norms") {
    val f1 = Multimodal.extractFeatures(docs, dim = 16).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val f2 = Multimodal.extractFeatures(docs, dim = 16).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(f1 == f2)
    assert(f1.values.forall(_.length == 16))
    assert(f1(1L) != f1(3L))   // different payloads → different features
    val norms = Multimodal.extractFeatures(docs, dim = 16)
      .select(col("doc_id"),
        graft.ops.Vector.decNorm(col("feature")).as("n"))
      .collect().map(_.getDouble(1))
    assert(norms.forall(n => n > 0 && n < 4.0))   // 16 floats in [0,1)
  }

  test("pairConsistency keeps matched pairs, drops planted mismatches, " +
      "skips missing modalities, flags zero norms") {
    val t = Seq(
      (1L, Seq(1.0f, 0.0f)),      // matched: identical image emb
      (2L, Seq(1.0f, 0.0f)),      // mismatched: orthogonal image emb
      (3L, Seq(1.0f, 1.0f)),      // no image side → no row
      (4L, Seq(0.0f, 0.0f)),      // zero norm → NaN, keep = false
      (5L, Seq(3.0f, 4.0f))       // matched up to scale → cos = 1
    ).toDF("doc_id", "feature")
    val i = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f)),
      (4L, Seq(1.0f, 0.0f)),
      (5L, Seq(6.0f, 8.0f)),
      (9L, Seq(1.0f, 0.0f))       // no text side → no row
    ).toDF("doc_id", "feature")
    val got = graft.ops.Multimodal.pairConsistency(t, i, tau = 0.9)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("cross_cos"), r.getAs[Boolean]("keep"))))
      .toMap
    assert(got.keySet == Set(1L, 2L, 4L, 5L))
    assert(got(1L) == ((1.0, true)))
    assert(got(2L) == ((0.0, false)))
    assert(got(4L)._1.isNaN && !got(4L)._2)
    assert(math.abs(got(5L)._1 - 1.0) < 1e-12 && got(5L)._2)
    // end-to-end through the stub encoders: a mismatched payload on
    // the image side scores like a random pair (all-positive stub
    // features concentrate near 0.75) and is dropped at τ = 0.9
    val matchedT = Multimodal.extractFeatures(docs, dim = 16)
    val mismatchedI = Multimodal.extractFeatures(
      docs.select(col("doc_id"),
        when(col("doc_id") === 3L, concat(lit("mismatched:"), col("text")))
          .otherwise(col("text")).as("text")), dim = 16)
    val e2e = graft.ops.Multimodal
      .pairConsistency(matchedT, mismatchedI, tau = 0.9).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep"))
      .toMap
    assert(e2e(1L) && !e2e(3L))
  }

  test("media near-dup: identical payloads pair at hamming 0, " +
      "banding equals brute force, distance budget respected") {
    val d = Seq(
      (1L, "same bytes"), (2L, "same bytes"),   // exact dup pair
      (3L, "other doc"), (4L, "third thing"),
      (5L, "same bytes")                         // dup of 1 and 2
    ).toDF("doc_id", "text")
    val banded = Multimodal.mediaNearDup(d, maxHamming = 3).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Int]("hamming")))
    // brute-force twin over the same hashes
    val ph = Multimodal.mediaPhash(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("phash")).toMap
    val brute = for {
      a <- ph.keys.toSeq; b <- ph.keys.toSeq if a < b
      h = java.lang.Long.bitCount(ph(a) ^ ph(b)) if h <= 3
    } yield (a, b, h)
    assert(banded.toSet == brute.toSet)
    assert(banded.map(p => (p._1, p._2)).toSet ==
      Set((1L, 2L), (1L, 5L), (2L, 5L)))
    assert(banded.forall(_._3 == 0))
  }

  test("audioChunkPlan: full coverage, fixed overlap, tail clipped") {
    import spark.implicits._
    // 70 s → chunks at 0, 25, 50: [0,30] [25,55] [50,70]
    val decoded = Seq(
      (1L, "audio", 0, 0, 70, true),
      (2L, "audio", 0, 0, 10, true),  // shorter than one window
      (3L, "video", 0, 0, 99, true)   // not audio → no rows
    ).toDF("doc_id", "media_type", "width", "height", "n_frames",
      "ok")
    val out = Multimodal.audioChunkPlan(decoded).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4))).toList
    assert(out === List(
      (1L, 0L, 0L, 30L), (1L, 1L, 25L, 55L), (1L, 2L, 50L, 70L),
      (2L, 0L, 0L, 10L)))
  }

  test("modalityMix: per-source counts partition the decoded docs, shares sum to ~1e6") {
    import spark.implicits._
    val docs = (1L to 40L).map(i =>
      (i, s"doc body number $i with payload", if (i <= 25) "web"
       else "books")).toDF("doc_id", "text", "source")
    val out = Multimodal.modalityMix(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(4)))
    // counts partition each source's decoded docs exactly
    assert(out.filter(_._1 == "web").map(_._3).sum == 25L)
    assert(out.filter(_._1 == "books").map(_._3).sum == 15L)
    // ppm shares sum to 1e6 up to one floor unit per modality row
    Seq("web", "books").foreach { src =>
      val rows = out.filter(_._1 == src)
      val tot = rows.map(_._4).sum
      assert(tot <= 1000000L && tot > 1000000L - rows.length,
        s"$src shares=$tot")
    }
    // deterministic: same input, same mix
    assert(Multimodal.modalityMix(docs).collect().toSeq ==
      Multimodal.modalityMix(docs).collect().toSeq)
  }

  test("aspectBucketPlan: ladder contents, exact ppm assignment, " +
      "batch/tail accounting, non-visual exclusion") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // the default ladder is the budget arithmetic, verbatim
    assert(Multimodal.aspectLadder() == Seq(
      (320, 768), (384, 640), (448, 576), (512, 512),
      (576, 448), (640, 384), (704, 320), (768, 320)))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("media_type", StringType),
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("n_frames", IntegerType), StructField("ok", BooleanType)))
    val decoded = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "image", 640, 480, 1, true),   // 4:3 -> (576,448)
        Row(2L, "image", 500, 500, 1, true),   // square -> (512,512)
        Row(3L, "video", 320, 704, 10, true),  // tall -> (320,768)
        Row(4L, "image", 512, 512, 1, true),   // exact -> dist 0
        Row(5L, "image", 510, 510, 1, true),   // square -> (512,512)
        Row(6L, "audio", 0, 0, 1, true),       // not visual
        Row(7L, "image", 640, 480, 1, false))),// decode failed
      schema)
    val out = Multimodal.aspectBucketPlan(decoded, batchSize = 2)
      .collect().map(r => (r.getAs[Int]("bw"), r.getAs[Int]("bh")) ->
        (r.getAs[Long]("aspect_ppm"), r.getAs[Long]("n_media"),
          r.getAs[Long]("n_batches"), r.getAs[Long]("last_fill_ppm"),
          r.getAs[Long]("max_dist_ppm"))).toMap
    assert(out.keySet == Set((320, 768), (512, 512), (576, 448)))
    // hand cross-multiplication: (640,480) vs (576,448):
    // |640*448-480*576|*1e6/(480*448) = 10240e6/215040 = 47619
    assert(out((576, 448)) ===
      ((1285714L, 1L, 1L, 500000L, 47619L)))
    // three squares: 500x500 dist |500*512-500*512|=0? no:
    // |500*512 - 500*512| = 0 -> all square inputs dist 0
    assert(out((512, 512)) === ((1000000L, 3L, 2L, 500000L, 0L)))
    // (320,704): |320*768-704*320|*1e6/(704*768) = 37878
    assert(out((320, 768)) === ((416666L, 1L, 1L, 500000L, 37878L)))
  }

  test("frameSampleIndices: exact uniform spread with both endpoints, " +
      "distinct indices, cap binds, non-video excluded") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("media_type", StringType),
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("n_frames", IntegerType), StructField("ok", BooleanType)))
    val decoded = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "video", 640, 480, 1, true),     // single frame
        Row(2L, "video", 640, 480, 5, true),     // k = n: every frame
        Row(3L, "video", 640, 480, 100, true),   // cap binds: k = 32
        Row(4L, "image", 640, 480, 50, true),    // not video
        Row(5L, "video", 640, 480, 10, false))), // decode failed
      schema)
    val out = Multimodal.frameSampleIndices(decoded, maxFrames = 32)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("frame_pos"), r.getAs[Long]("frame_idx"),
        r.getAs[Long]("pos_ppm")))
    val byDoc = out.groupBy(_._1)
    assert(byDoc.keySet == Set(1L, 2L, 3L))
    // n=1: one frame, idx 0
    assert(byDoc(1L).toSeq == Seq((1L, 0L, 0L, 0L)))
    // k = n = 5: indices are exactly 0..4
    assert(byDoc(2L).map(_._3).sorted.toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    // cap binds: 32 rows, endpoints 0 and n-1, strictly increasing
    val d3 = byDoc(3L).sortBy(_._2).map(_._3).toSeq
    assert(d3.length == 32 && d3.head == 0L && d3.last == 99L)
    assert(d3.zip(d3.tail).forall { case (a, b) => a < b },
      s"indices must be strictly increasing: $d3")
    // the exact integer formula: idx = pos*(n-1) div (k-1)
    assert(d3 == (0 until 32).map(p => p.toLong * 99 / 31).toSeq)
    // pos_ppm = idx*1e6 div n
    assert(byDoc(3L).forall(r => r._4 == r._3 * 1000000L / 100))
  }

  test("augmentationPlan: stateless determinism, crop windows stay " +
      "in-bounds, epochs differ, both flip branches occur") {
    import spark.implicits._
    val decoded = (1L to 40L).map(i =>
      (i, (i * 37 % 1920 + 1).toInt, (i * 53 % 1080 + 1).toInt, true))
      .toDF("doc_id", "width", "height", "ok")
    def plan() = graft.ops.Multimodal
      .augmentationPlan(decoded, epochs = 3).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("epoch")) -> r)
      .toMap
    val p1 = plan()
    assert(p1.size === 120)
    // regenerating yields the identical schedule — no stored state
    val p2 = plan()
    assert(p1.keySet === p2.keySet)
    assert(p1.keys.forall { k =>
      val (a, b) = (p1(k), p2(k))
      a.getAs[Long]("crop_x") == b.getAs[Long]("crop_x") &&
        a.getAs[Boolean]("hflip") == b.getAs[Boolean]("hflip") &&
        a.getAs[Int]("rot_bucket") == b.getAs[Int]("rot_bucket")
    })
    // geometry invariants
    assert(p1.values.forall { r =>
      val (w, h) = (r.getAs[Long]("width"), r.getAs[Long]("height"))
      val (cx, cy) = (r.getAs[Long]("crop_x"), r.getAs[Long]("crop_y"))
      val (cw, ch) = (r.getAs[Long]("crop_w"), r.getAs[Long]("crop_h"))
      cx >= 0 && cy >= 0 && cx + cw <= w && cy + ch <= h &&
        Set(-1, 0, 1)(r.getAs[Int]("rot_bucket"))
    })
    // epochs draw independently: some doc flips differently by epoch
    assert((1L to 40L).exists { d =>
      p1((d, 0)).getAs[Boolean]("hflip") !=
        p1((d, 1)).getAs[Boolean]("hflip")
    })
    val flips = p1.values.map(_.getAs[Boolean]("hflip")).toSeq
    assert(flips.contains(true) && flips.contains(false))
  }

  test("hammingHistogram: byte-identical payloads land at hamming 0 " +
      "exactly once; histogram mass equals the candidate pair count") {
    val docs = Seq((1L, "alpha"), (2L, "alpha"), (3L, "alpha"),
      (4L, "wholly different payload")).toDF("doc_id", "text")
    val h = graft.ops.Multimodal.hammingHistogram(docs).collect()
      .map(r => r.getAs[Int]("hamming") -> r.getAs[Long]("n_pairs"))
      .toMap
    // the three identical docs form C(3,2)=3 pairs at distance 0,
    // counted ONCE each despite matching all 4 bands
    assert(h(0) === 3L)
    // doc 4 pairs only if a random band collides — whatever appears
    // must be strictly positive-distance
    assert(h.keys.filter(_ != 0).forall(_ > 0))
  }

  test("payloadEntropy: constant payload reads zero bits; uniform " +
      "nibbles read the 4-bit ceiling (floor-q20 exact)") {
    // 'UU' = 0x5555 -> nibbles all '5' -> H = 0
    // 0x0123456789abcdef... needs binary; use text whose UTF-8 hex
    // covers nibbles unevenly and pin the q20 identity by hand for
    // the 2-symbol case: 'U(' = 0x5528 -> nibbles 5,5,2,8 ->
    // c={5:2, 2:1, 8:1}, n=4
    val docs = Seq((1L, "UU"), (2L, "U(")).toDF("doc_id", "text")
    val m = graft.ops.Multimodal.payloadEntropy(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_nibbles"), r.getAs[Long]("n_distinct"),
          r.getAs[Long]("h_mass_q20"),
          r.getAs[Long]("bits_per_nibble_milli"))).toMap
    assert(m(1L) == ((4L, 1L, 0L, 0L)))
    def lnq20(x: Double) = math.floor(math.log(x) * (1L << 20)).toLong
    val mass = 2 * (lnq20(4) - lnq20(2)) + 2 * (lnq20(4) - lnq20(1))
    assert(m(2L)._3 === mass)
    assert(m(2L)._4 === mass * 1000 / (4 * 726817L))
  }

  test("mediaDupSurvivors: identical payloads cluster; largest " +
      "payload wins, ties to lowest doc_id; singleton survives") {
    val docs = Seq((1L, "same"), (2L, "same"), (3L, "unique text"))
      .toDF("doc_id", "text")
    val m = graft.ops.Multimodal.mediaDupSurvivors(docs).collect()
      .map(r => r.getAs[Long]("cluster") ->
        (r.getAs[Long]("survivor_doc_id"), r.getAs[Long]("n_members"),
          r.getAs[Long]("n_dropped"))).toMap
    assert(m(1L) == ((1L, 2L, 1L))) // equal bytes -> lowest id
    assert(m(3L) == ((3L, 1L, 0L)))
    graft.Caches.release("text")
  }

  test("magicSniff: true binary magics classify (jpeg/png), ASCII " +
      "magics classify from text, rest unknown; ppm mix closes") {
    import spark.implicits._
    val rows = Seq(
      (1L, Array(0xFF, 0xD8, 0xFF, 0xE0).map(_.toByte)),
      (2L, Array(0x89, 0x50, 0x4E, 0x47, 0x0D).map(_.toByte)),
      (3L, "%PDF-1.4 x".getBytes("UTF-8")),
      (4L, "RIFF....WAVE".getBytes("UTF-8")),
      (5L, "plain text".getBytes("UTF-8")))
    val docs = rows.toDF("doc_id", "payload")
    val m = graft.ops.Multimodal.magicSniff(docs).collect()
      .map(r => r.getAs[String]("sniffed_type") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("total_bytes"),
          r.getAs[Long]("share_ppm"))).toMap
    assert(m("jpeg") == ((1L, 4L, 200000L)))
    assert(m("png") == ((1L, 5L, 200000L)))
    assert(m("pdf") == ((1L, 10L, 200000L)))
    assert(m("riff") == ((1L, 12L, 200000L)))
    assert(m("unknown") == ((1L, 10L, 200000L)))
  }

  test("dedupSavings: exact reclaim from identical payloads, " +
      "near reclaim keeps the largest member per cluster, ppm " +
      "exact; singletons contribute nothing") {
    // 3x 'a' (1 byte each, one cluster), singletons 'b' and 'bb'
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"),
      (5L, "bb")).toDF("doc_id", "text")
    val r = graft.ops.Multimodal.dedupSavings(docs).collect().head
    assert(r.getAs[Long]("n_docs") === 5L)
    assert(r.getAs[Long]("total_bytes") === 6L)
    assert(r.getAs[Long]("n_clusters") === 3L)
    assert(r.getAs[Long]("n_dropped") === 2L)
    assert(r.getAs[Long]("exact_reclaim_bytes") === 2L)
    assert(r.getAs[Long]("neardup_reclaim_bytes") === 2L)
    assert(r.getAs[Long]("reclaim_ppm") === 333333L)
    graft.Caches.release("text")
  }
}
