package graft

import graft.Graft._

/** The fluent facade delegates 1:1 to the op functions — each call
  * must plan and return the same shape as its target.
  */
class GraftApiSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "en", "s1", 43L),
    (2L, "the quick brown fox jumps over the lazy dog", "en", "s2", 43L),
    (3L, "something else entirely different here now ok", "en", "s3", 45L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  private lazy val embs = Seq(
    (0L, Array(1.0f, 0.0f), 0), (1L, Array(0.9f, 0.1f), 0),
    (2L, Array(0.0f, 1.0f), 1)
  ).toDF("vec_id", "embedding", "label")

  test("doc surface composes end to end") {
    assert(docs.dedupExact.count() == 2)
    assert(docs.dupGroups.columns.contains("n_dups"))
    val pairs = docs.jaccardPairs(0.9)
    assert(pairs.select("doc_a", "doc_b").as[(Long, Long)]
      .collect().toSet == Set((1L, 2L)))
    val clustered = docs.dupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clustered == Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
    assert(docs.chunked(window = 4, stride = 3).count() > 3)
    assert(docs.redactPii.columns.contains("redacted"))
    assert(docs.repetitionSignals.columns.contains("dup_bigram_ratio"))
    assert(docs.curated.columns.nonEmpty)
  }

  test("doc analysis + export surface composes end to end") {
    // doc 3 shares zero trigrams with docs 1/2 → only 1,2 contaminated
    val hits = docs.filter($"doc_id" =!= 3L)
      .contaminationAgainst(docs.filter($"doc_id" === 3L), n = 3)
    assert(hits.count() == 0)
    val hits2 = docs.filter($"doc_id" === 1L)
      .contaminationAgainst(docs.filter($"doc_id" === 2L), n = 3)
    assert(hits2.count() == 1)                // identical texts collide
    val df_ = docs.docFrequency(minDf = 2L).collect()
    assert(df_.exists(r => r.getAs[String]("token") == "the" &&
      r.getAs[Long]("df") == 2L))
    assert(docs.rollingFingerprinted.columns.contains("roll_fp"))
    assert(docs.simhashed.count() == 3)
    val out = java.nio.file.Files
      .createTempDirectory("graft-api-export").toString
    docs.writePartitioned(out, partitionCols = Seq("lang"))
    assert(spark.read.parquet(out).count() == 3)
  }

  test("embedding surface composes end to end") {
    val top = embs.cosineTopK(0L, 1).collect()
    assert(top.head.getAs[Long]("vec_id") == 1L)
    assert(embs.quantizedInt8.count() == 3)
    assert(embs.labelCentroids.count() == 4)  // 2 labels × 2 dims
    val model = embs.fitIvf(nLists = 2)
    val ivf = embs.ivfTopK(model, 0L, 1).collect()
    assert(ivf.head.getAs[Long]("vec_id") == 1L)
  }
}
