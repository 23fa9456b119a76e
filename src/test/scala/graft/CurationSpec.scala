package graft

import org.apache.spark.sql.functions._
import graft.ops.{Curation, Text}

/** Cross-modal capstone behavior: the semantic stage must catch what
  * the text stage cannot (paraphrases share no shingles), and docs
  * outside the embedding table must pass the semantic stage
  * unexamined.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  // doc 2 paraphrases doc 1 with zero 3-shingle overlap; doc 3 is
  // unrelated; doc 4 has no embedding row
  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "en", "s", 43L),
    (2L, "a fast auburn fox leaps above a sleepy canine", "en", "s", 45L),
    (3L, "completely different content about query engines", "en", "s", 48L),
    (4L, "no embedding for this document at all here", "en", "s", 42L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  private val embs = Seq(
    (1L, Array(1f, 0f, 0f), 0),
    (2L, Array(0.99f, 0.01f, 0f), 0), // cos vs 1 ≈ 0.9999 → same component
    (3L, Array(0f, 1f, 0f), 0)
  ).toDF("vec_id", "embedding", "list_id")

  // weights that keep everything: gate isolated away from the test
  private val keepAll = Text.QualityClassifier(0.0, 0.0, 0.0, 1.0)

  test("semantic stage drops the paraphrase the text stage misses; " +
      "unembedded docs pass through") {
    val out = Curation.prepareTrainingDataSemantic(
      docs, embs, keepAll, minLogit = 0.0,
      cosThreshold = 0.9, sampleRate = 1.0)
    val kept = out.select("doc_id").as[Long].collect().toSet
    // text near-dup finds nothing (no shared shingles), the semantic
    // component {1,2} keeps min-id 1; doc 4 passes with no embedding
    assert(kept == Set(1L, 3L, 4L))
    // sanity: the text-only capstone at the same thresholds keeps 2
    val textOnly = Text.prepareTrainingData(docs,
      qualityThreshold = 0.0, sampleRate = 1.0)
      .select("doc_id").as[Long].collect().toSet
    assert(textOnly.contains(2L))
  }

  test("classifier gate filters before any dedup runs") {
    // harsh gate: only long-enough docs pass (len_score dominates)
    val out = Curation.prepareTrainingDataSemantic(
      docs, embs, Text.QualityClassifier(0.0, 0.0, 10.0, 0.0),
      minLogit = 0.89, sampleRate = 1.0)
    val kept = out.select("doc_id").as[Long].collect().toSet
    // len_score = min(n_chars,500)/500; 10*len >= 0.89 → n_chars >= 44.5
    assert(kept == Set(2L, 3L))
  }
}
