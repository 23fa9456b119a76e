package graft

import org.apache.spark.sql.functions._
import graft.ops.Text

/** Dedup / text-analysis operator behavior on controlled inputs. */
class TextSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "en", "s1", 43L),
    (2L, "the quick brown fox jumps over the lazy dog", "en", "s2", 43L),
    (3L, "the quick brown fox jumps over the lazy cat", "en", "s3", 43L),
    (4L, "completely different content here entirely", "en", "s4", 42L),
    (5L, "", "en", "s5", 0L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("exact dedup keeps lowest doc_id per identical text") {
    val kept = Text.exactDedup(docs).select("doc_id").as[Long]
      .collect().toSet
    assert(kept == Set(1L, 3L, 4L, 5L))
  }

  test("exact dup groups count duplicates") {
    val g = Text.exactDupGroups(docs)
      .filter(col("n_dups") > 1).collect()
    assert(g.length == 1 && g.head.getAs[Long]("keep_doc_id") == 1L)
  }

  test("token stats handle empty text") {
    val m = Text.tokenStats(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n_tokens"))
      .toMap
    assert(m(1L) == 9 && m(5L) == 0)
  }

  test("minhash LSH finds near-dup pair, not unrelated pair") {
    val cands = Text.minhashCandidates(docs, 0.3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(cands.contains((1L, 2L)))   // identical text
    assert(cands.contains((1L, 3L)) || cands.contains((2L, 3L)))
    assert(!cands.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("ngram jaccard: identical=1.0, near<1, ordering sane") {
    val cands = Text.minhashCandidates(docs, 0.1)
    val j = Text.ngramJaccard(docs, cands).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("jaccard")).toMap
    assert(j((1L, 2L)) == 1.0)
    j.get((1L, 3L)).foreach(v => assert(v > 0 && v < 1))
  }

  test("simhash: identical texts equal, near texts close in hamming") {
    val m = Text.simhashes(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash"))
      .toMap
    assert(m(1L) == m(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(m(1L), m(3L)) < ham(m(1L), m(4L)))
  }

  test("fingerprint is whitespace/punct-insensitive") {
    val d2 = Seq((1L, "Hello,   World!"), (2L, "hello world"))
      .toDF("doc_id", "text")
    val fps = Text.fingerprint(d2).select("fp").as[String].collect()
    assert(fps(0) == fps(1))
  }

  test("doc frequency + idf: df counts docs once, idf = ln(N/df)") {
    val out = Text.docFrequency(docs, minDf = 1L).collect()
      .map(r => r.getAs[String]("token") ->
        (r.getAs[Long]("df"), r.getAs[Long]("tf_total"),
          r.getAs[Double]("idf"))).toMap
    // "the" appears twice in docs 1-3 → df=3, tf=6
    assert(out("the") == ((3L, 6L, math.log(5.0 / 3.0))))
    assert(out("cat")._1 == 1L)
  }

  test("lang guess picks marker-word argmax") {
    val d = Seq(
      (1L, "der hund und die katze", "x"),
      (2L, "the cat and the dog is", "x"),
      (3L, "xyzzy plugh", "x")
    ).toDF("doc_id", "text", "lang")
    val m = Text.langGuess(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang_guess"))
      .toMap
    assert(m == Map(1L -> "de", 2L -> "en", 3L -> "und"))
  }
}
