package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-modal curation capstone — the full published-pipeline shape
  * (FineWeb/RefinedWeb text hygiene + SemDeDup's embedding stage)
  * composed entirely from the library's audited operators. Where
  * [[Text.prepareTrainingData]] is the text-only capstone, this one
  * runs BOTH redundancy axes: byte/shingle similarity (exact dedup +
  * shingle-Jaccard components) and embedding-space similarity
  * (within-coarse-list cosine components), because the two catch
  * different duplicates — a paraphrase shares no shingles but sits on
  * top of its source in embedding space.
  */
object Curation {

  /** Stages (each individually oracle-checked by its own registry
    * entry; the composition is oracle-checked end to end by
    * `q_text_prepare_semantic`):
    *
    *  1. classifier quality gate — `logit >= minLogit` over
    *     [[Text.classifierScore]] (scan-stage arithmetic);
    *  2. exact dedup ([[Text.exactDedup]], md5 min-doc);
    *  3. text near-dup collapse: shingle-Jaccard pair graph →
    *     connected components → min-id representative;
    *  4. SEMANTIC near-dup collapse over the survivors' embeddings
    *     ([[Vector.semanticDedupAssigned]], offline `list_id`
    *     assignment — SemDeDup's within-list discipline);
    *  5. PII redaction, token-window chunking, deterministic hash
    *     sampling (all scan-stage).
    *
    * `embsAssigned` carries `(vec_id, embedding, list_id)` with
    * `vec_id` keyed to `doc_id`. Docs WITHOUT an embedding row pass
    * the semantic stage unexamined (left join — the stage can only
    * judge what the encoder embedded); at 100 TB run the encoder
    * first or accept text-only hygiene for the gap.
    *
    * Shuffle census at scale: exact-dedup agg, the two pair joins,
    * and the two (small-graph) component iterations; every other
    * stage is scan-stage. Pass the session pair graphs via
    * `precomputedPairs` / `precomputedSemanticPairs` — pairwise
    * scores are independent of the rest of the corpus, so a
    * corpus-wide graph restricted to the gated set IS the gated
    * set's graph.
    */
  def prepareTrainingDataSemantic(
      docs: DataFrame,
      embsAssigned: DataFrame,
      clf: Text.QualityClassifier,
      minLogit: Double,
      jaccardThreshold: Double = 0.5,
      cosThreshold: Double = 0.4,
      sampleRate: Double = 0.5,
      window: Int = 50,
      stride: Int = 40,
      precomputedPairs: Option[(DataFrame, Double)] = None,
      precomputedSemanticPairs: Option[(DataFrame, Double)] = None
  ): DataFrame = {
    precomputedPairs.foreach { case (_, srcThreshold) =>
      require(srcThreshold <= jaccardThreshold,
        s"precomputed pair graph at threshold $srcThreshold cannot " +
          s"serve a request at $jaccardThreshold")
    }
    precomputedSemanticPairs.foreach { case (_, srcThreshold) =>
      require(srcThreshold <= cosThreshold,
        s"precomputed semantic pair graph at threshold $srcThreshold " +
          s"cannot serve a request at $cosThreshold")
    }
    val kept = graft.Caches.track("text", Text.exactDedup(
      docs.join(
        Text.classifierScore(docs, clf)
          .filter(col("logit") >= minLogit)
          .select(col("doc_id")),
        "doc_id")))
    val pairs = precomputedPairs
      .map { case (p, _) =>
        p.filter(col("jaccard") >= jaccardThreshold)
          .join(kept.select(col("doc_id").as("doc_a")),
            Seq("doc_a"), "left_semi")
          .join(kept.select(col("doc_id").as("doc_b")),
            Seq("doc_b"), "left_semi")
      }
      .getOrElse(Text.jaccardExactPairs(kept, jaccardThreshold))
    val textReps = Text.dupClusters(kept, pairs)
      .filter(col("doc_id") === col("cluster"))
      .select(col("doc_id"))
    // semantic stage over the text survivors' embeddings: restrict
    // the (corpus-wide) graph to survivor pairs, keep min-id per
    // cosine component; docs without an embedding row pass through
    val embsKept = graft.Caches.track("vec",
      embsAssigned.join(textReps.select(col("doc_id").as("vec_id")),
        Seq("vec_id"), "left_semi"))
    val semPairs = precomputedSemanticPairs
      .map { case (p, _) => p.filter(col("cos_sim") >= cosThreshold)
        .join(embsKept.select(col("vec_id").as("vec_a")),
          Seq("vec_a"), "left_semi")
        .join(embsKept.select(col("vec_id").as("vec_b")),
          Seq("vec_b"), "left_semi") }
      .getOrElse(
        Vector.semanticNearDupPairsAssigned(embsKept, cosThreshold))
    val semDropped = Vector
      .semanticDedupAssigned(embsKept, cosThreshold,
        precomputedPairs = Some(semPairs))
      .filter(!col("keep"))
      .select(col("vec_id").as("doc_id"))
    val survivors = textReps.join(semDropped, Seq("doc_id"),
      "left_anti")
    val redacted = Text.piiRedact(kept.join(survivors, "doc_id"))
      .select(col("doc_id"), col("redacted").as("text"))
    val chunks = Text.chunkDocs(redacted, window, stride)
    val draw = Text.draw60(concat(col("doc_id").cast("string"),
      lit(":"), col("chunk_id").cast("string"), lit(":chunk")))
    chunks.filter(draw < lit(Text.q60(sampleRate)))
  }
}
