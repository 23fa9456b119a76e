package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Registry for multimodal plumbing. `q_mm_payload_stats` is fully
  * oracle-checked (byte-level builtins). The decode path (stubbed
  * codec) is rows-only + spec-tested.
  */
object MultimodalQueries {

  type Q = (SparkSession, String) => DataFrame

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
    // feature extraction composed with vector math: per-media-feature
    // L2 norm (stubbed encoder; plumbing + composition under test)
    "q_mm_feature_norms" -> ((s, d) =>
      Multimodal.extractFeatures(Tables.documents(s, d))
        .select(col("doc_id"),
          Vector.decNorm(col("feature")).as("l2_norm"))
        .orderBy(col("doc_id")))
  )

  val oracle: Map[String, String] = Map(
    "q_mm_payload_stats" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |  md5(text) AS payload_md5,
        |  lower(substring(hex(encode(text)), 1, 8)) AS head_hex
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
