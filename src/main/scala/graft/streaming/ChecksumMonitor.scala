package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `Cdc.checksumDiff`'s replica side — the
  * pt-table-checksum fingerprint maintained INCREMENTALLY from the
  * change feed itself, instead of re-scanning the replica per audit:
  * the per-bucket fingerprint is (row count, Σ row-hash mod 2⁶¹−1),
  * and both components are group homomorphisms of the row multiset —
  * an insert adds its hash, a delete subtracts the departing row's
  * hash, an update subtracts the old and adds the new. So a replica
  * that applied a change stream correctly has EXACTLY the fingerprint
  * this monitor folds from the same stream, and the drift check
  * becomes: compare this monitor's live state against a (cheap,
  * occasional) source-side batch fingerprint — no replica scan on the
  * hot path, ever. The differential spec pins the homomorphism:
  * monitor-folded fingerprints == `Cdc.checksumDiff` over the
  * materialized end-state table, bucket for bucket.
  *
  * Input contract: `(bucket, op, newH, oldH)` rows — op ∈ I/U/D with
  * `newH` the md5-60 row hash after the change (`Cdc.rowHash60`
  * convention) and `oldH` the hash of the row version being replaced
  * or deleted (Maxwell's `old`-enriched envelope carries enough to
  * compute it; 0 where unused). Fold order is irrelevant WITHIN a
  * correct feed (addition mod M commutes), which is what makes the
  * monitor safe behind a multi-partition source — no day/order
  * contract like the decay monitors.
  *
  * Shape at scale: state is 2 longs per BUCKET (the nBuckets domain,
  * constant), each micro-batch pre-folds map-side into per-bucket
  * deltas before touching state, and emission is one row per TOUCHED
  * bucket per batch.
  */
object ChecksumMonitor {

  /** 2⁶¹−1, the repo's checksum modulus (Mersenne prime). */
  val M: Long = 2305843009213693951L

  case class Delta(bucket: Long, op: String, newH: Long, oldH: Long)
  case class BucketState(n: Long, fp: Long, ver: Long)
  case class FpOut(bucket: Long, version: Long, n_rows: Long,
      fingerprint: Long)

  private[streaming] def fold(st: BucketState, d: Delta): BucketState = {
    def norm(x: Long): Long = ((x % M) + M) % M
    d.op match {
      case "I" => BucketState(st.n + 1, norm(st.fp + norm(d.newH)), st.ver)
      case "D" => BucketState(st.n - 1, norm(st.fp - norm(d.oldH)), st.ver)
      case "U" =>
        BucketState(st.n, norm(st.fp - norm(d.oldH) + norm(d.newH)),
          st.ver)
      case other =>
        throw new IllegalArgumentException(s"op must be I/U/D: $other")
    }
  }

  def monitor(
      changes: Dataset[Delta]
  )(implicit spark: SparkSession): Dataset[FpOut] = {
    import spark.implicits._
    changes
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[BucketState, FpOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (bucket: Long, rows: Iterator[Delta],
         state: GroupState[BucketState]) =>
          val st0 = state.getOption.getOrElse(BucketState(0L, 0L, 0L))
          val folded = rows.foldLeft(st0)(fold)
          // per-bucket emission version: a keyed downstream consumer
          // (LWW sink, alert dedup) keeps the max-version row and
          // never needs arrival order
          val st = folded.copy(ver = st0.ver + 1)
          state.update(st)
          Iterator.single(FpOut(bucket, st.ver, st.n, st.fp))
      }
  }
}
