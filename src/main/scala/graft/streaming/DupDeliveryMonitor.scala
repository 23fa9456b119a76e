package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.{col, get_json_object, xxhash64}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `Cdc.dupDeliveryProfile` — the at-least-once
  * duplicate-delivery audit run CONTINUOUSLY at ingest time: a
  * producer configured acks=1 with idempotence off redelivers on
  * every rebalance/timeout, and the moment a replay loop starts
  * (max_copies climbing batch over batch) is when to page, not in
  * tomorrow's batch audit. Per table the state is the (value-hash →
  * copies) count map of the lines seen so far; each micro-batch
  * folds its lines in and emits the table's updated profile —
  * column-for-column the batch op's output (messages, distinct
  * lines, duplicate count/ppm, worst single line's copy count) plus
  * an `exact` flag.
  *
  * Identity is the line's xxhash64 (computed in the DataFrame domain
  * before the stateful fold — codegen'd, never a JVM-side hash of a
  * retained string). 64-bit collisions understate uniques by ~n²/2⁶⁵
  * — negligible against the dup rates this monitor exists to catch.
  *
  * State bound (the SeqGapMonitor discipline — capped, not trusted):
  * past `maxTracked` distinct lines per table the map evicts its
  * least-informative entries — smallest copy-count first (singletons
  * carry no dup signal yet), hash ascending for determinism — into
  * three exact accumulators (evicted messages, evicted uniques, max
  * copies at eviction). After any eviction: `n_msgs` stays EXACT;
  * `n_unique` is an upper bound (an evicted line that redelivers
  * re-counts as new) so `n_dup`/`dup_ppm` are LOWER bounds — the
  * conservative direction for an alarm that fires on duplicates —
  * and `max_copies` is a lower bound; `exact` flips false the first
  * time any of that can matter. Under the cap the profile equals
  * `Cdc.dupDeliveryProfile` over the same lines under ANY batch
  * split — the differential spec pins that.
  *
  * Input contract: raw envelope lines, no ordering assumed (the
  * count fold is commutative), safe directly behind a
  * multi-partition Kafka source.
  */
object DupDeliveryMonitor {

  case class DupState(hs: Array[Long], counts: Array[Long],
      evictedMsgs: Long, evictedUnique: Long, evictedMax: Long)
  case class DupOut(src_table: String, n_msgs: Long, n_unique: Long,
      n_dup: Long, dup_ppm: Long, max_copies: Long, exact: Boolean)

  /** Fold a batch of line hashes into the count map; exact. */
  private[graft] def foldBatch(
      prior: Map[Long, Long],
      hashes: Seq[Long]
  ): Map[Long, Long] =
    hashes.foldLeft(prior) { (m, h) =>
      m.updated(h, m.getOrElse(h, 0L) + 1L)
    }

  /** Cap the map: evict (count asc, hash asc) until size <=
    * maxTracked, folding evictions into the exact accumulators.
    * Returns (kept, evictedMsgsDelta, evictedUniqueDelta,
    * evictedMaxDelta).
    */
  private[graft] def evict(
      m: Map[Long, Long],
      maxTracked: Int
  ): (Map[Long, Long], Long, Long, Long) =
    if (m.size <= maxTracked) (m, 0L, 0L, 0L)
    else {
      val out = m.toSeq.sortBy { case (h, c) => (c, h) }
      val (gone, kept) = out.splitAt(m.size - maxTracked)
      (kept.toMap, gone.map(_._2).sum, gone.size.toLong,
        gone.map(_._2).max)
    }

  private[graft] def profile(
      table: String,
      st: DupState
  ): DupOut = {
    val nMsgs = st.counts.sum + st.evictedMsgs
    val nUnique = st.counts.length.toLong + st.evictedUnique
    val nDup = nMsgs - nUnique
    val maxCopies = math.max(
      if (st.counts.isEmpty) 0L else st.counts.max, st.evictedMax)
    DupOut(table, nMsgs, nUnique, nDup,
      if (nMsgs == 0) 0L else nDup * 1000000L / nMsgs,
      maxCopies, st.evictedMsgs == 0L)
  }

  /** `lines` carries raw envelope strings in a `value` column (the
    * batch op's input shape); the table key is the envelope's
    * `$.table` — null for non-JSON lines, which then profile as
    * their own group, exactly like the batch op.
    */
  def monitor(
      lines: DataFrame,
      maxTracked: Int = 65536
  )(implicit spark: SparkSession): Dataset[DupOut] = {
    import spark.implicits._
    require(maxTracked >= 1, s"maxTracked must be >= 1: $maxTracked")
    lines
      .select(get_json_object(col("value"), "$.table").as("_1"),
        xxhash64(col("value")).as("_2"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[DupState, DupOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (table: String, rows: Iterator[(String, Long)],
         state: GroupState[DupState]) =>
          val prior = state.getOption.getOrElse(
            DupState(Array.empty, Array.empty, 0L, 0L, 0L))
          val merged = foldBatch(
            prior.hs.zip(prior.counts).toMap, rows.map(_._2).toSeq)
          val (kept, dMsgs, dUniq, dMax) = evict(merged, maxTracked)
          // sorted state arrays: deterministic layout across runs
          val ks = kept.toSeq.sortBy(_._1)
          val next = DupState(ks.map(_._1).toArray,
            ks.map(_._2).toArray,
            prior.evictedMsgs + dMsgs, prior.evictedUnique + dUniq,
            math.max(prior.evictedMax, dMax))
          state.update(next)
          if (next.hs.isEmpty && next.evictedMsgs == 0L)
            Iterator.empty
          else Iterator.single(profile(table, next))
      }
  }
}
