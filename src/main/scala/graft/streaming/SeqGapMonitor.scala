package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `Cdc.sequenceGaps` — binlog/offset integrity run
  * CONTINUOUSLY: a replication hole is most valuable the micro-batch
  * it opens (re-request the range while the binlog still has it), not
  * in tomorrow's batch audit. Per table the state is the island set
  * of the DISTINCT ids seen so far — a sorted list of inclusive
  * `[start, end]` runs, exactly the gaps-and-islands structure the
  * batch op derives per scan — and each micro-batch folds its ids in
  * by standard interval insertion (extend / merge / open). Every
  * batch emits the table's updated profile: distinct ids, span,
  * island count, total missing, largest interior hole, missing ppm —
  * column-for-column the batch op's output plus the emission day.
  *
  * Shape at scale: state is `2·n_islands` longs per TABLE — and a
  * binlog id stream is mostly-contiguous by construction, so islands
  * stay near 1 per table in health and grow only where real holes
  * open (the thing worth paying state for). Pathological scatter is
  * BOUNDED, not trusted: past `maxIslands` the two islands separated
  * by the SMALLEST interior gap merge (that gap stops counting as
  * missing — the least-damaging forget, and a fused id inside it
  * later is absorbed silently rather than double-counted). Under the
  * cap the profile is EXACT and equals `Cdc.sequenceGaps` over the
  * same ids — the differential spec pins that; past it, n_missing /
  * n_islands are documented lower bounds while min/max/span stay
  * exact. Dups (within a batch or across batches) fold away free:
  * an id inside an existing island changes nothing.
  *
  * Input contract: `(table, id)` rows straight off a parsed CDC
  * envelope — no ordering assumed AT ALL (unlike the decay monitors,
  * id arrival order is irrelevant: the island fold is commutative),
  * which is what makes this monitor safe directly behind a
  * multi-partition Kafka source.
  */
object SeqGapMonitor {

  case class IdRow(table: String, id: Long)
  case class GapState(starts: Array[Long], ends: Array[Long])
  case class GapOut(src_table: String, n_ids: Long, min_id: Long,
      max_id: Long, n_islands: Long, largest_gap: Option[Long],
      n_missing: Long, missing_ppm: Long)

  /** Fold a batch of ids into a sorted island list; exact. */
  private[streaming] def mergeIds(
      islands: Vector[(Long, Long)],
      batchIds: Seq[Long]
  ): Vector[(Long, Long)] = {
    // merge-sort the (already sorted) islands with the batch's sorted
    // distinct ids, coalescing adjacency as we go — O(n_islands + b)
    val ids = batchIds.distinct.sorted
    val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    def push(s: Long, e: Long): Unit =
      if (out.nonEmpty && s <= out.last._2 + 1) {
        val (ls, le) = out.last
        out(out.length - 1) = (ls, math.max(le, e))
      } else out += ((s, e))
    var i = 0; var j = 0
    while (i < islands.length || j < ids.length) {
      if (j >= ids.length ||
        (i < islands.length && islands(i)._1 <= ids(j))) {
        push(islands(i)._1, islands(i)._2); i += 1
      } else { push(ids(j), ids(j)); j += 1 }
    }
    out.toVector
  }

  /** Cap the island list by closing the smallest interior gaps. */
  private[streaming] def capIslands(
      islands: Vector[(Long, Long)],
      maxIslands: Int
  ): Vector[(Long, Long)] =
    if (islands.length <= maxIslands) islands
    else {
      // close (islands.length - maxIslands) smallest gaps: rank every
      // interior gap, keep the (maxIslands - 1) LARGEST as real
      val gaps = islands.sliding(2).zipWithIndex.map { case (w, ix) =>
        (w(1)._1 - w(0)._2 - 1, ix)
      }.toVector.sortBy { case (g, ix) => (g, ix) }
      val close = gaps.take(islands.length - maxIslands)
        .map(_._2).toSet
      val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      out += islands.head
      islands.zipWithIndex.drop(1).foreach { case ((s, e), ix) =>
        if (close(ix - 1)) { // gap between island ix-1 and ix closes
          val (ls, _) = out.last
          out(out.length - 1) = (ls, e)
        } else out += ((s, e))
      }
      out.toVector
    }

  private[streaming] def profile(
      table: String,
      islands: Vector[(Long, Long)]
  ): GapOut = {
    val nIds = islands.map { case (s, e) => e - s + 1 }.sum
    val minId = islands.head._1
    val maxId = islands.last._2
    val largest =
      if (islands.length < 2) None
      else Some(islands.sliding(2).map(w => w(1)._1 - w(0)._2 - 1).max)
    val span = maxId - minId + 1
    val missing = span - nIds
    GapOut(table, nIds, minId, maxId, islands.length.toLong,
      largest, missing, missing * 1000000L / span)
  }

  def monitor(
      ids: Dataset[IdRow],
      maxIslands: Int = 1024
  )(implicit spark: SparkSession): Dataset[GapOut] = {
    import spark.implicits._
    require(maxIslands >= 1, s"maxIslands must be >= 1: $maxIslands")
    ids
      .groupByKey(_.table)
      .flatMapGroupsWithState[GapState, GapOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (table: String, rows: Iterator[IdRow],
         state: GroupState[GapState]) =>
          val prior = state.getOption
            .map(s => s.starts.zip(s.ends).toVector)
            .getOrElse(Vector.empty)
          val merged = capIslands(
            mergeIds(prior, rows.map(_.id).toSeq), maxIslands)
          state.update(GapState(
            merged.map(_._1).toArray, merged.map(_._2).toArray))
          if (merged.isEmpty) Iterator.empty
          else Iterator.single(profile(table, merged))
      }
  }
}
