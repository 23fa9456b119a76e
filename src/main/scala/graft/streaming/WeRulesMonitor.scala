package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `Audit.westernElectricRules` — phase-II
  * control-chart monitoring as keyed state: the batch op derives each
  * type's mean/σ from the whole series it is given (a retrospective
  * audit); a live monitor cannot see the future, so here the caller
  * supplies the FROZEN in-control baseline `(n, s, ss)` per type —
  * the classic phase-I/phase-II split every SPC deployment uses
  * (fit the baseline on a vetted window, monitor against it) and the
  * same operating contract as [[CusumMonitor]]'s `meanX`. All
  * comparisons replay the batch op's integer cross-multiplications —
  * `(x·n − S)² vs k²·(n·SS − S²)` — in BigInt (exact at any count),
  * so feeding the monitor a baseline equal to the batch op's own
  * global stats reproduces the batch flags bit-for-bit (StreamingSpec
  * runs exactly that differential).
  *
  * Input contract (the [[ForecastMonitor]] convention): pre-closed
  * daily counts `(event_type, day, x)` arriving in per-type day
  * order across micro-batches; intra-batch disorder is absorbed by a
  * per-batch day sort; a row at or before the last folded day is
  * DROPPED, never refolded. Types absent from `baseline` are dropped
  * too (no in-control reference → no chart), also never buffered.
  *
  * Shape at scale: state per type is the last 7 days' (side, b1, b2)
  * triples plus the fold cursor — a fixed ~8-entry ring bounded by
  * the RULE WIDTHS, not the stream; each micro-batch shuffles only
  * its own day rows.
  */
object WeRulesMonitor {

  case class Day(event_type: String, day: Long, x: Long)
  case class Flag(side: Long, b1: Long, b2: Long)
  case class WeState(ring: Seq[Flag], lastDay: Long)
  case class WeOut(event_type: String, day: Long, x: Long,
      side: Long, r1: Long, r2: Long, r3: Long, r4: Long)

  def monitor(
      days: Dataset[Day],
      baseline: Map[String, (Long, Long, Long)]
  )(implicit spark: SparkSession): Dataset[WeOut] = {
    import spark.implicits._
    require(baseline.values.forall { case (n, _, ss) =>
      n >= 1 && ss >= 0
    }, "each baseline needs n >= 1 and ss >= 0")
    days
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[WeState, WeOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (t: String, rows: Iterator[Day], state: GroupState[WeState]) =>
          baseline.get(t) match {
            case None => Iterator.empty
            case Some((n, s, ss)) =>
              val varn = BigInt(n) * ss - BigInt(s) * s
              var st = state.getOption
                .getOrElse(WeState(Seq.empty, Long.MinValue))
              val out = rows.toSeq.sortBy(_.day).flatMap { r =>
                if (st.lastDay != Long.MinValue && r.day <= st.lastDay)
                  None // dropped, never refolded (input contract)
                else {
                  val dev = BigInt(r.x) * n - s
                  val side: Long = dev.signum.toLong
                  def beyond(k: Int): Long =
                    if (dev * dev > BigInt(k) * k * varn) 1L else 0L
                  val f = Flag(side, beyond(1), beyond(2))
                  val win = st.ring :+ f
                  def lastK(k: Int, p: Flag => Boolean): Int =
                    win.takeRight(k).count(p)
                  val r1 = if (beyond(3) == 1L) 1L else 0L
                  val r2 = if (
                    lastK(3, g => g.b2 == 1L && g.side == 1L) >= 2 ||
                    lastK(3, g => g.b2 == 1L && g.side == -1L) >= 2)
                    1L else 0L
                  val r3 = if (
                    lastK(5, g => g.b1 == 1L && g.side == 1L) >= 4 ||
                    lastK(5, g => g.b1 == 1L && g.side == -1L) >= 4)
                    1L else 0L
                  val r4 = if (lastK(8, _.side == 1L) == 8 ||
                    lastK(8, _.side == -1L) == 8) 1L else 0L
                  st = WeState(win.takeRight(7), r.day)
                  Some(WeOut(t, r.day, r.x, side, r1, r2, r3, r4))
                }
              }
              state.update(st)
              out.iterator
          }
      }
  }
}
