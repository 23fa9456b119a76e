package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `Audit.holtWintersBacktest` — the live
  * model-based anomaly baseline: per event type, the additive
  * Holt–Winters state (level, trend, 7 weekday seasonals) maintained
  * incrementally over closed daily counts, emitting each day's
  * one-step-ahead forecast BEFORE folding the observation in — the
  * number an alerting layer compares the day's actual against, with
  * the trend/seasonal correction the seasonal-naive baseline lacks.
  *
  * Relationship to the batch op, stated precisely: the recursion is
  * IDENTICAL — same milli fixed point, same sign-split `div 1000`
  * (truncation toward zero), same seed-then-smooth warmup — so the
  * state trajectory is bitwise equal to the batch fold's, not an
  * approximation (the differential spec asserts level, trend, scored
  * count and summed |err| match `holtWintersBacktest` column for
  * column under an arbitrary batch split). State per type: 2 longs +
  * 7 seasonal longs + bookkeeping.
  *
  * Input contract (the [[DecayMonitor]] convention): pre-closed
  * daily counts `(event_type, day, n)` with `day` the non-negative
  * epoch-day number, arriving in per-type day order across
  * micro-batches (the watermarked windowed-count shape);
  * intra-batch disorder is absorbed by a per-batch day sort; a row
  * at or before the state's last folded day (cross-batch regression
  * or duplicate close) is DROPPED, never folded — refolding a day
  * would double-smooth the state the batch twin saw once.
  *
  * Shape at scale: state is bounded by the type domain; each
  * micro-batch shuffles only its own day rows. The per-batch
  * `rows.toSeq.sortBy` materializes ONE TYPE's day rows of ONE
  * micro-batch — bounded by calendar days per trigger interval
  * under the pre-closed-daily contract above. Feeding row-grain
  * events (one row per EVENT instead of per day) violates that
  * contract and makes the buffer corpus-sized: aggregate to daily
  * counts upstream (the watermarked windowed count) first.
  */
object ForecastMonitor {

  case class DayCount(event_type: String, day: Long, n: Long)
  case class HwState(l: Long, b: Long, s: Seq[Long], lastDay: Long,
      seen: Long, nsc: Long, sae: Long)
  case class ForecastOut(event_type: String, day: Long, n: Long,
      forecast_milli: Option[Long], abs_err_milli: Option[Long],
      level_milli: Long, trend_milli: Long)

  /** Unseeded seasonal-slot sentinel (a real seasonal never reaches
    * Long.MinValue: deviations are bounded by the milli count mass).
    */
  private val UNSEEDED = Long.MinValue

  private def tdiv(v: Long): Long =
    if (v < 0) -((-v) / 1000) else v / 1000

  def monitor(
      days: Dataset[DayCount],
      alphaMilli: Long = 500L,
      betaMilli: Long = 250L,
      gammaMilli: Long = 250L
  )(implicit spark: SparkSession): Dataset[ForecastOut] = {
    import spark.implicits._
    days
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[HwState, ForecastOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (t: String, rows: Iterator[DayCount],
         state: GroupState[HwState]) =>
          var st = state.getOption.getOrElse(HwState(0L, 0L,
            Seq.fill(7)(UNSEEDED), Long.MinValue, 0L, 0L, 0L))
          val out = rows.toSeq.sortBy(_.day).flatMap { r =>
            if (st.lastDay != Long.MinValue && r.day <= st.lastDay) {
              // dropped, never folded: see the input-contract
              // scaladoc paragraph
              None
            } else {
              val y = r.n * 1000L
              val i = (r.day % 7).toInt
              val s = st.s.toArray
              val res =
                if (s(i) == UNSEEDED) {
                  val lEff = if (st.seen == 0) y else st.l
                  s(i) = y - lEff
                  st = HwState(lEff, st.b, s.toSeq, r.day,
                    st.seen + 1, st.nsc, st.sae)
                  ForecastOut(t, r.day, r.n, None, None, st.l, st.b)
                } else {
                  val f = st.l + st.b + s(i)
                  val err = math.abs(y - f)
                  val lNew = tdiv(alphaMilli * (y - s(i)) +
                    (1000L - alphaMilli) * (st.l + st.b))
                  val bNew = tdiv(betaMilli * (lNew - st.l) +
                    (1000L - betaMilli) * st.b)
                  s(i) = tdiv(gammaMilli * (y - lNew) +
                    (1000L - gammaMilli) * s(i))
                  st = HwState(lNew, bNew, s.toSeq, r.day,
                    st.seen + 1, st.nsc + 1, st.sae + err)
                  ForecastOut(t, r.day, r.n, Some(f), Some(err),
                    lNew, bNew)
                }
              Some(res)
            }
          }
          state.update(st)
          out.iterator
      }
  }
}
