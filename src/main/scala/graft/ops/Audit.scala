package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Declarative data-quality gates for ingestion at scale.
  *
  * A 100 TB training-data pipeline admits whole table snapshots, not
  * rows — before a snapshot joins the corpus the operator question is
  * "does this batch satisfy the contract?" (completeness, key
  * uniqueness, value bounds, referential closure), answered by ONE
  * pass over the data producing a tiny per-constraint report (the
  * Deequ/expectations pattern). The reference has the per-row form of
  * this idea — its demux drops envelopes that fail a schema check
  * (`app/OdsBaseLogApp.scala` dirty-data branch); this is the
  * table-level generalization.
  *
  * Everything here reduces to classic aggregates with map-side
  * partials: the report's cost is one scan + one (tiny) shuffle
  * regardless of table size, and the output is O(#checks) rows. The
  * one exception is [[Audit.Uniqueness]], whose exact distinct-count
  * plans as Spark's Expand (a second shuffle) — still one scan, and
  * exactly what a key-integrity check must pay.
  */
object Audit {

  /** One declarative constraint; `name` keys the report row. */
  sealed trait Check { def name: String }

  /** Non-null fraction of `column` must be >= `minRatio`. */
  final case class Completeness(column: String, minRatio: Double)
      extends Check {
    val name = s"completeness:$column"
  }

  /** Distinct fraction of the key `columns` must be >= `minRatio`
    * (1.0 = the columns form a unique key).
    */
  final case class Uniqueness(columns: Seq[String], minRatio: Double)
      extends Check {
    val name = s"uniqueness:${columns.mkString(",")}"
  }

  /** min(column) must be >= `lo`. */
  final case class MinBound(column: String, lo: Double) extends Check {
    val name = s"min:$column"
  }

  /** max(column) must be <= `hi`. */
  final case class MaxBound(column: String, hi: Double) extends Check {
    val name = s"max:$column"
  }

  /** Fraction of rows satisfying the SQL predicate must be >=
    * `minRatio` — the cross-field invariant the single-column checks
    * can't express (`l_shipdate >= o_orderdate`,
    * `end_s > start_s`, ...). Rows where the predicate evaluates
    * null count as failing (an unknown invariant is not a satisfied
    * one).
    */
  final case class Predicate(exprSql: String, minRatio: Double)
      extends Check {
    val name = s"predicate:$exprSql"
  }

  private def predSlot(exprSql: String): String =
    s"__pred_${Integer.toHexString(exprSql.hashCode)}"

  /** Run the suite in one aggregation pass; one report row per check:
    * (check_name, value, threshold, passed). `value` is the measured
    * metric (a fraction for completeness/uniqueness, the extremum for
    * bounds) — kept in the report so a failing gate says by how much.
    */
  def assertionReport(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "assertionReport: empty suite")
    // stage 1: one agg row holding every raw metric the suite needs
    // (dedup'd by slot name so two checks on one column share a slot)
    val n = count(lit(1)).as("__n")
    val raw: Seq[(String, Column)] = checks.map {
      case Completeness(c, _) => s"__cnt_$c" -> count(col(c))
      case Uniqueness(cs, _) =>
        s"__uniq_${cs.mkString("_")}" ->
          count_distinct(struct(cs.map(col): _*))
      case MinBound(c, _) => s"__min_$c" -> min(col(c)).cast("double")
      case MaxBound(c, _) => s"__max_$c" -> max(col(c)).cast("double")
      case Predicate(p, _) =>
        predSlot(p) ->
          count(when(coalesce(expr(p), lit(false)), lit(1)))
    }
    val slots = raw.distinctBy(_._1).map { case (a, e) => e.as(a) }
    val aggRow = df.agg(n, slots: _*)
    // stage 2: per-check (name, value, threshold, passed) structs off
    // the single agg row, exploded to the long-format report
    val nD = col("__n").cast("double")
    val rows: Seq[Column] = checks.map { ck =>
      val (value, threshold, passed) = ck match {
        case Completeness(c, r) =>
          val v = col(s"__cnt_$c").cast("double") / nD
          (v, lit(r), v >= r)
        case Uniqueness(cs, r) =>
          val v = col(s"__uniq_${cs.mkString("_")}").cast("double") / nD
          (v, lit(r), v >= r)
        case MinBound(c, lo) =>
          val v = col(s"__min_$c"); (v, lit(lo), v >= lo)
        case MaxBound(c, hi) =>
          val v = col(s"__max_$c"); (v, lit(hi), v <= hi)
        case Predicate(p, r) =>
          val v = col(predSlot(p)).cast("double") / nD
          (v, lit(r), v >= r)
      }
      struct(lit(ck.name).as("check_name"), value.as("value"),
        threshold.cast("double").as("threshold"), passed.as("passed"))
    }
    aggRow
      .select(explode(array(rows: _*)).as("__r"))
      .select(col("__r.*"))
  }

  /** Referential-closure check as one report row: the fraction of
    * `df.column` values present in `ref.refColumn` must be >=
    * `minRatio`. Shaped as a left join + agg so Catalyst picks
    * broadcast for dimension-sized `ref` and a shuffle join beyond —
    * either way one pass over the fact side. Null FKs count as
    * unmatched (a null key cannot reference anything).
    */
  def referentialIntegrity(
      df: DataFrame,
      column: String,
      ref: DataFrame,
      refColumn: String,
      minRatio: Double
  ): DataFrame = {
    val keys = ref.select(col(refColumn).as("__ref")).distinct()
    val v = sum(when(col("__ref").isNotNull, 1L).otherwise(0L))
      .cast("double") / count(lit(1)).cast("double")
    df.select(col(column).as("__fk"))
      .join(keys, col("__fk") === col("__ref"), "left")
      .agg(v.as("value"))
      .select(
        lit(s"ri:$column->$refColumn").as("check_name"),
        col("value"),
        lit(minRatio).cast("double").as("threshold"),
        (col("value") >= minRatio).as("passed"))
  }

  /** Day-over-day volume anomaly detection on an event stream: count
    * per (event_type, day), then score each day against its trailing
    * `lookback`-day window with a z-score. The monitoring read of the
    * same feed the demux pipeline routes — a topic whose daily volume
    * jumps >3 sigma is a breakage signal (upstream outage, bot storm,
    * double-fire) that should gate downstream training-data pulls.
    *
    * Scale shape: the day-grain aggregate collapses the stream to
    * (#types x #days) rows BEFORE the window, so the per-type sort is
    * over day counts, never events. Trailing moments are exact
    * integer sums; the z-score is formed per-row from those longs in
    * a fixed op order and quantized to q20 (`z_q20 = floor(z*2^20)`)
    * so the report is engine-invariant. Days with fewer than
    * `minPrior` trailing observations (or zero variance) emit a null
    * score instead of a fabricated one.
    */
  def eventAnomaly(
      events: DataFrame,
      lookback: Int = 7,
      minPrior: Int = 3,
      zThreshold: Double = 3.0
  ): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-lookback, -1)
    val scored = daily
      .withColumn("t_n", count(col("n")).over(w))
      .withColumn("t_sum", sum(col("n")).over(w))
      .withColumn("t_sumsq", sum(col("n") * col("n")).over(w))
    val nD = col("n").cast("double")
    val tn = col("t_n").cast("double")
    val mean = col("t_sum").cast("double") / tn
    // var = E[x^2] - E[x]^2 over the trailing window, clamped at 0
    // (FP cancellation can push an all-equal window epsilon-negative)
    val variance =
      greatest(col("t_sumsq").cast("double") / tn - mean * mean, lit(0.0))
    val z = (nD - mean) / sqrt(variance)
    val zq = when(col("t_n") >= minPrior && variance > 0.0,
      floor(z * 1048576.0).cast("long"))
    scored
      .withColumn("z_q20", zq)
      .withColumn("anomaly",
        when(col("z_q20").isNotNull,
          abs(col("z_q20")) > (zThreshold * 1048576.0).toLong)
          .otherwise(lit(false)))
      .select(col("event_type"), col("day"), col("n"), col("t_n"),
        col("z_q20"), col("anomaly"))
  }

  /** Greedy alert-cooldown suppression — the anti-fatigue layer every
    * monitoring stack puts between anomaly DETECTION and a pager: of
    * a type's anomalous days, alert on the first, then suppress any
    * further anomaly within `cooldownDays` of the LAST EMITTED alert
    * (not the last anomaly — suppression must not slide the window).
    * That greedy recurrence is inherently sequential, but its domain
    * is the per-type anomalous-DAY list (calendar-bounded at any
    * corpus size), so it folds as one `aggregate` over the sorted
    * day array — the hierarchy-closure precedent: sequential in a
    * bounded domain, never in rows. Anomaly rule kept deliberately
    * self-contained (day count > 1.2× the type's own daily mean,
    * exact integer cross-products) so the op needs no upstream score
    * column; alert days ship as a CSV string (array finals are
    * driver-hash hazards). The anomaly ratio is `ratioNum/ratioDen`
    * (default 21/20 = 1.05x the type's own daily mean — relative
    * day-to-day variance SHRINKS as volume grows, so a wide 1.2x cut
    * that fires at validation scale goes silent at 10x the data; the
    * threshold must track the question, not the corpus size).
    *
    * CHANGELOG: before r15 the default ratio was a hard-coded 6/5
    * (1.2x) — callers who tuned alert volumes against that cut should
    * re-examine thresholds, since the 21/20 default fires on smaller
    * deviations. The `require(ratioNum > ratioDen)` also forbids a
    * ratio of exactly 1.0: this operator is an ANOMALY gate, so a
    * <=1 ratio (alert on every day at/below the mean) is a different
    * operator — to disable suppression-worthy detection entirely,
    * filter upstream rather than degenerating the ratio.
    */
  def alertCooldown(
      events: DataFrame,
      cooldownDays: Int = 3,
      ratioNum: Long = 21L,
      ratioDen: Long = 20L
  ): DataFrame = {
    require(cooldownDays >= 1,
      s"cooldownDays must be >= 1: $cooldownDays")
    require(ratioNum > ratioDen && ratioDen >= 1,
      s"anomaly ratio must exceed 1: $ratioNum/$ratioDen")
    val daily = events
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01"))
          .cast("long").as("day"))
      .agg(count(lit(1)).as("n"))
    val tot = daily.groupBy(col("event_type"))
      .agg(sum(col("n")).as("__total"), count(lit(1)).as("__n_days"))
    daily
      .join(tot, "event_type")
      .filter(col("n") * col("__n_days") * lit(ratioDen) >
        col("__total") * lit(ratioNum))
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(col("day"))).as("__days"))
      .withColumn("__alerts", expr(
        s"""aggregate(__days,
           |  named_struct('last', CAST(-1000000000 AS BIGINT),
           |    'out', CAST(array() AS ARRAY<BIGINT>)),
           |  (acc, d) -> IF(d - acc.last >= $cooldownDays,
           |    named_struct('last', d,
           |      'out', array_append(acc.out, d)),
           |    acc),
           |  acc -> acc.out)""".stripMargin))
      .select(col("event_type"),
        size(col("__days")).cast("long").as("n_anomaly_days"),
        size(col("__alerts")).cast("long").as("n_alerts"),
        expr("CAST(size(__days) - size(__alerts) AS BIGINT) " +
          "* 1000000 div size(__days)").as("suppressed_ppm"),
        array_join(col("__alerts"), ",").as("alert_days"))
  }

  /** Stream-stream join state advisor — the estimate behind the #1
    * streaming OOM: a watermarked interval join retains every row
    * younger than the join horizon, so peak state is the max over
    * time of rows-in-the-trailing-W-window. Measured from the feed
    * itself: minute-grain counts (calendar-bounded domain), a
    * sliding RANGE window of W minutes, then max / exact milli mean
    * + a byte estimate at `bytesPerRow`. One scan + one bounded
    * window; the global window runs over minutes, never events.
    */
  def streamJoinStateAdvisor(
      events: DataFrame,
      windowMinutes: Int = 60,
      bytesPerRow: Long = 64L
  ): DataFrame = {
    require(windowMinutes >= 1,
      s"windowMinutes must be >= 1: $windowMinutes")
    val byMin = events
      .groupBy(expr(
        "CAST(unix_seconds(CAST(ts AS TIMESTAMP)) div 60 AS BIGINT)")
        .as("m"))
      .agg(count(lit(1)).as("n"))
    val w = Window.orderBy(col("m"))
      .rangeBetween(-(windowMinutes - 1).toLong, 0L)
    byMin
      .withColumn("state_rows", sum(col("n")).over(w))
      .agg(
        count(lit(1)).as("n_minutes"),
        max(col("state_rows")).as("max_state_rows"),
        sum(col("state_rows")).as("__sum_state"))
      .select(
        lit(windowMinutes.toLong).as("w_minutes"),
        col("n_minutes"),
        col("max_state_rows"),
        expr("__sum_state * 1000 div n_minutes")
          .as("avg_state_rows_milli"),
        (col("max_state_rows") * lit(bytesPerRow))
          .as("max_state_bytes"))
  }

  /** Categorical mix drift over time — the chi-square screen for a
    * CATEGORY column's distribution wandering across periods (the
    * categorical sibling of the numeric KS drift): per period, the
    * independence chi-square contribution of that period's category
    * mix against the pooled mix, `Σ_cells (obs·G − rowT·colT)² /
    * (G·rowT·colT)` in exact per-cell-floored milli (per-cell floors
    * pinned as part of the statistic, the repo convention). A period
    * whose chi2 jumps is where the upstream changed its enum. One
    * cells rollup + two marginal rollups broadcast back — never a
    * period × period pass.
    */
  def categoricalMixDrift(
      df: DataFrame,
      catCol: String,
      periodExpr: Column
  ): DataFrame = {
    val cells = df
      .select(periodExpr.as("period"), col(catCol).as("cat"))
      .groupBy(col("period"), col("cat"))
      .agg(count(lit(1)).as("n"))
    val rows = cells.groupBy(col("period"))
      .agg(sum(col("n")).as("row_t"))
    val cols = cells.groupBy(col("cat"))
      .agg(sum(col("n")).as("col_t"))
    val grand = cells.agg(sum(col("n")).as("grand"))
    cells
      .join(rows, "period")
      .join(broadcast(cols), "cat")
      .crossJoin(broadcast(grand))
      .withColumn("__cell_milli", expr(
        """CAST((CAST(n AS DECIMAL(38,0)) * grand
          |  - CAST(row_t AS DECIMAL(38,0)) * col_t)
          |  * (CAST(n AS DECIMAL(38,0)) * grand
          |  - CAST(row_t AS DECIMAL(38,0)) * col_t) * 1000
          |  div (CAST(grand AS DECIMAL(38,0)) * row_t * col_t)
          |  AS BIGINT)""".stripMargin))
      .groupBy(col("period"))
      .agg(max(col("row_t")).as("n_rows"),
        count(lit(1)).as("n_cats_seen"),
        sum(col("__cell_milli")).cast("long").as("chi2_milli"))
      .orderBy(col("period"))
  }

  /** Day-over-day volume deltas per event type — the plain movement
    * report next to the anomaly scores: previous day's count, the
    * absolute delta, and the relative change in exact integer ppm
    * (`(n - prev)·10^6 div prev`). First day per type has no
    * predecessor and reports nulls. Day-grain aggregate first, so
    * the lag window sorts day counts, never events.
    */
  def eventVolumeDeltas(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    daily
      .withColumn("prev_n", lag(col("n"), 1).over(w))
      .withColumn("delta", col("n") - col("prev_n"))
      // integer-div the MAGNITUDE and re-sign: Spark `div` truncates
      // toward zero while DuckDB `//` floors, so only non-negative
      // operands are engine-equivalent (the repo's div convention)
      .withColumn("delta_ppm",
        expr("CAST(sign(delta) AS BIGINT) * " +
          "((abs(delta) * 1000000) div prev_n)"))
  }

  /** Robust twin of [[eventAnomaly]]: score each day's volume against
    * the per-type MEDIAN and MAD instead of mean/σ — a single real
    * outage day inflates the trailing σ enough to mask the next one
    * (masking), where median/MAD barely move. Exact-rank medians
    * (PERCENTILE_DISC semantics: the value at row ⌈n/2⌉ of the sorted
    * group — no interpolation, engine-exact), integer deviations,
    * and the modified z-score ⌊0.6745·dev·2^20⌋ div MAD in longs, so
    * the whole report hash-compares. Zero-MAD types (perfectly
    * constant volume) emit null scores, not fabricated ones.
    *
    * Scale shape: both median passes sort DAY COUNTS per type (the
    * day-grain aggregate again collapses the stream first); the
    * frame entering the windows is #types × #days rows.
    */
  def eventAnomalyRobust(
      events: DataFrame,
      threshold: Double = 3.5
  ): DataFrame = {
    // persisted: the day-grain aggregate feeds the median pass AND
    // the deviation join (and `dev` feeds the MAD pass and the final
    // join) — unpersisted, the event-stream scan would replay per
    // consumer; released with the events family
    val daily = graft.Caches.track("events", events
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n")))
    def medianOf(df: DataFrame, valueCol: String, as: String): DataFrame = {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col(valueCol), col("day"))
      df.withColumn("__rn", row_number().over(w))
        .withColumn("__cnt",
          count(lit(1)).over(Window.partitionBy(col("event_type"))))
        .groupBy(col("event_type"))
        .agg(max(when(col("__rn") === ceil(col("__cnt") / 2.0),
          col(valueCol))).as(as))
    }
    val med = medianOf(daily, "n", "med")
    val dev = graft.Caches.track("events", daily.join(med, "event_type")
      .withColumn("dev", abs(col("n") - col("med"))))
    val mad = medianOf(dev, "dev", "mad")
    val z = expr(s"(CAST(floor(0.6745 * dev * 1048576.0) AS BIGINT))" +
      s" div mad")
    dev.join(mad, "event_type")
      .withColumn("z_q20", when(col("mad") > 0, z))
      .withColumn("anomaly",
        when(col("z_q20").isNotNull,
          abs(col("z_q20")) > (threshold * 1048576.0).toLong)
          .otherwise(lit(false)))
      .select(col("event_type"), col("day"), col("n"), col("med"),
        col("dev"), col("mad"), col("z_q20"), col("anomaly"))
  }

  /** Day-of-week seasonal baseline — the monitoring layer the plain
    * trailing-window detectors ([[eventAnomaly]],
    * [[eventAnomalyRobust]]) are blind to: weekly seasonality makes
    * every Saturday look like an anomaly against a Mon–Fri window.
    * Per (event_type, weekday 0=Mon), the mean daily count in exact
    * milli over the observed days of that weekday; per (type, day),
    * the deviation from that baseline in milli
    * (`n·1000·n_days_dow div total_dow − 1000`, so +250 = 25 % above
    * a typical same-weekday day).
    *
    * Day-grain counts FIRST (the eventAnomaly discipline — windows
    * and joins see days, never events); the baseline table is
    * #types × 7 rows, attached by broadcast.
    */
  def dowBaseline(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("dow", weekday(col("day")).cast("int"))
    val base = daily.groupBy(col("event_type"), col("dow"))
      .agg(sum(col("n")).as("total_dow"),
        count(lit(1)).as("n_days_dow"))
    daily.join(broadcast(base), Seq("event_type", "dow"))
      .select(col("event_type"), col("day"), col("dow"), col("n"),
        expr("total_dow * 1000 div n_days_dow").as("expected_milli"),
        expr("n * 1000 * n_days_dow div total_dow - 1000")
          .as("dev_milli"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Seasonal-naive forecast backtest — the accuracy floor every
    * fancier volume forecast must beat, measured on the data's own
    * last day: forecast(type, last day) = exact-milli mean of the
    * PRIOR same-weekday daily counts, scored against the actual with
    * an exact-milli absolute percentage error. All integer
    * arithmetic off day-grain counts ([[dowBaseline]] shapes); types
    * whose last day has no prior same-weekday history emit null
    * forecast rather than a fabricated one.
    */
  def seasonalNaiveBacktest(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("dow", weekday(col("day")).cast("int"))
    val last = daily.groupBy(col("event_type"))
      .agg(max(col("day")).as("last_day"))
    val hist = daily.as("d")
      .join(last.as("l"), Seq("event_type"))
      .filter(col("d.day") < col("l.last_day") &&
        col("d.dow") === weekday(col("l.last_day")).cast("int"))
      .groupBy(col("event_type"))
      .agg(sum(col("n")).as("hist_total"),
        count(lit(1)).as("hist_days"))
    daily.join(last, Seq("event_type"))
      .filter(col("day") === col("last_day"))
      .join(hist, Seq("event_type"), "left")
      .select(col("event_type"), col("last_day"), col("n")
        .as("actual"),
        expr("hist_total * 1000 div hist_days").as("forecast_milli"))
      .withColumn("ape_milli",
        when(col("forecast_milli").isNotNull && col("actual") > 0,
          expr("abs(actual * 1000 - forecast_milli) * 1000 " +
            "div (actual * 1000)"))
          .otherwise(lit(null).cast("long")))
      .orderBy(col("event_type"))
  }

  /** Holt–Winters (additive, weekly season) one-step backtest — the
    * model-based step past [[seasonalNaiveBacktest]]: level + trend +
    * weekday-seasonal state folded over each event type's daily
    * series, scoring every post-warmup day's one-step-ahead forecast
    * and reporting MAE against the seasonal-naive baseline
    * (`skill_milli` > 1000 means the smoother beats naive — the
    * go/no-go for replacing the naive alarm threshold with the
    * model-based one).
    *
    * Exact fixed-point recursion (NO doubles anywhere): counts enter
    * in milli, smoothing weights are milli integers (α=500, β=250,
    * γ=250 by default), every smoothing division is a SIGN-SPLIT
    * `div 1000` (truncation toward zero in both engines — DuckDB `//`
    * floors negatives, so the twin sign-splits identically), so the
    * whole state trajectory is engine-bitwise. Warmup: the first
    * observation seeds the level; each weekday's first observation
    * seeds that seasonal slot (unscored); smoothing and scoring start
    * once a day's slot is seeded.
    *
    * Scale shape: the fold's domain is the per-type DAY list —
    * calendar-bounded, never row-scale (the alertCooldown contract):
    * one daily rollup scans the feed, `aggregate` folds the sorted
    * day array per type, the naive baseline is a self-join on d−7
    * over the same count-sized frame.
    */
  def holtWintersBacktest(
      events: DataFrame,
      alphaMilli: Long = 500L,
      betaMilli: Long = 250L,
      gammaMilli: Long = 250L): DataFrame = {
    require(Seq(alphaMilli, betaMilli, gammaMilli)
      .forall(w => w >= 0 && w <= 1000), "weights must be in [0,1000]")
    val daily = events
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("long")
          .as("d"))
      .agg((count(lit(1)) * 1000L).as("y"))
    // sign-split integral division by 1000: truncation toward zero,
    // identical in Spark (div) and the DuckDB twin (sign-split //)
    def tdiv(v: String) =
      s"(CASE WHEN ($v) < 0 THEN -((-($v)) div 1000) " +
        s"ELSE ($v) div 1000 END)"
    val sCur = (0 to 6).map(i => s"WHEN x.d % 7 = $i THEN acc.s$i")
      .mkString("(CASE ", " ", " END)")
    val lEff = s"(CASE WHEN acc.seen = 0 THEN x.y ELSE acc.l END)"
    val f = s"(acc.l + acc.b + $sCur)"
    val lNew = tdiv(s"$alphaMilli * (x.y - $sCur) + " +
      s"${1000 - alphaMilli} * (acc.l + acc.b)")
    val bNew = tdiv(s"$betaMilli * ($lNew - acc.l) + " +
      s"${1000 - betaMilli} * acc.b")
    val sNew = tdiv(s"$gammaMilli * (x.y - $lNew) + " +
      s"${1000 - gammaMilli} * $sCur")
    val sUpd = (0 to 6).map { i =>
      s"'s$i', CASE WHEN x.d % 7 = $i THEN (CASE WHEN $sCur IS NULL " +
        s"THEN x.y - $lEff ELSE $sNew END) ELSE acc.s$i END"
    }.mkString(", ")
    val zero = "CAST(NULL AS BIGINT)"
    val fold =
      s"""aggregate(
         |  array_sort(collect_list(struct(d, y))),
         |  named_struct(
         |    'l', CAST(0 AS BIGINT), 'b', CAST(0 AS BIGINT),
         |    's0', $zero, 's1', $zero, 's2', $zero, 's3', $zero,
         |    's4', $zero, 's5', $zero, 's6', $zero,
         |    'sae', CAST(0 AS BIGINT), 'nsc', CAST(0 AS BIGINT),
         |    'seen', CAST(0 AS BIGINT)),
         |  (acc, x) -> named_struct(
         |    'l', CASE WHEN $sCur IS NULL THEN $lEff ELSE $lNew END,
         |    'b', CASE WHEN $sCur IS NULL THEN acc.b ELSE $bNew END,
         |    $sUpd,
         |    'sae', acc.sae + CASE WHEN $sCur IS NULL THEN 0
         |      ELSE abs(x.y - $f) END,
         |    'nsc', acc.nsc + CASE WHEN $sCur IS NULL THEN 0
         |      ELSE 1 END,
         |    'seen', acc.seen + 1))""".stripMargin
    val hw = daily.groupBy(col("event_type"))
      .agg(expr(fold).as("st"))
      .select(col("event_type"), col("st.seen").as("n_days"),
        col("st.nsc").as("n_scored"),
        expr("st.sae div GREATEST(st.nsc, 1)").as("mae_milli"),
        col("st.l").as("level_milli"), col("st.b").as("trend_milli"))
    val naive = daily.as("a")
      .join(daily.as("b"),
        col("a.event_type") === col("b.event_type") &&
          col("a.d") === col("b.d") + 7)
      .groupBy(col("a.event_type").as("event_type"))
      .agg(count(lit(1)).as("naive_n"),
        sum(abs(col("a.y") - col("b.y"))).as("naive_sae"))
      .select(col("event_type"), col("naive_n"),
        expr("naive_sae div GREATEST(naive_n, 1)")
          .as("naive_mae_milli"))
    hw.join(naive, Seq("event_type"), "left")
      .withColumn("skill_milli",
        expr("naive_mae_milli * 1000 div GREATEST(mae_milli, 1)"))
      .orderBy(col("event_type"))
  }

  /** Kaplan–Meier survival estimator with right-censoring — the
    * user-lifetime read every retention effort starts from: per
    * event_type, each user's engagement lifetime runs from their
    * first to their last event day; a user whose last activity ends
    * at least `churnGapDays` before the corpus's final day is an
    * observed churn (event) at `t = last − first`, anyone still
    * active near the end is CENSORED at `t = corpusEnd − first` —
    * dropping censored users (what a naive "days active" histogram
    * does) biases survival DOWN, which is exactly the error KM
    * corrects. Output per (event_type, t): the risk set `n_risk`,
    * observed churns `d_churned`, censored exits `c_censored`, and
    * the product-limit survival `s_q20 = Π_{t'≤t} (n−d)/n` in ⌊p·2²⁰⌋
    * fixed point — every step floors, the identical recursion replays
    * in a recursive-CTE twin, so the whole curve hash-compares
    * bitwise (the [[holtWintersBacktest]] convention).
    *
    * Shape at scale: one scan to per-user bounds (map-side combinable
    * groupBy), a (type × duration)-sized table after that — duration
    * is calendar-bounded, so the sequential product folds a
    * per-type array of at most #days entries (the bounded-domain
    * fold discipline: sequential in days, never in rows or users).
    * The O(T²) prefix re-fold inside `transform` is ≤ #days² tiny
    * integer ops per type — invariant in corpus size.
    * Overflow: s_q20 ≤ 2²⁰ and n_risk ≤ #users keep the step product
    * under 2⁶³ up to ~8·10¹² users.
    */
  def kaplanMeier(
      events: DataFrame,
      churnGapDays: Int = 14
  ): DataFrame = {
    require(churnGapDays >= 1, s"churnGapDays must be >= 1")
    val life = events
      .groupBy(col("event_type"),
        col("user_id"))
      .agg(
        min(datediff(to_date(col("ts")), lit("1970-01-01"))
          .cast("long")).as("first_day"),
        max(datediff(to_date(col("ts")), lit("1970-01-01"))
          .cast("long")).as("last_day"))
    val corpusEnd = events
      .agg(max(datediff(to_date(col("ts")), lit("1970-01-01"))
        .cast("long")).as("end_day"))
    val durations = life
      .crossJoin(broadcast(corpusEnd))
      .select(col("event_type"),
        (col("last_day") <= col("end_day") - churnGapDays)
          .as("churned"),
        when(col("last_day") <= col("end_day") - churnGapDays,
          col("last_day") - col("first_day"))
          .otherwise(col("end_day") - col("first_day")).as("t"))
    val tab = durations
      .groupBy(col("event_type"), col("t"))
      .agg(sum(when(col("churned"), 1L).otherwise(0L)).as("dd"),
        sum(when(col("churned"), 0L).otherwise(1L)).as("cc"))
    // risk set relationally (total − exits before t), product via the
    // bounded-domain fold: collect the per-type day table, prefix-fold
    // the q20 survival for each row
    val wPrev = Window.partitionBy(col("event_type")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(col("event_type"))
    val risk = tab
      .withColumn("n_risk",
        sum(col("dd") + col("cc")).over(wAll) -
          coalesce(sum(col("dd") + col("cc")).over(wPrev), lit(0L)))
    risk
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(
        struct(col("t"), col("n_risk"), col("dd"), col("cc"))))
        .as("arr"))
      .select(col("event_type"), posexplode(expr(
        """transform(arr, (x, i) -> named_struct(
          |  't', x.t, 'n_risk', x.n_risk,
          |  'd_churned', x.dd, 'c_censored', x.cc,
          |  's_q20', aggregate(slice(arr, 1, i + 1),
          |    CAST(1048576 AS BIGINT),
          |    (acc, y) -> CASE WHEN y.dd > 0
          |      THEN acc * (y.n_risk - y.dd) div y.n_risk
          |      ELSE acc END)))""".stripMargin)))
      .select(col("event_type"), col("col.t").as("t"),
        col("col.n_risk").as("n_risk"),
        col("col.d_churned").as("d_churned"),
        col("col.c_censored").as("c_censored"),
        col("col.s_q20").as("s_q20"))
      .orderBy(col("event_type"), col("t"))
  }

  /** Nelson–Aalen cumulative hazard — the additive companion to
    * [[kaplanMeier]]'s multiplicative survival: H(t) = Σ_{tᵢ≤t}
    * dᵢ/nᵢ over the SAME lifetime/risk-set table (identical churn
    * censoring, identical day-grain event times). Where the KM curve
    * answers "what fraction survives past t", the hazard increments
    * localize WHEN the churn force concentrates (a step jump at
    * t = 7 is a day-7 cliff the survival curve only shows as slope),
    * and −ln(KM) ≈ NA is the standard cross-check between the two
    * estimators. Each step is floored to exact integer micro BEFORE
    * the cumulative sum (`dᵢ·10⁶ div nᵢ` — engine-bitwise; the
    * cumulative floor bias is ≤ #steps micro-units, documented), so
    * the whole curve is integer arithmetic: no q20 product fold
    * needed — hazard ACCUMULATES, so it is one window cumsum where
    * KM needs the sequential product.
    *
    * Scale shape: identical to KM through the risk table (user-grain
    * rollup, calendar-bounded step table); the cumsum window runs
    * over ≤ #days rows per type.
    */
  def nelsonAalen(
      events: DataFrame,
      churnGapDays: Int = 14
  ): DataFrame = {
    require(churnGapDays >= 1, s"churnGapDays must be >= 1")
    val life = events
      .groupBy(col("event_type"), col("user_id"))
      .agg(
        min(datediff(to_date(col("ts")), lit("1970-01-01"))
          .cast("long")).as("first_day"),
        max(datediff(to_date(col("ts")), lit("1970-01-01"))
          .cast("long")).as("last_day"))
    val corpusEnd = events
      .agg(max(datediff(to_date(col("ts")), lit("1970-01-01"))
        .cast("long")).as("end_day"))
    val durations = life
      .crossJoin(broadcast(corpusEnd))
      .select(col("event_type"),
        (col("last_day") <= col("end_day") - churnGapDays)
          .as("churned"),
        when(col("last_day") <= col("end_day") - churnGapDays,
          col("last_day") - col("first_day"))
          .otherwise(col("end_day") - col("first_day")).as("t"))
    val tab = durations
      .groupBy(col("event_type"), col("t"))
      .agg(sum(when(col("churned"), 1L).otherwise(0L)).as("dd"),
        sum(when(col("churned"), 0L).otherwise(1L)).as("cc"))
    val wPrev = Window.partitionBy(col("event_type")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(col("event_type"))
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tab
      .withColumn("n_risk",
        sum(col("dd") + col("cc")).over(wAll) -
          coalesce(sum(col("dd") + col("cc")).over(wPrev), lit(0L)))
      .withColumn("h_step_micro",
        expr("dd * 1000000 div n_risk"))
      .withColumn("h_cum_micro",
        sum(col("h_step_micro")).over(wCum))
      .select(col("event_type"), col("t"), col("n_risk"),
        col("dd").as("d_churned"), col("cc").as("c_censored"),
        col("h_step_micro"), col("h_cum_micro"))
      .orderBy(col("event_type"), col("t"))
  }

  /** Western Electric control-chart rules over a type's daily count
    * series — the run-based anomaly layer a single-point z-test
    * misses: a process can drift without any one day crossing 3σ.
    * Per (event_type, day), the four classic rules against the
    * type's OWN mean/σ (both exact: all comparisons are integer
    * cross-multiplications of (x·n − S)² against k²·(n·SS − S²), no
    * sqrt, no doubles — DECIMAL(38,0)-bridged so 10¹⁰-row days
    * can't overflow the squares):
    *   r1 — this day beyond 3σ;
    *   r2 — ≥2 of the last 3 days beyond 2σ on the SAME side;
    *   r3 — ≥4 of the last 5 days beyond 1σ on the same side;
    *   r4 — 8 consecutive days on one side of the mean.
    * `side` is the day's sign vs the mean (+1/−1/0). Rules flag the
    * day COMPLETING a pattern (standard chart convention). Windows
    * are ROWS-based over the observed day sequence — a calendar gap
    * splits no run (document gaps via [[sequenceGaps]]-style tools
    * if the feed has them).
    *
    * Shape at scale: one scan to daily counts, then windows over the
    * calendar-bounded (type × day) table — corpus growth changes
    * the COUNTS, not the frame size.
    */
  def westernElectricRules(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("long")
          .as("day"))
      .agg(count(lit(1)).as("x"))
    val tot = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
        sum(col("x").cast("decimal(19,0)") * col("x"))
          .cast("decimal(38,0)").as("ss"))
    val base = daily.join(tot, "event_type")
      .withColumn("dev",
        (col("x") * col("n") - col("s")).cast("decimal(38,0)"))
      .withColumn("varn",
        (col("n").cast("decimal(38,0)") * col("ss") -
          col("s").cast("decimal(38,0)") *
            col("s").cast("decimal(38,0)")))
      .withColumn("side",
        when(col("dev") > 0, 1L).when(col("dev") < 0, -1L)
          .otherwise(0L))
      .withColumn("b1", (col("dev") * col("dev") >
        lit(1) * col("varn")).cast("long"))
      .withColumn("b2", (col("dev") * col("dev") >
        lit(4) * col("varn")).cast("long"))
      .withColumn("b3", (col("dev") * col("dev") >
        lit(9) * col("varn")).cast("long"))
    def lastK(c: Column, k: Int): Column =
      sum(c).over(Window.partitionBy(col("event_type"))
        .orderBy(col("day")).rowsBetween(-(k - 1), 0))
    base
      .withColumn("r1", (col("b3") === 1L).cast("long"))
      .withColumn("r2", (
        lastK(col("b2") * (col("side") === 1L).cast("long"), 3) >= 2 ||
        lastK(col("b2") * (col("side") === -1L).cast("long"), 3) >= 2)
        .cast("long"))
      .withColumn("r3", (
        lastK(col("b1") * (col("side") === 1L).cast("long"), 5) >= 4 ||
        lastK(col("b1") * (col("side") === -1L).cast("long"), 5) >= 4)
        .cast("long"))
      .withColumn("r4", (
        lastK((col("side") === 1L).cast("long"), 8) === 8 ||
        lastK((col("side") === -1L).cast("long"), 8) === 8)
        .cast("long"))
      .select(col("event_type"), col("day"), col("x"), col("side"),
        col("r1"), col("r2"), col("r3"), col("r4"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Interrupted time-series (segmented regression) — the
    * before/after read for a deploy, policy change, or incident at a
    * known cut date: per event type, separate OLS level+trend fits
    * on the pre and post halves of the daily series, and the two
    * numbers a causal read needs: `level_delta_milli` (the jump
    * between the two fitted lines AT the cut) and
    * `trend_delta_milli` (the slope change) — a mean-diff hides a
    * trend that was already there; segmenting doesn't. The cut
    * defaults to the feed's own midpoint day (broadcast back, the
    * velocityTrend convention). All slopes/intercepts exact floored
    * milli via the [[theilSenTrend]] integer-OLS skeleton (days are
    * re-origined to the cut so intercept magnitudes stay small);
    * DECIMAL(38,0)-bridged cross products, sign-split twin.
    *
    * Shape at scale: one scan to daily counts; two conditional
    * aggregations over the calendar-bounded day table; one row per
    * type.
    */
  def interruptedTimeSeries(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("long")
          .as("d"))
      .agg(count(lit(1)).as("x"))
    val cut = daily.agg(
      expr("(min(d) + max(d)) div 2").as("cut_d"))
    val rel = daily.crossJoin(broadcast(cut))
      .select(col("event_type"), (col("d") - col("cut_d")).as("d"),
        col("x"), (col("d") < col("cut_d")).as("pre"))
    def fit(side: DataFrame, tag: String): DataFrame = {
      val d38 = "decimal(38,0)"
      side.groupBy(col("event_type"))
        .agg(count(lit(1)).as(s"n_$tag"),
          sum(col("d")).as("sd"), sum(col("x")).as("sx"),
          sum(col("d").cast("decimal(19,0)") * col("x"))
            .cast(d38).as("sdx"),
          sum(col("d").cast("decimal(19,0)") * col("d"))
            .cast(d38).as("sdd"))
        .select(col("event_type"), col(s"n_$tag"),
          expr(s"""CAST(CASE
            | WHEN (CAST(n_$tag AS $d38) * sdd
            |     - CAST(sd AS $d38) * sd) = 0 THEN NULL
            | ELSE (CAST(n_$tag AS $d38) * sdx
            |     - CAST(sd AS $d38) * sx) * 1000
            |   div (CAST(n_$tag AS $d38) * sdd
            |     - CAST(sd AS $d38) * sd)
            | END AS BIGINT)""".stripMargin).as(s"slope_${tag}_milli"),
          col("sd").as(s"sd_$tag"), col("sx").as(s"sx_$tag"))
        .withColumn(s"level_${tag}_milli",
          expr(s"""(sx_$tag * 1000 - slope_${tag}_milli * sd_$tag)
            | div n_$tag""".stripMargin))
        .drop(s"sd_$tag", s"sx_$tag")
    }
    fit(rel.filter(col("pre")), "pre")
      .join(fit(rel.filter(!col("pre")), "post"), "event_type")
      .crossJoin(broadcast(cut))
      .select(col("event_type"), col("cut_d"),
        col("n_pre"), col("n_post"),
        col("slope_pre_milli"), col("slope_post_milli"),
        col("level_pre_milli"), col("level_post_milli"),
        (col("slope_post_milli") - col("slope_pre_milli"))
          .as("trend_delta_milli"),
        (col("level_post_milli") - col("level_pre_milli"))
          .as("level_delta_milli"))
      .orderBy(col("event_type"))
  }

  /** Split-conformal interval calibration for the seasonal-naive
    * forecaster — does "the next value lands within q of last
    * week's" actually hold 90 % of the time: per type, absolute
    * one-week-ahead residuals split by day parity into a CALIBRATION
    * half (even epoch days) and a TEST half (odd); the conformal
    * quantile is the ⌈(n_cal+1)·0.9⌉-th smallest calibration
    * residual (the finite-sample-valid rank, clamped to n_cal), and
    * `coverage_ppm` measures how often test residuals fall within
    * it — materially below 900 000 means the error distribution
    * shifts between halves and the interval is not exchangeable-
    * valid. All ranks and counts exact integers; no distributional
    * assumption anywhere.
    *
    * Shape at scale: daily counts → a d−7 self-join on the
    * calendar-bounded day table; rank window over per-type
    * calibration residuals (day-domain-bounded); one row per type.
    */
  def conformalCoverage(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("long")
          .as("d"))
      .agg(count(lit(1)).as("x"))
    val resid = daily.as("a").join(daily.as("b"),
        col("a.event_type") === col("b.event_type") &&
          col("a.d") === col("b.d") + 7)
      .select(col("a.event_type").as("event_type"),
        col("a.d").as("d"),
        abs(col("a.x") - col("b.x")).as("r"),
        (col("a.d") % 2 === 0).as("is_cal"))
    val wRank = Window.partitionBy(col("event_type"))
      .orderBy(col("r"), col("d"))
    val cal = resid.filter(col("is_cal"))
      .withColumn("rk", row_number().over(wRank))
    val nCal = cal.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_cal"))
    val q90 = cal.join(nCal, "event_type")
      .filter(col("rk") ===
        least(col("n_cal"), expr("(9 * (n_cal + 1) + 9) div 10")))
      .select(col("event_type"), col("n_cal"), col("r").as("q90_err"))
    resid.filter(!col("is_cal"))
      .join(q90, "event_type")
      .groupBy(col("event_type"), col("n_cal"), col("q90_err"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("r") <= col("q90_err"), 1L).otherwise(0L))
          .as("n_covered"))
      .select(col("event_type"), col("n_cal"), col("n_test"),
        col("q90_err"),
        expr("n_covered * 1000000 div n_test").as("coverage_ppm"))
      .orderBy(col("event_type"))
  }

  /** Weekly growth accounting — the decomposition every growth team
    * reads before trusting a topline active-user number: this week's
    * actives split into NEW (first week ever), RETAINED (also active
    * last week) and RESURRECTED (active before, but not last week),
    * with CHURNED = last week's actives who went silent; quick
    * ratio `(new + resurrected) / churned` in milli is the one-number
    * health read (guarded NULL when nothing churned). A topline that
    * grows while the quick ratio sinks is churn masked by
    * acquisition — invisible in the aggregate.
    *
    * Shape at scale: one scan to the distinct (type, user, week)
    * activity set; everything after is self-joins of that set on
    * (type, user, week−1) plus a first-week aggregate — all
    * activity-set-sized, map-side combinable, output
    * (type × weeks)-sized.
    */
  def growthAccounting(events: DataFrame): DataFrame = {
    val a = events
      .select(col("event_type"), col("user_id"),
        call_function("div",
          datediff(to_date(col("ts")), lit("1970-01-01")).cast("long"),
          lit(7L)).as("w"))
      .distinct()
    val first = a.groupBy(col("event_type"), col("user_id"))
      .agg(min(col("w")).as("first_w"))
    val prev = a.select(col("event_type"), col("user_id"),
      (col("w") + 1).as("w"))
    val cur = a
      .join(first, Seq("event_type", "user_id"))
      .join(prev.withColumn("was_prev", lit(1L)),
        Seq("event_type", "user_id", "w"), "left")
      .select(col("event_type"), col("w"),
        when(col("first_w") === col("w"), "new")
          .when(col("was_prev").isNotNull, "retained")
          .otherwise("resurrected").as("kind"))
      .groupBy(col("event_type"), col("w"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("kind") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("kind") === "retained", 1L).otherwise(0L))
          .as("n_retained"),
        sum(when(col("kind") === "resurrected", 1L).otherwise(0L))
          .as("n_resurrected"))
    val churned = prev.join(a, Seq("event_type", "user_id", "w"),
        "left_anti")
      .groupBy(col("event_type"), col("w"))
      .agg(count(lit(1)).as("n_churned"))
    // churn weeks past the corpus horizon are bookkeeping artifacts
    val maxW = a.agg(max(col("w")).as("max_w"))
    cur.join(churned, Seq("event_type", "w"), "full_outer")
      .crossJoin(broadcast(maxW))
      .filter(col("w") <= col("max_w"))
      .select(col("event_type"), col("w"),
        coalesce(col("n_active"), lit(0L)).as("n_active"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"))
      .withColumn("quick_ratio_milli",
        when(col("n_churned") > 0,
          expr("(n_new + n_resurrected) * 1000 div n_churned")))
      .orderBy(col("event_type"), col("w"))
  }

  /** DAU/MAU stickiness — how much of the monthly audience shows up
    * on a given day: per (type, day), distinct daily actives over
    * distinct trailing-28-day actives, exact milli. The
    * distinct-over-window is computed by EXPANSION — each activity
    * row explodes to the ≤ 28 trailing window days it serves, then
    * one distinct + count — an EQUI-aggregate of 28·|activity| rows
    * (a type-keyed range join would nested-loop days × user-days
    * inside each type partition); exact and linear ×window in the
    * activity set, the right form up to ~10⁹ user-days; past that
    * swap the per-day exact sets for mergeable HLL sketches (the
    * documented approx_count_distinct route) and keep the frame.
    */
  def stickiness(events: DataFrame, windowDays: Int = 28): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1: $windowDays")
    val a = events
      .select(col("event_type"), col("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("long")
          .as("d"))
      .distinct()
    val dau = a.groupBy(col("event_type"), col("d"))
      .agg(count(lit(1)).as("dau"))
    val mau = a
      .select(col("event_type"), col("user_id"),
        explode(sequence(col("d"),
          col("d") + lit(windowDays - 1))).as("d"))
      .distinct()
      .groupBy(col("event_type"), col("d"))
      .agg(count(lit(1)).as("mau"))
    dau.join(mau, Seq("event_type", "d"))
      .withColumn("dau_mau_milli", expr("dau * 1000 div mau"))
      .orderBy(col("event_type"), col("d"))
  }

  /** Theil–Sen robust trend of a type's daily count series, with
    * the OLS slope beside it — the estimator that answers "is the
    * feed actually growing, or did three spike days drag the
    * regression": the Sen slope is the MEDIAN of all pairwise
    * day-to-day slopes, with breakdown point ~29 % (a third of the
    * days can be garbage before it moves), while OLS bends to a
    * single outlier; `delta_milli` between them is the outlier-
    * contamination read. Slopes in exact milli with Spark-`div`
    * truncation; the median of an even pair count is the
    * truncated-toward-zero half of the two middle values' sum —
    * both replayed sign-split in the SQL twin (the cuped
    * convention; DuckDB `//` floors negatives).
    *
    * Shape at scale: one scan to daily counts; the pair build is
    * (calendar days)² per type — bounded at any corpus size (the
    * [[kaplanMeier]] bounded-domain discipline) — and the median
    * folds a sorted in-memory array of that bounded pair list.
    */
  def theilSenTrend(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("long")
          .as("d"))
      .agg(count(lit(1)).as("x"))
    val pairs = daily.as("a").join(daily.as("b"),
        col("a.event_type") === col("b.event_type") &&
          col("a.d") < col("b.d"))
      .select(col("a.event_type").as("event_type"),
        expr("(b.x - a.x) * 1000 div (b.d - a.d)").as("slope_milli"))
    val sen = pairs
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(col("slope_milli"))).as("arr"))
      .select(col("event_type"),
        size(col("arr")).cast("long").as("n_pairs"),
        expr("""CASE WHEN size(arr) % 2 = 1
          |  THEN element_at(arr,
          |    CAST((size(arr) + 1) div 2 AS INT))
          |  ELSE (element_at(arr, CAST(size(arr) div 2 AS INT))
          |    + element_at(arr,
          |        CAST(size(arr) div 2 + 1 AS INT))) div 2
          |END""".stripMargin).as("sen_slope_milli"))
    val ols = daily
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("d")).as("sd"), sum(col("x")).as("sx"),
        sum(col("d").cast("decimal(19,0)") * col("x"))
          .cast("decimal(38,0)").as("sdx"),
        sum(col("d").cast("decimal(19,0)") * col("d"))
          .cast("decimal(38,0)").as("sdd"))
      .select(col("event_type"), col("n_days"),
        // DECIMAL(38,0)-bridged cross products: day-number x count
        // sums overflow BIGINT near 10^10-row days
        expr("""CAST((CAST(n_days AS DECIMAL(38,0)) * sdx
          |   - CAST(sd AS DECIMAL(38,0)) * sx) * 1000
          | div (CAST(n_days AS DECIMAL(38,0)) * sdd
          |   - CAST(sd AS DECIMAL(38,0)) * sd) AS BIGINT)"""
          .stripMargin).as("ols_slope_milli"))
    sen.join(ols, "event_type")
      .select(col("event_type"), col("n_days"), col("n_pairs"),
        col("sen_slope_milli"), col("ols_slope_milli"),
        (col("ols_slope_milli") - col("sen_slope_milli"))
          .as("delta_milli"))
      .orderBy(col("event_type"))
  }

  /** One-pass column profile — the "what is actually in this table"
    * report run before writing assertions ([[assertionReport]]
    * checks EXPECTATIONS; this DISCOVERS them): per listed column,
    * null count, exact distinct count, and min/max rendered as
    * strings, all from a single aggregation over one scan, unpivoted
    * to a row per column.
    *
    * The exact distinct counts make this the one Expand-plan member
    * beside the uniqueness check (documented there): #cols × the
    * scan feeds the partial aggregation — the price of exactness;
    * swap approx_count_distinct in at 100 TB when ±2% is
    * acceptable. Min/max stringification is engine-stable for
    * integral, string, and date columns — profile doubles through
    * a decimal cast upstream if they must appear here.
    */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    // names are spliced into a stack() expression — restrict to
    // plain identifiers so a dotted/quoted name can't mis-parse
    cols.foreach(c => require(c.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"columnProfile needs plain identifier column names, got '$c'"))
    // Per-column value histogram (r18 optimization): the one-pass
    // multi-countDistinct form planned as an Expand — (#cols + 1)×
    // the fact through the aggregate — where each column's four
    // statistics all derive from its OWN (value, count) histogram:
    // nulls/rows from the counts, distinct/min/max from the group
    // keys. One narrow columnar scan + one distinct-value-sized
    // exchange per column (map-side partial dedup), no Expand, and
    // with parquet column pruning the total bytes read are identical
    // to the single wide scan.
    val per = cols.map { c =>
      df.groupBy(col(c).as("__v"))
        .agg(count(lit(1)).as("__ct"))
        .agg(
          // coalesce: an empty input has zero groups, where the old
          // count(lit(1)) form emitted n_rows = 0, not NULL
          coalesce(sum(col("__ct")), lit(0L)).as("n_rows"),
          sum(when(col("__v").isNull, col("__ct")).otherwise(0L))
            .as("n_nulls"),
          count(col("__v")).as("n_distinct"),
          min(col("__v")).cast("string").as("min_v"),
          max(col("__v")).cast("string").as("max_v"))
        .select(col("n_rows"), lit(c).as("col_name"),
          col("n_nulls"), col("n_distinct"), col("min_v"),
          col("max_v"))
    }
    per.reduce(_.unionByName(_))
      .orderBy(col("col_name"))
  }

  /** Feed-freshness audit — the staleness gate run before trusting a
    * multi-feed warehouse snapshot (a feed whose newest row lags the
    * table's high-water mark is late, stuck, or dead upstream): per
    * `feed` key, event count, newest timestamp in exact epoch-ms,
    * lag behind the global max, and the stale flag at `maxLagMs`.
    * Two narrow max-aggregations (per-feed + global, both map-side
    * combined) and a broadcast 1-row attach — nothing leaves the
    * reducers but #feeds rows.
    */
  def freshness(events: DataFrame, key: Column,
      maxLagMs: Long): DataFrame = {
    require(maxLagMs >= 0, s"maxLagMs must be >= 0, got $maxLagMs")
    val per = events.groupBy(key.as("feed"))
      .agg(count(lit(1)).as("n_events"),
        max(unix_millis(col("ts"))).as("last_ms"))
    val global = events.agg(
      max(unix_millis(col("ts"))).as("global_ms"))
    per.crossJoin(broadcast(global))
      .select(col("feed"), col("n_events"), col("last_ms"),
        (col("global_ms") - col("last_ms")).as("lag_ms"))
      .withColumn("stale", col("lag_ms") > maxLagMs)
      .orderBy(col("feed"))
  }

  /** Exact two-sample Kolmogorov–Smirnov drift statistic on a numeric
    * column — the whole-DISTRIBUTION member of the drift family
    * (`Text.qualityDrift`/`embeddingDriftPsi` compare binned masses,
    * which a bin-width choice can blur; KS is binning-free:
    * `D = max_x |ECDF_ref(x) − ECDF_cur(x)|`). Emitted exactly in
    * integer arithmetic: `d_num = max_v |n_cur·cum_ref(v) −
    * n_ref·cum_cur(v)|` over the MERGED distinct values, so
    * `D = d_num/(n_ref·n_cur)` and `ks_ppm = d_num·10⁶ div
    * (n_ref·n_cur)` hash-compares; `at_value` is the smallest value
    * attaining the max (deterministic tie-break). Overflow bound
    * (kappa convention): n_ref·n_cur < 2⁶³ — to ~3·10⁹ rows a side.
    *
    * Shape at scale: one groupBy(value) histogram per side (map-side
    * combined), a histogram-keyed full-outer join, and a cumulative
    * window over the MERGED VALUE HISTOGRAM — the rangeBoundaries
    * posture: bounded by the distinct-value count, the rows
    * themselves never sort. For a truly continuous high-cardinality
    * column, quantize upstream (the histogram IS the table there).
    *
    * NULL contract: an ECDF is undefined at NULL, so null rows are
    * EXCLUDED from both sides (and from n_ref/n_cur) before the
    * histograms. Without the filter, two half-broken behaviors
    * compose silently: null group keys never match in the full-outer
    * join (each side's null row sees the other as 0) and Spark's
    * `Window.orderBy` sorts NULLS FIRST while SQL twins typically
    * sort NULLS LAST — cumulative sums then diverge between engines
    * whenever nulls are present. Callers who care how MUCH mass is
    * null should compare null fractions separately (a completeness
    * check, not a distribution drift).
    */
  def ksDrift(ref: DataFrame, cur: DataFrame,
      colName: String): DataFrame = {
    val h1 = ref.filter(col(colName).isNotNull)
      .groupBy(col(colName).as("v"))
      .agg(count(lit(1)).as("c1"))
    val h2 = cur.filter(col(colName).isNotNull)
      .groupBy(col(colName).as("v"))
      .agg(count(lit(1)).as("c2"))
    val m = h1.join(h2, Seq("v"), "full_outer")
      .select(col("v"), coalesce(col("c1"), lit(0L)).as("c1"),
        coalesce(col("c2"), lit(0L)).as("c2"))
    val tot = m.agg(sum(col("c1")).as("n_ref"),
      sum(col("c2")).as("n_cur"))
    // bounded window: merged distinct values only (histogram-sized)
    val w = Window.orderBy(col("v"))
    val d = m
      .select(col("v"), sum(col("c1")).over(w).as("cum1"),
        sum(col("c2")).over(w).as("cum2"))
      .crossJoin(broadcast(tot))
      .select(col("v"), col("n_ref"), col("n_cur"),
        abs(col("n_cur") * col("cum1") - col("n_ref") * col("cum2"))
          .as("dn"))
    d.groupBy(col("n_ref"), col("n_cur"))
      .agg(max(col("dn")).as("d_num"),
        (-max(struct(col("dn"), (-col("v")).as("nv")))("nv"))
          .as("at_value"))
      .select(col("n_ref"), col("n_cur"), col("d_num"),
        expr("d_num * 1000000 div (n_ref * n_cur)").as("ks_ppm"),
        col("at_value"))
  }

  /** Exact first-significant-digit distributions (hardcoded
    * `floor(log10(1+1/d)·1e6)` — shared verbatim with SQL twins so
    * both engines join the same literals; truncated sum = 999995).
    */
  val benfordPpm: Seq[(Int, Long)] = Seq(
    1 -> 301029L, 2 -> 176091L, 3 -> 124938L, 4 -> 96910L,
    5 -> 79181L, 6 -> 66946L, 7 -> 57991L, 8 -> 51152L,
    9 -> 45757L)

  /** Benford first-digit audit — the classic anomaly screen for
    * "organically grown" numeric columns (amounts, populations,
    * transaction totals): their first significant digits follow
    * `P(d) = log10(1+1/d)`, and fabricated / truncated / defaulted
    * data visibly doesn't. Per group: observed vs expected ppm per
    * digit 1–9 and the group's total-variation deviation
    * `tvd_ppm = Σ|obs−exp| div 2` — in exact truncated-integer ppm,
    * like [[ksDrift]]'s cross-multiplied statistic.
    *
    * Contract: rows with NULL or `value < 1` are excluded (the first
    * significant digit of a sub-unit value needs decimal-shift state
    * this stays deliberately free of); the first digit is taken from
    * `floor(value)` — an explicit FLOOR, because a bare
    * decimal→integer CAST truncates in Spark but ROUNDS in DuckDB.
    * Digits a group never produced still enter the TVD with their
    * full expected mass, via a groups × 9-digit domain completion
    * (`groupCols` are therefore expected to be low-cardinality
    * dimensions — the completed domain is dims×9 rows).
    *
    * Shape at scale: one partial-aggregated scan of the data down to
    * (group, digit) counts, then all arithmetic on the ≤ 9·|groups|
    * rollup: a broadcast 9-row literal join and two domain-bounded
    * windows. No data-sized shuffle beyond the count groupBy.
    */
  def benfordAudit(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String] = Nil
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val grp = groupCols.map(col)
    val digit = substring(floor(col(valueCol)).cast("long")
      .cast("string"), 1, 1).cast("int")
    val counts = df
      .filter(col(valueCol).isNotNull && col(valueCol) >= 1)
      .groupBy(grp :+ digit.as("digit"): _*)
      .agg(count(lit(1)).as("n"))
    val groups = counts.select(grp: _*).distinct()
    val benford = benfordPpm.toDF("digit", "benford_ppm")
    val domain = groups.crossJoin(broadcast(benford))
    val full = domain.join(counts, groupCols :+ "digit", "left")
      .select(grp ++ Seq(col("digit"), col("benford_ppm"),
        coalesce(col("n"), lit(0L)).as("n")): _*)
    val wg = Window.partitionBy(grp: _*)
    full
      .withColumn("total", sum(col("n")).over(wg))
      .withColumn("obs_ppm",
        when(col("total") > 0,
          expr("n * 1000000 div total")).otherwise(lit(0L)))
      .withColumn("dev_ppm", abs(col("obs_ppm") - col("benford_ppm")))
      .withColumn("dev_sum", sum(col("dev_ppm")).over(wg))
      .select(grp ++ Seq(col("digit"), col("n"), col("total"),
        col("obs_ppm"), col("benford_ppm"), col("dev_ppm"),
        expr("dev_sum div 2").as("tvd_ppm")): _*)
  }

  /** Two-sided CUSUM level-shift detector over the daily event-count
    * series — the sequential member of the drift family ([[ksDrift]]
    * compares two STATIC snapshots; CUSUM watches ONE ordered series
    * and flags the day a sustained shift becomes undeniable, the
    * Page 1954 statistic every feed-health monitor reimplements):
    * upward `s_hi(d) = max(0, s_hi(d−1) + x_d − mean − k)` and the
    * mirrored downward `s_lo`, alarm when either exceeds `h`, with
    * allowance `k` and threshold `h` expressed in milli of the mean
    * daily count so the detector is scale-free.
    *
    * The reset-at-zero recurrence needs NO recursion: with
    * `y_d = x_d − mean − k` and prefix sums `P_d = Σ_{j≤d} y_j`,
    * `s_d = P_d − min(0, min_{j≤d} P_j)` exactly — so the whole
    * detector is two running-sum/running-min windows over the DAY
    * rollup, and the oracle twin is plain window SQL (no recursive
    * CTE). All arithmetic is exact integers (mean, k, h floor-divide;
    * deviations are exact counts).
    *
    * Shape at scale: one partial-aggregated scan to the per-day
    * rollup; the unpartitioned windows run over #days rows —
    * calendar-bounded at any corpus size (the ksDrift histogram
    * posture). NULL timestamps are excluded by contract.
    */
  def cusumShift(
      events: DataFrame,
      kMilli: Long = 100L,
      hMilli: Long = 4000L
  ): DataFrame = {
    require(kMilli >= 0 && hMilli > 0,
      s"allowance/threshold must be >= 0 / > 0, got $kMilli/$hMilli")
    val daily = events.filter(col("ts").isNotNull)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("x"))
    val tot = daily.agg(sum(col("x")).as("total"),
      count(lit(1)).as("n_days"))
    val base = daily.crossJoin(broadcast(tot))
      .withColumn("mean_x", expr("total div n_days"))
      .withColumn("allow_k", expr(s"(mean_x * $kMilli) div 1000"))
      .withColumn("thresh_h", expr(s"(mean_x * $hMilli) div 1000"))
    // bounded window: day rollup only (calendar-sized)
    val w = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("p_hi",
        sum(col("x") - col("mean_x") - col("allow_k")).over(w))
      .withColumn("p_lo",
        sum(col("mean_x") - col("x") - col("allow_k")).over(w))
      .withColumn("s_hi",
        col("p_hi") - least(lit(0L), min(col("p_hi")).over(w)))
      .withColumn("s_lo",
        col("p_lo") - least(lit(0L), min(col("p_lo")).over(w)))
      .select(col("d"), col("x"), col("mean_x"), col("thresh_h"),
        col("s_hi"), col("s_lo"),
        (col("s_hi") > col("thresh_h")).as("alarm_hi"),
        (col("s_lo") > col("thresh_h")).as("alarm_lo"))
  }

  /** Functional-dependency audit — does column A determine column
    * B? The schema-governance primitive behind "can we normalize
    * this out / trust this as a lookup key": for the candidate FD
    * `lhs → rhs`, the minimum number of rows that would have to
    * change for it to hold exactly (per lhs value, everything
    * outside the majority rhs is a violation:
    * `violations = Σ_a (n_a − max_b n_{a,b})`), plus the violating
    * key count and the exact violation ppm. `holds` means zero
    * violations. NULLs in either column are excluded (SQL FDs are
    * defined over non-null tuples here; count null mass separately
    * with a completeness check).
    *
    * Shape at scale: one partial-aggregated scan to the
    * (lhs, rhs) pair rollup, a rollup-sized groupBy to per-lhs
    * majorities, one aggregate row out. No windows, no joins.
    */
  def fdAudit(
      df: DataFrame,
      lhs: String,
      rhs: String
  ): DataFrame = {
    val pairs = df
      .filter(col(lhs).isNotNull && col(rhs).isNotNull)
      .groupBy(col(lhs).as("a"), col(rhs).as("b"))
      .agg(count(lit(1)).as("ct"))
    pairs.groupBy(col("a"))
      .agg(sum(col("ct")).as("n_a"), max(col("ct")).as("max_b"),
        count(lit(1)).as("n_b_distinct"))
      .agg(
        count(lit(1)).as("n_keys"),
        sum(col("n_a")).as("n_rows"),
        sum(col("n_a") - col("max_b")).as("violations"),
        sum(when(col("n_b_distinct") > 1, 1L).otherwise(0L))
          .as("violating_keys"))
      .select(
        lit(s"$lhs->$rhs").as("fd"),
        col("n_rows"), col("n_keys"), col("violating_keys"),
        col("violations"),
        expr("""CAST(CAST(violations AS DECIMAL(38,0)) * 1000000
          div n_rows AS BIGINT)""").as("violation_ppm"),
        (col("violations") === 0L).as("holds"))
  }

  /** Burstiness (Fano factor / index of dispersion) of the daily
    * event count per type — the overdispersion audit that separates
    * organic traffic from bot storms and double-fires: a Poisson
    * feed has variance ≈ mean (`fano_milli ≈ 1000`); bursty feeds
    * run far above, metronomic synthetic feeds far below. Computed
    * exactly: `fano = s²/μ = (n·Σx² − (Σx)²) div ((n−1)·Σx)` over
    * the (type × day) rollup, with the squares in DECIMAL(38,0)
    * (a 10¹¹-events/day feed squares past BIGINT). Types with one
    * day or zero mean emit NULL.
    *
    * Shape at scale: one partial-aggregated scan to (type, day),
    * one rollup-sized agg per type — calendar-bounded, no windows.
    */
  def burstiness(events: DataFrame): DataFrame = {
    val daily = events.filter(col("ts").isNotNull)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("x"))
    daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("x")).as("sum_x"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("sum_x2"))
      .select(col("event_type"), col("n_days"), col("sum_x"),
        expr("CAST(sum_x * 1000 div n_days AS BIGINT)")
          .as("mean_milli"),
        when(col("n_days") > 1 && col("sum_x") > 0,
          expr("""CAST((CAST(n_days AS DECIMAL(38,0)) * sum_x2
            - CAST(sum_x AS DECIMAL(38,0)) * sum_x) * 1000
            div (CAST(n_days - 1 AS DECIMAL(38,0)) * sum_x)
            AS BIGINT)""")).as("fano_milli"))
  }

  /** Exact winsorized mean per group — the robust-mean audit for
    * heavy-tailed metrics (a handful of bot sessions or billing
    * errors should not move the reported average): values below the
    * `loPpm` percentile clip UP to it, above `hiPpm` clip DOWN, and
    * the mean is taken over the clipped column — all EXACTLY, on the
    * per-group value histogram, no per-row sort: the clip points are
    * `v_lo = min{v : cum(v) ≥ ⌈n·loPpm/10⁶⌉}` (and likewise `v_hi`),
    * and the winsorized sum assembles from three histogram slices
    * (mass below pays `v_lo`, inside pays itself, above pays
    * `v_hi`).
    *
    * Contract: integer-valued bounded-domain column (quantize
    * upstream — the histogram is value-domain-sized, the ksDrift
    * posture); NULLs excluded; `0 ≤ loPpm ≤ hiPpm ≤ 10⁶`. Overflow
    * (kappa convention): `Σv·1000 < 2⁶³`.
    */
  def winsorizedMean(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String] = Nil,
      loPpm: Long = 50000L,
      hiPpm: Long = 950000L
  ): DataFrame = {
    require(loPpm >= 0 && loPpm <= hiPpm && hiPpm <= 1000000L,
      s"percentile bounds invalid: $loPpm/$hiPpm")
    val grp = groupCols.map(col)
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy(grp :+ col(valueCol).cast("long").as("v"): _*)
      .agg(count(lit(1)).as("ct"))
    val wAsc = Window.partitionBy(grp: _*).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(grp: _*)
    val ranked = hist
      .withColumn("cum_le", sum(col("ct")).over(wAsc))
      .withColumn("n", sum(col("ct")).over(wAll))
      .withColumn("k_lo",
        expr(s"(n * $loPpm + 999999) div 1000000"))
      .withColumn("k_hi",
        expr(s"(n * $hiPpm + 999999) div 1000000"))
      .withColumn("v_lo",
        min(when(col("cum_le") >= col("k_lo"), col("v"))).over(wAll))
      .withColumn("v_hi",
        min(when(col("cum_le") >= col("k_hi"), col("v"))).over(wAll))
    ranked
      .groupBy(grp: _*)
      .agg(max(col("n")).as("n"),
        max(col("v_lo")).as("v_lo"), max(col("v_hi")).as("v_hi"),
        sum((col("ct") * col("v")).cast("decimal(38,0)"))
          .as("raw_sum"),
        sum((col("ct") *
          greatest(least(col("v"), col("v_hi")), col("v_lo")))
          .cast("decimal(38,0)")).as("wins_sum"))
      .select(grp ++ Seq(col("n"), col("v_lo"), col("v_hi"),
        expr("CAST(raw_sum * 1000 div n AS BIGINT)")
          .as("raw_mean_milli"),
        expr("CAST(wins_sum * 1000 div n AS BIGINT)")
          .as("wins_mean_milli")): _*)
  }

  /** Leave-one-group-out ROC-AUC influence — the data-valuation
    * member of the audit family (`Text.sourceInfluence` asks how a
    * source moves a MEAN; this asks how it moves the classifier's
    * separability): for every group g, the corpus-level AUC computed
    * WITHOUT g's rows, and `influence_ppm = auc_without − auc_all`
    * (positive ⇒ dropping the source IMPROVES separation ⇒ the
    * source is hurting the signal). No per-group rescan: the
    * (group × score) count rollup plus the per-score global rollup
    * give every excluded histogram by subtraction
    * (`pos_ex = pos_s − pos_g` over the groups × scores completed
    * domain), and each group's Mann–Whitney sum runs as a window
    * PARTITIONED by group over score-domain-bounded frames — same
    * DECIMAL(38,0) `auc2` convention as [[rocAuc]].
    *
    * Contract as [[rocAuc]]: bounded integer score, 0/1 label, NULLs
    * excluded; `groupCol` low-cardinality (the completed domain is
    * |groups| × |scores|). Groups whose exclusion leaves one class
    * empty emit NULL.
    */
  def rocAucInfluence(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      groupCol: String
  ): DataFrame = {
    val base = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull &&
        col(groupCol).isNotNull)
      .select(col(groupCol).as("grp"),
        col(scoreCol).cast("long").as("score"),
        col(labelCol).as("y"))
    val cg = base.groupBy(col("grp"), col("score"))
      .agg(sum(when(col("y") =!= 0, 1L).otherwise(0L)).as("pos_g"),
        sum(when(col("y") === 0, 1L).otherwise(0L)).as("neg_g"))
    val cs = cg.groupBy(col("score"))
      .agg(sum(col("pos_g")).as("pos_s"), sum(col("neg_g")).as("neg_s"))
    // global AUC over the score histogram (bounded window)
    val wS = Window.orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAllS = Window.partitionBy()
    val glob = cs
      .withColumn("cum_neg_le", sum(col("neg_s")).over(wS))
      .withColumn("p", sum(col("pos_s")).over(wAllS))
      .withColumn("nn", sum(col("neg_s")).over(wAllS))
      .withColumn("auc2",
        sum(col("pos_s").cast("decimal(38,0)") *
          (lit(2L) * (col("cum_neg_le") - col("neg_s")) +
            col("neg_s"))).over(wAllS))
      .select(col("p"), col("nn"), col("auc2")).limit(1)
      .select(
        when(col("p") > 0 && col("nn") > 0,
          expr("""CAST(auc2 * 1000000
            div (CAST(2 AS DECIMAL(38,0)) * p * nn) AS BIGINT)"""))
          .as("auc_all_ppm"))
    // groups × scores completed domain, excluded histograms by
    // subtraction, one partitioned window pass for every group
    val domain = cg.select(col("grp")).distinct()
      .crossJoin(cs)
    val ex = domain.join(cg, Seq("grp", "score"), "left")
      .select(col("grp"), col("score"),
        (col("pos_s") - coalesce(col("pos_g"), lit(0L))).as("pos_ex"),
        (col("neg_s") - coalesce(col("neg_g"), lit(0L))).as("neg_ex"))
    val wG = Window.partitionBy(col("grp")).orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAllG = Window.partitionBy(col("grp"))
    ex
      .withColumn("cum_neg_le", sum(col("neg_ex")).over(wG))
      .withColumn("p", sum(col("pos_ex")).over(wAllG))
      .withColumn("nn", sum(col("neg_ex")).over(wAllG))
      .withColumn("auc2",
        sum(col("pos_ex").cast("decimal(38,0)") *
          (lit(2L) * (col("cum_neg_le") - col("neg_ex")) +
            col("neg_ex"))).over(wAllG))
      .groupBy(col("grp"))
      .agg(max(col("p")).as("n_pos_ex"), max(col("nn")).as("n_neg_ex"),
        max(col("auc2")).as("auc2_ex"))
      .crossJoin(broadcast(glob))
      .select(col("grp"), col("n_pos_ex"), col("n_neg_ex"),
        when(col("n_pos_ex") > 0 && col("n_neg_ex") > 0,
          expr("""CAST(auc2_ex * 1000000
            div (CAST(2 AS DECIMAL(38,0)) * n_pos_ex * n_neg_ex)
            AS BIGINT)""")).as("auc_without_ppm"),
        col("auc_all_ppm"))
      .withColumn("influence_ppm",
        col("auc_without_ppm") - col("auc_all_ppm"))
  }

  /** Spearman rank correlation between two integer-valued columns —
    * the monotone-association audit ("does doc length predict token
    * count / quality / dup rate?") computed WITHOUT a global per-row
    * rank sort: each column collapses to its value histogram, the
    * tie-averaged rank of every distinct value is assembled there
    * (`rank2(v) = 2·cum_below + ct + 1`, twice the midrank so it
    * stays integer), and quantizes to a ppm rank percentile
    * `r_ppm = rank2·10⁶ div 2n`. The correlation is then Pearson
    * over the per-row (rx_ppm, ry_ppm) pairs, assembled from the
    * OBSERVED (x, y) pair rollup with the rank tables attached by
    * broadcast — the data is scanned once for the rollup and never
    * again.
    *
    * Exactness convention: the moment sums run in DECIMAL(38,0)
    * (ct·rx·ry ~ 10²⁴ per term at n = 10¹²) and every emitted moment
    * is floor-divided by n back into bounded ppm/ppm² integers
    * (`e_xy_pp2 ≤ 10¹²`), so the skeleton hash-compares at any scale;
    * `rho_milli = ⌊cov·1000/√(var_x·var_y)⌋` rides IEEE sqrt/divide
    * on those bounded integers (deterministic across engines;
    * NULL when either variance is 0). The div-before-combine
    * quantization is the documented contract — both engines apply
    * the identical floor order.
    *
    * Contract: both columns integer-valued with BOUNDED domains
    * (quantize upstream — histograms and the pair rollup are
    * domain-sized, the ksDrift posture); NULL in either column
    * excludes the row.
    */
  def spearmanRho(
      df: DataFrame,
      xCol: String,
      yCol: String
  ): DataFrame = {
    val base = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("long").as("x"),
        col(yCol).cast("long").as("y"))
    val pairs = base.groupBy(col("x"), col("y"))
      .agg(count(lit(1)).as("ct"))
    def rankTable(vc: String, rName: String) = {
      val hist = pairs.groupBy(col(vc))
        .agg(sum(col("ct")).as("c"))
      // bounded window: distinct-value histogram only
      val w = Window.orderBy(col(vc))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = hist.agg(sum(col("c")).as("n"))
      hist
        .withColumn("cum_le", sum(col("c")).over(w))
        .crossJoin(broadcast(tot))
        .select(col(vc),
          expr("(2 * (cum_le - c) + c + 1) * 1000000 div (2 * n)")
            .as(rName),
          col("n"))
    }
    val xr = rankTable("x", "rx_ppm").drop("n")
    val yr = rankTable("y", "ry_ppm")
    pairs
      .join(broadcast(xr), "x")
      .join(broadcast(yr), "y")
      .agg(
        max(col("n")).as("n"),
        sum(col("ct") * col("rx_ppm")).cast("decimal(38,0)")
          .as("sx"),
        sum(col("ct") * col("ry_ppm")).cast("decimal(38,0)")
          .as("sy"),
        sum(col("ct").cast("decimal(38,0)") * col("rx_ppm") *
          col("ry_ppm")).as("sxy"),
        sum(col("ct").cast("decimal(38,0)") * col("rx_ppm") *
          col("rx_ppm")).as("sx2"),
        sum(col("ct").cast("decimal(38,0)") * col("ry_ppm") *
          col("ry_ppm")).as("sy2"))
      .select(col("n"),
        expr("CAST(sx div n AS BIGINT)").as("mean_rx_ppm"),
        expr("CAST(sy div n AS BIGINT)").as("mean_ry_ppm"),
        expr("CAST(sxy div n AS BIGINT)").as("e_xy_pp2"),
        expr("CAST(sx2 div n AS BIGINT)").as("e_x2_pp2"),
        expr("CAST(sy2 div n AS BIGINT)").as("e_y2_pp2"))
      .withColumn("cov_pp2",
        expr("e_xy_pp2 - mean_rx_ppm * mean_ry_ppm"))
      .withColumn("var_x_pp2",
        expr("e_x2_pp2 - mean_rx_ppm * mean_rx_ppm"))
      .withColumn("var_y_pp2",
        expr("e_y2_pp2 - mean_ry_ppm * mean_ry_ppm"))
      .withColumn("rho_milli",
        when(col("var_x_pp2") > 0 && col("var_y_pp2") > 0,
          floor(col("cov_pp2").cast("double") * 1000.0 /
            sqrt(col("var_x_pp2").cast("double") *
              col("var_y_pp2").cast("double"))).cast("long")))
  }

  /** Exact tie-corrected ROC-AUC of an integer score against a 0/1
    * label — the rank statistic behind every "does the quality
    * classifier actually separate?" audit, computed WITHOUT a global
    * per-row sort: the data collapses to a per-(group, score) count
    * rollup first, and the Mann–Whitney pair count is assembled on
    * that rollup with bounded windows — `auc2 = Σ_v pos_v ·
    * (2·neg_below(v) + neg_v)` (each tied (pos, neg) pair counts
    * once, each strictly-ordered pair twice), so
    * `AUC = auc2 / (2·P·N)` and `auc_ppm = auc2·10⁶ div (2·P·N)` is
    * an exact integer. The `auc2` sum runs in DECIMAL(38,0)
    * (HUGEINT on the oracle side): at P = N = 10¹² the numerator is
    * ~10³⁰ — far past BIGINT, inside DECIMAL(38) headroom.
    *
    * Each rollup row also carries its ROC point under the
    * "predict positive when score ≥ v" sweep: `tpr_ppm`/`fpr_ppm`
    * are the positive/negative mass at or above v — the audit-
    * readable curve the scalar AUC summarizes. One-class groups
    * (P = 0 or N = 0) emit NULL for the undefined ratios instead of
    * failing the whole report.
    *
    * Contract: `scoreCol` must be integer-valued with a BOUNDED
    * domain (quantize upstream — the rollup and its windows are
    * domain-sized, the ksDrift posture); `labelCol` is 0/1; NULL
    * score or label rows are excluded. `groupCols` should be
    * low-cardinality dimensions; with groups the windows partition
    * by group (no global window at all).
    *
    * Shape at scale: one partial-aggregated scan to the
    * (group × score) rollup, then windows over rollup rows only.
    */
  def rocAuc(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      groupCols: Seq[String] = Nil
  ): DataFrame = {
    val grp = groupCols.map(col)
    val counts = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(grp :+ col(scoreCol).cast("long").as("score"): _*)
      .agg(
        sum(when(col(labelCol) =!= 0, 1L).otherwise(0L)).as("pos_at"),
        sum(when(col(labelCol) === 0, 1L).otherwise(0L)).as("neg_at"))
    val wAsc = Window.partitionBy(grp: _*).orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(grp: _*)
    counts
      .withColumn("cum_pos_le", sum(col("pos_at")).over(wAsc))
      .withColumn("cum_neg_le", sum(col("neg_at")).over(wAsc))
      .withColumn("n_pos", sum(col("pos_at")).over(wAll))
      .withColumn("n_neg", sum(col("neg_at")).over(wAll))
      .withColumn("auc2",
        sum(col("pos_at").cast("decimal(38,0)") *
          (lit(2L) * (col("cum_neg_le") - col("neg_at")) +
            col("neg_at"))).over(wAll))
      .select(grp ++ Seq(
        col("score"), col("pos_at"), col("neg_at"),
        when(col("n_pos") > 0,
          expr("""(n_pos - (cum_pos_le - pos_at)) * 1000000
            div n_pos""")).as("tpr_ppm"),
        when(col("n_neg") > 0,
          expr("""(n_neg - (cum_neg_le - neg_at)) * 1000000
            div n_neg""")).as("fpr_ppm"),
        col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          expr("""CAST(auc2 * 1000000
            div (CAST(2 AS DECIMAL(38,0)) * n_pos * n_neg)
            AS BIGINT)""")).as("auc_ppm")): _*)
  }

  /** Exact reliability diagram (calibration curve) for a fixed-point
    * score in `[0, 2^scaleBits)` against a 0/1 label — the hard term
    * of the Murphy Brier decomposition. Bins the score into `nBins`
    * equal-width buckets and emits, per bin, the exact integer
    * evidence (count, label sum, score mass) plus the squared
    * calibration gap `(mean predicted − observed rate)²` in q20 fixed
    * point; the corpus reliability term is then `Σ n_k·gap_k² / N`,
    * derivable from these integers without any further scan. The gap
    * is computed entirely from per-bin integer sums with the
    * cross-multiplied-before-divide discipline (DECIMAL(38,0)
    * promotion first — BIGINT² × 2^20 overflows at corpus scale, the
    * rocAuc lesson), so Spark and the SQL twin truncate identically.
    *
    * Shape at scale: one partial-aggregated scan → nBins rows. The
    * cost profile equals a `count(*)` at 100 TB; no window, no join.
    */
  def reliabilityBins(
      df: DataFrame,
      scoreScaledCol: String,
      labelCol: String,
      scaleBits: Int,
      nBins: Int
  ): DataFrame = {
    val scale = 1L << scaleBits
    require(scale % nBins == 0, s"nBins must divide 2^$scaleBits")
    val width = scale / nBins
    df.select(
        expr(s"CAST($scoreScaledCol AS BIGINT) div $width").as("bin"),
        col(labelCol).cast("long").as("y"),
        col(scoreScaledCol).cast("long").as("sc"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("y")).as("sum_label"),
        sum(col("sc")).as("sum_score_scaled"))
      .withColumn("gap_sq_q20", expr(
        s"""CAST((CAST(sum_score_scaled AS DECIMAL(38,0))
           | - CAST($scale AS DECIMAL(38,0)) * sum_label)
           | * (CAST(sum_score_scaled AS DECIMAL(38,0))
           | - CAST($scale AS DECIMAL(38,0)) * sum_label)
           | * 1048576
           | div (CAST($scale AS DECIMAL(38,0)) * $scale * n * n)
           | AS BIGINT)""".stripMargin))
  }

  /** Murphy decomposition of the Brier score —
    * `brier = reliability − resolution + uncertainty` — the one-row
    * answer to "is my quality classifier bad at CALIBRATION or bad
    * at DISCRIMINATION": reliability is the score-vs-rate gap within
    * bins (fixable by recalibration — [[isotonicCalibrate]]),
    * resolution is how far the bins' rates spread from the base rate
    * (not fixable post-hoc: it IS the classifier's skill), and
    * uncertainty is the base rate's own variance (a property of the
    * label, the floor no model beats). Same input convention as
    * [[reliabilityBins]]: an integer score in [0, 2^scaleBits) and a
    * 0/1 label. All four terms in exact micro units via
    * cross-multiplied integer fractions (DECIMAL(38,0)-bridged; the
    * only floors are one integral division per term and per bin,
    * replayed identically in the SQL twin). `brier_micro` is the
    * UNBINNED exact score, while rel/res/unc decompose the BINNED
    * forecast (Murphy's identity holds exactly only when scores are
    * constant within a bin) — so the residual
    * `brier − (rel − res + unc)` is itself a diagnostic: it reads
    * the within-bin forecast variance, i.e. how much the binning
    * blurs the score; shrink bins if it dominates.
    *
    * Shape at scale: one scan to (bin)-sized partial aggregates —
    * nBins rows thereafter; the whole decomposition is a map-side
    * combinable groupBy plus arithmetic on ≤ nBins rows.
    */
  def brierDecomposition(
      df: DataFrame,
      scoreScaledCol: String,
      labelCol: String,
      scaleBits: Int,
      nBins: Int
  ): DataFrame = {
    val scale = 1L << scaleBits
    require(scale % nBins == 0, s"nBins must divide 2^$scaleBits")
    val width = scale / nBins
    val d38 = "decimal(38,0)"
    val binned = df.select(
        expr(s"CAST($scoreScaledCol AS BIGINT) div $width").as("bin"),
        col(labelCol).cast("long").as("y"),
        col(scoreScaledCol).cast("long").as("sc"))
    val bins = binned
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_k"),
        sum(col("sc")).as("ssc"), sum(col("y")).as("sy"),
        sum((col("sc") - lit(scale) * col("y")).cast("decimal(19,0)") *
          (col("sc") - lit(scale) * col("y"))).cast(d38).as("sqerr"))
    bins
      .agg(
        sum(col("n_k")).as("n"),
        sum(col("sy")).as("sy_tot"),
        sum(col("sqerr")).cast(d38).as("sqerr_tot"),
        sum(expr(s"""(CAST(ssc AS $d38) - $scale * sy) *
          | (CAST(ssc AS $d38) - $scale * sy) * 1000000
          | div n_k""".stripMargin)).cast(d38).as("rel_sum"),
        collect_list(struct(col("bin"), col("n_k"), col("sy")))
          .as("bl"))
      .select(col("n"), col("sy_tot"), col("sqerr_tot"),
        col("rel_sum"),
        // resolution needs the global base rate against each bin —
        // fold the nBins-sized list rather than a second shuffle
        expr(s"""aggregate(bl, CAST(0 AS $d38), (acc, x) ->
          | acc + (CAST(x.sy AS $d38) * n - CAST(sy_tot AS $d38)
          |   * x.n_k) * (CAST(x.sy AS $d38) * n
          |   - CAST(sy_tot AS $d38) * x.n_k) * 1000000
          |   div x.n_k)""".stripMargin).as("res_sum"))
      .select(
        col("n").as("n"),
        col("sy_tot").as("n_pos"),
        expr(s"""CAST(sqerr_tot * 1000000
          | div (CAST($scale AS $d38) * $scale * n)
          | AS BIGINT)""".stripMargin).as("brier_micro"),
        expr(s"""CAST(rel_sum div (CAST($scale AS $d38) * $scale * n)
          | AS BIGINT)""".stripMargin).as("rel_micro"),
        expr(s"""CAST(res_sum div (CAST(n AS $d38) * n * n)
          | AS BIGINT)""".stripMargin).as("res_micro"),
        expr(s"""CAST(CAST(sy_tot AS $d38) * (n - sy_tot) * 1000000
          | div (CAST(n AS $d38) * n) AS BIGINT)""".stripMargin)
          .as("unc_micro"))
  }

  /** Isotonic (PAV) calibration map over the [[reliabilityBins]]
    * grid — the monotone score→rate fit a production classifier
    * threshold actually consumes (a reliability diagram shows WHERE
    * the score miscalibrates; the isotonic fit is the REPAIR: the
    * least-squares monotone rate curve). Computed via the exact
    * minimax identity `fit_i = max_{j≤i} min_{k≥i} avg(y over bins
    * j..k)` rather than the sequential pool-adjacent-violators stack:
    * on the count-sized bin grid the identity is two joins and two
    * aggregates (B³ pairs at B ≤ tens — trivial), needs no
    * order-dependent fold, and both engines execute the identical
    * double op chain (integer segment sums, one division, min/max —
    * the zipfAudit fixed-chain convention), so `fit_milli` is
    * engine-bitwise.
    *
    * Scale shape: ONE corpus scan (the binning aggregate); everything
    * after lives on the B-bin frame.
    */
  def isotonicCalibration(
      df: DataFrame,
      scoreScaledCol: String,
      labelCol: String,
      scaleBits: Int,
      nBins: Int
  ): DataFrame = {
    val scale = 1L << scaleBits
    require(scale % nBins == 0, s"nBins must divide 2^$scaleBits")
    val width = scale / nBins
    val bins = df.select(
        expr(s"CAST($scoreScaledCol AS BIGINT) div $width").as("bin"),
        col(labelCol).cast("long").as("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("sum_label"))
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = bins
      .withColumn("cum_n", sum(col("n")).over(w))
      .withColumn("cum_y", sum(col("sum_label")).over(w))
    val lo = pre.select(col("bin").as("j"),
      (col("cum_n") - col("n")).as("pn"),
      (col("cum_y") - col("sum_label")).as("py"))
    val hi = pre.select(col("bin").as("k"),
      col("cum_n").as("cn"), col("cum_y").as("cy"))
    val segs = lo.join(hi, col("j") <= col("k"))
      .select(col("j"), col("k"),
        ((col("cy") - col("py")).cast("double") /
          (col("cn") - col("pn")).cast("double")).as("seg_avg"))
    val fit = segs
      .join(bins.select(col("bin").as("i")),
        col("j") <= col("i") && col("k") >= col("i"))
      .groupBy(col("i"), col("j"))
      .agg(min(col("seg_avg")).as("mn"))
      .groupBy(col("i"))
      .agg(max(col("mn")).as("fit"))
    bins.join(fit, col("bin") === col("i"))
      .select(col("bin"), col("n"), col("sum_label"),
        expr("sum_label * 1000 div n").as("raw_rate_milli"),
        floor(col("fit") * 1000.0).cast("long").as("fit_milli"))
      .orderBy(col("bin"))
  }

  /** Fleiss' kappa for `raterCols.size` binary raters over one item
    * set — the multi-rater generalization of the pairwise Cohen's
    * kappa ([[graft.ops.Text.filterAgreementKappa]]): with three or
    * more quality gates in a curation stack, pairwise kappas miss
    * coalitions (A agrees with B, B with C, yet the panel is noise).
    * Per item the vote count k yields `k² + (n−k)² − n` agreeing
    * rater pairs; three corpus integers (N, ΣA, ΣK) close the form:
    *
    *   kappa = (A·(Nn)² − Nn(n−1)·(K² + (Nn−K)²))
    *         / (Nn(n−1)·((Nn)² − K² − (Nn−K)²))
    *
    * emitted as q20 fixed point via DECIMAL(38,0) cross-multiply.
    * NULL when the chance-agreement denominator is zero (unanimous
    * raters on every item). One scan, one 1-row reduce — the same
    * cost as a count(*) regardless of corpus size.
    */
  def fleissKappa(df: DataFrame, raterCols: Seq[String]): DataFrame = {
    val n = raterCols.size
    require(n >= 2, "fleissKappa needs at least 2 raters")
    val k = raterCols.map(c => col(c).cast("int")).reduce(_ + _)
    df.select(k.cast("long").as("k"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(expr(s"k * k + ($n - k) * ($n - k) - $n"))
          .as("pairs_agree"),
        sum(col("k")).as("keeps"))
      .withColumn("kappa_q20", expr(
        s"""CASE WHEN CAST(n_items AS DECIMAL(38,0)) * $n * ${n - 1}
           |   * ((CAST($n AS DECIMAL(38,0)) * n_items)
           |        * ($n * n_items)
           |      - CAST(keeps AS DECIMAL(38,0)) * keeps
           |      - (CAST($n AS DECIMAL(38,0)) * n_items - keeps)
           |        * ($n * n_items - keeps)) = 0 THEN NULL
           | ELSE CAST(
           |   (CAST(pairs_agree AS DECIMAL(38,0))
           |      * ($n * n_items) * ($n * n_items)
           |    - CAST(n_items AS DECIMAL(38,0)) * $n * ${n - 1}
           |      * (CAST(keeps AS DECIMAL(38,0)) * keeps
           |         + (CAST($n AS DECIMAL(38,0)) * n_items - keeps)
           |           * ($n * n_items - keeps)))
           |   * 1048576
           |   div (CAST(n_items AS DECIMAL(38,0)) * $n * ${n - 1}
           |     * ((CAST($n AS DECIMAL(38,0)) * n_items)
           |          * ($n * n_items)
           |        - CAST(keeps AS DECIMAL(38,0)) * keeps
           |        - (CAST($n AS DECIMAL(38,0)) * n_items - keeps)
           |          * ($n * n_items - keeps)))
           |   AS BIGINT) END""".stripMargin))
      .select(col("n_items").as("n_docs"), col("pairs_agree"),
        col("keeps"), col("kappa_q20"))
  }

  /** Blocking-key audit for pairwise dedup: before running an O(Σb²)
    * within-block comparison, measure what the key buys — pair
    * completeness (fraction of ground-truth duplicate pairs that
    * share a block; misses are unrecoverable) against reduction ratio
    * (fraction of the C(N,2) full cross product the key prunes; this
    * is the compute saved). Both are pure group-size counting:
    * `Σ C(g,2)` over the truth key, the block key, and their
    * conjunction — three partial-aggregated scans, six integers out,
    * no pair is ever materialized, so the audit itself stays linear
    * however bad the key is.
    */
  def blockingEval(
      df: DataFrame,
      truthKey: Column,
      blockKey: Column
  ): DataFrame = {
    val base = df.select(truthKey.as("tk"), blockKey.as("bk"))
    def pairSum(keys: Seq[String], out: String): DataFrame =
      base.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("c"))
        .agg(coalesce(sum(expr("c * (c - 1) div 2")), lit(0L)).as(out))
    base.agg(count(lit(1)).as("n_rows"))
      .crossJoin(pairSum(Seq("tk"), "true_pairs"))
      .crossJoin(pairSum(Seq("bk"), "cand_pairs"))
      .crossJoin(pairSum(Seq("tk", "bk"), "covered_pairs"))
      .select(col("n_rows"), col("true_pairs"), col("cand_pairs"),
        col("covered_pairs"),
        expr("""CASE WHEN true_pairs = 0 THEN NULL
          ELSE covered_pairs * 1000000 div true_pairs END""")
          .as("completeness_ppm"),
        expr("""CASE WHEN n_rows < 2 THEN NULL
          ELSE 1000000 - CAST(CAST(cand_pairs AS DECIMAL(38,0))
            * 2000000 div (CAST(n_rows AS DECIMAL(38,0))
            * (n_rows - 1)) AS BIGINT) END""")
          .as("reduction_ppm"))
  }

  /** Component-size profile of a cluster/component assignment (the
    * output shape of the dedup family — `(id, cluster)` rows): how
    * much of the corpus sits in singletons vs a giant component is
    * THE health read on a near-dup graph before acting on it (a
    * giant component usually means the threshold is inside the bulk
    * similarity mass, and min-id representatives would collapse real
    * diversity). Two rollups — cluster → size, size → (clusters,
    * members) — plus a broadcast 1-row total for the exact ppm
    * share; output is bounded by the number of DISTINCT sizes,
    * so the profile costs two small shuffles at any corpus scale.
    */
  def componentSizeProfile(
      components: DataFrame,
      clusterCol: String
  ): DataFrame = {
    val sizes = components.groupBy(col(clusterCol))
      .agg(count(lit(1)).as("sz"))
    val tot = sizes.agg(sum(col("sz")).as("n_total"))
    sizes.groupBy(col("sz").as("size"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("sz")).as("n_members"))
      .crossJoin(broadcast(tot))
      .select(col("size"), col("n_clusters"), col("n_members"),
        expr("n_members * 1000000 div n_total").as("members_ppm"),
        col("n_total"))
  }

  /** One-way ANOVA F statistic for an integer metric across groups —
    * "does the group explain the metric's variance" as one exact
    * number (the Theil decomposition's variance-space sibling; chi-
    * square/Cramér's V answer it for categorical outcomes, this for
    * a numeric one). Sum-of-squares identities over per-group
    * (n, Σx, Σx²) rollups; the only non-integer step, S_g²/n_g, is
    * pinned as a per-group q20 floor (`S_g²·2²⁰ div n_g`, DECIMAL/
    * HUGEINT promoted before the square) so both engines replicate
    * the statistic bit-for-bit:
    * `SSB_q20 = Σ_g ⌊S_g²·2²⁰/n_g⌋ − ⌊S²·2²⁰/N⌋`,
    * `SSW_q20 = (Σx²)·2²⁰ − Σ_g ⌊…⌋`,
    * `F_milli = SSB·(N−k)·1000 div (SSW·(k−1))`. One scan to the
    * group rollup, k rows reduced to one — count(*) cost at 100 TB.
    */
  def anovaF(
      df: DataFrame,
      valueCol: String,
      groupCol: String
  ): DataFrame = {
    val g = df
      .filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("g"),
        col(valueCol).cast("long").as("x"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_g"), sum(col("x")).as("s_g"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("s2_g"))
    g.agg(
        count(lit(1)).as("k"),
        sum(col("n_g")).as("n"),
        sum(col("s_g")).as("s"),
        sum(col("s2_g")).as("sum_x2"),
        sum(expr(
          """CAST(s_g AS DECIMAL(38,0)) * s_g * 1048576
            | div n_g""".stripMargin)).as("a_q20"))
      .withColumn("ssb_q20", expr(
        """a_q20 - CAST(s AS DECIMAL(38,0)) * s * 1048576 div n"""))
      .withColumn("ssw_q20",
        expr("CAST(sum_x2 AS DECIMAL(38,0)) * 1048576 - a_q20"))
      .select(col("k"), col("n"),
        col("ssb_q20").cast("decimal(38,0)").as("ssb_q20"),
        col("ssw_q20").cast("decimal(38,0)").as("ssw_q20"))
      .withColumn("f_milli", expr(
        """CASE WHEN k < 2 OR n <= k OR ssw_q20 <= 0 THEN NULL
          | ELSE CAST(ssb_q20 * (n - k) * 1000
          |   div (ssw_q20 * (k - 1)) AS BIGINT) END""".stripMargin))
      .select(col("k"), col("n"),
        expr("CAST(ssb_q20 div 1048576 AS BIGINT)").as("ssb_int"),
        expr("CAST(ssw_q20 div 1048576 AS BIGINT)").as("ssw_int"),
        col("f_milli"))
  }

  /** Herfindahl–Hirschman concentration of a categorical key, per
    * group: `HHI = Σ (c_k/N)²` in exact ppm (squares promoted to
    * DECIMAL(38,0) — a 10¹²-row corpus squares past BIGINT), plus
    * the effective key count `1/HHI` in milli — "this lang draws
    * from 20 sources but EFFECTIVELY 2.1 of them" is the sampling-
    * diversity fact a mixture planner needs before trusting per-
    * source quotas. Two partial-aggregated rollups, |groups| rows
    * out, no window.
    */
  def concentrationHHI(
      df: DataFrame,
      keyCol: String,
      groupCols: Seq[String] = Nil
  ): DataFrame = {
    val grp = groupCols.map(col)
    df.groupBy(grp :+ col(keyCol).as("__k"): _*)
      .agg(count(lit(1)).as("c"))
      .groupBy(grp: _*)
      .agg(
        count(lit(1)).as("n_keys"),
        sum(col("c")).as("n_rows"),
        sum(col("c").cast("decimal(38,0)") * col("c")).as("__c2"))
      .withColumn("hhi_ppm", expr(
        """CAST(__c2 * 1000000
          | div (CAST(n_rows AS DECIMAL(38,0)) * n_rows)
          | AS BIGINT)""".stripMargin))
      .withColumn("eff_keys_milli", expr(
        """CASE WHEN hhi_ppm = 0 THEN NULL
          | ELSE 1000000000 div hhi_ppm END""".stripMargin))
      .drop("__c2")
  }

  /** Deterministic half-sample (multiplier) bootstrap for the mean of
    * an integer metric: replicate b keeps row i iff the MD5 parity of
    * `id_b` is odd — multiplier weights in {0,2} have mean 1 and
    * variance 1 (Poisson(1)'s first two moments), which is the
    * double-or-nothing member of the multiplier-bootstrap family, and
    * the hash makes every replicate exactly reproducible in both
    * engines (the md5-family convention). Emits the full replicate
    * table — per replicate the selected count, integer value sum, and
    * truncated milli mean — so the caller reads any CI directly off
    * the `reps` ordered means. Cost: ONE scan fanned ×reps on the map
    * side, `reps` rows out, no shuffle wider than the replicate
    * count; at 100 TB the fan-out stays embarrassingly parallel
    * (no row ever leaves its partition before the rollup).
    */
  def halfSampleBootstrap(
      df: DataFrame,
      idCol: String,
      valueCol: String,
      reps: Int = 32
  ): DataFrame = {
    require(reps >= 1, s"reps must be positive, got $reps")
    df.select(col(idCol).as("__id"),
        col(valueCol).cast("long").as("__v"))
      .withColumn("rep",
        explode(sequence(lit(0L), lit(reps - 1L))))
      .withColumn("__p", expr(
        """CAST(conv(substr(md5(concat(CAST(__id AS STRING), '_',
          | CAST(rep AS STRING))), 1, 15), 16, 10) AS BIGINT)
          | % 2""".stripMargin))
      .groupBy(col("rep"))
      .agg(
        sum(col("__p")).as("n_sel"),
        sum(col("__p") * col("__v")).as("sum_val"))
      .withColumn("mean_milli", expr(
        """CASE WHEN n_sel = 0 THEN NULL
          | ELSE sum_val * 1000 div n_sel END""".stripMargin))
  }

  /** Freshness-decayed event mix: each event's weight halves per day
    * of age relative to the newest event in the batch
    * (`w = 10^6 div 2^min(age, maxAgeDays)` ppm — the power-of-two
    * half-life keeps the weight an exact integer), then one rollup
    * per event type gives the recency-weighted sampling mix a
    * training pipeline feeds its data loader: raw volume says what a
    * source HAS, decayed weight says what it has been producing
    * LATELY. Value mass decays per element
    * (`floor(value·1000) · w div 10^6` — truncation toward zero, the
    * same C-style semantics in Spark `div` and the SQL twin's `//`)
    * so the aggregate is an exact BIGINT. One scan + one broadcast
    * 1-row max; no window.
    */
  def freshnessDecay(
      events: DataFrame,
      maxAgeDays: Int = 20
  ): DataFrame = {
    val asof = events.agg(max(to_date(col("ts"))).as("asof_d"))
    events
      .select(col("event_type"), to_date(col("ts")).as("d"),
        expr("CAST(floor(value * 1000) AS BIGINT)").as("v_milli"))
      .crossJoin(broadcast(asof))
      .withColumn("w_ppm", expr(
        s"""1000000 div shiftleft(CAST(1 AS BIGINT),
           | CAST(LEAST(datediff(asof_d, d), $maxAgeDays)
           | AS INT))""".stripMargin))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("w_ppm")).as("weight_ppm"),
        sum(expr("v_milli * w_ppm div 1000000"))
          .as("decayed_value_milli"))
  }

  /** Daily-series autocorrelation at fixed lags — does today's
    * volume predict tomorrow's (lag 1) and is there a weekly cycle
    * (lag 7)? The Pearson r over (xₜ, xₜ₊ₗ) pairs of each feed's
    * calendar-bounded daily counts, in the [[spearmanRho]] moment
    * discipline: counts scale to MILLI before the moments (the
    * floor-div-n bias is then ≤ 10⁻³ of a count unit — on raw small
    * counts it can flip a covariance sign), Σx/Σy/Σxy/Σx²/Σy² exact
    * in DECIMAL(38,0), means and second moments pinned as
    * floor-div-n integers, and only the final r_milli touches IEEE
    * (sqrt/divide of identical exact integers → identical double in
    * both engines). Pairs come from ONE calendar self-join per lag
    * on (feed, day+lag) equi keys — |days|-sized work per feed.
    * Documented bound: the BIGINT moment skeleton is exact to
    * ~3·10⁶ events/day/feed (mean_milli² ≤ 2⁶³); past that, drop
    * the milli scaling — at such volumes the raw floor-div bias is
    * already < 10⁻⁶ relative.
    */
  def dailyAutocorrelation(
      events: DataFrame,
      lags: Seq[Int] = Seq(1, 7)
  ): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ >= 1), "lags must be >= 1")
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg((count(lit(1)) * 1000L).as("x"))
    val a = daily
      .withColumn("lag", explode(array(lags.map(lit): _*)))
      .withColumn("jd", expr("date_add(d, lag)"))
      .select(col("event_type"), col("lag"), col("x"), col("jd"))
    val b = daily.select(col("event_type"), col("d").as("jd"),
      col("x").as("y"))
    a.join(b, Seq("event_type", "jd"))
      .groupBy(col("event_type"), col("lag"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum(col("y").cast("decimal(38,0)")).as("sy"),
        sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("sx2"),
        sum(col("y").cast("decimal(38,0)") * col("y")).as("sy2"))
      .select(col("event_type"), col("lag"), col("n_pairs"),
        expr("CAST(sx div n_pairs AS BIGINT)").as("mean_x_milli"),
        expr("CAST(sy div n_pairs AS BIGINT)").as("mean_y_milli"),
        expr("CAST(sxy div n_pairs AS BIGINT)").as("e_xy_m2"),
        expr("CAST(sx2 div n_pairs AS BIGINT)").as("e_x2_m2"),
        expr("CAST(sy2 div n_pairs AS BIGINT)").as("e_y2_m2"))
      .withColumn("cov_m2",
        expr("e_xy_m2 - mean_x_milli * mean_y_milli"))
      .withColumn("var_x_m2",
        expr("e_x2_m2 - mean_x_milli * mean_x_milli"))
      .withColumn("var_y_m2",
        expr("e_y2_m2 - mean_y_milli * mean_y_milli"))
      .withColumn("r_milli",
        when(col("var_x_m2") > 0 && col("var_y_m2") > 0,
          floor(col("cov_m2").cast("double") * 1000.0 /
            sqrt(col("var_x_m2").cast("double") *
              col("var_y_m2").cast("double"))).cast("long")))
  }

  /** Shared-literal q20 cosine/sine table for [[dailyPeriodogram]]:
    * one (period, phase) row per residue class, values floored to
    * q20 in SCALA so both engines consume IDENTICAL integers (the
    * JL ±1-matrix shared-literal discipline — libm cos is not
    * guaranteed identically rounded across engines, so neither side
    * ever calls cos at query time).
    */
  private[ops] def periodogramLut(
      periods: Seq[Int]): Seq[(Int, Int, Long, Long)] =
    for (p <- periods; ph <- 0 until p) yield {
      val a = 2.0 * math.Pi * ph / p
      (p, ph,
        math.floor(math.cos(a) * (1L << 20)).toLong,
        math.floor(math.sin(a) * (1L << 20)).toLong)
    }

  /** Daily-series periodogram in exact fixed point — WHICH cycle
    * length dominates a feed's volume (the weekly rhythm, a
    * biweekly pay cycle, none at all)? For each candidate period P,
    * the squared DFT magnitude of the mean-removed, zero-filled
    * daily series at frequency 1/P, computed entirely in integers:
    * counts milli-scaled, mean removal as `x·T − Σx` (exact — no
    * division), the trig factors from the shared q20 literal table
    * above, correlations accumulated in DECIMAL(38,0), then ONE
    * sign-split floor-div normalization by `Σx·T` per component
    * (scale-invariant: 100× the volume is the same normalized
    * power), and `power = re² + im²`. The day grid is the corpus
    * calendar INCLUDING zero days — absent days are signal, and
    * skipping them would alias every period.
    *
    * Scale shape: one day-grain rollup; everything after runs on
    * the (#types × #days ≤ calendar) zero-filled grid joined to a
    * ≤ Σperiods-row broadcast literal table — invariant in corpus
    * size.
    */
  def dailyPeriodogram(
      events: DataFrame,
      periods: Seq[Int] = (2 to 14)
  ): DataFrame = {
    require(periods.nonEmpty && periods.forall(_ >= 2),
      "periods must be >= 2")
    val spark = events.sparkSession
    import spark.implicits._
    val lut = broadcast(periodogramLut(periods.distinct.sorted)
      .toDF("period", "phase", "cosq", "sinq"))
    val daily = events
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("long")
          .as("d"))
      .agg((count(lit(1)) * 1000L).as("x"))
    val span = daily.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    // zero-filled corpus-calendar grid per type
    val grid = daily.select(col("event_type")).distinct()
      .crossJoin(broadcast(span))
      .select(col("event_type"),
        explode(sequence(lit(0L), col("d1") - col("d0"))).as("t"),
        col("d0"))
    val filled = grid
      .join(daily.select(col("event_type").as("et2"), col("d"),
        col("x")),
        col("event_type") === col("et2") &&
          col("d") === col("t") + col("d0"), "left")
      .select(col("event_type"), col("t"),
        coalesce(col("x"), lit(0L)).as("x"))
    val stats = filled.groupBy(col("event_type"))
      .agg(count(lit(1)).as("tt"), sum(col("x")).as("sx"))
    def sdiv(num: String, den: String) =
      s"""CASE WHEN ($num) < 0
         | THEN -CAST((-($num)) div ($den) AS BIGINT)
         | ELSE CAST(($num) div ($den) AS BIGINT) END"""
        .stripMargin.replace("\n", "")
    filled
      .join(broadcast(stats), "event_type")
      .crossJoin(lut)
      .filter(pmod(col("t"), col("period")) === col("phase"))
      .groupBy(col("event_type"), col("period"))
      .agg(max(col("tt")).as("n_days"), max(col("sx")).as("sx"),
        sum((col("x") * col("tt") - col("sx"))
          .cast("decimal(38,0)") * col("cosq")).as("re_raw"),
        sum((col("x") * col("tt") - col("sx"))
          .cast("decimal(38,0)") * col("sinq")).as("im_raw"))
      .filter(col("sx") > 0)
      .select(col("event_type"), col("period").cast("long")
          .as("period"), col("n_days"), col("sx"),
        expr(sdiv("re_raw", "sx * n_days")).as("re_q"),
        expr(sdiv("im_raw", "sx * n_days")).as("im_q"))
      .select(col("event_type"), col("period"), col("n_days"),
        (col("re_q") * col("re_q") + col("im_q") * col("im_q"))
          .as("power"))
      .orderBy(col("event_type"), col("period"))
  }

  /** Cross-series lead–lag profile — does one feed's daily volume
    * PREDICT another's ([[dailyAutocorrelation]] is the self-series
    * case; this is the pair case a funnel owner reads before
    * claiming "views lead purchases by two days")? Pearson r of
    * (typeA count on day d, typeB count on day d+lag) over every lag
    * in [−maxLag, +maxLag]: positive lags test A leading B, negative
    * lags the reverse, lag 0 is plain co-movement, and the argmax
    * lag is the phase estimate. Identical exact-moment discipline as
    * the autocorrelation op (milli-scaled counts, DECIMAL moment
    * skeleton, floor-div-n means, IEEE only at the final r_milli) —
    * engine-bitwise by the same argument, with the same ~3·10⁶
    * events/day documented bound.
    *
    * Scale shape: one day-grain rollup of the two feeds, one
    * |days|·|lags| calendar join, a |lags|-row moment aggregation —
    * the day grid is calendar-bounded, so 100× more events is the
    * SAME join size after the rollup.
    */
  def leadLagCorrelation(
      events: DataFrame,
      typeA: String = "view",
      typeB: String = "purchase",
      maxLag: Int = 7
  ): DataFrame = {
    require(maxLag >= 1, "maxLag must be >= 1")
    val lags = (-maxLag to maxLag).toSeq
    def daily(t: String) = events
      .filter(col("event_type") === t)
      .groupBy(to_date(col("ts")).as("d"))
      .agg((count(lit(1)) * 1000L).as("x"))
    val a = daily(typeA)
      .withColumn("lag", explode(array(lags.map(lit): _*)))
      .withColumn("jd", expr("date_add(d, lag)"))
      .select(col("lag"), col("x"), col("jd"))
    val b = daily(typeB).select(col("d").as("jd"), col("x").as("y"))
    a.join(b, "jd")
      .groupBy(col("lag"))
      .agg(
        count(lit(1)).as("n_days"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum(col("y").cast("decimal(38,0)")).as("sy"),
        sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("sx2"),
        sum(col("y").cast("decimal(38,0)") * col("y")).as("sy2"))
      .select(col("lag").cast("long").as("lag"), col("n_days"),
        expr("CAST(sx div n_days AS BIGINT)").as("mean_x_milli"),
        expr("CAST(sy div n_days AS BIGINT)").as("mean_y_milli"),
        expr("CAST(sxy div n_days AS BIGINT)").as("e_xy_m2"),
        expr("CAST(sx2 div n_days AS BIGINT)").as("e_x2_m2"),
        expr("CAST(sy2 div n_days AS BIGINT)").as("e_y2_m2"))
      .withColumn("cov_m2",
        expr("e_xy_m2 - mean_x_milli * mean_y_milli"))
      .withColumn("var_x_m2",
        expr("e_x2_m2 - mean_x_milli * mean_x_milli"))
      .withColumn("var_y_m2",
        expr("e_y2_m2 - mean_y_milli * mean_y_milli"))
      .withColumn("r_milli",
        when(col("var_x_m2") > 0 && col("var_y_m2") > 0,
          floor(col("cov_m2").cast("double") * 1000.0 /
            sqrt(col("var_x_m2").cast("double") *
              col("var_y_m2").cast("double"))).cast("long")))
  }

  /** Watermark delay planner — the measurement behind every
    * `withWatermark` call: per feed, how far events actually arrive
    * BEHIND the high-water mark, read off the stream's own arrival
    * order (`arrivalCol` — an ingest sequence; here the event id):
    * `delay = running_max(ts) − ts` per row, then exact lower
    * permil quantiles of the delay distribution (p50/p95/p999 and
    * the max). Set the watermark at ≥ p999 and you quantifiably drop
    * ≤ 0.1% of events as late; the gap between p999 and max is the
    * tail the business decides about. All integer epoch-ms; the
    * quantiles come off the per-feed delay VALUE histogram
    * (`min delay with cum·1000 ≥ p·n` — one partitioned cumulative,
    * no global sort), the [[mannWhitneyU]] histogram discipline.
    */
  def watermarkPlan(
      events: DataFrame,
      arrivalCol: String = "event_id"
  ): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col(arrivalCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val delays = events
      .select(col("event_type"), col(arrivalCol),
        expr("CAST(unix_millis(ts) AS BIGINT)").as("tms"))
      .withColumn("delay_ms", max(col("tms")).over(w) - col("tms"))
    val h = delays.groupBy(col("event_type"), col("delay_ms"))
      .agg(count(lit(1)).as("ct"))
      .withColumn("cum", sum(col("ct")).over(
        Window.partitionBy(col("event_type")).orderBy(col("delay_ms"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("ct")).over(
        Window.partitionBy(col("event_type"))))
    h.groupBy(col("event_type"))
      .agg(
        max(col("n")).as("n_events"),
        sum(when(col("delay_ms") > 0, col("ct")).otherwise(0L))
          .as("n_late"),
        min(when(col("cum") * 1000 >= lit(500L) * col("n"),
          col("delay_ms"))).as("p50_delay_ms"),
        min(when(col("cum") * 1000 >= lit(950L) * col("n"),
          col("delay_ms"))).as("p95_delay_ms"),
        min(when(col("cum") * 1000 >= lit(999L) * col("n"),
          col("delay_ms"))).as("p999_delay_ms"),
        max(col("delay_ms")).as("max_delay_ms"))
      .withColumn("late_ppm",
        expr("n_late * 1000000 div n_events"))
  }

  /** Broadcast-vs-shuffle advisor — the size estimate behind the
    * single most consequential join decision at 100 TB, computed
    * from the table itself instead of guessed: estimated in-memory
    * bytes = Σ per row (16 B object overhead + 8 B per fixed-width
    * column + the exact octet length of each string column), split
    * out so the advice is auditable. `recommend` is 'broadcast'
    * below the threshold (driver + per-executor copy affordable),
    * 'shuffle' above. One scan, one row out per call — run it over
    * every dimension table and the plan hints write themselves.
    */
  def broadcastAdvisor(
      df: DataFrame,
      label: String,
      thresholdBytes: Long = 10L * 1024 * 1024
  ): DataFrame = {
    val stringCols = df.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.StringType)
      .map(_.name)
    val nFixed = df.schema.fields.length - stringCols.length
    // NULL strings count as 0 bytes: un-coalesced, one NULL column
    // voids the whole row's term and sum() silently drops it —
    // underestimating est_bytes on nullable dims can flip the exact
    // decision this op exists to get right
    val rowBytes = stringCols
      .map(c => coalesce(octet_length(col(c)).cast("long"), lit(0L)))
      .foldLeft(lit(16L + 8L * nFixed))(_ + _)
    df.agg(count(lit(1)).as("n_rows"),
        sum(rowBytes).as("est_bytes"))
      .select(lit(label).as("table_label"), col("n_rows"),
        col("est_bytes"),
        lit(thresholdBytes).as("threshold_bytes"),
        when(col("est_bytes") < thresholdBytes, "broadcast")
          .otherwise("shuffle").as("recommend"))
  }

  /** Join-cardinality estimator audit — the planner's containment
    * assumption `|A ⋈ B| ≈ |A|·|B| / max(ndv_A, ndv_B)` scored
    * against the ACTUAL join size. At 100 TB the estimate decides
    * broadcast-vs-shuffle and partition counts; a key whose error
    * blows past ~2× (correlated keys, hidden skew) is exactly where
    * hand-tuning (hot-list salting, explicit hints) pays, so the
    * audit NAMES those keys from stats already computed in one scan
    * per side plus the join's own count — nothing new is shuffled
    * beyond the join being audited. Exact integers throughout
    * (`est = n_a·n_b div max(ndv)`, error in signed ppm vs actual);
    * the n_a·n_b product promotes to DECIMAL(38,0) before the div
    * (fact×fact row products square past BIGINT).
    */
  def joinCardinalityAudit(
      a: DataFrame,
      b: DataFrame,
      aKey: String,
      bKey: String,
      label: String
  ): DataFrame = {
    val sa = a.agg(count(lit(1)).as("n_a"),
      countDistinct(col(aKey)).as("ndv_a"))
    val sb = b.agg(count(lit(1)).as("n_b"),
      countDistinct(col(bKey)).as("ndv_b"))
    val actual = a.select(col(aKey).as("__k"))
      .join(b.select(col(bKey).as("__k")), "__k")
      .agg(count(lit(1)).as("n_actual"))
    sa.crossJoin(sb).crossJoin(actual)
      .select(lit(label).as("join_label"),
        col("n_a"), col("n_b"), col("ndv_a"), col("ndv_b"),
        expr("""CAST(CAST(n_a AS DECIMAL(38,0)) * n_b
               | div GREATEST(ndv_a, ndv_b) AS BIGINT)"""
          .stripMargin).as("n_est"),
        col("n_actual"))
      .withColumn("err_ppm", expr(
        """CASE WHEN n_actual = 0 THEN NULL
          | ELSE (n_est - n_actual) * 1000000 div n_actual
          | END""".stripMargin))
  }

  /** Single change-point location by binary segmentation over a
    * per-group daily count series — WHERE a level shift happened,
    * the question the CUSUM audit (did one happen) and the z-score
    * anomaly (is today odd) both leave open. For each candidate
    * split k the between-segment sum-of-squares gain is
    * `(S_L·n − S·n_L)² / (n_L·(n−n_L))` (n = #days, S = total; the
    * common 1/n factor drops out of the argmax), floored to q20 —
    * `gain_q20 = ⌊num²·2²⁰ / den⌋` with num² promoted to
    * DECIMAL(38,0) (num ≤ S·n; the q20 product stays inside 38
    * digits up to S·n ≈ 3·10¹⁴ — a 10¹²-events/day feed, documented
    * bound) — so the argmax compares exact integers and ties break
    * on the earlier day identically in both engines. Cost: one
    * calendar-bounded rollup per group, a prefix sum over it, a
    * |days|-row argmax — count(*)-grade at any corpus size.
    */
  def binaryChangepoint(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("x"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
    val cum = daily
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("s_l", sum(col("x")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col("event_type"))))
      .withColumn("s", sum(col("x")).over(
        Window.partitionBy(col("event_type"))))
    cum
      .filter(col("i") < col("n")) // split AFTER day i: left = 1..i
      .withColumn("gain_q20", expr(
        """CAST(CAST((s_l * n - s * i) AS DECIMAL(38,0))
          |   * (s_l * n - s * i) * 1048576
          | div (i * (n - i)) AS BIGINT)""".stripMargin))
      .groupBy(col("event_type"))
      .agg(max_by(struct(col("d"), col("i"), col("s_l"),
          col("gain_q20")),
        struct(col("gain_q20"), (-col("i")).as("neg_i"))).as("__b"),
        max(col("n")).as("n_days"), max(col("s")).as("n_events"))
      .select(col("event_type"),
        col("__b.d").as("split_day"),
        col("__b.i").as("n_left"),
        (col("n_days") - col("__b.i")).as("n_right"),
        col("__b.gain_q20").as("gain_q20"),
        expr("__b.s_l * 1000 div __b.i").as("mean_left_milli"),
        expr("(n_events - __b.s_l) * 1000 div (n_days - __b.i)")
          .as("mean_right_milli"))
  }

  /** Mann–Whitney U rank test between two groups on an INTEGER
    * metric — the nonparametric two-sample comparison beside
    * [[anovaF]] (which assumes variance decomposition is meaningful)
    * and the KS drift audit (which compares whole CDFs): U answers
    * "does one group stochastically dominate", and U/(n₁n₂) IS the
    * AUC of the metric as a group classifier — the effect size a
    * filter audit actually wants. All integer by the DOUBLED-midrank
    * convention: a tied block of t values with `below` smaller
    * values has midrank `below + (t+1)/2`, so 2·midrank = 2·below +
    * t + 1 is exact; `2R₁ = Σ_v c₁ᵥ·(2·belowᵥ + tᵥ + 1)` and
    * `2U₁ = 2R₁ − n₁(n₁+1)` never leave BIGINT (bounded by 2n² —
    * DECIMAL-promote at n > 3·10⁹ rows per cell, documented not
    * expected). No per-row ranking window: the cumulative runs over
    * the VALUE HISTOGRAM (distinct metric values), the same
    * bounded-frame discipline as the skew advisor's median.
    */
  def mannWhitneyU(
      df: DataFrame,
      groupCol: Column,
      valueCol: Column,
      groupA: String,
      groupB: String
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = df
      .select(groupCol.as("g"), valueCol.cast("long").as("v"))
      .filter(col("g").isin(groupA, groupB))
    val hist = rows.groupBy(col("v"))
      .agg(count(lit(1)).as("t"),
        count(when(col("g") === groupA, lit(1))).as("c_a"))
    val cum = hist.withColumn("below",
      coalesce(sum(col("t")).over(
        Window.orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    cum
      .agg(
        sum(col("t")).as("n_total"),
        sum(col("c_a")).as("n_a"),
        sum(col("c_a") * (lit(2L) * col("below") + col("t") + 1L))
          .as("r2_a"))
      .select(col("n_a"), (col("n_total") - col("n_a")).as("n_b"),
        col("r2_a"),
        (col("r2_a") - col("n_a") * (col("n_a") + 1L)).as("u2_a"))
      .select(col("n_a"), col("n_b"), col("r2_a"), col("u2_a"),
        (lit(2L) * col("n_a") * col("n_b") - col("u2_a")).as("u2_b"),
        expr("u2_a * 1000000 div (2 * n_a * n_b)").as("auc_ppm"))
  }

  /** Conjunctive-predicate selectivity audit — the filter-side
    * sibling of [[joinCardinalityAudit]]: every cost-based planner
    * multiplies marginal selectivities under the independence
    * assumption (`sel(A ∧ B) ≈ sel(A)·sel(B)`), and correlated
    * columns are where that estimate collapses (the classic
    * make="Honda" ∧ model="Civic" failure). For each named predicate
    * pair the audit reports marginal ppm, actual conjunctive ppm,
    * the independence estimate `est_ppm = a_ppm·b_ppm div 10^6`, and
    * `corr_milli = actual·1000 div est` — 1000 means independent,
    * ≫1000 is positive correlation (the planner underestimates and
    * under-parallelizes), ≪1000 negative (over-reserves). At 100 TB
    * this is the table-stats health check that decides which column
    * groups need multi-column statistics / a bucketing key.
    *
    * ONE scan: all marginal and joint counts are conditional sums in
    * a single aggregate; the pair table unstacks from that one row.
    */
  def selectivityAudit(
      df: DataFrame,
      preds: Seq[(String, Column)],
      pairs: Seq[(String, String)]): DataFrame = {
    require(preds.nonEmpty && pairs.nonEmpty,
      "need at least one predicate and one pair")
    val byName = preds.toMap
    pairs.foreach { case (a, b) =>
      require(byName.contains(a) && byName.contains(b),
        s"pair ($a,$b) references an unregistered predicate") }
    val marg = preds.map { case (n, c) =>
      sum(when(c, 1L).otherwise(0L)).as(s"n_$n") }
    val joint = pairs.map { case (a, b) =>
      sum(when(byName(a) && byName(b), 1L).otherwise(0L))
        .as(s"n_${a}__$b") }
    val agg = df.agg(count(lit(1)).as("n_rows"),
      (marg ++ joint): _*)
    val stackArgs = pairs.map { case (a, b) =>
      s"'$a & $b', n_$a, n_$b, n_${a}__$b" }.mkString(", ")
    agg
      .selectExpr("n_rows",
        s"stack(${pairs.size}, $stackArgs)" +
          " AS (pair, n_a, n_b, n_joint)")
      .select(col("pair"), col("n_rows"), col("n_a"), col("n_b"),
        col("n_joint"),
        expr("n_a * 1000000 div GREATEST(n_rows, 1)").as("a_ppm"),
        expr("n_b * 1000000 div GREATEST(n_rows, 1)").as("b_ppm"))
      .withColumn("actual_ppm",
        expr("n_joint * 1000000 div GREATEST(n_rows, 1)"))
      .withColumn("est_ppm", expr("a_ppm * b_ppm div 1000000"))
      .withColumn("corr_milli",
        expr("actual_ppm * 1000 div GREATEST(est_ppm, 1)"))
      .orderBy(col("pair"))
  }
}
