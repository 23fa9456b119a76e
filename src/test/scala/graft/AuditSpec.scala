package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.Audit

/** Table-level data-quality gates: assertion suite semantics
  * (pass/fail per constraint, single-pass plan), referential closure,
  * and trailing-window volume anomaly detection.
  */
class AuditSpec extends SparkSpec {
  import spark.implicits._

  test("assertion suite: per-check pass/fail with measured values") {
    val df = Seq(
      (1L, 1, Some("a"), 5.0),
      (1L, 1, Some("b"), 7.0),  // duplicate (k1,k2) pair
      (2L, 1, None, -1.0)       // null col, below min bound
    ).toDF("k1", "k2", "s", "v")
    val rep = Audit.assertionReport(df, Seq(
      Audit.Completeness("s", 1.0),
      Audit.Uniqueness(Seq("k1", "k2"), 1.0),
      Audit.MinBound("v", 0.0),
      Audit.MaxBound("v", 10.0)))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getBoolean(3)))
      .toMap
    assert(rep("completeness:s") == (2.0 / 3.0, false))
    assert(rep("uniqueness:k1,k2") == (2.0 / 3.0, false))
    assert(rep("min:v") == (-1.0, false))
    assert(rep("max:v") == (7.0, true))
  }

  test("assertion suite runs as one pass: single scan of the input") {
    val df = Seq((1L, 1, Some("a"), 5.0)).toDF("k1", "k2", "s", "v")
    val plan = Audit.assertionReport(df, Seq(
      Audit.Completeness("s", 1.0),
      Audit.MinBound("v", 0.0),
      Audit.MaxBound("v", 10.0)))
      .queryExecution.executedPlan.toString
    // without Uniqueness there is no Expand; all metrics ride one agg
    assert(!plan.contains("Expand"))
  }

  test("referential integrity: fraction matched, null FK unmatched") {
    val fact = Seq(Some(1L), Some(2L), Some(9L), None).toDF("fk")
    val dim = Seq(1L, 2L, 3L).toDF("pk")
    val r = Audit.referentialIntegrity(fact, "fk", dim, "pk", 1.0)
      .collect().head
    assert(r.getAs[Double]("value") == 0.5) // 2 of 4 matched
    assert(!r.getAs[Boolean]("passed"))
  }

  test("volume deltas: signed exact ppm, first day null") {
    def day(i: Int) = Timestamp.valueOf(f"2024-01-${i + 1}%02d 00:00:00")
    val rows = Seq((0, 100), (1, 150), (2, 75)).flatMap { case (i, n) =>
      (0 until n).map(j => (i.toLong * 1000 + j, day(i), 1L, "view",
        1.0, "{}"))
    }
    val out = graft.ops.Audit.eventVolumeDeltas(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value",
        "props")).collect()
      .map(r => r.getAs[Timestamp]("day") ->
        (Option(r.getAs[java.lang.Long]("delta")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("delta_ppm")).map(_.toLong)))
      .toMap
    assert(out(day(0)) == ((None, None)))          // no predecessor
    assert(out(day(1)) == ((Some(50L), Some(500000L))))   // +50%
    assert(out(day(2)) == ((Some(-75L), Some(-500000L)))) // -50%
  }

  test("robust anomaly: spike flagged, masking resisted, zero-MAD null") {
    def day(i: Int) = Timestamp.valueOf(f"2024-01-${i + 1}%02d 00:00:00")
    // 'view': steady ~100 with wiggle, one 10x spike on day 9
    val view = (0 until 10).flatMap { i =>
      val n = if (i == 9) 1000 else 100 + (i % 3)
      (0 until n).map(j =>
        (i.toLong * 100000 + j, day(i), 1L, "view", 1.0, "{}"))
    }
    // 'click': perfectly constant -> MAD 0 -> null score every day
    val click = (0 until 10).flatMap { i =>
      (0 until 50).map(j =>
        (900000L + i * 1000 + j, day(i), 2L, "click", 1.0, "{}"))
    }
    val events = (view ++ click).toDF("event_id", "ts", "user_id",
      "event_type", "value", "props")
    val out = graft.ops.Audit.eventAnomalyRobust(events).collect()
      .map(r => (r.getString(0), r.getAs[Timestamp]("day")) ->
        (Option(r.getAs[java.lang.Long]("z_q20")),
          r.getAs[Boolean]("anomaly"))).toMap
    val (zs, as_) = out(("view", day(9)))
    assert(zs.isDefined && as_, "spike not flagged by robust score")
    // steady days under threshold despite the spike inflating any
    // mean/sigma estimate (the masking case MAD resists)
    assert(!out(("view", day(3)))._2)
    // constant series: MAD 0 -> null score, not fabricated
    assert(out(("click", day(5))) == ((None, false)))
  }

  test("event anomaly: planted spike flagged, warmup rows null") {
    // 10 steady days at 100 then a 10x spike; one event_type
    def day(i: Int) = Timestamp.valueOf(f"2024-01-${i + 1}%02d 00:00:00")
    val rows = (0 until 10).flatMap { i =>
      val n = if (i == 9) 1000 else 100 + (i % 2) // slight wiggle: var > 0
      (0 until n).map(j => (i.toLong * 10000 + j, day(i), 1L, "view",
        1.0, "{}"))
    }
    val events = rows.toDF("event_id", "ts", "user_id", "event_type",
      "value", "props")
    val out = Audit.eventAnomaly(events).collect()
      .map(r => r.getAs[Timestamp]("day") ->
        (Option(r.getAs[java.lang.Long]("z_q20")),
          r.getAs[Boolean]("anomaly"))).toMap
    // day 0: no trailing window -> null score, not anomalous
    assert(out(day(0)) == ((None, false)))
    // steady mid-range day: scored, small z, not anomalous
    val (zMid, aMid) = out(day(5))
    assert(zMid.isDefined && !aMid && math.abs(zMid.get) < (3L << 20))
    // the spike: scored and flagged
    val (zSpike, aSpike) = out(day(9))
    assert(zSpike.isDefined && aSpike && zSpike.get > (3L << 20))
  }

  test("Predicate check: cross-field invariant measured, nulls count as failing") {
    val df = Seq((Some(1L), 2L), (Some(3L), 2L), (None, 5L))
      .toDF("a", "b")
    val out = Audit.assertionReport(df, Seq(
        Audit.Predicate("a <= b", 0.3),
        Audit.Predicate("b > 0", 1.0)))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getBoolean(3)))
      .toMap
    // a<=b holds for (1,2) only; (3,2) fails, (null,5) counts as
    // failing → 1/3 measured, >= 0.3 passes
    val (v1, p1) = out("predicate:a <= b")
    assert(math.abs(v1 - 1.0 / 3.0) < 1e-12 && p1)
    val (v2, p2) = out("predicate:b > 0")
    assert(v2 == 1.0 && p2)
  }

  test("seasonalNaiveBacktest: prior same-weekday mean, exact APE; no-history null") {
    // Mondays: 10, 12 events, then last Monday actual 22 →
    // forecast 11000 milli; APE = |22000−11000|·1000 div 22000 = 500
    def day(d: String, n: Int, base: Long, t: String) =
      (1 to n).map(i => (base + i, s"$d 12:00:00", 1L, t))
    val ev = (day("2024-01-01", 10, 100, "view")
      ++ day("2024-01-08", 12, 200, "view")
      ++ day("2024-01-15", 22, 300, "view")
      ++ day("2024-01-02", 7, 400, "click")) // single day → no hist
      .toDF("event_id", "ts_s", "user_id", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = Audit.seasonalNaiveBacktest(ev).collect()
      .map(r => (r.getString(0), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4))).toList
    assert(out === List(
      ("click", 7L, -1L, -1L),
      ("view", 22L, 11000L, 500L)))
  }

  test("dowBaseline: weekday-typical days read 0 deviation, the off-pattern day lights up") {
    // Mondays 2024-01-01/08 carry 10 events each; Monday 01-15
    // carries 20 → its dev vs the 3-Monday mean (13333 milli·10⁻³ ≈
    // 13.3) is +500 milli; the quiet Mondays read −250
    def day(d: String, n: Int, base: Long) =
      (1 to n).map(i => (base + i, s"$d 12:00:00", 1L, "view"))
    val ev = (day("2024-01-01", 10, 100) ++ day("2024-01-08", 10, 200)
      ++ day("2024-01-15", 20, 300))
      .toDF("event_id", "ts_s", "user_id", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = Audit.dowBaseline(ev).collect()
      .map(r => (r.getDate(1).toString, r.getInt(2), r.getLong(3),
        r.getLong(5))).toList
    // dow 0 (Monday); expected_milli = 40000 div 3 = 13333
    // dev: 10·1000·3 div 40 − 1000 = −250; 20·1000·3 div 40 = +500
    assert(out === List(
      ("2024-01-01", 0, 10L, -250L),
      ("2024-01-08", 0, 10L, -250L),
      ("2024-01-15", 0, 20L, 500L)))
  }

  test("columnProfile: nulls, exact distincts, min/max per column from one pass") {
    val df = Seq(
      (Some(3L), "b"), (Some(1L), "a"), (None, "a"), (Some(3L), "c")
    ).toDF("num", "s")
    val out = Audit.columnProfile(df, Seq("num", "s")).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5))).toList
    assert(out === List(
      ("num", 4L, 1L, 2L, "1", "3"),
      ("s", 4L, 0L, 3L, "a", "c")))
  }

  test("freshness: lag vs high-water mark exact, stale flag at threshold") {
    val ev = Seq(
      ("a", "2024-01-02 00:00:00"), ("a", "2024-01-02 01:00:00"),
      ("b", "2024-01-01 23:00:00"), // 2h behind → stale at 1h
      ("c", "2024-01-02 00:30:01")  // 29m59s behind → fresh at 30m
    ).toDF("event_type", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = Audit.freshness(ev, col("event_type"),
        maxLagMs = 1800000L)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(3), r.getBoolean(4))).toList
    assert(out === List(
      ("a", 2L, 0L, false),
      ("b", 1L, 7200000L, true),
      ("c", 1L, 1799000L, false)))
  }

  test("ksDrift: identical reads 0, disjoint reads 1, shift reads " +
      "the exact ECDF gap with min-value tie-break") {
    import spark.implicits._
    def ks(a: Seq[Double], b: Seq[Double]) =
      graft.ops.Audit.ksDrift(a.toDF("x"), b.toDF("x"), "x")
        .collect().head
    val same = ks(Seq(1, 2, 3), Seq(1, 2, 3))
    assert(same.getAs[Long]("d_num") === 0L)
    assert(same.getAs[Long]("ks_ppm") === 0L)
    // disjoint supports: D = 1 at the ref side's last value
    val disj = ks(Seq(1, 1, 2), Seq(3, 3, 4))
    assert(disj.getAs[Long]("ks_ppm") === 1000000L)
    assert(disj.getAs[Double]("at_value") === 2.0)
    // unit shift of a 4-point grid: D = 1/4, max attained at every
    // interior value -> at_value is the SMALLEST (deterministic)
    val shift = ks(Seq(1, 2, 3, 4), Seq(2, 3, 4, 5))
    assert(shift.getAs[Long]("d_num") === 4L)
    assert(shift.getAs[Long]("ks_ppm") === 250000L)
    assert(shift.getAs[Double]("at_value") === 1.0)
  }

  test("ksDrift null contract: null rows are excluded from both " +
      "sides and the counts") {
    import spark.implicits._
    def ks(a: Seq[Option[Double]], b: Seq[Option[Double]]) =
      graft.ops.Audit.ksDrift(a.toDF("x"), b.toDF("x"), "x")
        .collect().head
    // nulls on either/both sides: result identical to the null-free
    // twin (ECDF is undefined at NULL; mass excluded, not matched)
    val clean = ks(Seq(Some(1.0), Some(2.0), Some(3.0), Some(4.0)),
      Seq(Some(2.0), Some(3.0), Some(4.0), Some(5.0)))
    val dirty = ks(
      Seq(Some(1.0), None, Some(2.0), Some(3.0), Some(4.0), None),
      Seq(None, Some(2.0), Some(3.0), Some(4.0), Some(5.0)))
    assert(dirty.getAs[Long]("n_ref") === 4L)
    assert(dirty.getAs[Long]("n_cur") === 4L)
    assert(dirty.getAs[Long]("d_num") === clean.getAs[Long]("d_num"))
    assert(dirty.getAs[Long]("ks_ppm") === clean.getAs[Long]("ks_ppm"))
    assert(dirty.getAs[Double]("at_value") ===
      clean.getAs[Double]("at_value"))
  }

  test("benfordAudit: exact ppm per digit, domain completion for " +
      "absent digits, sub-1/null exclusion") {
    val df = Seq(
      Some(1.0), Some(19.5), Some(100.0),   // digit 1 three times
      Some(2.0), Some(250.0),                // digit 2 twice
      Some(9.99),                            // digit 9 (FLOOR, not round)
      Some(0.5), None                        // excluded: <1 and null
    ).toDF("v")
    val rows = graft.ops.Audit.benfordAudit(df, "v").collect()
    assert(rows.length === 9)                 // full 1-9 domain
    val byDigit = rows.map(r => r.getAs[Int]("digit") ->
      (r.getAs[Long]("n"), r.getAs[Long]("obs_ppm"))).toMap
    assert(byDigit(1) === ((3L, 500000L)))
    assert(byDigit(2) === ((2L, 333333L)))
    assert(byDigit(9) === ((1L, 166666L)))
    assert(byDigit(3) === ((0L, 0L)))         // absent digit, full dev
    // TVD identical on every row of the group and equals half the
    // sum of absolute deviations vs the hardcoded Benford table
    val devs = rows.map(r => math.abs(r.getAs[Long]("obs_ppm") -
      r.getAs[Long]("benford_ppm"))).sum
    assert(rows.map(_.getAs[Long]("tvd_ppm")).distinct.toSeq ===
      Seq(devs / 2))
  }

  test("fdAudit: exact repair distance, violating-key count, " +
      "holds flag, null exclusion") {
    // a=1 maps to x,x,y (majority x, 1 violation); a=2 clean;
    // a=3 ties 1-1 (majority either way -> 1 violation)
    val df = Seq(
      (Some(1), Some("x")), (Some(1), Some("x")), (Some(1), Some("y")),
      (Some(2), Some("z")), (Some(2), Some("z")),
      (Some(3), Some("p")), (Some(3), Some("q")),
      (None, Some("w")), (Some(9), None))
      .toDF("a0", "b0")
    val r = graft.ops.Audit.fdAudit(df, "a0", "b0").collect().head
    assert(r.getAs[String]("fd") === "a0->b0")
    assert(r.getAs[Long]("n_rows") === 7L)
    assert(r.getAs[Long]("n_keys") === 3L)
    assert(r.getAs[Long]("violating_keys") === 2L)
    assert(r.getAs[Long]("violations") === 2L)
    assert(r.getAs[Long]("violation_ppm") === 285714L)
    assert(!r.getAs[Boolean]("holds"))
    // an exact FD holds with zero violations
    val clean = Seq((1, "m"), (1, "m"), (2, "n")).toDF("a0", "b0")
    val c = graft.ops.Audit.fdAudit(clean, "a0", "b0").collect().head
    assert(c.getAs[Boolean]("holds"))
    assert(c.getAs[Long]("violations") === 0L)
  }

  test("burstiness: metronomic feed scores 0, bursty feed far " +
      "above 1000 milli, single-day type NULL") {
    // flat: 4 days x 5 events; bursty: 3 quiet days + 1 spike;
    // solo: one day only (variance undefined)
    def rows(tp: String, perDay: Seq[Int]) =
      perDay.zipWithIndex.flatMap { case (n, i) =>
        Seq.fill(n)((tp, s"2024-04-0${i + 1} 08:00:00"))
      }
    val df = (rows("flat", Seq(5, 5, 5, 5)) ++
      rows("burst", Seq(1, 1, 1, 37)) ++
      rows("solo", Seq(9)))
      .toDF("event_type", "s")
      .select(col("event_type"), to_timestamp(col("s")).as("ts"))
    val out = graft.ops.Audit.burstiness(df)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    assert(out("flat").getAs[Long]("fano_milli") === 0L)
    // burst: n=4, sum=40, sum_x2=1372; (4*1372-1600)*1000/(3*40)
    // = 3888000/120 = 32400
    assert(out("burst").getAs[Long]("fano_milli") === 32400L)
    assert(out("burst").getAs[Long]("mean_milli") === 10000L)
    val solo = out("solo")
    assert(solo.isNullAt(solo.fieldIndex("fano_milli")))
  }

  test("winsorizedMean: exact clip points from the histogram, " +
      "outlier crushed, degenerate tails clip nothing") {
    val df = Seq(("g", 1L), ("g", 2L), ("g", 3L), ("g", 4L),
      ("g", 100L)).toDF("grp", "x")
    // 20/80: k_lo=1 -> v_lo=1, k_hi=4 -> v_hi=4; clipped sum 14
    val r = graft.ops.Audit
      .winsorizedMean(df, "x", Seq("grp"), 200000L, 800000L)
      .collect().head
    assert(r.getAs[Long]("v_lo") === 1L)
    assert(r.getAs[Long]("v_hi") === 4L)
    assert(r.getAs[Long]("raw_mean_milli") === 22000L)
    assert(r.getAs[Long]("wins_mean_milli") === 2800L)
    // default 5/95 with n=5: k_hi=5 -> v_hi=max -> nothing clips
    val d = graft.ops.Audit
      .winsorizedMean(df, "x", Seq("grp"))
      .collect().head
    assert(d.getAs[Long]("wins_mean_milli") ===
      d.getAs[Long]("raw_mean_milli"))
  }

  test("rocAucInfluence: dropping the noise group raises AUC, " +
      "dropping the signal group destroys it") {
    // A separates perfectly (pos@10/neg@1), B anti-separates
    val df = Seq(
      ("A", 10L, 1), ("A", 10L, 1), ("A", 1L, 0), ("A", 1L, 0),
      ("B", 1L, 1), ("B", 10L, 0))
      .toDF("src", "score", "y")
    val out = graft.ops.Audit
      .rocAucInfluence(df, "score", "y", "src")
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    // global: pos {10,10,1}, neg {1,1,10} -> auc2 = 12, AUC = 2/3
    assert(out("A").getAs[Long]("auc_all_ppm") === 666666L)
    // without A only B remains: AUC exactly 0
    assert(out("A").getAs[Long]("auc_without_ppm") === 0L)
    assert(out("A").getAs[Long]("influence_ppm") === -666666L)
    // without B, A separates perfectly
    assert(out("B").getAs[Long]("auc_without_ppm") === 1000000L)
    assert(out("B").getAs[Long]("influence_ppm") === 333334L)
    // a group whose exclusion empties one class -> NULL
    val oneSided = Seq(("A", 5L, 1), ("B", 7L, 0), ("B", 2L, 1))
      .toDF("src", "score", "y")
    val r = graft.ops.Audit
      .rocAucInfluence(oneSided, "score", "y", "src")
      .collect().map(x => x.getAs[String]("grp") -> x).toMap
    assert(r("B").isNullAt(r("B").fieldIndex("auc_without_ppm")))
  }

  test("spearmanRho: perfect monotone / inverse / classic 0.5 " +
      "fixtures, tie-degenerate NULL, null-row exclusion") {
    def rho(xs: Seq[Long], ys: Seq[Long]): Option[Long] = {
      val r = graft.ops.Audit
        .spearmanRho(xs.zip(ys).toDF("x", "y"), "x", "y")
        .collect().head
      if (r.isNullAt(r.fieldIndex("rho_milli"))) None
      else Some(r.getAs[Long]("rho_milli"))
    }
    assert(rho(Seq(1, 2, 3, 4), Seq(10, 20, 30, 40)) === Some(1000L))
    assert(rho(Seq(1, 2, 3, 4), Seq(40, 30, 20, 10)) === Some(-1000L))
    // [1,2,3] vs [1,3,2]: textbook Spearman 1/2
    assert(rho(Seq(1, 2, 3), Seq(1, 3, 2)) === Some(500L))
    // monotone but nonlinear values: rank correlation ignores spacing
    assert(rho(Seq(1, 2, 3, 4), Seq(1, 100, 101, 1000000)) ===
      Some(1000L))
    // a constant column has zero rank variance -> undefined
    assert(rho(Seq(1, 2, 3), Seq(7, 7, 7)) === None)
    // null rows drop entirely (both columns)
    val withNulls = Seq(
      (Some(1L), Some(10L)), (Some(2L), Some(20L)),
      (Some(3L), Some(30L)), (None, Some(99L)), (Some(9L), None))
      .toDF("x", "y")
    val r = graft.ops.Audit.spearmanRho(withNulls, "x", "y")
      .collect().head
    assert(r.getAs[Long]("n") === 3L)
    assert(r.getAs[Long]("rho_milli") === 1000L)
  }

  test("cusumShift: windowed closed form equals the direct " +
      "recurrence, and a planted level shift raises alarm_hi") {
    // 4 quiet days at 10 then 2 shifted days at 100:
    // mean = 240 div 6 = 40, k = 4 (100 milli), h = 40 (1000 milli)
    val counts = Seq(10, 10, 10, 10, 100, 100)
    val rows = counts.zipWithIndex.flatMap { case (n, i) =>
      Seq.fill(n)(s"2024-03-0${i + 1} 12:00:00")
    }
    val df = rows.toDF("s").select(to_timestamp(col("s")).as("ts"))
    val out = graft.ops.Audit.cusumShift(df, 100L, 1000L)
      .orderBy(col("d")).collect()
    assert(out.length === 6)
    assert(out.forall(_.getAs[Long]("mean_x") === 40L))
    // direct recurrence replay with mean 40, k 4
    var (sh, sl) = (0L, 0L)
    val expect = counts.map { x =>
      sh = math.max(0L, sh + x - 40 - 4)
      sl = math.max(0L, sl + 40 - x - 4)
      (sh, sl)
    }
    assert(out.map(r => (r.getAs[Long]("s_hi"),
      r.getAs[Long]("s_lo"))).toSeq === expect)
    // the shift is flagged on its first day, not before
    assert(out.map(_.getAs[Boolean]("alarm_hi")).toSeq ===
      Seq(false, false, false, false, true, true))
  }

  test("rocAuc: hand-computed tie-corrected AUC, ROC points, " +
      "perfect separation, and one-class NULLs") {
    // group g: neg scores {1,2}, pos scores {2,3} -> AUC = 7/8
    // group p: pos {10,11} / neg {1} perfectly separated -> AUC = 1
    // group z: positives only -> fpr/auc NULL
    val df = Seq(
      ("g", 1L, 0), ("g", 2L, 0), ("g", 2L, 1), ("g", 3L, 1),
      ("p", 1L, 0), ("p", 10L, 1), ("p", 11L, 1),
      ("z", 5L, 1), ("z", 6L, 1))
      .toDF("src", "score", "y")
    val rows = graft.ops.Audit.rocAuc(df, "score", "y", Seq("src"))
      .collect()
    val byKey = rows.map(r => (r.getAs[String]("src"),
      r.getAs[Long]("score")) -> r).toMap
    assert(byKey(("g", 1L)).getAs[Long]("auc_ppm") === 875000L)
    assert(byKey(("p", 1L)).getAs[Long]("auc_ppm") === 1000000L)
    // ROC point at g/score=2 (predict positive when score >= 2):
    // tpr = 2/2, fpr = 1/2
    assert(byKey(("g", 2L)).getAs[Long]("tpr_ppm") === 1000000L)
    assert(byKey(("g", 2L)).getAs[Long]("fpr_ppm") === 500000L)
    // one-class group: defined ratios still emit, undefined are NULL
    val z = byKey(("z", 5L))
    assert(z.getAs[Long]("tpr_ppm") === 1000000L)
    assert(z.isNullAt(z.fieldIndex("fpr_ppm")))
    assert(z.isNullAt(z.fieldIndex("auc_ppm")))
  }

  test("rocAuc: all-tied scores give AUC exactly 1/2 and nulls in " +
      "score/label rows are excluded") {
    val df = Seq(
      (Some(7L), Some(1)), (Some(7L), Some(0)), (Some(7L), Some(1)),
      (Some(7L), Some(0)), (None, Some(1)), (Some(9L), None))
      .toDF("score", "y")
    val rows = graft.ops.Audit.rocAuc(df, "score", "y").collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Long]("n_pos") === 2L)
    assert(rows.head.getAs[Long]("n_neg") === 2L)
    assert(rows.head.getAs[Long]("auc_ppm") === 500000L)
  }

  test("benfordAudit: groups complete independently and a " +
      "Benford-faithful group scores a small TVD") {
    val faithful = (1 to 9).flatMap { d =>
      // counts proportional to log10(1+1/d) out of 1000
      val n = math.round(math.log10(1.0 + 1.0 / d) * 1000).toInt
      Seq.fill(n)(("good", d * 10.0))
    }
    val flat = (1 to 9).map(d => ("flat", d * 10.0))
    val df = (faithful ++ flat).toDF("g", "v")
    val tvd = graft.ops.Audit.benfordAudit(df, "v", Seq("g"))
      .select("g", "tvd_ppm").distinct().collect()
      .map(r => r.getAs[String]("g") -> r.getAs[Long]("tvd_ppm")).toMap
    assert(tvd("good") < 2000L, s"faithful group TVD ${tvd("good")}")
    assert(tvd("flat") > 200000L, s"flat group TVD ${tvd("flat")}")
  }

  test("reliabilityBins: hand-computed q20 gaps per bin") {
    // scale 2^3 = 8, 4 bins of width 2
    val df = Seq((0L, 0L), (1L, 1L), (6L, 0L), (7L, 1L))
      .toDF("sc", "y")
    val bins = Audit.reliabilityBins(df, "sc", "y",
      scaleBits = 3, nBins = 4)
      .collect().map(r => r.getAs[Long]("bin") ->
        (r.getAs[Long]("n"), r.getAs[Long]("sum_label"),
          r.getAs[Long]("sum_score_scaled"),
          r.getAs[Long]("gap_sq_q20"))).toMap
    // bin 0: p̄ = 1/16, ō = 1/2 → gap² = (7/16)² → q20 = 200704
    assert(bins(0L) == ((2L, 1L, 1L, 200704L)))
    // bin 3: p̄ = 13/16, ō = 1/2 → gap² = (5/16)² → q20 = 102400
    assert(bins(3L) == ((2L, 1L, 13L, 102400L)))
  }

  test("fleissKappa: perfect panel = q20 unity; unanimity on a " +
      "single answer = NULL (zero chance denominator)") {
    val perfect = Seq((true, true, true), (false, false, false))
      .toDF("a", "b", "c")
    val r1 = Audit.fleissKappa(perfect, Seq("a", "b", "c")).collect()
    assert(r1.head.getAs[Long]("pairs_agree") === 12L)
    assert(r1.head.getAs[Long]("kappa_q20") === 1048576L)
    val unanimous = Seq((true, true, true), (true, true, true))
      .toDF("a", "b", "c")
    val r2 = Audit.fleissKappa(unanimous, Seq("a", "b", "c"))
      .collect()
    assert(r2.head.isNullAt(r2.head.fieldIndex("kappa_q20")))
    // one split item: N=2, A = 6 + (4+1-3) = 8, K = 3+2 = 5
    val mixed = Seq((true, true, true), (true, true, false))
      .toDF("a", "b", "c")
    val r3 = Audit.fleissKappa(mixed, Seq("a", "b", "c")).collect()
    assert(r3.head.getAs[Long]("pairs_agree") === 8L)
    // num = 8·36 − 12·(25+1) = −24; den = 12·(36−25−1) = 120
    // → kappa_q20 = trunc(−24·2^20/120) = −209715
    assert(r3.head.getAs[Long]("kappa_q20") === -209715L)
  }

  test("blockingEval: completeness and reduction from planted " +
      "group structure") {
    val df = Seq(("a", "x"), ("a", "x"), ("b", "x"), ("c", "y"))
      .toDF("truth", "blk")
    val r = Audit.blockingEval(df, col("truth"), col("blk"))
      .collect().head
    assert(r.getAs[Long]("true_pairs") === 1L)
    assert(r.getAs[Long]("cand_pairs") === 3L)
    assert(r.getAs[Long]("covered_pairs") === 1L)
    assert(r.getAs[Long]("completeness_ppm") === 1000000L)
    // 1 − 3/C(4,2) = 1 − 1/2
    assert(r.getAs[Long]("reduction_ppm") === 500000L)
  }

  test("freshnessDecay: power-of-two half-life weights, capped age, " +
      "per-element truncating value decay") {
    val df = Seq(
      ("click", Timestamp.valueOf("2024-01-30 12:00:00"), 2.5),
      ("click", Timestamp.valueOf("2024-01-29 08:00:00"), 2.5),
      ("view", Timestamp.valueOf("2024-01-01 00:00:00"), 1000.0)
    ).toDF("event_type", "ts", "value")
    val m = Audit.freshnessDecay(df, maxAgeDays = 20)
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("weight_ppm"),
          r.getAs[Long]("decayed_value_milli"))).toMap
    // click: ages 0 and 1 → 10^6 + 5·10^5; values 2500·w div 10^6
    assert(m("click") == ((2L, 1500000L, 2500L + 1250L)))
    // view: age 29 capped at 20 → 10^6 div 2^20 = 0 ppm
    assert(m("view") == ((1L, 0L, 0L)))
  }

  test("halfSampleBootstrap: deterministic replicates, exact " +
      "mean arithmetic, honest selection parity") {
    val df = (1L to 100L).map(i => (i, 7L)).toDF("id", "v")
    val runA = Audit.halfSampleBootstrap(df, "id", "v", reps = 8)
      .orderBy(col("rep")).collect()
    assert(runA.length === 8)
    runA.foreach { r =>
      val nSel = r.getAs[Long]("n_sel")
      // P(all-in or all-out) = 2^-99 — a failure here means the
      // hash is not splitting
      assert(nSel > 0L && nSel < 100L)
      assert(r.getAs[Long]("sum_val") === nSel * 7L)
      assert(r.getAs[Long]("mean_milli") === 7000L)
    }
    // bit-identical reproducibility (pure hash, no RNG state)
    val runB = Audit.halfSampleBootstrap(df, "id", "v", reps = 8)
      .orderBy(col("rep")).collect()
    assert(runA.map(_.toSeq).toSeq == runB.map(_.toSeq).toSeq)
    // replicates differ from each other (the hash mixes rep into
    // the selection)
    assert(runA.map(_.getAs[Long]("n_sel")).distinct.length > 1)
  }

  test("concentrationHHI: exact ppm squares and effective keys") {
    val df = Seq(("en", "a"), ("en", "a"), ("en", "a"), ("en", "b"),
      ("fr", "x")).toDF("lang", "src")
    val m = Audit.concentrationHHI(df, "src", Seq("lang"))
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_keys"), r.getAs[Long]("n_rows"),
          r.getAs[Long]("hhi_ppm"), r.getAs[Long]("eff_keys_milli")))
      .toMap
    // en: (9+1)/16 = 625000 ppm → effective 1.6 keys
    assert(m("en") == ((2L, 4L, 625000L, 1600L)))
    // fr: single key → HHI 1, effective exactly 1
    assert(m("fr") == ((1L, 1L, 1000000L, 1000L)))
  }

  test("anovaF: hand sum-of-squares; zero within-variance is NULL") {
    val df = Seq(("a", 0L), ("a", 2L), ("b", 10L), ("b", 12L))
      .toDF("g", "x")
    val r = Audit.anovaF(df, "x", "g").collect().head
    // SSB = 100, SSW = 4, F = (100/1)/(4/2) = 50
    assert(r.getAs[Long]("ssb_int") === 100L)
    assert(r.getAs[Long]("ssw_int") === 4L)
    assert(r.getAs[Long]("f_milli") === 50000L)
    val degenerate = Seq(("a", 5L), ("a", 5L), ("b", 9L), ("b", 9L))
      .toDF("g", "x")
    val r2 = Audit.anovaF(degenerate, "x", "g").collect().head
    assert(r2.isNullAt(r2.fieldIndex("f_milli")))
  }

  test("dailyAutocorrelation: alternating series reads strongly " +
      "negative at lag 1, perfectly positive at lag 2; constant " +
      "series reads NULL") {
    import java.sql.Timestamp
    // 8 days alternating 2/4 events per day
    val rows = (1 to 8).flatMap { day =>
      val n = if (day % 2 == 1) 2 else 4
      Seq.fill(n)(("t",
        Timestamp.valueOf(f"2024-03-$day%02d 08:00:00"), 1.0))
    } ++ (1 to 4).flatMap { day =>
      Seq.fill(3)(("const",
        Timestamp.valueOf(f"2024-03-$day%02d 08:00:00"), 1.0))
    }
    val df = rows.toDF("event_type", "ts", "value")
    val m = Audit.dailyAutocorrelation(df, lags = Seq(1, 2))
      .collect().map(r => (r.getAs[String]("event_type"),
        r.getAs[Int]("lag")) ->
        Option(r.getAs[Any]("r_milli")).map(_.asInstanceOf[Long]))
      .toMap
    // alternation: lag 1 near -1000, lag 2 near +1000 (floor-div
    // noise keeps it off the exact pole, but the sign and magnitude
    // are unambiguous)
    assert(m(("t", 1)).exists(_ < -900L))
    assert(m(("t", 2)).exists(_ > 900L))
    assert(m(("const", 1)).isEmpty) // zero variance -> NULL
  }

  test("watermarkPlan: running-max lateness, exact lower quantiles, " +
      "in-order feed reads all-zero") {
    import java.sql.Timestamp
    def t(ms: Long) = new Timestamp(ms)
    // type a arrives (by event_id) with ts: 100, 300, 200, 400 ->
    // delays 0, 0, 100, 0; type b strictly in order -> all zero
    val df = Seq(
      ("a", 1L, t(100L)), ("a", 2L, t(300L)), ("a", 3L, t(200L)),
      ("a", 4L, t(400L)),
      ("b", 5L, t(10L)), ("b", 6L, t(20L))
    ).toDF("event_type", "event_id", "ts")
    val m = Audit.watermarkPlan(df).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_late"), r.getAs[Long]("p50_delay_ms"),
          r.getAs[Long]("p999_delay_ms"),
          r.getAs[Long]("max_delay_ms"),
          r.getAs[Long]("late_ppm"))).toMap
    // a: delays {0,0,0,100}; p50 at cum>=2 -> 0; p999 at cum>=3.996
    // -> 100; late 1/4 = 250000 ppm
    assert(m("a") == ((1L, 0L, 100L, 100L, 250000L)))
    assert(m("b") == ((0L, 0L, 0L, 0L, 0L)))
  }

  test("broadcastAdvisor: exact byte model, both recommendations") {
    val df = Seq((1L, "abcd"), (2L, "ef")).toDF("k", "s")
    // rows: 16 + 8 + 4 = 28 and 16 + 8 + 2 = 26 -> 54 bytes
    val r = Audit.broadcastAdvisor(df, "t", thresholdBytes = 100L)
      .collect().head
    assert(r.getAs[Long]("est_bytes") === 54L)
    assert(r.getAs[String]("recommend") === "broadcast")
    val r2 = Audit.broadcastAdvisor(df, "t", thresholdBytes = 54L)
      .collect().head
    assert(r2.getAs[String]("recommend") === "shuffle") // not <
  }

  test("mannWhitneyU: doubled midranks under ties; AUC extremes") {
    // a = {1, 2, 2}, b = {2, 4}: ranks 1, (2,3,4 tied -> mid 3), 5
    // 2R_a = 2 + 6 + 6 = 14; 2U_a = 14 - 3*4 = 2; 2U_b = 2*3*2-2=10
    val df = Seq(("a", 1L), ("a", 2L), ("a", 2L), ("b", 2L),
      ("b", 4L)).toDF("g", "v")
    val r = Audit.mannWhitneyU(df, col("g"), col("v"), "a", "b")
      .collect().head
    assert(r.getAs[Long]("n_a") === 3L)
    assert(r.getAs[Long]("n_b") === 2L)
    assert(r.getAs[Long]("r2_a") === 14L)
    assert(r.getAs[Long]("u2_a") === 2L)
    assert(r.getAs[Long]("u2_b") === 10L)
    // U identity: u2_a + u2_b = 2 n_a n_b
    assert(r.getAs[Long]("u2_a") + r.getAs[Long]("u2_b") === 12L)
    assert(r.getAs[Long]("auc_ppm") === 2L * 1000000L / 12L)
    // complete separation: every b above every a -> AUC = 0 for a
    val sep = Seq(("a", 1L), ("a", 2L), ("b", 9L), ("b", 10L))
      .toDF("g", "v")
    val r2 = Audit.mannWhitneyU(sep, col("g"), col("v"), "a", "b")
      .collect().head
    assert(r2.getAs[Long]("auc_ppm") === 0L)
    // and reversed roles -> AUC = 1e6
    val r3 = Audit.mannWhitneyU(sep, col("g"), col("v"), "b", "a")
      .collect().head
    assert(r3.getAs[Long]("auc_ppm") === 1000000L)
  }

  test("joinCardinalityAudit: exact under the containment " +
      "assumption's own premises; signed error when violated") {
    // uniform fan-out: 2 fact rows per key, dim unique per key ->
    // est = 6*3/max(3,3) = 6 = actual
    val fact = Seq(1L, 1L, 2L, 2L, 3L, 3L).toDF("k")
    val dim = Seq(1L, 2L, 3L).toDF("j")
    val r = Audit.joinCardinalityAudit(fact, dim, "k", "j", "u")
      .collect().head
    assert(r.getAs[Long]("n_est") === 6L)
    assert(r.getAs[Long]("n_actual") === 6L)
    assert(r.getAs[Long]("err_ppm") === 0L)
    // correlation violation: fact only hits one dim key of many ->
    // estimate undershoots actual? dim keys 1..6, fact all on key 1
    val fact2 = Seq(1L, 1L, 1L, 1L).toDF("k")
    val dim2 = (1L to 6L).toDF("j")
    val r2 = Audit.joinCardinalityAudit(fact2, dim2, "k", "j", "s")
      .collect().head
    // est = 4*6/6 = 4 = actual here (single-key fact); now dim with
    // duplicates on the hot key: actual doubles, est does not
    val dim3 = Seq(1L, 1L, 2L, 3L, 4L, 5L).toDF("j")
    val r3 = Audit.joinCardinalityAudit(fact2, dim3, "k", "j", "d")
      .collect().head
    assert(r2.getAs[Long]("err_ppm") === 0L)
    assert(r3.getAs[Long]("n_actual") === 8L)
    assert(r3.getAs[Long]("n_est") === 4L) // 4*6 div max(1,5)=5 -> 4
    assert(r3.getAs[Long]("err_ppm") === -500000L)
  }

  test("binaryChangepoint: planted level shift found at its day; " +
      "tie breaks to the earlier day") {
    import java.sql.Timestamp
    // type s: 10/day for 4 days then 50/day for 3 days -> split after
    // day 4 (i = 4)
    val rows = (1 to 4).flatMap(day => Seq.fill(10)(("s", day))) ++
      (5 to 7).flatMap(day => Seq.fill(50)(("s", day)))
    val df = rows.map { case (t, day) =>
      (t, Timestamp.valueOf(f"2024-01-$day%02d 12:00:00"), 1.0)
    }.toDF("event_type", "ts", "value")
    val r = ops.Audit.binaryChangepoint(df).collect().head
    assert(r.getAs[java.sql.Date]("split_day").toString ===
      "2024-01-04")
    assert(r.getAs[Long]("n_left") === 4L)
    assert(r.getAs[Long]("n_right") === 3L)
    assert(r.getAs[Long]("mean_left_milli") === 10000L)
    assert(r.getAs[Long]("mean_right_milli") === 50000L)
  }

  test("componentSizeProfile: histogram + exact ppm corpus share") {
    // clusters: {1,1,1}, {2,2,2}, {3}, {4} → sizes 3×2, 1×2
    val comps = Seq((10L, 1L), (11L, 1L), (12L, 1L), (20L, 2L),
      (21L, 2L), (22L, 2L), (30L, 3L), (40L, 4L))
      .toDF("id", "cluster")
    val m = Audit.componentSizeProfile(comps, "cluster")
      .collect().map(r => r.getAs[Long]("size") ->
        (r.getAs[Long]("n_clusters"), r.getAs[Long]("n_members"),
          r.getAs[Long]("members_ppm"))).toMap
    assert(m(1L) == ((2L, 2L, 250000L)))
    assert(m(3L) == ((2L, 6L, 750000L)))
  }

  test("categoricalMixDrift: identical per-period mixes read zero; " +
      "a flipped mix carries the chi-square mass") {
    import spark.implicits._
    // periods 1/2 identical (2:2), period 3 flipped (4:0)
    val df = (Seq.fill(2)((1L, "x")) ++ Seq.fill(2)((1L, "y")) ++
      Seq.fill(2)((2L, "x")) ++ Seq.fill(2)((2L, "y")) ++
      Seq.fill(4)((3L, "x")))
      .toDF("p", "c")
    val m = Audit.categoricalMixDrift(df, "c", col("p")).collect()
      .map(r => r.getAs[Long]("period") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_cats_seen"),
          r.getAs[Long]("chi2_milli"))).toMap
    // G=12, col_t x=8, y=4. periods 1,2: exp cells (8/3, 4/3):
    // cell x: (2*12-4*8)^2*1000/(12*4*8) = 64000/384 = 166
    // cell y: (2*12-4*4)^2*1000/(12*4*4) = 64000/192 = 333
    assert(m(1L) == ((4L, 2L, 499L)))
    assert(m(2L) == ((4L, 2L, 499L)))
    // period 3: only x seen: (4*12-4*8)^2*1000/(12*4*8) = 666
    assert(m(3L) == ((4L, 1L, 666L)))
  }

  test("alertCooldown: first anomaly alerts, anomalies within the " +
      "cooldown of the LAST EMITTED alert suppress (window must " +
      "not slide), far ones re-alert") {
    import spark.implicits._
    // 10 days, counts [3,3,1,1,3,1,1,1,3,1]: avg 1.6, anomaly at
    // n=3 (3*10*5 > 16*6). Anomaly days 1,2,5,9: alert d1; d2
    // suppressed (gap 1 < 3); d5 alerts (gap 4); d9 alerts (gap 4).
    val counts = Seq(3, 3, 1, 1, 3, 1, 1, 1, 3, 1)
    val rows = counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(("a", f"2024-01-${i + 1}%02d"))
    }
    val df = rows.toDF("event_type", "ts")
    val out = Audit.alertCooldown(df, cooldownDays = 3).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_anomaly_days") === 4L)
    assert(r.getAs[Long]("n_alerts") === 3L)
    assert(r.getAs[Long]("suppressed_ppm") === 250000L)
    // epoch day of 2024-01-01 is 19723
    assert(r.getAs[String]("alert_days") === "19723,19727,19731")
  }

  test("streamJoinStateAdvisor: trailing-window retention peaks " +
      "where rate clusters; sparse far minutes retain only " +
      "themselves") {
    import spark.implicits._
    val rows = Seq.fill(2)("2024-01-01 00:00:10") ++
      Seq.fill(3)("2024-01-01 00:01:30") ++
      Seq("2024-01-01 01:40:00")
    val df = rows.map(Tuple1(_)).toDF("ts")
    val r = Audit.streamJoinStateAdvisor(df, windowMinutes = 60,
      bytesPerRow = 64L).collect().head
    assert(r.getAs[Long]("w_minutes") === 60L)
    assert(r.getAs[Long]("n_minutes") === 3L)
    // states: m0 -> 2, m1 -> 2+3=5, m100 -> 1 (window long gone)
    assert(r.getAs[Long]("max_state_rows") === 5L)
    assert(r.getAs[Long]("avg_state_rows_milli") === 2666L)
    assert(r.getAs[Long]("max_state_bytes") === 320L)
  }

  test("holtWintersBacktest: scala replica of the fixed-point " +
      "recursion matches the fold; constant series reads mae 0") {
    import spark.implicits._
    val ys = Seq(10, 12, 8, 11, 9, 13, 7, 14, 9, 10, 12, 8, 15, 6)
    val rows = ys.zipWithIndex.flatMap { case (n, d) =>
      val day = java.time.LocalDate.ofEpochDay(d.toLong).toString
      Seq.fill(n)(("a", s"$day 12:00:00"))
    }
    val out = Audit.holtWintersBacktest(
      rows.toDF("event_type", "ts")).collect().head
    // independent replica of the documented recursion
    def tdiv(v: Long) = if (v < 0) -((-v) / 1000) else v / 1000
    var l = 0L; var b = 0L; var sae = 0L; var nsc = 0L; var seen = 0L
    val s = Array.fill[Option[Long]](7)(None)
    for ((n, d) <- ys.zipWithIndex) {
      val y = n * 1000L; val i = d % 7
      s(i) match {
        case None =>
          val lEff = if (seen == 0) y else l
          s(i) = Some(y - lEff); l = lEff
        case Some(sc) =>
          sae += math.abs(y - (l + b + sc)); nsc += 1
          val lNew = tdiv(500 * (y - sc) + 500 * (l + b))
          b = tdiv(250 * (lNew - l) + 750 * b)
          s(i) = Some(tdiv(250 * (y - lNew) + 750 * sc))
          l = lNew
      }
      seen += 1
    }
    assert(out.getAs[Long]("n_days") === 14L)
    assert(out.getAs[Long]("n_scored") === nsc)
    assert(out.getAs[Long]("mae_milli") === sae / nsc)
    assert(out.getAs[Long]("level_milli") === l)
    assert(out.getAs[Long]("trend_milli") === b)
    // naive baseline: |y_d - y_(d-7)| for d=7..13
    val naive = (7 until 14).map(d =>
      math.abs(ys(d) - ys(d - 7)) * 1000L)
    assert(out.getAs[Long]("naive_mae_milli") ===
      naive.sum / naive.size)
    // constant series: forecasts are exact after warmup
    val const = (0 until 21).flatMap { d =>
      val day = java.time.LocalDate.ofEpochDay(d.toLong).toString
      Seq.fill(5)(("c", s"$day 01:00:00"))
    }
    val rc = Audit.holtWintersBacktest(
      const.toDF("event_type", "ts")).collect().head
    assert(rc.getAs[Long]("mae_milli") === 0L)
    assert(rc.getAs[Long]("trend_milli") === 0L)
    assert(rc.getAs[Long]("level_milli") === 5000L)
  }

  test("isotonicCalibration: adjacent violators pool to their " +
      "weighted mean; monotone input passes through untouched") {
    import spark.implicits._
    // 4 bins x 10 rows (scaleBits=5, nBins=4 -> width 8): rates
    // 0.2, 0.5, 0.4, 0.8 — bins 1 and 2 violate and pool to 0.45
    def rows(bin: Int, pos: Int) =
      (0 until pos).map(_ => (bin * 8L, 1L)) ++
        (pos until 10).map(_ => (bin * 8L, 0L))
    val df = (rows(0, 2) ++ rows(1, 5) ++ rows(2, 4) ++ rows(3, 8))
      .toDF("score_scaled", "y")
    val out = Audit.isotonicCalibration(df, "score_scaled", "y",
      scaleBits = 5, nBins = 4).collect()
      .map(r => (r.getAs[Long]("bin"), r.getAs[Long]("raw_rate_milli"),
        r.getAs[Long]("fit_milli"))).toList
    assert(out === List((0L, 200L, 200L), (1L, 500L, 450L),
      (2L, 400L, 450L), (3L, 800L, 800L)))
    // already-monotone rates are a fixed point of the fit
    val mono = (rows(0, 1) ++ rows(1, 4) ++ rows(2, 6) ++ rows(3, 9))
      .toDF("score_scaled", "y")
    val fit2 = Audit.isotonicCalibration(mono, "score_scaled", "y",
      scaleBits = 5, nBins = 4).collect()
      .map(r => r.getAs[Long]("fit_milli")).toList
    assert(fit2 === List(100L, 400L, 600L, 900L))
  }

  test("selectivityAudit: planted perfect correlation reads " +
      "corr 2000, independent pair reads 1000") {
    import spark.implicits._
    // 100 rows: x and y co-occur perfectly (50/50); z alternates
    // independently of x (25 of the 50 x-rows have z)
    val df = (0 until 100).map { i =>
      (i < 50, i < 50, i % 2 == 0)
    }.toDF("x", "y", "z")
    val out = Audit.selectivityAudit(df,
      Seq("x" -> col("x"), "y" -> col("y"), "z" -> col("z")),
      Seq("x" -> "y", "x" -> "z")).collect()
      .map(r => r.getAs[String]("pair") ->
        (r.getAs[Long]("actual_ppm"), r.getAs[Long]("est_ppm"),
          r.getAs[Long]("corr_milli"))).toMap
    // x&y: actual 500000 vs est 250000 -> the planner would
    // underestimate the conjunction 2x
    assert(out("x & y") == ((500000L, 250000L, 2000L)))
    assert(out("x & z") == ((250000L, 250000L, 1000L)))
  }

  test("kaplanMeier: censored users stay in the risk set, survival " +
      "steps only at churn durations, q20 products floor") {
    import spark.implicits._
    // corpus days 0..20 (end_day = 20, churn cut = last <= 6):
    //  u1 day 0 only          -> churned, t = 0
    //  u2 days 0..3           -> churned, t = 3
    //  u3 days 2 and 20       -> censored at t = 18
    //  u4 days 0 and 6        -> churned (last = 6 = 20-14), t = 6
    def d(day: Int) = f"2024-01-${day + 1}%02d"
    val rows =
      Seq(("a", 1L, d(0)), ("a", 2L, d(0)), ("a", 2L, d(3)),
        ("a", 3L, d(2)), ("a", 3L, d(20)), ("a", 4L, d(0)),
        ("a", 4L, d(6)))
    val out = Audit.kaplanMeier(
      rows.toDF("event_type", "user_id", "ts")).collect()
      .map(r => r.getAs[Long]("t") ->
        ((r.getAs[Long]("n_risk"), r.getAs[Long]("d_churned"),
          r.getAs[Long]("c_censored"), r.getAs[Long]("s_q20"))))
      .toMap
    assert(out.keySet === Set(0L, 3L, 6L, 18L))
    assert(out(0L) == ((4L, 1L, 0L, 786432L)))  // 2^20 * 3/4
    assert(out(3L) == ((3L, 1L, 0L, 524288L)))  // * 2/3
    assert(out(6L) == ((2L, 1L, 0L, 262144L)))  // * 1/2
    assert(out(18L) == ((1L, 0L, 1L, 262144L))) // censored: flat
  }

  test("nelsonAalen: cumulative hazard steps d/n in exact micro " +
      "over the SAME risk table as kaplanMeier; censoring adds no " +
      "hazard; -ln(KM) tracks NA") {
    import spark.implicits._
    // identical fixture to the kaplanMeier test above
    def d(day: Int) = f"2024-01-${day + 1}%02d"
    val rows =
      Seq(("a", 1L, d(0)), ("a", 2L, d(0)), ("a", 2L, d(3)),
        ("a", 3L, d(2)), ("a", 3L, d(20)), ("a", 4L, d(0)),
        ("a", 4L, d(6)))
    val out = Audit.nelsonAalen(
      rows.toDF("event_type", "user_id", "ts")).collect()
      .map(r => r.getAs[Long]("t") ->
        ((r.getAs[Long]("n_risk"), r.getAs[Long]("h_step_micro"),
          r.getAs[Long]("h_cum_micro")))).toMap
    assert(out.keySet === Set(0L, 3L, 6L, 18L))
    assert(out(0L) == ((4L, 250000L, 250000L)))   // 1/4
    assert(out(3L) == ((3L, 333333L, 583333L)))   // + 1/3
    assert(out(6L) == ((2L, 500000L, 1083333L)))  // + 1/2
    assert(out(18L) == ((1L, 0L, 1083333L)))      // censored: flat
    // -ln(S(6)) = -ln(1/4) = 1.386 vs H(6) = 1.083 — same order,
    // NA <= -ln(KM) at every step (the standard inequality)
    assert(out(6L)._3 <= math.ceil(-math.log(0.25) * 1e6).toLong)
  }

  test("dailyPeriodogram: a pure period-2 alternation concentrates " +
      "power at P=2 exactly (hand-computed fixed point) and " +
      "dominates every other period") {
    import spark.implicits._
    // 8 days alternating 3 and 1 events: x = 3000/1000 milli,
    // T = 8, S = 16000; x·T − S = ±8000. P=2 trig is exact in q20
    // (cos 0 = 2^20, cos π = −2^20, sin both 0) so
    // re_raw = 8·8000·2^20, re_q = re_raw/(S·T) = 524288,
    // power = 524288² = 274877906944
    def d(day: Int) = f"2024-03-${day + 1}%02d"
    val rows = (0 until 8).flatMap { t =>
      val n = if (t % 2 == 0) 3 else 1
      (0 until n).map(i => ((t * 10 + i).toLong,
        java.sql.Timestamp.valueOf(s"${d(t)} 12:00:00"),
        1L, "a", 1.0, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props")
    val out = Audit.dailyPeriodogram(rows).collect()
      .map(r => r.getAs[Long]("period") ->
        (r.getAs[Long]("n_days"), r.getAs[Long]("power"))).toMap
    assert(out.keySet === (2L to 14L).toSet)
    assert(out(2L) === ((8L, 274877906944L)))
    for (p <- 3L to 14L)
      assert(out(p)._2 < out(2L)._2, s"period $p >= period 2")
  }

  test("westernElectricRules: matches an integer replica on an " +
      "irregular series; 8 consecutive below-mean days complete r4; " +
      "a constant series sides 0 and fires nothing") {
    import spark.implicits._
    def d(day: Int) = f"2024-01-${day + 1}%02d"
    val series = Map(
      "a" -> Seq(5, 1, 2, 1, 1, 9, 1, 2, 1, 14),
      "b" -> Seq(3, 3, 3, 3, 3, 3, 3, 3, 3, 3),
      "c" -> Seq(1, 1, 1, 1, 1, 1, 1, 1, 100, 100))
    val rows = series.toSeq.flatMap { case (t, xs) =>
      xs.zipWithIndex.flatMap { case (x, i) =>
        Seq.fill(x)((t, d(i)))
      }
    }
    val out = Audit.westernElectricRules(
      rows.toDF("event_type", "ts")).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day"))
        -> ((r.getAs[Long]("x"), r.getAs[Long]("side"),
          r.getAs[Long]("r1"), r.getAs[Long]("r2"),
          r.getAs[Long]("r3"), r.getAs[Long]("r4")))).toMap
    // integer replica of the cross-multiplied rules
    val day0 = out.keys.map(_._2).min
    for ((t, xs) <- series) {
      val n = xs.size.toLong
      val s = xs.map(_.toLong).sum
      val ss = xs.map(x => x.toLong * x).sum
      val varn = n * ss - s * s
      val dev = xs.map(x => x * n - s)
      val side = dev.map(v => if (v > 0) 1L else if (v < 0) -1L else 0L)
      def beyond(k: Long) =
        dev.map(v => BigInt(v) * v > BigInt(k) * k * varn)
      val (b1, b2, b3) = (beyond(1), beyond(2), beyond(3))
      def lastK(i: Int, k: Int, f: Int => Boolean): Int =
        (math.max(0, i - k + 1) to i).count(f)
      for (i <- xs.indices) {
        val exp = (xs(i).toLong, side(i),
          if (b3(i)) 1L else 0L,
          if (lastK(i, 3, j => b2(j) && side(j) == 1L) >= 2 ||
            lastK(i, 3, j => b2(j) && side(j) == -1L) >= 2) 1L else 0L,
          if (lastK(i, 5, j => b1(j) && side(j) == 1L) >= 4 ||
            lastK(i, 5, j => b1(j) && side(j) == -1L) >= 4) 1L else 0L,
          if (lastK(i, 8, j => side(j) == 1L) == 8 ||
            lastK(i, 8, j => side(j) == -1L) == 8) 1L else 0L)
        assert(out((t, day0 + i)) == exp,
          s"type $t day $i: got ${out((t, day0 + i))}, want $exp")
      }
    }
    // targeted: 'c' completes 8-below on day index 7, not before
    assert(out(("c", day0 + 7))._6 === 1L)
    assert(out(("c", day0 + 6))._6 === 0L)
    // constant series: side 0 everywhere, no rule fires
    for (i <- 0 until 10)
      assert(out(("b", day0 + i)) == ((3L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("interruptedTimeSeries: level jump on a flat series, trend " +
      "break on a trending one; intercepts extrapolate to the cut") {
    import spark.implicits._
    def d(day: Int) = f"2024-01-${day + 1}%02d"
    // 10 days, cut at the midpoint (epoch (mn+mx) div 2 = index 4):
    // 'a' flat 5 then flat 9 -> pure level jump 4000 milli;
    // 'b' ramps 1..4 pre (slope 1000, line hits 5 AT the cut) then
    // flat 20 -> trend delta -1000, level delta 15000
    val series = Map(
      "a" -> Seq(5, 5, 5, 5, 9, 9, 9, 9, 9, 9),
      "b" -> Seq(1, 2, 3, 4, 20, 20, 20, 20, 20, 20))
    val rows = series.toSeq.flatMap { case (t, xs) =>
      xs.zipWithIndex.flatMap { case (x, i) => Seq.fill(x)((t, d(i))) }
    }
    val out = Audit.interruptedTimeSeries(
      rows.toDF("event_type", "ts")).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_pre"), r.getAs[Long]("n_post"),
          r.getAs[Long]("slope_pre_milli"),
          r.getAs[Long]("slope_post_milli"),
          r.getAs[Long]("level_pre_milli"),
          r.getAs[Long]("level_post_milli"),
          r.getAs[Long]("trend_delta_milli"),
          r.getAs[Long]("level_delta_milli")))).toMap
    assert(out("a") ==
      ((4L, 6L, 0L, 0L, 5000L, 9000L, 0L, 4000L)))
    assert(out("b") ==
      ((4L, 6L, 1000L, 0L, 5000L, 20000L, -1000L, 15000L)))
  }

  test("conformalCoverage: parity-split residuals, finite-sample " +
      "rank clamps to n_cal, coverage exact ppm") {
    import spark.implicits._
    def d(day: Int) = f"2024-01-${day + 1}%02d"
    // day counts 1..7 then 2,4,3,8,5,9,7: residuals vs d-7 by index
    // [1,2,0,4,0,3,0] at epoch days 19730..19736 — 2024-01-01 is
    // epoch 19723 (odd), so EVEN epoch = odd index: cal residuals
    // [1,0,0,0] (n=4, rank min(4, ceil(0.9*5)=5) CLAMPS to 4 ->
    // q90 = 1), test [2,4,3] -> none within 1 -> coverage 0 (the
    // shifted-distribution alarm this op exists to raise)
    val counts = Seq(1, 2, 3, 4, 5, 6, 7, 2, 4, 3, 8, 5, 9, 7)
    val rows = counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(("a", d(i)))
    }
    val out = Audit.conformalCoverage(
      rows.toDF("event_type", "ts")).collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getAs[Long]("n_cal"), r.getAs[Long]("n_test"),
      r.getAs[Long]("q90_err"), r.getAs[Long]("coverage_ppm")) ==
      ((4L, 3L, 1L, 0L)))
  }

  test("growthAccounting: actives split new/retained/resurrected, " +
      "churn reads the vanished prev-week set, horizon weeks drop") {
    import spark.implicits._
    // w0: u1,u2,u3 all new | w1: u1 retained, u2+u3 churn
    // w2: u4 new, u1 retained, u3 resurrected | w3: u1 only,
    // u3+u4 churn; u1's post-horizon churn week is filtered
    def d(w: Int) = f"2024-01-${w * 7 + 1}%02d"
    val rows = Seq(
      ("a", 1L, d(0)), ("a", 1L, d(1)), ("a", 1L, d(2)),
      ("a", 1L, d(3)),
      ("a", 2L, d(0)),
      ("a", 3L, d(0)), ("a", 3L, d(2)),
      ("a", 4L, d(2)))
    val out = Audit.growthAccounting(
      rows.toDF("event_type", "user_id", "ts")).collect()
    assert(out.length === 4)
    val m = out.map(r => r.getAs[Long]("w") ->
      ((r.getAs[Long]("n_active"), r.getAs[Long]("n_new"),
        r.getAs[Long]("n_retained"), r.getAs[Long]("n_resurrected"),
        r.getAs[Long]("n_churned"),
        Option(r.getAs[Any]("quick_ratio_milli"))))).toMap
    val w0 = m.keySet.min
    assert(m(w0) == ((3L, 3L, 0L, 0L, 0L, None)))
    assert(m(w0 + 1) == ((1L, 0L, 1L, 0L, 2L, Some(0L))))
    assert(m(w0 + 2) == ((3L, 1L, 1L, 1L, 0L, None)))
    assert(m(w0 + 3) == ((1L, 0L, 1L, 0L, 2L, Some(0L))))
  }

  test("stickiness: trailing-window distinct actives via the " +
      "expansion; ratio exact milli") {
    import spark.implicits._
    def d(day: Int) = f"2024-01-${day + 1}%02d"
    val rows = Seq(("a", 1L, d(0)), ("a", 1L, d(2)),
      ("a", 2L, d(2)), ("a", 3L, d(0)))
    val out = Audit.stickiness(
      rows.toDF("event_type", "user_id", "ts"), windowDays = 3)
      .collect()
      .map(r => r.getAs[Long]("d") ->
        ((r.getAs[Long]("dau"), r.getAs[Long]("mau"),
          r.getAs[Long]("dau_mau_milli")))).toMap
    val d0 = out.keySet.min
    // d0: dau {u1,u3}, window actives {u1,u3} -> 1000
    // d2: dau {u1,u2}, window actives {u1,u2,u3} -> 666
    assert(out(d0) == ((2L, 2L, 1000L)))
    assert(out(d0 + 2) == ((2L, 3L, 666L)))
  }

  test("theilSenTrend: median pairwise slope shrugs off an outlier " +
      "day that bends OLS; even pair counts floor-average the mids") {
    import spark.implicits._
    def d(day: Int) = f"2024-01-${day + 1}%02d"
    // 'a': clean +2/day trend [1,3,5,7,9] with one spike day 50:
    // all clean pairs slope 2000; spike pairs finite but the median
    // stays 2000 while OLS bends upward
    val a = Seq(1, 3, 5, 7, 9, 50)
    // 'b': two days only -> 1 pair, slope (4-1)*1000 div 2 = 1500
    val rows = a.zipWithIndex.flatMap { case (x, i) =>
      Seq.fill(x)(("a", d(i)))
    } ++ Seq.fill(1)(("b", d(0))) ++ Seq.fill(4)(("b", d(2)))
    val out = Audit.theilSenTrend(rows.toDF("event_type", "ts"))
      .collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_days"), r.getAs[Long]("n_pairs"),
          r.getAs[Long]("sen_slope_milli"),
          r.getAs[Long]("ols_slope_milli"),
          r.getAs[Long]("delta_milli")))).toMap
    // replica: slopes of all 15 pairs of 'a'
    val days = a.indices.map(_.toLong)
    val slopes = (for (i <- a.indices; j <- a.indices if i < j)
      yield (a(j) - a(i)).toLong * 1000 / (days(j) - days(i)))
      .sorted
    assert(slopes.size === 15)
    val senA = slopes(7) // odd count: 8th of 15
    val (na, sda, sxa, sdxa, sdda) =
      (6L, days.sum, a.map(_.toLong).sum,
        days.zip(a).map { case (dd, x) => dd * x }.sum,
        days.map(dd => dd * dd).sum)
    val olsA = (na * sdxa - sda * sxa) * 1000 / (na * sdda - sda * sda)
    assert(out("a") == ((6L, 15L, senA, olsA, olsA - senA)))
    assert(senA === 2000L)     // the robust read: the clean trend
    assert(olsA > 4000L)       // OLS dragged by the spike
    assert(out("b") == ((2L, 1L, 1500L, 1500L, 0L)))
  }

  test("brierDecomposition: hand-computed micro components; the " +
      "rel-res+unc residual reads the within-bin forecast variance") {
    import spark.implicits._
    // scale 8 (3 bits), 2 bins of width 4:
    //  bin0: (0,0), (3,0); bin1: (7,1), (4,1)
    val df = Seq((0L, 0L), (3L, 0L), (7L, 1L), (4L, 1L))
      .toDF("sc", "y")
    val r = Audit.brierDecomposition(df, "sc", "y",
      scaleBits = 3, nBins = 2).collect().head
    assert(r.getAs[Long]("n") === 4L)
    assert(r.getAs[Long]("n_pos") === 2L)
    assert(r.getAs[Long]("brier_micro") === 101562L) // 26e6/256
    assert(r.getAs[Long]("rel_micro") === 66406L)    // 17e6/256
    assert(r.getAs[Long]("res_micro") === 250000L)   // 16e6/64
    assert(r.getAs[Long]("unc_micro") === 250000L)   // 4e6/16
    // residual 101562-66406 = within-bin var 0.1406/4 in micro
    assert(r.getAs[Long]("brier_micro") -
      (r.getAs[Long]("rel_micro") - r.getAs[Long]("res_micro") +
        r.getAs[Long]("unc_micro")) === 35156L)
  }

  test("leadLagCorrelation: a series that exactly leads another by " +
      "2 days reads r_milli = 1000 at lag 2 and below elsewhere; " +
      "constant overlap at other lags stays defined") {
    import spark.implicits._
    // type a daily counts on days 1..10: 1,2,1,3,1,4,1,5,1,6
    // type b = same pattern shifted +2 days (b on day d+2 equals a
    // on day d) → at lag 2 the joined pairs are identical series
    val pat = Seq(1, 2, 1, 3, 1, 4, 1, 5, 1, 6)
    def day(i: Int) = f"2024-03-${i}%02d"
    val rows =
      pat.zipWithIndex.flatMap { case (n, i) =>
        Seq.fill(n)(("view", day(i + 1))) } ++
      pat.zipWithIndex.flatMap { case (n, i) =>
        Seq.fill(n)(("purchase", day(i + 3))) }
    val ev = rows.zipWithIndex.map { case ((t, d), ix) =>
      (ix.toLong, java.sql.Timestamp.valueOf(s"$d 12:00:00"),
        ix.toLong, t, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props")
    val out = Audit.leadLagCorrelation(ev).collect()
      .map(r => r.getAs[Long]("lag") ->
        (r.getAs[Long]("n_days"),
          Option(r.getAs[Any]("r_milli")).map(_.asInstanceOf[Long])))
      .toMap
    // lag +2: all 10 a-days pair with the identical b values → r = 1
    assert(out(2L) === ((10L, Some(1000L))))
    // lag 0 pairs a(d) with a(d-2)'s value: alternating vs flat-ish
    // overlap — defined, smaller than the exact-match lag
    assert(out(0L)._2.exists(_ < 1000L))
    // the profile spans the full requested lag grid
    assert(out.keySet === (-7L to 7L).toSet)
  }
}
