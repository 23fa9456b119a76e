package graft

import org.apache.spark.sql.functions._
import graft.ops.{Relational, Text}

/** Behavior of the analytic additions: as-of join, sessionization,
  * percentiles, rolling-hash fingerprint.
  */
class AnalyticSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("asOfJoin attaches most recent right row at-or-before, inclusive") {
    val left = Seq(
      (1L, ts(5), 100L),   // after right@3 → 3
      (1L, ts(10), 101L),  // after right@10 (equal ts, inclusive) → 10
      (2L, ts(1), 102L)    // no right for user 2 → null
    ).toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts(3), 900L),
      (1L, ts(10), 901L),
      (1L, ts(20), 902L)
    ).toDF("user_id", "ts", "event_id")
    val out = Relational
      .asOfJoin(left, right, "user_id", "ts", "last_right_ts")
      .select(col("event_id"), col("last_right_ts")).collect()
      .map(r => r.getLong(0) ->
        Option(r.getTimestamp(1)).map(_.toString)).toMap
    assert(out(100L).contains("2024-01-01 10:03:00.0"))
    assert(out(101L).contains("2024-01-01 10:10:00.0"))
    assert(out(102L).isEmpty)
  }

  test("sessionizeBatch splits on gap and aggregates per session") {
    val ev = Seq(
      (1L, ts(0), 10L, 1.0), (1L, ts(10), 11L, 2.0),  // session 1
      (1L, ts(50), 12L, 3.0),                          // gap 40m → session 2
      (2L, ts(5), 13L, 4.0)                            // user 2, session 1
    ).toDF("user_id", "ts", "event_id", "value")
    val out = Relational.sessionizeBatch(ev, 30 * 60 * 1000L)
      .select("user_id", "sess_seq", "n_events", "sum_value")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out((1L, 1L)) == (2L, 3.0))
    assert(out((1L, 2L)) == (1L, 3.0))
    assert(out((2L, 1L)) == (1L, 4.0))
  }

  test("sessionGapCurve: one lag pass, per-threshold session " +
      "counts from the same gap scan") {
    // u1 gaps: 10 min, 40 min; u2 single event. Sessions:
    // 15/30-min gap → 3 (u1 splits), 60-min gap → 2
    val ev = Seq(
      (1L, ts(0), 10L, 1.0), (1L, ts(10), 11L, 2.0),
      (1L, ts(50), 12L, 3.0), (2L, ts(5), 13L, 4.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val out = Relational.sessionGapCurve(ev).collect()
      .map(r => r.getAs[Long]("gap_s") ->
        ((r.getAs[Long]("n_users"), r.getAs[Long]("n_events"),
          r.getAs[Long]("n_sessions"),
          r.getAs[Long]("events_per_session_ppm")))).toMap
    assert(out(900L) == ((2L, 4L, 3L, 1333333L)))
    assert(out(1800L) == ((2L, 4L, 3L, 1333333L)))
    assert(out(3600L) == ((2L, 4L, 2L, 2000000L)))
  }

  test("queueBacklog: Lindley closed form reproduces the hand-run " +
      "single-server recurrence") {
    def tss(s: String) = java.sql.Timestamp.valueOf(s)
    // service 2000/500/1000 ms; arrival 0/1000/10000 ms: event 2
    // waits 1 s behind event 1; event 3 finds an idle server
    val ev = Seq(
      ("a", 1L, tss("2024-01-01 10:00:00"), 2.0),
      ("a", 2L, tss("2024-01-01 10:00:01"), 0.5),
      ("a", 3L, tss("2024-01-01 10:00:10"), 1.0)
    ).toDF("event_type", "event_id", "ts", "value")
    val r = Relational.queueBacklog(ev).collect().head
    assert(r.getAs[String]("event_type") == "a")
    assert(r.getAs[Long]("n_events") == 3L)
    assert(r.getAs[Long]("max_wait_ms") == 1000L)
    assert(r.getAs[Long]("total_wait_ms") == 1000L)
    // busy 3500 ms over the [0, 11000] ms horizon
    assert(r.getAs[Long]("utilization_ppm") == 318181L)
  }

  test("peakConcurrency: overlapping sessions stack, inclusive " +
      "boundary ties count both sides") {
    // user 1: one session [0, 10m]; user 2: [5m, 15m] overlaps it;
    // user 3: a session starting exactly when user 2's ends (15m) —
    // inclusive intervals ⇒ instantaneous concurrency 2 there, and
    // all three overlap nowhere ⇒ day peak 2; one lone next-day
    // session ⇒ peak 1
    val ev = Seq(
      (1L, ts(0), 10L, 0.0), (1L, ts(10), 11L, 0.0),
      (2L, ts(5), 12L, 0.0), (2L, ts(15), 13L, 0.0),
      (3L, ts(15), 14L, 0.0), (3L, ts(20), 15L, 0.0),
      (4L, ts(60 * 24), 16L, 0.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val out = Relational.peakConcurrency(ev).collect()
      .map(r => r.getAs[Long]("day") ->
        ((r.getAs[Long]("n_sessions"),
          r.getAs[Long]("peak_concurrency"))))
      .toMap
    assert(out.size == 2)
    val days = out.keys.toSeq.sorted
    assert(out(days.head) == ((3L, 2L)))
    assert(out(days.last) == ((1L, 1L)))
  }

  test("groupPercentiles picks exact order-statistic values") {
    val orders = (1 to 10).map(i =>
      (i.toLong, "P", i * 10.0)).toDF(
      "o_orderkey", "o_orderpriority", "o_totalprice")
    val r = Relational.groupPercentiles(orders).collect().head
    assert(r.getAs[Double]("p50") == 50.0)   // ceil(10*0.5)=5th → 50
    assert(r.getAs[Double]("p90") == 90.0)   // ceil(10*0.9)=9th → 90
  }

  test("rolling-hash fingerprint equal for equal text, shift-robust") {
    import graft.functions.RollingHashMin
    val a = "the quick brown fox jumps over the lazy dog, again and again"
    // identical text → identical fingerprint
    assert(RollingHashMin.minRollingHash(a.getBytes("UTF-8"), 32) ==
      RollingHashMin.minRollingHash(a.getBytes("UTF-8"), 32))
    // winnowing property: prepending text far from the minimizing
    // window usually keeps the min (content-defined, not offset-bound);
    // at minimum the hash stays deterministic — check via DataFrame too
    val df = Seq((1L, a), (2L, a), (3L, "completely different text"))
      .toDF("doc_id", "text")
    val fps = Text.rollingFingerprint(df)
      .select("doc_id", "roll_fp", "n_docs").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fps(1L)._1 == fps(2L)._1)
    assert(fps(1L)._2 == 2L && fps(3L)._2 == 1L)
    assert(fps(1L)._1 != fps(3L)._1)
  }

  test("TokenShingles matches declarative shingle chain incl. edges") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "one two",                 // < 3 tokens → single joined shingle
      "",                        // empty → [""]
      "   ",                     // whitespace-only (space-trimmed) → [""]
      "a\tb\nc d e",             // mixed whitespace
      "dup dup dup dup",         // repeated shingles → distinct
      "  leading and trailing  "
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .union(Tables.documents(spark, sf("sf0.001"))
        .select("doc_id", "text").limit(200))
    val both = docs.select(
      graft.functions.tokenShingles(col("text"), 3).as("fast"),
      Text.shinglesFromTokens(Text.tokens(col("text"))).as("slow"))
    val bad = both
      .filter(not(col("fast") === col("slow"))).count()
    assert(bad == 0)
  }

  test("TopKAggregator: merge of partials == global top-k, ties by id") {
    val agg = new graft.functions.TopKAggregator(3)
    val xs = Seq((5.0, 10L), (5.0, 2L), (9.0, 7L), (1.0, 1L), (9.0, 8L))
    // two arbitrary partial splits must merge to the same result
    val (a, b) = xs.splitAt(2)
    val partial = agg.merge(
      a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
    val whole = xs.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(partial) == agg.finish(whole))
    assert(agg.finish(whole) == Seq(7L, 8L, 2L))  // 9.0@7, 9.0@8, 5.0@2
    // end-to-end through Spark partial aggregation, many partitions
    val df = spark.range(0, 1000).selectExpr(
      "'g' AS g", "CAST(id % 97 AS DOUBLE) AS v", "id")
      .repartition(8)
    val topk = org.apache.spark.sql.functions.udaf(
      new graft.functions.TopKAggregator(3),
      org.apache.spark.sql.Encoders.product[(Double, Long)])
    val out = df.groupBy(col("g"))
      .agg(topk(col("v"), col("id")).as("ids"))
      .collect().head.getSeq[Long](1)
    // max v = 96 at ids 96, 193, 290 → smallest ids win ties
    assert(out == Seq(96L, 193L, 290L))
  }

  test("short text hashes as single window") {
    import graft.functions.RollingHashMin
    val short = "abc"
    val h = RollingHashMin.minRollingHash(short.getBytes("UTF-8"), 32)
    // polynomial hash of the 3 bytes
    val expected = (('a'.toLong * 257 + 'b') * 257) + 'c'
    assert(h == expected)
  }

  test("lastTouchAttribution: latest touch wins, window bounds credit") {
    def t(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    def tDay(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    val events = Seq(
      // user 1: click then view then purchase → view (latest) wins
      (1L, t(1), 1L, "click", 0.0, "{}"),
      (2L, t(2), 1L, "view", 0.0, "{}"),
      (3L, t(3), 1L, "purchase", 9.0, "{}"),
      // user 2: touch 5 days before purchase → outside 3-day window
      (4L, tDay(1), 2L, "click", 0.0, "{}"),
      (5L, tDay(6), 2L, "purchase", 9.0, "{}"),
      // user 3: purchase with no touch at all
      (6L, t(4), 3L, "purchase", 9.0, "{}"),
      // user 1 again: later purchase still credits the same view
      (7L, t(5), 1L, "purchase", 9.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = graft.ops.Relational.lastTouchAttribution(events)
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        (Option(r.getAs[java.lang.Long]("touch_event_id")).map(_.toLong),
          Option(r.getAs[String]("touch_type")),
          r.getAs[Boolean]("attributed"))).toMap
    assert(out(3L) == ((Some(2L), Some("view"), true)))
    assert(out(5L) == ((None, None, false)))   // stale touch: no credit
    assert(out(6L) == ((None, None, false)))   // touchless conversion
    assert(out(7L) == ((Some(2L), Some("view"), true)))
    assert(out.size == 4)                      // conversions only
  }

  test("zipfAudit: zipfy corpus slopes negative; flat corpus near 0") {
    // 'a' 16x, 'b' 8x, 'c' 4x, 'd' 2x, 'e' 1x → clearly negative slope
    val zipfy = Seq((1L,
      ("a " * 16 + "b " * 8 + "c " * 4 + "d " * 2 + "e").trim,
      "en", "s", 0L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val s1 = graft.ops.Text.zipfAudit(zipfy).collect().head
    assert(s1.getAs[Long]("n_vocab") == 5L)
    assert(s1.getAs[Long]("n_tokens") == 31L)
    assert(s1.getAs[Long]("slope_q20") < -(1L << 19)) // < -0.5
    // every token equally frequent → y constant → slope exactly 0
    val flat = Seq((1L, "u v w x y z", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val s2 = graft.ops.Text.zipfAudit(flat).collect().head
    assert(s2.getAs[Long]("slope_q20") == 0L)
    // single-token vocabulary: no x variance → null, not a crash
    val one = Seq((1L, "solo", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(graft.ops.Text.zipfAudit(one).collect()
      .head.isNullAt(s2.fieldIndex("slope_q20")))
  }

  test("funnelLatency: exact per-stage ms percentiles over completing users only") {
    // user 1 completes in 60s + 120s; user 2 completes in 10s + 20s;
    // user 3 views only → excluded
    val ev = Seq(
      (1L, "2024-01-01 00:00:00", 1L, "view"),
      (2L, "2024-01-01 00:01:00", 1L, "click"),
      (3L, "2024-01-01 00:03:00", 1L, "purchase"),
      (4L, "2024-01-01 00:00:00", 2L, "view"),
      (5L, "2024-01-01 00:00:10", 2L, "click"),
      (6L, "2024-01-01 00:00:30", 2L, "purchase"),
      (7L, "2024-01-01 00:00:00", 3L, "view")
    ).toDF("event_id", "ts_s", "user_id", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = Relational.funnelLatency(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(5))).toList
    // n=2 → p25 row ceil(0.5)=1 (min), p50 row 1, max = slower user
    assert(out === List(
      ("click_ms", 2L, 10000L, 10000L, 60000L),
      ("purchase_ms", 2L, 20000L, 20000L, 120000L),
      ("total_ms", 2L, 30000L, 30000L, 180000L)))
  }

  test("waitingSuppliers: blames only the sole late supplier of multi-supplier orders") {
    val o = Seq((1L, "1995-01-01"), (2L, "1995-01-01"),
      (3L, "1995-01-01"))
      .toDF("o_orderkey", "od")
      .withColumn("o_orderdate", to_date(col("od"))).drop("od")
    val li = Seq(
      // order 1: supplier 7 late, supplier 8 on time → blame 7
      (1L, 7L, "1995-06-01"), (1L, 8L, "1995-02-01"),
      // order 2: both late → no single culprit, excluded
      (2L, 7L, "1995-06-01"), (2L, 9L, "1995-07-01"),
      // order 3: single-supplier late → EXISTS fails, excluded
      (3L, 7L, "1995-06-01")
    ).toDF("l_orderkey", "l_suppkey", "sd")
      .withColumn("l_shipdate", to_date(col("sd"))).drop("sd")
    val out = Relational.waitingSuppliers(li, o).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toList
    assert(out === List((7L, 1L)))
  }

  test("repeatPurchaseIntervals: per-customer consecutive gaps, disc percentiles exact") {
    // cust 1: gaps 10, 20; cust 2: gap 5 → sorted (5, 10, 20)
    val o = Seq(
      (1L, 1L, "1995-01-01"), (2L, 1L, "1995-01-11"),
      (3L, 1L, "1995-01-31"),
      (4L, 2L, "1995-03-01"), (5L, 2L, "1995-03-06"),
      (6L, 3L, "1995-05-01") // single order → no gap
    ).toDF("o_orderkey", "o_custkey", "od")
      .withColumn("o_orderdate", to_date(col("od"))).drop("od")
    val r = Relational.repeatPurchaseIntervals(o).head
    // n=3: p25 row 1 → 5; p50 row 2 → 10; p90 row 3 → 20
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == (3L, 5L, 10L, 20L, 20L))
  }

  test("smallQuantityRevenue / largeOrders / idleCustomers: decorrelated shapes hand-checked") {
    // Q17: part 1 qtys (1, 10, 10) → avg 7, 0.2·avg = 1.4 → only
    // qty 1 is small; its price 100 → avg_yearly 100/7
    val li = Seq((1L, 1L, 1.0, 100.0), (2L, 1L, 10.0, 5.0),
      (3L, 1L, 10.0, 5.0), (4L, 2L, 1.0, 9.0))
      .toDF("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    val part = Seq((1L, "Brand#11"), (2L, "Brand#99"))
      .toDF("p_partkey", "p_brand")
    val q17 = Relational.smallQuantityRevenue(li, part, "Brand#11")
      .head
    assert(q17.getLong(0) == 1L &&
      math.abs(q17.getDouble(1) - 100.0 / 7.0) < 1e-12)
    // Q18: order 10 qty 30 > 25; order 11 qty 20 stays out
    val li2 = Seq((10L, 12.0), (10L, 18.0), (11L, 20.0))
      .toDF("l_orderkey", "l_quantity")
    val o = Seq((10L, 1L, "1995-01-01", 500.0),
      (11L, 1L, "1995-01-02", 300.0))
      .toDF("o_orderkey", "o_custkey", "od", "o_totalprice")
      .withColumn("o_orderdate", to_date(col("od"))).drop("od")
    val cust = Seq((1L, "Customer#1", 0L, 100.0))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    val q18 = Relational.largeOrders(li2, o, cust, minQty = 25.0)
      .collect()
    assert(q18.length == 1 && q18.head.getLong(2) == 10L &&
      q18.head.getDouble(5) == 30.0)
    // Q22: avg positive balance = (100+300)/2 = 200; cust 2 (300)
    // beats it and has no recent order; cust 1 ordered recently
    val cust2 = Seq((1L, "a", 0L, 100.0), (2L, "b", 4L, 300.0),
      (3L, "c", 0L, -50.0))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    val q22 = Relational.idleCustomers(cust2, o, "1995-01-01")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2))).toList
    assert(q22 === List((4L, 1L, 300.0)))
  }

  test("shippingDelayAnalysis: boundary day is on time, ppm exact") {
    val li = Seq((1L, "1995-04-02"), (1L, "1995-04-01"),
      (2L, "1995-02-01")).toDF("l_orderkey", "sd")
      .withColumn("l_shipdate", to_date(col("sd"))).drop("sd")
    val o = Seq((1L, "1995-01-01", "1-URGENT"),
      (2L, "1995-01-01", "1-URGENT"))
      .toDF("o_orderkey", "od", "o_orderpriority")
      .withColumn("o_orderdate", to_date(col("od"))).drop("od")
    val r = Relational.shippingDelayAnalysis(li, o).head
    // Apr 1 = day 90 exactly → on time; Apr 2 = 91 → late
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (1L, 2L, 333333L))
  }

  test("cohortLtv: cohort attribution by first order, cumulative exact") {
    val orders = Seq(
      (1L, "1994-01-10", 10.0), (1L, "1995-06-01", 20.0),
      (1L, "1996-02-01", 40.0),
      (2L, "1995-03-01", 5.0), (2L, "1995-08-01", 7.0)
    ).toDF("o_custkey", "d", "o_totalprice")
      .withColumn("o_orderdate", to_date(col("d"))).drop("d")
    val out = Relational.cohortLtv(orders).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toList
    assert(out === List(
      (1994, 0, 1L, 10.0, 10.0), (1994, 1, 1L, 20.0, 30.0),
      (1994, 2, 1L, 40.0, 70.0),
      (1995, 0, 2L, 12.0, 12.0)))
  }

  test("rfmSegments: quintile cuts exact, best customer scores 555") {
    // 5 customers with strictly increasing recency/frequency/spend
    // alignment: customer 5 newest + most orders + biggest spend
    val rows = (1 to 5).flatMap { c =>
      (1 to c).map(i => (c.toLong, s"2024-01-0$c", 100.0 * c,
        c * 100L + i))
    }
    val orders = rows.toDF("o_custkey", "d", "o_totalprice",
        "o_orderkey")
      .withColumn("o_orderdate", to_date(col("d"))).drop("d")
    val out = Relational.rfmSegments(orders).collect()
      .map(r => (r.getLong(0), r.getLong(4), r.getLong(5),
        r.getLong(6), r.getLong(7))).toList
    // n=5 → quintile = rank itself; cust 5 is rank 5 on every axis
    assert(out === List(
      (1L, 1L, 1L, 1L, 111L), (2L, 2L, 2L, 2L, 222L),
      (3L, 3L, 3L, 3L, 333L), (4L, 4L, 4L, 4L, 444L),
      (5L, 5L, 5L, 5L, 555L)))
  }

  test("rollingActiveUsers: calendar spine keeps empty days; windows and stickiness exact") {
    // users 1,2 on Jan 1; user 1 on Jan 3; Jan 2 has no events but
    // must still report (spine), with dau=0 and trailing actives
    val ev = Seq(
      (1L, "2024-01-01 10:00:00"), (2L, "2024-01-01 11:00:00"),
      (1L, "2024-01-03 09:00:00")
    ).toDF("user_id", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = Relational.rollingActiveUsers(ev).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toList
    assert(out === List(
      ("2024-01-01", 2L, 2L, 2L, 1000000L),
      ("2024-01-02", 0L, 2L, 2L, 0L),
      ("2024-01-03", 1L, 2L, 2L, 500000L)))
  }
}
