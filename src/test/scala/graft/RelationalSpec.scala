package graft

import org.apache.spark.sql.functions._
import graft.ops.Relational

/** Plan-shape assertions: the scale-critical properties (broadcast
  * chosen, filters pushed to the scan, no stray shuffles) that the
  * oracle can't see. These guard the 100 TB posture.
  */
class RelationalSpec extends SparkSpec {

  private val d = sf("sf0.001")

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("dim joins broadcast (no shuffle of the big side by dim key)") {
    val p = plan(Relational.revenueByNation(
      Tables.customer(spark, d), Tables.orders(spark, d),
      Tables.lineitem(spark, d), Tables.nation(spark, d)))
    assert(p.contains("BroadcastHashJoin"))
  }

  test("filter is pushed into the parquet scan") {
    val df = Relational.pricingSummary(Tables.lineitem(spark, d))
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_shipdate)") ||
      scan.contains("LessThanOrEqual(l_shipdate"))
  }

  test("scan prunes columns (ReadSchema subset)") {
    val df = Relational.distinctAgg(Tables.lineitem(spark, d))
    val s = df.queryExecution.executedPlan.toString
    // only 3 referenced columns reach the scan, not all 11
    assert(s.contains("l_returnflag") && s.contains("l_partkey"))
    assert(!s.substring(s.indexOf("ReadSchema"))
      .takeWhile(_ != '\n').contains("l_extendedprice"))
  }

  test("per-group top-k has exactly one shuffle on the group key") {
    val df = Relational.topOrdersPerCustomer(Tables.orders(spark, d), 3)
    val exchanges = df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // one shuffle for the window partitioning + one for the final sort
    assert(exchanges.size <= 2)
  }

  test("semi/anti joins produce correct complements") {
    val c = Tables.customer(spark, d)
    val o = Tables.orders(spark, d)
    val withUrgent = Relational.semiJoin(c, o).count()
    val withoutUrgent = Relational.antiJoin(c, o).count()
    assert(withUrgent + withoutUrgent == c.count())
  }

  test("set ops partition the nationkey universe") {
    val out = Relational.setOps(Tables.customer(spark, d),
      Tables.supplier(spark, d))
      .groupBy("op").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = out.values.sum
    val distinctUnion = Tables.customer(spark, d)
      .select(col("c_nationkey").as("n")).distinct()
      .union(Tables.supplier(spark, d)
        .select(col("s_nationkey").as("n")).distinct())
      .distinct().count()
    assert(total == distinctUnion)
  }

  test("zset range-by-score: q16 scores, dense ranks, range filter") {
    import spark.implicits._
    val events = Seq(
      (1L, 1.5), (1L, 2.5),    // member 1 → 4.0  → 262144 q16
      (2L, 4.0),               // member 2 → 4.0  (tied with 1)
      (3L, 1.0),               // member 3 → 1.0  → 65536
      (4L, 100.0)              // member 4 → outside [lo, hi]
    ).toDF("user_id", "value")
    val out = graft.ops.Relational
      .zsetRangeByScore(events, 0L, 1000000L).collect()
    val byMember = out.map(r => r.getAs[Long]("member") ->
      (r.getAs[Long]("score_q16"), r.getAs[Int]("zrank"))).toMap
    assert(byMember(1L) == (262144L, 1))     // ties share a rank
    assert(byMember(2L) == (262144L, 1))
    assert(byMember(3L) == (65536L, 2))      // dense: next rank is 2
    assert(!byMember.contains(4L))           // ZRANGEBYSCORE bound
    // ordered by score desc, member asc
    assert(out.map(_.getAs[Long]("member")).toSeq == Seq(1L, 2L, 3L))
  }

  test("cohort retention: first-day cohorts, distinct-user offsets") {
    import spark.implicits._
    val events = Seq(
      // u1: cohort day0, returns day1 (twice that day — distinct!)
      (1L, "2026-03-01 08:00:00"), (1L, "2026-03-02 09:00:00"),
      (1L, "2026-03-02 21:00:00"),
      // u2: cohort day0 only
      (2L, "2026-03-01 12:00:00"),
      // u3: cohort day1, returns day3 (offset 2)
      (3L, "2026-03-02 10:00:00"), (3L, "2026-03-04 10:00:00"),
      // u4: cohort day0, returns past maxOffset → dropped
      (4L, "2026-03-01 01:00:00"), (4L, "2026-03-20 01:00:00")
    ).toDF("user_id", "ts_s")
      .select(col("user_id"), col("ts_s").cast("timestamp").as("ts"))
    val out = Relational.cohortRetention(events, maxOffset = 7)
      .collect()
      .map(r => (r.getAs[java.sql.Date]("cohort_day").toString,
        r.getAs[Int]("day_offset")) -> r.getAs[Long]("n_users"))
      .toMap
    assert(out == Map(
      ("2026-03-01", 0) -> 3L,   // u1, u2, u4
      ("2026-03-01", 1) -> 1L,   // u1 (two events, one user)
      ("2026-03-02", 0) -> 1L,   // u3
      ("2026-03-02", 2) -> 1L))  // u3 on day 4
  }

  test("supplierDistributionFuncs: ntile balance, pct_rank endpoints, running first/last") {
    import spark.implicits._
    val sup = (1L to 8L).map(i => (i, 0L, i * 10.0))
      .toDF("s_suppkey", "s_nationkey", "s_acctbal")
    val out = graft.ops.Relational.supplierDistributionFuncs(sup)
      .collect()
    assert(out.head.getDouble(3) == 0.0 &&
      out.last.getDouble(3) == 1.0)          // percent_rank endpoints
    assert(out.last.getDouble(4) == 1.0)     // cume_dist top
    // ntile(4) over 8 rows → exactly 2 per quartile
    assert(out.groupBy(_.getInt(5)).view.mapValues(_.length).toMap ==
      Map(1 -> 2, 2 -> 2, 3 -> 2, 4 -> 2))
    assert(out.forall(_.getDouble(6) == 10.0)) // running first
    assert(out.map(r => (r.getDouble(2), r.getDouble(7)))
      .forall { case (bal, cur) => bal == cur }) // running last
  }

  test("saltedJoin: row-identical to the plain join, salt reaches " +
      "the exchange, hot key spreads over buckets") {
    import spark.implicits._
    // hot key 1 (12 rows) + tail keys; dim has extras (inner drops)
    val fact = ((1 to 12).map(i => (1L, s"v$i")) ++
      Seq((2L, "a"), (3L, "b"))).toDF("k", "payload")
    val dim = Seq((1L, "one"), (2L, "two"), (3L, "three"),
      (9L, "unmatched")).toDF("k", "name")
    val joined = ops.Relational.saltedJoin(fact, dim.hint("merge"),
      Seq("k"), saltBuckets = 4)
    val plain = fact.join(dim, Seq("k"))
    assert(joined.collect().map(_.toSeq).toSet ===
      plain.collect().map(_.toSeq).toSet)
    assert(joined.count() === 14L)
    // the salt must be a join key in the physical plan (the whole
    // point — the exchange partitions on (k, salt), not k alone)
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("__salt"), s"salt column optimized away:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      s"dim side broadcast despite merge hint:\n$p")
    // the hot key's 12 rows actually spread: > 1 distinct salt value
    // (position-based round-robin — mirrors the operator's salt)
    val salts = fact.filter(col("k") === 1L)
      .withColumn("s", pmod(monotonically_increasing_id(), lit(4L))
        .cast("int"))
      .select("s").distinct().count()
    assert(salts > 1L, "hot key landed in a single salt bucket")
  }

  test("activityIslands: consecutive runs split on gaps; histogram " +
      "mass closes over all user-days") {
    import spark.implicits._
    import java.sql.Timestamp
    // user 1: days 1,2,3 then 7,8 (islands 3 and 2)
    // user 2: days 1 and 5 (two 1-islands); dup events same day fold
    val rows = Seq((1L, 1), (1L, 2), (1L, 3), (1L, 7), (1L, 8),
      (2L, 1), (2L, 1), (2L, 5))
    val df = rows.map { case (u, day) =>
      (u, Timestamp.valueOf(f"2024-05-$day%02d 10:00:00"), "view")
    }.toDF("user_id", "ts", "event_type")
    val m = ops.Relational.activityIslands(df).collect()
      .map(r => r.getAs[Long]("len") ->
        (r.getAs[Long]("n_islands"), r.getAs[Long]("n_days"),
          r.getAs[Long]("days_ppm"))).toMap
    assert(m(1L) == ((2L, 2L, 285714L))) // 2 of 7 user-days
    assert(m(2L) == ((1L, 2L, 285714L)))
    assert(m(3L) == ((1L, 3L, 428571L)))
    assert(m.values.map(_._2).sum === 7L)
  }

  test("pricingWaterfall: decomposition identities hold exactly on " +
      "a hand-priced year") {
    import spark.implicits._
    import java.sql.Date
    val li = Seq(
      (100.0, 0.10, 0.05, Date.valueOf("2024-03-01")),
      (200.0, 0.00, 0.10, Date.valueOf("2024-06-01"))
    ).toDF("l_extendedprice", "l_discount", "l_tax", "l_shipdate")
    val r = ops.Relational.pricingWaterfall(li).collect().head
    assert(r.getAs[Int]("ship_year") === 2024)
    assert(r.getAs[Double]("gross") === 300.0)
    assert(r.getAs[Double]("discount_giveback") === 10.0)
    assert(r.getAs[Double]("net") === 290.0)
    // tax: 90*0.05 + 200*0.10 = 4.5 + 20 = 24.5
    assert(r.getAs[Double]("tax_add") === 24.5)
    assert(r.getAs[Double]("charged") === 314.5)
    assert(r.getAs[Long]("discount_ppm") === 33333L) // 10/300
  }

  test("weightedPercentiles: weight shifts the quantile away from " +
      "the row median; total weight exact") {
    import spark.implicits._
    // values 1..4, weights 1,1,1,7: row-median is 2/3 but the
    // weighted p500 is 4 (7 of 10 units sit there)
    val df = Seq(("g", 1.0, 1L), ("g", 2.0, 1L), ("g", 3.0, 1L),
      ("g", 4.0, 7L)).toDF("k", "v", "w")
    val r = ops.Relational.weightedPercentiles(df, "k", "v", "w")
      .collect().head
    assert(r.getAs[Double]("p250") === 3.0) // cum 3 >= 2.5
    assert(r.getAs[Double]("p500") === 4.0)
    assert(r.getAs[Double]("p900") === 4.0)
    assert(r.getAs[Long]("total_weight") === 10L)
  }

  test("hierarchyClosure: chain depth + root via pointer doubling; " +
      "forest keeps trees apart; dangling parent fails loudly") {
    import spark.implicits._
    // chain 1<-2<-3<-4<-5 and separate root 10<-11
    val edges = Seq(
      (1L, Option.empty[Long]), (2L, Some(1L)), (3L, Some(2L)),
      (4L, Some(3L)), (5L, Some(4L)),
      (10L, None), (11L, Some(10L))
    ).toDF("id", "parent")
    val out = ops.Relational.hierarchyClosure(edges).collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("root"), r.getAs[Long]("depth"))).toMap
    assert(out(1L) == ((1L, 0L)) && out(5L) == ((1L, 4L)))
    assert(out(3L) == ((1L, 2L)) && out(11L) == ((10L, 1L)))
    assert(out.size === 7)
    // dangling parent: node 7 points at absent 99 -> require fires
    val bad = Seq((7L, Some(99L))).toDF("id", "parent")
    val e = intercept[IllegalArgumentException] {
      ops.Relational.hierarchyClosure(bad, maxRounds = 4).collect()
    }
    assert(e.getMessage.contains("unresolved"))
  }

  test("revenueConcentration: cumulative share at rank-bucket " +
      "boundaries, exact ppm") {
    import spark.implicits._
    val orders = Seq(
      (1L, 40.0), (2L, 30.0), (3L, 20.0), (4L, 10.0),
      (1L, 0.0) // second order same customer folds into rank 1
    ).toDF("o_custkey", "o_totalprice")
    val r = ops.Relational.revenueConcentration(orders, nBuckets = 2)
      .collect().map(x => x.getAs[Long]("bucket") ->
        (x.getAs[Long]("rk_end"), x.getAs[Double]("cum_rev"),
          x.getAs[Long]("cum_share_ppm"))).toMap
    assert(r(0L) == ((2L, 70.0, 700000L)))
    assert(r(1L) == ((4L, 100.0, 1000000L)))
  }

  test("skewJoin: row-identical to the plain join; only the hot " +
      "dim slice replicates; NULL keys drop like the plain join") {
    import spark.implicits._
    val fact = ((1 to 12).map(i => (Some(1L), s"v$i")) ++
      Seq((Some(2L), "a"), (Some(3L), "b"),
        (Option.empty[Long], "nullkey"))).toDF("k", "payload")
    val dim = Seq((1L, "one"), (2L, "two"), (3L, "three"),
      (9L, "unmatched")).toDF("k", "name")
    val hot = Seq(Tuple1(1L)).toDF("k")
    val joined = ops.Relational.skewJoin(fact, dim, Seq("k"), hot,
      saltBuckets = 4, forceShuffle = true)
    val plain = fact.join(dim, Seq("k"))
    assert(joined.collect().map(_.toSeq).toSet ===
      plain.collect().map(_.toSeq).toSet)
    assert(joined.count() === 14L) // 12 hot + 2 tail, null dropped
    // replication premium is topK × buckets, not |dim| × buckets:
    // extra columns on the hot list are dropped by the op's select
    val hotExtra = Seq((1L, 999L)).toDF("k", "ct")
    assert(ops.Relational.skewJoin(fact, dim, Seq("k"), hotExtra,
      saltBuckets = 4).count() === 14L)
  }

  test("saltedJoin: EXACT-DUPLICATE hot-key rows still join " +
      "correctly and spread (the value-hash degenerate case)") {
    import spark.implicits._
    // 64 byte-identical rows of one key: a value-derived salt maps
    // them all to ONE bucket (the r11-advised flaw); the position
    // salt must spread them and keep the join row-identical
    val fact = Seq.fill(64)((1L, "same")).toDF("k", "payload")
    val dim = Seq((1L, "one")).toDF("k", "name")
    val joined = ops.Relational.saltedJoin(fact, dim.hint("merge"),
      Seq("k"), saltBuckets = 8)
    assert(joined.count() === 64L)
    assert(joined.select("name").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("one"))
    // spreading witness on the duplicated frame itself
    val spread = fact
      .withColumn("s", pmod(monotonically_increasing_id(), lit(8L)))
      .select("s").distinct().count()
    assert(spread > 1L,
      "identical duplicate rows landed in a single salt bucket")
  }

  test("orderBacklog: interval sweep counts concurrent open orders") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")
    // order 1 open d1..d3, order 2 open d2..d3, order 3 never ships
    // a lineitem (excluded)
    val orders = Seq((1L, ts("2024-01-01")), (2L, ts("2024-01-02")),
      (3L, ts("2024-01-01")))
      .toDF("o_orderkey", "o_orderdate")
    val li = Seq((1L, ts("2024-01-02")), (1L, ts("2024-01-03")),
      (2L, ts("2024-01-03")))
      .toDF("l_orderkey", "l_shipdate")
    val m = Relational.orderBacklog(orders, li).collect()
      .map(r => r.getAs[java.sql.Date]("d").toString ->
        (r.getAs[Long]("delta"), r.getAs[Long]("open_orders"))).toMap
    assert(m("2024-01-01") == ((1L, 1L)))   // order 1 opens
    assert(m("2024-01-02") == ((1L, 2L)))   // order 2 opens
    assert(m("2024-01-03") == ((-2L, 0L)))  // both close
  }

  test("discountElasticity: exact two-point slope; flat discount " +
      "grid is NULL; 0.03 rounds to centi 3") {
    import spark.implicits._
    val li = Seq((0.00, 1.0), (0.10, 3.0))
      .toDF("l_discount", "l_quantity")
    val r = Relational.discountElasticity(li).collect().head
    // slope = (3000-1000)/(10-0) = 200 milli qty per centi
    assert(r.getAs[Long]("slope_qty_milli_per_centi") === 200L)
    val flat = Seq((0.05, 1.0), (0.05, 9.0))
      .toDF("l_discount", "l_quantity")
    val r2 = Relational.discountElasticity(flat).collect().head
    assert(r2.isNullAt(
      r2.fieldIndex("slope_qty_milli_per_centi")))
    // the binary-representation trap: 0.03*100 < 3 in doubles
    val tricky = Seq((0.03, 1.0)).toDF("l_discount", "l_quantity")
    assert(Relational.discountElasticity(tricky).collect()
      .head.getAs[Long]("sum_x") === 3L)
  }

  test("customerOrderDistribution: zero-order customers survive the " +
      "left join as the k=0 row; (custdist desc, c_count desc) order") {
    import spark.implicits._
    val cust = Seq(1L, 2L, 3L, 4L).toDF("c_custkey")
    val ords = Seq((10L, 1L), (11L, 1L), (12L, 2L), (13L, 3L))
      .toDF("o_orderkey", "o_custkey")
    val out = Relational.customerOrderDistribution(cust, ords)
      .collect().map(r =>
        (r.getAs[Long]("c_count"), r.getAs[Long]("custdist")))
    assert(out.toSeq === Seq((1L, 2L), (2L, 1L), (0L, 1L)))
  }

  test("velocityTrend: halves split at the feed's own midpoint, " +
      "decliners rank first, zero-baseline parts excluded") {
    import spark.implicits._
    // calendar days Jan 1..11 -> midpoint Jan 6
    val li = Seq(
      (1L, 10.0, "1995-01-01"), (1L, 2.0, "1995-01-11"),   // 200
      (2L, 5.0, "1995-01-02"), (2L, 5.0, "1995-01-10"),    // 1000
      (3L, 7.0, "1995-01-09"),                             // h1=0: out
      (4L, 4.0, "1995-01-03")                              // h2=0: 0
    ).toDF("l_partkey", "l_quantity", "l_shipdate")
    val out = Relational.velocityTrend(li, topN = 10).collect()
      .map(r => (r.getAs[Long]("l_partkey"), r.getAs[Long]("qty_h1"),
        r.getAs[Long]("qty_h2"), r.getAs[Long]("trend_milli")))
    assert(out.toSeq === Seq((4L, 4L, 0L, 0L), (1L, 10L, 2L, 200L),
      (2L, 5L, 5L, 1000L)))
  }

  test("topSupplier: Q15 tie semantics — ALL max-revenue suppliers " +
      "survive, micro-units exact") {
    import spark.implicits._
    // suppliers 1 and 2 tie at 990000 micro (10.00 * (1-0.01));
    // supplier 3 trails; line outside the window ignored
    val li = Seq(
      (1L, 10.0, 0.01, "1996-02-01"),
      (2L, 10.0, 0.01, "1996-02-02"),
      (3L, 5.0, 0.00, "1996-02-03"),
      (1L, 99.0, 0.00, "1995-06-01")
    ).toDF("l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
    val supp = Seq((1L, "s1"), (2L, "s2"), (3L, "s3"))
      .toDF("s_suppkey", "s_name")
    val out = Relational.topSupplier(li, supp).collect()
      .map(r => (r.getAs[Long]("s_suppkey"), r.getAs[Long]("rev_micro")))
    assert(out.toSeq === Seq((1L, 9900000L), (2L, 9900000L)))
  }

  test("lateOrderPriority: an order with late AND on-time lines " +
      "counts ONCE (order-level EXISTS, not line count)") {
    import spark.implicits._
    val ords = Seq((1L, "1995-01-01", "1-URGENT"),
      (2L, "1995-01-01", "2-HIGH"))
      .toDF("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Seq(
      (1L, "1995-01-10"), (1L, "1995-06-01"), (1L, "1995-07-01"),
      (2L, "1995-01-20"))
      .toDF("l_orderkey", "l_shipdate")
    val out = Relational.lateOrderPriority(li, ords, lateDays = 60)
      .collect()
      .map(r => (r.getAs[String]("o_orderpriority"),
        r.getAs[Long]("order_count")))
    assert(out.toSeq === Seq(("1-URGENT", 1L)))
  }

  test("minCostSupplier: min offer wins; offer ties break by acctbal " +
      "desc then suppkey") {
    import spark.implicits._
    val li = Seq(
      // part 1: supplier 1 offers 2.0/unit, supplier 2 offers 1.0/unit
      (1L, 1L, 4.0, 2.0), (1L, 2L, 2.0, 2.0),
      // part 2: both offer 1.0/unit -> acctbal desc picks supplier 1
      (2L, 1L, 3.0, 3.0), (2L, 2L, 5.0, 5.0)
    ).toDF("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
    val part = Seq((1L, 10, "pa"), (2L, 10, "pb"))
      .toDF("p_partkey", "p_size", "p_name")
    val supp = Seq((1L, "s1", 900.0, 0), (2L, "s2", 100.0, 0))
      .toDF("s_suppkey", "s_name", "s_acctbal", "s_nationkey")
    val nat = Seq((0, "N0", 0)).toDF("n_nationkey", "n_name",
      "n_regionkey")
    val reg = Seq((0, "EUROPE")).toDF("r_regionkey", "r_name")
    val out = Relational.minCostSupplier(li, part, supp, nat, reg,
      pSize = 10).collect()
      .map(r => (r.getAs[Long]("p_partkey"), r.getAs[String]("s_name"),
        r.getAs[Long]("offer_micro")))
    assert(out.sortBy(_._1).toSeq ===
      Seq((1L, "s2", 1000000L), (2L, "s1", 1000000L)))
  }

  test("excessSuppliers: one conditional scan, >20% lifetime share " +
      "in the target year flags") {
    import spark.implicits._
    // supplier 1: 30 of 100 in 1997 (flag at denom 5); supplier 2:
    // 10 of 100 (clear)
    val rows =
      (Seq.fill(30)((1L, 1L, 1.0, "1997-03-01")) ++
        Seq.fill(70)((1L, 1L, 1.0, "1998-03-01")) ++
        Seq.fill(10)((2L, 1L, 1.0, "1997-03-01")) ++
        Seq.fill(90)((2L, 1L, 1.0, "1998-03-01")))
    val li = rows.toDF("l_suppkey", "l_partkey", "l_quantity",
      "l_shipdate")
    val part = Seq((1L, "red bolt")).toDF("p_partkey", "p_name")
    val supp = Seq((1L, "s1"), (2L, "s2")).toDF("s_suppkey", "s_name")
    val out = Relational.excessSuppliers(li, part, supp).collect()
      .map(r => (r.getAs[Long]("s_suppkey"), r.getAs[Long]("qty_year"),
        r.getAs[Long]("qty_total")))
    assert(out.toSeq === Seq((1L, 30L, 100L)))
  }

  test("promoRevenueShare: ppm is exact scaled-integer division") {
    import spark.implicits._
    // one month: promo 10.00, total 40.00 -> 250000 ppm exactly
    val li = Seq(
      (1L, 10.0, 0.0, "1996-01-05"),
      (2L, 30.0, 0.0, "1996-01-15")
    ).toDF("l_partkey", "l_extendedprice", "l_discount", "l_shipdate")
    val part = Seq((1L, "PROMO"), (2L, "LARGE"))
      .toDF("p_partkey", "p_type")
    val r = Relational.promoRevenueShare(li, part).collect().head
    assert(r.getAs[Long]("promo_ppm") === 250000L)
    assert(r.getAs[Double]("promo_revenue") === 10.0)
    assert(r.getAs[Double]("total_revenue") === 40.0)
  }

  test("TPC-H wave dims broadcast: returned items, trade volume, " +
      "disjunctive revenue all BHJ (no shuffle of lineitem by a dim " +
      "key)") {
    val li = Tables.lineitem(spark, d)
    for (df <- Seq(
      Relational.returnedItemReport(Tables.customer(spark, d),
        Tables.orders(spark, d), li, Tables.nation(spark, d)),
      Relational.nationTradeVolume(li, Tables.orders(spark, d),
        Tables.customer(spark, d), Tables.supplier(spark, d),
        Tables.nation(spark, d)),
      Relational.disjunctiveRevenue(li, Tables.part(spark, d)))) {
      assert(plan(df).contains("BroadcastHashJoin"))
    }
    // the disjunction stays one scan: a single parquet read of
    // lineitem feeds the OR filter (no union-of-three-scans rewrite)
    val djPlan = Relational.disjunctiveRevenue(li, Tables.part(spark, d))
      .queryExecution.executedPlan.toString
    val scans = djPlan.split("\n").count(l =>
      l.contains("Scan parquet") && l.contains("lineitem"))
    assert(scans === 1)
    // the derived quantity envelope of the three OR-blocks prunes at
    // the scan even though no single block covers it
    assert(djPlan.contains("GreaterThanOrEqual(l_quantity,1.0)") &&
      djPlan.contains("LessThanOrEqual(l_quantity,30.0)"))
    // Q10: the returnflag filter reaches the lineitem scan
    val riPlan = Relational.returnedItemReport(Tables.customer(spark, d),
      Tables.orders(spark, d), li, Tables.nation(spark, d))
      .queryExecution.executedPlan.toString
    assert(riPlan.contains("EqualTo(l_returnflag,R)"))
  }

  test("rfmMigration: halves score independently against their own " +
      "snapshots; absence maps to segment 0 on the matrix border") {
    import spark.implicits._
    // span Jan 1..10 -> mid = Jan 5. h1: c1 (2 orders), c2 (1);
    // h2: c1 (1), c3 (2). Quintiles over n_c=2 give scores {1,3}.
    val o = Seq(
      (1L, 10.0, "1995-01-01"), (1L, 10.0, "1995-01-02"),
      (2L, 50.0, "1995-01-03"),
      (1L, 30.0, "1995-01-06"),
      (3L, 5.0, "1995-01-09"), (3L, 5.0, "1995-01-10"))
      .toDF("o_custkey", "o_totalprice", "o_orderdate")
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
    val out = Relational.rfmMigration(o).collect()
      .map(r => (r.getAs[Long]("segment_h1"),
        r.getAs[Long]("segment_h2")) ->
        ((r.getAs[Long]("n_cust"), r.getAs[Long]("share_ppm"))))
      .toMap
    // c1: h1 seg 131 (recent-but-1d r=1, freq2 f=3, mon20 m=1),
    //     h2 seg 113; c2: 313 -> absent; c3: absent -> 331
    assert(out == Map(
      (131L, 113L) -> ((1L, 333333L)),
      (313L, 0L) -> ((1L, 333333L)),
      (0L, 331L) -> ((1L, 333333L))))
  }

  test("abcXyz: cumulative-share classes cut at 80/95, CV classes " +
      "from cross-multiplied moments over the densified month grid " +
      "(zero months count)") {
    import spark.implicits._
    val li = Seq(
      // p1: steady 10/month, dominant revenue -> A/X
      (1L, 10.0, 100.00, "2020-01-05"),
      (1L, 10.0, 100.00, "2020-02-05"),
      (1L, 10.0, 100.00, "2020-03-05"),
      // p2: 4,8,6 -> CV in (1/4,1/2] -> B/Y
      (2L, 4.0, 20.00, "2020-01-10"),
      (2L, 8.0, 40.00, "2020-02-10"),
      (2L, 6.0, 30.00, "2020-03-10"),
      // p3: one spike month, two zeros -> C/Z
      (3L, 3.0, 30.00, "2020-01-15"))
      .toDF("l_partkey", "l_quantity", "l_extendedprice",
        "l_shipdate")
      .withColumn("l_shipdate", col("l_shipdate").cast("timestamp"))
    val out = Relational.abcXyz(li).collect()
      .map(r => r.getAs[Long]("l_partkey") ->
        ((r.getAs[Long]("rev_cents"), r.getAs[Long]("cum_share_ppm"),
          r.getAs[String]("abc_class"), r.getAs[Long]("n_m"),
          r.getAs[Long]("total_qty"), r.getAs[String]("xyz_class"))))
      .toMap
    assert(out(1L) == ((30000L, 714285L, "A", 3L, 30L, "X")))
    assert(out(2L) == ((9000L, 928571L, "B", 3L, 18L, "Y")))
    assert(out(3L) == ((3000L, 1000000L, "C", 3L, 3L, "Z")))
  }

  test("marginBridge: price/volume/joint effects close the identity " +
      "against the reconstructed revenue delta exactly") {
    import spark.implicits._
    val li = Seq(
      (1L, 10.0, 10.00, "2020-03-01"),
      (1L, 5.0, 10.00, "2021-03-01"),
      (2L, 4.0, 20.00, "2020-06-01"),
      (2L, 3.0, 16.50, "2021-06-01"),
      (2L, 5.0, 27.50, "2021-07-01"))
      .toDF("l_partkey", "l_quantity", "l_extendedprice",
        "l_shipdate")
      .withColumn("l_shipdate", col("l_shipdate").cast("timestamp"))
    val out = Relational.marginBridge(li).collect()
      .map(r => r.getAs[Int]("y") ->
        ((r.getAs[Long]("price_effect_cents"),
          r.getAs[Long]("volume_effect_cents"),
          r.getAs[Long]("joint_effect_cents"),
          r.getAs[Long]("total_delta_cents"),
          r.getAs[Long]("recon_delta_cents")))).toMap
    assert(out(2020) == ((0L, 0L, 0L, 0L, 0L)))
    // p1: (200-100)*10, 100*(5-10), 100*(-5); p2: 50*4, 500*4, 50*4
    assert(out(2021) == ((1200L, 1500L, -300L, 2400L, 2400L)))
  }

  test("priceIndex: Laspeyres reprices the base basket, Paasche " +
      "this year's; base year reads identity; multi-line years " +
      "aggregate before pricing") {
    import spark.implicits._
    // part1: 2020 p=100c q10; 2021 p=200c q5
    // part2: 2020 p=500c q4; 2021 p=550c q8 ACROSS TWO LINES
    val li = Seq(
      (1L, 10.0, 10.00, "2020-03-01"),
      (1L, 5.0, 10.00, "2021-03-01"),
      (2L, 4.0, 20.00, "2020-06-01"),
      (2L, 3.0, 16.50, "2021-06-01"),
      (2L, 5.0, 27.50, "2021-07-01"))
      .toDF("l_partkey", "l_quantity", "l_extendedprice",
        "l_shipdate")
      .withColumn("l_shipdate", col("l_shipdate").cast("timestamp"))
    val out = Relational.priceIndex(li).collect()
      .map(r => r.getAs[Int]("y") ->
        ((r.getAs[Long]("n_parts_common"),
          r.getAs[Long]("laspeyres_ppm"),
          r.getAs[Long]("paasche_ppm")))).toMap
    assert(out(2020) == ((2L, 1000000L, 1000000L)))
    // L = (200*10+550*4)/(100*10+500*4) = 4200/3000
    // P = (200*5+550*8)/(100*5+500*8) = 5400/4500
    assert(out(2021) == ((2L, 1400000L, 1200000L)))
  }

  test("supplierSlaWilson: a 3/3 supplier ranks BELOW a 19/20 one " +
      "(the Wilson shrinkage); raw rates exact ppm") {
    import spark.implicits._
    val orders = Seq((1L, "2021-01-01")).toDF("o_orderkey", "od")
      .select(col("o_orderkey"), col("od").cast("timestamp")
        .as("o_orderdate"))
    // supplier 1: 3 shipments, all within 60 days; supplier 2:
    // 20 shipments, 19 within, one at +100 days
    val li = ((1 to 3).map(i => (1L, 1L, "2021-02-01")) ++
      (1 to 19).map(i => (1L, 2L, "2021-02-15")) ++
      Seq((1L, 2L, "2021-04-11")))
      .toDF("l_orderkey", "l_suppkey", "sd")
      .select(col("l_orderkey"), col("l_suppkey"),
        col("sd").cast("timestamp").as("l_shipdate"))
    val supp = Seq((1L, "tiny"), (2L, "steady"))
      .toDF("s_suppkey", "s_name")
    val out = Relational.supplierSlaWilson(li, orders, supp)
      .collect()
    assert(out.length === 2)
    // the large near-perfect supplier leads despite the lower rate
    assert(out(0).getAs[String]("s_name") === "steady")
    assert(out(0).getAs[Long]("otif_ppm") === 950000L)
    assert(out(1).getAs[String]("s_name") === "tiny")
    assert(out(1).getAs[Long]("otif_ppm") === 1000000L)
    // lb matches the fixed expression tree replayed in plain scala
    def lb(k: Long, n: Long): Long =
      math.floor(1000000.0 * ((k.toDouble + 1.9208 -
        1.96 * math.sqrt(k.toDouble * (n - k).toDouble / n.toDouble
          + 0.9604)) / (n.toDouble + 3.8416))).toLong
    assert(out(0).getAs[Long]("wilson_lb_ppm") === lb(19L, 20L))
    assert(out(1).getAs[Long]("wilson_lb_ppm") === lb(3L, 3L))
    assert(lb(19L, 20L) > lb(3L, 3L))
  }
}
