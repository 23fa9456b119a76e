package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.ops.Affinity

/** Planted-data semantics for the affinity/governance family
  * (ops/Affinity.scala): every metric hand-computed on a corpus small
  * enough to verify by eye, including each operator's documented
  * blind spot.
  */
class AffinitySpec extends SparkSpec {
  import spark.implicits._

  test("basketLift: counts, support, lift hand-computed; lift>1000 iff attraction") {
    // 4 orders: {1,2}, {1,2}, {1,3}, {2}; item cts: 1→3, 2→3, 3→1
    val li = Seq(
      (10L, 1L), (10L, 2L),
      (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 3L),
      (13L, 2L), (13L, 2L) // duplicate line collapses in the basket
    ).toDF("l_orderkey", "l_partkey")
    val out = Affinity.basketLift(li, minPairCount = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(6), r.getLong(7))).toList
    // pair (1,2): ct 2 of 4 orders → support 500000 ppm;
    // lift = 2·4/(3·3) = 8/9 → 888 milli (slight repulsion);
    // pair (1,3): ct 1 → support 250000; lift = 1·4/(3·1) → 1333
    assert(out === List(
      (1L, 2L, 2L, 500000L, 888L),
      (1L, 3L, 1L, 250000L, 1333L)))
  }

  test("markovTransitions: ppm rows sum ≤ 1e6 per src; ties broken by event_id") {
    val ev = Seq(
      // user 7: a→b→b (same ts for the b,b pair — event_id orders them)
      (1L, "2024-01-01 00:00:00", 7L, "a"),
      (2L, "2024-01-01 00:00:01", 7L, "b"),
      (3L, "2024-01-01 00:00:02", 7L, "b"),
      // user 8: a→c
      (4L, "2024-01-01 00:00:00", 8L, "a"),
      (5L, "2024-01-01 00:00:05", 8L, "c")
    ).toDF("event_id", "ts_s", "user_id", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = Affinity.markovTransitions(ev)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(4))).toList
    assert(out === List(
      ("a", "b", 1L, 500000L),
      ("a", "c", 1L, 500000L),
      ("b", "b", 1L, 1000000L)))
  }

  test("kAnonymityRisk: small QI classes flagged, larger ones pass") {
    val rows = (1 to 6).map(i => (i.toLong, 1L, "AUTO", 100.0)) ++
      Seq((7L, 1L, "AUTO", 7000.0), (8L, 2L, "STEEL", -500.0))
    val cust = rows.toDF("c_custkey", "c_nationkey", "c_mktsegment",
      "c_acctbal")
    val out = Affinity.kAnonymityRisk(cust, k = 5L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toList
    // $100 → (10000+1000000) div 500000 = 2; $7000 → cents 700000 → 3;
    // −$500 → cents −50000 → 950000 div 500000 = 1
    assert(out === List(
      (1L, "AUTO", 2L, 6L, false),
      (1L, "AUTO", 3L, 1L, true),
      (2L, "STEEL", 1L, 1L, true)))
  }

  test("lDiversity: distinct-l and recursive (c,l) verdicts on hand " +
      "groups — skewed, homogeneous, and uniform classes") {
    // group 1: sens x×3, y×1, z×1 → l_distinct 3, top 3,
    //   recursive (2,3): r1=3 < 2·(r3)=2·1? no → false
    // group 2: x×2 homogeneous → l_distinct 1, meets_l false,
    //   tail from rank 3 empty → false
    // group 3: x,y,z uniform → top 1 < 2·(r3=1)=2 → true
    val rows = Seq(
      (1L, "x"), (1L, "x"), (1L, "x"), (1L, "y"), (1L, "z"),
      (2L, "x"), (2L, "x"),
      (3L, "x"), (3L, "y"), (3L, "z"))
    val df = rows.toDF("grp", "sens")
    val out = Affinity.lDiversity(df, Seq("grp"), "sens", l = 3, c = 2L)
      .collect().map(r => (r.getAs[Long]("grp"),
        r.getAs[Long]("group_size"), r.getAs[Long]("l_distinct"),
        r.getAs[Long]("top_count"), r.getAs[Long]("top_ppm"),
        r.getAs[Boolean]("meets_l"),
        r.getAs[Boolean]("meets_recursive"))).toList
    assert(out === List(
      (1L, 5L, 3L, 3L, 600000L, true, false),
      (2L, 2L, 1L, 2L, 1000000L, false, false),
      (3L, 3L, 3L, 1L, 333333L, true, true)))
  }

  test("tCloseness: exact truncated-ppm total variation vs the " +
      "global mix; absent values, truncation, boundary, null rows") {
    // global (non-null rows): x=8, y=4, z=3, N=15 →
    // gppm x=533333, y=266666, z=200000, gsum=999999
    val rows = Seq(
      (1L, "x"), (1L, "x"), (1L, "x"), (1L, "y"),
      (2L, "x"), (2L, "y"), (2L, "z"), (2L, "z"),
      (3L, "x"), (3L, "x"), (3L, "y"), (3L, "z"),
      (5L, "x"), (5L, "x"), (5L, "y")) ++
      Seq((4L, null.asInstanceOf[String])) // excluded by contract
    val df = rows.toDF("grp", "sens")
    val out = Affinity.tCloseness(df, Seq("grp"), "sens",
      tPpm = 200000L)
      .collect().map(r => (r.getAs[Long]("grp"),
        r.getAs[Long]("group_size"), r.getAs[Long]("n_values"),
        r.getAs[Long]("tv_ppm"), r.getAs[Boolean]("meets_t"))).toList
    assert(out === List(
      // g1 {x:3,y:1}: d=216667+16666, missing z adds 200000 → 216666
      (1L, 4L, 2L, 216666L, false),
      // g2 {x:1,y:1,z:2}: 283333+16666+300000 → 299999
      (2L, 4L, 3L, 299999L, false),
      // g3 {x:2,y:1,z:1}: 33333+16666+50000 → 49999
      (3L, 4L, 3L, 49999L, true),
      // g5 {x:2,y:1}, n=3: truncation (666666, 333333) →
      // 133333+66667+200000 = exactly t — boundary meets
      (5L, 3L, 2L, 200000L, true)))
  }

  test("fuzzyNameMatch: near-identical names found via shared rarest token; pairs not sharing it are the documented miss") {
    val parts = Seq(
      (1L, "azure coral mint"),
      (2L, "azure coral mints"),   // dist 1 to part 1, same rarest token
      (3L, "plum coral mint"),     // near part 1 but rarest token differs
      (4L, "azure navy teal"),     // shares 'azure' with 1 but far
      (5L, "plum navy snow")
    ).toDF("p_partkey", "p_name")
    // dfs: azure 3, coral 3, mint 2, mints 1, plum 2, navy 2, teal 1,
    // snow 1 → signatures: 1→mint, 2→mints, 3→mint, 4→teal, 5→snow
    val out = Affinity.fuzzyNameMatch(parts, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getInt(3))).toList
    // (1,3) share signature 'mint', dist("azure coral mint",
    // "plum coral mint") = 4 > 2 → rejected by verify; (1,2) have
    // different signatures (mint vs mints) → blocking miss, the
    // documented recall cost of not going quadratic
    assert(out === Nil)
    val loose = Affinity.fuzzyNameMatch(parts, maxDist = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
      .toList
    assert(loose === List((1L, 3L, 4)))
    // skew guard: three identical names form one size-3 block; with
    // maxBlock = 2 the whole block drops — explicit recall loss, no
    // quadratic candidate set
    val trio = Seq((7L, "zz yy"), (8L, "zz yy"), (9L, "zz yy"))
      .toDF("p_partkey", "p_name")
    assert(Affinity.fuzzyNameMatch(trio, maxDist = 2).collect()
      .length == 3)
    assert(Affinity.fuzzyNameMatch(trio, maxDist = 2, maxBlock = 2L)
      .collect().isEmpty)
  }

  test("skewAdvisor: hot key ranked first; median, skew ratio, salt hand-checked") {
    // key 1: 8 rows; keys 2..5: 2 rows each → n_keys 5, total 16,
    // max 8, counts sorted (2,2,2,2,8) → median 2
    val df = (Seq.fill(8)(1L) ++ (2L to 5L).flatMap(k => Seq(k, k)))
      .toDF("k")
    val out = Affinity.skewAdvisor(df, col("k"), topK = 2).collect()
    val top = out.map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(top.toList === List((1, 1L, 8L), (2, 2L, 2L)))
    val r0 = out.head
    assert(r0.getLong(3) == 5L && r0.getLong(4) == 16L) // n_keys, total
    assert(r0.getLong(6) == 2L)                         // med_ct
    // avg = 16·1000 div 5 = 3200; skew = 8·1000·5 div 16 = 2500;
    // salt = ceil(8/2) = 4
    assert(r0.getLong(7) == 3200L && r0.getLong(8) == 2500L &&
      r0.getLong(9) == 4L)
  }

  test("eventPmi: types co-occurring beyond chance score positive, avoiding types negative") {
    // 4 user-days: {a,b} together twice, c alone twice → (a,b)
    // attract (pmi = ln(2·4/(2·2)) = ln 2 > 0); (a,c) never co-occur
    // (no row); planted (b,c) once over inflated singles goes negative
    val ev = Seq(
      (1L, "2024-01-01 01:00:00", 1L, "a"),
      (2L, "2024-01-01 02:00:00", 1L, "b"),
      (3L, "2024-01-02 01:00:00", 2L, "a"),
      (4L, "2024-01-02 02:00:00", 2L, "b"),
      (5L, "2024-01-03 01:00:00", 3L, "c"),
      (6L, "2024-01-04 01:00:00", 4L, "c"),
      (7L, "2024-01-03 02:00:00", 3L, "b")
    ).toDF("event_id", "ts_s", "user_id", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = Affinity.eventPmi(ev).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(6))).toList
    // units: (1,d1),(2,d2),(3,d3),(4,d4) → N=4; n_a=2, n_b=3, n_c=2
    // (a,b): ln(2·4/(2·3)) = ln(4/3) > 0; (b,c): ln(1·4/(3·2)) < 0
    val ab = out.find(t => t._1 == "a" && t._2 == "b").get
    val bc = out.find(t => t._1 == "b" && t._2 == "c").get
    assert(ab._3 == 2L && ab._4 > 0, s"ab=$ab")
    assert(bc._3 == 1L && bc._4 < 0, s"bc=$bc")
    assert(!out.exists(t => t._1 == "a" && t._2 == "c"))
  }

  test("eventPaths: total-order paths, maxLen truncation, shares exact") {
    val ev = Seq(
      // user 1 day 1: v > c > p (same-ts tie broken by event_id)
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (2L, "2024-01-01 10:00:00", 1L, "click"),
      (3L, "2024-01-01 11:00:00", 1L, "purchase"),
      // user 2 day 1: v > c — no purchase
      (4L, "2024-01-01 09:00:00", 2L, "view"),
      (5L, "2024-01-01 09:30:00", 2L, "click"),
      // user 1 day 2: 7 views → truncated to 5
      (6L, "2024-01-02 01:00:00", 1L, "view"),
      (7L, "2024-01-02 02:00:00", 1L, "view"),
      (8L, "2024-01-02 03:00:00", 1L, "view"),
      (9L, "2024-01-02 04:00:00", 1L, "view"),
      (10L, "2024-01-02 05:00:00", 1L, "view"),
      (11L, "2024-01-02 06:00:00", 1L, "view"),
      (12L, "2024-01-02 07:00:00", 1L, "view")
    ).toDF("event_id", "ts_s", "user_id", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = Affinity.eventPaths(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3),
        r.getBoolean(4))).toList
    assert(out.toSet === Set(
      ("view>click>purchase", 1L, 333333L, true),
      ("view>click", 1L, 333333L, false),
      ("view>view>view>view>view", 1L, 333333L, false)))
  }

  test("abConversionLift: exact arm counts/rates, z sign follows the lift") {
    // arm A (even users): 1 of 2 converts; arm B (odd): 2 of 2
    val ev = Seq(
      (1L, 2L, "purchase"), (2L, 2L, "view"),   // user 2: converts
      (3L, 4L, "view"),                          // user 4: no
      (4L, 1L, "purchase"), (5L, 3L, "purchase")
    ).map { case (e, u, t) =>
      (e, u, t, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")) }
      .toDF("event_id", "user_id", "event_type", "ts")
    val r = Affinity.abConversionLift(ev,
      col("user_id") % 2 === 1, "purchase").head
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("conv_a") == 1L)
    assert(r.getAs[Long]("n_b") == 2L && r.getAs[Long]("conv_b") == 2L)
    assert(r.getAs[Long]("rate_a_ppm") == 500000L)
    assert(r.getAs[Long]("rate_b_ppm") == 1000000L)
    assert(r.getAs[Long]("diff_ppm") == 500000L)
    assert(r.getAs[Long]("z_milli") > 0)
  }

  test("abSequential: cumulative interim z vs OBF boundaries " +
      "matches a double replay; early empty-conversion guard holds") {
    def tss(s: String) = java.sql.Timestamp.valueOf(s)
    // days 0..3; u1/u3 odd → B, u2/u4 even → A. Interim 1 covers
    // days 0–1 (u1 conv, u3 no-conv, u4 present via signup);
    // interim 2 adds u2 (conv) and u4's purchase.
    val ev = Seq(
      (1L, 1L, "purchase", tss("2024-01-01 10:00:00")),
      (2L, 3L, "signup", tss("2024-01-01 11:00:00")),
      (3L, 4L, "signup", tss("2024-01-02 10:00:00")),
      (4L, 2L, "purchase", tss("2024-01-03 10:00:00")),
      (5L, 4L, "purchase", tss("2024-01-04 10:00:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = Affinity.abSequential(ev, col("user_id") % 2 === 1,
      "purchase", minCount = 1L, checks = 2).collect()
      .map(r => r.getAs[Int]("chk") ->
        ((r.getAs[Long]("n_a"), r.getAs[Long]("conv_a"),
          r.getAs[Long]("n_b"), r.getAs[Long]("conv_b"),
          r.getAs[Long]("z_milli"), r.getAs[Long]("boundary_milli"),
          r.getAs[Long]("crossed")))).toMap
    def z(na: Long, ca: Long, nb: Long, cb: Long): Long = {
      val p = (ca + cb).toDouble / (na + nb).toDouble
      math.floor((cb.toDouble / nb - ca.toDouble / na)
        / math.sqrt(p * (1.0 - p) * (1.0 / na + 1.0 / nb))
        * 1000.0).toLong
    }
    val b = graft.ops.Affinity.obfBoundsMilli(2)
    assert(out(1) == ((1L, 0L, 2L, 1L, z(1, 0, 2, 1), b.head, 0L)))
    assert(out(2) == ((2L, 2L, 2L, 1L, z(2, 2, 2, 1), b(1), 0L)))
  }

  test("giniConcentration: uniform near 0, concentrated high, hand value exact") {
    // uniform: 4 keys × 2 rows → G = 0
    val uni = (1L to 4L).flatMap(k => Seq(k, k)).toDF("k")
    val g0 = graft.ops.Affinity.giniConcentration(uni, col("k"))
      .head
    assert(g0.getAs[Long]("n_keys") == 4L &&
      g0.getAs[Long]("gini_ppm") == 0L)
    // counts (1,1,6): sorted Σi·x = 1+2+18 = 21, T = 8, n = 3 →
    // G = (42 − 4·8)/(3·8) = 10/24 → 416666 ppm floored
    val skewed = (Seq(1L, 2L) ++ Seq.fill(6)(3L)).toDF("k")
    val g1 = graft.ops.Affinity.giniConcentration(skewed, col("k"))
      .head
    assert(g1.getAs[Long]("sum_ix") == 21L)
    assert(g1.getAs[Long]("gini_ppm") == 416666L)
  }

  test("modularityAssigned: perfect split scores high Q, mixed split near zero") {
    // 6 vertices, two triangles {1,2,3} and {4,5,6}: m = 6
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L))
      .toDF("vec_id", "nbr_id")
    def comm(f: Long => Long) =
      (1L to 6L).map(v => (v, f(v))).toDF("vec_id", "community")
    def q(assignment: org.apache.spark.sql.DataFrame): Double =
      ops.Vector.modularityAssigned(assignment, k = 3,
          precomputedKnn = Some(edges))
        .agg(sum(col("term_q20"))).head.getLong(0) / 1048576.0
    // perfect communities: Q = Σ [3/6 − (6/12)²] = 2·(0.5 − 0.25) = 0.5
    val good = q(comm(v => if (v <= 3) 0L else 1L))
    assert(math.abs(good - 0.5) < 0.001, s"good=$good")
    // alternating assignment cuts both triangles: e_c: c0={1,3,5}
    // keeps (1,3) only, c1={2,4,6} keeps (4,6) → Q = 2/6 − 0.5 ≈ −0.17
    val bad = q(comm(v => v % 2))
    assert(bad < -0.1 && bad < good, s"bad=$bad")
  }

  test("frequentTriples: Apriori prune, canonical order, exact lift") {
    // baskets 1-3 all hold {a,b,c}; d appears once (below support 2)
    // and basket 1 repeats item a (must collapse before counting)
    val baskets = Seq(
      (1L, "a"), (1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "a"), (2L, "b"), (2L, "c"),
      (3L, "a"), (3L, "b"), (3L, "c"), (3L, "d"))
      .toDF("basket_id", "item")
    val out = graft.ops.Affinity
      .frequentTriples(baskets, minItemCt = 2, minTripleCt = 2)
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getAs[String]("item_a"), r.getAs[String]("item_b"),
      r.getAs[String]("item_c")) === (("a", "b", "c")))
    assert(r.getAs[Long]("triple_ct") === 3L)
    // N=3 baskets, all counts 3: support 1e6, lift exactly 1.000
    assert(r.getAs[Long]("support_ppm") === 1000000L)
    assert(r.getAs[Long]("lift_milli") === 1000L)
  }

  test("categoricalMutualInfo: independence gives ~0, perfect " +
      "coupling gives ln|A|, q20 matches a double reference") {
    // independent 2x2 (every cell once): MI exactly 0 up to floor
    val indep = Seq(("x", 1), ("x", 2), ("y", 1), ("y", 2))
      .toDF("u", "v")
    val i = graft.ops.Affinity.categoricalMutualInfo(indep, "u", "v")
      .collect()
    assert(math.abs(i.head.getAs[Long]("mi_q20")) <= 4L)
    // perfect coupling over 2 symbols: MI = ln 2
    val coupled = Seq(("x", 1), ("x", 1), ("y", 2), ("y", 2))
      .toDF("u", "v")
    val c = graft.ops.Affinity
      .categoricalMutualInfo(coupled, "u", "v").collect()
    val ln2q20 = math.floor(math.log(2.0) * (1 << 20)).toLong
    assert(math.abs(c.head.getAs[Long]("mi_q20") - ln2q20) <= 4L)
    // skewed hand case vs a double reference
    val df = Seq(("x", 1), ("x", 1), ("x", 2), ("y", 2), ("y", 2))
      .toDF("u", "v")
    val rows = graft.ops.Affinity
      .categoricalMutualInfo(df, "u", "v").collect()
    val ref = {
      // (n_a, n_b) per cell (x,1), (x,2), (y,2) with n_ab 2,1,2; N=5
      val cells = Seq((3.0, 2.0), (3.0, 3.0), (2.0, 3.0))
      val ns = Seq(2.0, 1.0, 2.0)
      ns.zip(cells).map { case (nab, (na, nb)) =>
        nab / 5.0 * math.log(nab * 5.0 / (na * nb))
      }.sum
    }
    val got = rows.head.getAs[Long]("mi_q20").toDouble / (1 << 20)
    assert(math.abs(got - ref) < 1e-3, s"got $got want $ref")
  }

  test("theilDecomposition: equal-value group scores ~0, single " +
      "group has zero between term, q20 total tracks the real Theil") {
    val docs = Seq(
      ("A", 5L), ("A", 5L), ("A", 5L), ("A", 5L),   // equal: T_A = 0
      ("B", 1L), ("B", 7L), ("B", 2L), ("B", 14L))  // unequal
      .toDF("src", "x")
    val rows = graft.ops.Affinity
      .theilDecomposition(docs, "src", "x").collect()
    val byG = rows.map(r => r.getAs[String]("grp") -> r).toMap
    assert(math.abs(byG("A").getAs[Long]("t_g_q20")) <= 4L)
    assert(byG("B").getAs[Long]("t_g_q20") > 100000L) // clearly > 0
    // identity vs a double-precision reference of the DIRECT Theil
    val xs = Seq(5.0, 5.0, 5.0, 5.0, 1.0, 7.0, 2.0, 14.0)
    val mu = xs.sum / xs.length
    val tRef = xs.map(x => x / xs.sum * math.log(x / mu)).sum
    val tGot = byG("A").getAs[Long]("t_total_q20").toDouble /
      (1L << 20)
    assert(math.abs(tGot - tRef) < 1e-3, s"got $tGot want $tRef")
    // within + between = total by construction; both components
    // carry real mass here
    assert(byG("A").getAs[Long]("t_between_q20") > 0L)
    assert(byG("A").getAs[Long]("t_within_q20") > 0L)
    // single-group corpus: between term exactly 0 (the four lnq20
    // terms cancel symbolically)
    val solo = Seq(("S", 3L), ("S", 9L)).toDF("src", "x")
    val sRow = graft.ops.Affinity
      .theilDecomposition(solo, "src", "x").collect().head
    assert(sRow.getAs[Long]("between_q20") === 0L)
    assert(sRow.getAs[Long]("t_between_q20") === 0L)
    assert(sRow.getAs[Long]("t_total_q20") ===
      sRow.getAs[Long]("t_within_q20"))
  }

  test("cramersV: perfect association scores 1000 milli, " +
      "independence scores 0, absent cells complete") {
    // perfect 2x2: x always pairs with 1, y always with 2
    val perfect = Seq(("x", 1), ("x", 1), ("y", 2), ("y", 2))
      .toDF("u", "v")
    val pRows = graft.ops.Affinity.cramersV(perfect, "u", "v")
      .collect()
    assert(pRows.length === 4)           // 2x2 completed domain
    assert(pRows.map(_.getAs[Long]("v_milli")).distinct.toSeq ===
      Seq(1000L))
    val zero = pRows.filter(r => r.getAs[Long]("o") === 0L)
    assert(zero.length === 2)            // (x,2) and (y,1) completed
    assert(zero.forall(_.getAs[Long]("term_ppm") === 250000L))
    // independent 2x2: every cell equally likely
    val indep = Seq(("x", 1), ("x", 2), ("y", 1), ("y", 2))
      .toDF("u", "v")
    val iRows = graft.ops.Affinity.cramersV(indep, "u", "v")
      .collect()
    assert(iRows.map(_.getAs[Long]("chi2_n_ppm")).distinct.toSeq ===
      Seq(0L))
    assert(iRows.map(_.getAs[Long]("v_milli")).distinct.toSeq ===
      Seq(0L))
  }

  test("cramersV: exact ppm arithmetic on a hand 2x2 with skewed " +
      "margins and null rows excluded") {
    // o: (x,1)=3 (x,2)=1 (y,1)=1 (y,2)=3, N=8; r_x=4, c_1=4
    val df = Seq(
      Some("x") -> Some(1), Some("x") -> Some(1),
      Some("x") -> Some(1), Some("x") -> Some(2),
      Some("y") -> Some(1), Some("y") -> Some(2),
      Some("y") -> Some(2), Some("y") -> Some(2),
      None -> Some(1), Some("x") -> None)
      .map { case (a, b) => (a, b) }.toDF("u", "v")
    val rows = graft.ops.Affinity.cramersV(df, "u", "v").collect()
    val cell = rows.map(r => (r.getAs[String]("a"),
      r.getAs[Int]("b")) -> r).toMap
    val x1 = cell(("x", 1))
    assert(x1.getAs[Long]("n") === 8L)
    assert(x1.getAs[Long]("obs_ppm") === 375000L)   // 3/8
    assert(x1.getAs[Long]("exp_ppm") === 250000L)   // 4*4/64
    // (125000^2) div 250000 = 62500, identical in all 4 cells
    assert(rows.map(_.getAs[Long]("term_ppm")).distinct.toSeq ===
      Seq(62500L))
    assert(x1.getAs[Long]("chi2_n_ppm") === 250000L)
    // V = sqrt(0.25 / 1) = 0.5
    assert(x1.getAs[Long]("v_milli") === 500L)
  }

  test("frequentTriples: infrequent item never enters a triple even " +
      "when the triple itself would pass support") {
    // {x,y,z} co-occur twice but z's total count is 2 < minItemCt 3
    val baskets = Seq(
      (1L, "x"), (1L, "y"), (1L, "z"),
      (2L, "x"), (2L, "y"), (2L, "z"),
      (3L, "x"), (3L, "y"))
      .toDF("basket_id", "item")
    val out = graft.ops.Affinity
      .frequentTriples(baskets, minItemCt = 3, minTripleCt = 2)
    assert(out.count() === 0L)
  }

  test("hourlyLoadProfile: exact shares and peak-to-mean per type") {
    import java.sql.Timestamp
    def ts(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:30:00")
    // spiky: 3 events at hour 2, 1 at hour 5; flat: 2 at each of
    // hours 0 and 1
    val ev = (Seq.fill(3)(("spiky", ts(2))) :+ ("spiky", ts(5))) ++
      Seq(("flat", ts(0)), ("flat", ts(0)),
        ("flat", ts(1)), ("flat", ts(1)))
    val m = Affinity.hourlyLoadProfile(
      ev.toDF("event_type", "ts"))
      .collect().map(r => (r.getAs[String]("event_type"),
        r.getAs[Long]("hr")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("share_ppm"),
          r.getAs[Long]("peak_to_mean_milli"))).toMap
    assert(m(("spiky", 2L)) == ((3L, 750000L, 1500L)))
    assert(m(("spiky", 5L)) == ((1L, 250000L, 1500L)))
    // flat: peak 2 · 2 hours / 4 events = exactly 1000 milli
    assert(m(("flat", 0L)) == ((2L, 500000L, 1000L)))
  }

  test("userHourEntropy: two even hours read ln2 in q20 floors; " +
      "single-hour user reads zero") {
    import java.sql.Timestamp
    def ts(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:15:00")
    val ev = Seq(
      (1L, ts(9)), (1L, ts(9)), (1L, ts(21)), (1L, ts(21)),
      (2L, ts(3)), (2L, ts(3)), (2L, ts(3))
    ).toDF("user_id", "ts")
    val m = Affinity.userHourEntropy(ev).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_hours"),
          r.getAs[Long]("entropy_q20"))).toMap
    def lnq20(v: Long) =
      math.floor(math.log(v.toDouble) * (1L << 20)).toLong
    // H·N = Σ c·(⌊ln4⌋−⌊ln2⌋) = 4·(⌊ln4⌋−⌊ln2⌋); ÷4 back
    assert(m(1L) == ((4L, 2L, lnq20(4L) - lnq20(2L))))
    assert(m(2L) == ((3L, 1L, 0L)))
  }

  test("sampleRatioMismatch: exact chi-square and the 3841 line") {
    import java.sql.Timestamp
    val t = Timestamp.valueOf("2024-01-01 00:00:00")
    // 10 even users vs 2 odd: chi2 = (10-2)²/12 = 5333 milli
    val ev = ((2L to 20L by 2L) ++ Seq(1L, 3L))
      .map(u => (u, t)).toDF("user_id", "ts")
    val r = Affinity.sampleRatioMismatch(ev,
      col("user_id") % 2 === 1).collect().head
    assert(r.getAs[Long]("n_a") === 10L)
    assert(r.getAs[Long]("n_b") === 2L)
    assert(r.getAs[Long]("srm_chi2_milli") === 5333L)
    assert(r.getAs[Boolean]("srm_suspect"))
    // a perfect split never trips the line
    val fair = (1L to 20L).map(u => (u, t)).toDF("user_id", "ts")
    val r2 = Affinity.sampleRatioMismatch(fair,
      col("user_id") % 2 === 1).collect().head
    assert(r2.getAs[Long]("srm_chi2_milli") === 0L)
    assert(!r2.getAs[Boolean]("srm_suspect"))
  }

  test("entityResolution: blocked fuzzy pairs resolve to entities; " +
      "size profile mass closes over the catalog") {
    // blocking keys on the RAREST token, so near-dups must share
    // their rarest token to block together: 'rare' (df 2) blocks
    // parts 1-2 (edit distance 1); parts 3-4 block on their own
    // argmin token and verify at distance 0 (identical names)
    val part = Seq(
      (1L, "rare com1 com2"), (2L, "rare com1 com3"),
      (3L, "com1 com2 com3"), (4L, "com1 com2 com3")
    ).toDF("p_partkey", "p_name")
    val m = Affinity.entityResolution(part).collect()
      .map(r => r.getAs[Long]("size") ->
        (r.getAs[Long]("n_clusters"), r.getAs[Long]("n_members"),
          r.getAs[Long]("members_ppm"))).toMap
    assert(m(2L) == ((2L, 4L, 1000000L)))
    assert(!m.contains(1L))
    graft.Caches.release("part")
  }

  test("entityResolution: the block-confined union-find path emits " +
      "the SAME profile as the iterative dupClusters fixpoint " +
      "(differential pin for the r18 routing)") {
    // chains within blocks exercise transitivity (1-2, 2-5 at
    // distance 1 => one 3-entity cluster), plus a pair and two
    // singletons across other blocks
    val part = Seq(
      (1L, "rare com1 com2"), (2L, "rare com1 com3"),
      (5L, "rare com9 com3"),
      (3L, "com1 com2 com3"), (4L, "com1 com2 com3"),
      (6L, "lonely tok1 tok2"), (7L, "other tok3 tok4")
    ).toDF("p_partkey", "p_name")
    val routed = Affinity.entityResolution(part, maxDist = 2)
      .collect().map(_.toSeq).toSet
    graft.Caches.release("part")
    // strip block_token to force the general iterative path
    val pairsNoBlock = Affinity.fuzzyNameMatch(part, maxDist = 2)
      .drop("block_token")
      .withColumn("block_less", lit(1)) // schema w/o block_token
      .select(col("part_a"), col("part_b"), col("dist"))
    val iterative = Affinity.entityResolution(part, maxDist = 2,
      precomputedPairs = Some(pairsNoBlock))
      .collect().map(_.toSeq).toSet
    graft.Caches.release("part")
    assert(routed === iterative)
  }

  test("fellegiSunterWeights: m from the blocked pairs, u as exact " +
      "collision ppm, discriminating field outweighs noise field") {
    import spark.implicits._
    // parts 1-2 block on 'red' (the rarest shared token) at edit
    // distance 0 -> the single candidate pair; 3 and 4 block alone
    val part = Seq(
      (1L, "red bolt", "B1", "T1", 10, 150.0),
      (2L, "red bolt", "B1", "T2", 10, 250.0),
      (3L, "blue bolt", "B2", "T3", 20, 350.0),
      (4L, "green gear", "B3", "T4", 30, 450.0)
    ).toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
      "p_retailprice")
    val out = Affinity.fellegiSunterWeights(part).collect()
      .map(r => r.getAs[String]("field") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("m_agree"),
          r.getAs[Long]("m_ppm"), r.getAs[Long]("u_ppm"),
          r.getAs[Long]("weight_milli"))).toMap
    // brand: pair agrees (m=1e6 ppm); values B1,B1,B2,B3 collide
    // 2/12 random-pair slots -> u=166666; weight 6000 (>1000: signal)
    assert(out("brand") == ((1L, 1L, 1000000L, 166666L, 6000L)))
    // size ties brand exactly (10,10,20,30)
    assert(out("size") == ((1L, 1L, 1000000L, 166666L, 6000L)))
    // type: pair disagrees, all values distinct -> zero everywhere
    assert(out("type") == ((1L, 0L, 0L, 0L, 0L)))
    // price bands 1,2,3,4 all distinct; pair lands in different
    // hundred-dollar bands -> no agreement, no collision
    assert(out("price_band") == ((1L, 0L, 0L, 0L, 0L)))
  }

  test("abQuantileLift: exact-rank PERCENTILE_DISC per arm on the " +
      "milli domain, integer ceil, per-percentile diff") {
    import spark.implicits._
    // control (even users): values 1..4; treatment (odd): 11..14
    val rows =
      (1 to 4).map(v => (2L, s"purchase", v.toDouble, v.toLong)) ++
        (1 to 4).map(v => (3L, s"purchase", v + 10.0, 100L + v)) :+
        ((2L, "view", 99.0, 999L))
    val ev = rows.toDF("user_id", "event_type", "value", "event_id")
    val out = Affinity.abQuantileLift(ev, col("user_id") % 2 === 1)
      .collect()
      .map(r => r.getAs[Int]("pct") ->
        (r.getAs[Long]("ctrl_milli"), r.getAs[Long]("treat_milli"),
          r.getAs[Long]("diff_milli"))).toMap
    // n=4: p25 -> row ceil(4*25/100)=1, p50 -> 2, p75 -> 3, p90 ->
    // row ceil(3.6)=4; the stray 'view' row never enters
    assert(out(25) == ((1000L, 11000L, 10000L)))
    assert(out(50) == ((2000L, 12000L, 10000L)))
    assert(out(75) == ((3000L, 13000L, 10000L)))
    assert(out(90) == ((4000L, 14000L, 10000L)))
  }

  test("windowedFunnel: greedy earliest-match scan, gap constraint " +
      "vs the PREVIOUS MATCHED step, out-of-order prefix ignored") {
    import spark.implicits._
    val rows = Seq(
      // u1 full conversion inside the hour gaps
      (1L, 1L, "view", "2024-01-01 00:00:00"),
      (1L, 2L, "click", "2024-01-01 00:10:00"),
      (1L, 3L, "purchase", "2024-01-01 00:30:00"),
      // u2: click 2h after view -> gap broken at step 2
      (2L, 4L, "view", "2024-01-01 00:00:00"),
      (2L, 5L, "click", "2024-01-01 02:00:00"),
      (2L, 6L, "purchase", "2024-01-01 02:01:00"),
      // u3: click BEFORE any view is ignored; purchase can't match
      // step 2 (expects click) -> stuck at step 1
      (3L, 7L, "click", "2024-01-01 00:00:00"),
      (3L, 8L, "view", "2024-01-01 00:05:00"),
      (3L, 9L, "purchase", "2024-01-01 00:10:00"),
      // u4: purchase 2h after click -> reaches step 2 only
      (4L, 10L, "view", "2024-01-01 00:00:00"),
      (4L, 11L, "click", "2024-01-01 00:30:00"),
      (4L, 12L, "purchase", "2024-01-01 02:40:00"))
      .toDF("user_id", "event_id", "event_type", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
    val m = Affinity.windowedFunnel(rows,
      Seq("view", "click", "purchase"), maxGapMs = 3600000L)
      .collect().map(r => r.getAs[Long]("step") ->
        (r.getAs[String]("step_name"), r.getAs[Long]("n_users"),
          r.getAs[Long]("conv_vs_first_ppm"),
          Option(r.getAs[Any]("conv_vs_prev_ppm")))).toMap
    assert(m(1L) == (("view", 4L, 1000000L, None)))
    assert(m(2L) == (("click", 2L, 500000L, Some(500000L))))
    assert(m(3L) == (("purchase", 1L, 250000L, Some(500000L))))
  }

  test("cupedLift: a perfectly-correlated covariate removes the " +
      "whole arm difference (theta = 1, rho^2 = 1, adjusted " +
      "means equalize)") {
    import spark.implicits._
    // user u: u purchases in the first half, u in the second ->
    // x = y = u. B = odd users {1,3}, A = even {2,4}.
    val rows = (1 to 4).flatMap { u =>
      Seq.fill(u)((u.toLong, "purchase", "2024-01-01")) ++
        Seq.fill(u)((u.toLong, "purchase", "2024-01-04"))
    }
    val df = rows.toDF("user_id", "event_type", "ts")
    val r = Affinity.cupedLift(df, col("user_id") % 2 === 1)
      .collect().head
    assert(r.getAs[Long]("n_users") === 4L)
    assert(r.getAs[Long]("theta_micro") === 1000000L)
    assert(r.getAs[Long]("varred_ppm") === 1000000L)
    assert(r.getAs[Long]("mean_a_milli") === 3000L)
    assert(r.getAs[Long]("mean_b_milli") === 2000L)
    assert(r.getAs[Long]("adj_a_milli") === 2500L)
    assert(r.getAs[Long]("adj_b_milli") === 2500L)
    assert(r.getAs[Long]("adj_diff_milli") === 0L)
  }

  test("powerMde: pooled rate, MDE at current n, and required n " +
      "match the pinned-constant integer formula exactly") {
    import spark.implicits._
    // A (even ids): 2 of 5 convert; B (odd): 3 of 5
    val rows = (1 to 10).map { u =>
      val conv = (u % 2 == 0 && u <= 4) || (u % 2 == 1 && u <= 5)
      (u.toLong, if (conv) "purchase" else "view")
    }
    val df = rows.map { case (u, t) => (u, t, "2024-01-01") }
      .toDF("user_id", "event_type", "ts")
    val r = Affinity.powerMde(df, col("user_id") % 2 === 1,
      "purchase", minCount = 1L).collect().head
    assert((r.getAs[Long]("n_a"), r.getAs[Long]("conv_a")) ===
      ((5L, 2L)))
    assert((r.getAs[Long]("n_b"), r.getAs[Long]("conv_b")) ===
      ((5L, 3L)))
    assert(r.getAs[Long]("p_pool_ppm") === 500000L)
    // replicate the integer formula with BigInt
    val z = BigInt(2937341)
    val num = z * z * 2 * 500000 * (1000000 - 500000)
    val q40 = BigInt(1) << 40
    val mde = math.floor(math.sqrt((num / (BigInt(5) * q40)).toDouble))
      .toLong
    assert(r.getAs[Long]("mde_abs_ppm") === mde)
    val den = BigInt(50000) * 50000 * q40
    val nReq = ((num + den - 1) / den).toLong
    assert(r.getAs[Long]("n_req_10pct_rel") === nReq)
  }

  test("markovEntropyRate: deterministic journeys score zero " +
      "conditional entropy, a 50/50 split scores q20 ln 2, the " +
      "__all__ row is the transition-weighted rate") {
    import spark.implicits._
    def ev(u: Long, i: Int, t: String) =
      (u * 100 + i, java.sql.Timestamp.valueOf(
        f"2024-03-01 10:${i}%02d:00"), u, t, 1.0, "{}")
    // user 1: a b a b  (a->b x2, b->a x1); user 2: a a a (a->a x2)
    val rows = Seq(
      ev(1L, 0, "a"), ev(1L, 1, "b"), ev(1L, 2, "a"), ev(1L, 3, "b"),
      ev(2L, 0, "a"), ev(2L, 1, "a"), ev(2L, 2, "a"))
      .toDF("event_id", "ts", "user_id", "event_type", "value",
        "props")
    val out = graft.ops.Affinity.markovEntropyRate(rows).collect()
      .map(r => r.getAs[String]("src") ->
        ((r.getAs[Long]("n_dst"), r.getAs[Long]("src_total"),
          r.getAs[Long]("h_cond_q20"),
          r.getAs[Long]("weight_ppm")))).toMap
    def lnq20(x: Long) =
      math.floor(math.log(x.toDouble) * (1L << 20)).toLong
    // src a: {b: 2, a: 2} of 4 -> (4 ln4 - 4 ln2) / 4 in q20
    val hA = (4 * lnq20(4) - 4 * lnq20(2)) / 4
    assert(out("a") === ((2L, 4L, hA, 800000L)))
    // src b: single destination -> zero conditional entropy
    assert(out("b") === ((1L, 1L, 0L, 200000L)))
    assert(out("__all__") === ((3L, 5L, (4 * hA) / 5, 1000000L)))
    // ln 2 in q20 is ~726817: the 50/50 split reads as expected
    assert(hA === lnq20(2) || hA === lnq20(2) + 1 || hA === 726817L)
  }
}
