package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Registry half of the affinity/governance family (see [[Affinity]]):
  * named queries + DuckDB oracle SQL, same bitwise-stability rules as
  * RelationalQueries (exact integer metrics, total ORDER BY, aliases
  * identical on both sides, int-width-sensitive scalars cast to the
  * Spark width in the SQL).
  */
object AffinityQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Session-shared blocked+verified fuzzy pair set over the part
    * catalog (the `jac_pairs` precedent): q_part_entity_resolution
    * and q_part_fs_weights consume the identical candidate pairs, so
    * the blocking + Levenshtein verification runs once per session.
    */
  private def fuzzyPairsDf(s: SparkSession, d: String): DataFrame =
    graft.Caches.persisted("part", ("fuzzy", s, d))(
      Affinity.fuzzyNameMatch(Tables.part(s, d), maxDist = 2))

  val queries: Map[String, Q] = Map(
    // market-basket pair association: exact integer support (ppm of
    // orders) + lift (milli) over co-ordered part pairs
    "q_basket_lift" -> ((s, d) =>
      Affinity.basketLift(Tables.lineitem(s, d), minPairCount = 2L)),
    // Apriori 3-itemsets over (order, part-brand) baskets — brands
    // make a 25-value item domain whose triples have healthy support
    // at every validation SF (thresholds low enough that sf0.001
    // still emits rows, high enough that the prune is exercised)
    "q_basket_triples" -> ((s, d) =>
      Affinity.frequentTriples(
        Tables.lineitem(s, d)
          .join(Tables.part(s, d),
            col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey").as("basket_id"),
            col("p_brand").as("item")),
        minItemCt = 20L, minTripleCt = 5L)),
    // Cramér's V association between returnflag and linestatus — the
    // dimension-redundancy audit on the 3x2 contingency rollup (both
    // TPC-H flags derive from date arithmetic, so the association is
    // real and strong); the
    // chi2_n_ppm skeleton is exact ppm-quantized integer arithmetic,
    // v_milli rides IEEE-correctly-rounded sqrt
    "q_li_cramers_v" -> ((s, d) =>
      Affinity.cramersV(Tables.lineitem(s, d),
        "l_returnflag", "l_linestatus")
        .orderBy(col("a"), col("b"))),
    // first-order Markov next-event matrix with exact ppm
    // row-conditional probabilities
    "q_events_markov" -> ((s, d) =>
      Affinity.markovTransitions(Tables.events(s, d))),
    // first-order entropy RATE of the journey chain: per-src
    // conditional entropy in q20 nats + the transition-weighted
    // __all__ row (is journey modeling worth anything)
    "q_events_entropy_rate" -> ((s, d) =>
      Affinity.markovEntropyRate(Tables.events(s, d))),
    // k-anonymity audit over (nation, segment, $5000 balance bucket)
    "q_kanon_risk" -> ((s, d) =>
      Affinity.kAnonymityRisk(Tables.customer(s, d), k = 5L)),
    // l-diversity audit: market segment as the sensitive attribute
    // within (nation, $5000 balance bucket) equivalence classes —
    // distinct-l at l=3 plus recursive (2,3)-diversity
    "q_kanon_ldiversity" -> ((s, d) =>
      Affinity.lDiversity(
        Tables.customer(s, d).select(col("c_nationkey"),
          expr("(cast(round(c_acctbal * 100) as bigint) + 1000000) " +
            "div 500000").as("acct_bucket"),
          col("c_mktsegment")),
        Seq("c_nationkey", "acct_bucket"), "c_mktsegment",
        l = 3, c = 2L)),
    // t-closeness audit: total-variation distance between each
    // (nation, $5000 bucket) class's segment mix and the global one,
    // exact truncated-ppm shares, t = 0.2
    "q_kanon_tcloseness" -> ((s, d) =>
      Affinity.tCloseness(
        Tables.customer(s, d).select(col("c_nationkey"),
          expr("(cast(round(c_acctbal * 100) as bigint) + 1000000) " +
            "div 500000").as("acct_bucket"),
          col("c_mktsegment")),
        Seq("c_nationkey", "acct_bucket"), "c_mktsegment",
        tPpm = 200000L)),
    // rarest-token-blocked entity resolution, Levenshtein-verified;
    // resolved within one brand — TPC-H's 92-word name vocabulary
    // makes corpus-global blocking degenerate (see the op docstring)
    "q_fuzzy_match" -> ((s, d) =>
      Affinity.fuzzyNameMatch(
        Tables.part(s, d).filter(col("p_brand") === "Brand#11"),
        maxDist = 2)),
    // aggregation-key skew diagnosis over the event stream's user key
    "q_skew_advisor" -> ((s, d) =>
      Affinity.skewAdvisor(Tables.events(s, d), col("user_id"),
        topK = 5)),
    // ER capstone: block -> verify -> components -> entity-size
    // profile over the whole part catalog
    "q_part_entity_resolution" -> ((s, d) =>
      Affinity.entityResolution(Tables.part(s, d),
        precomputedPairs = Some(fuzzyPairsDf(s, d)))
        .orderBy(col("size"))),
    // Fellegi-Sunter m/u agreement weights per comparison field over
    // the shared blocked candidate pairs; u = exact value-collision
    // ppm from the field histograms
    "q_part_fs_weights" -> ((s, d) =>
      Affinity.fellegiSunterWeights(Tables.part(s, d),
        precomputedPairs = Some(fuzzyPairsDf(s, d)))),
    // event-type PMI over user-day co-occurrence units, q20 ln terms
    "q_events_pmi" -> ((s, d) =>
      Affinity.eventPmi(Tables.events(s, d))),
    // Gini concentration of per-user event activity
    "q_events_gini" -> ((s, d) =>
      Affinity.giniConcentration(Tables.events(s, d), col("user_id"))),
    // RFM quintile segmentation of the customer base
    "q_rfm_segments" -> ((s, d) =>
      Relational.rfmSegments(Tables.orders(s, d))),
    // observed user-day paths (first 5 events, total order), top-10
    // with exact ppm share and conversion flag
    "q_events_paths" -> ((s, d) =>
      Affinity.eventPaths(Tables.events(s, d))),
    // two-proportion A/B readout: arms by user parity, conversion =
    // >= 14 purchases; exact counts + IEEE z in milli
    "q_events_ab_lift" -> ((s, d) =>
      Affinity.abConversionLift(Tables.events(s, d),
        col("user_id") % 2 === 1, "purchase", minCount = 14L)),
    // quantile treatment effects: exact-rank PERCENTILE_DISC per arm
    // over milli-quantized purchase values + per-percentile diff
    "q_events_ab_quantiles" -> ((s, d) =>
      Affinity.abQuantileLift(Tables.events(s, d),
        col("user_id") % 2 === 1)),
    // group-sequential A/B: cumulative z per quartile interim vs the
    // OBF boundary 1.96·√(K/k) — the peeking-safe readout; crossing
    // decided on milli-quantized integers in both engines
    "q_events_ab_sequential" -> ((s, d) =>
      Affinity.abSequential(Tables.events(s, d),
        col("user_id") % 2 === 1)),
    // weekday seasonal baseline + per-day deviation in exact milli
    "q_events_dow_baseline" -> ((s, d) =>
      Audit.dowBaseline(Tables.events(s, d))),
    // two-sided CUSUM level-shift detector over the daily event
    // count, allowance 10% / threshold 400% of the mean — the
    // reset-at-zero recurrence as two windows over the day rollup
    "q_events_cusum" -> ((s, d) =>
      Audit.cusumShift(Tables.events(s, d))
        .orderBy(col("d"))),
    // Fano factor (variance/mean) of daily counts per event type —
    // the overdispersion screen (~1000 milli = Poisson-like)
    "q_events_burstiness" -> ((s, d) =>
      Audit.burstiness(Tables.events(s, d))
        .orderBy(col("event_type"))),
    // freshness-decayed event mix: per-day half-life weights as
    // exact ppm integers (power-of-two decay), the recency-weighted
    // sampling mix vs raw volume
    "q_events_decay_mix" -> ((s, d) =>
      Audit.freshnessDecay(Tables.events(s, d), maxAgeDays = 20)
        .orderBy(col("event_type"))),
    // hour-of-day load shape per type: exact ppm share +
    // peak-to-mean milli, types×24 rows, no window
    "q_events_hourly_profile" -> ((s, d) =>
      Affinity.hourlyLoadProfile(Tables.events(s, d))
        .orderBy(col("event_type"), col("hr"))),
    // 50/50 sample-ratio mismatch on the ab_lift split: exact milli
    // chi-square, 1-dof 95% line as the documented 3841 threshold
    "q_events_srm" -> ((s, d) =>
      Affinity.sampleRatioMismatch(Tables.events(s, d),
        col("user_id") % 2 === 1)),
    // gap-constrained funnel: view -> click -> purchase with each
    // step within 1 h of the previous MATCHED step, greedy scan
    "q_events_windowed_funnel" -> ((s, d) =>
      Affinity.windowedFunnel(Tables.events(s, d),
        Seq("view", "click", "purchase"), maxGapMs = 3600000L)),
    // CUPED variance-reduced readout on the same parity split:
    // first-half purchases as the covariate, pooled theta, exact
    // integer-floored adjusted means + rho^2 variance reduction
    "q_events_cuped" -> ((s, d) =>
      Affinity.cupedLift(Tables.events(s, d),
        col("user_id") % 2 === 1)),
    // power/MDE calculator on the ab_lift conversion: pooled rate,
    // min detectable absolute effect at current n, required n per
    // arm for a 10%-relative effect (z constants pinned q20)
    "q_events_power_mde" -> ((s, d) =>
      Affinity.powerMde(Tables.events(s, d),
        col("user_id") % 2 === 1, "purchase", minCount = 14L)),
    // per-user hour-entropy bot screen: q20 ln-of-integer counts,
    // user-domain-sized output, no window
    "q_events_user_entropy" -> ((s, d) =>
      Affinity.userHourEntropy(Tables.events(s, d))
        .orderBy(col("user_id"))),
    // weekly-seasonality strength as ANOVA R²'s F form: daily counts
    // grouped by day-of-week (group labels never emitted, so the
    // Spark-1..7 vs DuckDB-0..6 dow numbering is immaterial)
    "q_events_dow_anova" -> ((s, d) =>
      Audit.anovaF(
        Tables.events(s, d)
          .filter(col("ts").isNotNull)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("x"))
          .select(dayofweek(col("day")).cast("string").as("dow"),
            col("x")),
        "x", "dow"))
  )

  val oracle: Map[String, String] = Map(
    "q_basket_lift" ->
      """WITH b AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem),
        |ic AS (SELECT pk, COUNT(*) AS item_ct FROM b GROUP BY 1),
        |no AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM b),
        |p AS (
        |  SELECT a.pk AS part_a, b2.pk AS part_b, COUNT(*) AS pair_ct
        |  FROM b a JOIN b b2 ON a.ok = b2.ok AND a.pk < b2.pk
        |  GROUP BY 1, 2)
        |SELECT part_a, part_b, pair_ct,
        |  ca.item_ct AS ct_a, cb.item_ct AS ct_b, no.n_orders,
        |  pair_ct * 1000000 // no.n_orders AS support_ppm,
        |  pair_ct * no.n_orders * 1000 // (ca.item_ct * cb.item_ct)
        |    AS lift_milli
        |FROM p
        |JOIN ic ca ON p.part_a = ca.pk
        |JOIN ic cb ON p.part_b = cb.pk
        |CROSS JOIN no
        |WHERE pair_ct >= 2
        |ORDER BY pair_ct DESC, part_a, part_b""".stripMargin,
    // NOTE the pairs-first CTE shape: flattening the three fb legs
    // into one FROM lets DuckDB's join reorderer pick the b2×c pair
    // first — whose ONLY predicate is the `b2.it < c.it` inequality,
    // a 55k×55k blockwise join with ~1.5e9 intermediate rows at
    // sf0.01 (measured: minutes + tens of GB vs 0.5 s for this form,
    // where every adjacent pair of relations shares a bk equality)
    "q_basket_triples" ->
      """WITH b AS (
        |  SELECT DISTINCT l_orderkey AS bk, p_brand AS it
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |nb AS (SELECT COUNT(DISTINCT bk) AS n_baskets FROM b),
        |ic AS (
        |  SELECT it, COUNT(*) AS item_ct FROM b GROUP BY 1
        |  HAVING COUNT(*) >= 20),
        |fb AS (SELECT b.bk, b.it FROM b JOIN ic ON b.it = ic.it),
        |p2 AS (
        |  SELECT a.bk, a.it AS ia, b2.it AS ib
        |  FROM fb a JOIN fb b2 ON a.bk = b2.bk AND a.it < b2.it),
        |t AS (
        |  SELECT ia AS item_a, ib AS item_b, c.it AS item_c,
        |    COUNT(*) AS triple_ct
        |  FROM p2 JOIN fb c ON p2.bk = c.bk AND p2.ib < c.it
        |  GROUP BY 1, 2, 3
        |  HAVING COUNT(*) >= 5)
        |SELECT item_a, item_b, item_c, triple_ct,
        |  ca.item_ct AS ct_a, cb.item_ct AS ct_b,
        |  cc.item_ct AS ct_c, nb.n_baskets,
        |  triple_ct * 1000000 // nb.n_baskets AS support_ppm,
        |  CAST(CAST(triple_ct AS HUGEINT) * nb.n_baskets
        |    * nb.n_baskets * 1000
        |    // (CAST(ca.item_ct AS HUGEINT) * cb.item_ct
        |       * cc.item_ct) AS BIGINT) AS lift_milli
        |FROM t
        |JOIN ic ca ON t.item_a = ca.it
        |JOIN ic cb ON t.item_b = cb.it
        |JOIN ic cc ON t.item_c = cc.it
        |CROSS JOIN nb
        |ORDER BY triple_ct DESC, item_a, item_b, item_c""".stripMargin,
    "q_li_cramers_v" ->
      """WITH cells AS (
        |  SELECT l_returnflag AS a, l_linestatus AS b,
        |    CAST(COUNT(*) AS BIGINT) AS o
        |  FROM lineitem
        |  WHERE l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL
        |  GROUP BY 1, 2),
        |-- domain completion: absent cells owe full expected mass
        |at AS (SELECT a, CAST(SUM(o) AS BIGINT) AS r_a
        |  FROM cells GROUP BY 1),
        |bt AS (SELECT b, CAST(SUM(o) AS BIGINT) AS c_b
        |  FROM cells GROUP BY 1),
        |fl AS (
        |  SELECT at.a, bt.b, at.r_a, bt.c_b,
        |    CAST(COALESCE(cells.o, 0) AS BIGINT) AS o
        |  FROM at CROSS JOIN bt
        |  LEFT JOIN cells ON cells.a = at.a AND cells.b = bt.b),
        |d AS (
        |  SELECT CAST(COUNT(DISTINCT a) AS BIGINT) AS n_a,
        |    CAST(COUNT(DISTINCT b) AS BIGINT) AS n_b
        |  FROM cells),
        |w AS (
        |  SELECT a, b, o, r_a, c_b,
        |    CAST(SUM(o) OVER () AS BIGINT) AS n
        |  FROM fl),
        |x AS (
        |  SELECT w.*, d.n_a, d.n_b,
        |    o * 1000000 // n AS obs_ppm,
        |    CAST(CAST(r_a AS HUGEINT) * c_b * 1000000
        |      // (CAST(n AS HUGEINT) * n) AS BIGINT) AS exp_ppm
        |  FROM w CROSS JOIN d),
        |y AS (
        |  SELECT *, (obs_ppm - exp_ppm) * (obs_ppm - exp_ppm)
        |    // GREATEST(exp_ppm, 1) AS term_ppm
        |  FROM x),
        |z AS (
        |  SELECT *, CAST(SUM(term_ppm) OVER () AS BIGINT)
        |    AS chi2_n_ppm
        |  FROM y)
        |SELECT a, b, o, r_a, c_b, n, n_a, n_b, obs_ppm, exp_ppm,
        |  term_ppm, chi2_n_ppm,
        |  CAST(FLOOR(SQRT(CAST(chi2_n_ppm AS DOUBLE)
        |    / (CAST(GREATEST(LEAST(n_a, n_b) - 1, 1) AS DOUBLE)
        |      * 1000000.0)) * 1000.0) AS BIGINT) AS v_milli
        |FROM z ORDER BY a, b""".stripMargin,
    "q_events_markov" ->
      """WITH t AS (
        |  SELECT event_type AS src,
        |    LEAD(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS dst
        |  FROM events),
        |c AS (
        |  SELECT src, dst, COUNT(*) AS ct
        |  FROM t WHERE dst IS NOT NULL GROUP BY 1, 2),
        |s AS (
        |  SELECT src, CAST(SUM(ct) AS BIGINT) AS src_total
        |  FROM c GROUP BY 1)
        |SELECT c.src, c.dst, c.ct, s.src_total,
        |  c.ct * 1000000 // s.src_total AS p_ppm
        |FROM c JOIN s USING (src)
        |ORDER BY src, dst""".stripMargin,
    // per-src conditional entropy in q20 (floored integer-count
    // logs — numerators provably non-negative, so // ≡ div) + the
    // transition-weighted __all__ rate row
    "q_events_entropy_rate" ->
      """WITH t AS (
        |  SELECT event_type AS src,
        |    LEAD(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS dst
        |  FROM events),
        |c AS (
        |  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS ct
        |  FROM t WHERE dst IS NOT NULL GROUP BY 1, 2),
        |ps AS (
        |  SELECT src, CAST(COUNT(*) AS BIGINT) AS n_dst,
        |    CAST(SUM(ct) AS BIGINT) AS src_total,
        |    CAST(SUM(CAST(ct AS HUGEINT)
        |      * CAST(FLOOR(LN(CAST(ct AS DOUBLE))
        |      * 1048576) AS BIGINT)) AS HUGEINT) AS mass_ln_ct
        |  FROM c GROUP BY 1),
        |h AS (
        |  SELECT src, n_dst, src_total,
        |    (CAST(src_total AS HUGEINT)
        |      * CAST(FLOOR(LN(CAST(src_total AS DOUBLE))
        |      * 1048576) AS BIGINT) - mass_ln_ct) // src_total
        |      AS h_cond_q20
        |  FROM ps),
        |at AS (SELECT CAST(SUM(src_total) AS BIGINT) AS all_total
        |       FROM h)
        |SELECT src, n_dst, src_total,
        |  CAST(h_cond_q20 AS BIGINT) AS h_cond_q20,
        |  CAST(CAST(src_total AS HUGEINT) * 1000000
        |    // at.all_total AS BIGINT) AS weight_ppm
        |FROM h CROSS JOIN at
        |UNION ALL
        |SELECT '__all__', CAST(SUM(n_dst) AS BIGINT),
        |  CAST(SUM(src_total) AS BIGINT),
        |  CAST(SUM(CAST(src_total AS HUGEINT) * h_cond_q20)
        |    // MAX(at.all_total) AS BIGINT),
        |  CAST(1000000 AS BIGINT)
        |FROM h CROSS JOIN at
        |ORDER BY src""".stripMargin,
    "q_events_ab_quantiles" ->
      """WITH v AS (
        |  SELECT (user_id % 2 = 1) AS treat,
        |    CAST(floor(value * 1000) AS BIGINT) AS v_milli, event_id
        |  FROM events WHERE event_type = 'purchase'),
        |r AS (
        |  SELECT treat, v_milli,
        |    ROW_NUMBER() OVER (PARTITION BY treat
        |      ORDER BY v_milli, event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY treat) AS cnt
        |  FROM v),
        |a AS (
        |  SELECT treat, CAST(MAX(cnt) AS BIGINT) AS n,
        |    MAX(CASE WHEN rn = (cnt * 25 + 99) // 100
        |      THEN v_milli END) AS p25,
        |    MAX(CASE WHEN rn = (cnt * 50 + 99) // 100
        |      THEN v_milli END) AS p50,
        |    MAX(CASE WHEN rn = (cnt * 75 + 99) // 100
        |      THEN v_milli END) AS p75,
        |    MAX(CASE WHEN rn = (cnt * 90 + 99) // 100
        |      THEN v_milli END) AS p90
        |  FROM r GROUP BY 1),
        |c AS (SELECT n AS n_ctrl, p25 AS c25, p50 AS c50,
        |        p75 AS c75, p90 AS c90 FROM a WHERE NOT treat),
        |t AS (SELECT n AS n_treat, p25 AS t25, p50 AS t50,
        |        p75 AS t75, p90 AS t90 FROM a WHERE treat),
        |s AS (
        |  SELECT n_ctrl, n_treat, 25 AS pct, c25 AS ctrl_milli,
        |    t25 AS treat_milli FROM c CROSS JOIN t
        |  UNION ALL SELECT n_ctrl, n_treat, 50, c50, t50
        |    FROM c CROSS JOIN t
        |  UNION ALL SELECT n_ctrl, n_treat, 75, c75, t75
        |    FROM c CROSS JOIN t
        |  UNION ALL SELECT n_ctrl, n_treat, 90, c90, t90
        |    FROM c CROSS JOIN t)
        |SELECT n_ctrl, n_treat, pct, ctrl_milli, treat_milli,
        |  treat_milli - ctrl_milli AS diff_milli
        |FROM s ORDER BY pct""".stripMargin,
    // cumulative per-interim conversion z (same IEEE chain as
    // ab_lift, guarded) vs the shared OBF literal boundaries
    "q_events_ab_sequential" -> {
      val bounds = graft.ops.Affinity.obfBoundsMilli(4)
      val bCase = "CAST(CASE chk " + bounds.zipWithIndex.map {
        case (b, i) => s"WHEN ${i + 1} THEN $b"
      }.mkString(" ") + " END AS BIGINT)"
      s"""WITH ud AS (
         |  SELECT user_id,
         |    CAST(ts AS DATE) - DATE '1970-01-01' AS dday,
         |    CAST(SUM(CASE WHEN event_type = 'purchase'
         |      THEN 1 ELSE 0 END) AS BIGINT) AS conv_events
         |  FROM events GROUP BY 1, 2),
         |sp AS (SELECT MIN(dday) AS d0, MAX(dday) AS d1 FROM ud),
         |ck AS (SELECT UNNEST([1, 2, 3, 4]) AS chk),
         |cuts AS (
         |  SELECT ck.chk, CAST(sp.d0 - 1
         |    + ((sp.d1 - sp.d0 + 1) * ck.chk + 3) // 4 AS INT)
         |    AS cut_day
         |  FROM ck, sp),
         |uc AS (
         |  SELECT c.chk, c.cut_day, ud.user_id,
         |    SUM(ud.conv_events) AS cv
         |  FROM cuts c JOIN ud ON ud.dday <= c.cut_day
         |  GROUP BY 1, 2, 3),
         |ua AS (
         |  SELECT chk, cut_day, user_id,
         |    CASE WHEN cv >= 14 THEN 1 ELSE 0 END AS conv,
         |    CASE WHEN user_id % 2 = 1 THEN 'B' ELSE 'A' END AS arm
         |  FROM uc),
         |g AS (
         |  SELECT chk, cut_day,
         |    CAST(COUNT(*) FILTER (arm = 'A') AS BIGINT) AS n_a,
         |    CAST(COALESCE(SUM(conv) FILTER (arm = 'A'), 0)
         |      AS BIGINT) AS conv_a,
         |    CAST(COUNT(*) FILTER (arm = 'B') AS BIGINT) AS n_b,
         |    CAST(COALESCE(SUM(conv) FILTER (arm = 'B'), 0)
         |      AS BIGINT) AS conv_b
         |  FROM ua GROUP BY 1, 2)
         |SELECT chk, cut_day, n_a, conv_a, n_b, conv_b,
         |  CAST(CASE WHEN n_a > 0 AND n_b > 0
         |      AND conv_a + conv_b > 0
         |      AND conv_a + conv_b < n_a + n_b THEN
         |    FLOOR(
         |      (CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)
         |        - CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE))
         |      / sqrt(
         |        (CAST(conv_a + conv_b AS DOUBLE)
         |          / CAST(n_a + n_b AS DOUBLE))
         |        * (1.0 - CAST(conv_a + conv_b AS DOUBLE)
         |            / CAST(n_a + n_b AS DOUBLE))
         |        * (1.0 / CAST(n_a AS DOUBLE)
         |          + 1.0 / CAST(n_b AS DOUBLE)))
         |      * 1000.0)
         |    ELSE 0 END AS BIGINT) AS z_milli,
         |  $bCase AS boundary_milli,
         |  CAST(CASE WHEN ABS(CAST(CASE WHEN n_a > 0 AND n_b > 0
         |      AND conv_a + conv_b > 0
         |      AND conv_a + conv_b < n_a + n_b THEN
         |    FLOOR(
         |      (CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)
         |        - CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE))
         |      / sqrt(
         |        (CAST(conv_a + conv_b AS DOUBLE)
         |          / CAST(n_a + n_b AS DOUBLE))
         |        * (1.0 - CAST(conv_a + conv_b AS DOUBLE)
         |            / CAST(n_a + n_b AS DOUBLE))
         |        * (1.0 / CAST(n_a AS DOUBLE)
         |          + 1.0 / CAST(n_b AS DOUBLE)))
         |      * 1000.0)
         |    ELSE 0 END AS BIGINT)) >= $bCase
         |    THEN 1 ELSE 0 END AS BIGINT) AS crossed
         |FROM g ORDER BY chk""".stripMargin
    },
    "q_events_ab_lift" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    CASE WHEN COUNT(*) FILTER (event_type = 'purchase') >= 14
        |      THEN 1 ELSE 0 END AS conv,
        |    CASE WHEN user_id % 2 = 1 THEN 'B' ELSE 'A' END AS arm
        |  FROM events GROUP BY user_id),
        |ar AS (
        |  SELECT arm, COUNT(*) AS n, CAST(SUM(conv) AS BIGINT) AS c
        |  FROM pu GROUP BY 1),
        |w AS (
        |  SELECT
        |    (SELECT n FROM ar WHERE arm = 'A') AS n_a,
        |    (SELECT c FROM ar WHERE arm = 'A') AS conv_a,
        |    (SELECT n FROM ar WHERE arm = 'B') AS n_b,
        |    (SELECT c FROM ar WHERE arm = 'B') AS conv_b)
        |SELECT n_a, conv_a, n_b, conv_b,
        |  conv_a * 1000000 // n_a AS rate_a_ppm,
        |  conv_b * 1000000 // n_b AS rate_b_ppm,
        |  conv_b * 1000000 // n_b - conv_a * 1000000 // n_a
        |    AS diff_ppm,
        |  CAST(FLOOR(
        |    (CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)
        |      - CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE))
        |    / sqrt(
        |      (CAST(conv_a + conv_b AS DOUBLE)
        |        / CAST(n_a + n_b AS DOUBLE))
        |      * (1.0 - CAST(conv_a + conv_b AS DOUBLE)
        |          / CAST(n_a + n_b AS DOUBLE))
        |      * (1.0 / CAST(n_a AS DOUBLE)
        |        + 1.0 / CAST(n_b AS DOUBLE)))
        |    * 1000.0) AS BIGINT) AS z_milli
        |FROM w""".stripMargin,
    // recursive greedy per-user walk in (tms, event_id) order — the
    // alert-cooldown twin pattern, state = (step, last-match ms)
    "q_events_windowed_funnel" ->
      """WITH RECURSIVE ev AS (
        |  SELECT user_id, epoch_ms(ts) AS tms, event_id, event_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY epoch_ms(ts), event_id) AS rn
        |  FROM events),
        |nn AS (SELECT user_id, CAST(MAX(rn) AS BIGINT) AS mx
        |       FROM ev GROUP BY 1),
        |walk(user_id, rn, st, lt) AS (
        |  SELECT user_id, CAST(0 AS BIGINT), 0, CAST(0 AS BIGINT)
        |  FROM nn
        |  UNION ALL
        |  SELECT e.user_id, e.rn,
        |    CASE WHEN w.st < 3
        |        AND e.event_type =
        |          (['view','click','purchase'])[w.st + 1]
        |        AND (w.st = 0 OR e.tms - w.lt <= 3600000)
        |      THEN w.st + 1 ELSE w.st END,
        |    CASE WHEN w.st < 3
        |        AND e.event_type =
        |          (['view','click','purchase'])[w.st + 1]
        |        AND (w.st = 0 OR e.tms - w.lt <= 3600000)
        |      THEN e.tms ELSE w.lt END
        |  FROM walk w JOIN ev e
        |    ON e.user_id = w.user_id AND e.rn = w.rn + 1),
        |fin AS (SELECT w.user_id, w.st FROM walk w
        |        JOIN nn ON nn.user_id = w.user_id AND w.rn = nn.mx),
        |c AS (SELECT
        |    CAST(COUNT(CASE WHEN st >= 1 THEN 1 END) AS BIGINT) AS c1,
        |    CAST(COUNT(CASE WHEN st >= 2 THEN 1 END) AS BIGINT) AS c2,
        |    CAST(COUNT(CASE WHEN st >= 3 THEN 1 END) AS BIGINT) AS c3
        |  FROM fin),
        |stp AS (
        |  SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name,
        |    c1 AS n_users, CAST(NULL AS BIGINT) AS prev, c1 FROM c
        |  UNION ALL SELECT 2, 'click', c2, c1, c1 FROM c
        |  UNION ALL SELECT 3, 'purchase', c3, c2, c1 FROM c)
        |SELECT step, step_name, n_users,
        |  CASE WHEN c1 = 0 THEN NULL
        |    ELSE n_users * 1000000 // c1 END AS conv_vs_first_ppm,
        |  CASE WHEN step = 1 OR prev = 0 THEN NULL
        |    ELSE n_users * 1000000 // prev END AS conv_vs_prev_ppm
        |FROM stp ORDER BY step""".stripMargin,
    // pooled-theta CUPED: identical integer floors at every named
    // point (theta sign-split micro, means/covariate shifts milli)
    "q_events_cuped" ->
      """WITH days AS (
        |  SELECT user_id,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      AS sd,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
        |      AS hit
        |  FROM events),
        |m AS (SELECT (MIN(sd) + MAX(sd)) // 2 AS mid_day FROM days),
        |u AS (
        |  SELECT user_id, user_id % 2 = 1 AS arm_b,
        |    CAST(SUM(CASE WHEN sd <= mid_day THEN hit ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(SUM(CASE WHEN sd > mid_day THEN hit ELSE 0 END)
        |      AS BIGINT) AS y
        |  FROM days, m GROUP BY user_id),
        |g AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx,
        |    CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    CAST(SUM(y * y) AS BIGINT) AS syy,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy,
        |    CAST(COUNT(CASE WHEN arm_b THEN 1 END) AS BIGINT) AS n_b,
        |    CAST(SUM(CASE WHEN arm_b THEN x ELSE 0 END) AS BIGINT)
        |      AS sx_b,
        |    CAST(SUM(CASE WHEN arm_b THEN y ELSE 0 END) AS BIGINT)
        |      AS sy_b,
        |    CAST(COUNT(CASE WHEN NOT arm_b THEN 1 END) AS BIGINT)
        |      AS n_a,
        |    CAST(SUM(CASE WHEN NOT arm_b THEN x ELSE 0 END)
        |      AS BIGINT) AS sx_a,
        |    CAST(SUM(CASE WHEN NOT arm_b THEN y ELSE 0 END)
        |      AS BIGINT) AS sy_a
        |  FROM u),
        |c AS (
        |  SELECT *,
        |    CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS t,
        |    CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS vx,
        |    CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS vy
        |  FROM g),
        |c2 AS (
        |  SELECT *,
        |    CASE WHEN vx = 0 THEN NULL
        |      ELSE CAST(CAST(sign(t) AS BIGINT) *
        |        CAST(abs(t) * 1000000 // vx AS BIGINT) AS BIGINT)
        |      END AS theta_micro,
        |    CASE WHEN vx = 0 OR vy = 0 THEN NULL
        |      ELSE CAST(t * t * 1000000 // (vx * vy) AS BIGINT)
        |      END AS varred_ppm,
        |    sy_a * 1000 // n_a AS mean_a_milli,
        |    sy_b * 1000 // n_b AS mean_b_milli,
        |    sx_a * 1000 // n_a - sx * 1000 // n AS dx_a,
        |    sx_b * 1000 // n_b - sx * 1000 // n AS dx_b
        |  FROM c),
        |c3 AS (
        |  SELECT *,
        |    CASE WHEN theta_micro IS NULL THEN mean_a_milli
        |      ELSE mean_a_milli - CAST(sign(theta_micro * dx_a)
        |        AS BIGINT) * (abs(theta_micro * dx_a) // 1000000)
        |      END AS adj_a_milli,
        |    CASE WHEN theta_micro IS NULL THEN mean_b_milli
        |      ELSE mean_b_milli - CAST(sign(theta_micro * dx_b)
        |        AS BIGINT) * (abs(theta_micro * dx_b) // 1000000)
        |      END AS adj_b_milli
        |  FROM c2)
        |SELECT n AS n_users, n_a, n_b, theta_micro, varred_ppm,
        |  mean_a_milli, mean_b_milli, adj_a_milli, adj_b_milli,
        |  adj_b_milli - adj_a_milli AS adj_diff_milli
        |FROM c3""".stripMargin,
    // two-proportion power calc: z sum pinned q20 = 2937341, 2^40 =
    // 1099511627776 carries the q20 squares; ceil via (num+den-1)//den
    "q_events_power_mde" ->
      """WITH u AS (
        |  SELECT user_id,
        |    CASE WHEN COUNT(*) FILTER (event_type = 'purchase') >= 14
        |      THEN 1 ELSE 0 END AS conv
        |  FROM events GROUP BY user_id),
        |g AS (
        |  SELECT
        |    CAST(COUNT(CASE WHEN user_id % 2 = 0 THEN 1 END)
        |      AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN conv ELSE 0 END)
        |      AS BIGINT) AS conv_a,
        |    CAST(COUNT(CASE WHEN user_id % 2 = 1 THEN 1 END)
        |      AS BIGINT) AS n_b,
        |    CAST(SUM(CASE WHEN user_id % 2 = 1 THEN conv ELSE 0 END)
        |      AS BIGINT) AS conv_b
        |  FROM u),
        |c AS (SELECT *,
        |    (conv_a + conv_b) * 1000000 // (n_a + n_b) AS p_pool_ppm
        |  FROM g),
        |d AS (SELECT *,
        |    CAST(2937341 AS HUGEINT) * 2937341 * 2 * p_pool_ppm
        |      * (1000000 - p_pool_ppm) AS num,
        |    LEAST(n_a, n_b) AS n_min,
        |    p_pool_ppm // 10 AS delta
        |  FROM c)
        |SELECT n_a, n_b, conv_a, conv_b, p_pool_ppm,
        |  CASE WHEN p_pool_ppm = 0 THEN NULL
        |    ELSE CAST(FLOOR(sqrt(CAST(num //
        |      (CAST(n_min AS HUGEINT) * 1099511627776) AS DOUBLE)))
        |      AS BIGINT) END AS mde_abs_ppm,
        |  CASE WHEN delta = 0 THEN NULL
        |    ELSE CAST((num + CAST(delta AS HUGEINT) * delta
        |        * 1099511627776 - 1)
        |      // (CAST(delta AS HUGEINT) * delta * 1099511627776)
        |      AS BIGINT) END AS n_req_10pct_rel
        |FROM d""".stripMargin,
    "q_events_dow_baseline" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |dd AS (
        |  SELECT event_type, day, n,
        |    CAST(isodow(day) - 1 AS INT) AS dow
        |  FROM daily),
        |base AS (
        |  SELECT event_type, dow, CAST(SUM(n) AS BIGINT)
        |    AS total_dow, COUNT(*) AS n_days_dow
        |  FROM dd GROUP BY 1, 2)
        |SELECT d.event_type, d.day, d.dow, d.n,
        |  b.total_dow * 1000 // b.n_days_dow AS expected_milli,
        |  d.n * 1000 * b.n_days_dow // b.total_dow - 1000
        |    AS dev_milli
        |FROM dd d JOIN base b USING (event_type, dow)
        |ORDER BY event_type, day""".stripMargin,
    "q_events_paths" ->
      """WITH s AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d,
        |    array_to_string(
        |      list(event_type ORDER BY ts, event_id)[1:5], '>')
        |      AS path
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT COUNT(*) AS n_sessions FROM s),
        |g AS (SELECT path, COUNT(*) AS n FROM s GROUP BY 1)
        |SELECT path, n, t.n_sessions,
        |  n * 1000000 // t.n_sessions AS share_ppm,
        |  list_contains(str_split(path, '>'), 'purchase') AS converts
        |FROM g CROSS JOIN t
        |ORDER BY n DESC, path LIMIT 10""".stripMargin,
    "q_events_gini" ->
      """WITH c AS (
        |  SELECT user_id, COUNT(*) AS ct FROM events GROUP BY 1),
        |fr AS (SELECT ct, COUNT(*) AS f FROM c GROUP BY 1),
        |cb AS (
        |  SELECT ct, f,
        |    COALESCE(SUM(f) OVER (ORDER BY ct
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cum_before
        |  FROM fr),
        |b AS (
        |  SELECT ct, f, cum_before,
        |    ct * (f * cum_before + f * (f + 1) // 2) AS block_ix,
        |    ct * f AS block_t
        |  FROM cb)
        |SELECT CAST(SUM(f) AS BIGINT) AS n_keys,
        |  CAST(SUM(block_t) AS BIGINT) AS total,
        |  CAST(SUM(block_ix) AS BIGINT) AS sum_ix,
        |  CAST(FLOOR((2.0 * CAST(SUM(block_ix) AS DOUBLE)
        |      - CAST(SUM(f) + 1 AS DOUBLE)
        |        * CAST(SUM(block_t) AS DOUBLE))
        |    / (CAST(SUM(f) AS DOUBLE) * CAST(SUM(block_t) AS DOUBLE))
        |    * 1000000.0) AS BIGINT) AS gini_ppm
        |FROM b""".stripMargin,
    "q_rfm_segments" ->
      """WITH per AS (
        |  SELECT o_custkey AS custkey,
        |    MAX(o_orderdate) AS last_order, COUNT(*) AS frequency,
        |    CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
        |      AS VARCHAR) AS DOUBLE) AS monetary
        |  FROM orders GROUP BY 1),
        |snap AS (SELECT MAX(o_orderdate) AS snap_day FROM orders),
        |sc AS (
        |  SELECT p.custkey, p.last_order, p.frequency, p.monetary,
        |    CAST(date_diff('day', last_order, snap_day) AS BIGINT)
        |      AS recency_days
        |  FROM per p CROSS JOIN snap),
        |r AS (
        |  SELECT *, COUNT(*) OVER () AS n_c,
        |    ROW_NUMBER() OVER (ORDER BY recency_days DESC, custkey)
        |      AS rn_r,
        |    ROW_NUMBER() OVER (ORDER BY frequency, custkey) AS rn_f,
        |    ROW_NUMBER() OVER (ORDER BY monetary, custkey) AS rn_m
        |  FROM sc)
        |SELECT custkey, recency_days, frequency, monetary,
        |  (5 * (rn_r - 1)) // n_c + 1 AS r_score,
        |  (5 * (rn_f - 1)) // n_c + 1 AS f_score,
        |  (5 * (rn_m - 1)) // n_c + 1 AS m_score,
        |  ((5 * (rn_r - 1)) // n_c + 1) * 100
        |    + ((5 * (rn_f - 1)) // n_c + 1) * 10
        |    + ((5 * (rn_m - 1)) // n_c + 1) AS segment
        |FROM r ORDER BY custkey""".stripMargin,
    "q_events_pmi" ->
      """WITH ut AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d, event_type
        |  FROM events),
        |s AS (SELECT event_type, COUNT(*) AS n FROM ut GROUP BY 1),
        |nu AS (
        |  SELECT COUNT(*) AS n_units FROM (
        |    SELECT DISTINCT user_id, d FROM ut)),
        |p AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    COUNT(*) AS n_ab
        |  FROM ut a JOIN ut b
        |    ON a.user_id = b.user_id AND a.d = b.d
        |    AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT type_a, type_b, n_ab, sa.n AS n_a, sb.n AS n_b,
        |  nu.n_units,
        |  CAST(FLOOR(ln(CAST(n_ab AS DOUBLE)) * 1048576) AS BIGINT)
        |  + CAST(FLOOR(ln(CAST(nu.n_units AS DOUBLE)) * 1048576)
        |      AS BIGINT)
        |  - CAST(FLOOR(ln(CAST(sa.n AS DOUBLE)) * 1048576) AS BIGINT)
        |  - CAST(FLOOR(ln(CAST(sb.n AS DOUBLE)) * 1048576) AS BIGINT)
        |    AS pmi_q20
        |FROM p
        |JOIN s sa ON p.type_a = sa.event_type
        |JOIN s sb ON p.type_b = sb.event_type
        |CROSS JOIN nu
        |ORDER BY type_a, type_b""".stripMargin,
    "q_kanon_risk" ->
      """SELECT c_nationkey, c_mktsegment,
        |  (CAST(round(c_acctbal * 100) AS BIGINT) + 1000000) // 500000
        |    AS acct_bucket,
        |  COUNT(*) AS group_size,
        |  COUNT(*) < 5 AS at_risk
        |FROM customer
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin,
    "q_kanon_ldiversity" ->
      """WITH b AS (
        |  SELECT c_nationkey,
        |    (CAST(round(c_acctbal * 100) AS BIGINT) + 1000000)
        |      // 500000 AS acct_bucket,
        |    c_mktsegment
        |  FROM customer),
        |vc AS (
        |  SELECT c_nationkey, acct_bucket, c_mktsegment AS sens,
        |    COUNT(*) AS ct
        |  FROM b GROUP BY 1, 2, 3),
        |rk AS (
        |  SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY c_nationkey, acct_bucket
        |    ORDER BY ct DESC, sens) AS rk
        |  FROM vc)
        |SELECT c_nationkey, acct_bucket,
        |  CAST(SUM(ct) AS BIGINT) AS group_size,
        |  COUNT(*) AS l_distinct,
        |  CAST(MAX(CASE WHEN rk = 1 THEN ct ELSE 0 END) AS BIGINT)
        |    AS top_count,
        |  CAST(MAX(CASE WHEN rk = 1 THEN ct ELSE 0 END) * 1000000
        |    // SUM(ct) AS BIGINT) AS top_ppm,
        |  COUNT(*) >= 3 AS meets_l,
        |  CAST(MAX(CASE WHEN rk = 1 THEN ct ELSE 0 END) AS BIGINT) <
        |    2 * CAST(SUM(CASE WHEN rk >= 3 THEN ct ELSE 0 END)
        |      AS BIGINT) AS meets_recursive
        |FROM rk GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_kanon_tcloseness" ->
      """WITH b AS (
        |  SELECT c_nationkey,
        |    (CAST(round(c_acctbal * 100) AS BIGINT) + 1000000)
        |      // 500000 AS acct_bucket,
        |    c_mktsegment AS sens
        |  FROM customer WHERE c_mktsegment IS NOT NULL),
        |cls AS (
        |  SELECT c_nationkey, acct_bucket, sens, COUNT(*) AS ct
        |  FROM b GROUP BY 1, 2, 3),
        |gl AS (
        |  SELECT sens, CAST(SUM(ct) AS BIGINT) AS gct
        |  FROM cls GROUP BY 1),
        |gt AS (SELECT CAST(SUM(gct) AS BIGINT) AS n FROM gl),
        |gs AS (
        |  SELECT sens, gct * 1000000 // n AS gppm
        |  FROM gl CROSS JOIN gt),
        |gq AS (SELECT CAST(SUM(gppm) AS BIGINT) AS gsum FROM gs),
        |enr AS (
        |  SELECT c.c_nationkey, c.acct_bucket, c.ct, g.gppm,
        |    CAST(SUM(c.ct) OVER (
        |      PARTITION BY c.c_nationkey, c.acct_bucket) AS BIGINT)
        |      AS nc
        |  FROM cls c JOIN gs g USING (sens)),
        |agg AS (
        |  SELECT c_nationkey, acct_bucket,
        |    CAST(MAX(nc) AS BIGINT) AS group_size,
        |    COUNT(*) AS n_values,
        |    CAST((SUM(ABS(ct * 1000000 // nc - gppm))
        |      + MAX(gsum) - SUM(gppm)) // 2 AS BIGINT) AS tv_ppm
        |  FROM enr CROSS JOIN gq GROUP BY 1, 2)
        |SELECT c_nationkey, acct_bucket, group_size, n_values,
        |  tv_ppm, tv_ppm <= 200000 AS meets_t
        |FROM agg ORDER BY 1, 2""".stripMargin,
    // whole-catalog fuzzy pairs -> recursive components -> profile
    "q_part_fs_weights" ->
      """WITH t AS (
        |  SELECT p_partkey, p_name,
        |    UNNEST(list_distinct(string_split(p_name, ' '))) AS token
        |  FROM part),
        |tdf AS (SELECT token, COUNT(*) AS df FROM t GROUP BY 1),
        |sig0 AS (
        |  SELECT p_partkey, p_name, token AS block_token FROM (
        |    SELECT t.p_partkey, t.p_name, t.token,
        |      ROW_NUMBER() OVER (PARTITION BY t.p_partkey
        |        ORDER BY tdf.df, t.token) AS rn
        |    FROM t JOIN tdf USING (token))
        |  WHERE rn = 1),
        |bs AS (
        |  SELECT block_token, COUNT(*) AS block_sz
        |  FROM sig0 GROUP BY 1),
        |sig AS (
        |  SELECT s.p_partkey, s.p_name, s.block_token
        |  FROM sig0 s JOIN bs USING (block_token)
        |  WHERE bs.block_sz <= 500),
        |pairs AS (
        |  SELECT a.p_partkey AS part_a, b.p_partkey AS part_b
        |  FROM sig a JOIN sig b
        |    ON a.block_token = b.block_token
        |    AND a.p_partkey < b.p_partkey
        |  WHERE levenshtein(a.p_name, b.p_name) <= 2),
        |attrs AS (
        |  SELECT p_partkey, p_brand AS f_brand, p_type AS f_type,
        |    CAST(p_size AS BIGINT) AS f_size,
        |    CAST(CAST(p_retailprice AS DECIMAL(18,4)) * 100
        |      AS BIGINT) // 10000 AS f_price
        |  FROM part),
        |m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |    CAST(COALESCE(SUM(CASE WHEN a.f_brand = b.f_brand
        |      THEN 1 ELSE 0 END), 0) AS BIGINT) AS m_brand,
        |    CAST(COALESCE(SUM(CASE WHEN a.f_type = b.f_type
        |      THEN 1 ELSE 0 END), 0) AS BIGINT) AS m_type,
        |    CAST(COALESCE(SUM(CASE WHEN a.f_size = b.f_size
        |      THEN 1 ELSE 0 END), 0) AS BIGINT) AS m_size,
        |    CAST(COALESCE(SUM(CASE WHEN a.f_price = b.f_price
        |      THEN 1 ELSE 0 END), 0) AS BIGINT) AS m_price
        |  FROM pairs
        |  JOIN attrs a ON part_a = a.p_partkey
        |  JOIN attrs b ON part_b = b.p_partkey),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_recs FROM attrs),
        |uu AS (
        |  SELECT 'brand' AS field,
        |    CAST(COALESCE(SUM(c * (c - 1)), 0) AS BIGINT) AS u_coll
        |  FROM (SELECT COUNT(*) AS c FROM attrs GROUP BY f_brand)
        |  UNION ALL SELECT 'price_band',
        |    CAST(COALESCE(SUM(c * (c - 1)), 0) AS BIGINT)
        |  FROM (SELECT COUNT(*) AS c FROM attrs GROUP BY f_price)
        |  UNION ALL SELECT 'size',
        |    CAST(COALESCE(SUM(c * (c - 1)), 0) AS BIGINT)
        |  FROM (SELECT COUNT(*) AS c FROM attrs GROUP BY f_size)
        |  UNION ALL SELECT 'type',
        |    CAST(COALESCE(SUM(c * (c - 1)), 0) AS BIGINT)
        |  FROM (SELECT COUNT(*) AS c FROM attrs GROUP BY f_type)),
        |mm AS (
        |  SELECT 'brand' AS field, m_brand AS m_agree FROM m
        |  UNION ALL SELECT 'price_band', m_price FROM m
        |  UNION ALL SELECT 'size', m_size FROM m
        |  UNION ALL SELECT 'type', m_type FROM m)
        |SELECT field, n_pairs, m_agree, m_ppm, u_ppm,
        |  m_ppm * 1000 // GREATEST(u_ppm, 1) AS weight_milli
        |FROM (
        |  SELECT mm.field, m.n_pairs, mm.m_agree,
        |    mm.m_agree * 1000000 // GREATEST(m.n_pairs, 1) AS m_ppm,
        |    CAST(CAST(uu.u_coll AS HUGEINT) * 1000000
        |      // GREATEST(CAST(n.n_recs AS HUGEINT)
        |        * (n.n_recs - 1), 1) AS BIGINT) AS u_ppm
        |  FROM mm JOIN uu USING (field) CROSS JOIN m CROSS JOIN n)
        |ORDER BY field""".stripMargin,
    "q_part_entity_resolution" ->
      """WITH RECURSIVE t AS (
        |  SELECT p_partkey, p_name,
        |    UNNEST(list_distinct(string_split(p_name, ' '))) AS token
        |  FROM part),
        |tdf AS (SELECT token, COUNT(*) AS df FROM t GROUP BY 1),
        |sig0 AS (
        |  SELECT p_partkey, p_name, token AS block_token FROM (
        |    SELECT t.p_partkey, t.p_name, t.token,
        |      ROW_NUMBER() OVER (PARTITION BY t.p_partkey
        |        ORDER BY tdf.df, t.token) AS rn
        |    FROM t JOIN tdf USING (token))
        |  WHERE rn = 1),
        |bs AS (
        |  SELECT block_token, COUNT(*) AS block_sz
        |  FROM sig0 GROUP BY 1),
        |sig AS (
        |  SELECT s.p_partkey, s.p_name, s.block_token
        |  FROM sig0 s JOIN bs USING (block_token)
        |  WHERE bs.block_sz <= 500),
        |pr AS (
        |  SELECT a.p_partkey AS da, b.p_partkey AS db
        |  FROM sig a JOIN sig b
        |    ON a.block_token = b.block_token
        |    AND a.p_partkey < b.p_partkey
        |  WHERE levenshtein(a.p_name, b.p_name) <= 2),
        |e AS (SELECT da AS src, db AS dst FROM pr
        |      UNION ALL SELECT db, da FROM pr),
        |reach(id, r) AS (
        |  SELECT p_partkey, p_partkey FROM part
        |  UNION
        |  SELECT reach.id, e.dst FROM reach JOIN e ON reach.r = e.src),
        |cl AS (SELECT id, MIN(r) AS cluster FROM reach GROUP BY id),
        |sizes AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS sz
        |          FROM cl GROUP BY 1),
        |tot AS (SELECT CAST(SUM(sz) AS BIGINT) AS n_total
        |        FROM sizes)
        |SELECT sz AS size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
        |  CAST(SUM(sz) AS BIGINT) AS n_members,
        |  CAST(SUM(sz) AS BIGINT) * 1000000 // tot.n_total
        |    AS members_ppm,
        |  tot.n_total
        |FROM sizes, tot GROUP BY sz, tot.n_total
        |ORDER BY size""".stripMargin,
    "q_fuzzy_match" ->
      """WITH pp AS (
        |  SELECT p_partkey, p_name FROM part
        |  WHERE p_brand = 'Brand#11'),
        |t AS (
        |  SELECT p_partkey, p_name,
        |    UNNEST(list_distinct(string_split(p_name, ' '))) AS token
        |  FROM pp),
        |tdf AS (SELECT token, COUNT(*) AS df FROM t GROUP BY 1),
        |sig0 AS (
        |  SELECT p_partkey, p_name, token AS block_token FROM (
        |    SELECT t.p_partkey, t.p_name, t.token,
        |      ROW_NUMBER() OVER (PARTITION BY t.p_partkey
        |        ORDER BY tdf.df, t.token) AS rn
        |    FROM t JOIN tdf USING (token))
        |  WHERE rn = 1),
        |bs AS (
        |  SELECT block_token, COUNT(*) AS block_sz
        |  FROM sig0 GROUP BY 1),
        |sig AS (
        |  SELECT s.p_partkey, s.p_name, s.block_token
        |  FROM sig0 s JOIN bs USING (block_token)
        |  WHERE bs.block_sz <= 500)
        |SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
        |  a.block_token,
        |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
        |FROM sig a JOIN sig b
        |  ON a.block_token = b.block_token
        |  AND a.p_partkey < b.p_partkey
        |WHERE levenshtein(a.p_name, b.p_name) <= 2
        |ORDER BY part_a, part_b""".stripMargin,
    "q_skew_advisor" ->
      """WITH c AS (
        |  SELECT user_id AS key, COUNT(*) AS ct
        |  FROM events GROUP BY 1),
        |f AS (SELECT ct, COUNT(*) AS freq FROM c GROUP BY 1),
        |cum AS (
        |  SELECT ct, SUM(freq) OVER (ORDER BY ct) AS cum FROM f),
        |nk AS (SELECT COUNT(*) AS nk FROM c),
        |med AS (
        |  SELECT MIN(ct) AS med_ct FROM cum CROSS JOIN nk
        |  WHERE cum >= (nk + 1) // 2),
        |st AS (
        |  SELECT COUNT(*) AS n_keys, CAST(SUM(ct) AS BIGINT)
        |    AS total_rows, MAX(ct) AS max_ct FROM c),
        |top AS (
        |  SELECT key, ct,
        |    CAST(ROW_NUMBER() OVER (ORDER BY ct DESC, key) AS INT)
        |      AS "rank"
        |  FROM c ORDER BY ct DESC, key LIMIT 5)
        |SELECT "rank", key, ct, n_keys, total_rows, max_ct, med_ct,
        |  total_rows * 1000 // n_keys AS avg_ct_milli,
        |  max_ct * 1000 * n_keys // total_rows AS skew_milli,
        |  (max_ct + med_ct - 1) // med_ct AS salt_rec
        |FROM top CROSS JOIN st CROSS JOIN med
        |ORDER BY "rank"""".stripMargin,
    "q_events_cusum" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
        |t AS (
        |  SELECT CAST(SUM(x) AS BIGINT) AS total,
        |    CAST(COUNT(*) AS BIGINT) AS n_days
        |  FROM daily),
        |b AS (
        |  SELECT d, x, total // n_days AS mean_x,
        |    ((total // n_days) * 100) // 1000 AS allow_k,
        |    ((total // n_days) * 4000) // 1000 AS thresh_h
        |  FROM daily CROSS JOIN t),
        |p AS (
        |  SELECT *,
        |    CAST(SUM(x - mean_x - allow_k) OVER (ORDER BY d)
        |      AS BIGINT) AS p_hi,
        |    CAST(SUM(mean_x - x - allow_k) OVER (ORDER BY d)
        |      AS BIGINT) AS p_lo
        |  FROM b),
        |s AS (
        |  SELECT *,
        |    p_hi - LEAST(0, MIN(p_hi) OVER (ORDER BY d)) AS s_hi,
        |    p_lo - LEAST(0, MIN(p_lo) OVER (ORDER BY d)) AS s_lo
        |  FROM p)
        |SELECT d, x, mean_x, thresh_h, s_hi, s_lo,
        |  s_hi > thresh_h AS alarm_hi,
        |  s_lo > thresh_h AS alarm_lo
        |FROM s ORDER BY d""".stripMargin,
    "q_events_burstiness" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
        |a AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
        |    CAST(SUM(x) AS BIGINT) AS sum_x,
        |    CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sum_x2
        |  FROM daily GROUP BY 1)
        |SELECT event_type, n_days, sum_x,
        |  CAST(sum_x * 1000 // n_days AS BIGINT) AS mean_milli,
        |  CASE WHEN n_days > 1 AND sum_x > 0 THEN
        |    CAST((CAST(n_days AS HUGEINT) * sum_x2
        |      - CAST(sum_x AS HUGEINT) * sum_x) * 1000
        |      // (CAST(n_days - 1 AS HUGEINT) * sum_x) AS BIGINT)
        |  END AS fano_milli
        |FROM a ORDER BY event_type""".stripMargin,
    // per-day half-life freshness weights: 10^6 // 2^min(age,20) is
    // an exact integer in both engines; value mass decays per
    // element with C-style truncation (Spark div ≡ DuckDB //)
    "q_events_decay_mix" ->
      """WITH mx AS (
        |  SELECT MAX(CAST(ts AS DATE)) AS asof_d FROM events),
        |w AS (
        |  SELECT event_type,
        |    1000000 // (CAST(1 AS BIGINT) << CAST(LEAST(
        |      date_diff('day', CAST(ts AS DATE), mx.asof_d), 20)
        |      AS INT)) AS w_ppm,
        |    CAST(floor(value * 1000) AS BIGINT) AS v_milli
        |  FROM events, mx)
        |SELECT event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(w_ppm) AS BIGINT) AS weight_ppm,
        |  CAST(SUM(v_milli * w_ppm // 1000000) AS BIGINT)
        |    AS decayed_value_milli
        |FROM w GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_events_hourly_profile" ->
      """WITH h AS (
        |  SELECT event_type,
        |    CAST(date_part('hour', ts) AS BIGINT) AS hr,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
        |t AS (
        |  SELECT event_type, CAST(SUM(n) AS BIGINT) AS n_type,
        |    CAST(MAX(n) AS BIGINT) AS peak,
        |    CAST(COUNT(*) AS BIGINT) AS n_hours
        |  FROM h GROUP BY 1)
        |SELECT h.event_type, h.hr, h.n,
        |  h.n * 1000000 // t.n_type AS share_ppm,
        |  t.peak * t.n_hours * 1000 // t.n_type AS peak_to_mean_milli
        |FROM h JOIN t USING (event_type)
        |ORDER BY event_type, hr""".stripMargin,
    "q_events_srm" ->
      """WITH u AS (
        |  SELECT DISTINCT user_id FROM events),
        |s AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
        |    CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_b
        |  FROM u)
        |SELECT n_users, n_users - n_b AS n_a, n_b,
        |  CASE WHEN n_users = 0 THEN NULL
        |    ELSE CAST((CAST(n_users - n_b AS HUGEINT) - n_b)
        |      * (CAST(n_users - n_b AS HUGEINT) - n_b) * 1000
        |      // n_users AS BIGINT) END AS srm_chi2_milli,
        |  CASE WHEN n_users = 0 THEN NULL
        |    ELSE CAST((CAST(n_users - n_b AS HUGEINT) - n_b)
        |      * (CAST(n_users - n_b AS HUGEINT) - n_b) * 1000
        |      // n_users AS BIGINT) > 3841 END AS srm_suspect
        |FROM s""".stripMargin,
    // q20 ln-of-integer entropy per user
    "q_events_user_entropy" ->
      """WITH uh AS (
        |  SELECT user_id, CAST(date_part('hour', ts) AS BIGINT)
        |      AS hr,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |  GROUP BY 1, 2),
        |t AS (
        |  SELECT user_id, CAST(SUM(c) AS BIGINT) AS n_events,
        |    CAST(COUNT(*) AS BIGINT) AS n_hours
        |  FROM uh GROUP BY 1)
        |SELECT uh.user_id, t.n_events, t.n_hours,
        |  CAST(SUM(uh.c *
        |    (CAST(floor(ln(CAST(t.n_events AS DOUBLE)) * 1048576)
        |       AS BIGINT)
        |     - CAST(floor(ln(CAST(uh.c AS DOUBLE)) * 1048576)
        |       AS BIGINT))) AS BIGINT) // t.n_events AS entropy_q20
        |FROM uh JOIN t USING (user_id)
        |GROUP BY uh.user_id, t.n_events, t.n_hours
        |ORDER BY uh.user_id""".stripMargin,
    // the q_text_len_anova statistic over (dow -> daily count)
    "q_events_dow_anova" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
        |g AS (
        |  SELECT dayofweek(day) AS g, CAST(COUNT(*) AS BIGINT) AS n_g,
        |    CAST(SUM(x) AS BIGINT) AS s_g,
        |    CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS s2_g
        |  FROM daily GROUP BY 1),
        |t AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS k,
        |    CAST(SUM(n_g) AS BIGINT) AS n,
        |    CAST(SUM(s_g) AS BIGINT) AS s,
        |    CAST(SUM(s2_g) AS HUGEINT) AS sum_x2,
        |    CAST(SUM(CAST(s_g AS HUGEINT) * s_g * 1048576 // n_g)
        |      AS HUGEINT) AS a_q20
        |  FROM g),
        |u AS (
        |  SELECT k, n,
        |    a_q20 - CAST(s AS HUGEINT) * s * 1048576 // n AS ssb_q20,
        |    sum_x2 * 1048576 - a_q20 AS ssw_q20
        |  FROM t)
        |SELECT k, n,
        |  CAST(ssb_q20 // 1048576 AS BIGINT) AS ssb_int,
        |  CAST(ssw_q20 // 1048576 AS BIGINT) AS ssw_int,
        |  CASE WHEN k < 2 OR n <= k OR ssw_q20 <= 0 THEN NULL
        |       ELSE CAST(ssb_q20 * (n - k) * 1000
        |         // (ssw_q20 * (k - 1)) AS BIGINT)
        |  END AS f_milli
        |FROM u""".stripMargin
  )
}
