package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout

/** Physical-design toolkit: Z-order clustering, range boundaries,
  * skew profile.
  */
class LayoutSpec extends SparkSpec {

  private def docs = Tables.lineitem(spark, sf("sf0.001"))

  test("zorder interleave matches a bit-by-bit Scala reference and is injective") {
    def ref(b1: Long, b2: Long, bits: Int): Long = {
      var z = 0L
      for (b <- 0 until bits) {
        z |= ((b1 >> b) & 1L) << (2 * b)
        z |= ((b2 >> b) & 1L) << (2 * b + 1)
      }
      z
    }
    import spark.implicits._
    val pairs = for (a <- 0L until 32L; b <- 0L until 32L) yield (a, b)
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        functions.zorderInterleave(array(col("a"), col("b")), 5).as("z"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    pairs.foreach { case (a, b) =>
      assert(got((a, b)) === ref(a, b, 5), s"($a,$b)")
    }
    // injective: 1024 distinct inputs -> 1024 distinct z values
    assert(got.values.toSet.size === pairs.size)
  }

  test("zorder fails loudly on out-of-range bucket ids") {
    import spark.implicits._
    val e = intercept[Exception] {
      Seq((5L, 99L)).toDF("a", "b")
        .select(functions.zorderInterleave(array(col("a"), col("b")), 5))
        .collect()
    }
    assert(e.getMessage.contains("outside") ||
      Option(e.getCause).exists(_.getMessage.contains("outside")))
  }

  test("withZValue buckets stay in range and z-value is within n*bits bits") {
    val z = Layout.withZValue(docs, Seq("l_partkey", "l_suppkey"), bits = 8)
    val bad = z.filter(col("z_value") < 0 ||
      col("z_value") >= (1L << 16)).count()
    assert(bad === 0L)
    assert(z.count() === docs.count())
  }

  test("z-clustered blocks touch fewer blocks than a linear sort for a 2-D box") {
    // Partition the table into 64 equal row blocks under two layouts:
    // sorted by z-value vs sorted by l_partkey alone. For a box
    // predicate on BOTH dims, count blocks whose (min,max) envelope
    // intersects the box — the proxy for row-group pruning. The
    // z-layout must touch strictly fewer blocks: that is the entire
    // point of the operator.
    val bits = 8
    val z = Layout.withZValue(docs, Seq("l_partkey", "l_suppkey"), bits)
      .select(col("l_partkey"), col("l_suppkey"), col("z_value"))
    def blocksTouched(ordered: org.apache.spark.sql.DataFrame): Long = {
      val blocked = ordered
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(
            col("__ord"), col("l_partkey"), col("l_suppkey"))))
        .withColumn("blk", expr("rn div 100"))
        .groupBy("blk")
        .agg(min("l_partkey").as("p_mn"), max("l_partkey").as("p_mx"),
          min("l_suppkey").as("s_mn"), max("l_suppkey").as("s_mx"))
      blocked.filter(
        col("p_mx") >= 100 && col("p_mn") <= 160 &&
          col("s_mx") >= 2 && col("s_mn") <= 5).count()
    }
    val zTouched = blocksTouched(z.withColumn("__ord", col("z_value")))
    val linTouched = blocksTouched(z.withColumn("__ord", col("l_partkey")))
    assert(zTouched < linTouched,
      s"z-order touched $zTouched blocks, linear sort $linTouched")
  }

  test("rangeBoundaries: minimal upper bounds hitting the ceil targets") {
    val n = 8
    val vals = docs.select(col("l_extendedprice").as("v"))
    val bounds = Layout.rangeBoundaries(vals, "v", n)
      .orderBy("range_id").collect()
      .map(r => (r.getInt(0), r.getDouble(1)))
    val sortedVals = vals.collect().map(_.getDouble(0)).sorted
    val total = sortedVals.length.toLong
    assert(bounds.map(_._1).toSeq === (1 to n))
    bounds.foreach { case (i, ub) =>
      val target = (i * total + n - 1) / n
      // cumulative count at ub reaches the target...
      assert(sortedVals.count(_ <= ub) >= target, s"range $i")
      // ...and ub is minimal: the next-smaller distinct value doesn't
      val below = sortedVals.filter(_ < ub)
      if (below.nonEmpty) assert(below.length < target, s"range $i minimal")
    }
    // the last boundary is the max
    assert(bounds.last._2 === sortedVals.last)
  }

  test("hilbert value matches the xy2d reference, is bijective, and " +
      "consecutive indexes are always grid neighbors (beats z-order)") {
    import spark.implicits._
    def ref(x0: Long, y0: Long, bits: Int): Long = {
      var x = x0; var y = y0; var d = 0L
      var s = 1L << (bits - 1)
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
          val t = x; x = y; y = t
        }
        s >>= 1
      }
      d
    }
    val bits = 5
    val n = 1L << bits
    val cells = (for (x <- 0L until n; y <- 0L until n) yield (x, y))
    // identity bucketing: ranges pinned to the grid itself
    val got = Layout.withHilbertValue(cells.toDF("x", "y"), "x", "y",
        bits, ranges = Some(Map("x" -> (0L, n - 1), "y" -> (0L, n - 1))))
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        r.getAs[Long]("hilbert_value"))).toMap
    cells.foreach { case (x, y) =>
      assert(got((x, y)) === ref(x, y, bits), s"($x,$y)")
    }
    assert(got.values.toSet.size === cells.size) // bijective on grid
    // locality: walking the curve, every step moves to a grid
    // NEIGHBOR — the property z-order lacks (its power-of-2 seams
    // take diagonal jumps), and the reason a rectangle predicate
    // touches fewer index runs under hilbert
    val byD = got.map(_.swap)
    val hilbertJumps = (0L until n * n - 1).count { d =>
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1
    }
    assert(hilbertJumps === 0)
    val zByD = cells.map { case (x, y) =>
      var z = 0L
      for (b <- 0 until bits) {
        z |= ((x >> b) & 1L) << (2 * b); z |= ((y >> b) & 1L) << (2 * b + 1)
      }
      z -> (x, y)
    }.toMap
    val zJumps = (0L until n * n - 1).count { d =>
      val (x1, y1) = zByD(d); val (x2, y2) = zByD(d + 1)
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1
    }
    assert(zJumps > 0, "z-order unexpectedly had perfect locality")
    // the operational payoff, measured: a rectangle predicate covers
    // FEWER CONTIGUOUS INDEX RUNS under hilbert (each run = one range
    // read / row-group span a scanner opens). 50 deterministic 8x8
    // rectangles on the 32x32 grid: hilbert needs ~40% fewer runs.
    // (Coarse file counts are a wash at this grid size — the curve's
    // win is run structure, which is what survives to IO.)
    def runsFor(f: (Long, Long) => Long): Int = {
      val rng = new scala.util.Random(1)
      (0 until 50).map { _ =>
        val x0 = rng.nextInt(24); val y0 = rng.nextInt(24)
        val idx = (for (x <- x0 until x0 + 8; y <- y0 until y0 + 8)
          yield f(x.toLong, y.toLong)).sorted
        1 + idx.zip(idx.tail).count { case (a, b) => b != a + 1 }
      }.sum
    }
    val hRuns = runsFor((x, y) => got((x, y)))
    val zRuns = runsFor((x, y) => zByD.map(_.swap).apply((x, y)))
    assert(hRuns < (zRuns * 3) / 4,
      s"hilbert runs $hRuns not < 75% of z-order runs $zRuns")
  }

  test("clusterByHilbert round-trips rows and sorts by hilbert " +
      "value within partitions") {
    val li = docs.select("l_orderkey", "l_linenumber", "l_partkey",
      "l_suppkey")
    val out = Layout.clusterByHilbert(li, "l_partkey", "l_suppkey",
      bits = 8, numPartitions = 4)
    assert(out.count() === li.count())
    val sortedWithin = out.select("hilbert_value").rdd
      .mapPartitions { it =>
        val vs = it.map(_.getLong(0)).toSeq
        Iterator(vs == vs.sorted)
      }.collect()
    assert(sortedWithin.forall(identity))
  }

  test("exactKeyQuantiles equals the ROW_NUMBER cut on unique, " +
      "negative, and duplicate keys") {
    import spark.implicits._
    // exact-rank reference on a local sort
    def ref(keys: Seq[Long], n: Int): Seq[(Int, Long)] = {
      val s = keys.sorted
      val nd = s.length.toLong
      (0 until n).map(b =>
        b -> s((((b + 1) * nd + n - 1) / n - 1).toInt))
    }
    def got(keys: Seq[Long], n: Int, cells: Int = 7): Seq[(Int, Long)] =
      Layout.exactKeyQuantiles(keys.toDF("k"), "k", n, cells)
        .orderBy("range_id").collect()
        .map(r => (r.getInt(0), r.getLong(1))).toSeq
    // unique shuffled keys incl. negatives, awkward cell count
    val uniq = scala.util.Random.shuffle(
      (-50L to 49L).toVector)
    assert(got(uniq, 10) === ref(uniq, 10))
    assert(got(uniq, 3) === ref(uniq, 3))
    // nRanges > distinct cells exercises multi-target-per-cell
    assert(got(uniq, 10, cells = 2) === ref(uniq, 10))
    // duplicates: value-at-rank is still well-defined
    val dup = Seq(5L, 5L, 5L, 1L, 1L, 9L, 9L, 9L, 9L, 2L)
    assert(got(dup, 4) === ref(dup, 4))
    // all keys equal: every boundary is that key (w=1 path)
    assert(got(Seq.fill(9)(7L), 3) === Seq(0 -> 7L, 1 -> 7L, 2 -> 7L))
    // fewer rows than ranges: ranks still land (repeated boundaries)
    assert(got(Seq(10L, 20L), 4) === ref(Seq(10L, 20L), 4))
    // empty input: empty result, no crash
    assert(Layout.exactKeyQuantiles(
      Seq.empty[Long].toDF("k"), "k", 4).count() === 0L)
  }

  test("exactKeyQuantiles clustered keys: dense block + far outlier " +
      "stays exact and spreads past the degenerate pass-1 cell") {
    import spark.implicits._
    // every key except one lands in pass-1 cell 0 (the outlier
    // stretches max-min 1e12×): the advisor-flagged degeneracy. The
    // local re-split must (a) keep the result exact, (b) spread the
    // dense mass across many (cell, subcell) groups.
    val keys = (0L until 5000L) :+ 5000000000000L
    def ref(n: Int): Seq[(Int, Long)] = {
      val s = keys.sorted; val nd = s.length.toLong
      (0 until n).map(b =>
        b -> s((((b + 1) * nd + n - 1) / n - 1).toInt))
    }
    val got = ops.Layout.exactKeyQuantiles(
      keys.toDF("k"), "k", 8, coarseCells = 64)
      .orderBy("range_id").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(got === ref(8))
  }

  test("exactKeyQuantiles plan has no unpartitioned window over the " +
      "input rows") {
    import spark.implicits._
    val df = (0L until 1000L).toDF("k")
    val plan = Layout.exactKeyQuantiles(df, "k", 10)
      .queryExecution.executedPlan.toString
    // the only WindowExecs allowed partition by cell / run over the
    // bounded cell histogram; a global `Window.orderBy(k)` over the
    // raw rows would print as an empty partition spec on column k
    assert(!plan.contains("row_number() windowspecdefinition(k#"),
      s"global row_number over raw rows in:\n$plan")
  }

  test("keySkewProfile matches a Scala recount and orders by weight") {
    val prof = Layout.keySkewProfile(docs, "l_suppkey",
      topN = 10, nParts = 32).collect()
    val counts = docs.groupBy("l_suppkey").count().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val total = counts.map(_._2).sum
    val expTop = counts.sortBy { case (k, c) => (-c, k) }.take(10)
    assert(prof.length === 10)
    prof.zip(expTop).foreach { case (row, (k, c)) =>
      assert(row.getLong(0) === k)
      assert(row.getLong(1) === c)
      assert(row.getLong(2) === c * 1000000L / total)
      assert(row.getLong(3) === (c * 32L + total - 1L) / total)
    }
  }

  test("clusterByZOrder round-trips rows and sorts by z within partitions") {
    val clustered = Layout.clusterByZOrder(docs,
      Seq("l_partkey", "l_suppkey"), bits = 8, numPartitions = 4)
    assert(clustered.count() === docs.count())
    import spark.implicits._
    val sortedWithin = clustered
      .select(spark_partition_id().as("pid"), col("z_value"))
      .mapPartitions { it =>
        var ok = true
        var prev = Long.MinValue
        it.foreach { r =>
          val z = r.getLong(1)
          if (z < prev) ok = false
          prev = z
        }
        Iterator.single(ok)
      }.collect()
    assert(sortedWithin.forall(identity))
  }

  test("compactionPlan: no-straddle bins per partition, oversize " +
      "file alone, deterministic under repartitioning") {
    import spark.implicits._
    val files = Seq(
      ("a", 1L, 800L), ("a", 2L, 900L),   // bin 0: 1700
      ("a", 3L, 400L),                    // would overflow → bin 1
      ("a", 4L, 5000L),                   // oversize → bin 2, alone
      ("a", 5L, 100L),                    // bin 3 (4 left bin 2 full)
      ("b", 6L, 1999L), ("b", 7L, 1L)     // exactly fills bin 0
    ).toDF("part_key", "file_id", "bytes")
    val expect = Map(
      1L -> ((0L, 0L)), 2L -> ((0L, 800L)),
      3L -> ((1L, 0L)), 4L -> ((2L, 0L)), 5L -> ((3L, 0L)),
      6L -> ((0L, 0L)), 7L -> ((0L, 1999L)))
    def run(df: org.apache.spark.sql.DataFrame) =
      Layout.compactionPlan(df, 2000L)
        .select("file_id", "bin_id", "bin_off")
        .as[(Long, Long, Long)].collect()
        .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(run(files) == expect)
    assert(run(files.repartition(7)) == expect)
    // every bin respects the target unless it holds one oversize file
    val bins = Layout.compactionPlan(files, 2000L)
      .groupBy("part_key", "bin_id")
      .agg(sum("bytes").as("tot"), count(lit(1)).as("n"))
      .collect()
    bins.foreach { r =>
      assert(r.getAs[Long]("tot") <= 2000L || r.getAs[Long]("n") == 1L)
    }
  }

  test("pruneAudit2D: rectangle overlap requires BOTH dimensions") {
    import spark.implicits._
    val stats = Seq(
      // file 1 matches dim a but not b; file 2 matches both
      ("L", 1L, 0L, 10L, 50L, 60L, 100L),
      ("L", 2L, 0L, 10L, 0L, 10L, 100L)
    ).toDF("layout", "file_id", "min_a", "max_a", "min_b", "max_b",
      "n_rows")
    val preds = Seq((1, 5L, 6L, 5L, 6L))
      .toDF("pred_id", "a_lo", "a_hi", "b_lo", "b_hi")
    val r = Layout.pruneAudit2D(stats, preds).head
    assert(r.getLong(4) == 1L && r.getLong(6) == 500000L,
      s"row=$r") // only file 2 scans → 50% skipped
  }

  test("hilbert prune audit: both curves beat insertion on the " +
      "rectangle predicate; result shape pinned") {
    val r = graft.SparkEntry
      .queries("q_layout_hilbert_prune")(spark, sf("sf0.001"))
      .collect()
      .map(x => (x.getAs[String]("layout"), x.getAs[Int]("pred_id")) ->
        x.getAs[Long]("skip_ppm")).toMap
    assert(r.size == 9, s"expected 3 layouts x 3 preds, got ${r.size}")
    // insertion layout: partkey/suppkey uncorrelated with arrival ->
    // every file overlaps every predicate rectangle
    assert(r(("insertion", 3)) == 0L)
    // both space-filling curves must actually skip on the rectangle
    // (that is what the interleaved/hilbert bits BUY)
    assert(r(("zorder", 3)) > 0L, s"zorder skipped nothing: $r")
    assert(r(("hilbert", 3)) > 0L, s"hilbert skipped nothing: $r")
  }

  test("pruneAudit: interval-overlap scan rule, exact skip ppm per layout") {
    import spark.implicits._
    // clustered: tight disjoint ranges; scattered: every file spans all
    val stats = Seq(
      ("tight", 1L, 0.0, 9.0, 100L), ("tight", 2L, 10.0, 19.0, 100L),
      ("tight", 3L, 20.0, 29.0, 100L), ("tight", 4L, 30.0, 39.0, 100L),
      ("wide", 1L, 0.0, 39.0, 200L), ("wide", 2L, 0.0, 39.0, 200L)
    ).toDF("layout", "file_id", "min_v", "max_v", "n_rows")
    val preds = Seq((1, 12.0, 18.0), (2, 9.0, 20.0))
      .toDF("pred_id", "p_lo", "p_hi")
    val out = Layout.pruneAudit(stats, preds).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(4),
        r.getLong(6), r.getLong(7), r.getLong(8))).toList
    assert(out === List(
      // pred 1 [12,18]: tight hits only file 2 → skip 750000 ppm
      ("tight", 1, 4L, 1L, 100L, 750000L),
      // pred 2 [9,20]: boundary-inclusive — files 1 (max=9), 2, 3
      // (min=20) all intersect
      ("tight", 2, 4L, 3L, 300L, 250000L),
      ("wide", 1, 2L, 2L, 400L, 0L),
      ("wide", 2, 2L, 2L, 400L, 0L)))
  }

  test("fileOverlapDepth: chained overlaps, boundary ties, and the " +
      "disjoint file read depth 1") {
    import spark.implicits._
    // f1 [0,10], f2 [5,15] (overlaps f1), f3 [10,20] (starts exactly
    // at f1 max: end-at-v still covers v), f4 [30,40] disjoint
    val stats = Seq(
      ("L", 1L, 0L, 10L, 100L), ("L", 2L, 5L, 15L, 100L),
      ("L", 3L, 10L, 20L, 100L), ("L", 4L, 30L, 40L, 100L))
      .toDF("layout", "file_id", "min_v", "max_v", "n_rows")
    val d = graft.ops.Layout.fileOverlapDepth(stats)
      .collect().map(r => r.getAs[Long]("file_id") ->
        r.getAs[Long]("depth")).toMap
    // at 0: only f1; at 5: f1,f2; at 10: f1 ends AT 10 + f2 + f3 = 3
    assert(d === Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 1L))
  }

  test("fileOverlapDepth: shared min_v ties count each other; null " +
      "boundaries drop; groups independent") {
    import spark.implicits._
    val stats = Seq(
      ("A", 1L, Some(0L), Some(10L), 10L),
      ("A", 2L, Some(0L), Some(10L), 10L),   // same min_v as f1
      ("A", 3L, Some(50L), Some(60L), 10L),
      ("A", 4L, None, Some(9L), 10L),        // null min_v: excluded
      ("B", 5L, Some(0L), Some(10L), 10L))   // other group: depth 1
    .toDF("layout", "file_id", "min_v", "max_v", "n_rows")
    val rows = graft.ops.Layout.fileOverlapDepth(stats).collect()
    val d = rows.map(r => r.getAs[Long]("file_id") ->
      r.getAs[Long]("depth")).toMap
    assert(d === Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 5L -> 1L))
  }

  test("insertionOrderCorrelation: sorted column reads 1e6, " +
      "reversed reads 0; bucket boundaries excluded") {
    import spark.implicits._
    val asc = (1L to 8L).map(k => (k, k * 10L)).toDF("seq", "v")
    val r1 = graft.ops.Layout
      .insertionOrderCorrelation(asc, "seq", "v", bucketSize = 4L)
      .collect().head
    // 8 rows in buckets {0: seq 1-3, 1: 4-7, 2: 8} → 2+3+0 = ...
    // seq 1..3 -> bucket 0 (2 pairs), 4..7 -> bucket 1 (3 pairs),
    // 8 -> bucket 2 (0 pairs): 5 pairs total, all ordered
    assert(r1.getAs[Long]("n_pairs") === 5L)
    assert(r1.getAs[Long]("ordered_ppm") === 1000000L)
    val desc = (1L to 8L).map(k => (k, -k * 10L)).toDF("seq", "v")
    val r2 = graft.ops.Layout
      .insertionOrderCorrelation(desc, "seq", "v", bucketSize = 4L)
      .collect().head
    assert(r2.getAs[Long]("ordered_ppm") === 0L)
  }

  test("snapshotLiveFiles: latest-op-wins MVCC resolve — removed " +
      "stays dead, re-add revives, future ops invisible") {
    import spark.implicits._
    val log = Seq(
      (1L, "A", 5L, 100L),              // plain live
      (2L, "A", 5L, 100L), (2L, "R", 7L, 100L), // removed -> dead
      (3L, "A", 5L, 100L), (3L, "R", 7L, 100L),
      (3L, "A", 9L, 100L),              // re-added -> live at v9
      (4L, "A", 5L, 100L), (4L, "R", 50L, 100L), // removed AFTER asOf
      (5L, "A", 60L, 100L)              // added after asOf -> absent
    ).toDF("file_id", "op", "version", "n_rows")
    val live = graft.ops.Layout.snapshotLiveFiles(log, 45L)
      .collect().map(r => r.getAs[Long]("file_id") ->
        r.getAs[Long]("live_version")).toMap
    assert(live === Map(1L -> 5L, 3L -> 9L, 4L -> 5L))
  }

  test("bloomAdvisor: matches a q20 square-and-multiply replica, " +
      "fpp grows with keys and shrinks with bits; exponent past the " +
      "chain fails loudly") {
    import spark.implicits._
    val keyed = Seq((0L, 10L), (0L, 20L), (0L, 30L),
      (1L, 10L), (1L, 10L)).toDF("file_id", "key")
    val out = Layout.bloomAdvisor(keyed, "file_id", "key",
      mBitsChoices = Seq(1 << 14, 1 << 16), kChoices = Seq(1, 3))
      .collect()
      .map(r => (r.getAs[Long]("file_id"), r.getAs[Int]("m_bits"),
        r.getAs[Int]("k")) ->
        ((r.getAs[Long]("n_keys"), r.getAs[Long]("fpp_ppm"))))
      .toMap
    // q20 replica
    def q20pow(base: Long, e: Long, bits: Int): Long = {
      var acc = 1L << 20; var pw = base
      for (bit <- 0 until bits) {
        if (((e >> bit) & 1) == 1) acc = acc * pw / (1L << 20)
        if (bit < bits - 1) pw = pw * pw / (1L << 20)
      }
      acc
    }
    for ((f, nk) <- Seq((0L, 3L), (1L, 1L));
         m <- Seq(1 << 14, 1 << 16); k <- Seq(1, 3)) {
      val inner = q20pow((1L << 20) - (1L << 20) / m, k * nk, 13)
      val fpp = q20pow((1L << 20) - inner, k, 3) * 1000000L / (1L << 20)
      assert(out((f, m, k)) == ((nk, fpp)),
        s"file $f m $m k $k")
    }
    // 3 keys false-positive more than 1 key at equal config; more
    // bits false-positive less at equal keys
    assert(out((0L, 1 << 14, 1))._2 >= out((1L, 1 << 14, 1))._2)
    assert(out((0L, 1 << 16, 3))._2 <= out((0L, 1 << 14, 3))._2)
    // loud guard: k*n past 2^exponentBits must throw, not mis-math
    val ex = intercept[Exception] {
      Layout.bloomAdvisor(keyed, "file_id", "key",
        mBitsChoices = Seq(1 << 14), kChoices = Seq(7),
        exponentBits = 4).collect()
    }
    assert(ex.getMessage != null)
  }
}
