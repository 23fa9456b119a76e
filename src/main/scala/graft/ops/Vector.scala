package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`, dim 64)
  * — north-star operators.
  *
  * Design for scale:
  *  - all per-vector math (dot, norm, cosine) is higher-order-function
  *    column expressions evaluated in the scan stage — no explode, no
  *    shuffle, no UDF;
  *  - brute-force top-k = one map stage + TakeOrdered (the correct
  *    baseline when the query set is small);
  *  - the scale path is random-hyperplane LSH bucketing: candidates
  *    shuffle once on the bucket key, then per-bucket ranking — the
  *    same banding shape as MinHash dedup (Text.minhashCandidates).
  *
  * Exact-decimal accumulation (`decDot`) keeps results bitwise
  * reproducible across partitionings — required by the oracle and a
  * property worth having at 100 TB anyway.
  */
object Vector {

  /** Elementwise product sum as a sequential double fold in list
    * order. Per-vector math never crosses rows, so the fold order is
    * fixed by the array — deterministic under any partitioning, and
    * bitwise-identical to a single-threaded SUM over the unnested
    * list (the DuckDB oracle's shape).
    *
    * Backed by the native codegen [[graft.functions.ArrayDotProduct]];
    * `decDotHof` is the equivalent higher-order-function fold, kept as
    * the differential-test reference (interpreted, ~50× slower in the
    * pairwise joins).
    */
  def decDot(a: Column, b: Column): Column =
    graft.functions.arrayDot(a, b)

  def decDotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v
    )

  def decNorm(a: Column): Column = sqrt(decDot(a, a))

  def cosine(a: Column, b: Column): Column =
    decDot(a, b) / (decNorm(a) * decNorm(b))

  /** Brute-force cosine top-k against the vector with id `queryId`:
    * 1-row broadcast cross join + map-side cosine + TakeOrdered.
    */
  def bruteForceTopK(
      embeddings: DataFrame,
      queryId: Long,
      k: Int
  ): DataFrame = {
    val q = embeddings
      .filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"))
    embeddings
      .filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(
        col("vec_id"),
        col("label"),
        cosine(col("embedding"), col("q_emb")).as("cos_sim")
      )
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Per-label centroid components via posexplode + exact decimal
    * mean — elementwise array aggregation expressed relationally.
    *
    * This sum DOES cross rows, so fold order is partition-dependent;
    * exactness comes from summing decimals. Floats are converted via
    * their shortest string representation (Ryu — identical in Spark
    * and DuckDB, and ≤9 significant digits, so the decimal parse is
    * exact), making the sum order-independent and bitwise-stable.
    */
  def labelCentroids(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("label"),
        posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(
        // Exposed as (exact sum, count) — the mergeable form (mean =
        // sum/n at the consumer). Keeping the decimal avoids engines'
        // differing decimal→double conversions.
        sum(col("x").cast("string").cast("decimal(38,18)"))
          .as("sum_val"),
        count(lit(1)).as("n_vecs")
      )

  /** Deterministic pseudo-random hyperplanes for sign-LSH: component
    * j of plane p derives from a splitmix-style integer mix of
    * (seed, p, j) — reproducible across runs/languages with no RNG
    * state.
    */
  private def mix(z0: Long): Double = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    (z.toDouble / Long.MaxValue.toDouble)
  }

  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L)
      : Array[Array[Double]] =
    Array.tabulate(nPlanes, dim)((p, j) =>
      mix(seed * 1000003L + p * 131L + j))

  /** Sign-LSH bucket id: one bit per hyperplane (sign of the dot
    * product), packed into a long. Map-side only.
    */
  def lshBucket(emb: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (plane, i) =>
      val planeCol = array(plane.map(lit(_)): _*)
      when(decDot(emb, planeCol) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** ANN via sign-LSH: bucket every vector (map-side), then rank
    * candidates within the query vector's buckets only. With B-bit
    * buckets, compares shrink ~2^B-fold vs brute force; recall is
    * tunable by B and by probing neighboring buckets.
    */
  def annTopK(
      embeddings: DataFrame,
      queryId: Long,
      k: Int,
      nPlanes: Int = 8,
      dim: Int = 64
  ): DataFrame = {
    val planes = hyperplanes(nPlanes, dim)
    val bucketed = embeddings
      .withColumn("bucket", lshBucket(col("embedding"), planes))
    val q = bucketed
      .filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"),
        col("bucket").as("q_bucket"))
    bucketed
      .filter(col("vec_id") =!= queryId)
      .join(broadcast(q), col("bucket") === col("q_bucket"))
      .select(
        col("vec_id"), col("label"),
        cosine(col("embedding"), col("q_emb")).as("cos_sim")
      )
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** IVF(-flat) approximate nearest neighbor — the other scale path
    * next to sign-LSH: a KMeans coarse quantizer (trained once,
    * deterministic seed) partitions vectors into `nLists` inverted
    * lists; a query probes only its `nProbe` nearest centroids and
    * ranks by exact cosine inside them. At 10⁸+ vectors the probe
    * fraction (nProbe/nLists) is the speedup; recall is tuned by
    * nProbe. Training is a one-time offline job at scale — here it
    * runs inline for the registered query.
    */
  def ivfTopK(
      embeddings: DataFrame,
      queryId: Long,
      k: Int,
      nLists: Int = 16,
      nProbe: Int = 4
  ): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    // cache: KMeans iterates over its input; uncached it would re-run
    // the scan + conversion every iteration
    val vecs = embeddings
      .withColumn("features", array_to_vector(col("embedding")))
      .persist()
    val model = new KMeans()
      .setK(nLists).setSeed(42L).setMaxIter(5)
      .fit(vecs)
    val assigned = model.transform(vecs)
      .select(col("vec_id"), col("label"), col("embedding"),
        col("prediction").as("list_id"))
    val q = assigned.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb")).head().getSeq[Float](0)
    val qCol  = array(q.map(lit(_)): _*)
    val qArr  = q.map(_.toDouble).toArray
    // nProbe nearest centroids to the query vector (centroid table is
    // tiny by construction — driver-side math is fine at any scale)
    val probed = model.clusterCenters.zipWithIndex
      .map { case (c, i) =>
        i -> c.toArray.zip(qArr).map { case (a, b) =>
          (a - b) * (a - b) }.sum
      }
      .sortBy(_._2).take(nProbe).map(_._1)
    assigned
      .filter(col("list_id").isin(probed: _*) && col("vec_id") =!= queryId)
      .select(col("vec_id"), col("label"),
        cosine(col("embedding"), qCol).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** vec_id + unit-normalized embedding, staged so the norm is
    * computed once per row (an inlined norm inside the transform
    * lambda would be re-evaluated per element — HOFs are excluded
    * from subexpression elimination).
    */
  def unitized(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"), col("embedding"),
        decNorm(col("embedding")).as("nrm"))
      .select(col("vec_id"),
        transform(col("embedding"),
          x => x.cast("double") / col("nrm")).as("unit"))

  /** Embedding-cosine near-duplicate pairs via BANDED sign-LSH
    * (minhash-banding shape): `nBands` independent `bitsPerBand`-bit
    * buckets per vector; any shared band makes a candidate pair,
    * confirmed by exact cosine. A single wide bucket has vanishing
    * recall at moderate thresholds (16 bits @ cos 0.6 → p ≈ 0.7^16 ≈
    * 0.003); banding is the standard fix — recall here is
    * 1-(1-p_bit^bits)^bands ≈ 0.9 at cos 0.6 with 8×4. Never n²:
    * only same-band-bucket pairs are compared, each pair one codegen
    * dot product; bands/bits tune candidate volume vs recall at
    * scale.
    */
  def cosineNearDup(
      embeddings: DataFrame,
      threshold: Double,
      nBands: Int = 8,
      bitsPerBand: Int = 4,
      dim: Int = 64
  ): DataFrame = {
    val planes = hyperplanes(nBands * bitsPerBand, dim)
    val bandArr = array((0 until nBands).map { bnd =>
      (0 until bitsPerBand).map { bit =>
        val p = planes(bnd * bitsPerBand + bit)
        when(decDot(col("unit"), array(p.map(lit(_)): _*)) >= 0,
          lit(1L << bit)).otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)
    // Persist (tiny: id + unit + band keys) so the self-join legs
    // don't re-run normalization + 32 plane dots.
    val banded = unitized(embeddings)
      .select(col("vec_id"), col("unit"),
        posexplode(bandArr).as(Seq("band_idx", "band_hash")))
      .persist()
    banded.as("l").join(banded.as("r"),
      col("l.band_idx") === col("r.band_idx") &&
        col("l.band_hash") === col("r.band_hash") &&
        col("l.vec_id") < col("r.vec_id"))
      .select(
        col("l.vec_id").as("vec_a"),
        col("r.vec_id").as("vec_b"),
        decDot(col("l.unit"), col("r.unit")).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      // distinct on scalars, after the cheap dot: a pair colliding in
      // k bands yields k identical (vec_a, vec_b, cos_sim) rows
      .distinct()
  }
}
