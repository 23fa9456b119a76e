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
    */
  def decDot(a: Column, b: Column): Column =
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

  /** Unit-normalized embedding as array<double> — computed once per
    * vector so pair comparisons are a single dot product.
    */
  def normalized(emb: Column): Column = {
    val n = decNorm(emb)
    transform(emb, x => x.cast("double") / n)
  }

  /** Embedding-cosine near-duplicate pairs via LSH buckets: pairs
    * sharing a bucket with cosine above threshold. Never n² — only
    * same-bucket pairs are compared, and vectors are pre-normalized
    * map-side so each pair costs one dot product, not three folds.
    * Bucket width (nPlanes) controls the candidate volume: 16 bits →
    * ~64k buckets, so even 10⁸ vectors yield tractable per-bucket
    * pair counts; identical/near-identical vectors always collide.
    */
  def cosineNearDup(
      embeddings: DataFrame,
      threshold: Double,
      nPlanes: Int = 16,
      dim: Int = 64
  ): DataFrame = {
    val planes = hyperplanes(nPlanes, dim)
    val b = embeddings.select(
      col("vec_id"),
      normalized(col("embedding")).as("unit"),
      lshBucket(col("embedding"), planes).as("bucket"))
    // identical legs → Spark reuses the shuffle exchange (one scan +
    // one bucket/normalize computation, not two)
    val joined = b.as("l").join(b.as("r"),
      col("l.bucket") === col("r.bucket") &&
        col("l.vec_id") < col("r.vec_id"))
    joined.select(
      col("l.vec_id").as("vec_a"),
      col("r.vec_id").as("vec_b"),
      decDot(col("l.unit"), col("r.unit")).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }
}
