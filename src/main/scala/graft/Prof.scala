package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main — rewrite freely (see verify skill).
  *
  * Current form: stage decomposition of the `q_vec_neardup`
  * ScaleBench cell (r17 verdict item 2 — honest alpha 0.72–0.80,
  * "owned by the banded-LSH verify join"). Times, in ONE fresh JVM
  * at the k-clone dir (materialized if absent):
  *   scan      — embeddings count (IO baseline)
  *   unit+band — unit normalization + all band hashes, materialized
  *   cands     — band self-join collision count (pre-distinct)
  *   distinct  — deduped candidate pair count
  *   verify    — candidate fetch joins + exact dot + threshold
  *   full      — the registered operator end to end (incl. cap agg)
  * Usage: `tools/run_class.sh graft.Prof <k> [sfDir] [workDir]`.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(4)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val work = args.lift(2).getOrElse("/tmp/graft_scalebench")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    val dir = s"$work/k$k"
    if (!new java.io.File(s"$dir/embeddings.parquet").exists())
      ScaleBench.materialize(spark, sfDir, dir, k)

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(
        f"[prof] $label%-12s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    val embeddings = Tables.embeddings(spark, dir)
    val nVec = t("scan")(embeddings.count())
    System.err.println(s"[prof] n=$nVec")

    // replicate the registered config: 32 bands x 4 bits, refN 2000
    val nBands = 4 * 8
    val bitsPerBand = 4
    val effBits = {
      val extra =
        if (nVec > 2000L)
          (2.0 * math.log(nVec.toDouble / 2000L) / math.log(2.0)).toInt
        else 0
      math.min(bitsPerBand + extra, 48)
    }
    System.err.println(s"[prof] effBits=$effBits planes=${nBands * effBits}")
    val planes = ops.Vector.hyperplanes(nBands * effBits, 64)
    val bandArr = graft.functions.hyperplaneBands(
      col("unit"), planes, nBands, effBits)
    val u = ops.Vector.unitized(embeddings)
      .select(col("vec_id"), col("unit"), bandArr.as("bands"))
      .persist()
    t("unit+band")(u.count())

    val banded = u.select(col("vec_id"),
      posexplode(col("bands")).as(Seq("band_idx", "band_hash")))
    val candsRaw = banded.as("l").join(banded.as("r"),
      col("l.band_idx") === col("r.band_idx") &&
        col("l.band_hash") === col("r.band_hash") &&
        col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("vec_a"), col("r.vec_id").as("vec_b"))
    val nColl = t("cands")(candsRaw.count())
    System.err.println(s"[prof] collisions=$nColl")

    val pairs = candsRaw
      .join(u.select(col("vec_id").as("vec_a"), col("unit").as("ua")),
        "vec_a")
      .join(u.select(col("vec_id").as("vec_b"), col("unit").as("ub")),
        "vec_b")
      .select(col("vec_a"), col("vec_b"),
        ops.Vector.decDot(col("ua"), col("ub")).as("cos_sim"))
      .filter(col("cos_sim") >= 0.4)
      .dropDuplicates("vec_a", "vec_b")
    val nPairs = t("verify")(pairs.count())
    System.err.println(s"[prof] pairs=$nPairs")
    u.unpersist()

    t("full")(ops.Vector.cosineNearDup(embeddings, 0.4, nBands = 32,
      bitsPerBand = 4, maxPairsPerVector = 8, bitsRefN = 2000L)
      .count())
    Caches.releaseAll()
    spark.stop()
  }
}
