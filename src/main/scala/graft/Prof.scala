package graft
// scratch check main (not part of the library surface)
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures banded sign-LSH recall margins for q_vec_neardup trim
  * analysis: for every TRUE pair (exact cosine >= threshold), how
  * many of the 32 4-bit bands collide — and therefore whether a
  * 16-band prefix config would still have corpus recall 1.
  * hyperplanes() is deterministic, so the 16x4 config's bands are
  * exactly bands 0..15 of the 32x4 config.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val dir = s"/root/testdata/$sf"
      val embs = Tables.embeddings(spark, dir)
      val exact = ops.Vector.exactCosinePairs(embs, 0.4)
        .select(col("vec_a"), col("vec_b"), col("cos_sim"))
      val banded = ops.Vector.cosineNearDup(embs, 0.4,
        nBands = 32, bitsPerBand = 4)
      // per-pair band hashes at 32x4 (recompute the band array the
      // way cosineNearDup does, via its public candidate surface:
      // instead reuse signatures through a 1-band-at-a-time probe is
      // costly — just join the banded result for recall, and compute
      // prefix-recall by running the 16x4 config directly)
      val b16 = ops.Vector.cosineNearDup(embs, 0.4,
        nBands = 16, bitsPerBand = 4)
      val nExact = exact.count()
      val miss32 = exact.join(banded.select("vec_a", "vec_b"),
        Seq("vec_a", "vec_b"), "left_anti").count()
      val miss16 = exact.join(b16.select("vec_a", "vec_b"),
        Seq("vec_a", "vec_b"), "left_anti")
      val m16 = miss16.collect()
      println(s"[prof] $sf exact_pairs=$nExact " +
        s"miss@32x4=$miss32 miss@16x4=${m16.length}")
      m16.take(10).foreach(r => println(s"[prof]   missed16: $r"))
      graft.Caches.releaseAll()
    }
    spark.stop()
  }
}
