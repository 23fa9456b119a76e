package graft
// scratch check main (not part of the library surface)
import org.apache.spark.sql.SparkSession

object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // banded sign-LSH recall vs the exact n² twin, across configs:
    // find the config whose candidate set equals the exact pair set
    // on the test corpora (→ oracle-checkable q_vec_neardup)
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val embs = Tables.embeddings(spark, dir)
      val exact = ops.Vector.exactCosinePairs(embs, 0.4)
        .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
      for ((nb, bpb) <- Seq((16, 5), (24, 4), (32, 3), (32, 4), (48, 3))) {
        val t0 = System.nanoTime()
        val got = ops.Vector.cosineNearDup(embs, 0.4, nBands = nb,
          bitsPerBand = bpb)
          .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[prof] $dir nb=$nb bpb=$bpb found=${got.size}/${exact.size} " +
          f"missed=${exact.diff(got).size} extra=${got.diff(exact).size} $dt%6.2fs")
        graft.Caches.releaseAll()
      }
    }
    spark.stop()
  }
}
