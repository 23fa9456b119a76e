package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling main — rewrite freely (see verify skill).
  *
  * Current form: isolated prober for the `cache:vec:ivfpq_index`
  * ScaleBench cell (r13 verdict item 2 — k4 > k10 inversion,
  * 2 rounds running). Per invocation (ONE fresh JVM, one sample —
  * run it N times via tools/run_class.sh for N isolated samples):
  * materializes the k-clone dir if absent, then times the fit and
  * the index encode separately so the slow phase is attributable.
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
    if (!new java.io.File(s"$dir/embeddings.parquet").exists()) {
      System.err.println(s"[prof] materializing k=$k at $dir")
      ScaleBench.materialize(spark, sfDir, dir, k)
    }
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    val emb = Tables.embeddings(spark, dir)
    val model = timed(s"fitIvfPq k=$k")(
      ops.Vector.fitIvfPq(emb, nLists = 16, m = 16, ksub = 16))
    val n = timed(s"ivfPqIndex.count k=$k")(
      ops.Vector.ivfPqIndex(emb, model).count())
    println(s"[prof] index rows=$n")
    spark.stop()
  }
}
