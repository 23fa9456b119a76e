package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: executes every registered query against
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line (driver contract) plus
  * per-query progress on stderr for diagnosability.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // driver contract: bench runs local[32]; default to all cores
    // rather than a fixed small number
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
    // Warm the session (codegen compiler, parquet footer reads, shuffle
    // machinery) so the first timed query doesn't absorb JVM startup.
    spark.range(1000).selectExpr("sum(id)").collect()
    SparkEntry.entry(spark).count()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        // Spark's ContextCleaner is GC-driven: with a large heap, GC
        // almost never fires, so broadcast blocks and shuffle state
        // from earlier queries pile up and skew later timings. Nudge
        // collection between queries, outside the timed region.
        System.gc()
        val t0 = System.nanoTime()
        val n =
          try fn(spark, sfDir).count()
          catch { case _: Throwable => -1L }
        val dt = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[bench] $name%-28s $dt%8.2fs  rows=$n")
        name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
