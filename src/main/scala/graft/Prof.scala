package graft
// scratch check main (not part of the library surface)
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Vector => Vec}

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
    val e = Tables.embeddings(spark, sfDir)
      .withColumn("list_id", col("label"))
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      System.err.println(f"[prof] $label%-28s ${(System.nanoTime()-t0)/1e9}%6.2fs  n=$n")
    }
    val u = Vec.semanticSignaturesAssigned(e).persist()
    time("unitize+persist")(u.count())
    val joined = u.as("l").join(u.as("r"),
        col("l.list_id") === col("r.list_id") &&
          col("l.vec_id") =!= col("r.vec_id"))
    time("join only (count)")(joined.count())
    val dots = joined.select(col("l.vec_id").as("vec_id"),
        col("r.vec_id").as("nbr_id"),
        Vec.decDot(col("l.unit"), col("r.unit")).as("cos_sim"))
      .filter(!isnan(col("cos_sim")))
    time("join+dots (agg sum)")(
      dots.agg(sum(col("cos_sim"))).collect().length.toLong)
    time("knnGraphAssigned cold-ish")(
      Vec.knnGraphAssigned(e, 3).count())
    time("knnGraphAssigned again")(
      Vec.knnGraphAssigned(e, 3).count())
    spark.stop()
  }
}
