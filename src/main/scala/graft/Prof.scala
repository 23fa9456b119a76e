package graft
// scratch check main (not part of the library surface)
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val vecs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
      .sortBy(_._1)
    val store = new streaming.SemanticIngestPipeline.MemoryStore(spark)
    var admitted = 0L
    val batches = vecs.grouped(500).toSeq
    batches.zipWithIndex.foreach { case (b, bi) =>
      val t0 = System.nanoTime()
      streaming.SemanticIngestPipeline.processBatch(
        b.toSeq.toDF("vec_id", "embedding", "list_id"), store, identity,
        df => admitted += df.count(), threshold = 0.6)
      System.err.println(f"[prof] batch $bi ${(System.nanoTime()-t0)/1e9}%6.2fs")
    }
    System.err.println(s"[prof] admitted=$admitted")
    spark.stop()
  }
}
