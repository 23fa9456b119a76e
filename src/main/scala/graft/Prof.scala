package graft
// scratch check main (not part of the library surface)
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val embs = Tables.embeddings(spark, sfDir)
    val n = embs.count()
    println(s"[prof] corpus n=$n")
    val model = ops.Vector.fitIvfPq(embs)
    val index = ops.Vector.ivfPqIndex(embs, model).persist()
    println(s"[prof] index rows=${index.count()}")
    index.groupBy("list_id").count().orderBy("list_id").show(20)
    for (qid <- Seq(0L, 7L, 123L)) {
      val brute = ops.Vector.bruteForceTopK(embs, qid, 10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      for (nProbe <- Seq(4, 8, 16); rescoreK <- Seq(50, 100)) {
        val got = ops.Vector.ivfPqTopK(embs, model, qid, 10,
          nProbe = nProbe, rescoreK = rescoreK,
          precomputedIndex = Some(index))
          .select("vec_id").collect().map(_.getLong(0)).toSet
        println(f"[prof] q=$qid nProbe=$nProbe rescoreK=$rescoreK " +
          f"recall@10=${got.intersect(brute).size / 10.0}%.2f")
      }
    }
    spark.stop()
  }
}
