package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main — rewrite freely (see verify skill). */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val n = args.headOption.map(_.toInt).getOrElse(10000)
    // path graph 0-1-2-...-n: worst-case diameter
    val pairs = (0L until n.toLong - 1)
      .map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val docs = (0L until n.toLong).toDF("doc_id")
    val t0 = System.nanoTime()
    val out = ops.Text.dupClusters(docs, pairs, maxIter = 25)
    val bad = out.filter(col("cluster") =!= 0L).count()
    println(s"PATH n=$n wrong=$bad t=${(System.nanoTime - t0) / 1e9}s")
    spark.stop()
  }
}
