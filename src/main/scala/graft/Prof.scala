package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Vector
// scratch profiling main (not part of the library surface)
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): Unit = {
      val t0 = System.nanoTime; val r = f
      println(f"TIME $label ${(System.nanoTime - t0) / 1e9}%.2f  ($r)")
    }
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.1")
    // differential: codegen dot vs HOF fold must agree bitwise
    val diff = emb.as("l").crossJoin(emb.as("r")).limit(50000)
      .select(
        Vector.decDot(col("l.embedding"), col("r.embedding")).as("fast"),
        Vector.decDotHof(col("l.embedding"), col("r.embedding")).as("slow"))
      .filter(col("fast") =!= col("slow") ||
        (col("fast").isNull =!= col("slow").isNull))
    time("dot_differential_mismatches")(diff.count())
    time("neardup")(Vector.cosineNearDup(emb, 0.5).count())
    time("neardup2")(Vector.cosineNearDup(emb, 0.5).count())
  }
}
