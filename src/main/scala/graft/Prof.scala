package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Text
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
    spark.range(1000).selectExpr("sum(id)").collect()
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    time("docs_count")(docs.count())
    val sh = Text.docShingles(docs)
    time("shingles")(sh.select(sum(size(col("sh")))).collect().head)
    time("shingles2")(sh.select(sum(size(col("sh")))).collect().head)
    val sigs = sh.select(col("doc_id"), Text.minhashSignature(col("sh")).as("sig"))
    time("sigs")(sigs.select(max(element_at(col("sig"), 1))).collect().head)
    val banded = sigs.select(col("doc_id"), col("sig"),
      posexplode(array((0 until Text.LshBands).map { b =>
        xxhash64(lit(b), slice(col("sig"), b * Text.LshRows + 1, Text.LshRows))
      }: _*)).as(Seq("band_idx", "band_hash")))
    time("banded")(banded.count())
    val joined = banded.as("l").join(banded.as("r"),
      col("l.band_idx") === col("r.band_idx") &&
        col("l.band_hash") === col("r.band_hash") &&
        col("l.doc_id") < col("r.doc_id"))
    time("join_count")(joined.count())
    time("full")(Text.minhashCandidates(docs, 0.2).count())
    time("full2")(Text.minhashCandidates(docs, 0.2).count())
  }
}
