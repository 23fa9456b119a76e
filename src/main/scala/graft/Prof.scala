package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Cdc, CdcQueries}
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
    val d = "/root/testdata/sf0.1"
    val ev = Tables.events(spark, d).repartition(col("event_id"))
    val raw = CdcQueries.maxwellLines(ev)
    time("maxwell_lines")(raw.select(sum(length(col("value")))).collect().head)
    val norm = Cdc.normalizeOps(Cdc.parse(raw.select("value")))
    time("normalized")(norm.count())
    time("normalized2")(norm.count())
    time("q_lww_full")(SparkEntry.queries("q_cdc_dim_lww")(spark, d).count())
    time("q_lww_full2")(SparkEntry.queries("q_cdc_dim_lww")(spark, d).count())
  }
}
