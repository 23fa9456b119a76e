package graft
// scratch check main (not part of the library surface)
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
    spark.range(1000).selectExpr("sum(id)").collect()
    def t(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[prof] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    val docs = Tables.documents(spark, sfDir)
    // BPE loop decomposition
    val words = docs
      .select(explode(ops.Text.tokens(col("text"))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .select(col("n"), split(col("word"), "").as("seg"))
    t("word agg")(words.count())
    var seg = words.localCheckpoint(eager = false)
    t("snapshot0 materialize")(seg.count())
    def release(df: org.apache.spark.sql.DataFrame): Unit =
      org.apache.spark.sql.graftx.Bridge.leafRdd(df)
        .foreach(_.unpersist(blocking = false))
    var prev: Option[org.apache.spark.sql.DataFrame] = None
    var round = 1
    var done = false
    while (round <= 6 && !done) {
      val t0 = System.nanoTime()
      val best = seg
        .filter(size(col("seg")) >= 2)
        .select(col("n"),
          explode(zip_with(
            slice(col("seg"), lit(1), size(col("seg")) - 1),
            slice(col("seg"), lit(2), size(col("seg")) - 1),
            (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1)
      val plan0 = System.nanoTime()
      val rows = best.collect()
      // release the superseded round once its successor materialized,
      // like bpeLearnMerges — otherwise later rounds time under
      // accumulated cached blocks
      prev.foreach(release)
      prev = Some(seg)
      println(f"[prof] round$round collect ${(System.nanoTime() - plan0) / 1e9}%6.2fs (build ${(plan0 - t0) / 1e9}%5.2fs)")
      if (rows.isEmpty) { done = true }
      else {
        val (l, r) = (rows.head.getAs[String]("l"), rows.head.getAs[String]("r"))
        val tm = System.nanoTime()
        seg = seg.select(col("n"),
          graft.ops.Text.fuseMerge(col("seg"), l, r).as("seg"))
          .localCheckpoint(eager = false)
        println(f"[prof] round$round fold-build ${(System.nanoTime() - tm) / 1e9}%6.2fs")
        round += 1
      }
    }
    spark.stop()
  }
}
