package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main — rewrite freely (see verify skill).
  *
  * Current form: pass decomposition of `q_vec_trustworthiness`
  * (round-18 optimization — 5.1 s in the baseline bench, #2 entry).
  * Usage: `tools/run_class.sh graft.Prof [sfDir]`.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(
        f"[prof] $label%-12s ${(System.nanoTime() - t0) / 1e9}%8.2fs  -> $r")
      r
    }

    val docs = Tables.documents(spark, sfDir)
    t("docs")(docs.count())
    val inst = graft.Caches.track("text", docs
      .select(col("doc_id"), ops.Text.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("toks")) - 2),
          i => struct(
            element_at(col("toks"), i + 1).as("v"),
            element_at(col("toks"), i + 2).as("w")))).as("bg"))
      .select(col("doc_id"), col("bg.v").as("v"), col("bg.w").as("w"))
      .groupBy(col("doc_id"), col("v"), col("w"))
      .agg(count(lit(1)).as("ct")))
    t("inst")(inst.count())
    val big = graft.Caches.track("text",
      inst.groupBy(col("v"), col("w")).agg(sum(col("ct")).as("c_vw")))
    t("big")(big.count())
    val cv = big.groupBy(col("v")).agg(sum(col("c_vw")).as("c_v"))
    val cw = big.groupBy(col("w")).agg(sum(col("c_vw")).as("c_w"))
    val nt = big.agg(sum(col("c_vw")).as("n_big"))
    val model = big.join(cv, "v").join(cw, "w")
      .crossJoin(broadcast(nt))
      .select(col("v"), col("w"),
        greatest(expr("700000 * c_vw div c_v + 300000 * c_w div n_big"),
          lit(1L)).as("p_ppm"))
    t("model")(model.count())
    val scoredJ = inst.join(model, Seq("v", "w"))
      .groupBy(col("doc_id")).agg(sum(col("ct")).as("nb"))
    t("scoreJoin")(scoredJ.count())
    Caches.releaseAll()
    t("fullBce")(SparkEntry.queries("q_text_bigram_ce")(spark, sfDir).count())
    Caches.releaseAll()
    t("fullBce2")(SparkEntry.queries("q_text_bigram_ce")(spark, sfDir).count())
    Caches.releaseAll()
    t("fullSem")(SparkEntry.queries("q_text_prepare_semantic")(spark, sfDir).count())
    Caches.releaseAll()
    t("fullSem2")(SparkEntry.queries("q_text_prepare_semantic")(spark, sfDir).count())
    Caches.releaseAll()
    spark.stop()
  }
}
