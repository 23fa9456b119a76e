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
    for (w <- Seq(2)) {
      val ord = graft.Caches.track("text", ops.Text.orderedShinglesW(docs, w))
      t(s"ord_w$w")(ord.count())
      val orderedC = ord.withColumn("plen",
        (col("n") - ceil(lit(0.5) * col("n")) + 1).cast("int"))
      val prefix = orderedC.select(col("doc_id"), col("n"),
        explode(slice(col("toks_ord"), lit(1), col("plen"))).as("tok"))
      t("prefix")(prefix.count())
      val candRaw = prefix.as("a").join(prefix.as("b"), "tok")
        .filter(col("a.doc_id") < col("b.doc_id") &&
          least(col("a.n"), col("b.n")).cast("double") >=
            lit(0.5) * greatest(col("a.n"), col("b.n")))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      t("candRaw")(candRaw.count())
      val cand = candRaw.dropDuplicates("doc_a", "doc_b")
      t("cand")(cand.count())
      val sets = orderedC.select(col("doc_id"), col("n"), col("toks_ord"))
      val verified = cand
        .join(sets.select(col("doc_id").as("doc_a"), col("n").as("na"), col("toks_ord").as("ta")), "doc_a")
        .join(sets.select(col("doc_id").as("doc_b"), col("n").as("nb"), col("toks_ord").as("tb")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          size(array_intersect(col("ta"), col("tb"))).as("inter"), col("na"), col("nb"))
        .select(col("doc_a"), col("doc_b"),
          (col("inter").cast("double") / (col("na") + col("nb") - col("inter"))).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
      t("verify")(verified.count())
      val candNew = ops.Text.jaccardPairsOverOrdered(ord, 0.5)
      t("newPairs")(candNew.count())
      t("newPairs2")(candNew.count())
    }
    Caches.releaseAll()
    t("full")(ops.Text.shingleWidthCurve(docs).count())
    Caches.releaseAll()
    t("full2")(ops.Text.shingleWidthCurve(docs).count())
    Caches.releaseAll()
    spark.stop()
  }
}
