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
    // stage decomposition of the pair-graph build
    val toks = docs
      .repartition(col("doc_id"))
      .select(col("doc_id"), ops.Text.tokens(col("text")).as("raw_toks"), col("text"))
      .filter(size(col("raw_toks")) >= 3)
      .select(col("doc_id"),
        array_distinct(transform(
          graft.functions.tokenShingles(col("text"), 3),
          s => xxhash64(s))).as("toks"))
      .persist()
    t("toks (shingle+hash+distinct)")(toks.count())
    val df_ = toks.select(explode(col("toks")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    t("df agg")(df_.count())
    val ordered = toks
      .select(col("doc_id"), size(col("toks")).as("n"), explode(col("toks")).as("tok"))
      .join(df_, "tok")
      .groupBy(col("doc_id"), col("n"))
      .agg(array_sort(collect_list(struct(col("df"), col("tok")))).as("ord"))
      .select(col("doc_id"), col("n"),
        transform(col("ord"), _.getField("tok")).as("toks_ord"),
        (col("n") - ceil(lit(0.5) * col("n")) + 1).cast("int").as("plen"))
      .persist()
    t("ordered (join+collect+sort)")(ordered.count())
    val prefix = ordered.select(col("doc_id"),
      explode(slice(col("toks_ord"), lit(1), col("plen"))).as("tok"))
    val cand = prefix.as("a").join(prefix.as("b"), "tok")
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    t("candidates")(cand.count())
    val prefixN = ordered.select(col("doc_id"), col("n"),
      explode(slice(col("toks_ord"), lit(1), col("plen"))).as("tok"))
    val candLen = prefixN.as("a").join(prefixN.as("b"), "tok")
      .filter(col("a.doc_id") < col("b.doc_id") &&
        least(col("a.n"), col("b.n")).cast("double") >=
          lit(0.5) * greatest(col("a.n"), col("b.n")))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    t("candidates+lenfilter")(candLen.count())
    t("full jaccardExactPairs")(
      ops.Text.jaccardExactPairs(docs, 0.5).count())
    val pairs = graft.Caches.persisted("text", ("jac", spark, sfDir))(
      ops.Text.jaccardExactPairs(docs, 0.5))
    t("pairs persist+count")(pairs.count())
    t("dupClusters (pairs warm)")(
      ops.Text.dupClusters(docs, pairs).count())
    // round-by-round replica of the dupClusters loop
    locally {
      val edges = pairs
        .select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
        .persist()
      t("edges persist")(edges.count())
      var labels = edges.select(col("src").as("doc_id")).distinct()
        .select(col("doc_id"), col("doc_id").as("cluster"))
        .localCheckpoint(eager = false)
      t("round0 snapshot")(labels.count())
      var it = 0
      var converged = false
      while (!converged && it < 20) {
        val nbrMin = edges
          .join(labels, edges("src") === labels("doc_id"))
          .groupBy(col("dst")).agg(min(col("cluster")).as("nbr_min"))
        val next = labels
          .join(nbrMin, labels("doc_id") === nbrMin("dst"), "left")
          .select(labels("doc_id"),
            least(labels("cluster"),
              coalesce(col("nbr_min"), labels("cluster"))).as("cluster"),
            (col("nbr_min") < labels("cluster")).as("changed"))
          .localCheckpoint(eager = false)
        var changed = 0L
        t(s"round${it + 1}") { changed = next.filter(col("changed")).count(); changed }
        converged = changed == 0L
        labels = next
        it += 1
      }
      t("anti-join singletons")(
        docs.select(col("doc_id"))
          .join(labels.select(col("doc_id")), Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("doc_id").as("cluster"))
          .union(labels.select(col("doc_id"), col("cluster"))).count())
    }
    spark.stop()
  }
}
