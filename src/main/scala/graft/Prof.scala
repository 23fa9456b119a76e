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
    def t(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[prof] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    // decompose one ingestion-gate batch: 1250-doc batch vs a
    // 3750-doc seen store, static frames (no streaming machinery)
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val batch = docs.filter(col("doc_id") % 4 === 3).persist()
    val seen = docs.filter(col("doc_id") % 4 =!= 3).persist()
    t("materialize inputs")(batch.count() + seen.count())
    val store = new streaming.IngestPipeline.MemoryStore(spark)
    t("seed store (hashes+sigs)") {
      store.append(ops.Text.seenHashes(seen),
        ops.Text.nearDupSignatures(seen))
      store.sigs.count()
    }
    // warm second run to split codegen/planning from steady state
    for (round <- 1 to 3) {
      var admitted = 0L
      t(s"processBatch round$round") {
        streaming.IngestPipeline.processBatch(batch, store,
          df => admitted += df.count())
        admitted
      }
    }
    // stage-level: where does one batch go?
    t("exact gate only") {
      ops.Text.incrementalDedupHashes(batch, store.hashes).count()
    }
    t("batch signatures only") {
      ops.Text.nearDupSignatures(batch).count()
    }
    val bs = ops.Text.nearDupSignatures(batch).persist()
    t("batch sigs materialize")(bs.count())
    t("band join + verify vs store") {
      ops.Text.incrementalNearDupSigs(bs, store.sigs).count()
    }
    spark.stop()
  }
}
