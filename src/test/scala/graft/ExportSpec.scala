package graft

import org.apache.spark.sql.functions._
import graft.ops.Export

/** Partitioned-export writer behavior: layout, round-trip fidelity,
  * and partition pruning in the read-back scan.
  */
class ExportSpec extends SparkSpec {

  test("partitioned write: lang directories, lossless round trip, pruning") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val out = java.nio.file.Files.createTempDirectory("graft-export")
      .toString
    Export.writePartitioned(docs, out)

    // one directory per lang value
    val langs = docs.select("lang").distinct()
      .collect().map(_.getString(0)).toSet
    val dirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == langs.map(l => s"lang=$l"))

    // lossless round trip (modulo column order — partition column
    // moves to the end on read)
    val back = Export.readPartitioned(spark, out)
    val cols = docs.columns.sorted.toSeq
    val a = docs.select(cols.map(col): _*).orderBy(col("doc_id"))
      .collect().toSeq
    val b = back.select(cols.map(col): _*).orderBy(col("doc_id"))
      .collect().toSeq
    assert(a == b)

    // partition predicate prunes at the source: the filtered scan
    // carries a PartitionFilters entry and returns exactly the
    // per-lang slice
    val one = langs.head
    val pruned = Export.readPartitioned(spark, out, Some(one))
    assert(pruned.count() == docs.filter(col("lang") === one).count())
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains(s"lang"))
  }

  test("manifest: order-independent checksum; any row change moves it") {
    import spark.implicits._
    val a = Seq((1L, "en", "alpha"), (2L, "en", "beta"),
      (3L, "fr", "gamma")).toDF("doc_id", "lang", "text")
    val shuffled = Seq((3L, "fr", "gamma"), (2L, "en", "beta"),
      (1L, "en", "alpha")).toDF("doc_id", "lang", "text")
      .repartition(3)
    def m(df: org.apache.spark.sql.DataFrame) =
      Export.manifest(df, col("lang"), col("doc_id"), col("text"))
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getLong(2), r.getLong(3))).toList
    val base = m(a)
    assert(base == m(shuffled)) // row/partition order never matters
    assert(base.map(_._1) == List("en", "fr"))
    assert(base.head._2 == 2L && base.head._3 == 9L) // alpha+beta
    // a single-character payload change moves that partition's sum
    val tampered = Seq((1L, "en", "alphA"), (2L, "en", "beta"),
      (3L, "fr", "gamma")).toDF("doc_id", "lang", "text")
    val t = m(tampered)
    assert(t.head._4 != base.head._4)
    assert(t(1)._4 == base(1)._4) // untouched partition unchanged
  }

  test("shardManifest: end-byte assignment — shards overflow by at " +
      "most one doc, never split one, never cross partitions") {
    import spark.implicits._
    // budget 10: docs of 4,4,4 -> cum 4,8,12 -> shards 0,0,1;
    // an oversized doc (25) gets its own shard by its end byte
    val docs = Seq(
      (1L, "en", "aaaa"), (2L, "en", "bbbb"), (3L, "en", "cccc"),
      (4L, "en", "d" * 25), (5L, "fr", "ee")
    ).toDF("doc_id", "lang", "text")
    val m = graft.ops.Export.shardManifest(docs, col("lang"),
      col("doc_id"), col("text"), budgetBytes = 10L)
      .collect().map(r => (r.getAs[String]("part"),
        r.getAs[Long]("shard_id")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("shard_bytes"),
          r.getAs[Long]("first_id"), r.getAs[Long]("last_id"))).toMap
    assert(m(("en", 0L)) == ((2L, 8L, 1L, 2L)))
    assert(m(("en", 1L)) == ((1L, 4L, 3L, 3L)))  // cum 12 -> shard 1
    assert(m(("en", 3L)) == ((1L, 25L, 4L, 4L))) // cum 37 -> shard 3
    assert(m(("fr", 0L)) == ((1L, 2L, 5L, 5L)))  // partition isolated
  }
}
