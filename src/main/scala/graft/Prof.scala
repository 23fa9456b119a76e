package graft
// scratch check main (not part of the library surface)
object Prof {
  def main(args: Array[String]): Unit = {
    val per = Seq(
      "relational" -> ops.RelationalQueries.queries.keySet,
      "demux" -> ops.DemuxQueries.queries.keySet,
      "cdc" -> ops.CdcQueries.queries.keySet,
      "text" -> ops.TextQueries.queries.keySet,
      "vector" -> ops.VectorQueries.queries.keySet,
      "mm" -> ops.MultimodalQueries.queries.keySet)
    val sum = per.map(_._2.size).sum
    val merged = SparkEntry.queries.size
    println(s"per-registry total=$sum merged=$merged " +
      (if (sum == merged) "OK no collisions" else "COLLISION!"))
    val orphanOracles =
      SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    println(s"oracles without queries: $orphanOracles")
    println(s"queries=${merged} oracles=${SparkEntry.oracleSql.size}")
  }
}
