package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.Window

/** Scratch profiling main — rewrite freely (see verify skill). */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, d).queryExecution.optimizedPlan
        val globals = plan.collect {
          case w: Window if w.partitionSpec.isEmpty => w
        }
        if (globals.nonEmpty)
          println(s"GLOBALWIN $name n=${globals.size}")
      } catch { case e: Throwable =>
        println(s"PLANERR $name ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
