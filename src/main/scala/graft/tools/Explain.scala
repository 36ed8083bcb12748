package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev utility: print the formatted physical plan (and optionally time)
  * for one graded query — used to audit pushdown / broadcast / codegen
  * before accepting an operator as done. */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8,2]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    val t0 = System.nanoTime()
    val n = df.count()
    println(s"rows=$n time=${(System.nanoTime() - t0) / 1e9}s")
    spark.stop()
  }
}
