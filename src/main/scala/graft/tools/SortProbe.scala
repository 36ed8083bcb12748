package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.CsvCodec

/** Dev probe: decompose the RefBench sort-by-id pipeline into stages to
  * find the bottleneck (scan / key extraction / range sort / sink). */
object SortProbe {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/tmp/graft_refbench/source"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(s"PROBE $tag: ${(System.nanoTime() - t0) / 1e9}s")
    }
    val base = spark.read.parquet(src)
    val extracted = base.withColumn("__key", CsvCodec.fieldAs(col("line"), 0, LongType))
    timed("count_only")(base.count(): Unit)
    timed("extract_write")(extracted.select("line")
      .write.mode("overwrite").parquet("/tmp/graft_probe_w1"))
    timed("extract_sort_write")(extracted.orderBy(col("__key")).select("line")
      .write.mode("overwrite").parquet("/tmp/graft_probe_w2"))
    timed("extract_sortpart_write")(extracted
      .repartitionByRange(32, col("__key")).sortWithinPartitions(col("__key"))
      .select("line")
      .write.mode("overwrite").parquet("/tmp/graft_probe_w3"))
    spark.stop()
  }
}
