package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Round-13 optimization evidence: dump `explain("formatted")` of named
  * graded queries to `<outDir>/<name>_<tag>.txt` in ONE session — the
  * before/after plan files the optimization round commits under
  * `plans/r13/`. Usage:
  *   runMain graft.tools.PlanSnap <outDir> <tag> <sfDir> <name> [name...]
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val sfDir = args(2)
    val names = args.drop(3)
    Files.createDirectories(Paths.get(outDir))
    val spark = SparkSession.builder()
      .master("local[32,2]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val txt =
        try {
          val df = SparkEntry.queries(n)(spark, sfDir)
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        } catch { case e: Throwable => s"ERROR building $n: ${e.getMessage}" }
      Files.write(Paths.get(outDir, s"${n}_$tag.txt"),
        txt.getBytes("UTF-8"))
      println(s"[plansnap] wrote $n ($tag)")
    }
    spark.stop()
  }
}
