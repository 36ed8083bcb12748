package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType}

import graft.functions.CsvCodec
import graft.operators.Sorting
import graft.sources.{CsvLineSource, KafkaSource, ParquetSink, RecordGenerator}

/** EP2 through the file transport: CSV lines in → key extraction →
  * total sort → sink — the reference pipeline with Parquet/text standing
  * in for the Kafka topic (connector jar absent in this offline build,
  * which KafkaSource.available reports). */
class ConnectorsSpec extends SparkSpec {
  import spark.implicits._

  test("CSV line file source -> parse -> sort -> parquet sink round trip") {
    val in = Files.createTempDirectory("graft-lines").toString
    val out = Files.createTempDirectory("graft-sorted").toString
    RecordGenerator.csvLines(spark, 1000, seed = 5)
      .select("line").write.mode("overwrite").text(in)

    val lines = CsvLineSource(in).load(spark)
    val decoded = CsvCodec.decode(lines, col("line"), Seq(
      "id" -> IntegerType, "name" -> StringType,
      "address" -> StringType, "continent" -> StringType))
    ParquetSink(out).save(
      Sorting.totalSort(decoded, col("id"), col("name")).select("line"))

    val sorted = spark.read.parquet(out)
    assert(sorted.count() === 1000)
    // payload passthrough: identical multiset of raw lines
    val inBag = lines.as[String].collect().sorted
    val outBag = sorted.as[String].collect().sorted
    assert(inBag.sameElements(outBag))
  }

  test("MemoryStream-backed StreamRecordSource drives sortedCopy — non-file transport") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.sources.{StreamRecordSource, WrappedStreamSource}
    import graft.streaming.Streaming

    val ms = MemoryStream[(Int, String)](spark)
    ms.addData((3, "cc"), (1, "aa"), (2, "bb"), (5, "ee"), (4, "dd"))
    val src: StreamRecordSource =
      WrappedStreamSource(ms.toDF().toDF("id", "name"))

    val out = Files.createTempDirectory("graft-ms-out").toString
    val ckpt = Files.createTempDirectory("graft-ms-ckpt").toString
    val q = Streaming.sortedCopyStream(src.loadStream(spark), out, ckpt, Seq("id"))
    q.awaitTermination()

    val got = spark.read.parquet(out)
    assert(got.count() === 5)
    // multiset conservation through the in-memory transport
    assert(got.select("id").as[Int].collect().sorted.toSeq === Seq(1, 2, 3, 4, 5))
    // each batch directory is internally sorted by the key
    val batch0 = spark.read.parquet(s"$out/batch=000000000")
      .select("id").as[Int].collect()
    assert(batch0.sameElements(batch0.sorted))
  }

  test("Kafka connector availability is reported, not assumed") {
    // this offline build has no spark-sql-kafka jar; the source must
    // detect that rather than fail at plan time
    assert(!KafkaSource.available)
  }
}
