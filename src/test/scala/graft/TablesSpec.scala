package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The events-timestamp normalization contract: whatever physical type
  * the fixture generation wrote (epoch-nanos Long under nanosAsLong, or
  * TIMESTAMP/TIMESTAMP_NTZ micros), `Tables.withTsMs` must produce the
  * SAME canonical columns — `ts` as epoch-nanos Long and `ts_ms` as
  * epoch millis. Round 5's fixture regeneration silently flipped the
  * encoding and broke 33 graded queries at plan time; this spec pins
  * both branches so the next flip is a test failure, not a round
  * incident. */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  // 2024-01-01T00:00:07.179575Z — a real fixture value with sub-ms micros
  private val micros = 1704067207179575L

  test("withTsMs normalizes epoch-nanos Long and TIMESTAMP to the same row") {
    val fromLong = Tables.withTsMs(
      Seq((1L, micros * 1000L)).toDF("event_id", "ts"))
      .select("event_id", "ts", "ts_ms")
      .as[(Long, Long, Long)].head()

    val fromTimestamp = Tables.withTsMs(
      Seq((1L, new Timestamp(micros / 1000))).toDF("event_id", "ts")
        // rebuild full micro precision lost by the ms-based constructor
        .withColumn("ts", timestamp_micros(lit(micros))))
      .select("event_id", "ts", "ts_ms")
      .as[(Long, Long, Long)].head()

    assert(fromLong === fromTimestamp)
    assert(fromLong._2 === micros * 1000L, "ts must be epoch NANOS")
    assert(fromLong._3 === micros / 1000L, "ts_ms must truncate to millis")
  }

  test("events loader yields Long ts + ts_ms on the driver fixtures") {
    val e = Tables.events(spark, sf("sf0.001"))
    assert(e.schema("ts").dataType.typeName === "long")
    assert(e.schema("ts_ms").dataType.typeName === "long")
    val bad = e.filter(col("ts_ms") =!= expr("ts div 1000000")).count()
    assert(bad === 0L)
  }
}
