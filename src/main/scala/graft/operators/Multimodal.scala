package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads (image/audio/
  * video bytes) with typed metadata, plus decode / feature-extraction
  * operators shaped for distributed execution.
  *
  * The Spark-side mechanics here are real and tested — schema, per-
  * partition batched iteration, deterministic output shape. The actual
  * media decode is STUBBED (`decodeStub`): this container has no image/
  * audio codecs, so the stub derives a deterministic fake from the bytes.
  * In production, swap `decodeStub` for a real decoder (e.g. javacv /
  * TwelveMonkeys inside `mapPartitions`, initialized once per partition —
  * exactly the batch shape used below).
  */
object Multimodal {

  /** A decoded media record: id, raw payload size, and an extracted
    * fixed-width feature vector. */
  case class MediaFeatures(media_id: Long, n_bytes: Int, features: Array[Float])

  /** Attach a binary payload + metadata struct to a text table, standing
    * in for real media bytes (fixtures carry no true media). Metadata
    * (fake width/height) is md5-derived so it is deterministic and
    * reproducible by the DuckDB oracle. */
  def attachBinary(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      col(textCol).cast("binary").as("payload"),
      struct(
        length(col(textCol).cast("binary")).as("n_bytes"),
        (conv(substring(md5(col(textCol)), 1, 4), 16, 10).cast("long") % 640)
          .as("width"),
        (conv(substring(md5(col(textCol)), 5, 4), 16, 10).cast("long") % 480)
          .as("height")).as("meta"))

  /** STUB decode: deterministic fake "decoder" — real implementation
    * would parse the media container here. Kept pure/deterministic so the
    * distributed plumbing around it is testable. */
  private def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    // ??? <- real media decode goes here; deterministic fake instead:
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** STUB resize: real codecs would decode → scale → re-encode; the stub
    * deterministically re-cuts the payload to the target byte budget and
    * rewrites the metadata — keeping the column-level contract (payload +
    * meta stay consistent) testable. Pure column expressions: resize at
    * scan speed, no shuffle. */
  def resize(withBinary: DataFrame, width: Int, height: Int): DataFrame = {
    val budget = (width.toLong * height.toLong / 256L).toInt max 1
    withBinary.select(
      col("media_id"),
      // ??? <- real decode+scale+encode goes here (no codecs in build)
      substring(col("payload"), 1, budget).as("payload"),
      struct(
        least(col("meta.n_bytes"), lit(budget)).as("n_bytes"),
        lit(width.toLong).as("width"),
        lit(height.toLong).as("height")).as("meta"))
  }

  /** STUB frame sampling: emit `n` evenly-spaced "frames" per media row
    * (posexplode over a sequence — one output row per frame, the shape a
    * real video pipeline needs). Frame payload is a deterministic slice;
    * a real decoder would seek + decode the keyframe here. */
  def sampleFrames(withBinary: DataFrame, n: Int): DataFrame = {
    // n=0 would make Spark's sequence(0, -1) emit a DESCENDING [0, -1]
    // (two bogus frames) and divide by zero in the slice arithmetic
    require(n > 0, s"frame count must be positive, got $n")
    withBinary
      .select(col("media_id"), col("payload"),
        posexplode(expr(s"sequence(0, ${n - 1})")).as(Seq("frame_idx", "__f")))
      .select(
        col("media_id"), col("frame_idx"),
        // ??? <- real keyframe seek+decode; deterministic slice instead
        expr(s"substr(payload, cast(frame_idx * (length(payload) div $n) + 1 as int), 16)")
          .as("frame_bytes"))
  }

  /** Per-partition batched feature extraction over the binary column.
    * `mapPartitions` (not a per-row UDF) so a real decoder can amortize
    * its init cost per task — the standard shape for Pandas-UDF-style
    * batch inference, expressed natively in Scala. */
  def extractFeatures(withBinary: DataFrame,
                      dim: Int = 16): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    withBinary.select(col("media_id"), col("payload"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        // per-partition init of a real decoder would happen here
        it.map { case (id, payload) =>
          MediaFeatures(id, payload.length, decodeStub(payload, dim))
        }
      }
  }
}
