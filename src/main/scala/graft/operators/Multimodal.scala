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

  /** Per-partition batched feature extraction over the binary column.
    * `mapPartitions` (not a per-row UDF) so a real decoder can amortize
    * its init cost per task — the standard shape for Pandas-UDF-style
    * batch inference, expressed natively in Scala. */
  def extractFeatures(spark: SparkSession, withBinary: DataFrame,
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
