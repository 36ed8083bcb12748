package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, SparkSession}
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

  // ---- real container-header synthesis + parse (no codecs needed) ----

  /** 4-byte big-endian hex of a long value (PNG's integer encoding). */
  private def beHex(v: Column): Column = lpad(hex(v.cast("long")), 8, "0")

  /** 4-byte little-endian hex of a long value (BMP's integer encoding):
    * the big-endian hex with its byte pairs reversed. */
  private def leHex(v: Column): Column = {
    val h = beHex(v)
    concat(substring(h, 7, 2), substring(h, 5, 2),
      substring(h, 3, 2), substring(h, 1, 2))
  }

  /** Synthesize a VALID image container in front of the text bytes —
    * PNG (8-byte signature + IHDR chunk) for even ids, BMP
    * (BITMAPFILEHEADER + BITMAPINFOHEADER) for odd — with md5-derived
    * dimensions, so [[imageMeta]] has real headers to parse and the
    * oracle can recompute the expected dimensions from the formula.
    * Layouts are the published file formats: PNG width/height are
    * big-endian int32 at byte offsets 16/20 (after the 8-byte signature
    * and the IHDR chunk length+type); BMP width/height are little-endian
    * int32 at offsets 18/22. Dimensions are 1-based (`% n + 1`) — a
    * zero-dimension image is invalid in both formats. Everything is
    * `unhex`/`concat` column expressions: synthesis runs at scan speed. */
  def synthesizeImagePayload(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val text = col(textCol)
    val w = conv(substring(md5(text), 1, 4), 16, 10).cast("long") % 640 + 1
    val h = conv(substring(md5(text), 5, 4), 16, 10).cast("long") % 480 + 1
    val body = text.cast("binary")
    // 8 sig + 4 len + "IHDR" + 13 data (w,h,depth8,color6,comp0,filt0,
    // interlace0) + 4 crc = 33 bytes (crc left zero — parsers that
    // verify it would decode the pixel data too, which needs a codec)
    val png = concat(unhex(concat(
      lit("89504E470D0A1A0A"), lit("0000000D"), lit("49484452"),
      beHex(w), beHex(h), lit("0806000000"), lit("00000000"))), body)
    // 14-byte file header (BM, file size, reserved, data offset 54) +
    // 40-byte BITMAPINFOHEADER = 54 bytes before the data
    val bmp = concat(unhex(concat(
      lit("424D"), leHex(length(body) + 54), lit("00000000"), lit("36000000"),
      lit("28000000"), leHex(w), leHex(h), lit("0100"), lit("1800"),
      lit("00000000"), leHex(length(body)), lit("130B0000"), lit("130B0000"),
      lit("00000000"), lit("00000000"))), body)
    df.select(col(idCol).as("media_id"),
      when(col(idCol) % 2 === 0, png).otherwise(bmp).as("payload"))
  }

  /** REAL media metadata from the binary payload: sniff the magic bytes
    * and parse width/height out of the container header with pure column
    * expressions — PNG IHDR (big-endian at offsets 16/20) and BMP
    * BITMAPINFOHEADER (little-endian at offsets 18/22), public file-
    * format knowledge, no codec jars. Unknown containers yield format
    * 'unknown' with null dimensions instead of failing the scan — at
    * 100 TB a corrupt payload must quarantine, not kill the job. */
  def imageMeta(withPayload: DataFrame): DataFrame = {
    val p = col("payload")
    def be(off1: Int): Column =
      conv(hex(substring(p, off1, 4)), 16, 10).cast("long")
    def le(off1: Int): Column = {
      val hh = hex(substring(p, off1, 4))
      conv(concat(substring(hh, 7, 2), substring(hh, 5, 2),
        substring(hh, 3, 2), substring(hh, 1, 2)), 16, 10).cast("long")
    }
    val isPng = hex(substring(p, 1, 8)) === "89504E470D0A1A0A"
    val isBmp = hex(substring(p, 1, 2)) === "424D"
    withPayload.select(
      col("media_id"),
      length(p).cast("long").as("n_bytes"),
      when(isPng, lit("png")).when(isBmp, lit("bmp"))
        .otherwise(lit("unknown")).as("format"),
      when(isPng, be(17)).when(isBmp, le(19))
        .otherwise(lit(null).cast("long")).as("width"),
      when(isPng, be(21)).when(isBmp, le(23))
        .otherwise(lit(null).cast("long")).as("height"))
  }

  /** 2-byte little-endian hex of a long value (WAV's u16 encoding). */
  private def leHex16(v: Column): Column = {
    val h = lpad(hex(v.cast("long")), 4, "0")
    concat(substring(h, 3, 2), substring(h, 1, 2))
  }

  /** Synthesize a VALID WAV (RIFF/WAVE) container around the text bytes —
    * the audio leg of the multimodal fixture story, same discipline as
    * [[synthesizeImagePayload]]: the 44-byte canonical PCM header
    * (RIFF chunk + fmt chunk + data chunk header) is the published file
    * format, all fields little-endian; channel count and sample rate are
    * md5-derived so [[audioMeta]] has real headers to parse and the
    * oracle recomputes the expected values from the formula. Channels ∈
    * {1, 2}, rate ∈ {8000, 16000, 22050, 44100} Hz, 16-bit PCM.
    * Everything is `unhex`/`concat` column expressions — synthesis runs
    * at scan speed, no UDF, no shuffle. */
  def synthesizeAudioPayload(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val text = col(textCol)
    val body = text.cast("binary")
    val nch = conv(substring(md5(text), 9, 4), 16, 10).cast("long") % 2 + 1
    val rate = element_at(
      array(lit(8000L), lit(16000L), lit(22050L), lit(44100L)),
      (conv(substring(md5(text), 13, 4), 16, 10).cast("long") % 4 + 1).cast("int"))
    val dataSize = length(body).cast("long")
    // RIFF <size> WAVE | fmt <16> pcm=1 nch rate byteRate blockAlign bits
    // | data <size> <samples> — 44 header bytes total
    val wav = concat(unhex(concat(
      lit("52494646"), leHex(dataSize + 36), lit("57415645"),
      lit("666D7420"), lit("10000000"), lit("0100"), leHex16(nch),
      leHex(rate), leHex(rate * nch * 2L), leHex16(nch * 2L), lit("1000"),
      lit("64617461"), leHex(dataSize))), body)
    df.select(col(idCol).as("media_id"), wav.as("payload"))
  }

  /** REAL audio metadata from the binary payload: sniff the RIFF/WAVE
    * magic and parse the canonical PCM fmt chunk with pure column
    * expressions — channels (u16 LE @23), sample rate (u32 LE @25),
    * bits/sample (u16 LE @35), data size (u32 LE @41); sample count and
    * duration are derived exactly as a decoder would (frames = data
    * bytes / block align; ms = frames·1000 / rate, floored). Unknown
    * containers quarantine as format 'unknown' with null fields — a
    * corrupt payload must never kill a 100 TB scan. */
  def audioMeta(withPayload: DataFrame): DataFrame = {
    val p = col("payload")
    def le32(off1: Int): Column = {
      val hh = hex(substring(p, off1, 4))
      conv(concat(substring(hh, 7, 2), substring(hh, 5, 2),
        substring(hh, 3, 2), substring(hh, 1, 2)), 16, 10).cast("long")
    }
    def le16(off1: Int): Column = {
      val hh = hex(substring(p, off1, 2))
      conv(concat(substring(hh, 3, 2), substring(hh, 1, 2)), 16, 10).cast("long")
    }
    val isWav = hex(substring(p, 1, 4)) === "52494646" &&
      hex(substring(p, 9, 4)) === "57415645"
    val nch = le16(23)
    val rate = le32(25)
    val bits = le16(35)
    val dataBytes = le32(41)
    val nSamples = floor(dataBytes / (nch * bits / lit(8L))).cast("long")
    withPayload.select(
      col("media_id"),
      length(p).cast("long").as("n_bytes"),
      when(isWav, lit("wav")).otherwise(lit("unknown")).as("format"),
      when(isWav, nch).otherwise(lit(null).cast("long")).as("n_channels"),
      when(isWav, rate).otherwise(lit(null).cast("long")).as("sample_rate"),
      when(isWav, bits).otherwise(lit(null).cast("long")).as("bits_per_sample"),
      when(isWav, nSamples).otherwise(lit(null).cast("long")).as("n_samples"),
      when(isWav, floor(nSamples * 1000L / rate).cast("long"))
        .otherwise(lit(null).cast("long")).as("duration_ms"))
  }

  /** A parsed JPEG header record ([[jpegMeta]]); width/height are None
    * when no SOF frame header is found (quarantine, not failure). */
  case class JpegMeta(media_id: Long, n_bytes: Long, format: String,
                      width: Option[Long], height: Option[Long])

  /** Synthesize a VALID (minimal) JPEG stream around the text bytes:
    * SOI, a COM segment whose LENGTH IS md5-DERIVED (1–16 payload
    * bytes), the SOF0 frame header carrying md5-derived dimensions, EOI,
    * then the body. The variable-length COM segment is the point: the
    * SOF0 offset differs per row, so a fixed-offset "parser" cannot
    * pass — [[jpegMeta]] must genuinely walk the segment chain as the
    * published format requires (each marker FFxx is followed by a
    * big-endian u16 length that counts itself). Dimensions are 1-based;
    * all synthesis is `unhex`/`concat` column expressions at scan
    * speed. */
  def synthesizeJpegPayload(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val text = col(textCol)
    def beHex16(v: Column): Column = lpad(hex(v.cast("long")), 4, "0")
    val nCom = conv(substring(md5(text), 17, 4), 16, 10).cast("long") % 16 + 1
    val comHex = expr(s"substring(md5($textCol), 1, cast(__ncom * 2 as int))")
    val w = conv(substring(md5(text), 21, 4), 16, 10).cast("long") % 1024 + 1
    val h = conv(substring(md5(text), 25, 4), 16, 10).cast("long") % 768 + 1
    // SOI | COM(len = n+2, n md5 bytes) | SOF0(len 11: precision 8,
    // height, width, 1 component (id 1, sampling 0x11, qtable 0)) | EOI
    df.withColumn("__ncom", nCom)
      .select(col(idCol).as("media_id"),
        concat(unhex(concat(
          lit("FFD8"),
          lit("FFFE"), beHex16(col("__ncom") + 2), comHex,
          lit("FFC0"), lit("000B"), lit("08"), beHex16(h), beHex16(w),
          lit("01"), lit("01"), lit("11"), lit("00"),
          lit("FFD9"))), text.cast("binary")).as("payload"))
  }

  /** REAL JPEG metadata: walk the marker/segment chain from SOI to the
    * first SOF frame header (C0–C3: baseline/extended/progressive/
    * lossless) and read the big-endian u16 height/width at payload
    * offsets 3/5 — the published JFIF structure, no codec jars. The walk
    * is per-row imperative logic, so it runs in `mapPartitions` (the
    * same harness a real decoder needs); malformed streams yield format
    * 'unknown' with null dimensions — at 100 TB a corrupt payload must
    * quarantine, not kill the scan. */
  def jpegMeta(withPayload: DataFrame): DataFrame = {
    implicit val enc = Encoders.product[JpegMeta]
    withPayload.select(col("media_id"), col("payload"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.map { case (id, p) =>
          def u8(i: Int): Int = p(i) & 0xff
          def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
          var width: Option[Long] = None
          var height: Option[Long] = None
          var ok = p.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8
          if (ok) {
            var i = 2
            var done = false
            while (!done && i + 1 < p.length) {
              if (u8(i) != 0xff) { ok = false; done = true }
              else u8(i + 1) match {
                case 0xd9 => done = true                    // EOI: no SOF seen
                case m if m == 0x01 || (m >= 0xd0 && m <= 0xd7) =>
                  i += 2                                    // standalone marker
                case m =>
                  if (i + 3 >= p.length) { ok = false; done = true }
                  else {
                    val segLen = u16(i + 2)
                    if (m >= 0xc0 && m <= 0xc3) {           // SOF0–SOF3
                      if (segLen >= 7 && i + 8 < p.length) {
                        height = Some(u16(i + 5).toLong)
                        width = Some(u16(i + 7).toLong)
                      } else ok = false
                      done = true
                    } else i += 2 + segLen
                  }
              }
            }
          }
          val found = ok && width.isDefined
          JpegMeta(id, p.length.toLong,
            if (found) "jpeg" else "unknown",
            if (found) width else None,
            if (found) height else None)
        }
      }.toDF()
  }

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
