package graft.plans

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Fixed-shape key Bloom filter for the versioned table's manifests
  * (r14, TimeTravel): each committed file set records a Bloom over the
  * xxhash64 of its merge keys, so a LATER commit's change-type
  * membership probe can skip chain file sets that cannot contain any of
  * its candidate keys — for keys of ANY type, where the integral
  * [min,max] range skip cannot help (string keys, interleaved key
  * spaces). Pruning is conservative: a false positive only keeps a file
  * set in the probe (correct, just unpruned); false negatives are
  * impossible, so merge semantics never change.
  *
  * Shape: m = 2^17 bits (16 KiB, 2048 longs), k = 6 probes. The 6 bit
  * positions are non-overlapping 17-bit SLICES of two independent
  * 64-bit hashes (h1 = xxhash64(key), h2 = xxhash64(key, 1)) — pure
  * shift/mask expressions on both the build and probe side, no
  * multiplication (ANSI-overflow-safe) and fully codegen-friendly.
  * At 15 k keys per file set the false-positive rate is ~1.5%; past
  * ~100 k keys the filter saturates and pruning gracefully degrades to
  * "never skip" (a real deployment sizes per file set — this fixed
  * shape bounds manifest weight at ~22 KB base64 per entry).
  *
  * The THREE consumers must agree bit-for-bit:
  *   - build: [[agg]], an Aggregator riding the commit's write job via
  *     `Dataset.observe` (stats describe the actually-written bytes);
  *   - probe-in-aggregate: [[mightContain]], column expressions folded
  *     into the commit's one O(|delta|) aggregate;
  *   - driver-side probe: [[mightContainLong]] for point lookups whose
  *     keys are literal Seq[Long] (snapshotAt), via the same XXH64
  *     chaining the SQL xxhash64 uses (seed 42, then each value hashed
  *     with the running hash as seed) — asserted equal in
  *     TimeTravelSpec.
  */
object KeyBloom {
  val Bits = 1 << 17
  val Words: Int = Bits / 64
  private val Mask = (Bits - 1).toLong
  private val Shifts = Seq(0, 17, 34)

  /** h2 feeds xxhash64 a second column so the two hashes are
    * independent draws: xxhash64(key, 1) chains h(1L, seed = h(key)).
    * Callers must pass the NORMALIZED key ([[normalize]]) so the
    * SQL-side build/probe and the driver-side long probe hash the same
    * bytes (xxhash64 of an INT uses hashInt, of a LONG hashLong — a
    * raw int key would silently disagree with [[hashLongs]]). */
  def hashCols(key: Column): (Column, Column) =
    (xxhash64(key), xxhash64(key, lit(1L)))

  /** Hash-normalization rule shared by every consumer: integral keys
    * hash as LONG (so literal Seq[Long] point probes agree), everything
    * else hashes its native type. */
  def normalize(key: Column, dt: org.apache.spark.sql.types.DataType): Column = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType | IntegerType | ShortType | ByteType => key.cast("long")
      case _ => key
    }
  }

  /** Driver-side twin of [[hashCols]] for a literal long key. */
  def hashLongs(k: Long): (Long, Long) = {
    val h1 = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(k, 42L)
    (h1, org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(1L, h1))
  }

  private def positions(h1: Long, h2: Long): Seq[Int] =
    (Shifts.map(s => ((h1 >>> s) & Mask).toInt) ++
      Shifts.map(s => ((h2 >>> s) & Mask).toInt))

  /** Build-side aggregator over (h1, h2) hash pairs. */
  private final class Agg extends Aggregator[(Long, Long), Array[Long], Array[Byte]] {
    def zero: Array[Long] = new Array[Long](Words)
    def reduce(b: Array[Long], in: (Long, Long)): Array[Long] = {
      positions(in._1, in._2).foreach { p =>
        b(p >>> 6) |= (1L << (p & 63))
      }
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < Words) { a(i) |= b(i); i += 1 }
      a
    }
    def finish(b: Array[Long]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(Words * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.foreach(bb.putLong)
      bb.array()
    }
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.Encoders.javaSerialization[Array[Long]]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** The Bloom as an aggregate COLUMN over the key — rides any
    * aggregation or `observe` (the commit write job). Null keys are
    * skipped by the caller's filter or contribute hash-of-null bits
    * (harmless: pruning stays conservative). */
  def agg(key: Column): Column = {
    val (h1, h2) = hashCols(key)
    udaf(new Agg()).apply(h1, h2)
  }

  /** Probe: TRUE iff every slice-position bit of (h1, h2) is set in
    * `bloom` — pure shift/mask/element_at expressions (codegen, no
    * UDF), suitable inside the commit's one O(|delta|) aggregate as
    * `max(when(mightContain(...), 1).otherwise(0))`. */
  def mightContain(key: Column, bloom: Array[Byte]): Column = {
    val words = toWords(bloom)
    val arr = typedlit(words.toSeq)
    val (h1, h2) = hashCols(key)
    val tests = Shifts.map(s => bitSet(arr, h1, s)) ++
      Shifts.map(s => bitSet(arr, h2, s))
    tests.reduce(_ && _)
  }

  private def bitSet(words: Column, h: Column, s: Int): Column = {
    val pos = shiftrightunsigned(h, s).bitwiseAND(lit(Mask))
    // functions.get — 0-based Column index (element_at only takes
    // literal indices)
    val word = get(words, shiftrightunsigned(pos, 6).cast("int"))
    // functions.shiftleft only takes a literal shift — call the SQL
    // builtin, whose numBits is a full expression
    word.bitwiseAND(call_function("shiftleft", lit(1L),
        pos.bitwiseAND(lit(63L)).cast("int")))
      .notEqual(lit(0L))
  }

  /** Driver-side probe for literal long keys (snapshotAt point
    * lookups): any of `keys` possibly in `bloom`? */
  def mightContainAny(bloom: Array[Byte], keys: Seq[Long]): Boolean = {
    val words = toWords(bloom)
    keys.exists { k =>
      val (h1, h2) = hashLongs(k)
      positions(h1, h2).forall(p => (words(p >>> 6) & (1L << (p & 63))) != 0L)
    }
  }

  def toBase64(bloom: Array[Byte]): String =
    java.util.Base64.getEncoder.encodeToString(bloom)

  def fromBase64(s: String): Array[Byte] =
    java.util.Base64.getDecoder.decode(s)

  private def toWords(bloom: Array[Byte]): Array[Long] = {
    require(bloom.length == Words * 8,
      s"bad bloom length ${bloom.length}, expected ${Words * 8}")
    val bb = java.nio.ByteBuffer.wrap(bloom)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Array.fill(Words)(bb.getLong)
  }
}
