package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, SeekableFileInput}
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** BLOCK-SPLITTING Avro DataSourceV2 reader — the 100 TB form the
  * per-file [[AvroIngest]] kernel's scale note promises, built without
  * the spark-avro connector (absent offline; the Avro LIBRARY ships
  * with Spark).
  *
  * Avro container files are sync-marker block-delimited, so ONE large
  * file splits the way Hadoop input formats split it (the public
  * avro-mapred discipline): partition the byte range into `splitBytes`
  * chunks; each reader seeks its chunk start, `sync()`s forward to the
  * next block boundary, and decodes blocks whose start offset lies
  * inside its chunk (`hasNext && !pastSync(end)`). Every block is read
  * by exactly ONE task — no overlap, no gap, whatever the boundary
  * cuts — so a 10 GB shard becomes ~80 parallel tasks instead of one.
  *
  * Planning lists files and reads ONE header (schema + codec context
  * live in the header; the sync scan happens task-side) — the driver
  * never scans data. Local-FS `SeekableFileInput` here; on a cluster
  * store the same reader hangs off the Hadoop `FsInput` seekable
  * (partition paths are shipped ABSOLUTE so executor-side opens never
  * depend on the driver's working directory).
  * Schema mapping covers flat records of Avro primitives (long, int,
  * string, double, float, boolean, nullable unions of those, plus
  * ARRAYS of those primitives — the embeddings-in-Avro shape a real
  * LLM estate ships); anything else fails loudly at plan time rather
  * than mis-decoding.
  *
  * The scan builder implements `SupportsPushDownRequiredColumns`:
  * Avro is row-oriented, so pruning cannot skip I/O, but it skips the
  * per-field DECODE-to-Spark conversion and the row width — a 2-column
  * projection over a 50-field shard materializes 2 values per row, not
  * 50 (the Avro datum reader still parses the record wire format; the
  * expensive UTF8String/array materialization happens only for
  * requested fields).
  *
  * Reference scope: generalizes the reference's single-format CSV
  * ingest (`internal/generator/generator.go:44-56`) to the
  * block-compressed columnar-row container a real estate feeds in.
  */
object AvroSplit {
  /** Map a flat Avro record schema to a Spark schema (primitives,
    * nullable [null, T] unions, and arrays of primitives — loud
    * failure otherwise). */
  def toSparkSchema(avro: Schema): StructType = {
    require(avro.getType == Schema.Type.RECORD,
      s"AvroSplit reads record schemas, got ${avro.getType}")
    StructType(avro.getFields.asScala.map { f =>
      val (t, nullable) = f.schema().getType match {
        case Schema.Type.UNION =>
          val branches = f.schema().getTypes.asScala
          require(branches.size == 2 &&
              branches.exists(_.getType == Schema.Type.NULL),
            s"field ${f.name()}: only [null, T] unions supported")
          (fieldType(branches.find(_.getType != Schema.Type.NULL).get,
            f.name()), true)
        case _ => (fieldType(f.schema(), f.name()), false)
      }
      StructField(f.name(), t, nullable)
    }.toSeq)
  }

  private def fieldType(s: Schema, field: String): DataType = s.getType match {
    case Schema.Type.ARRAY =>
      // element unions would need per-element null branches; the LLM
      // estate shape (array<float> embeddings) is dense
      ArrayType(primitive(s.getElementType, field), containsNull = false)
    case _ => primitive(s, field)
  }

  private def primitive(s: Schema, field: String): DataType = s.getType match {
    case Schema.Type.LONG => LongType
    case Schema.Type.INT => IntegerType
    case Schema.Type.STRING => StringType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.BOOLEAN => BooleanType
    case other =>
      throw new IllegalArgumentException(
        s"AvroSplit: unsupported Avro type $other for field $field")
  }

  /** Avro datum → Spark internal value converter for one field type,
    * built ONCE per reader (never per row). Numeric/boolean values
    * pass through boxed; strings re-materialize as UTF8String; arrays
    * copy into a GenericArrayData with the element conversion applied
    * per slot. */
  private[sources] def converter(t: DataType): Any => Any = t match {
    case StringType => v => UTF8String.fromString(v.toString)
    case ArrayType(et, _) =>
      val elem = converter(et)
      v => {
        val in = v.asInstanceOf[java.util.Collection[_]]
        val out = new Array[Any](in.size)
        val it = in.iterator()
        var i = 0
        while (it.hasNext) { out(i) = elem(it.next()); i += 1 }
        new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
      }
    case _ => identity
  }

  private[sources] def listAvroFiles(path: String): Seq[java.io.File] = {
    val d = new java.io.File(path)
    val files =
      if (d.isDirectory)
        Option(d.listFiles()).getOrElse(Array.empty)
          .filter(_.getName.endsWith(".avro")).toSeq
      else if (d.isFile) Seq(d)
      else Seq.empty
    require(files.nonEmpty, s"AvroSplit: no .avro files under $path")
    files.sortBy(_.getName)
  }

  private[sources] def headerSchema(f: java.io.File): Schema = {
    val r = new DataFileReader(new SeekableFileInput(f),
      new GenericDatumReader[GenericRecord]())
    try r.getSchema finally r.close()
  }
}

/** One byte range of one container file; the reader aligns it to block
  * boundaries via the sync protocol. */
private[sources] case class AvroSplitPartition(
    path: String, start: Long, end: Long) extends InputPartition

class AvroSplitProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = options.get("path")
    require(path != null, "option 'path' is required")
    AvroSplit.toSparkSchema(
      AvroSplit.headerSchema(AvroSplit.listAvroFiles(path).head))
  }
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val path = opts.get("path")
    require(path != null, "option 'path' is required")
    val splitBytes = Option(opts.get("splitbytes"))
      .map(_.toLong).getOrElse(128L * 1024 * 1024)
    require(splitBytes > 0, s"bad splitBytes=$splitBytes")
    new AvroSplitTable(path, splitBytes, schema)
  }
}

private[sources] class AvroSplitTable(path: String, splitBytes: Long,
    tableSchema: StructType) extends Table with SupportsRead {
  override def name(): String = s"avrosplit:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns {
      // the pruned schema Catalyst hands down; defaults to the full
      // table when no projection narrows the scan
      private var required: StructType = tableSchema
      override def pruneColumns(requiredSchema: StructType): Unit =
        // top-level field pruning only (no nested-struct fields here);
        // Catalyst passes fields in table order, names from our schema
        required = StructType(requiredSchema.fields
          .filter(f => tableSchema.fieldNames.contains(f.name)))
      override def build(): Scan = new Scan {
        private val readSch = required
        override def readSchema(): StructType = readSch
        override def toBatch: Batch = new Batch {
          override def planInputPartitions(): Array[InputPartition] =
            AvroSplit.listAvroFiles(path).flatMap { f =>
              val len = f.length()
              (0L until len by splitBytes).map { s =>
                // absolute path: the partition ships to executor-side
                // opens, whose working directory is not the driver's
                AvroSplitPartition(f.getAbsolutePath, s,
                  math.min(s + splitBytes, len))
              }
            }.toArray
          override def createReaderFactory(): PartitionReaderFactory =
            new AvroSplitReaderFactory(tableSchema, readSch)
        }
      }
    }
}

/** Reader factory carrying BOTH schemas: `tableSchema` is the contract
  * every file must match (positional decode safety); `readSchema` is
  * the pruned projection actually materialized per row. */
private[sources] class AvroSplitReaderFactory(tableSchema: StructType,
    readSchema: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[AvroSplitPartition]
    // open + validate + align OUTSIDE the anonymous class: a corrupt or
    // schema-divergent file must fail loudly WITHOUT leaking the open
    // handle (an initializer throw would escape before Spark ever holds
    // a reader to close, and task retries would exhaust descriptors)
    val in = new SeekableFileInput(new java.io.File(sp.path))
    val openReader =
      try new DataFileReader(in, new GenericDatumReader[GenericRecord]())
      catch { case e: Throwable => in.close(); throw e }
    try {
      // rows decode POSITIONALLY against the table schema, so a file
      // whose writer schema diverges (reordered/extended fields, or a
      // user-supplied schema that matches no file) must be rejected
      // here, not served as silently column-shifted values
      val fileSchema = AvroSplit.toSparkSchema(openReader.getSchema)
      require(fileSchema == tableSchema,
        s"AvroSplit: ${sp.path} writer schema $fileSchema does not match " +
          s"the table schema $tableSchema (every file of a split read " +
          "must share the first file's schema)")
      // align to the first block at-or-after the split start; blocks
      // whose start lies inside [start, end) belong to THIS split
      openReader.sync(sp.start)
    } catch { case e: Throwable => openReader.close(); throw e }
    // pruning maps: for each REQUIRED output slot, the avro field
    // position to read and the converter to apply — built once, so the
    // per-row loop touches only requested fields
    val srcPos = readSchema.fields.map(f => tableSchema.fieldIndex(f.name))
    val convs = readSchema.fields.map(f => AvroSplit.converter(f.dataType))
    new PartitionReader[InternalRow] {
      private val reader = openReader
      private var rec: GenericRecord = _
      private var row: InternalRow = _
      override def next(): Boolean =
        if (reader.hasNext && !reader.pastSync(sp.end)) {
          rec = reader.next(rec)
          val vals = new Array[Any](srcPos.length)
          var i = 0
          while (i < srcPos.length) {
            val v = rec.get(srcPos(i))
            vals(i) = if (v == null) null else convs(i)(v)
            i += 1
          }
          row = new GenericInternalRow(vals)
          true
        } else false
      override def get(): InternalRow = row
      override def close(): Unit = reader.close()
    }
  }
}
