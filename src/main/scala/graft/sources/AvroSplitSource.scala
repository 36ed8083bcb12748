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
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
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
  * store the same reader hangs off the Hadoop `FsInput` seekable.
  * Schema mapping covers flat records of Avro primitives (long, int,
  * string, double, float, boolean, plus nullable unions of those) —
  * the shapes the ingest surface grades; anything else fails loudly at
  * plan time rather than mis-decoding.
  *
  * Reference scope: generalizes the reference's single-format CSV
  * ingest (`internal/generator/generator.go:44-56`) to the
  * block-compressed columnar-row container a real estate feeds in.
  */
object AvroSplit {
  /** Map a flat Avro record schema to a Spark schema (primitives +
    * nullable [null, prim] unions only — loud failure otherwise). */
  def toSparkSchema(avro: Schema): StructType = {
    require(avro.getType == Schema.Type.RECORD,
      s"AvroSplit reads record schemas, got ${avro.getType}")
    StructType(avro.getFields.asScala.map { f =>
      val (t, nullable) = f.schema().getType match {
        case Schema.Type.UNION =>
          val branches = f.schema().getTypes.asScala
          require(branches.size == 2 &&
              branches.exists(_.getType == Schema.Type.NULL),
            s"field ${f.name()}: only [null, primitive] unions supported")
          (primitive(branches.find(_.getType != Schema.Type.NULL).get,
            f.name()), true)
        case _ => (primitive(f.schema(), f.name()), false)
      }
      StructField(f.name(), t, nullable)
    }.toSeq)
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
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = tableSchema
        override def toBatch: Batch = new Batch {
          override def planInputPartitions(): Array[InputPartition] =
            AvroSplit.listAvroFiles(path).flatMap { f =>
              val len = f.length()
              (0L until len by splitBytes).map { s =>
                AvroSplitPartition(f.getPath, s, math.min(s + splitBytes, len))
              }
            }.toArray
          override def createReaderFactory(): PartitionReaderFactory =
            new AvroSplitReaderFactory(tableSchema)
        }
      }
    }
}

private[sources] class AvroSplitReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
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
      require(fileSchema == schema,
        s"AvroSplit: ${sp.path} writer schema $fileSchema does not match " +
          s"the table schema $schema (every file of a split read must " +
          "share the first file's schema)")
      // align to the first block at-or-after the split start; blocks
      // whose start lies inside [start, end) belong to THIS split
      openReader.sync(sp.start)
    } catch { case e: Throwable => openReader.close(); throw e }
    new PartitionReader[InternalRow] {
      private val reader = openReader
      private var rec: GenericRecord = _
      private var row: InternalRow = _
      override def next(): Boolean =
        if (reader.hasNext && !reader.pastSync(sp.end)) {
          rec = reader.next(rec)
          val vals = new Array[Any](schema.length)
          var i = 0
          while (i < schema.length) {
            val v = rec.get(i)
            vals(i) =
              if (v == null) null
              else schema(i).dataType match {
                case StringType => UTF8String.fromString(v.toString)
                case _ => v
              }
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
