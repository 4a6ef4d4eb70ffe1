package graft.io

import java.util

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 for directories of torch `.pt` tensor files:
  * `spark.read.format("graft-pt").load(dir)` → (scene_id, length, tensor)
  * with the reference's permute(1,0,2,3) layout applied
  * (stations × bands × 49 px, see [[TorchTensors]]).
  *
  * The V2 surface is what makes this a real source rather than a UDF over
  * binaryFile (the s5b form):
  * - column pruning pushes into the reader — `select(scene_id, length)`
  *   never opens the zip or copies tensor storage (the scan's
  *   `readSchema` proves it in explain output);
  * - files pack into input partitions up to
  *   `spark.sql.files.maxPartitionBytes`-style budgets, so a million
  *   small tensors do not make a million tasks;
  * - decode happens inside `PartitionReader` on executors — a narrow
  *   scan, nothing shuffles, no driver-side listing beyond the split.
  */
class PtDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-pt"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PtDataSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PtTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = true
}

object PtDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("scene_id", StringType, nullable = false),
    StructField("length", LongType, nullable = false),
    StructField("tensor", ArrayType(ArrayType(ArrayType(DoubleType))))))

  val DefaultPartitionBytes: Long = 128L * 1024 * 1024
}

class PtTable(path: String) extends Table with SupportsRead with SupportsWrite {
  require(path != null, "graft-pt requires a load path")
  // Plain identifier: this surfaces in SQL error messages / plans, where
  // slashes and backticks break identifier quoting.
  override def name(): String = "graft_pt"
  override def schema(): StructType = PtDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PtScanBuilder(path)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new PtWriteBuilder(path, info.schema())
}

class PtScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownRequiredColumns {
  private var required: StructType = PtDataSource.Schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new PtScan(path, required)
}

final case class PtFileSlice(path: String, length: Long)
final case class PtInputPartition(files: Seq[PtFileSlice]) extends InputPartition

class PtScan(path: String, requiredSchema: StructType) extends Scan with Batch {
  override def readSchema(): StructType = requiredSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-pt $path readSchema=[${requiredSchema.fieldNames.mkString(",")}]"

  /** Greedy size packing: many small tensors share a task; a huge file
    * stands alone. Listing happens once, on the driver, like FileScan.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    val files = fs.listStatus(p).toSeq
      .filter(_.getPath.getName.endsWith(".pt"))
      .sortBy(_.getPath.toString)
      .map(s => PtFileSlice(s.getPath.toString, s.getLen))
    val parts = mutable.ArrayBuffer.empty[PtInputPartition]
    var cur = mutable.ArrayBuffer.empty[PtFileSlice]
    var curBytes = 0L
    for (f <- files) {
      if (cur.nonEmpty && curBytes + f.length > PtDataSource.DefaultPartitionBytes) {
        parts += PtInputPartition(cur.toSeq); cur = mutable.ArrayBuffer.empty; curBytes = 0L
      }
      cur += f; curBytes += f.length
    }
    if (cur.nonEmpty) parts += PtInputPartition(cur.toSeq)
    parts.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PtReaderFactory(requiredSchema)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new PtMicroBatchStream(path, requiredSchema)
}

/** Offset = the sorted set of files seen at that point; a batch is the set
  * difference. This is the file-source model in its simplest form — the
  * production variant keeps a compaction log instead of inlining the list
  * into every offset (fine here: offsets are per-checkpoint metadata and
  * tensor drops arrive in the thousands, not billions).
  */
final case class PtStreamOffset(entries: Seq[PtFileSlice]) extends Offset {
  override def json(): String =
    entries.map(e => s"${e.length}\t${e.path}").mkString("\n")
}

object PtStreamOffset {
  def parse(json: String): PtStreamOffset =
    if (json.isEmpty) PtStreamOffset(Nil)
    else PtStreamOffset(json.split("\n").toSeq.map { line =>
      val i = line.indexOf('\t')
      PtFileSlice(line.substring(i + 1), line.substring(0, i).toLong)
    })
}

/** Incremental tensor ingest: each micro-batch decodes exactly the .pt
  * files that appeared since the previous offset.
  */
class PtMicroBatchStream(path: String, schema: StructType) extends MicroBatchStream {

  private def listing(): Seq[PtFileSlice] = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    fs.listStatus(p).toSeq
      .filter(_.getPath.getName.endsWith(".pt"))
      .map(s => PtFileSlice(s.getPath.toString, s.getLen))
      .sortBy(_.path)
  }

  override def initialOffset(): Offset = PtStreamOffset(Nil)
  override def latestOffset(): Offset = PtStreamOffset(listing())
  override def deserializeOffset(json: String): Offset = PtStreamOffset.parse(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[PtStreamOffset].entries.map(_.path).toSet
    val fresh = end.asInstanceOf[PtStreamOffset].entries.filterNot(e => seen(e.path))
    if (fresh.isEmpty) Array.empty
    else fresh.grouped(8).map(g => PtInputPartition(g): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PtReaderFactory(schema)
}

class PtReaderFactory(schema: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PtPartitionReader(partition.asInstanceOf[PtInputPartition], schema)
}

class PtPartitionReader(part: PtInputPartition, schema: StructType)
    extends PartitionReader[InternalRow] {
  private val needTensor = schema.fieldNames.contains("tensor")
  private var i = -1
  private var current: InternalRow = _

  override def next(): Boolean = {
    i += 1
    if (i >= part.files.size) return false
    current = readOne(part.files(i))
    true
  }

  private def readOne(f: PtFileSlice): InternalRow = {
    val name = f.path.substring(f.path.lastIndexOf('/') + 1)
    val sceneId = name.stripSuffix(".pt")
    val values = schema.fieldNames.toSeq.map {
      case "scene_id" => UTF8String.fromString(sceneId)
      case "length"   => f.length
      case "tensor"   => decode(f)
    }
    InternalRow.fromSeq(values)
  }

  /** Only reached when `tensor` survives pruning: open + unzip + unpickle
    * happens per requested file, never for metadata-only queries.
    */
  private def decode(f: PtFileSlice): GenericArrayData = {
    val p = new Path(f.path)
    val fs = p.getFileSystem(new Configuration())
    val in = fs.open(p)
    val bytes = try in.readAllBytes() finally in.close()
    val stationBands = TorchTensors.toStationBands(TorchTensors.parsePt(bytes))
    new GenericArrayData(stationBands.map(station =>
      new GenericArrayData(station.map(band =>
        new GenericArrayData(band.toArray)))).toArray)
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}

/** Write side: each row (scene_id, tensor) becomes one torch-format
  * `<scene_id>.pt` file ([[TorchTensors.encodePt]]). Tasks write
  * `.<uuid>.tmp` files and the driver-side commit renames them into place,
  * so a failed job leaves no half-written `.pt` visible to readers;
  * truncate (overwrite mode) clears existing `.pt` files first.
  */
class PtWriteBuilder(path: String, schema: StructType)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  // The analyzer has already resolved the input against the table schema
  // (scene_id, length, tensor); `length` is derived on read and ignored
  // here — the storage length is whatever encodePt produces.
  override def build(): Write = new PtWrite(path, schema, doTruncate)
}

final case class PtCommit(tmpNames: Seq[String]) extends WriterCommitMessage

class PtWrite(path: String, schema: StructType, doTruncate: Boolean)
    extends Write with BatchWrite {
  override def toBatch: BatchWrite = this

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new PtWriterFactory(path, schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(new Configuration())
    if (doTruncate) {
      Option(fs.globStatus(new Path(dir, "*.pt"))).toSeq.flatten
        .foreach(s => fs.delete(s.getPath, false))
    }
    for (m <- messages; tmp <- m.asInstanceOf[PtCommit].tmpNames) {
      val finalName = tmp.substring(tmp.indexOf('!') + 1)
      fs.rename(new Path(dir, tmp.substring(0, tmp.indexOf('!'))),
        new Path(dir, finalName))
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(new Configuration())
    for (m <- messages if m != null; tmp <- m.asInstanceOf[PtCommit].tmpNames)
      fs.delete(new Path(dir, tmp.substring(0, tmp.indexOf('!'))), false)
  }
}

class PtWriterFactory(path: String, schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new PtDataWriter(path, schema, s"$partitionId-$taskId")
}

class PtDataWriter(path: String, schema: StructType, taskTag: String)
    extends DataWriter[InternalRow] {
  private val sceneIdx = schema.fieldIndex("scene_id")
  private val tensorIdx = schema.fieldIndex("tensor")
  private val dir = new Path(path)
  private val fs = dir.getFileSystem(new Configuration())
  private val written = mutable.ArrayBuffer.empty[String]

  override def write(row: InternalRow): Unit = {
    val sceneId = row.getUTF8String(sceneIdx).toString
    val t = row.getArray(tensorIdx)
    val tensor = (0 until t.numElements()).map { s =>
      val station = t.getArray(s)
      (0 until station.numElements()).map { b =>
        station.getArray(b).toDoubleArray().toSeq
      }
    }
    val bytes = TorchTensors.encodePt(sceneId, tensor)
    val tmpName = s".${sceneId}.${taskTag}.tmp"
    val out = fs.create(new Path(dir, tmpName), true)
    try out.write(bytes) finally out.close()
    written += s"$tmpName!$sceneId.pt"
  }

  override def commit(): WriterCommitMessage = PtCommit(written.toSeq)
  override def abort(): Unit =
    written.foreach(t => fs.delete(new Path(dir, t.substring(0, t.indexOf('!'))), false))
  override def close(): Unit = ()
}
