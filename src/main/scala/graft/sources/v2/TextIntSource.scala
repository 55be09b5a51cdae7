package graft.sources.v2

import java.io.BufferedInputStream

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.SpecificInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 connector for the reference's native format: flat text of
  * whitespace-delimited base-10 integers. This is the connector-level
  * re-expression of the reference's scan pipeline, split by split:
  *
  *  - chunk planning `ceil(fileSize/chunkSize)` byte ranges →
  *    [[TextIntScan.planInputPartitions]] (reference `ServerHandler.java:43-52`;
  *    the `chunkSize` option is the V2 spelling of `Client.java:21`'s knob);
  *  - boundary snapping so no token is split or double-read →
  *    [[TextIntPartitionReader]]'s start-minus-one discard protocol
  *    (reference `preprocessStart`/`preprocessEnd`, `NodeHandler.java:119-200`);
  *  - tokenize + parse → the reader's scan loop (`NodeHandler.java:65-70`),
  *    with the reference's crash-on-malformed behavior behind
  *    `lenient=false` and drop-malformed as the default.
  *
  * [[graft.sources.TextIntIO.read]] gets the same result via `spark.read.text`
  * + Hadoop's LineRecordReader snapping; this source exists to own the split
  * contract directly (the "document the V2 path for 100 TB" promise of
  * SURVEY §7.3): byte-range `InputPartition`s are planned from file metadata
  * only, each reader opens and scans exactly its range plus at most one
  * spilled token, so a 100 TB directory fans out to `size/chunkSize`
  * independent tasks with no driver-side data movement.
  *
  * Ownership rule (equivalent to LineRecordReader's): a token belongs to the
  * split containing the delimiter immediately before it (split 0 owns the
  * first token). Readers with `start > 0` begin at `start-1` and discard
  * through the first delimiter — a clean boundary discards only that
  * delimiter — and every reader finishes the token it is inside when it
  * crosses `end`. Each token is emitted exactly once, for every chunkSize.
  *
  * Usage: `spark.read.format("textint").option("chunkSize", n).load(path)`
  * (registered via META-INF/services as `textint`).
  */
class TextIntSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "textint"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TextIntTable.Schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new TextIntTable(properties.get("path"))
}

object TextIntTable {
  val Schema: StructType =
    StructType(Seq(StructField("value", IntegerType, nullable = false)))
}

class TextIntTable(path: String) extends Table with SupportsRead with SupportsWrite {
  require(path != null && path.nonEmpty, "textint source requires a path")

  override def name(): String = s"textint($path)"
  override def schema(): StructType = TextIntTable.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ, TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TextIntScanBuilder(path, options)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new TextIntWriteBuilder(path, info)
}

/** Write side of the connector — the V2 spelling of the reference's sorted
  * text sink (`NodeHandler.java:79-85`: space-joined tokens). Tasks stream
  * rows to HIDDEN temp files (`.`-prefixed, invisible to both readers); the
  * driver's job commit renames them to `part-NNNNN.txt` in partition order
  * — so a failed or speculative task attempt leaves nothing visible, and
  * `mode("overwrite")` (TRUNCATE capability) removes old parts only inside
  * the same commit. Partition order is preserved: writing a
  * range-partitioned, partition-sorted frame yields lexicographic part
  * files whose concatenation IS the total order — the
  * [[graft.sources.TextIntIO.writePartitioned]] TeraSort contract, now
  * owned end-to-end by the connector.
  */
class TextIntWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  require(info.schema().fields.length == 1 &&
    info.schema().fields(0).dataType == IntegerType,
    s"textint sink writes a single int column, got ${info.schema().catalogString}")
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new TextIntWrite(path, doTruncate, info.queryId())
}

case class TextIntCommitMessage(partitionId: Int, tmpPath: String) extends WriterCommitMessage

class TextIntWrite(path: String, doTruncate: Boolean, queryId: String)
    extends Write with BatchWrite {
  override def toBatch: BatchWrite = this
  override def description(): String = s"textint sink $path truncate=$doTruncate"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    TextIntWriterFactory(path, queryId)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val root = new Path(path)
    val fs = root.getFileSystem(SparkSession.active.sparkContext.hadoopConfiguration)
    if (doTruncate && fs.exists(root))
      fs.listStatus(root).filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
        .foreach(s => fs.delete(s.getPath, false))
    messages.collect { case m: TextIntCommitMessage => m }
      .sortBy(_.partitionId)
      .foreach { m =>
        fs.rename(new Path(m.tmpPath), new Path(root, f"part-${m.partitionId}%05d.txt")): Unit
      }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val root = new Path(path)
    val fs = root.getFileSystem(SparkSession.active.sparkContext.hadoopConfiguration)
    messages.collect { case m: TextIntCommitMessage => m }
      .foreach(m => fs.delete(new Path(m.tmpPath), false): Unit)
  }
}

case class TextIntWriterFactory(path: String, queryId: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new TextIntDataWriter(path, queryId, partitionId, taskId)
}

/** Streams one partition to a hidden temp file, space-delimited (the
  * reference's exact format: single spaces, no trailing delimiter).
  */
class TextIntDataWriter(path: String, queryId: String, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  private val tmp = new Path(path, s".$queryId-$partitionId-$taskId.tmp")
  private val out = {
    val fs = tmp.getFileSystem(new Configuration())
    fs.mkdirs(new Path(path))
    new java.io.BufferedOutputStream(fs.create(tmp, true), 64 * 1024)
  }
  private var first = true
  private var closed = false

  private def closeOnce(): Unit = if (!closed) { closed = true; out.close() }

  override def write(row: InternalRow): Unit = {
    if (!first) out.write(' ')
    first = false
    out.write(java.lang.Integer.toString(row.getInt(0))
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
  }

  override def commit(): WriterCommitMessage = {
    closeOnce()
    TextIntCommitMessage(partitionId, tmp.toString)
  }

  override def abort(): Unit = {
    closeOnce()
    tmp.getFileSystem(new Configuration()).delete(tmp, false): Unit
  }

  override def close(): Unit = closeOnce()
}

class TextIntScanBuilder(path: String, options: CaseInsensitiveStringMap) extends ScanBuilder {
  override def build(): Scan = new TextIntScan(
    path,
    chunkSize = options.getLong("chunkSize", 128L * 1024 * 1024),
    lenient = options.getBoolean("lenient", true))
}

class TextIntScan(path: String, chunkSize: Long, lenient: Boolean) extends Scan with Batch {
  require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")

  override def readSchema(): StructType = TextIntTable.Schema
  override def toBatch: Batch = this
  override def description(): String = s"textint $path chunkSize=$chunkSize"

  /** `ceil(len/chunkSize)` ranges per file, planned from file METADATA only
    * (`ServerHandler.java:43-52`) — the driver never touches file contents.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val status = fs.getFileStatus(root)
    val files =
      if (status.isDirectory)
        fs.listStatus(root).filter(s =>
          s.isFile && !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
      else Array(status)
    files.sortBy(_.getPath.toString).flatMap { st =>
      val len = st.getLen
      val n = math.max(1L, (len + chunkSize - 1) / chunkSize)
      (0L until n).map { i =>
        TextIntInputPartition(
          st.getPath.toString, i * chunkSize, math.min(len, (i + 1) * chunkSize), lenient)
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new TextIntReaderFactory
}

case class TextIntInputPartition(file: String, start: Long, end: Long, lenient: Boolean)
    extends InputPartition

class TextIntReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new TextIntPartitionReader(partition.asInstanceOf[TextIntInputPartition])
}

/** Streams one byte range, emitting every integer token the range owns.
  * O(1) memory: one 64 KB buffer, one token builder, one reused mutable row.
  */
class TextIntPartitionReader(p: TextIntInputPartition) extends PartitionReader[InternalRow] {

  private var pos: Long = if (p.start == 0) 0L else p.start - 1
  private val in: BufferedInputStream = {
    val hp = new Path(p.file)
    // executors resolve the filesystem from a fresh conf: correct for
    // file:// and default-fs URIs; a cluster deployment would broadcast the
    // session's Hadoop conf here
    val stream = hp.getFileSystem(new Configuration()).open(hp)
    stream.seek(pos)
    new BufferedInputStream(stream, 64 * 1024)
  }
  private val row = new SpecificInternalRow(Seq(IntegerType))
  private val sb = new java.lang.StringBuilder(12)

  private def readByte(): Int = { val b = in.read(); if (b >= 0) pos += 1; b }
  private def isWs(b: Int): Boolean = b == ' ' || b == '\n' || b == '\r' || b == '\t'

  // boundary snap (`preprocessStart`, NodeHandler.java:119-156): discard
  // through the first delimiter; reading from start-1 means a clean
  // boundary (delimiter at start-1) discards nothing but that delimiter,
  // while a token spanning the boundary is discarded here and owned by the
  // split to the left (which reads past its own end to finish it)
  if (p.start > 0) {
    var b = readByte()
    while (b != -1 && !isWs(b)) b = readByte()
  }

  override def next(): Boolean = {
    while (true) {
      var b = readByte()
      while (b != -1 && isWs(b)) b = readByte()
      if (b == -1) return false
      val tokenStart = pos - 1
      // a token starting at/after `end` belongs to the next split
      if (tokenStart >= p.end) return false
      sb.setLength(0)
      // finish the token even if it crosses `end` (`preprocessEnd`,
      // NodeHandler.java:158-200)
      while (b != -1 && !isWs(b)) { sb.append(b.toChar); b = readByte() }
      try {
        row.setInt(0, java.lang.Integer.parseInt(sb.toString))
        return true
      } catch {
        case _: NumberFormatException if p.lenient => () // drop and continue
        case e: NumberFormatException =>
          throw new NumberFormatException(
            s"textint: unparseable token '$sb' in ${p.file} at byte $tokenStart")
      }
    }
    false // unreachable
  }

  override def get(): InternalRow = row

  override def close(): Unit = in.close()
}
