package graft.sources

import java.net.{ServerSocket, Socket, SocketException}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S2 analog: a PUSH receiver source — the reference's OTLP receiver
  * (henrikrexed/securitylogeventprocessor ocb/config.yaml:2-8,
  * docs/configuration/receivers.md: clients push records over the network;
  * the collector buffers and forwards). Spark-first shape:
  *
  *  - a driver-side TCP listener accepts newline-delimited JSON records
  *    and appends them to a WRITE-AHEAD LOG before acknowledging anything
  *    downstream — receipt is durable, so micro-batch replay after a crash
  *    re-reads exactly the same lines (the push analog of file-source
  *    replayability; Spark's built-in socket source is explicitly NOT
  *    fault-tolerant because it skips this step);
  *  - offsets are WAL line counts — exact, monotone, replay-stable;
  *  - admission control caps records per trigger (`maxRowsPerTrigger`,
  *    the receiver-side counterpart of the memory_limiter ceiling);
  *  - the raw `value: string` rows feed the SAME tolerant decode as the
  *    filelog source ([[FileLog.decodeLines]]) — malformed pushes are
  *    skipped and counted, never fatal.
  *
  * On a real cluster the WAL directory lives on shared storage and the
  * listener runs one-per-receiver-endpoint; in local mode both sides see
  * the same filesystem.
  */
object PushLog {

  val schema: StructType = StructType(Seq(StructField("value", StringType)))

  /** Streaming raw lines pushed to the receiver bound to `walDir`. */
  def readLines(spark: SparkSession, walDir: String, port: Int = 0,
                maxRowsPerTrigger: Option[Long] = None): DataFrame = {
    val r = spark.readStream.format(classOf[GraftPushProvider].getName)
      .option("wal", walDir)
      .option("port", port)
    maxRowsPerTrigger.foreach(m => r.option("maxRowsPerTrigger", m))
    r.load()
  }

  /** Pushed JSON-lines decoded to clip records (tolerant skip-not-fail). */
  def readClips(spark: SparkSession, walDir: String, port: Int = 0,
                maxRowsPerTrigger: Option[Long] = None): DataFrame =
    FileLog.decodeLines(readLines(spark, walDir, port, maxRowsPerTrigger))
}

/** One TCP listener + WAL appender per WAL directory. A pushed line is
  * visible to offsets only AFTER it is flushed to the WAL (durable
  * receipt).
  *
  * Restart recovery scans the WAL ONCE: the line count and a sparse
  * line→byte index are rebuilt, and a trailing PARTIAL line (a crash
  * between buffer flush boundaries) is truncated away — it was never
  * visible to offsets, and appending onto it would merge two records.
  *
  * The index (byte offset of every `IndexEvery`-th line) lets a
  * micro-batch reader seek near its start offset instead of re-reading
  * the whole WAL per trigger (O(WAL) per trigger → O(n²) cumulative on a
  * long-lived stream). Retention: the WAL is append-only for the life of
  * the receiver; rotate by draining a stream to its checkpointed end,
  * then starting a fresh receiver on a new WAL directory (the same
  * epoch-style rotation any file-backed receiver uses). */
final class PushReceiver private (val walDir: String, requestedPort: Int) {
  private val walPath: Path = Paths.get(walDir, "push.wal")
  Files.createDirectories(Paths.get(walDir))

  private val IndexEvery = 1024
  // index(k) = byte offset where line number k*IndexEvery starts
  private val index = scala.collection.mutable.ArrayBuffer[Long](0L)
  @volatile private var lineCount: Long = 0L
  private var bytePos: Long = 0L

  if (Files.exists(walPath)) {
    val in = new java.io.BufferedInputStream(Files.newInputStream(walPath))
    val total =
      try {
        var lastNl = 0L
        var pos = 0L
        var b = in.read()
        while (b >= 0) {
          pos += 1
          if (b == '\n') {
            lastNl = pos
            lineCount += 1
            if (lineCount % IndexEvery == 0) index += lastNl
          }
          b = in.read()
        }
        bytePos = lastNl
        pos
      } finally in.close()
    if (total != bytePos) { // trailing partial line: never acknowledged
      val ch = java.nio.channels.FileChannel.open(walPath, StandardOpenOption.WRITE)
      try ch.truncate(bytePos) finally ch.close()
    }
  }

  private val server = new ServerSocket(requestedPort)
  private val out = Files.newOutputStream(walPath,
    StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  @volatile private var closed = false

  def port: Int = server.getLocalPort
  def count: Long = lineCount
  def wal: Path = walPath

  /** (byteOffset, lineNumber) of the nearest indexed line ≤ `line` — the
    * reader seeks there and skips at most IndexEvery-1 lines. */
  def seekFor(line: Long): (Long, Long) = synchronized {
    val k = math.min(line / IndexEvery, (index.size - 1).toLong).toInt
    (index(k), k.toLong * IndexEvery)
  }

  private def handle(sock: Socket): Unit = {
    val br = new java.io.BufferedReader(
      new java.io.InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
    try {
      var line = br.readLine()
      while (line != null) {
        val bytes = line.getBytes(StandardCharsets.UTF_8)
        synchronized {
          out.write(bytes); out.write('\n'); out.flush()
          bytePos += bytes.length + 1
          lineCount += 1
          if (lineCount % IndexEvery == 0) index += bytePos
        }
        line = br.readLine()
      }
    } finally sock.close()
  }

  private val acceptor = new Thread(() => {
    try while (!closed) {
      val sock = server.accept()
      val t = new Thread(() => handle(sock), s"graft-push-conn-${sock.getPort}")
      t.setDaemon(true); t.start()
    } catch { case _: SocketException => () /* closed */ }
  }, s"graft-push-accept-$port")
  acceptor.setDaemon(true)
  acceptor.start()

  def close(): Unit = {
    closed = true
    server.close()
    synchronized(out.close())
  }
}

object PushReceiver {
  private val active = scala.collection.concurrent.TrieMap.empty[String, PushReceiver]

  /** The receiver for `walDir`, starting it on first use. */
  def ensure(walDir: String, port: Int): PushReceiver =
    active.getOrElseUpdate(walDir, new PushReceiver(walDir, port))

  /** Bound port of the receiver on `walDir` (ephemeral ports: port=0). */
  def boundPort(walDir: String): Option[Int] = active.get(walDir).map(_.port)

  def stop(walDir: String): Unit = active.remove(walDir).foreach(_.close())
}

class GraftPushProvider extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = PushLog.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val wal = properties.get("wal")
    require(wal != null && wal.nonEmpty, "graft-push source requires a 'wal' directory option")
    new GraftPushTable(wal,
      Option(properties.get("port")).map(_.toInt).getOrElse(0),
      Option(properties.get("maxRowsPerTrigger")).map(_.toLong))
  }
}

final class GraftPushTable(walDir: String, port: Int, maxRows: Option[Long])
    extends Table with SupportsRead {
  override def name(): String = s"graft-push($walDir)"
  override def schema(): StructType = PushLog.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = PushLog.schema
      override def description(): String = s"graft-push scan of $walDir"
      // batch form: everything durably received so far (backfill/testing)
      override def toBatch: Batch = new Batch {
        private val rcv = PushReceiver.ensure(walDir, port)
        override def planInputPartitions(): Array[InputPartition] =
          Array(PushInputPartition(rcv.wal.toString, 0L, rcv.count, 0L, 0L))
        override def createReaderFactory(): PartitionReaderFactory = new PushReaderFactory
      }
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new GraftPushMicroBatchStream(walDir, port, maxRows)
    }
}

/** Offset = durably received line count. */
case class PushOffset(lines: Long) extends Offset {
  override def json(): String = lines.toString
}

final class GraftPushMicroBatchStream(walDir: String, port: Int, maxRows: Option[Long])
    extends MicroBatchStream with SupportsAdmissionControl {

  private val receiver = PushReceiver.ensure(walDir, port)

  override def initialOffset(): Offset = PushOffset(0L)
  override def deserializeOffset(json: String): Offset = PushOffset(json.trim.toLong)
  override def latestOffset(): Offset = PushOffset(receiver.count)
  override def reportLatestOffset(): Offset = PushOffset(receiver.count)

  override def getDefaultReadLimit: ReadLimit =
    maxRows.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[PushOffset].lines
    val cur = receiver.count
    limit match {
      case mr: ReadMaxRows => PushOffset(math.min(cur, from + mr.maxRows()))
      case _ => PushOffset(cur)
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[PushOffset].lines
    val to = end.asInstanceOf[PushOffset].lines
    if (to <= from) Array.empty
    else {
      val (seekPos, seekLine) = receiver.seekFor(from)
      Array(PushInputPartition(receiver.wal.toString, from, to, seekPos, seekLine))
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = new PushReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class PushInputPartition(walPath: String, start: Long, end: Long,
                              seekPos: Long, seekLine: Long) extends InputPartition

final class PushReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PushInputPartition]
    new PushPartitionReader(p.walPath, p.start, p.end, p.seekPos, p.seekLine)
  }
}

/** Reads WAL lines [start, end). The WAL is append-only, so a replayed
  * range returns bit-identical lines; the (seekPos, seekLine) hint from
  * the receiver's sparse index bounds the skip to < IndexEvery lines
  * instead of re-reading the whole WAL. */
final class PushPartitionReader(walPath: String, start: Long, end: Long,
                                seekPos: Long, seekLine: Long)
    extends PartitionReader[InternalRow] {
  private val ch = java.nio.channels.FileChannel.open(
    Paths.get(walPath), StandardOpenOption.READ)
  ch.position(seekPos)
  private val br = new java.io.BufferedReader(new java.io.InputStreamReader(
    java.nio.channels.Channels.newInputStream(ch), StandardCharsets.UTF_8))
  private var idx = seekLine
  while (idx < start && br.readLine() != null) idx += 1
  private var current: String = _

  override def next(): Boolean =
    if (idx >= end) false
    else {
      current = br.readLine()
      idx += 1
      current != null
    }

  override def get(): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(current)))

  override def close(): Unit = br.close()
}
