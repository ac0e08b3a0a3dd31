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
                maxRowsPerTrigger: Option[Long] = None,
                segmentBytes: Option[Long] = None,
                reclaimOnCommit: Boolean = false): DataFrame = {
    val r = spark.readStream.format(classOf[GraftPushProvider].getName)
      .option("wal", walDir)
      .option("port", port)
      .option("reclaimOnCommit", reclaimOnCommit)
    maxRowsPerTrigger.foreach(m => r.option("maxRowsPerTrigger", m))
    segmentBytes.foreach(b => r.option("segmentBytes", b))
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
  * The WAL is SEGMENTED: lines append to `push.<startLine>.wal`, where
  * `<startLine>` is the global line number of the segment's first line,
  * and the appender rolls to a fresh segment once the active one exceeds
  * `segmentBytes`. Global line-count offsets are unaffected by rotation —
  * a segment's name states exactly which offset range it holds, so:
  *
  *  - restart recovery scans ONLY the active (last) segment: earlier
  *    segments' line counts are differences of consecutive filename
  *    startLines — recovery work is bounded by `segmentBytes`, not WAL
  *    lifetime. A trailing PARTIAL line in the active segment (a crash
  *    between buffer flush boundaries) is truncated away — it was never
  *    visible to offsets, and appending onto it would merge two records;
  *  - retention is segment deletion: [[PushReceiver.reclaim]] drops every
  *    segment whose line range lies entirely below a consumed offset
  *    (Kafka-style log retention). `reclaimOnCommit` wires it to the
  *    stream's checkpoint commit for single-reader deployments; with
  *    multiple readers, reclaim explicitly at the minimum committed
  *    offset across readers.
  *
  * A sparse line→byte index over the ACTIVE segment lets a micro-batch
  * reader seek near its start offset; readers landing in a sealed segment
  * start at that segment's head and skip forward — bounded by
  * `segmentBytes`, never O(WAL). */
final class PushReceiver private (val walDir: String, requestedPort: Int,
                                  segmentBytes: Long) {
  Files.createDirectories(Paths.get(walDir))

  private def segPath(startLine: Long): Path =
    Paths.get(walDir, f"push.$startLine%020d.wal")

  // legacy single-file layout → segment starting at line 0
  private val legacy = Paths.get(walDir, "push.wal")
  if (Files.exists(legacy)) Files.move(legacy, segPath(0L))

  /** (startLine, path) per live segment, ascending; last = active. */
  private val segments: scala.collection.mutable.ArrayBuffer[(Long, Path)] = {
    val listing = Files.list(Paths.get(walDir))
    val found =
      try listing.iterator().asScala
        .filter(p => p.getFileName.toString.matches("push\\.\\d{20}\\.wal"))
        .map(p => (p.getFileName.toString.stripPrefix("push.").stripSuffix(".wal").toLong, p))
        .toBuffer.sortBy((t: (Long, Path)) => t._1)
      finally listing.close()
    scala.collection.mutable.ArrayBuffer(found.toSeq: _*)
  }

  private val IndexEvery = 1024
  // activeIndex(k) = byte offset (within the active segment) where the
  // k-th indexed line of that segment starts; line numbers are global.
  private val activeIndex = scala.collection.mutable.ArrayBuffer[Long](0L)
  @volatile private var lineCount: Long = 0L
  private var bytePos: Long = 0L // within the active segment

  if (segments.isEmpty) segments += ((0L, segPath(0L)))
  private var activeStart: Long = segments.last._1
  lineCount = activeStart

  // recovery: scan ONLY the active segment (bounded by segmentBytes)
  if (Files.exists(segments.last._2)) {
    val in = new java.io.BufferedInputStream(Files.newInputStream(segments.last._2))
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
            if ((lineCount - activeStart) % IndexEvery == 0) activeIndex += lastNl
          }
          b = in.read()
        }
        bytePos = lastNl
        pos
      } finally in.close()
    if (total != bytePos) { // trailing partial line: never acknowledged
      val ch = java.nio.channels.FileChannel.open(segments.last._2, StandardOpenOption.WRITE)
      try ch.truncate(bytePos) finally ch.close()
    }
  }

  private val server = new ServerSocket(requestedPort)
  private var out = Files.newOutputStream(segments.last._2,
    StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  @volatile private var closed = false

  def port: Int = server.getLocalPort
  def count: Long = lineCount
  def segmentLimit: Long = segmentBytes

  /** Earliest line still on disk (0 until a reclaim deletes segments). */
  def firstRetainedLine: Long = synchronized(segments.head._1)

  /** Live segments as (startLine, path) ascending — snapshot for planning. */
  def segmentList: Seq[(Long, String)] =
    synchronized(segments.map { case (s, p) => (s, p.toString) }.toSeq)

  /** Seek hint for a reader starting at global line `line`:
    * (segmentPath, byteOffset, lineAtOffset). Active segment → sparse
    * index; sealed segment → its head (skip bounded by segmentBytes). */
  def seekFor(line: Long): (String, Long, Long) = synchronized {
    require(line >= segments.head._1,
      s"offset $line below the retained floor ${segments.head._1} — reclaimed by retention")
    if (line >= activeStart) {
      val k = math.min((line - activeStart) / IndexEvery, (activeIndex.size - 1).toLong).toInt
      (segments.last._2.toString, activeIndex(k), activeStart + k.toLong * IndexEvery)
    } else {
      // last segment whose startLine <= line
      val seg = segments.takeWhile(_._1 <= line).last
      (seg._2.toString, 0L, seg._1)
    }
  }

  /** Drop every segment whose whole line range is below `upToLine`
    * (exclusive). Never touches the active segment. Returns the number of
    * segments deleted. Only reclaim below an offset durably committed by
    * every reader — lines below it become unreadable. */
  def reclaim(upToLine: Long): Int = synchronized {
    var removed = 0
    // a segment's end = next segment's start; active segment never drops
    while (segments.size > 1 && segments(1)._1 <= upToLine) {
      Files.deleteIfExists(segments.head._2)
      segments.remove(0)
      removed += 1
    }
    removed
  }

  private def rollIfNeeded(incomingBytes: Long): Unit = {
    // roll BEFORE the write: the active segment never exceeds the budget
    // by more than one line, and a segment always holds >= 1 line
    if (bytePos > 0 && bytePos + incomingBytes > segmentBytes) {
      out.close()
      activeStart = lineCount
      segments += ((activeStart, segPath(activeStart)))
      out = Files.newOutputStream(segments.last._2,
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      bytePos = 0L
      activeIndex.clear()
      activeIndex += 0L
    }
  }

  private def handle(sock: Socket): Unit = {
    val br = new java.io.BufferedReader(
      new java.io.InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
    try {
      var line = br.readLine()
      while (line != null) {
        val bytes = line.getBytes(StandardCharsets.UTF_8)
        synchronized {
          rollIfNeeded(bytes.length + 1L)
          out.write(bytes); out.write('\n'); out.flush()
          bytePos += bytes.length + 1
          lineCount += 1
          if ((lineCount - activeStart) % IndexEvery == 0) activeIndex += bytePos
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

  /** No-rotation default: one segment for the receiver's lifetime. */
  val NoSegmentLimit: Long = Long.MaxValue

  /** The receiver for `walDir`, starting it on first use. A later caller
    * asking for a DIFFERENT explicit rotation budget than the live
    * receiver's fails loudly — getOrElseUpdate would otherwise silently
    * keep the first configuration and the caller's retention would never
    * engage (an unrotated active segment can never be reclaimed). Callers
    * passing the default defer to whatever is running. */
  def ensure(walDir: String, port: Int,
             segmentBytes: Long = NoSegmentLimit): PushReceiver = {
    // constructing a PushReceiver binds a ServerSocket, spawns the
    // acceptor thread, and opens the active WAL segment for append —
    // TrieMap.getOrElseUpdate may evaluate the factory in two racing
    // threads and the loser's receiver would leak all three (plus race
    // the legacy-WAL migration move). Serialize construction explicitly;
    // reads (boundPort) stay lock-free on the TrieMap.
    val r = active.synchronized {
      active.getOrElseUpdate(walDir, new PushReceiver(walDir, port, segmentBytes))
    }
    require(segmentBytes == NoSegmentLimit || segmentBytes == r.segmentLimit,
      s"push receiver for $walDir is already running with segmentBytes=" +
        s"${r.segmentLimit}; requested $segmentBytes (stop it first)")
    r
  }

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
      Option(properties.get("maxRowsPerTrigger")).map(_.toLong),
      Option(properties.get("segmentBytes")).map(_.toLong)
        .getOrElse(PushReceiver.NoSegmentLimit),
      Option(properties.get("reclaimOnCommit")).exists(_.toBoolean))
  }
}

final class GraftPushTable(walDir: String, port: Int, maxRows: Option[Long],
                           segmentBytes: Long, reclaimOnCommit: Boolean)
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
        private val rcv = PushReceiver.ensure(walDir, port, segmentBytes)
        override def planInputPartitions(): Array[InputPartition] = {
          // count FIRST: segments only roll forward, so a segment snapshot
          // taken after the count always covers [from, end) — the reverse
          // order could admit lines whose (freshly rolled) segment is
          // missing from the snapshot, silently truncating the batch
          val end = rcv.count
          val from = rcv.firstRetainedLine
          val (path, pos, line) = rcv.seekFor(from)
          Array(PushInputPartition(rcv.segmentList, from, end, path, pos, line))
        }
        override def createReaderFactory(): PartitionReaderFactory = new PushReaderFactory
      }
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new GraftPushMicroBatchStream(walDir, port, maxRows, segmentBytes, reclaimOnCommit)
    }
}

/** Offset = durably received line count. */
case class PushOffset(lines: Long) extends Offset {
  override def json(): String = lines.toString
}

final class GraftPushMicroBatchStream(walDir: String, port: Int, maxRows: Option[Long],
                                      segmentBytes: Long, reclaimOnCommit: Boolean)
    extends MicroBatchStream with SupportsAdmissionControl {

  private val receiver = PushReceiver.ensure(walDir, port, segmentBytes)

  override def initialOffset(): Offset = PushOffset(receiver.firstRetainedLine)
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
      val (path, pos, line) = receiver.seekFor(from)
      Array(PushInputPartition(receiver.segmentList, from, to, path, pos, line))
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = new PushReaderFactory
  /** Checkpoint commit: with `reclaimOnCommit`, offsets below the commit
    * are durably recorded in the stream's checkpoint, so their segments
    * can drop — single-reader log retention with zero extra wiring. */
  override def commit(end: Offset): Unit =
    if (reclaimOnCommit) { receiver.reclaim(end.asInstanceOf[PushOffset].lines); () }
  override def stop(): Unit = ()
}

/** `segments` = (startLine, path) ascending, covering [start, end);
  * (seekPath, seekPos, seekLine) points at/before `start`. */
case class PushInputPartition(segments: Seq[(Long, String)], start: Long, end: Long,
                              seekPath: String, seekPos: Long, seekLine: Long)
    extends InputPartition

final class PushReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PushInputPartition]
    new PushPartitionReader(p.segments, p.start, p.end, p.seekPath, p.seekPos, p.seekLine)
  }
}

/** Reads WAL lines [start, end) across segment files. Segments are sealed
  * once rotated and the active one is append-only, so a replayed range
  * returns bit-identical lines; the (seekPath, seekPos, seekLine) hint
  * bounds the initial skip (< IndexEvery lines in the active segment, or
  * one sealed segment's worth) instead of re-reading the whole WAL. */
final class PushPartitionReader(segments: Seq[(Long, String)], start: Long, end: Long,
                                seekPath: String, seekPos: Long, seekLine: Long)
    extends PartitionReader[InternalRow] {
  // segment files at/after the seek target, in order
  private val files: Iterator[(Long, String)] =
    segments.dropWhile(_._2 != seekPath).iterator
  private var br: java.io.BufferedReader = _
  private var idx = seekLine

  private def openNext(pos: Long): Boolean =
    if (!files.hasNext) false
    else {
      if (br != null) br.close()
      val (_, path) = files.next()
      val ch = java.nio.channels.FileChannel.open(Paths.get(path), StandardOpenOption.READ)
      ch.position(pos)
      br = new java.io.BufferedReader(new java.io.InputStreamReader(
        java.nio.channels.Channels.newInputStream(ch), StandardCharsets.UTF_8))
      true
    }

  openNext(seekPos)
  while (idx < start && readLine() != null) idx += 1
  private var current: String = _

  /** Next line across the segment chain (null only at true end-of-WAL). */
  private def readLine(): String = {
    if (br == null) return null
    var l = br.readLine()
    while (l == null && openNext(0L)) l = br.readLine()
    l
  }

  override def next(): Boolean =
    if (idx >= end) false
    else {
      current = readLine()
      idx += 1
      current != null
    }

  override def get(): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(current)))

  override def close(): Unit = if (br != null) br.close()
}
