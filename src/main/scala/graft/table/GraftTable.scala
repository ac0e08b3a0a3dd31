package graft.table

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Per-column min/max harvested from a data file's parquet footer at commit
  * time. `typ` selects the comparison domain: "long" (int32/int64,
  * timestamps as epoch micros), "double" (float/double), "string" (UTF8
  * binary). min/max are canonical strings so manifest JSON stays
  * precision-exact. */
final case class ColStats(typ: String, min: String, max: String)

/** One manifest-listed data file: path, exact row count, on-disk bytes
  * (byte-based admission control), and column stats (file pruning). */
final case class FileInfo(path: String, rows: Long, bytes: Long,
                          stats: Map[String, ColStats])

/** Parsed manifest content (cached — manifests are immutable once written). */
final case class ManifestData(batchIds: Seq[Long], replacesUpTo: Option[Long],
                              rows: Long, files: Seq[FileInfo])

/** From-scratch snapshot/manifest ACID table (Iceberg-style semantics, zero
  * Iceberg dependency — this sandbox ships Spark jars only; SURVEY §7.2).
  *
  * Layout under `root`:
  * {{{
  *   data/batch=<batchId>/part-*.parquet   column data, one dir per commit
  *   manifests/manifest-<batchId>.json     file list + per-file lineage/rows/bytes/column-stats + metrics
  *   snapshots/v<N>.json                   ordered list of committed manifests
  *   VERSION                               current snapshot number (atomic pointer)
  * }}}
  *
  * Commit protocol (exactly-once, idempotent by batchId):
  *   1. already committed? → no-op (replays of a committed micro-batch
  *      change nothing — the north rule's idempotent-commit criterion)
  *   2. write data files (overwrite — a retried half-written batch dir is
  *      simply rewritten; readers never see it because only manifest-listed
  *      files are readable)
  *   3. write manifest via tmp + atomic rename
  *   4. write snapshot v+1 and atomically swap VERSION
  *
  * Readers resolve VERSION → snapshot → manifests → exact file list, so
  * crash leftovers in data/ are invisible. Renames are atomic on local and
  * HDFS filesystems; object stores would swap a pointer object instead.
  */
final class GraftTable(val root: String, checkpointInterval: Int = 64) {

  private def p(parts: String*): Path = Paths.get(root, parts: _*)

  private def writeAtomic(target: Path, content: String): Unit = {
    Files.createDirectories(target.getParent)
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def version: Long =
    if (Files.exists(p("VERSION"))) new String(Files.readAllBytes(p("VERSION")), StandardCharsets.UTF_8).trim.toLong
    else 0L

  // ---- metadata caches -----------------------------------------------
  // Manifests and snapshot nodes are immutable once written, so parsed
  // results are memoized per instance: without this, a long-lived V2
  // reader re-walks the parent chain, re-probes snapshot files, and
  // re-parses every manifest's JSON on EVERY trigger — O(versions) driver
  // metadata I/O per micro-batch (round-2 advisor finding). vacuum() (the
  // only operation that deletes metadata) clears them.
  private val chainCache = scala.collection.concurrent.TrieMap.empty[Long, Seq[String]]
  private val manifestCache = scala.collection.concurrent.TrieMap.empty[String, ManifestData]
  private val addedCache = scala.collection.concurrent.TrieMap.empty[Long, Option[Seq[String]]]

  private def invalidateMetaCaches(): Unit = {
    chainCache.clear(); manifestCache.clear(); addedCache.clear()
    idsCacheVersion = -1L
  }

  /** Resolve snapshot v's full manifest list. Snapshots are a parent+delta
    * chain ({"parent": v-1, "added": [m]}) with a full {"manifests": [...]}
    * checkpoint every `checkpointInterval` commits, so commit cost is O(1)
    * amortized instead of rewriting the whole O(commits) list every time
    * (the round-1 flaw), while any historical version stays resolvable in
    * ≤ checkpointInterval file reads (then memoized). */
  private def snapshotManifests(v: Long): Seq[String] =
    if (v == 0) Nil
    else chainCache.getOrElseUpdate(v, {
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(Files.readAllBytes(p("snapshots", s"v$v.json")))
      if (node.has("manifests"))
        node.get("manifests").elements().asScala.map(_.asText()).toSeq
      else
        snapshotManifests(node.get("parent").asLong()) ++
          node.get("added").elements().asScala.map(_.asText()).toSeq
    })

  private def mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Parsed (and memoized) manifest content. */
  def manifest(name: String): ManifestData =
    manifestCache.getOrElseUpdate(name, {
      val node = mapper.readTree(Files.readAllBytes(p("manifests", name)))
      val batchIds =
        if (node.has("batchIds")) node.get("batchIds").elements().asScala.map(_.asLong()).toSeq
        else Seq(node.get("batchId").asLong())
      val replaces = if (node.has("replacesUpTo")) Some(node.get("replacesUpTo").asLong()) else None
      val files = node.get("files").elements().asScala.map { f =>
        val stats =
          if (!f.has("stats")) Map.empty[String, ColStats]
          else f.get("stats").properties().asScala.map { e =>
            val s = e.getValue
            e.getKey -> ColStats(s.get("t").asText(), s.get("min").asText(), s.get("max").asText())
          }.toMap
        FileInfo(f.get("path").asText(), f.get("rows").asLong(),
          if (f.has("bytes")) f.get("bytes").asLong() else 0L, stats)
      }.toSeq
      ManifestData(batchIds, replaces, node.get("rows").asLong(), files)
    })

  // (version, ids) cache: commit() consults committedBatchIds every batch,
  // and re-reading every manifest's JSON per commit would make per-commit
  // I/O O(commits) again (defeating the O(1) snapshot chain). The cache is
  // advanced incrementally by commit()/compact(); a version mismatch (e.g.
  // another writer instance) falls back to the full read.
  private var idsCacheVersion: Long = -1L
  private var idsCache: Set[Long] = Set.empty

  /** Batch ids covered by the current snapshot. Read from manifest CONTENT
    * (a compaction manifest carries the ids of every batch it rewrote, so
    * replays of compacted-away batches stay no-ops). */
  def committedBatchIds: Set[Long] = synchronized {
    val v = version
    if (v != idsCacheVersion) {
      idsCache = snapshotManifests(v).flatMap(m => manifest(m).batchIds).toSet
      idsCacheVersion = v
    }
    idsCache
  }

  /** (isRewrite, replacesUpTo) for one manifest: a compaction manifest
    * replaces every version ≤ replacesUpTo. */
  def manifestRewriteInfo(name: String): (Boolean, Long) = synchronized {
    manifest(name).replacesUpTo.map((true, _)).getOrElse((false, 0L))
  }

  /** Ordered manifest names of snapshot `v` (manifest k-1 is the one added
    * by commit k — the V2 source's version→files resolution). */
  def manifestsUpTo(v: Long): Seq[String] = synchronized { snapshotManifests(v) }

  /** Manifests ADDED by commit k (the V2 source's per-version delta):
    * straight from the chain node's `added` list, or a set-diff at full
    * checkpoints / rewrites. None ⇔ version k was expired by [[vacuum]]
    * (snapshot file gone) — fresh readers skip it (its manifests are not
    * in the live chain), resumed readers behind it must fail loudly. */
  def manifestsAddedAt(k: Long): Option[Seq[String]] = synchronized {
    if (k <= 0) Some(Nil)
    else if (addedCache.contains(k)) addedCache(k)
    else {
      val r = manifestsAddedAtUncached(k)
      // cache Some (immutable while live) and None only for k inside the
      // committed range (= expired forever); a not-yet-committed k must
      // stay uncached or a later commit would be invisible
      if (r.isDefined || k <= version) addedCache.put(k, r)
      r
    }
  }

  private def manifestsAddedAtUncached(k: Long): Option[Seq[String]] = {
    if (!Files.exists(p("snapshots", s"v$k.json"))) None
    else {
      val node = mapper.readTree(Files.readAllBytes(p("snapshots", s"v$k.json")))
      if (node.has("added"))
        Some(node.get("added").elements().asScala.map(_.asText()).toSeq)
      else if (k > 1 && !Files.exists(p("snapshots", s"v${k - 1}.json")))
        // legacy full node with an expired predecessor: the delta is
        // unrecoverable — returning the full chain here once re-delivered
        // every earlier row to resumed readers. Treat as expired (loud
        // fail for resumed readers, skip for fresh ones).
        None
      else {
        val prev = if (k == 1) Set.empty[String] else snapshotManifests(k - 1).toSet
        Some(snapshotManifests(k).filterNot(prev))
      }
    }
  }

  /** (path, rows) for every data file of one manifest. */
  def manifestFileRows(name: String): Seq[(String, Long)] = synchronized {
    manifest(name).files.map(f => (f.path, f.rows))
  }

  /** Full [[FileInfo]] (rows + bytes + column stats) of one manifest. */
  def manifestFiles(name: String): Seq[FileInfo] = synchronized {
    manifest(name).files
  }

  /** Exact readable file list (manifest-controlled — never a dir glob). */
  def dataFiles: Seq[String] = synchronized {
    snapshotManifests(version).flatMap(m => manifest(m).files.map(_.path))
  }

  def read(spark: SparkSession): DataFrame = readVersion(spark, version)

  /** Time travel: read the table exactly as of snapshot `v` (snapshots are
    * immutable manifest lists, so any historical version stays readable). */
  def readVersion(spark: SparkSession, v: Long): DataFrame = {
    require(v >= 0 && v <= version, s"snapshot v$v does not exist (latest: v$version)")
    val files = synchronized {
      snapshotManifests(v).flatMap(m => manifest(m).files.map(_.path))
    }
    if (files.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(files: _*)
  }

  /** Incremental streaming read over the table (S1 analog: the unbounded
    * change stream), served by the DataSourceV2 [[GraftMicroBatchStream]]:
    * offsets are snapshot versions and each micro-batch's file list comes
    * from the manifests — a crashed writer's half-written batch dir under
    * data/ is structurally invisible, nothing is copied or linked, and the
    * offset log survives file renames/compaction (unlike the round-1
    * hardlink `published/` directory this replaces). */
  def readStream(spark: SparkSession, maxFilesPerTrigger: Int = 32,
                 maxBytesPerTrigger: Option[Long] = None): DataFrame = {
    val r = spark.readStream.format(classOf[GraftSourceProvider].getName)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
    maxBytesPerTrigger.foreach(b => r.option("maxBytesPerTrigger", b))
    r.load(root)
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""

  /** Column min/max from an open file's footer: only top-level primitive
    * columns with trustworthy chunk statistics; a chunk with missing stats
    * disqualifies its column for that file (conservative — the file is
    * then never pruned on that column). */
  private def footerStats(md: org.apache.parquet.hadoop.metadata.ParquetMetadata): Map[String, ColStats] = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val acc = scala.collection.mutable.Map.empty[String, ColStats]
    val dead = scala.collection.mutable.Set.empty[String]
    md.getBlocks.asScala.foreach { block =>
      block.getColumns.asScala.foreach { chunk =>
        val pathParts = chunk.getPath.toArray
        if (pathParts.length == 1) {
          val colName = pathParts(0)
          val st = chunk.getStatistics
          val tn = chunk.getPrimitiveType.getPrimitiveTypeName
          val isStr = chunk.getPrimitiveType.getLogicalTypeAnnotation
            .isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation]
          // a chunk with PRESENT-but-empty stats is ambiguous: parquet-mr
          // also omits binary min/max when they exceed MAX_STATS_SIZE, so
          // "no bounds" only means "all null" when the null count proves
          // it — otherwise the column's file-level bounds would not cover
          // this chunk and pruning on them would drop rows
          val provablyAllNull = st != null && !st.hasNonNullValue &&
            st.isNumNullsSet && st.getNumNulls == chunk.getValueCount
          if (st == null || (!st.hasNonNullValue && !provablyAllNull)) dead += colName
          else if (st.hasNonNullValue) {
            val enc: Option[(String, String, String, (String, String) => Boolean)] = tn match {
              case INT64 | INT32 =>
                Some(("long", st.genericGetMin.toString, st.genericGetMax.toString,
                  (a: String, b: String) => a.toLong < b.toLong))
              case DOUBLE | FLOAT =>
                Some(("double", st.genericGetMin.toString, st.genericGetMax.toString,
                  (a: String, b: String) => a.toDouble < b.toDouble))
              case BINARY if isStr =>
                // merge in UTF-8 BYTE order (parquet's stats comparator and
                // Spark's UTF8String order), not Java's UTF-16 String order
                Some(("string",
                  st.genericGetMin.asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8,
                  st.genericGetMax.asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8,
                  (a: String, b: String) => FilePrune.utf8Cmp(a, b) < 0))
              case _ => None
            }
            enc.foreach { case (t, mn, mx, lt) =>
              acc.get(colName) match {
                case None => acc(colName) = ColStats(t, mn, mx)
                case Some(prev) =>
                  acc(colName) = ColStats(t,
                    if (lt(mn, prev.min)) mn else prev.min,
                    if (lt(prev.max, mx)) mx else prev.max)
              }
            }
          } // all-null chunk: contributes no bounds, earlier bounds stay valid
        }
      }
    }
    (acc -- dead).toMap
  }

  /** Per-file lineage + column stats from freshly written parquet FOOTERS —
    * driver-side metadata reads only, no second Spark job over the data.
    * The directory stream is CLOSED (Files.list holds an fd until closed;
    * leaking one per commit starves the driver over a long stream). */
  private def writtenFiles(dataDir: Path, hconf: org.apache.hadoop.conf.Configuration): Array[FileInfo] = {
    val listing = Files.list(dataDir)
    try {
      listing.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f.toUri), hconf)
          val rd = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try FileInfo(f.toString, rd.getRecordCount, Files.size(f), footerStats(rd.getFooter))
          finally rd.close()
        }.toArray.sortBy((x: FileInfo) => x.path)
    } finally listing.close()
  }

  private def filesJsonOf(written: Array[FileInfo]): String =
    written.map { fi =>
      val statsJson = fi.stats.toSeq.sortBy(_._1).map { case (c, s) =>
        s"""${jsonStr(c)}:{"t":${jsonStr(s.typ)},"min":${jsonStr(s.min)},"max":${jsonStr(s.max)}}"""
      }.mkString("{", ",", "}")
      s"""{"path":${jsonStr(fi.path)},"rows":${fi.rows},"bytes":${fi.bytes},"stats":$statsJson}"""
    }.mkString("[", ",", "]")

  /** Commit one micro-batch. Returns false (no-op) if batchId is already in
    * the current snapshot. Lineage = per-output-file row counts. */
  def commit(df: DataFrame, batchId: Long, metrics: Map[String, Long] = Map.empty): Boolean = synchronized {
    if (committedBatchIds.contains(batchId)) return false
    val dataDir = p("data", s"batch=$batchId")
    df.write.mode("overwrite").parquet(dataDir.toString)

    val written = writtenFiles(dataDir, df.sparkSession.sessionState.newHadoopConf())
    val totalRows = written.map(_.rows).sum
    val filesJson = filesJsonOf(written)
    val metricsJson = metrics.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${jsonStr(k)}:$v" }.mkString("{", ",", "}")
    val manifestName = s"manifest-$batchId.json"
    writeAtomic(p("manifests", manifestName),
      s"""{"batchId":$batchId,"rows":$totalRows,"files":$filesJson,"metrics":$metricsJson}""")

    val v = version
    // every node carries its own "added" list: per-version deltas must stay
    // resolvable even after vacuum expires the predecessor a full
    // checkpoint would otherwise be diffed against (a diff fallback with a
    // missing predecessor silently returned the WHOLE chain as "added")
    val snapshotJson =
      if ((v + 1) % checkpointInterval == 0) {
        // periodic full checkpoint bounds the resolution walk
        val manifests = snapshotManifests(v) :+ manifestName
        s"""{"version":${v + 1},"added":[${jsonStr(manifestName)}],"manifests":${manifests.map(jsonStr).mkString("[", ",", "]")}}"""
      } else
        s"""{"version":${v + 1},"parent":$v,"added":[${jsonStr(manifestName)}]}"""
    writeAtomic(p("snapshots", s"v${v + 1}.json"), snapshotJson)
    writeAtomic(p("VERSION"), (v + 1).toString)
    if (idsCacheVersion == v) { idsCache += batchId; idsCacheVersion = v + 1 }
    true
  }

  /** Compact the current snapshot's data files into `targetFiles` files
    * (small-file compaction — O(commits) file counts are the other half of
    * the 100 TB story next to O(1) snapshot commits). Appends a REWRITE
    * manifest (`replacesUpTo` = the compacted version, carrying every
    * rewritten batchId) under a full-checkpoint snapshot; old versions stay
    * readable (their files are never deleted here), replays of compacted
    * batches stay no-ops, and the V2 change stream either backfills the
    * rewrite (fresh readers) or skips it (readers past it) — a resume
    * point strictly inside the compacted range fails loudly instead of
    * duplicating rows. */
  def compact(spark: SparkSession, targetFiles: Int = 32): Long = synchronized {
    val v = version
    require(v > 0, "nothing to compact")
    val batchIds = committedBatchIds
    val dataDir = p("data", s"rewrite=v$v")
    readVersion(spark, v).repartition(targetFiles)
      .write.mode("overwrite").parquet(dataDir.toString)

    val written = writtenFiles(dataDir, spark.sessionState.newHadoopConf())
    val filesJson = filesJsonOf(written)
    val manifestName = s"manifest-rewrite-v$v.json"
    writeAtomic(p("manifests", manifestName),
      s"""{"replacesUpTo":$v,"batchIds":${batchIds.toSeq.sorted.mkString("[", ",", "]")},"rows":${written.map(_.rows).sum},"files":$filesJson,"metrics":{}}""")
    writeAtomic(p("snapshots", s"v${v + 1}.json"),
      s"""{"version":${v + 1},"added":[${jsonStr(manifestName)}],"manifests":[${jsonStr(manifestName)}]}""")
    writeAtomic(p("VERSION"), (v + 1).toString)
    if (idsCacheVersion == v) idsCacheVersion = v + 1 // same ids, new version
    v + 1
  }

  /** Retention: expire snapshots older than `keepFromVersion` and delete
    * every data file and manifest no snapshot ≥ keepFromVersion references.
    * The retention CONTRACT (same as any snapshot table): time travel to
    * expired versions stops working, and a streaming reader must be past
    * the expired range — vacuum after `compact()` only once readers have
    * caught up (their offsets are snapshot versions, so "caught up" is
    * checkable). Returns the number of deleted data files. */
  def vacuum(keepFromVersion: Long): Int = synchronized {
    val cur = version
    require(keepFromVersion >= 1 && keepFromVersion <= cur,
      s"keepFromVersion must be in [1, $cur]")
    require(Files.exists(p("snapshots", s"v$keepFromVersion.json")),
      s"snapshot v$keepFromVersion was already expired by an earlier vacuum")
    // ONE chain resolution at the keep point + the per-version added
    // deltas after it — O(range) metadata reads, not a fresh chain walk
    // per kept version
    val keptManifests = (snapshotManifests(keepFromVersion) ++
      (keepFromVersion + 1 to cur).flatMap(k => manifestsAddedAt(k).getOrElse(Nil))).toSet
    val keptFiles = keptManifests.flatMap(m => manifestFileRows(m).map(_._1))

    var deleted = 0
    val dataRoot = p("data")
    if (Files.exists(dataRoot)) {
      val dirs = Files.list(dataRoot)
      try dirs.iterator().asScala.foreach { dir =>
        val files = Files.list(dir)
        try files.iterator().asScala.foreach { f =>
          if (f.getFileName.toString.endsWith(".parquet") && !keptFiles.contains(f.toString)) {
            Files.delete(f); deleted += 1
          }
        } finally files.close()
      } finally dirs.close()
    }
    // expired snapshots + manifests last: readers resolve files first, so
    // a crash mid-vacuum leaves only harmless extra metadata. Kept delta
    // snapshots resolve through their PARENT chain, which bottoms out at
    // the nearest full checkpoint at or below keepFromVersion — snapshot
    // files may only be deleted strictly below that floor.
    val floor = {
      var k = keepFromVersion
      var f = 0L
      while (k > 0 && f == 0L) {
        val node = mapper.readTree(Files.readAllBytes(p("snapshots", s"v$k.json")))
        if (node.has("manifests")) f = k else k -= 1
      }
      f
    }
    (1L until floor).foreach { v =>
      Files.deleteIfExists(p("snapshots", s"v$v.json"))
    }
    val manifestsDir = p("manifests")
    if (Files.exists(manifestsDir)) {
      val listing = Files.list(manifestsDir)
      try listing.iterator().asScala.foreach { m =>
        if (!keptManifests.contains(m.getFileName.toString)) Files.delete(m)
      } finally listing.close()
    }
    invalidateMetaCaches() // snapshot/manifest files were deleted
    deleted
  }

  /** Total committed row count straight from manifests (no data scan). */
  def committedRows: Long = synchronized {
    snapshotManifests(version).map(m => manifest(m).rows).sum
  }
}

/** Exactly-once streaming sink over [[GraftTable]]: plug into
  * `writeStream.foreachBatch(sink.write _)`. Spark's checkpoint gives
  * at-least-once foreachBatch invocation; the batchId-keyed idempotent
  * commit upgrades it to exactly-once table contents.
  *
  * With `lineage = true`, every row carries (_lineage_batch, _lineage_part,
  * _lineage_row) — the (batch, record, result) analog of the reference's
  * order-preserving splice (processor.go:137-256): the pipeline is map-only
  * (no shuffle), so partition-local row order IS source file order, and
  * `ORDER BY` the triple reconstructs the replay order deterministically.
  *
  * `clusterBy` is the partition-layout lever (SURVEY §7.2): rows are
  * RANGE-partitioned + sorted on the given columns before the write, so
  * each data file covers a narrow value range and the manifest's min/max
  * stats make equality/range predicates on those columns prune to few
  * files — Spark-first "hidden partitioning": the layout lives in the
  * data + stats (the column stays IN the files, so reads need no
  * path-derived columns), not in directory names. `clusterFiles` pins the
  * file count (AQE otherwise sizes — and may coalesce — the ranges).
  * Note: clusterBy introduces one shuffle per micro-batch; leave it empty
  * for strictly map-only sinks (lineage row order is per-FILE after
  * clustering, not source order). */
final class ExactlyOnceSink(table: GraftTable,
                            metrics: Long => Map[String, Long] = _ => Map.empty,
                            lineage: Boolean = false,
                            clusterBy: Seq[String] = Nil,
                            clusterFiles: Option[Int] = None) {
  def write(df: DataFrame, batchId: Long): Unit = {
    val clustered =
      if (clusterBy.isEmpty) df
      else {
        val cols = clusterBy.map(col)
        (clusterFiles match {
          case Some(n) => df.repartitionByRange(n, cols: _*)
          case None => df.repartitionByRange(cols: _*)
        }).sortWithinPartitions(cols: _*)
      }
    val out =
      if (!lineage) clustered
      else clustered
        .withColumn("_lineage_batch", lit(batchId))
        .withColumn("_lineage_part", spark_partition_id().cast("long"))
        // low 33 bits of monotonically_increasing_id = per-partition counter
        .withColumn("_lineage_row",
          monotonically_increasing_id().bitwiseAND(lit((1L << 33) - 1)))
    table.commit(out, batchId, metrics(batchId))
  }
}
