package graft.sources

import java.io.{ByteArrayInputStream, File, FileInputStream, FileOutputStream}
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import com.github.luben.zstd.{ZstdInputStream, ZstdOutputStream}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.functions.ProtoWire

/** DataSource V2 reader for the engine's own sink format: directories
  * of `*.proto.zst` files holding varint-framed proto3 `Row{key,
  * repeated Column{name, value, writeTime}}` messages (the reference's
  * output, `Runner.java:114-145` + `sstable.proto`). This is the §4.3
  * "custom source" path: one input partition PER FILE — reproducing the
  * reference's per-file unit of work (O1) and preserving within-file
  * row order, so a downstream per-key nest over a key-sorted file needs
  * no shuffle.
  *
  * Usage: `spark.read.format("proto-zst").load(dir)`.
  */
class ProtoZstDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "proto-zst"
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ProtoZstTable.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    // `load(dir)` arrives as "path"; `load(p1, p2, ...)` as a "paths"
    // JSON array (the DataFrameReader multi-path contract) — the latter
    // is what metadata-planned maintenance (q77's small-file optimize)
    // uses to read an explicit file subset
    val paths: Seq[String] = Option(properties.get("path")).map(Seq(_))
      .orElse(Option(properties.get("paths")).map { js =>
        new com.fasterxml.jackson.databind.ObjectMapper()
          .readValue(js, classOf[Array[String]]).toSeq
      }).getOrElse(Seq.empty)
    // honor a bucketed directory's layout even through the path-based
    // API (writes keep bucketing); only the CATALOG path may also
    // REPORT the partitioning, because only it carries the
    // FunctionCatalog that lets Catalyst resolve the bucket transform.
    // A multi-path read never reports a joint layout.
    new ProtoZstTable(paths,
      paths match {
        case Seq(only) => GraftBucket.readSpec(only, ProtoZstFiles.hadoopConf())
        case _ => None
      },
      viaCatalog = false)
  }
}

/** Crash injection around the streaming epoch commit — the
  * exactly-once specs (PipelineSpec's q208 crash-restart rows) throw
  * from these to simulate a driver dying immediately BEFORE the
  * manifest epoch commit (batch replayed wholesale on restart) and
  * immediately AFTER it (replay detected, duplicate files rolled
  * back, published files spared). No-ops outside tests; volatile so
  * the spec's arm/disarm is visible to the stream's commit thread.
  */
private[graft] object EpochCommitHooks {
  @volatile var beforeCommit: Long => Unit = _ => ()
  @volatile var afterCommit: Long => Unit = _ => ()
  def reset(): Unit = { beforeCommit = _ => (); afterCommit = _ => () }
}

object ProtoZstTable {
  /** The sink's logical schema — §1.4's nested Row representation. */
  val Schema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("columns", ArrayType(StructType(Seq(
      StructField("name", BinaryType),
      StructField("value", BinaryType),
      StructField("write_time", LongType)))))))
}

class ProtoZstTable(paths: Seq[String], buckets: Option[Int] = None,
    viaCatalog: Boolean = false) extends Table
    with SupportsRead with SupportsWrite {
  def this(path: String, buckets: Option[Int], viaCatalog: Boolean) =
    this(Seq(path), buckets, viaCatalog)
  override def name(): String = s"proto-zst(${paths.mkString(",")})"
  override def schema(): StructType = ProtoZstTable.Schema
  override def partitioning(): Array[Transform] =
    buckets.map(n => org.apache.spark.sql.connector.expressions.Expressions
      .bucket(n, "key")).toArray
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE,
      TableCapability.MICRO_BATCH_READ).asJava

  /** Write side (batch + streaming): each task writes one zstd file of
    * varint-framed Row messages — encode happens IN the writer, so
    * callers hand over the nested (key, columns) rows directly:
    * `nested.write.format("proto-zst").save(dir)`. Task commit is
    * write-to-tmp + rename (atomic on a local/posix fs; a cluster
    * deployment points this at a committer-backed FS). One file per
    * (epoch, partition, task) keeps the sink embarrassingly parallel —
    * the scalable restatement of the reference's single fold stream
    * (`Runner.java:75-82`).
    */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    if (paths.length != 1)
      throw new UnsupportedOperationException(
        s"proto-zst write needs exactly one target directory, got $paths")
    val dir = paths.head
    // a job-level abort rolls back the tasks that DID commit (their
    // tmp→final renames) so a retried job can't double-count rows;
    // runs on the driver, where the session conf is at hand.
    // PUBLISHED files are spared: a failure thrown AFTER the manifest
    // commit (a driver dying between our epoch commit and Spark's own
    // commit log surfaces as commit() throwing, which routes Spark
    // here) must not delete files the committed — authoritative —
    // entry set references, or the manifest would point at holes.
    // Replay duplicates and genuinely-uncommitted task output carry
    // fresh job-UUID names the manifest has never seen, so they go.
    def rollback(msgs: Array[WriterCommitMessage]): Unit = {
      val dirPath = new org.apache.hadoop.fs.Path(dir)
      val conf = ProtoZstFiles.hadoopConf()
      val fs = dirPath.getFileSystem(conf)
      val published: Set[String] = GenManifest.read(dir, conf)
        .map(_.entries.iterator.map(_.name).toSet).getOrElse(Set.empty)
      msgs.foreach {
        case c: ProtoZstCommit => c.files.filterNot(published).foreach { f =>
          val data = new org.apache.hadoop.fs.Path(dirPath, f)
          fs.delete(data, false)
          RangeSidecar.delete(fs, data)
        }
        case _ => ()
      }
    }
    // driver-side job/epoch commit: fold every task's entries into the
    // generation manifest as ONE atomic version bump — the point after
    // which (and only after which) manifest readers see the new files
    def publish(msgs: Array[WriterCommitMessage]): Unit = {
      val entries = msgs.flatMap {
        case c: ProtoZstCommit => c.entries
        case _ => Seq.empty
      }
      if (entries.nonEmpty) {
        GenManifest.append(dir, ProtoZstFiles.hadoopConf(),
          entries.toIndexedSeq)
        ()
      }
    }
    // Streaming epoch commit must be IDEMPOTENT (the StreamingWrite
    // contract): a driver failure between our manifest commit and
    // Spark's own commit log replays the micro-batch, whose retried
    // tasks wrote a second set of files for the same data. The
    // committed (query, epoch) key rides inside the manifest snapshot,
    // so the duplicate commit is detected atomically and the replay's
    // files are deleted instead of published.
    val streamQueryId = info.queryId()
    def publishEpoch(epochId: Long,
        msgs: Array[WriterCommitMessage]): Unit = {
      val entries = msgs.flatMap {
        case c: ProtoZstCommit => c.entries
        case _ => Seq.empty
      }
      if (entries.nonEmpty) {
        EpochCommitHooks.beforeCommit(epochId)
        if (GenManifest.appendEpoch(dir, ProtoZstFiles.hadoopConf(),
            s"$streamQueryId/$epochId", entries.toIndexedSeq).isEmpty)
          rollback(msgs)
        else EpochCommitHooks.afterCommit(epochId)
      }
    }
    val bucketSpec = buckets
    // partitioned-export mode: roll a new file per key-prefix group
    // (see ProtoZstWriterFactory.splitPrefix); a bucketed directory's
    // layout wins if both are somehow set
    val splitPrefix = Option(info.options.get("splitKeyPrefix")).map(_.toInt)
      .filter(_ => buckets.isEmpty)
    val frameRows = Option(info.options.get("splitFrameRows")).map(_.toInt)
      .getOrElse(ProtoZstWriterFactory.DefaultSplitFrameRows)
    new WriteBuilder {
      // Factory creation runs on the DRIVER before any task starts:
      // marking here makes the directory manifest-governed BEFORE the
      // first data file can appear, so readers racing the job plan
      // from snapshots (empty until the first commit) instead of
      // listing not-yet-published task files.
      private def batchWrite: BatchWrite = new BatchWrite {
        override def createBatchWriterFactory(p: PhysicalWriteInfo): DataWriterFactory = {
          GenManifest.mark(dir, ProtoZstFiles.hadoopConf())
          new ProtoZstWriterFactory(dir, bucketSpec, splitPrefix, frameRows)
        }
        override def commit(msgs: Array[WriterCommitMessage]): Unit =
          publish(msgs)
        override def abort(msgs: Array[WriterCommitMessage]): Unit =
          rollback(msgs)
      }
      private def streamingWrite: StreamingWrite = new StreamingWrite {
        override def createStreamingWriterFactory(p: PhysicalWriteInfo): StreamingDataWriterFactory = {
          GenManifest.mark(dir, ProtoZstFiles.hadoopConf())
          new ProtoZstWriterFactory(dir, bucketSpec, splitPrefix, frameRows)
        }
        override def commit(epochId: Long, msgs: Array[WriterCommitMessage]): Unit =
          publishEpoch(epochId, msgs)
        override def abort(epochId: Long, msgs: Array[WriterCommitMessage]): Unit =
          rollback(msgs)
      }
      override def build(): Write = bucketSpec match {
        // catalog-path bucketed write: ask Spark to cluster incoming
        // rows by the V2 bucket function (ONE exchange of exactly
        // `buckets` partitions) and key-sort within each, so every task
        // writes whole buckets of key-sorted rows — the layout the
        // scan's reported partitioning and range sidecars describe.
        // Resolving the transform needs the FunctionCatalog, hence
        // catalog path only; path-based writes still bucket per row in
        // the writer, just without the planner-enforced clustering.
        case Some(n) if viaCatalog =>
          import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
          import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}
          new Write with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
            override def requiredDistribution(): Distribution =
              Distributions.clustered(Array(Expressions.bucket(n, "key")))
            override def requiredNumPartitions(): Int = n
            override def requiredOrdering(): Array[SortOrder] =
              Array(Expressions.sort(Expressions.column("key"),
                SortDirection.ASCENDING))
            override def toBatch: BatchWrite = batchWrite
            override def toStreaming: StreamingWrite = streamingWrite
          }
        case _ => new Write {
          override def toBatch: BatchWrite = batchWrite
          override def toStreaming: StreamingWrite = streamingWrite
        }
      }
    }
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ProtoZstScanBuilder(paths, options, buckets, viaCatalog)
}

/** Scan builder with the two §4.3 optimizations the reference gets from
  * its index files: key-predicate pushdown (the index-summary seek,
  * `SSTableScannerPatched.java:56-93` — here: a kept/dropped decision on
  * the key bytes alone, columns never decoded for dropped frames) and
  * column pruning (a key-only projection skips Column decode entirely).
  */
class ProtoZstScanBuilder(paths: Seq[String], options: CaseInsensitiveStringMap,
    buckets: Option[Int] = None, viaCatalog: Boolean = false)
    extends ScanBuilder
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {
  // O15 analog (`markSuspect`, `SSTableReaderPatched.java:248-253`):
  // with ignoreCorrupt=true a file whose tail fails to decode yields
  // its valid prefix instead of failing the task.
  private val ignoreCorrupt = options.getBoolean("ignoreCorrupt", false)
  // streaming admission control: cap files per micro-batch (parquet
  // file-source parity); 0/absent = unlimited
  private val maxFilesPerTrigger: Option[Int] =
    Option(options.get("maxFilesPerTrigger")).map { v =>
      val n = v.toInt
      require(n > 0, s"maxFilesPerTrigger must be positive, got $n")
      n
    }
  // byte-denominated backpressure twin (Delta parity — a soft max):
  // whole files are admitted until their attested sizes reach the
  // budget, the crossing file included, always at least one
  private val maxBytesPerTrigger: Option[Long] =
    Option(options.get("maxBytesPerTrigger")).map { v =>
      val n = v.toLong
      require(n > 0, s"maxBytesPerTrigger must be positive, got $n")
      n
    }
  // files larger than this split into parallel slices at recorded
  // zstd-frame boundaries (see SplitSidecar); manifest-governed scans
  // only, since the decision needs attested sizes
  private val splitFileBytes: Long =
    Option(options.get("splitFileBytes")).map { v =>
      val n = v.toLong
      require(n > 0, s"splitFileBytes must be positive, got $n")
      n
    }.getOrElse(ProtoZstScan.DefaultSplitFileBytes)
  /** Temporal file skip, opt-in: a CLOSED µs window over CELL write
    * times. A manifest-governed scan drops whole files whose recorded
    * time range provably misses the window ([[ManifestIndex
    * .skipByTime]]) — Cassandra's SSTable-level min/max-timestamp skip.
    * CONTRACT: the caller asserts it only cares about cells written
    * inside the window; rows of skipped files (including their
    * cell-less rows) do not appear, and KEPT files still return ALL
    * their rows — the row-level predicate stays the query's job, this
    * option only prunes I/O. Listing-path scans (foreign dirs,
    * explicit files) and legacy manifests have no time stats and read
    * everything — absence degrades to reading.
    */
  private val timeBounds: Option[(Long, Long)] = {
    val lo = Option(options.get("minWriteTimeUs")).map(_.toLong)
    val hi = Option(options.get("maxWriteTimeUs")).map(_.toLong)
    if (lo.isEmpty && hi.isEmpty) None
    else {
      val b = (lo.getOrElse(Long.MinValue), hi.getOrElse(Long.MaxValue))
      require(b._1 <= b._2,
        s"empty write-time window: minWriteTimeUs ${b._1} > maxWriteTimeUs ${b._2}")
      Some(b)
    }
  }
  /** Streaming start cut (Kafka's `startingTimestamp` analog): on the
    * FIRST start of a stream (no checkpointed offset), skip the
    * longest manifest-order PREFIX of files whose recorded time range
    * is provably entirely older than this µs instant — a tail-read of
    * a long-lived sink directory starts at the live edge instead of
    * replaying the whole backlog. Prefix-only, so offset arithmetic is
    * untouched; the cut stops at the first file that cannot be proven
    * old (no time stats, or a range reaching the instant). Listing-
    * mode (foreign) directories have no attested times and start at 0.
    */
  private val startingWriteTimeUs: Option[Long] =
    Option(options.get("startingWriteTimeUs")).map(_.toLong)
  /** TIME TRAVEL, opt-in: plan the scan from the manifest snapshot at
    * this pinned version instead of HEAD — the "read release N"
    * primitive (Delta's `versionAsOf`). Strict by design: requires ONE
    * manifest-governed root (each root numbers its own versions — a
    * multi-root pin would be ambiguous) and a RETAINED version; any
    * miss throws at plan time rather than silently answering from HEAD
    * or a listing. Valid across append-only commits (the export /
    * streaming-sink history); file-rewriting maintenance (OPTIMIZE,
    * erasure) deletes replaced originals immediately — erasure must be
    * irreversible — so a pin older than such a commit fails at read.
    */
  private val manifestVersion: Option[Long] =
    Option(options.get("manifestVersion")).map { v =>
      val n = v.toLong
      require(n >= 1, s"manifestVersion must be a committed version >= 1, got $n")
      require(paths.size == 1,
        s"manifestVersion pins ONE directory's snapshot; got ${paths.size} roots")
      n
    }
  /** Ceiling on the LIVE equality-delete tombstone bytes a scan will
    * load driver-side (the anti-set ships to every task with the
    * reader factory). Crossing it fails loudly with "run purge" —
    * tombstones are a between-purges buffer, bounded by maintenance
    * cadence, never an unbounded accumulator; a cap keeps that
    * contract mechanical instead of aspirational.
    */
  private val maxTombstoneBytes: Long =
    Option(options.get("maxTombstoneBytes")).map { v =>
      val n = v.toLong
      require(n > 0, s"maxTombstoneBytes must be positive, got $n")
      n
    }.getOrElse(ProtoZstScan.DefaultMaxTombstoneBytes)
  private var required: StructType = ProtoZstTable.Schema
  private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty
  private var aggregated: Option[(StructType, Array[Any], String)] = None

  override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = {
    pushed = filters.filter(KeyPredicate.supported)
    // conservative contract (same as the parquet source): the scan uses
    // the pushed predicates to SKIP frames, Spark still re-evaluates
    // every filter post-scan
    filters
  }
  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Statistics pushdown from the `.range` sidecars: an ungrouped,
    * unfiltered COUNT(*)/MIN(key)/MAX(key) is answered at PLAN time
    * from metadata every sink task already wrote at commit — the whole
    * scan collapses to one precomputed row; no file is opened, no
    * frame decompressed. The engine analog of answering `count()` from
    * parquet footers, and of the reference's Statistics.db (row counts
    * and key bounds kept beside the data,
    * `SSTableReaderPatched.java:221-233`). Any file without a counted
    * sidecar (foreign writer, all-null keys, pre-count format) vetoes
    * the pushdown and the scan proceeds normally — metadata absence
    * degrades, never lies. The driver reads one tiny sidecar per file,
    * the same I/O the range-skip planner already does.
    */
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = timeBounds.isEmpty && translate(agg).isDefined

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean =
    // a time-bounded scan must NOT collapse to whole-corpus sidecar
    // stats: the pushed COUNT/MIN/MAX would cover pruned files' rows
    if (timeBounds.isDefined) false
    else translate(agg) match {
      case Some(v) => aggregated = Some(v); true
      case None => false
    }

  // Spark calls supportCompletePushDown then pushAggregation with the
  // same Aggregation; translating costs a manifest read (or a listing
  // plus one sidecar read PER FILE on legacy dirs), so the result is
  // memoized per builder — plan-time metadata I/O is paid once.
  private var translated:
      Option[(String, Option[(StructType, Array[Any], String)])] = None

  private def translate(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Option[(StructType, Array[Any], String)] = {
    val sig = agg.toString
    translated match {
      case Some((s, v)) if s == sig => v
      case _ =>
        val v = translateUncached(agg)
        translated = Some((sig, v))
        v
    }
  }

  private def translateUncached(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Option[(StructType, Array[Any], String)] = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
    def isKey(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
      e match {
        case r: NamedReference => r.fieldNames.sameElements(Array("key"))
        case _ => false
      }
    val funcs = agg.aggregateExpressions
    val describable = agg.groupByExpressions.isEmpty && pushed.isEmpty &&
      funcs.nonEmpty && funcs.forall {
        case _: CountStar => true
        case m: Min => isKey(m.column)
        case m: Max => isKey(m.column)
        case _ => false
      }
    if (!describable) None
    else {
      val conf = ProtoZstFiles.hadoopConf()
      // (count, ranged mins, ranged maxs) per file: from the manifest
      // when every root has one (ONE tiny read, no listing, no sidecar
      // opens); else from the legacy listing + per-file sidecars, where
      // any file without a counted sidecar vetoes the pushdown
      // MIN/MAX need every file's range: a range-less entry (minHex ""
      // — either a legacy all-null file, or a file whose true min is
      // the EMPTY key, which hex-encodes to the same sentinel) could
      // hold the global minimum, so its presence vetoes min/max
      // pushdown; COUNT(*) only needs counts and survives.
      val needRange = funcs.exists {
        case _: Min | _: Max => true
        case _ => false
      }
      // a pinned version answers from THAT snapshot's stats (strict:
      // loadAt throws on a gc'd version, so the legacy sidecar
      // fallback below — which reads HEAD-era files — stays unreachable
      // under a pin)
      val metaView = manifestVersion match {
        case Some(v) => Some(ManifestIndex.loadAt(paths.head, conf, v))
        case None => ManifestIndex.load(paths, conf)
      }
      val stats: Option[(Long, Seq[Array[Byte]], Seq[Array[Byte]])] =
        metaView match {
          // live equality-delete tombstones veto EVERY complete
          // pushdown: the recorded per-file stats count rows the
          // tombstones logically deleted (and how many they matched is
          // unknowable without reading — keys may be absent or repeat),
          // so an answered COUNT/MIN/MAX could be wrong. Purge restores
          // the pushdown.
          case Some(metas) if metas.exists(_.tomb) => None
          case Some(metas) if needRange && metas.exists(_.min.isEmpty) =>
            None
          case Some(metas) =>
            Some((metas.map(_.count).sum,
              metas.flatMap(_.min).toSeq, metas.flatMap(_.max).toSeq))
          case None =>
            val files = ProtoZstFiles.listAll(paths, conf)
            val fs = new org.apache.hadoop.fs.Path(paths.head).getFileSystem(conf)
            val sides = files.map(f =>
              RangeSidecar.read(fs, new org.apache.hadoop.fs.Path(f)))
            // a sidecar predating the count line (count < 0) vetoes
            // everything; MIN/MAX additionally demand NORMALIZED (v2)
            // sidecars with a non-empty min, mirroring the manifest-
            // path veto above: a v1 sidecar may come from a writer
            // that excluded null-key rows from min/max while counting
            // them — those rows read back as EMPTY keys today, so its
            // recorded range can be wrong even when non-empty — and
            // an empty-sentinel min is ambiguous at any version
            // (all-null legacy file vs a true empty-key minimum).
            if (sides.exists(s => s.isEmpty || s.get.count < 0L) ||
                (needRange && sides.exists(s =>
                  !s.get.normalized || s.get.min.isEmpty))) None
            else {
              val ranges = sides.map(_.get)
              Some((ranges.map(_.count).sum,
                ranges.map(_.min).toSeq, ranges.map(_.max).toSeq))
            }
        }
      stats.map { case (total, mins, maxs) =>
        val ord = (a: Array[Byte], b: Array[Byte]) =>
          java.util.Arrays.compareUnsigned(a, b)
        val mn = if (mins.isEmpty) null else mins.reduce((a, b) => if (ord(a, b) <= 0) a else b)
        val mx = if (maxs.isEmpty) null else maxs.reduce((a, b) => if (ord(a, b) >= 0) a else b)
        val fields = funcs.map {
          case _: CountStar => StructField("count(*)", LongType, nullable = false)
          case _: Min => StructField("min(key)", BinaryType)
          case _: Max => StructField("max(key)", BinaryType)
        }
        val values = funcs.map[Any] {
          case _: CountStar => total
          case _: Min => mn
          case _: Max => mx
        }
        (StructType(fields), values,
          funcs.map(_.toString).mkString(", "))
      }
    }
  }

  override def build(): Scan = aggregated match {
    case Some((schema, values, desc)) =>
      new ProtoZstAggScan(paths.mkString(","), schema, values, desc)
    case None =>
      new ProtoZstScan(paths, ignoreCorrupt, required, pushed, buckets,
        viaCatalog, maxFilesPerTrigger, timeBounds, startingWriteTimeUs,
        manifestVersion, maxBytesPerTrigger, splitFileBytes,
        maxTombstoneBytes)
  }
}

/** The collapsed scan a completely-pushed aggregation builds: one
  * partition, one row, values precomputed on the driver from the
  * `.range` sidecars. readSchema fields are positional per the pushed
  * `Aggregation`'s function list.
  */
class ProtoZstAggScan(path: String, schema: StructType,
    values: Array[Any], pushedDesc: String) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"proto-zst($path) PushedAggregation: [$pushedDesc]"
  override def planInputPartitions(): Array[InputPartition] =
    Array(ProtoZstAggPartition(values))
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private var done = false
          private val row = new GenericInternalRow(
            p.asInstanceOf[ProtoZstAggPartition].values)
          override def next(): Boolean = if (done) false else { done = true; true }
          override def get(): InternalRow = row
          override def close(): Unit = ()
        }
    }
}

case class ProtoZstAggPartition(values: Array[Any]) extends InputPartition

/** Java-serializable wrapper for a Hadoop `Configuration` (which is
  * `Writable` but not `Serializable`) — lets driver-built reader/writer
  * factories carry the session's fs.* settings to executors. The
  * standard connector pattern (Spark's own utility is `private[spark]`).
  */
class SerializableHadoopConf(@transient var value: org.apache.hadoop.conf.Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}

/** Sorted `.proto.zst` listing — the shared O1 source-discovery step.
  * Hadoop-FS based, so a proto-zst directory can live on any filesystem
  * the session can reach (local, HDFS, S3A); paths without a scheme
  * resolve against the session's `fs.defaultFS`.
  */
object ProtoZstFiles {
  import org.apache.hadoop.fs.Path

  /** The active session's Hadoop conf (fs settings/credentials); a bare
    * default conf outside any session (direct construction in tests).
    */
  def hadoopConf(): org.apache.hadoop.conf.Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(org.apache.spark.sql.graft.Shim.hadoopConf)
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  def list(path: String, conf: org.apache.hadoop.conf.Configuration): Array[String] =
    listWithSizes(path, conf).map(_._1)

  /** As [[list]] but keeping each file's length from the SAME
    * listStatus (no extra round-trips) — the streaming byte-budget
    * admission's listing-mode source; manifest mode reads bytes from
    * the snapshot and never stats a file.
    */
  def listWithSizes(path: String,
      conf: org.apache.hadoop.conf.Configuration): Array[(String, Long)] = {
    MetaIO.dataListings.incrementAndGet()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) Array.empty
    else {
      val st = fs.getFileStatus(p)
      val files =
        if (st.isFile) Array(st)
        else fs.listStatus(p)
          .filter(s => s.isFile && s.getPath.getName.endsWith(".proto.zst"))
      files.sortBy(_.getPath.getName)
        .map(s => (s.getPath.toString, s.getLen))
    }
  }

  /** Union listing over several roots (directories and/or explicit
    * files), de-duplicated and sorted by full path for a stable global
    * partition order.
    */
  def listAll(paths: Seq[String],
      conf: org.apache.hadoop.conf.Configuration): Array[String] =
    paths.toArray.flatMap(list(_, conf)).distinct.sorted
}

object ProtoZstScan {
  /** Files above this split into frame-boundary slices (scan option
    * `splitFileBytes` overrides). 128 MB ≈ one parquet row-group's
    * worth of work per task; toy-scale files never cross it, so
    * default scans keep their zero-sidecar-read planning.
    */
  val DefaultSplitFileBytes: Long = 128L << 20

  /** Default ceiling on live tombstone bytes a scan will carry (scan
    * option `maxTombstoneBytes` overrides). 64 MB of keys is far past
    * any sane purge cadence — the cap exists to turn "someone forgot
    * maintenance for a year" into a loud error instead of a silent
    * driver/task memory creep.
    */
  val DefaultMaxTombstoneBytes: Long = 64L << 20

  private val BucketTag = """.*-b(\d+)\.proto\.zst$""".r

  /** The bucket id the bucketed writer embedded in a file name. */
  def bucketOf(file: String): Option[Int] = file match {
    case BucketTag(b) => Some(b.toInt)
    case _ => None
  }

  /** Drop files whose `.range` sidecar proves the pushed key predicate
    * can't match; files without a readable sidecar always scan. Only
    * NORMALIZED (v2) sidecars may skip: a v1 range can exclude
    * null-key rows that read back as empty keys, so trusting it could
    * drop a file an empty-key predicate actually matches
    * ([[RangeSidecar.Range]]'s vintage contract).
    */
  def skipByRange(files: Array[String],
      filters: Array[org.apache.spark.sql.sources.Filter],
      conf: SerializableHadoopConf): Array[String] =
    if (filters.isEmpty || files.isEmpty) files
    else {
      val fs = new org.apache.hadoop.fs.Path(files.head)
        .getFileSystem(conf.value)
      val couldMatch = KeyPredicate.compileRange(filters)
      files.filter { f =>
        RangeSidecar.read(fs, new org.apache.hadoop.fs.Path(f)) match {
          case Some(r) if r.normalized => couldMatch(r.min, r.max)
          case _ => true
        }
      }
    }
}

class ProtoZstScan(paths: Seq[String], ignoreCorrupt: Boolean,
    override val readSchema: StructType,
    filters: Array[org.apache.spark.sql.sources.Filter],
    buckets: Option[Int] = None, viaCatalog: Boolean = false,
    maxFilesPerTrigger: Option[Int] = None,
    timeBounds: Option[(Long, Long)] = None,
    startingWriteTimeUs: Option[Long] = None,
    manifestVersion: Option[Long] = None,
    maxBytesPerTrigger: Option[Long] = None,
    splitFileBytes: Long = ProtoZstScan.DefaultSplitFileBytes,
    maxTombstoneBytes: Long = ProtoZstScan.DefaultMaxTombstoneBytes)
    extends Scan
    with Batch
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning
    with org.apache.spark.sql.connector.read.SupportsReportOrdering
    with org.apache.spark.sql.connector.read.SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering {
  // captured on the driver at scan-build time; ships to executors with
  // the reader factory
  private val conf = new SerializableHadoopConf(ProtoZstFiles.hadoopConf())

  /** Runtime (DPP-style) file pruning: the scan advertises `key` as
    * runtime-filterable, so a selective join against a small dimension
    * hands the build side's actual key set to [[filter]] AFTER it is
    * known — and whole files whose sidecar range misses every key are
    * dropped before a byte is read. Static pushdown can't see these
    * keys (they come from another table's data); this is the dynamic
    * half of the index-summary seek, and at 100 TB it's what makes
    * "join the corpus to this week's cohort" read the cohort's files
    * instead of the corpus.
    */
  private var runtimeFilters: Array[org.apache.spark.sql.sources.Filter] =
    Array.empty
  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("key"))
  override def filter(fs: Array[org.apache.spark.sql.sources.Filter]): Unit =
    runtimeFilters = fs.filter(KeyPredicate.supported)
  override def toBatch: Batch = this
  override def description(): String =
    s"proto-zst PushedFilters: [${filters.mkString(", ")}], " +
      s"ReadSchema: ${readSchema.simpleString}" +
      buckets.map(n => s", Buckets: $n").getOrElse("") +
      timeBounds.map { case (lo, hi) =>
        s", WriteTimeWindowUs: [$lo, $hi]" }.getOrElse("") +
      manifestVersion.map(v => s", ManifestVersion: $v").getOrElse("")

  /** The generation manifest's view of the roots, when EVERY root has
    * one: file set + per-file stats from ONE tiny read per root — no
    * data-directory listing, no per-file sidecar opens, ever (PlanSpec
    * asserts both counters stay at zero). None (foreign/legacy dirs,
    * explicit-file loads) falls back to listing + sidecars below.
    */
  private lazy val manifestMeta: Option[Array[FileMeta]] =
    manifestVersion match {
      // pinned: plan from exactly that snapshot — loadAt throws on a
      // missing/gc'd version or a non-governed root, so the listing
      // fallback below can never quietly answer a pinned read from HEAD
      case Some(v) => Some(ManifestIndex.loadAt(paths.head, conf.value, v))
      case None => ManifestIndex.load(paths, conf.value)
    }

  /** Live equality-delete tombstone files in the planned snapshot —
    * loaded driver-side (bounded by [[maxTombstoneBytes]]) and shipped
    * to every task as the scan's anti-set. Listing-path scans have no
    * manifest and therefore no tombstone semantics.
    */
  private lazy val tombMeta: Array[FileMeta] =
    manifestMeta.map(_.filter(_.tomb)).getOrElse(Array.empty)

  // the post-skip metadata, fixed once so outputPartitioning() and
  // planInputPartitions() describe the same file set. Manifest-backed:
  // range skip evaluates against the in-memory entries. DATA files
  // only: tombstone entries are the scan's anti-set, never its input.
  private lazy val plannedMeta: Option[Array[FileMeta]] =
    manifestMeta.map { m =>
      val ranged = ManifestIndex.skipByRange(m.filterNot(_.tomb), filters)
      timeBounds.fold(ranged) { case (lo, hi) =>
        ManifestIndex.skipByTime(ranged, lo, hi)
      }
    }

  private lazy val plannedFiles: Array[String] = plannedMeta match {
    case Some(metas) => metas.map(_.path)
    case None =>
      ProtoZstScan.skipByRange(ProtoZstFiles.listAll(paths, conf.value), filters, conf)
  }

  /** bucket id → that bucket's files, when EVERY planned file carries a
    * bucket tag (`-bNNNN` in the name, written by the bucketed writer).
    * A single untagged file (foreign writer) disables grouping — the
    * scan silently degrades to per-file partitions, never lies to the
    * planner.
    */
  private lazy val grouped: Option[Array[(Int, Array[String])]] =
    buckets.filter(_ => viaCatalog && plannedFiles.nonEmpty).flatMap { _ =>
      val tagged = plannedFiles.map(f => ProtoZstScan.bucketOf(f).map(_ -> f))
      if (tagged.exists(_.isEmpty)) None
      else Some(tagged.flatten.groupBy(_._1).view
        .mapValues(_.map(_._2)).toArray.sortBy(_._1))
    }

  /** §4.3's `SupportsReportPartitioning`: a bucketed directory read
    * through the catalog reports `KeyGroupedPartitioning(bucket(n,
    * key), groups)` — Catalyst then plans co-bucketed joins/merges over
    * sink generations with ZERO exchanges (storage-partitioned join)
    * instead of reshuffling data that is already clustered on disk.
    */
  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    grouped match {
      case Some(g) =>
        new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
          Array(org.apache.spark.sql.connector.expressions.Expressions
            .bucket(buckets.get, "key")), g.length)
      case None =>
        new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(
          plannedFiles.length)
    }

  /** §4.3's `SupportsReportOrdering`, guarded by RECORDED sortedness:
    * each split is key-ASC iff every bucket group is a single file
    * whose sidecar attests its rows were written key-sorted (the
    * catalog write's required ordering produces exactly this). Catalyst
    * then elides the per-partition Sort under sort-merge plans over
    * sink generations — the last piece of "pay the layout cost at
    * write time, every later pass is narrow". Multi-file groups or
    * unattested files report no ordering; never a wrong one.
    */
  override def outputOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] = {
    import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection}
    // sortedness attestation: from the manifest entries when present
    // (no I/O), else from each file's sidecar
    def attested(file: String): Boolean = plannedMeta match {
      case Some(metas) => metas.exists(m => m.path == file && m.sorted)
      case None =>
        val fs = new org.apache.hadoop.fs.Path(paths.head)
          .getFileSystem(conf.value)
        // v1 sortedness was tracked over non-null keys only; empty
        // keys interleaved among them would break a sort-assuming
        // merge, so only normalized sidecars may attest order
        RangeSidecar.read(fs, new org.apache.hadoop.fs.Path(file))
          .exists(r => r.normalized && r.sorted)
    }
    val ok = grouped.exists { g =>
      g.forall { case (_, files) =>
        files.length == 1 && attested(files.head)
      }
    }
    if (ok)
      Array(Expressions.sort(Expressions.column("key"),
        SortDirection.ASCENDING))
    else Array.empty
  }

  /** Conservative decoded-size multiplier over the on-disk zstd bytes:
    * text-heavy cell payloads decompress ~3-5×; overestimating keeps a
    * borderline table OUT of broadcast rather than broadcasting
    * something too big.
    */
  private val DecodeExpansion = 4L

  /** Plan-time table statistics from metadata the sink already wrote:
    * row count = the sum of per-file sidecar counts (absent if ANY
    * planned file lacks a counted sidecar — absence degrades to
    * unknown, never lies), size = on-disk bytes × [[DecodeExpansion]].
    * Without this a DSv2 relation defaults to "unknown = huge", so a
    * SMALL sink directory joined to a big fact table is never chosen
    * as the broadcast side at plan time — at 100 TB that's the
    * difference between shipping a dimension-sized corpus slice to
    * every executor task's hash table and shuffling the fact table.
    * Stats are computed over [[plannedFiles]], i.e. AFTER plan-time
    * sidecar range skipping, so a selective key predicate shrinks the
    * estimate the same way partition pruning shrinks parquet's.
    */
  // memoized: Catalyst may call estimateStatistics repeatedly during
  // planning, and plannedFiles is fixed once filters are pushed — one
  // getFileStatus + sidecar read per file TOTAL, not per call, so plan
  // time stays flat in file count exactly where the stats matter
  private lazy val computedStatistics
      : org.apache.spark.sql.connector.read.Statistics = {
    val (bytes, rows) = plannedMeta match {
      // manifest-backed: bytes and counts were recorded at commit —
      // zero getFileStatus, zero sidecar reads, O(1) I/O in file count.
      // Live tombstones subtract their key counts from the estimate:
      // an upper bound on rows actually removed (keys may be absent),
      // so the estimate errs low — fine for an ESTIMATE, and the
      // complete-agg pushdown (which must be exact) is vetoed
      // separately while tombstones live.
      case Some(metas) =>
        (metas.map(_.bytes).sum,
          java.util.OptionalLong.of(math.max(0L,
            metas.map(_.count).sum - tombMeta.map(_.count).sum)))
      case None =>
        val fs = new org.apache.hadoop.fs.Path(paths.head)
          .getFileSystem(conf.value)
        val b = plannedFiles.map(f =>
          fs.getFileStatus(new org.apache.hadoop.fs.Path(f)).getLen).sum
        val sides = plannedFiles.map(f =>
          RangeSidecar.read(fs, new org.apache.hadoop.fs.Path(f)))
        val r =
          if (sides.forall(s => s.isDefined && s.get.count >= 0L))
            java.util.OptionalLong.of(sides.map(_.get.count).sum)
          else java.util.OptionalLong.empty()
        (b, r)
    }
    val size = math.max(1L, bytes * DecodeExpansion)
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(size)
      override def numRows(): java.util.OptionalLong = rows
    }
  }

  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics = computedStatistics

  // one partition per file == the reference's per-file unit of work;
  // under a pushed key predicate, files whose sidecar range provably
  // misses are dropped HERE — never listed as work, never opened (the
  // index-summary seek, `SSTableReaderPatched.java:221-233`, at the
  // granularity that matters on a 1000-executor cluster: whole files).
  // When bucket-grouping is active, the unit is one BUCKET (all its
  // files), keyed for the planner via HasPartitionKey.
  /** Runtime (DPP-style) prune of an already-planned file list: from
    * the manifest's in-memory ranges when present, else per-file
    * sidecar reads.
    */
  private def runtimeSkip(files: Array[String]): Array[String] =
    plannedMeta match {
      case Some(metas) =>
        val byPath = metas.map(m => m.path -> m).toMap
        ManifestIndex.skipByRange(files.flatMap(byPath.get), runtimeFilters)
          .map(_.path)
      case None => ProtoZstScan.skipByRange(files, runtimeFilters, conf)
    }

  override def planInputPartitions(): Array[InputPartition] =
    grouped match {
      case Some(g) =>
        // runtime filters prune files WITHIN each bucket but never drop
        // the bucket itself: the reported KeyGroupedPartitioning must
        // keep describing the same groups (an empty bucket just reads
        // nothing)
        g.map { case (b, fs) =>
          ProtoZstBucketPartition(runtimeSkip(fs), b): InputPartition
        }
      case None =>
        val files = runtimeSkip(plannedFiles)
        plannedMeta match {
          case Some(metas) =>
            // manifest sizes are already in memory: large files slice
            // at recorded frame boundaries (one .split sidecar read
            // per OVERSIZED file only — a straggler saved per RPC)
            val bytesOf = metas.map(m => m.path -> m.bytes).toMap
            files.flatMap { f =>
              val sz = bytesOf.getOrElse(f, 0L)
              if (sz <= splitFileBytes)
                Array(ProtoZstInputPartition(f): InputPartition)
              else sliced(f, sz)
            }
          case None =>
            files.map(ProtoZstInputPartition(_): InputPartition)
        }
    }

  /** Slice one oversized file into frame-aligned byte ranges of about
    * `splitFileBytes` each; no/unreadable sidecar degrades to a single
    * partition.
    */
  private def sliced(file: String, size: Long): Array[InputPartition] = {
    val p = new org.apache.hadoop.fs.Path(file)
    val cuts = SplitSidecar.read(p.getFileSystem(conf.value), p)
      .map(_.map(_._1).filter(o => o > 0 && o < size))
      .getOrElse(Array.empty[Long])
    if (cuts.isEmpty)
      return Array(ProtoZstInputPartition(file))
    val slices = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var start = 0L
    cuts.foreach { c =>
      if (c - start >= splitFileBytes) { slices += ((start, c)); start = c }
    }
    slices += ((start, size))
    if (slices.length == 1) Array(ProtoZstInputPartition(file))
    else slices.map { case (s, e) =>
      ProtoZstSlicePartition(file, s, e): InputPartition
    }.toArray
  }
  /** The scan's ANTI-SET: every key named by a live tombstone file,
    * decoded once on the driver, deduped, and unsigned-sorted so task
    * readers drop matches with a binary search. Bounded by
    * [[maxTombstoneBytes]] over the entries' ATTESTED sizes (checked
    * before a byte is read); crossing the cap demands a purge instead
    * of degrading into an ever-growing per-task set. Empty (the
    * overwhelmingly common case) costs nothing anywhere.
    */
  private lazy val deletedKeys: Array[Array[Byte]] =
    TombstoneKeys.read(tombMeta.map(m => (m.path, m.bytes)).toIndexedSeq,
      conf.value, Some(maxTombstoneBytes))

  override def createReaderFactory(): PartitionReaderFactory =
    new ProtoZstReaderFactory(ignoreCorrupt, readSchema, filters, conf,
      deletedKeys)
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    if (paths.length != 1)
      throw new UnsupportedOperationException(
        "proto-zst streaming read monitors exactly one directory, got " + paths)
    if (manifestVersion.isDefined)
      throw new UnsupportedOperationException(
        "manifestVersion pins a frozen snapshot — it cannot tail new " +
          "commits; use a batch read for a pinned version, or " +
          "startingWriteTimeUs to start a stream at an instant")
    new ProtoZstMicroBatchStream(paths.head, ignoreCorrupt, readSchema,
      filters, maxFilesPerTrigger, startingWriteTimeUs, maxBytesPerTrigger)
  }
}

/** Offset = position in the sorted file listing (count of files already
  * delivered). `json` is just that integer.
  */
object KeyPredicate {
  import org.apache.spark.sql.sources._

  private def bin(v: Any): Option[Array[Byte]] = v match {
    case b: Array[Byte] => Some(b)
    case _ => None
  }

  def supported(f: Filter): Boolean = f match {
    case EqualTo("key", v) => bin(v).isDefined
    case GreaterThan("key", v) => bin(v).isDefined
    case GreaterThanOrEqual("key", v) => bin(v).isDefined
    case LessThan("key", v) => bin(v).isDefined
    case LessThanOrEqual("key", v) => bin(v).isDefined
    case In("key", vs) => vs.forall(bin(_).isDefined)
    case IsNotNull("key") => true
    case And(l, r) => supported(l) && supported(r)
    case Or(l, r) => supported(l) && supported(r)
    case Not(c) => supported(c)
    case _ => false
  }

  def compile(fs: Array[Filter]): Array[Byte] => Boolean = {
    val ps = fs.map(one)
    k => ps.forall(_(k))
  }

  private def cmp(k: Array[Byte], v: Array[Byte]): Int =
    java.util.Arrays.compareUnsigned(k, v)

  /** Interval version for file skipping: "COULD any key in [min, max]
    * satisfy the conjunction?" — an over-approximation (true = must
    * scan, false = provably no match, safe to drop the file). Filters
    * with no sound interval form (IsNotNull, Not) contribute `true`.
    */
  def compileRange(fs: Array[Filter]): (Array[Byte], Array[Byte]) => Boolean = {
    val ps = fs.map(oneRange)
    (mn, mx) => ps.forall(_(mn, mx))
  }

  private def oneRange(f: Filter): (Array[Byte], Array[Byte]) => Boolean = f match {
    case EqualTo("key", v) =>
      val b = bin(v).get; (mn, mx) => cmp(b, mn) >= 0 && cmp(b, mx) <= 0
    case GreaterThan("key", v) =>
      val b = bin(v).get; (_, mx) => cmp(mx, b) > 0
    case GreaterThanOrEqual("key", v) =>
      val b = bin(v).get; (_, mx) => cmp(mx, b) >= 0
    case LessThan("key", v) =>
      val b = bin(v).get; (mn, _) => cmp(mn, b) < 0
    case LessThanOrEqual("key", v) =>
      val b = bin(v).get; (mn, _) => cmp(mn, b) <= 0
    case In("key", vs) =>
      val bs = vs.map(bin(_).get)
      (mn, mx) => bs.exists(b => cmp(b, mn) >= 0 && cmp(b, mx) <= 0)
    case And(l, r) =>
      val (a, b) = (oneRange(l), oneRange(r)); (mn, mx) => a(mn, mx) && b(mn, mx)
    case Or(l, r) =>
      val (a, b) = (oneRange(l), oneRange(r)); (mn, mx) => a(mn, mx) || b(mn, mx)
    case _ => (_, _) => true
  }

  /** The finite CANDIDATE KEY SET a pushed conjunction confines `key`
    * to, if any — what gates the per-task bloom probe: Some(keys) is
    * returned only when at least one conjunct is an equality/IN (or an
    * Or-tree of them), so every row that can pass the filters has
    * key ∈ keys. Conjuncts with no finite form (ranges, IsNotNull)
    * only narrow further and are ignored soundly; sets from multiple
    * conjuncts intersect. None means "not a point lookup" — the scan
    * never touches a bloom.
    */
  def pointKeys(fs: Array[Filter]): Option[Seq[Array[Byte]]] = {
    def finite(f: Filter): Option[Seq[Array[Byte]]] = f match {
      case EqualTo("key", v) => bin(v).map(Seq(_))
      case In("key", vs) =>
        val bs = vs.flatMap(bin(_))
        if (bs.length == vs.length) Some(bs.toSeq) else None
      case And(l, r) => (finite(l), finite(r)) match {
        case (Some(a), Some(b)) =>
          Some(a.filter(x => b.exists(java.util.Arrays.equals(x, _))))
        case (a, None) => a
        case (None, b) => b
      }
      case Or(l, r) =>
        for { a <- finite(l); b <- finite(r) } yield a ++ b
      case _ => None
    }
    val sets = fs.flatMap(finite(_))
    if (sets.isEmpty) None
    else Some(sets.reduce((a, b) =>
      a.filter(x => b.exists(java.util.Arrays.equals(x, _)))))
  }

  private def one(f: Filter): Array[Byte] => Boolean = f match {
    case EqualTo("key", v) => k => java.util.Arrays.equals(k, bin(v).get)
    case GreaterThan("key", v) => val b = bin(v).get; k => cmp(k, b) > 0
    case GreaterThanOrEqual("key", v) => val b = bin(v).get; k => cmp(k, b) >= 0
    case LessThan("key", v) => val b = bin(v).get; k => cmp(k, b) < 0
    case LessThanOrEqual("key", v) => val b = bin(v).get; k => cmp(k, b) <= 0
    case In("key", vs) =>
      val bs = vs.map(bin(_).get)
      k => bs.exists(java.util.Arrays.equals(k, _))
    case IsNotNull("key") => _ => true // keys are never null on the wire
    case And(l, r) => val (a, b) = (one(l), one(r)); k => a(k) && b(k)
    case Or(l, r) => val (a, b) = (one(l), one(r)); k => a(k) || b(k)
    case Not(c) => val a = one(c); k => !a(k)
    case other =>
      throw new IllegalArgumentException(s"unsupported pushed filter: $other")
  }
}

case class ProtoZstInputPartition(file: String) extends InputPartition

/** One frame-aligned byte range [start, end) of an oversized file —
  * the parallel-read unit for files a single task shouldn't own. The
  * boundaries come from the writer's recorded frame checkpoints, so
  * every slice decodes independently and the slices of a file
  * partition its rows exactly; a slice of a key-sorted file is itself
  * key-sorted, so per-partition ordering attestation survives slicing.
  */
case class ProtoZstSlicePartition(file: String, start: Long, end: Long)
    extends InputPartition

/** One BUCKET of a bucketed directory: all its files, plus the bucket
  * id as the split's partition key — what lets Spark line this split up
  * with the same bucket of another generation in a storage-partitioned
  * join without any exchange.
  */
case class ProtoZstBucketPartition(files: Array[String], bucket: Int)
    extends InputPartition
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](bucket))
}


/** Task commit: the manifest entries (name + stats) of every file this
  * task landed — what the driver-side job/epoch commit folds into the
  * generation manifest. `files`/`rows` views keep rollback simple.
  */
/** EOF after exactly `limit` bytes of the wrapped stream — how a slice
  * reader stops at its frame-aligned end offset without tracking
  * compressed positions through the decompressor's buffering.
  */
private[graft] final class BoundedIn(in: java.io.InputStream,
    private var limit: Long) extends java.io.InputStream {
  override def read(): Int =
    if (limit <= 0) -1
    else { val b = in.read(); if (b >= 0) limit -= 1; b }
  override def read(buf: Array[Byte], off: Int, len: Int): Int = {
    if (limit <= 0) return -1
    val n = in.read(buf, off, math.min(len.toLong, limit).toInt)
    if (n > 0) limit -= n
    n
  }
  override def close(): Unit = in.close()
}

class ProtoZstReaderFactory(ignoreCorrupt: Boolean,
    readSchema: StructType,
    filters: Array[org.apache.spark.sql.sources.Filter],
    conf: SerializableHadoopConf,
    deletedKeys: Array[Array[Byte]] = Array.empty)
    extends PartitionReaderFactory {

  /** Equality-delete probe against the scan's unsigned-sorted anti-set.
    * Runs inside the decoder's keep gate, so a deleted row's Column
    * messages are never even decoded; empty anti-set short-circuits to
    * a constant-false branch the JIT removes.
    */
  private def isDeleted(k: Array[Byte]): Boolean =
    deletedKeys.length > 0 && {
      var lo = 0
      var hi = deletedKeys.length - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val c = java.util.Arrays.compareUnsigned(deletedKeys(mid), k)
        if (c == 0) return true
        else if (c < 0) lo = mid + 1
        else hi = mid - 1
      }
      false
    }

  /** Salvage iterator: stop at the first undecodable message instead of
    * propagating (the per-record analog of the reference's per-file
    * suspect marking — everything before the corruption is kept).
    */
  private def salvaging(it: Iterator[ProtoWire.DecodedRow]) =
    new Iterator[ProtoWire.DecodedRow] {
      private var pending: ProtoWire.DecodedRow = _
      private var ok = fetch()
      private def fetch(): Boolean =
        try { if (it.hasNext) { pending = it.next(); true } else false }
        catch { case _: Exception => false }
      override def hasNext: Boolean = ok
      override def next(): ProtoWire.DecodedRow = {
        val r = pending; ok = fetch(); r
      }
    }

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case ProtoZstInputPartition(file) => single(file)
      case ProtoZstSlicePartition(file, start, end) =>
        single(file, start, end)
      case ProtoZstBucketPartition(files, _) =>
        // one bucket = several files, read back-to-back in one split
        new PartitionReader[InternalRow] {
          private var idx = 0
          private var cur: PartitionReader[InternalRow] = _
          override def next(): Boolean = {
            while (true) {
              if (cur == null) {
                if (idx >= files.length) return false
                cur = single(files(idx))
                idx += 1
              }
              if (cur.next()) return true
              cur.close()
              cur = null
            }
            false
          }
          override def get(): InternalRow = cur.get()
          override def close(): Unit = if (cur != null) cur.close()
        }
      case other =>
        throw new IllegalArgumentException(s"unexpected partition: $other")
    }

  /** The finite candidate-key set of a pushed point lookup, if this
    * scan is one — computed once per factory (it is a pure function of
    * the pushed filters) and serialized to every task as the gate for
    * the per-file bloom probe.
    */
  private lazy val pointLookup: Option[Seq[Array[Byte]]] =
    KeyPredicate.pointKeys(filters)

  private def emptyReader: PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      override def next(): Boolean = false
      override def get(): InternalRow =
        throw new NoSuchElementException("empty bloom-skipped partition")
      override def close(): Unit = ()
    }

  /** The Index.db seek plan for a point lookup over ONE whole sorted
    * file: the minimal set of frame-aligned byte ranges that can hold
    * the candidate keys, from the `.split` v2 boundary index — the
    * reference's two-level read path (Filter.db bloom, then the index
    * summary's `(key, position)` seek, `SSTableReaderPatched.java:54-97`)
    * completed at the granularity a zstd stream can restart at. None =
    * no usable index (v1 sidecar, unsorted or unattested file, a
    * null-key boundary) — degrade to the full-file scan, never to a
    * wrong subset. Segment arithmetic is duplicate-safe: a key equal
    * to a boundary's first key also selects the PREVIOUS segment,
    * because duplicates of that key can straddle the boundary.
    */
  private def seekPlan(file: String): Option[Seq[(Long, Long)]] = {
    val p = new org.apache.hadoop.fs.Path(file)
    val fs = p.getFileSystem(conf.value)
    // uncounted reads: these are per-task DATA-path opens (like the
    // bloom probe), not the plan-time metadata cost sidecarReads guards
    val range =
      try RangeSidecar.readUncounted(fs, p)
      catch { case _: Exception => None }
    if (!range.exists(r => r.normalized && r.sorted)) return None
    val cuts0 = try SplitSidecar.readKeyedUncounted(fs, p).getOrElse(Array.empty)
      catch { case _: Exception => Array.empty[(Long, Long, String)] }
    // Files written before the sink learned to trim it may carry one
    // trailing keyless boundary (row count an exact multiple of
    // splitFrameRows: the frame flushed, the stream closed, no row
    // followed). The range sidecar's row count proves it is a
    // zero-row tail (rows-before == file rows), so it can be dropped
    // instead of disabling the whole file's seek index; a MID-file ""
    // (null-key row) still falls through to the all-keyed check below
    // and degrades to the full scan.
    val cuts =
      if (cuts0.nonEmpty && cuts0.last._3.isEmpty &&
          range.exists(r => r.count >= 0 && r.count == cuts0.last._2))
        cuts0.dropRight(1)
      else cuts0
    if (cuts.isEmpty || cuts.exists(_._3.isEmpty)) return None
    val eof = try fs.getFileStatus(p).getLen
      catch { case _: Exception => return None }
    val firsts: Array[Array[Byte]] = cuts.map(c => GenManifest.unhex(c._3))
    val m = firsts.length
    // segment j ∈ [0, m] spans bytes [off(j-1), off(j)) and keys
    // [first(j-1), first(j)] — both ends inclusive (duplicates may
    // cross boundaries); a candidate k selects segments [a, b] where
    // a = #first < k, b = #first <= k
    def cmp(x: Array[Byte], y: Array[Byte]) =
      java.util.Arrays.compareUnsigned(x, y)
    val segs = scala.collection.mutable.SortedSet.empty[Int]
    pointLookup.get.foreach { k =>
      var lo = 0; var hi = m
      while (lo < hi) { // a = insertion point among strictly-smaller
        val mid = (lo + hi) >>> 1
        if (cmp(firsts(mid), k) < 0) lo = mid + 1 else hi = mid
      }
      val a = lo
      var lo2 = a; var hi2 = m
      while (lo2 < hi2) { // b = insertion point among smaller-or-equal
        val mid = (lo2 + hi2) >>> 1
        if (cmp(firsts(mid), k) <= 0) lo2 = mid + 1 else hi2 = mid
      }
      (a to lo2).foreach(segs += _)
    }
    def off(j: Int): Long = if (j < 0) 0L else if (j >= m) eof else cuts(j)._1
    // merge adjacent segments into maximal byte ranges
    val ranges = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var runStart = -2
    var prev = -2
    (segs.toSeq :+ Int.MinValue).foreach { j =>
      if (j != prev + 1) {
        if (runStart >= -1) ranges += ((off(runStart - 1), off(prev)))
        runStart = j
      }
      prev = j
    }
    Some(ranges.toSeq.filter(r => r._2 > r._1))
  }

  /** `start`/`end` bound a frame-aligned slice; (0, -1) = whole file. */
  private def single(file: String, start: Long = 0L,
      end: Long = -1L): PartitionReader[InternalRow] = {
    // The Filter.db gate: a POINT lookup (pushed `key =`/`IN`) probes
    // the file's bloom sidecar before opening the data stream — one
    // ~16 KB task-side read against decompressing the file. A miss on
    // every candidate key proves the file key-free (blooms have no
    // false negatives) and skips the decode outright; absence or a
    // foreign geometry degrades to scanning. Slices of one file each
    // probe the same sidecar — still one tiny read per task.
    if (pointLookup.isDefined) {
      val p = new org.apache.hadoop.fs.Path(file)
      val bloom =
        try BloomSidecar.read(p.getFileSystem(conf.value), p)
        catch { case _: Exception => None }
      if (bloom.isDefined) {
        MetaIO.bloomProbes.incrementAndGet()
        if (!pointLookup.get.exists(BloomSidecar.mightContain(bloom.get, _))) {
          MetaIO.bloomSkips.incrementAndGet()
          return emptyReader
        }
      }
      // the bloom said "maybe": seek to the frames that can hold the
      // candidates instead of decoding the file (whole-file partitions
      // only — slices are already narrow)
      if (start == 0L && end < 0L) seekPlan(file) match {
        case Some(ranges) =>
          MetaIO.frameSeeks.incrementAndGet()
          MetaIO.seekBytes.addAndGet(ranges.map(r => r._2 - r._1).sum)
          if (ranges.isEmpty) return emptyReader
          if (ranges.length == 1)
            return raw(file, ranges.head._1, ranges.head._2)
          return new PartitionReader[InternalRow] {
            private var idx = 0
            private var cur: PartitionReader[InternalRow] = _
            override def next(): Boolean = {
              while (true) {
                if (cur == null) {
                  if (idx >= ranges.length) return false
                  cur = raw(file, ranges(idx)._1, ranges(idx)._2)
                  idx += 1
                }
                if (cur.next()) return true
                cur.close()
                cur = null
              }
              false
            }
            override def get(): InternalRow = cur.get()
            override def close(): Unit = if (cur != null) cur.close()
          }
        case None => ()
      }
    }
    raw(file, start, end)
  }

  /** The plain range reader: decode [start, end) (end = -1 ⇒ EOF). */
  private def raw(file: String, start: Long,
      end: Long): PartitionReader[InternalRow] = {
    // compiled once per partition; pruning decides whether Column
    // messages are decoded at all. The tombstone anti-set composes
    // into the same gate: a deleted row is dropped before its columns
    // decode, exactly like a pushed-filter miss.
    val pushedKeep = KeyPredicate.compile(filters)
    val keep: Array[Byte] => Boolean =
      if (deletedKeys.isEmpty) pushedKeep
      else k => pushedKeep(k) && !isDeleted(k)
    val wantColumns = readSchema.fieldNames.contains("columns")
    // Spark prunes NESTED fields too (e.g. count() asks for
    // array<struct<>>): emit exactly the struct shape the read schema
    // declares, in its field order
    val innerFields: Array[String] = readSchema.fields
      .find(_.name == "columns")
      .map(_.dataType.asInstanceOf[ArrayType]
        .elementType.asInstanceOf[StructType].fieldNames)
      .getOrElse(Array.empty)
    // index-compiled projectors — the per-row path must not string-match
    // field names (billions of rows cross this loop on a large scan)
    val innerProj: Array[ProtoWire.DecodedColumn => Any] =
      innerFields.map {
        case "name" => (c: ProtoWire.DecodedColumn) => c.name
        case "value" => (c: ProtoWire.DecodedColumn) => c.value
        case "write_time" => (c: ProtoWire.DecodedColumn) => c.writeTime
      }
    val topProj: Array[ProtoWire.DecodedRow => Any] =
      readSchema.fieldNames.map {
        case "key" => (r: ProtoWire.DecodedRow) => r.key: Any
        case "columns" => (r: ProtoWire.DecodedRow) =>
          new GenericArrayData(r.columns.map { c =>
            val vals = new Array[Any](innerProj.length)
            var i = 0
            while (i < innerProj.length) { vals(i) = innerProj(i)(c); i += 1 }
            new GenericInternalRow(vals)
          }.toArray[Any]): Any
      }
    new PartitionReader[InternalRow] {
      // frames stream straight off the decompressor: memory is bounded
      // by one message, never the decompressed file (the reference
      // reads partitions lazily the same way,
      // `SSTableIdentityIteratorPatched.java:88-109`)
      private var in: java.io.InputStream = _
      private val rows = {
        // an unopenable file under ignoreCorrupt yields no rows (open
        // INSIDE the guard — a file listed at plan time may be gone by
        // read time); decode errors mid-stream surface lazily and are
        // handled by the salvage wrapper
        val all =
          try {
            val p = new org.apache.hadoop.fs.Path(file)
            val raw = p.getFileSystem(conf.value).open(p)
            if (start > 0) raw.seek(start)
            // a slice reads exactly its byte range: the cut points are
            // frame boundaries, so EOF of the bounded stream is a
            // clean frame end and the decoder stops naturally
            val src: java.io.InputStream =
              if (end >= 0) new BoundedIn(raw, end - start) else raw
            in = new java.io.BufferedInputStream(
              new ZstdInputStream(src), 64 << 10)
            // strict whole-file reads arm the truncation guard with
            // the attested row count (one tiny sidecar open per task,
            // the bloom-probe discipline): a frame-aligned truncation
            // ends the zstd stream cleanly and would otherwise LOSE
            // rows silently. Slices skip it (their byte range is the
            // contract) and salvage mode keeps every recoverable row.
            val expect =
              if (ignoreCorrupt || start > 0 || end >= 0) -1L
              else try RangeSidecar
                .readUncounted(p.getFileSystem(conf.value), p)
                .map(_.count).getOrElse(-1L)
              catch { case _: Exception => -1L }
            ProtoWire.decodeStream(in, wantColumns, keep, expect)
          } catch {
            case e: Exception if ignoreCorrupt =>
              Iterator.empty[ProtoWire.DecodedRow]
          }
        if (ignoreCorrupt) salvaging(all) else all
      }
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) {
          val r = rows.next()
          // project onto the pruned read schema, in its field order
          val vals = new Array[Any](topProj.length)
          var i = 0
          while (i < topProj.length) { vals(i) = topProj(i)(r); i += 1 }
          cur = new GenericInternalRow(vals)
          true
        } else false
      override def get(): InternalRow = cur
      override def close(): Unit = if (in != null) in.close()
    }
  }
}
