package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated parquet testdata
  * (`/root/testdata/sf*`; see TESTDATA.md / FIXTURES.md §B).
  *
  * Mirrors the reference's source-discovery step
  * (`Runner.java:54-63` — directory walk + suffix filter): here the
  * "catalog" is a directory of `<table>.parquet` files and Spark's
  * `InMemoryFileIndex` does the listing. At 100 TB each table would be
  * a multi-file parquet dataset; nothing below assumes a single file.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Engine contract for the `events` table: `ts` is PRESENTED to every
    * operator as a long of epoch-NANOSECONDS (µs derive via
    * `ts DIV 1000` — double division would lose precision above 2^53),
    * regardless of the on-disk physical type. Two driver generations
    * exist: parquet TIMESTAMP(NANOS), which Spark 4 rejects unless the
    * legacy `nanosAsLong` conf reads it as a nano long (then passes
    * through unchanged), and TIMESTAMP(MICROS), which arrives as
    * TIMESTAMP_NTZ and is widened to nanos exactly (µs × 1000). The
    * NTZ→instant cast is pinned by the `timeZone=UTC` every shipped
    * session builder sets, matching the DuckDB oracle's `epoch_us(ts)`
    * over the same naive timestamps.
    */
  private val NanosConf = "spark.sql.legacy.parquet.nanosAsLong"

  private def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df // TIMESTAMP(NANOS) via nanosAsLong: already nanos
      case _ => df.withColumn("ts",
        unix_micros(col("ts").cast("timestamp")) * 1000)
    }

  /** On-disk schema per (dir, table), inferred ONCE per JVM. Passing
    * the cached schema to every subsequent read makes table loading
    * job-free: without it, Spark runs a footer-inference job per
    * `spark.read.parquet` call — hundreds of pointless driver jobs
    * per Bench sweep (247 queries × their input tables × runs), and
    * construction-time noise that would drown the
    * `QueryTraits.executesOnBuild` job-count invariant. The testdata
    * directories are immutable, so the cache never goes stale; keys
    * are (dir, table) because schemas differ per table, not per
    * session.
    */
  private val schemas = scala.collection.concurrent.TrieMap
    .empty[(String, String), org.apache.spark.sql.types.StructType]

  private def onDiskSchema(spark: SparkSession, dir: String,
      name: String): org.apache.spark.sql.types.StructType =
    schemas.getOrElseUpdate((dir, name),
      spark.read.parquet(s"$dir/$name.parquet").schema)

  /** Scan-parallelism rescue for HEAVY ROW-LOCAL compute (md5-grain
    * hashing ladders, per-token featurization) that would otherwise run
    * fused to the scan stage: the test tables are single-file,
    * single-row-group parquet, so every scan is ONE task and everything
    * codegen-fused onto it runs on one core of `local[N]` (guide §2.5's
    * "one huge unsplittable file" input-skew case — the fix is
    * "repartition immediately after the read").
    *
    * GUARDED to be scale-adaptive, not a local[32] constant: the
    * exchange is added ONLY when the scan's file count cannot feed the
    * session's cores. A production multi-file dataset (thousands of
    * row-group-sized files at 100 TB) already scans at full
    * parallelism, so the guard disarms itself and adds no shuffle —
    * while any deployment that hits one fat unsplittable file gets the
    * same rescue this sandbox needs. Round-robin repartition keeps
    * rows deterministic under retries (sortBeforeRepartition is on by
    * default) and every consumer here is key-keyed aggregation/join
    * logic whose RESULT is partitioning-independent (exact-integer
    * arithmetic only — the engine-wide oracle discipline).
    */
  private[graft] def spread(spark: SparkSession, df: DataFrame): DataFrame = {
    val want = spark.sparkContext.defaultParallelism
    if (df.inputFiles.length >= want) df else df.repartition(want)
  }

  /** [[spread]] for a STREAMING source over a testdata table: a
    * micro-batch of the file stream scans with the same
    * one-split-per-file layout as the batch reader, so the same
    * one-core fusion hits every md5-heavy gate ladder inside
    * `addBatch`. The guard consults the BATCH listing of the same
    * table (the stream frame cannot be listed at build time); the
    * repartition lands INSIDE each micro-batch, upstream of the
    * stateful operator's own hash exchange, so watermarks, state keys
    * and results are untouched.
    */
  private[graft] def spreadStream(spark: SparkSession, dir: String,
      name: String, sdf: DataFrame): DataFrame = {
    val want = spark.sparkContext.defaultParallelism
    if (apply(spark, dir, name).inputFiles.length >= want) sdf
    else sdf.repartition(want)
  }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events" &&
        !org.apache.spark.sql.graft.Shim.confExplicitlySet(spark, NanosConf))
      spark.conf.set(NanosConf, "true")
    val df = spark.read.schema(onDiskSchema(spark, dir, name))
      .parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeTs(df) else df
  }

  /** Streaming twin of [[events]]: a file-stream source over the
    * testdata dir (glob-filtered to the events table), with the same
    * nano-long `ts` normalization as the batch reader. The stream's
    * input schema is resolved from the batch reader's ON-DISK schema
    * (a file-stream source can't infer), then normalized on top.
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    if (!org.apache.spark.sql.graft.Shim.confExplicitlySet(spark, NanosConf))
      spark.conf.set(NanosConf, "true")
    val onDisk = onDiskSchema(spark, dir, "events")
    normalizeTs(spark.readStream.schema(onDisk)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir))
  }

  /** Streaming twin of [[documents]]: the file-stream source over the
    * testdata dir, glob-filtered to the documents table, schema
    * resolved from the batch reader (a file stream can't infer).
    */
  def documentsStream(spark: SparkSession, dir: String): DataFrame = {
    val onDisk = onDiskSchema(spark, dir, "documents")
    spark.readStream.schema(onDisk)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
  }

  /** Streaming twin of [[embeddings]] — the vector-ingest source. */
  def embeddingsStream(spark: SparkSession, dir: String): DataFrame = {
    val onDisk = onDiskSchema(spark, dir, "embeddings")
    spark.readStream.schema(onDisk)
      .option("pathGlobFilter", "embeddings.parquet")
      .parquet(dir)
  }

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
