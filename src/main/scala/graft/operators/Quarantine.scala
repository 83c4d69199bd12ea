package graft.operators

import com.github.luben.zstd.ZstdInputStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.ProtoWire
import graft.sources.{GenManifest, ProtoZstFiles}

/** CORRUPT-FILE QUARANTINE — the reference's `markSuspect` read path
  * (`SSTableReaderPatched.java:248-253`: a file the reader cannot
  * parse is flagged suspect and the scan keeps serving everything
  * else) as a first-class SALVAGE SCAN:
  *
  *   - STRICT mode is the normal scan and stays the default: a
  *     corrupt data file fails the read loudly (the bounded validated
  *     decoder throws; no silent row loss, ever).
  *   - [[salvageVerdicts]] is the operations answer when bytes have
  *     already rotted: one task per data file, each decoding with the
  *     same validated kernel but reporting instead of throwing —
  *     (file, rows decoded from complete frames, columns, byte offset
  *     where good data ends, suspect flag). Complete frames BEFORE
  *     the first bad byte still count (a truncated file salvages its
  *     prefix); a file whose zstd stream or wire framing is garbage
  *     from byte 0 reports zero rows, suspect.
  *
  * q251 reads the salvage verdicts of a deliberately-corrupted
  * generation at KEY-PREFIX grain: the fixture writes the corpus
  * prefix-split (one file per leading key byte — content-keyed, so
  * the oracle knows exactly which rows each file holds), then
  * overwrites the `'3'`-prefix file with non-zstd garbage IN PLACE,
  * manifest untouched — the bitrot/partial-overwrite model, exactly
  * the state `markSuspect` exists for. The DuckDB oracle rebuilds
  * every healthy prefix's counts from the raw tables and pins the
  * suspect prefix to (0 rows, suspect=1): hash equality proves both
  * halves — nothing lost from healthy files, nothing invented from
  * the rotten one. Byte offsets are pinned by QuarantineSpec (they
  * are physical facts no SQL oracle can replay), as is the
  * partial-salvage truncation case and strict mode's loud refusal.
  *
  * Scale: the verdict scan is one task per file (file list from the
  * manifest — metadata, no data read at plan time), each decoding
  * only its own file once; output is file-grain (KBs per 100 TB).
  * `mapPartitions` is the right shape here for the same reason as the
  * multimodal batch decode: the unit of work is an opaque byte
  * stream, not a row.
  */
object Quarantine {

  /** Decode as much of one file as parses: (rows, cols, offset in the
    * DECODED stream after the last complete frame, suspect). Never
    * throws on corrupt bytes — zstd-level damage truncates the decoded
    * buffer (suspect), wire-level damage stops the frame walk
    * ([[ProtoWire.salvageStats]]).
    */
  private[graft] def salvageFile(
      in: java.io.InputStream): (Long, Long, Long, Boolean) = {
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](64 * 1024)
    val zstdClean =
      try {
        val zin = new ZstdInputStream(in)
        var n = zin.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = zin.read(buf) }
        true
      } catch { case _: Exception => false }
    val (rows, cols, lastGood, parseClean) =
      ProtoWire.salvageStats(out.toByteArray)
    (rows, cols, lastGood, !(zstdClean && parseClean))
  }

  /** File-grain salvage verdicts for a manifested generation: one row
    * per data file — (name, rows, cells, good_bytes, suspect).
    * Distributed one-file-per-task; the driver touches only the
    * manifest's name list.
    */
  def salvageVerdicts(spark: SparkSession, out: String): DataFrame = {
    import spark.implicits._
    val snap = GenManifest.read(out, ProtoZstFiles.hadoopConf()).getOrElse(
      throw new IllegalStateException(
        s"salvage requires a manifested directory: $out"))
    val names = snap.dataEntries.map(e => (e.name, e.count))
    spark.createDataset(names).repartition(math.max(names.length, 1))
      .mapPartitions { it =>
        val conf = ProtoZstFiles.hadoopConf()
        it.map { case (name, attested) =>
          val p = new org.apache.hadoop.fs.Path(out, name)
          val fs = p.getFileSystem(conf)
          val st = fs.open(p)
          val (rows, cells, good, broken) =
            try salvageFile(st) finally st.close()
          // a frame-ALIGNED truncation decodes cleanly and short —
          // only the manifest's attested row count can see it (the
          // strict reader's truncation guard, verdict form)
          val suspect = broken || (attested >= 0 && rows != attested)
          (name, rows, cells, good, suspect)
        }
      }
      .toDF("name", "n_rows", "n_cells", "good_bytes", "suspect")
  }

  /** The corrupted prefix: every key starting with this byte lives in
    * the file the fixture rots — present at every test sf (sf0.001's
    * key domain is "1".."14", so '1'..'9' all occur as first bytes).
    */
  private val RotPrefix = "3"

  /** q251 fixture: the corpus written PREFIX-SPLIT (one file per
    * leading key byte, content-keyed so file membership is a pure
    * function of the data), then the [[RotPrefix]] file overwritten
    * with non-zstd garbage in place — manifest, sidecars and every
    * other file untouched.
    */
  private def quarantineFixture(spark: SparkSession, dir: String): String =
    Sink.fixture("quarantine:" + dir) {
      val out = Scratch.dir("graft_quar")
      CellModel.nestRows(spark, dir).repartition(1)
        .write.format("proto-zst").option("splitKeyPrefix", "1")
        .mode("append").save(out)
      val conf = ProtoZstFiles.hadoopConf()
      val dirPath = new org.apache.hadoop.fs.Path(out)
      val fs = dirPath.getFileSystem(conf)
      val tag = "-k" + RotPrefix.getBytes("UTF-8")
        .map(b => f"${b & 0xff}%02x").mkString
      val victim = GenManifest.read(out, conf).get.dataEntries
        .map(_.name).find(_.contains(tag)).getOrElse(
          sys.error(s"quarantine fixture found no '$RotPrefix'-prefix file"))
      val os = fs.create(new org.apache.hadoop.fs.Path(dirPath, victim), true)
      try os.write(
        ("ROT " * 64).getBytes("UTF-8")) // not a zstd frame header
      finally os.close()
      out
    }

  /** Spec hook: the (cached) corrupted-generation directory. */
  private[graft] def fixtureDir(spark: SparkSession, dir: String): String =
    quarantineFixture(spark, dir)

  /** q251: SALVAGE READ over the corrupted generation, aggregated to
    * key-prefix grain (the content key the fixture split files by, so
    * the oracle replays file membership from the raw tables): every
    * healthy prefix's decoded rows/cells must equal the corpus's, the
    * rotten prefix must report exactly (0, 0, suspect=1).
    */
  def salvageRead(spark: SparkSession, dir: String): DataFrame = {
    val out = quarantineFixture(spark, dir)
    salvageVerdicts(spark, out)
      // file name → its content prefix: the "-k<hex>" group tag the
      // prefix-split writer stamps (one file per prefix by fixture
      // construction: a single write task, splitPrefix = 1 byte)
      .withColumn("prefix", decode(unhex(
        regexp_extract(col("name"), "-k([0-9a-f]+)\\.proto\\.zst$", 1)),
        "UTF-8"))
      .groupBy(col("prefix"))
      .agg(sum(col("n_rows")).as("n_rows"),
        sum(col("n_cells")).as("n_cells"),
        max(col("suspect").cast("int")).as("suspect"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q251_salvage_scan" -> salvageRead)

  // the healthy prefixes rebuild from the raw tables (the q237
  // erased-table frame at prefix grain); the rotten one pins to
  // (0, 0, suspect) — nothing lost, nothing invented
  private val salvageSql =
    s"SELECT substr(key, 1, 1) AS prefix, " +
      s"CAST(CASE WHEN substr(key, 1, 1) = '$RotPrefix' THEN 0 " +
      s"ELSE count(*) END AS BIGINT) AS n_rows, " +
      s"CAST(CASE WHEN substr(key, 1, 1) = '$RotPrefix' THEN 0 " +
      s"ELSE CAST(sum(n_cells) AS BIGINT) END AS BIGINT) AS n_cells, " +
      s"CAST(substr(key, 1, 1) = '$RotPrefix' AS INTEGER) AS suspect " +
      s"FROM (SELECT key, count(CASE WHEN kind = 'live' THEN 1 END) AS n_cells " +
      s"FROM (${Core.cellsSql}) WHERE NOT partition_deleted GROUP BY key) " +
      "GROUP BY 1"

  val oracle: Map[String, String] = Map(
    "q251_salvage_scan" -> salvageSql)
}
