package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{MetaIO, ProtoZstFiles}

/** The `.split` v2 frame-key index: point lookups over a key-sorted
  * file seek to the frames that can hold the candidates instead of
  * decoding the file — the reference's Index.db `(key, position)` walk
  * at zstd-frame grain. Pins the seek counters, duplicate keys
  * straddling frame boundaries, multi-key range merging, and the
  * unsorted/unindexed fallbacks.
  */
class FrameSeekSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toFile.getAbsolutePath

  private def conf = ProtoZstFiles.hadoopConf()

  /** 100 distinct keys × 10 rows each, key-sorted into ONE file with
    * 7-row frames — runs of a key straddle boundaries by construction
    * (10 and 7 are coprime), which is exactly the duplicate case the
    * segment arithmetic must keep inclusive on both ends.
    */
  private def writeSorted(dir: String, n: Int, keyOf: Int => String,
      frameRows: Int = 7): Unit = {
    import spark.implicits._
    (0 until n).map(i => (keyOf(i), i)).toDF("k", "i")
      .select(encode(col("k"), "UTF-8").as("key"),
        array(struct(
          encode(concat(lit("c"), col("i")), "UTF-8").as("name"),
          encode(concat(lit("v"), col("i")), "UTF-8").as("value"),
          col("i").cast("long").as("write_time"))).as("columns"))
      .repartitionByRange(1, col("key")).sortWithinPartitions(col("key"))
      .write.format("proto-zst").option("splitFrameRows", frameRows.toString)
      .mode("append").save(dir)
  }

  private lazy val dupDir: String = {
    val dir = freshDir("graft_seek_dup")
    writeSorted(dir, 1000, i => f"k${i / 10}%03d")
    dir
  }

  private def get(dir: String, ks: String*) =
    spark.read.format("proto-zst").load(dir)
      .filter(if (ks.length == 1)
        col("key") === lit(ks.head.getBytes("UTF-8"))
      else col("key").isin(ks.map(_.getBytes("UTF-8")): _*))
      .select(decode(col("key"), "UTF-8").as("k"), size(col("columns")))
      .collect().map(r => (r.getString(0), r.getInt(1))).sorted.toSeq

  test("point lookup seeks: one frame's worth of bytes, correct rows, duplicates intact") {
    val fileBytes = new org.apache.hadoop.fs.Path(dupDir)
      .getFileSystem(conf)
      .listStatus(new org.apache.hadoop.fs.Path(dupDir))
      .filter(_.getPath.getName.endsWith(".proto.zst")).map(_.getLen).sum
    // middle key, run straddles a 7-row frame boundary
    MetaIO.reset()
    assert(get(dupDir, "k050") === (0 until 10).map(_ => ("k050", 1)))
    assert(MetaIO.frameSeeks.get() === 1L,
      s"expected one seeked partition, got ${MetaIO.frameSeeks.get()}")
    assert(MetaIO.seekBytes.get() > 0L &&
      MetaIO.seekBytes.get() < fileBytes / 4,
      s"seek read ${MetaIO.seekBytes.get()} of $fileBytes bytes — not a seek")
    // first and last keys of the file (the index's edge segments)
    assert(get(dupDir, "k000").length === 10)
    assert(get(dupDir, "k099").length === 10)
    // every key round-trips through the seek path with its full run
    (0 until 100 by 9).foreach { i =>
      val k = f"k$i%03d"
      assert(get(dupDir, k) === (0 until 10).map(_ => (k, 1)), k)
    }
  }

  test("IN across distant keys merges ranges; absent keys return nothing") {
    MetaIO.reset()
    assert(get(dupDir, "k003", "k097").length === 20)
    assert(MetaIO.frameSeeks.get() === 1L)
    // an absent key between two present runs: the seek decodes its
    // segment and finds nothing (never a wrong row)
    assert(get(dupDir, "k05x").isEmpty)
    // k0505 sorts inside k050's segment but matches nothing
    assert(get(dupDir, "k0505").isEmpty)
  }

  test("unsorted files never seek (fallback scans the file, correctly)") {
    val dir = freshDir("graft_seek_uns")
    import spark.implicits._
    // deliberately unsorted arrival order (NOT range/sort-partitioned)
    (0 until 500).map { i =>
      val j = (i * 7919) % 500
      (f"u$j%03d", j)
    }.toDF("k", "i")
      .select(encode(col("k"), "UTF-8").as("key"),
        array(struct(
          encode(concat(lit("c"), col("i")), "UTF-8").as("name"),
          encode(concat(lit("v"), col("i")), "UTF-8").as("value"),
          col("i").cast("long").as("write_time"))).as("columns"))
      .coalesce(1)
      .write.format("proto-zst").option("splitFrameRows", "7")
      .mode("append").save(dir)
    MetaIO.reset()
    assert(get(dir, "u123") === Seq(("u123", 1)))
    assert(MetaIO.frameSeeks.get() === 0L,
      "an unsorted file must not claim index-seek soundness")
  }

  test("files too small for a frame boundary scan whole (no index, no seek)") {
    val dir = freshDir("graft_seek_small")
    writeSorted(dir, 20, i => f"s$i%02d", frameRows = 4096)
    MetaIO.reset()
    assert(get(dir, "s07") === Seq(("s07", 1)))
    assert(MetaIO.frameSeeks.get() === 0L)
  }

  test("row count an exact multiple of splitFrameRows still seeks (no keyless tail boundary)") {
    // 1000 rows at 10-row frames: the last frame flushes exactly at
    // the final row, so the writer's pending boundary never sees a
    // following row — it must be dropped, not written keyless (one
    // empty first-key hex used to disable the whole file's seek index)
    val dir = freshDir("graft_seek_mult")
    writeSorted(dir, 1000, i => f"m${i / 10}%03d", frameRows = 10)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    val data = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath).filter(_.getName.endsWith(".proto.zst")).head
    val cuts = graft.sources.SplitSidecar.readKeyed(fs, data).get
    assert(cuts.forall(_._3.nonEmpty),
      "every written boundary must carry its first key — a trailing " +
        "keyless boundary means the writer failed to trim it")
    MetaIO.reset()
    assert(get(dir, "m050") === (0 until 10).map(_ => ("m050", 1)))
    assert(MetaIO.frameSeeks.get() === 1L,
      "exact-multiple files must keep their frame-seek index")
    // a PRE-FIX sidecar (trailing keyless boundary) read back: the
    // range sidecar's row count proves the tail is zero-row, so the
    // reader drops it instead of degrading the file to a full scan
    val rows = graft.sources.RangeSidecar.read(fs, data).get.count
    graft.sources.SplitSidecar.write(fs, data,
      cuts.toSeq :+ ((fs.getFileStatus(data).getLen - 1, rows, "")))
    MetaIO.reset()
    assert(get(dir, "m051") === (0 until 10).map(_ => ("m051", 1)))
    assert(MetaIO.frameSeeks.get() === 1L,
      "reader must tolerate a provably zero-row keyless tail boundary")
  }

  test("a sidecar with no boundary keys writes the v1 header (old readers keep slicing)") {
    val dir = freshDir("graft_split_v1")
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    val data = new org.apache.hadoop.fs.Path(dir, "x.proto.zst")
    graft.sources.SplitSidecar.write(fs, data,
      Seq((100L, 10L, ""), (200L, 20L, "")))
    val txt = {
      val in = fs.open(graft.sources.SplitSidecar.sidecar(data))
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }
    assert(txt.startsWith("v1\n"),
      "keyless checkpoints encode nothing v1 cannot — stamp v1 so " +
        "pre-v2 engines keep slicing")
    assert(graft.sources.SplitSidecar.read(fs, data).get.toSeq ===
      Seq((100L, 10L), (200L, 20L)))
  }

  test("seek composes with the tombstone anti-set: erased key invisible through the index") {
    val victims = Seq("k042".getBytes("UTF-8"))
    // fresh dir so dupDir stays clean for other tests
    val dir = freshDir("graft_seek_tomb")
    writeSorted(dir, 1000, i => f"k${i / 10}%03d")
    graft.operators.Tombstones.eraseKeys(dir, victims)
    MetaIO.reset()
    assert(get(dir, "k042").isEmpty)
    assert(get(dir, "k043").length === 10)
    assert(MetaIO.frameSeeks.get() === 2L)
  }
}
