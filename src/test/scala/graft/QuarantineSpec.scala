package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Quarantine
import graft.sources.ProtoZstFiles

/** The corrupt-file quarantine (q251): strict mode refuses loudly,
  * salvage mode recovers every complete frame before the first bad
  * byte — including the PARTIAL prefix of a truncated file (the byte
  * facts the q251 oracle cannot replay).
  */
class QuarantineSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf0001}

  private def conf = ProtoZstFiles.hadoopConf()

  private def writeOneFile(dir: String, n: Int): Unit = {
    import spark.implicits._
    (0 until n).map(i => (f"t$i%04d", i)).toDF("k", "i")
      .select(encode(col("k"), "UTF-8").as("key"),
        array(struct(
          encode(lit("c"), "UTF-8").as("name"),
          encode(concat(lit("v"), col("i")), "UTF-8").as("value"),
          col("i").cast("long").as("write_time"))).as("columns"))
      .coalesce(1)
      // small frames: a real sink file is multi-frame (checkpoint
      // cadence), and the salvage claim is about complete frames
      // BEFORE the damage
      .write.format("proto-zst").option("splitFrameRows", "50")
      .mode("append").save(dir)
  }

  test("strict mode refuses a rotten file loudly (no silent row loss)") {
    // q251's fixture read through the NORMAL scan must throw: the
    // manifest still lists the rotten file, and strict decode is the
    // default contract
    val out = Quarantine.fixtureDir(spark, sf0001)
    val e = intercept[Exception] {
      // force the DECODE path: a bare count() is answered from the
      // manifest/sidecar counts alone (aggregate pushdown — no frame
      // ever decompressed), which must NOT change under rot; only a
      // read that touches the bytes may (and must) refuse
      spark.read.format("proto-zst").load(out)
        .agg(sum(size(col("columns")))).collect()
    }
    assert(e != null)
    // and the metadata COUNT indeed still answers (the manifest is
    // intact; the BYTES are what rotted)
    assert(spark.read.format("proto-zst").load(out).count() > 0L)
  }

  test("q251 salvage: rotten prefix reports zero, healthy prefixes byte-complete") {
    val rows = Quarantine.salvageRead(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getInt(3))).toMap
    assert(rows("3") === ((0L, 0L, 1)),
      "the rotten file must salvage nothing and be flagged suspect")
    assert(rows.count(_._2._3 == 0) === rows.size - 1,
      "exactly one prefix may be suspect")
    assert(rows.filterNot(_._1 == "3").forall(_._2._1 > 0L),
      "every healthy prefix must keep its rows")
  }

  test("a truncated file salvages its complete-frame prefix and is suspect") {
    val dir = java.nio.file.Files.createTempDirectory("graft_quar_trunc")
      .toFile.getAbsolutePath
    writeOneFile(dir, 1000)
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(conf)
    val data = fs.listStatus(dirPath).map(_.getPath)
      .filter(_.getName.endsWith(".proto.zst")).head
    // truncate to 60%: the zstd stream dies mid-frame; everything
    // decoded before it that forms COMPLETE wire frames salvages
    val len = fs.getFileStatus(data).getLen
    val keep = new Array[Byte]((len * 6 / 10).toInt)
    val in = fs.open(data)
    try in.readFully(keep) finally in.close()
    val os = fs.create(data, true)
    try os.write(keep) finally os.close()
    val v = Quarantine.salvageVerdicts(spark, dir).collect().head
    val (nRows, good, suspect) =
      (v.getAs[Long]("n_rows"), v.getAs[Long]("good_bytes"),
        v.getAs[Boolean]("suspect"))
    assert(suspect, "a truncated file must be flagged")
    assert(nRows > 0L && nRows < 1000L,
      s"a 60% truncation must salvage a strict prefix, got $nRows")
    assert(good > 0L, "the good-bytes watermark must advance")
    // and strict mode still refuses the truncated file loudly (via
    // the decode path — see the rot test for why not a bare count)
    val e = intercept[Exception] {
      spark.read.format("proto-zst").load(dir)
        .agg(sum(size(col("columns")))).collect()
    }
    assert(e != null)
  }
}
