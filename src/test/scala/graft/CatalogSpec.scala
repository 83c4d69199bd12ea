package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CellModel
import graft.sources.{GraftBucket, GraftCatalog}

/** The V2 catalog: bucketed writes, reported partitioning, and the
  * storage-partitioned (zero-exchange) merge over sink generations.
  */
class CatalogSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf0001}

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toFile.getAbsolutePath

  test("bucketed catalog write splits files by bucket and tags names") {
    GraftCatalog.ensure(spark)
    val dir = freshDir("graft_cat_w")
    GraftBucket.writeSpec(dir, 4, graft.sources.ProtoZstFiles.hadoopConf())
    CellModel.nestRows(spark, sf0001)
      .writeTo(GraftCatalog.tableName(dir)).append()
    val files = new java.io.File(dir)
      .listFiles((_, n) => n.endsWith(".proto.zst")).map(_.getName).sorted
    assert(files.nonEmpty)
    assert(files.forall(_.matches(""".*-b\d{4}\.proto\.zst""")), files.mkString(","))
    // every file holds exactly the keys of its named bucket
    val byFile = spark.read.format("proto-zst").load(dir).collect()
    assert(byFile.length === 14) // nested rows at sf0.001
    files.foreach { f =>
      // anchor at the SUFFIX: the random job tag is hex and can itself
      // contain "-b…" (a 1-in-16 flake under split("-b"))
      val BucketName = """.*-b(\d{4})\.proto\.zst""".r
      val b = f match { case BucketName(d) => d.toInt }
      val keys = spark.read.format("proto-zst").load(s"$dir/$f")
        .collect().map(_.getAs[Array[Byte]](0))
      assert(keys.forall(k => GraftBucket.bucket(4, k) == b), f)
    }
  }

  test("co-bucketed generations join with zero exchanges (SPJ)") {
    GraftCatalog.ensure(spark)
    val conf = graft.sources.ProtoZstFiles.hadoopConf()
    val dirA = freshDir("graft_cat_a")
    val dirB = freshDir("graft_cat_b")
    GraftBucket.writeSpec(dirA, 4, conf)
    GraftBucket.writeSpec(dirB, 4, conf)
    val nested = CellModel.nestRows(spark, sf0001)
    nested.writeTo(GraftCatalog.tableName(dirA)).append()
    nested.filter(col("key").cast("string").cast("long") % 2 === 0)
      .writeTo(GraftCatalog.tableName(dirB)).append()
    val a = spark.table(GraftCatalog.tableName(dirA)).as("a")
    val b = spark.table(GraftCatalog.tableName(dirB)).as("b")
    val joined = a.join(b, col("a.key") === col("b.key"), "fullouter")
      .select(coalesce(col("a.key"), col("b.key")).as("key"),
        size(coalesce(col("a.columns"), col("b.columns"))).as("n"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.take(3000))
    assert(!plan.contains("Exchange"), s"expected zero exchanges:\n${plan.take(3000)}")
  }

  test("SQL CREATE TABLE records the bucket spec and writes land bucketed") {
    GraftCatalog.ensure(spark)
    val dir = freshDir("graft_cat_ct")
    // createTable goes through the catalog's partitioned-DDL path
    new java.io.File(dir).delete() // CREATE owns the directory
    spark.sql(s"CREATE TABLE graft.`$dir` (key BINARY, " +
      "columns ARRAY<STRUCT<name: BINARY, value: BINARY, write_time: BIGINT>>) " +
      "PARTITIONED BY (bucket(4, key))")
    assert(GraftBucket.readSpec(dir,
      graft.sources.ProtoZstFiles.hadoopConf()) === Some(4))
    CellModel.nestRows(spark, sf0001)
      .writeTo(GraftCatalog.tableName(dir)).append()
    val files = new java.io.File(dir)
      .listFiles((_, n) => n.endsWith(".proto.zst")).map(_.getName)
    assert(files.nonEmpty &&
      files.forall(_.matches(""".*-b\d{4}\.proto\.zst""")), files.mkString(","))
  }

  test("a foreign untagged file degrades to per-file partitions, never misreports") {
    GraftCatalog.ensure(spark)
    val conf = graft.sources.ProtoZstFiles.hadoopConf()
    val dir = freshDir("graft_cat_mix")
    GraftBucket.writeSpec(dir, 4, conf)
    CellModel.nestRows(spark, sf0001)
      .writeTo(GraftCatalog.tableName(dir)).append()
    // a foreign-managed directory: no manifest (a foreign writer would
    // not maintain one), so membership comes from the listing again
    val mp = new org.apache.hadoop.fs.Path(dir, graft.sources.GenManifest.DirName)
    mp.getFileSystem(conf).delete(mp, true)
    // drop in an untagged file a foreign writer might have produced
    val os = new com.github.luben.zstd.ZstdOutputStream(
      new java.io.FileOutputStream(s"$dir/zz-foreign.proto.zst"))
    os.write(graft.functions.ProtoWire.delimit(
      graft.functions.ProtoWire.encodeRow("zzz".getBytes,
        new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any]))))
    os.close()
    val nFiles = new java.io.File(dir)
      .listFiles((_, n) => n.endsWith(".proto.zst")).length
    val t = spark.table(GraftCatalog.tableName(dir))
    // bucket grouping must disable: one partition per file again
    assert(t.rdd.getNumPartitions === nFiles)
    // and an aggregation honestly re-shuffles instead of trusting a
    // layout the directory no longer has
    val agg = t.groupBy(col("key")).agg(count(lit(1)).as("n"))
    agg.collect()
    assert(agg.queryExecution.executedPlan.toString.contains("Exchange"))
    // the foreign row is read
    assert(t.count() === 15) // 14 nested keys + 1 foreign row
  }

  test("per-key aggregation over a bucketed table plans zero exchanges") {
    GraftCatalog.ensure(spark)
    val conf = graft.sources.ProtoZstFiles.hadoopConf()
    val dir = freshDir("graft_cat_agg")
    GraftBucket.writeSpec(dir, 4, conf)
    CellModel.nestRows(spark, sf0001)
      .writeTo(GraftCatalog.tableName(dir)).append()
    val agg = spark.table(GraftCatalog.tableName(dir))
      .select(col("key"), explode(col("columns")).as("c"))
      .groupBy(col("key")).agg(count(lit(1)).as("n"))
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    println("AGG PLAN:\n" + plan)
    assert(!plan.contains("Exchange"), s"agg plan has exchange:\n${plan.take(3000)}")
  }
}
