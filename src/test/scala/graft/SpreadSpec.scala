package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** The r15 scan-parallelism rescue (`Tables.spread`/`spreadStream`):
  * a guarded round-robin repartition that must (a) change NOTHING
  * about the rows, (b) raise a one-split scan to the session's
  * parallelism, and (c) DISARM on a dataset whose file count already
  * feeds the cores — the scale-adaptivity that keeps it from being a
  * local-mode constant.
  */
class SpreadSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf0001}

  private val want = spark.sparkContext.defaultParallelism

  test("spread raises a one-file scan to defaultParallelism, rows intact") {
    val base = Tables.documents(spark, sf0001)
    val spreadDf = Tables.spread(spark, base)
    assert(base.inputFiles.length === 1) // the testdata layout this exists for
    assert(spreadDf.rdd.getNumPartitions === want)
    // identical multiset of rows (doc_id is unique, so set suffices)
    assert(spreadDf.count() === base.count())
    assert(spreadDf.select(col("doc_id")).except(
      base.select(col("doc_id"))).isEmpty)
    // and the exchange is round-robin (retry-deterministic), visible
    // in the plan
    assert(spreadDf.queryExecution.executedPlan.toString
      .contains("REPARTITION_BY_NUM"))
  }

  test("spread disarms on a multi-file dataset (no exchange added)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_spread")
      .toFile.getAbsolutePath
    Tables.documents(spark, sf0001).repartition(want)
      .write.mode("overwrite").parquet(dir)
    val multi = spark.read.parquet(dir)
    assert(multi.inputFiles.length >= want, multi.inputFiles.length)
    // same frame back — no repartition wrapped around it
    assert(Tables.spread(spark, multi) eq multi)
  }
}
