package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-timer for hot-path experiments:
  * `runMain graft.tools.TimeQ <expr> [reps]` over sf0.1 documents.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if (args.nonEmpty) {
      // time named SparkEntry queries: runMain graft.tools.TimeQ q28_...
      spark.range(10).groupBy(col("id") % 2).count().count() // warmup
      args.foreach { n =>
        (1 to 3).foreach { i =>
          val t0 = System.nanoTime()
          val c = graft.SparkEntry.queries(n)(spark, dir).count()
          println(f"$n run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$c)")
        }
      }
      spark.stop()
      return
    }
    val docs = graft.sources.Tables.documents(spark, dir)
      .repartition(32).filter(length(col("text")) >= 11)
    docs.cache().count()
    def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        mk.queryExecution // force plan
        val r = mk.collect()(0)
        println(f"$tag run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s  ($r)")
      }
    }
    time("gram_hash60")(docs.select(
      graft.functions.HashOps.gram_hash60(col("text"), 8).as("hs"))
      .agg(sum(size(col("hs")))))
    time("legacy-md5-hex")(docs.select(
      transform(sequence(lit(1), length(col("text")) - 7), i =>
        conv(substring(md5(col("text").substr(i, lit(8))), 1, 15), 16, 10)
          .cast("long")).as("hs"))
      .agg(sum(size(col("hs")))))
    time("full-q24-new")(graft.operators.TextAnalysis.fingerprint(spark, dir)
      .agg(sum(col("n_fps"))))
    spark.stop()
  }
}
