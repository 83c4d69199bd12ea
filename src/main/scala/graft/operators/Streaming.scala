package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.Tables

/** Structured Streaming path: the q26 daily aggregation executed as a
  * stream — `readStream` file source → event-time derivation +
  * watermark → stateful groupBy → memory sink, driven to completion
  * with `Trigger.AvailableNow`. Batch/stream parity is the check: the
  * result must hash-match the SAME DuckDB oracle as the batch q26.
  *
  * Scale: this is the incremental-ingest shape — at 100 TB the file
  * source discovers new parquet files per micro-batch and state is
  * bounded by (day_bucket × event_type); `collect_set(user_id)` is the
  * one deliberately-bounded-cardinality piece (distinct aggregation is
  * unsupported in streaming), acceptable because users-per-day is
  * bounded; an unbounded-cardinality deployment would switch to
  * approx_count_distinct.
  */
object Streaming {

  /** q28: streaming twin of [[Events.windowAgg]]. */
  def streamWindowAgg(spark: SparkSession, dir: String): DataFrame = {
    // resolve the (nanosAsLong) schema from the batch reader first
    val schema = Tables.events(spark, dir).schema
    val name = "q28_sink_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    // the file-stream source wants a directory: stream the testdata dir
    // with a glob filter selecting the events table
    val src = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    val agg = src
      .select(col("user_id"), col("event_type"),
        expr("ts DIV 1000").as("us"),
        round(col("value") * 100, 0).cast("long").as("vc"))
      .withColumn("event_time", timestamp_micros(col("us")))
      .withWatermark("event_time", "1 day")
      .withColumn("day_bucket", expr("us DIV 86400000000"))
      .groupBy(col("day_bucket"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        size(collect_set(col("user_id"))).as("n_users"),
        (sum(col("vc")).cast("double") / 100.0).as("sum_value"))
    val q = agg.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q28_stream_window" -> streamWindowAgg)

  val oracle: Map[String, String] = Map(
    "q28_stream_window" -> Events.oracle("q26_window_agg"))
}
