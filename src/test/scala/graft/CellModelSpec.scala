package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CellModel, Core}

/** Cell-model semantics: nest/explode round trip on real testdata, plus
  * the empty-partition case the testdata cannot exercise (no live
  * partition has all-dead cells at any SF): the reference's `rowMapper`
  * runs after only the partition-tombstone filter
  * (`service/SSTableReader.java:79-109`), so such a partition must still
  * yield a key-only Row with zero columns.
  */
class CellModelSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf0001}

  private val cellSchema = StructType(Seq(
    StructField("key", BinaryType),
    StructField("name", BinaryType),
    StructField("value", BinaryType),
    StructField("write_time", LongType),
    StructField("kind", StringType),
    StructField("partition_deleted", BooleanType)))

  private def cell(key: String, name: String, value: String, wt: Long,
      kind: String, pdel: Boolean): Row =
    Row(key.getBytes, name.getBytes, value.getBytes, wt, kind, pdel)

  test("explode(nest) round-trips to the live flat cells") {
    val live = CellModel.liveCells(spark, sf0001)
      .selectExpr("key", "name", "value", "write_time")
    val round = CellModel.explodeCells(spark, sf0001)
    assert(round.exceptAll(live).count() === 0)
    assert(live.exceptAll(round).count() === 0)
  }

  test("all-dead live partition emits a key-only row (empty columns)") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        cell("A", "c1", "v1", 10L, "live", pdel = false),
        cell("A", "c2", "v2", 20L, "deleted", pdel = false),
        cell("B", "c1", "v1", 30L, "deleted", pdel = false),
        cell("B", "c2", "v2", 40L, "expiring", pdel = false),
        cell("C", "c1", "v1", 50L, "live", pdel = true))),
      cellSchema)
    val nested = CellModel.nestCells(df)
      .select(decode(col("key"), "UTF-8").as("k"), size(col("columns")).as("n"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    // A: one live cell; B: live partition, zero live cells -> emitted
    // with empty columns; C: partition tombstone -> dropped entirely.
    assert(nested === Map("A" -> 1, "B" -> 0))
  }

  test("q04 keeps zero-live-cell partitions with empty cells_str") {
    // run the exact q04 aggregation shape over synthetic string cells
    val rows = Seq(
      ("A", "c1", "v1", 10L, "live", false),
      ("B", "c1", "v1", 30L, "deleted", false),
      ("C", "c1", "v1", 50L, "live", true))
    import spark.implicits._
    val df = rows.toDF("key", "name", "value", "write_time", "kind",
      "partition_deleted")
    val out = df.filter(!col("partition_deleted"))
      .groupBy(col("key"))
      .agg(
        array_join(transform(
          sort_array(collect_list(when(col("kind") === "live",
            struct(col("name"), col("value"), col("write_time"))))),
          c => concat_ws(":", c.getField("name"), c.getField("value"),
            c.getField("write_time"))), "|").as("cells_str"),
        count(when(col("kind") === "live", lit(1))).as("n_cells"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(out === Set(("A", "c1:v1:10", 1L), ("B", "", 0L)))
  }

  test("chunked nest bounds every Row and conserves cell counts") {
    import org.apache.spark.sql.functions.{col, sum}
    val chunked = CellModel.nestRowsChunked(spark, SparkTestSession.sf0001)
    assert(chunked.filter(col("n_cells") > CellModel.NestChunk).count() === 0)
    // only the LAST chunk of a key may be partial
    assert(chunked.filter(col("n_cells") < CellModel.NestChunk).count() <=
      chunked.select("key").distinct().count())
    val total = chunked.agg(sum(col("n_cells"))).collect()(0).getLong(0)
    assert(total === CellModel.liveCells(spark, SparkTestSession.sf0001).count())
  }

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("queries and oracleSql keys line up") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle-only keys: ${o.diff(q)}")
  }
}
