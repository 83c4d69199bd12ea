package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HashOps

/** The native md5-prefix kernels must agree bit-for-bit with the
  * hex-string composition they replace (`conv(substring(md5(s),1,15),
  * 16,10)`) — that formula is what the DuckDB oracles mirror.
  */
class HashOpsSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private def legacyHash60(s: org.apache.spark.sql.Column) =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  test("md5_prefix60 equals conv(substring(md5,1,15),16,10)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val strs = Seq.fill(500)(rnd.alphanumeric.take(rnd.nextInt(40)).mkString) ++
      Seq("", " ", "a", "héllo wörld", "日本語テキスト", "a b c d e")
    val df = strs.toDF("s")
      .withColumn("fast", HashOps.md5_prefix60(col("s")))
      .withColumn("ref", legacyHash60(col("s")))
    assert(df.filter(col("fast") =!= col("ref")).count() === 0)
  }

  test("gram_hash60 equals per-position substr + hash60") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val strs = Seq.fill(100)(rnd.alphanumeric.take(8 + rnd.nextInt(60)).mkString) ++
      Seq("exactly8", "ascii with spaces and more", "ünïcödé chars ünïcödé chars")
    val df = strs.toDF("s")
      .withColumn("fast", HashOps.gram_hash60(col("s"), 8))
      .withColumn("ref", transform(sequence(lit(1), length(col("s")) - 7), i =>
        legacyHash60(col("s").substr(i, lit(8)))))
    assert(df.filter(to_json(col("fast")) =!= to_json(col("ref"))).count() === 0)
  }

  test("gram_hash60 on short / empty strings yields empty array") {
    import spark.implicits._
    val df = Seq("", "abc", "1234567").toDF("s")
      .withColumn("g", HashOps.gram_hash60(col("s"), 8))
    assert(df.select(size(col("g"))).as[Int].collect().toSeq === Seq(0, 0, 0))
  }

  test("cdc_chunks60 equals the HOF boundary + hash60-of-joined-slice formulation") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val rows = Seq.fill(200)(Seq.fill(1 + rnd.nextInt(60))(
      rnd.alphanumeric.take(1 + rnd.nextInt(6)).mkString))
    val df = rows.toDF("ws")
      .withColumn("fast", HashOps.cdc_chunks60(col("ws"), 8))
      .withColumn("hs", HashOps.shingle_hash60(col("ws"), 3))
      .withColumn("bounds", expr(
        """filter(transform(sequence(1L, CAST(size(ws) AS BIGINT)),
          |  i -> CASE WHEN i = CAST(size(ws) AS BIGINT)
          |            OR (i >= 3 AND i < CAST(size(ws) AS BIGINT)
          |                AND element_at(hs, CAST(i - 2 AS INT)) % 8 = 0)
          |       THEN i END),
          |  x -> x IS NOT NULL)""".stripMargin))
      .withColumn("ref", expr(
        """transform(bounds, (b, i) -> struct(
          |  CAST(i AS BIGINT) AS ci,
          |  CASE WHEN i = 0 THEN 1
          |       ELSE CAST(element_at(bounds, i) + 1 AS INT) END AS s,
          |  CAST(b - (CASE WHEN i = 0 THEN 0L
          |                 ELSE element_at(bounds, i) END) AS INT) AS len,
          |  CAST(conv(substring(md5(array_join(slice(ws,
          |    CASE WHEN i = 0 THEN 1 ELSE CAST(element_at(bounds, i) + 1 AS INT) END,
          |    CAST(b - (CASE WHEN i = 0 THEN 0L
          |                   ELSE element_at(bounds, i) END) AS INT)),
          |    ' ')), 1, 15), 16, 10) AS BIGINT) AS h))""".stripMargin))
    assert(df.filter(to_json(col("fast")) =!= to_json(col("ref"))).count() === 0)
    // every word lands in exactly one chunk, in order
    assert(df.filter(
      expr("aggregate(fast, 0L, (a, c) -> CASE WHEN a = CAST(c.s - 1 AS BIGINT)" +
        " THEN a + c.len ELSE -1000000L END)") =!= size(col("ws")).cast("long"))
      .count() === 0)
  }

  test("shingle_hash60 equals hash60 of concat_ws-joined word 3-grams") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(100)(
      Seq.fill(3 + rnd.nextInt(20))(rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString))
    val df = rows.toDF("ws")
      .withColumn("fast", HashOps.shingle_hash60(col("ws"), 3))
      .withColumn("ref", transform(sequence(lit(1), size(col("ws")) - 2), i =>
        legacyHash60(concat_ws(" ", element_at(col("ws"), i),
          element_at(col("ws"), i + 1), element_at(col("ws"), i + 2)))))
    assert(df.filter(to_json(col("fast")) =!= to_json(col("ref"))).count() === 0)
  }
}
