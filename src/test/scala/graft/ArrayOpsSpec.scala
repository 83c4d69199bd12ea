package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ArrayOps

/** sorted_intersect_count must agree with size(array_intersect) on
  * sorted distinct inputs — checked via Spark itself on randomised
  * (seeded, deterministic) arrays.
  */
class ArrayOpsSpec extends AnyFunSuite {
  import SparkTestSession.spark

  test("matches size(array_intersect) on sorted distinct long arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(200) {
      val a = Seq.fill(rnd.nextInt(30))(rnd.nextInt(50).toLong)
        .distinct.sorted
      val b = Seq.fill(rnd.nextInt(30))(rnd.nextInt(50).toLong)
        .distinct.sorted
      (a, b)
    }
    val df = rows.toDF("a", "b")
      .withColumn("fast", ArrayOps.sorted_intersect_count(col("a"), col("b")))
      .withColumn("ref", size(array_intersect(col("a"), col("b"))))
    assert(df.filter(col("fast") =!= col("ref")).count() === 0)
  }

  test("edge cases: empty, disjoint, identical") {
    import spark.implicits._
    val df = Seq(
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(1L, 3L, 5L), Seq(2L, 4L, 6L)),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)))
      .toDF("a", "b")
      .withColumn("fast", ArrayOps.sorted_intersect_count(col("a"), col("b")))
    assert(df.select("fast").as[Int].collect().toSeq === Seq(0, 0, 3))
  }
}
