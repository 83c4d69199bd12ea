package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CellModel, Compaction}

/** q53 merge semantics on sf0.001, checked per key class:
  * keys ≡ 4 (mod 5) are fully tombstoned at +1h (shadowed), keys ≡ 2
  * get the gen-1 update for every live cell, everything else must pass
  * through identical to the single-generation live view.
  */
class CompactionSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf0001}

  private lazy val out = Compaction.compact(spark, sf0001)
    .localCheckpoint(true)
  private lazy val live = CellModel.liveCellStrings(spark, sf0001)

  test("tombstoned keys (4 mod 5) vanish from the reconciled set") {
    assert(live.filter(col("key").cast("long") % 5 === 4).count() > 0)
    assert(out.filter(col("key").cast("long") % 5 === 4).count() === 0)
  }

  test("updated keys (2 mod 5) surface only the gen-1 cells") {
    val upd = out.filter(col("key").cast("long") % 5 === 2)
    assert(upd.count() ===
      live.filter(col("key").cast("long") % 5 === 2).count())
    assert(upd.filter(col("gen") =!= 1).count() === 0)
    assert(upd.filter(!col("value").endsWith("@2")).count() === 0)
  }

  test("untouched keys reconcile to exactly the live single-gen cells") {
    val rest = out.filter(col("key").cast("long") % 5 =!= 2 &&
      col("key").cast("long") % 5 =!= 4)
      .select("key", "name", "value", "write_time")
    val base = live.filter(col("key").cast("long") % 5 =!= 2 &&
      col("key").cast("long") % 5 =!= 4)
    assert(rest.exceptAll(base).count() === 0)
    assert(base.exceptAll(rest).count() === 0)
    assert(out.filter(col("gen") === 0).count() === base.count())
  }
}
