package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Core, Relational}

/** Physical-plan assertions — the 100 TB posture checks: filters and
  * column pruning reach the parquet scan, dimension joins broadcast,
  * the per-key nest is a single shuffle.
  */
class PlanSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf0001}

  private def physical(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q01 scan pushes the quantity filter into the parquet scan") {
    val plan = physical(Core.scanProject(spark, sf0001))
    assert(plan.contains("PushedFilters"), plan.take(2000))
    assert(plan.contains("GreaterThanOrEqual(l_quantity,45.0)"), plan.take(2000))
  }

  test("q01 scan prunes to the 4 selected columns") {
    val plan = physical(Core.scanProject(spark, sf0001))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema"))
      .getOrElse(plan.split("ReadSchema").last)
    assert(readSchema.contains("l_orderkey") && !readSchema.contains("l_shipdate"),
      readSchema)
  }

  test("q09 joins dimensions via broadcast, not shuffle") {
    val plan = physical(Relational.joinRevenue(spark, sf0001))
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
  }

  test("q04 nest is a single shuffle on key") {
    val plan = physical(Core.nestRows(spark, sf0001))
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges === 1, s"expected 1 Exchange, plan:\n$plan")
  }
}
