package graft.tools

import org.apache.spark.sql.SparkSession

import graft.QueryTraits

/** Emit a markdown table of plan-shape facts per query — shuffle count,
  * broadcast count, join strategies, pushed filters — the mechanical
  * half of the 100 TB audit (SCALE.md). Streaming/sink queries execute
  * on construction and hold their scale logic in their own modules, so
  * they are listed but not re-planned here.
  */
object ScaleAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val skip = QueryTraits.executesOnBuild
    println("| query | shuffles | broadcasts | join strategies | pushed filter |")
    println("|---|---|---|---|---|")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (skip(name)) {
        println(s"| $name | — | — | (executes on build; audited in its module/spec) | — |")
      } else {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val lines = plan.linesIterator.toSeq
        def count(p: String) = lines.count(_.contains(p))
        val shuffles = count("Exchange hashpartitioning") +
          count("Exchange rangepartitioning") + count("Exchange RoundRobin")
        val bcasts = count("BroadcastExchange")
        val joins = Seq("BroadcastHashJoin", "SortMergeJoin",
          "ShuffledHashJoin", "BroadcastNestedLoopJoin")
          .filter(j => plan.contains(j)) match {
          case Nil => "none"
          case js => js.mkString(", ")
        }
        val pushed = lines.find(_.contains("PushedFilters: ["))
          .exists(!_.contains("PushedFilters: []"))
        println(s"| $name | $shuffles | $bcasts | $joins | $pushed |")
      }
    }
    spark.stop()
  }
}
