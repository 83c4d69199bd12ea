package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k typed [[Aggregator]] over (q_id, vec_id, cosine)
  * rows — the §4.3 "top-k heap aggregator" extension point: per-group
  * top-k WITHOUT a per-group window sort. The buffer never holds more
  * than k entries, and because Aggregators partial-aggregate, each map
  * task ships AT MOST k rows per group to the shuffle — at 100 TB the
  * difference between "sort every group's candidate set" (the window
  * form ranks all rows before cutting) and "merge tasks×k survivors"
  * (the TakeOrdered shape, but PER GROUP and composable inside any
  * aggregation).
  *
  * Ordering matches the window form exactly: cosine DESC then vec_id
  * ASC, with cosine computed by the same IEEE expression
  * ([[Portable.cosineq]]) on both paths, so q99 hash-matches q19's
  * brute-force oracle. k is tiny by contract; the O(k log k) insert
  * sort is a deliberate simplicity trade a production kernel replaces
  * with a bounded priority queue at large k — same plan shape.
  */
class TopKScored(k: Int)
    extends Aggregator[(Long, Long, Double), Seq[(Long, Double)],
      Seq[(Long, Double)]] {
  private def bounded(s: Seq[(Long, Double)]): Seq[(Long, Double)] =
    s.sortBy(t => (-t._2, t._1)).take(k)
  override def zero: Seq[(Long, Double)] = Vector.empty
  override def reduce(b: Seq[(Long, Double)],
      a: (Long, Long, Double)): Seq[(Long, Double)] =
    bounded(b :+ ((a._2, a._3)))
  override def merge(b1: Seq[(Long, Double)],
      b2: Seq[(Long, Double)]): Seq[(Long, Double)] = bounded(b1 ++ b2)
  override def finish(r: Seq[(Long, Double)]): Seq[(Long, Double)] = bounded(r)
  override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
