package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded k-minimum-values (KMV / bottom-k) typed [[Aggregator]]: the
  * k smallest DISTINCT longs of a group, kept sorted. This IS the KMV
  * distinct sketch (Bar-Yossef et al.; Beyer et al.'s "distinct
  * sampling"): the buffer is at most k values, partial-aggregates
  * merge by sorted-union-truncate (order-insensitive, idempotent —
  * re-inserting a seen hash is a no-op), so each map task ships at
  * most k longs per group to the shuffle and the finished sketch is
  * KB-sized state that unions with any other group's sketch WITHOUT
  * rescanning data. Unlike HLL registers, the sketch retains the
  * sample values themselves, so two sketches support set
  * INTERSECTION/Jaccard estimates, not just unions — the q151 story.
  *
  * Inserts take the O(1) reject fast path once the buffer is warm
  * (a >= max ⟹ untouched); accepted values binary-search into the
  * sorted vector. Expected accepts per partition are k·H(n/k) — the
  * classic bottom-k insertion bound — so the O(k) vector patch never
  * dominates the scan.
  */
class KMinLongs(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  import scala.collection.Searching.{Found, InsertionPoint}
  private def ins(b: Seq[Long], a: Long): Seq[Long] =
    if (b.length >= k && a >= b.last) b
    else b.search(a) match {
      case Found(_) => b // distinct semantics: duplicates never occupy a slot
      case InsertionPoint(i) =>
        val grown = b.take(i) ++ (a +: b.drop(i))
        if (grown.length > k) grown.take(k) else grown
    }
  override def zero: Seq[Long] = Vector.empty
  override def reduce(b: Seq[Long], a: Long): Seq[Long] = ins(b, a)
  override def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] =
    b2.foldLeft(b1)(ins)
  override def finish(r: Seq[Long]): Seq[Long] = r
  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

/** Bounded bottom-k typed [[Aggregator]] over (group_key, sort1,
  * sort2, payload) rows — [[TopKScored]]'s ASCENDING, all-integer
  * sibling: per group, the k rows with the smallest (sort1, sort2),
  * kept sorted, payload carried along untouched. Same scale argument
  * as TopKScored: the buffer never exceeds k entries and Aggregators
  * partial-aggregate, so each map task ships AT MOST k rows per group
  * to the shuffle — the shape that replaces
  * `row_number().over(Window.partitionBy(g).orderBy(s1, s2))` when a
  * group's candidate set scales with the corpus (q159's per-label and
  * q167's per-anchor selections: few groups × huge corpus means each
  * window partition is corpus-sized, and the window form degenerates
  * to a handful of mega-partition sorts). Ordering is (sort1 ASC,
  * sort2 ASC) with sort2 a unique tiebreak by contract, so the output
  * sequence order IS the rank — bit-identical to the window form,
  * which the PlanSpec twin test pins.
  */
class BottomKRanked(k: Int)
    extends Aggregator[(Long, Long, Long, Long), Seq[(Long, Long, Long)],
      Seq[(Long, Long, Long)]] {
  private def bounded(s: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long)] =
    s.sortBy(t => (t._1, t._2)).take(k)
  override def zero: Seq[(Long, Long, Long)] = Vector.empty
  override def reduce(b: Seq[(Long, Long, Long)],
      a: (Long, Long, Long, Long)): Seq[(Long, Long, Long)] =
    bounded(b :+ ((a._2, a._3, a._4)))
  override def merge(b1: Seq[(Long, Long, Long)],
      b2: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long)] = bounded(b1 ++ b2)
  override def finish(r: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long)] =
    bounded(r)
  override def bufferEncoder: Encoder[Seq[(Long, Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Long, Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

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
