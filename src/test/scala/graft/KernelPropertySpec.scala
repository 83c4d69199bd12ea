package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Events, TextAnalysis}

/** Property-based checks for the round's row-local kernels, each
  * against an independent straight-line Scala reference:
  *
  *  - q124's bracket-replace BPE encode vs a symbol-list merge loop
  *    (validates that leftmost non-overlapping string replace over
  *    bracket-atomized symbols IS the BPE merge step);
  *  - q126's running-max interval merge vs a brute-force sweep;
  *  - q137's prefix-filter theorem (J ≥ t ⟹ the (len−⌈t·len⌉+1)-
  *    prefixes intersect) on random sets — the pure-math half of the
  *    exactness claim whose corpus-wide half is the brute-force oracle.
  */
class KernelPropertySpec extends AnyFunSuite {
  import SparkTestSession.spark

  private def check(p: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  /** Reference BPE: symbols as a list, each merge applied left-to-right
    * consuming pairs (scan resumes after a merged pair — the replace-all
    * contract both engines implement).
    */
  private def refBpeTokens(w: String): Int = {
    var syms = w.map(_.toString).toVector :+ "</w>"
    for ((a, b) <- TextAnalysis.bpeMerges) {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.result()
    }
    syms.length
  }

  test("q124 bracket-replace encode == symbol-list BPE on random words") {
    import spark.implicits._
    val genWord = Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    // a true Prop.forAll (shrinking + seed reporting on failure), with
    // words BATCHED per trial so each evaluation is one small Spark job
    // instead of 400 one-row jobs
    val genBatch = Gen.listOfN(25, genWord).map(_.distinct)
    check(Prop.forAll(genBatch) { words =>
      words.isEmpty || {
        val got = words.toDF("w")
          .select(col("w"), TextAnalysis.bpeTokens(col("w")).as("n"))
          .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
        words.forall(w => got(w) == refBpeTokens(w))
      }
    }, n = 20)
  }

  /** Reference interval merge: sort, sweep, count islands and covered
    * time (abutting intervals merge, matching the kernel's
    * `us > prev_max` convention).
    */
  private def refCoverage(iv: Seq[(Long, Long)]): (Long, Long) = {
    var islands = 0L
    var covered = 0L
    var curStart = Long.MinValue
    var curEnd = Long.MinValue
    iv.sorted.foreach { case (s, e) =>
      if (islands == 0L || s > curEnd) {
        if (islands > 0L) covered += curEnd - curStart
        islands += 1; curStart = s; curEnd = math.max(s, e)
      } else curEnd = math.max(curEnd, e)
    }
    if (islands > 0L) covered += curEnd - curStart
    (islands, covered)
  }

  test("q126 running-max island merge == brute-force sweep on random intervals") {
    import spark.implicits._
    val genIv = for {
      s <- Gen.chooseNum(0L, 500L)
      d <- Gen.chooseNum(1L, 120L)
    } yield (s, s + d)
    val genUser = Gen.chooseNum(1, 15).flatMap(n => Gen.listOfN(n, genIv))
    // Prop.forAll over a BATCH of users per trial: shrinking/seed
    // reporting like the q137 property, one Spark job per evaluation
    val genBatch = Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, genUser))
    check(Prop.forAll(genBatch) { users =>
      val rows = users.zipWithIndex.flatMap { case (iv, u) =>
        iv.zipWithIndex.map { case ((s, e), i) =>
          (u.toLong, i.toLong, s, e)
        }
      }
      val got = Events.coverageOf(
        rows.toDF("user_id", "event_id", "us", "end_us"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3)))).toMap
      users.zipWithIndex.forall { case (iv, u) =>
        got(u.toLong) == refCoverage(iv)
      }
    }, n = 20)
  }

  test("q137 prefix-filter theorem holds on random hash sets") {
    val t = 0.5
    val genSet = Gen.chooseNum(3, 30).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 60L)).map(_.distinct.sorted))
    check(Prop.forAll(genSet, genSet) { (a, b) =>
      val inter = a.intersect(b).length
      val j = inter.toDouble / (a.length + b.length - inter)
      def prefix(s: Seq[Long]) =
        s.take(s.length - math.ceil(t * s.length).toInt + 1)
      // if J >= t the prefixes MUST share an element (no false negative)
      j < t || prefix(a).intersect(prefix(b)).nonEmpty
    }, n = 500)
  }

  test("q151 KMinLongs == sorted-distinct-take-k under any split/order") {
    val k = 8
    val genVals = Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 30L))) // dense range forces dups
    val genSplit = Gen.chooseNum(0.0, 1.0)
    check(Prop.forAll(genVals, genSplit) { (vals, frac) =>
      val agg = new graft.functions.KMinLongs(k)
      val ref = vals.distinct.sorted.take(k)
      // single-pass reduce over one partition
      val one = vals.foldLeft(agg.zero)(agg.reduce)
      // two partitions merged (either order) — mergeability contract
      val cut = (vals.length * frac).toInt
      val (l, r) = vals.splitAt(cut)
      val (bl, br) = (l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      one == ref && agg.merge(bl, br) == ref && agg.merge(br, bl) == ref &&
        agg.merge(one, one) == ref // idempotent: re-union is a no-op
    }, n = 500)
  }

  test("BottomKRanked == sort-take under any partitioning / merge order") {
    val k = 5
    val genRows = Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, for {
      s1 <- Gen.chooseNum(0L, 20L) // small domain → forced s1 ties
      s2 <- Gen.chooseNum(0L, 1000000L)
      p <- Gen.chooseNum(0L, 9L)
    } yield (0L, s1, s2, p)))
    val genSplit = Gen.chooseNum(0.0, 1.0)
    check(Prop.forAll(genRows, genSplit) { (rows0, frac) =>
      // sort2 is a UNIQUE tiebreak by contract (vec_id / doc_id);
      // enforce it so stable-sort payload order can't differ by split
      val rows = rows0.zipWithIndex.map { case ((z, s1, s2, p), i) =>
        (z, s1, s2 * 64 + i, p) }
      val agg = new graft.functions.BottomKRanked(k)
      val ref = rows.map(t => (t._2, t._3, t._4))
        .sortBy(t => (t._1, t._2)).take(k)
      val one = rows.foldLeft(agg.zero)(agg.reduce)
      val cut = (rows.length * frac).toInt
      val (l, r) = rows.splitAt(cut)
      val (bl, br) = (l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      one == ref && agg.merge(bl, br) == ref && agg.merge(br, bl) == ref &&
        agg.finish(one) == ref
    }, n = 500)
  }

  test("bottomKVerdict merge pass == set-arithmetic reference; exact when the union fits") {
    import graft.operators.Dedup
    val genSet = Gen.chooseNum(0, 60).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 99L)).map(_.distinct.sorted))
    val genK = Gen.chooseNum(1, 80)
    check(Prop.forAll(genSet, genSet, genK) { (a, b, k) =>
      // full sets, sketched to bottom-k like the stream does
      val (sa, sb) = (a.take(k).toArray, b.take(k).toArray)
      // independent reference, straight from the estimator's
      // definition: X = k smallest of sa ∪ sb, Y = |X ∩ sa ∩ sb|
      val x = (sa ++ sb).distinct.sorted.take(k)
      val y = x.count(v => sa.contains(v) && sb.contains(v))
      val got = Dedup.bottomKVerdict(sa, sb, k)
      val defMatch = got == (2 * y >= x.length)
      // …and whenever the WHOLE union fits the sketch, the estimator
      // IS q15's exact integer rule 2·∩ ≥ |a|+|b|−∩ on the full sets
      val exactMatch = {
        val union = (a ++ b).distinct.length
        val inter = a.count(b.contains)
        union > k || got == (2 * inter >= a.length + b.length - inter)
      }
      defMatch && exactMatch
    }, n = 1000)
  }
}
