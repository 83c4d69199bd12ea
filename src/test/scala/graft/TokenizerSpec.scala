package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{TextAnalysis, Tokenizer}

/** q221 merge-ablation: the curve must equal a string-level local
  * replay of the prefix folds, start at the char-token total, and be
  * monotone non-increasing (a BPE merge can only shrink counts).
  */
class TokenizerSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf0001}

  test("q221 merge ablation equals a local prefix-fold replay and is monotone") {
    val merges = TextAnalysis.bpeMerges
    def tokens(word: String, p: Int): Long = {
      val init = word.map(c => s"[$c]").mkString + "[</w>]"
      val folded = merges.take(p).foldLeft(init) { case (acc, (a, b)) =>
        acc.replace(s"[$a][$b]", s"[$a$b]")
      }
      folded.count(_ == '[').toLong
    }
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select(org.apache.spark.sql.functions.col("text")).collect()
      .map(_.getString(0).split(" ").filter(_.nonEmpty))
    val totals = (0 to merges.length).map(p =>
      docs.map(_.map(tokens(_, p)).sum).sum)
    val expected = (1 to merges.length).map { r =>
      val (a, b) = merges(r - 1)
      (r, s"$a+$b", totals(r - 1), totals(r), totals(r - 1) - totals(r),
        1000L * (totals(r - 1) - totals(r)) / totals(r - 1))
    }.toSet
    val got = Tokenizer.mergeAblation(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got === expected)
    // prefix 0 is the char-token total (every char + </w> a token)
    assert(totals(0) === docs.map(_.map(_.length.toLong + 1).sum).sum)
    // merges never increase the count, and the table as shipped must
    // actually earn something on this corpus
    assert(totals.sliding(2).forall(w => w(1) <= w(0)))
    assert(totals.last < totals.head,
      "the full merge table saved zero tokens — not a BPE table")
  }

  /** Local replay of the exact greedy loop: word-frequency table,
    * bracket segmentations, per-round (count desc, l, r) argmax,
    * leftmost non-overlapping replace — Java String.replace, Spark's
    * replace and DuckDB's replace all share that scan order. Shared by
    * the q228 and q232 tests.
    */
  private def localTrain(ws: Seq[String]): Seq[(Int, String, String, Long)] = {
    val wf = ws.groupBy(identity).map { case (w, g) => w -> g.length.toLong }
    var seg = wf.map { case (w, f) =>
      (w.map(c => s"[$c]").mkString + "[</w>]", f) }.toSeq
    (1 to Tokenizer.TrainRounds).map { k =>
      val counts = new scala.collection.mutable.HashMap[(String, String), Long]
      seg.foreach { case (s, f) =>
        val sym = s.substring(1, s.length - 1).split("\\]\\[")
        sym.sliding(2).filter(_.length == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + f
        }
      }
      val ((l, r), n) = counts.toSeq.minBy { case ((l, r), n) => (-n, l, r) }
      seg = seg.map { case (s, f) => (s.replace(s"[$l][$r]", s"[$l$r]"), f) }
      (k, l, r, n)
    }
  }

  private def localEncode(word: String,
      merges: Seq[(String, String)]): Long =
    merges.foldLeft(word.map(c => s"[$c]").mkString + "[</w>]") {
      case (acc, (a, b)) => acc.replace(s"[$a][$b]", s"[$a$b]")
    }.count(_ == '[').toLong

  private def docWords(pred: Long => Boolean): Seq[(String, Array[String])] =
    graft.sources.Tables.documents(spark, sf0001)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("lang"),
        org.apache.spark.sql.functions.col("text")).collect()
      .filter(r => pred(r.getLong(0)))
      .map(r => (r.getString(1), r.getString(2).split(" ").filter(_.nonEmpty)))
      .toSeq

  test("q228 trainer equals a local greedy replay; picks chain like a real BPE table") {
    val expected = localTrain(docWords(_ => true).flatMap(_._2))
    val got = Tokenizer.bpeTrain(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got === expected, "trained table diverged from the greedy replay")
    // structural chaining (the bpeMerges discipline, t+h before th+e):
    // every symbol a pick consumes is a base symbol (single char or
    // </w>) or the product of an EARLIER pick — a rank never references
    // a merge that has not happened yet
    got.foldLeft(Set.empty[String]) { case (products, (k, l, r, _)) =>
      Seq(l, r).foreach(s => assert(
        s.length == 1 || s == "</w>" || products(s),
        s"rank $k consumes '$s' before any earlier rank produced it"))
      products + (l + r)
    }
    // the depth actually EXERCISES chaining on this corpus: some pick
    // builds on an earlier pick's product (else the spec pins nothing
    // beyond round-1 argmaxes)
    val prods = got.map { case (_, l, r, _) => l + r }
    assert(got.exists { case (k, l, r, _) =>
      prods.take(k - 1).contains(l) || prods.take(k - 1).contains(r) },
      s"no chained pick in ${got.map(g => s"${g._2}+${g._3}")}")
    // per-round greedy gains are the counts q82 ranks: round 1's pick
    // IS q82's top pair
    val top = TextAnalysis.bpePairs(spark, sf0001).head()
    assert(s"${got.head._2} ${got.head._3}" === top.getString(0))
    assert(got.head._4 === top.getLong(1))
  }

  test("q232 held-out audit equals a local train/apply replay; bounds hold per language") {
    val train = docWords(_ % 2 == 0)
    val eval = docWords(_ % 2 == 1)
    val merges = localTrain(train.flatMap(_._2)).map(m => (m._2, m._3))
    val expected = eval.groupBy(_._1).map { case (lang, docs) =>
      val ws = docs.flatMap(_._2)
      val nw = ws.length.toLong
      val nc = ws.map(_.length.toLong + 1).sum
      val nb = ws.map(localEncode(_, merges)).sum
      (lang, nw, nc, nb, 1000 * nb / nw, 1000 * nb / nc)
    }.toSet
    val got = Tokenizer.heldoutAudit(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got === expected, "held-out audit diverged from the local replay")
    // hard bounds: every word is at least one token (fertility ≥ 1000
    // milli) and merges never EXPAND a word past its char tokens
    // (compression ≤ 1000 milli); the trained table must actually
    // compress the held-out half somewhere or it generalized nothing
    got.foreach { r =>
      assert(r._5 >= 1000L, s"${r._1} fertility ${r._5}")
      assert(r._6 <= 1000L, s"${r._1} compression ${r._6}")
    }
    assert(got.exists(_._6 < 1000L),
      "trained merges saved zero held-out tokens in every language")
  }
}
