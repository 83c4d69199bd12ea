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
}
