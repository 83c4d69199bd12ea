package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Portable._
import graft.sources.Tables

/** TOKENIZER ENGINEERING beyond encode (q124) and fertility (q187):
  * the audits a tokenizer OWNER runs over the corpus before shipping a
  * merge table. Split out of `TextAnalysis` (which stays the consumer
  * side: encode, counts, fertility).
  */
object Tokenizer {

  /** q221: BPE MERGE-ABLATION CURVE — the realized marginal value of
    * every merge rule over this corpus: for each rank-r merge, the
    * corpus-total token counts with merges 1..r−1 vs 1..r applied,
    * tokens saved, and the relative saving in milli. This is the
    * trainer's greedy-gain curve measured on REAL data (q82 counts
    * the candidate pairs the trainer ranks; this measures what each
    * shipped rule actually buys) — the table that decides vocabulary
    * pruning: a tail rule saving ~0 milli is a vocab slot better
    * spent elsewhere, and because merges chain (t+h feeds th+e), a
    * rule's value exists only GIVEN its prefix, which is exactly what
    * the prefix sweep holds fixed.
    *
    * Scale: token counts are a function of the WORD alone, so the
    * N+1 prefix folds run once per DISTINCT vocabulary term (one
    * term-frequency shuffle with map-side partials, then row-local
    * folds over the vocab-sized table, each weighted by the term's
    * corpus occurrences) — 20–50× less fold work than per-occurrence
    * on natural text, and the final aggregation is a corpus-total sum
    * of an (N+1)-element vector. Output is N rows, never
    * corpus-sized.
    */
  def mergeAblation(spark: SparkSession, dir: String): DataFrame = {
    val merges = TextAnalysis.bpeMerges
    val n = merges.length
    val tf = Tables.documents(spark, dir)
      .select(explode(words(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("occ"))
    val totals = tf
      .select(col("occ"), array((0 to n).map(p =>
        TextAnalysis.bpeTokensUpTo(col("w"), p)): _*).as("t"))
      .agg(array((0 to n).map(p =>
        sum(element_at(col("t"), p + 1) * col("occ"))): _*).as("ts"))
    val pairs = array(merges.map { case (a, b) => lit(s"$a+$b") }: _*)
    totals
      .select(explode(transform(sequence(lit(1), lit(n)), m =>
        struct(m.cast("int").as("rank"),
          element_at(pairs, m).as("merge_pair"),
          element_at(col("ts"), m).as("tokens_before"),
          element_at(col("ts"), m + 1).as("tokens_after")))).as("r"))
      .select(col("r.rank"), col("r.merge_pair"),
        col("r.tokens_before"), col("r.tokens_after"),
        (col("r.tokens_before") - col("r.tokens_after"))
          .as("tokens_saved"),
        expr("(1000 * (r.tokens_before - r.tokens_after)) " +
          "DIV r.tokens_before").as("saved_milli"))
  }

  /** q221 replay: the same N+1 prefix folds as one list of corpus
    * sums, unrolled to per-rank rows. Each prefix kernel contains
    * `||` concatenations, so the whole list splices AFTER stripMargin.
    */
  private val mergeAblationSql = {
    val merges = TextAnalysis.bpeMerges
    val n = merges.length
    val sums = (0 to n).map(p =>
      s"(SELECT CAST(sum(x) AS BIGINT) FROM (SELECT " +
        TextAnalysis.sqlBpeTokensOfWsUpTo(p) + " x FROM d))")
      .mkString("[", ", ", "]")
    val pairList = merges.map { case (a, b) => s"'$a+$b'" }
      .mkString("[", ", ", "]")
    s"""WITH d AS (SELECT @WS@ ws FROM documents),
       |t AS (SELECT @SUMS@ ts),
       |m AS (SELECT CAST(unnest(range(1, ${n + 1})) AS INTEGER) r)
       |SELECT r rank, @PAIRS@[r] merge_pair,
       |  ts[r] tokens_before, ts[r + 1] tokens_after,
       |  ts[r] - ts[r + 1] tokens_saved,
       |  (1000 * (ts[r] - ts[r + 1])) // ts[r] saved_milli
       |FROM t, m""".stripMargin
      .replace("@WS@", sqlWords)
      .replace("@SUMS@", sums)
      .replace("@PAIRS@", pairList)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q221_merge_ablation" -> mergeAblation)

  val oracle: Map[String, String] = Map(
    "q221_merge_ablation" -> mergeAblationSql)
}
