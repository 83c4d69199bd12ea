package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** q241: VOCABULARY PRUNING — the decision q221's curve exists to
    * inform, executed: keep the SHORTEST merge-table prefix whose
    * cumulative realized saving reaches 90% of the full table's (exact
    * integers: 10·cum ≥ 9·total), and emit the per-rank verdict table
    * — rank, cumulative savings (absolute and milli-of-total), and
    * whether the rule survives the cut. Tail rules that buy almost
    * nothing are vocab slots returned to the embedding matrix; because
    * merges chain, pruning is only sound as a PREFIX cut, which is
    * exactly what the cumulative curve ranks.
    *
    * Scale: everything derives from q221's output frame (N rows, one
    * corpus term-frequency pass shared with it); the cumulative window
    * orders N ≈ vocabulary-size rows — the q227 bounded-window class,
    * never corpus-sized.
    */
  def vocabPrune(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ab = mergeAblation(spark, dir)
    val cum = Window.orderBy(col("rank"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ab
      .withColumn("cum_saved", sum(col("tokens_saved")).over(cum))
      .withColumn("total_saved", sum(col("tokens_saved")).over(whole))
      .withColumn("cut_rank", min(when(
        col("cum_saved") * 10 >= col("total_saved") * 9, col("rank")))
        .over(whole))
      .select(col("rank"), col("merge_pair"), col("tokens_saved"),
        col("cum_saved"),
        expr("(1000 * cum_saved) DIV nullif(total_saved, 0)")
          .as("cum_milli"),
        (col("rank") <= col("cut_rank")).as("kept"))
  }

  // lazy: splices mergeAblationSql, which is declared below
  private lazy val vocabPruneSql =
    """WITH ab AS (@AB@),
      |c AS (SELECT *,
      |  CAST(sum(tokens_saved) OVER (ORDER BY rank) AS BIGINT) cum_saved,
      |  CAST(sum(tokens_saved) OVER () AS BIGINT) total_saved FROM ab),
      |k AS (SELECT min(rank) cut FROM c
      |      WHERE cum_saved * 10 >= total_saved * 9)
      |SELECT rank, merge_pair, tokens_saved, cum_saved,
      |  CAST((1000 * cum_saved) // nullif(total_saved, 0) AS BIGINT)
      |    AS cum_milli,
      |  rank <= k.cut AS kept
      |FROM c, k""".stripMargin
      .replace("@AB@", mergeAblationSql)

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

  /** q228 training depth: enough rounds to exercise merge CHAINING on
    * the synthetic corpus (a round-k pick whose symbol is a round-j<k
    * product) while keeping the oracle's unrolled replay tractable.
    */
  private[graft] val TrainRounds = 8

  /** q228: ITERATIVE BPE TRAINER — the greedy loop that PRODUCES a
    * merge table (q82 is one round's pair statistic; q124/q221 consume
    * a finished table): for K rounds, count adjacent symbol pairs over
    * the vocabulary weighted by occurrence, pick the most frequent
    * (deterministic tiebreak: count desc, then left/right symbol asc —
    * both engines compare the same ASCII strings), apply the merge to
    * every segmentation, recount. Segmentations live as q124's
    * bracket-atomized strings (`[c][o][l][</w>]`), so "apply merge" is
    * ONE literal left-to-right `replace` of `[a][b]`→`[ab]` — the
    * identical kernel both engines already share for encode. Output is
    * the trained table: (merge_rank, left_sym, right_sym, pair_count),
    * K rows.
    *
    * Scale: the corpus is touched ONCE (the word-frequency shuffle —
    * the q82 trainer optimization); all K rounds run over the
    * vocabulary-sized segmentation table, re-aggregated per round with
    * map-side partials. Each round's argmax is a 1-row driver collect
    * — the trainer's control decision, same bounded class as the
    * centroid fixtures — and the loop checkpoints per round (the q91
    * `cpIter` discipline) so round k's lineage does not replay rounds
    * 1..k−1. At 100 TB: one corpus pass + K vocab-sized rounds, output
    * K rows.
    */
  /** The greedy training kernel over an arbitrary document frame —
    * shared by q228 (full corpus) and q232 (train split only): returns
    * the picked merges in rank order with their selection-time pair
    * counts. The K argmaxes are 1-row driver collects (the trainer's
    * control decisions); everything else is vocab-grain.
    */
  private[graft] def trainMerges(
      docs: DataFrame): Seq[(Int, String, String, Long)] = {
    import graft.operators.Checkpoints.CpOps
    val wf = docs
      .select(explode(words(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
    var seg = wf.select(col("f"), concat(
        array_join(transform(sequence(lit(1), length(col("w"))), i =>
          concat(lit("["), col("w").substr(i, lit(1)), lit("]"))), ""),
        lit("[</w>]")).as("s"))
      .cpIter()
    val picked = Seq.newBuilder[(Int, String, String, Long)]
    for (k <- 1 to TrainRounds) {
      // fully-merged words (one symbol left) generate no pairs; the
      // size guard also keeps sequence() off the descending-step path
      val best = seg
        .select(col("f"), split(col("s").substr(lit(2),
          length(col("s")) - 2), "\\]\\[").as("sym"))
        .filter(size(col("sym")) >= 2)
        .select(col("f"), explode(transform(
          sequence(lit(1), size(col("sym")) - 1), i =>
            struct(element_at(col("sym"), i).as("l"),
              element_at(col("sym"), i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("f")).as("n"))
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .limit(1).collect()(0)
      val (l, r, n) = (best.getString(0), best.getString(1), best.getLong(2))
      picked += ((k, l, r, n))
      seg = seg.withColumn("s", replace(col("s"),
        lit(s"[$l][$r]"), lit(s"[$l$r]"))).cpIter()
    }
    picked.result()
  }

  def bpeTrain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    trainMerges(Tables.documents(spark, dir))
      .toDF("merge_rank", "left_sym", "right_sym", "pair_count")
  }

  /** q232: HELD-OUT TOKENIZER AUDIT — the acceptance test a tokenizer
    * owner runs before shipping q228's trained table: train on HALF
    * the corpus (even doc_ids), apply the trained merges to the
    * held-out half (odd doc_ids), and report per-language fertility
    * (BPE tokens per word, milli) and compression (BPE tokens per
    * character token, milli). Training-set fertility flatters any
    * tokenizer (the merges were picked to compress exactly those
    * words); the held-out number is the one that predicts production
    * cost — and the per-language split is where a shared tokenizer's
    * bias shows (the q187 concern, now measured against a table this
    * engine trained rather than a fixed one).
    *
    * Scale: the trainer's one-corpus-pass + K vocab-grain rounds on
    * the train half; the eval half is ONE row-local encode pass (the
    * trained merges fold into a literal replace chain, q124's shape —
    * no join against the training data at all: "train once, ship the
    * table, score every future drop" is the production contract this
    * query rehearses).
    */
  def heldoutAudit(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val merges = trainMerges(docs.filter(col("doc_id") % 2 === 0))
      .map(m => (m._2, m._3))
    // q124's bracket fold under the TRAINED table (literal chain)
    def tokens(w: Column): Column = {
      val init = concat(
        array_join(transform(sequence(lit(1), length(w)), i =>
          concat(lit("["), w.substr(i, lit(1)), lit("]"))), ""),
        lit("[</w>]"))
      val folded = merges.foldLeft(init) { case (acc, (a, b)) =>
        replace(acc, lit(s"[$a][$b]"), lit(s"[$a$b]"))
      }
      length(folded) - length(replace(folded, lit("[")))
    }
    docs.filter(col("doc_id") % 2 === 1)
      .select(col("lang"), words(col("text")).as("ws"))
      .select(col("lang"), size(col("ws")).cast("long").as("nw"),
        aggregate(transform(col("ws"), w => (length(w) + 1).cast("long")),
          lit(0L), (a, x) => a + x).as("nc"),
        aggregate(transform(col("ws"), w => tokens(w).cast("long")),
          lit(0L), (a, x) => a + x).as("nb"))
      .groupBy(col("lang"))
      .agg(sum(col("nw")).as("n_words"),
        sum(col("nc")).as("n_char_tokens"),
        sum(col("nb")).as("n_bpe_tokens"))
      .withColumn("fertility_milli",
        expr("1000 * n_bpe_tokens DIV n_words"))
      .withColumn("compression_milli",
        expr("1000 * n_bpe_tokens DIV n_char_tokens"))
  }

  /** q228 replay: the K rounds unrolled as chained CTEs — per round, a
    * pair count over the previous segmentation, the same
    * (count desc, l, r) argmax, and the same bracket-string replace.
    * Round kernels contain `||` concatenations, so the whole chain
    * splices AFTER stripMargin.
    */
  // bracket-atomize one word (column `w`) — the oracle-side q124 init
  private val sqlBracketInit =
    "'[' || array_to_string(list_transform(range(1, len(w) + 1), " +
      "i -> substr(w, CAST(i AS INTEGER), 1)), '][') || '][</w>]'"

  /** The K training rounds as chained CTEs over `seg0 (f, s)` — shared
    * verbatim by the q228 and q232 oracles so the two replays can
    * never train different tables. Contains `||` — splice AFTER
    * stripMargin.
    */
  private def trainRoundsSql: String = (1 to TrainRounds).map { k =>
    s"""p$k AS (SELECT pair, CAST(sum(f) AS BIGINT) n
       |  FROM (SELECT f, unnest(list_transform(range(1, len(sym)),
       |            i -> sym[i] || ' ' || sym[i + 1])) pair
       |        FROM (SELECT f, string_split(substr(s, 2, len(s) - 2),
       |                '][') sym FROM seg${k - 1}))
       |  GROUP BY pair),
       |m$k AS (SELECT l, r, n FROM (
       |    SELECT string_split(pair, ' ')[1] l,
       |           string_split(pair, ' ')[2] r, n FROM p$k)
       |  ORDER BY n DESC, l, r LIMIT 1),
       |seg$k AS (SELECT f, replace(seg.s,
       |    '[' || m.l || '][' || m.r || ']',
       |    '[' || m.l || m.r || ']') s
       |  FROM seg${k - 1} seg, m$k m)""".stripMargin
  }.mkString(",\n")

  private val bpeTrainSql = {
    val selects = (1 to TrainRounds).map(k =>
      s"SELECT CAST($k AS INTEGER) merge_rank, l left_sym, r right_sym," +
        s" n pair_count FROM m$k").mkString("\nUNION ALL\n")
    """WITH wf AS (SELECT w, count(*) f
      |  FROM (SELECT unnest(@WS@) w FROM documents) GROUP BY w),
      |seg0 AS (SELECT f, @INIT@ s FROM wf),
      |@ROUNDS@
      |@SELECTS@""".stripMargin
      .replace("@WS@", sqlWords)
      .replace("@INIT@", sqlBracketInit)
      .replace("@ROUNDS@", trainRoundsSql)
      .replace("@SELECTS@", selects)
  }

  // q232 replay: train the table on the even half (the SAME round
  // CTEs as q228's oracle), then chain the trained merges over the
  // odd half's (lang, word) vocabulary and fold weighted token sums
  private val heldoutAuditSql = {
    val evalRounds = (1 to TrainRounds).map { k =>
      s"""es$k AS (SELECT lang, w, c, replace(e.s,
         |    '[' || m.l || '][' || m.r || ']',
         |    '[' || m.l || m.r || ']') s
         |  FROM es${k - 1} e, m$k m)""".stripMargin
    }.mkString(",\n")
    s"""WITH wf AS (SELECT w, count(*) f
       |  FROM (SELECT unnest(@WS@) w FROM documents WHERE doc_id % 2 = 0)
       |  GROUP BY w),
       |seg0 AS (SELECT f, @INIT@ s FROM wf),
       |@ROUNDS@,
       |ew AS (SELECT lang, w, CAST(count(*) AS BIGINT) c
       |  FROM (SELECT lang, unnest(@WS@) w FROM documents
       |        WHERE doc_id % 2 = 1)
       |  GROUP BY lang, w),
       |es0 AS (SELECT lang, w, c, @INIT@ s FROM ew),
       |@EVALROUNDS@,
       |t AS (SELECT lang, CAST(sum(c) AS BIGINT) n_words,
       |        CAST(sum(c * (len(w) + 1)) AS BIGINT) n_char_tokens,
       |        CAST(sum(c * (len(s) - len(replace(s, '[', ''))))
       |          AS BIGINT) n_bpe_tokens
       |      FROM es${TrainRounds} GROUP BY lang)
       |SELECT lang, n_words, n_char_tokens, n_bpe_tokens,
       |  1000 * n_bpe_tokens // n_words AS fertility_milli,
       |  1000 * n_bpe_tokens // n_char_tokens AS compression_milli
       |FROM t""".stripMargin
      .replace("@WS@", sqlWords)
      .replace("@INIT@", sqlBracketInit)
      .replace("@ROUNDS@", trainRoundsSql)
      .replace("@EVALROUNDS@", evalRounds)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q221_merge_ablation" -> mergeAblation,
    "q241_vocab_prune" -> vocabPrune,
    "q228_bpe_train" -> bpeTrain,
    "q232_heldout_audit" -> heldoutAudit)

  val oracle: Map[String, String] = Map(
    "q221_merge_ablation" -> mergeAblationSql,
    "q241_vocab_prune" -> vocabPruneSql,
    "q228_bpe_train" -> bpeTrainSql,
    "q232_heldout_audit" -> heldoutAuditSql)
}
