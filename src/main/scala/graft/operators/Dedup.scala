package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Portable
import graft.functions.Portable._
import graft.operators.Checkpoints._
import graft.sources.Tables

/** Deduplication operators over the `documents` / `embeddings` tables —
  * the core of a training-data pipeline, designed scale-first:
  *
  *  - signatures (minhash, simhash, anchors) are computed ROW-LOCALLY
  *    from higher-order functions over the token arrays — zero shuffle
  *    until candidate generation;
  *  - candidate generation is always a bucket equi-join (LSH band key,
  *    sketch anchor, label block) — never an all-pairs cross join, so
  *    work scales with Σ bucket² not N²;
  *  - exact verification (Jaccard / cosine) runs only on the candidate
  *    pairs, the classic filter-verify shape.
  *
  * Every query hash-matches a DuckDB oracle implementing the identical
  * algorithm (same md5-derived hashes, same integer quantisation), so
  * approximation choices (bands, thresholds) cannot drift between the
  * engine and the check.
  */
object Dedup {

  /** q14: exact content dedup — group by content hash, keep the lowest
    * doc_id as canonical. One shuffle on the 128-bit hash; at 100 TB
    * this is the cheapest possible full-corpus dedup (map-side partial
    * aggregation collapses copies early).
    */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_doc_id"),
        count(lit(1)).as("n_copies"))

  /** doc_id → sorted 60-bit hashes of the distinct word-3-gram shingle
    * set (row-local). One md5 per shingle; everything downstream
    * (minhash family, Jaccard verify) works on the longs.
    */
  private def docShingleHashes(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      // spread the hash-heavy row-local work: the testdata table is one
      // small parquet file (one input split); a 100 TB corpus arrives
      // pre-split across thousands of files and skips this step
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), words(col("text")).as("ws"))
      .filter(size(col("ws")) >= 3)
      // distinct AFTER hashing (cheap long dedup instead of string
      // dedup; identical set — the oracle dedups the hashes too)
      .select(col("doc_id"), array_sort(array_distinct(
        graft.functions.HashOps.shingle_hash60(col("ws"), 3))).as("hsh"))

  private val NumHashes = 8
  private val NumBands = 4 // 2 hashes per band
  /** Universal-hash MinHash family h_k(x) = (a_k·x + b_k) mod P over the
    * base 60-bit shingle hash — the standard permutation family; one
    * md5 per shingle instead of one per (shingle, k). P = 2^31 − 1 keeps
    * a_k·(x mod P) within 62 bits: exact in BIGINT on both engines.
    */
  private val P = 2147483647L
  private val hashAB: Seq[(Long, Long)] = Seq(
    (1103515245L % P, 12345L), (69069L, 362437L), (1664525L, 1013904223L),
    (22695477L, 1L), (134775813L, 1L), (214013L, 2531011L),
    (48271L, 0L), (16807L, 0L))

  /** q15: MinHash + LSH near-dup pairs (shingle Jaccard >= 0.5).
    *
    * Pipeline: 8 minhashes per doc computed row-locally (`array_min`
    * over the universal-hash family of each shingle hash — no explode,
    * no shuffle), banded 4×2 into band keys, self-joined on band key
    * for candidates, then exact Jaccard verification on the survivors
    * with the codegen'd merge-intersect kernel. The band self-join
    * shuffles only (doc_id, bkey) pairs — at 100 TB the shuffle is 4
    * small rows per doc, and bucket sizes stay bounded because a
    * 2-hash band collision for non-near-dups is ~j² rare.
    */
  /** Adds the 8-slot MinHash signature array `mhs` to a shingle-hash
    * frame — the ONE Scala site for the universal-hash family, shared
    * by the banding below and by q177's slot-agreement estimator,
    * exactly as the oracle side shares `sigBandsSql`'s `sig` CTE.
    */
  private def sigOf(d: DataFrame): DataFrame =
    d.withColumn("mhs", array(hashAB.map { case (a, b) =>
      array_min(transform(col("hsh"), h => (lit(a) * (h % P) + b) % P))
    }: _*))

  /** (doc_id, band key) rows from a signature frame ([[sigOf]] output)
    * — 4×2 banding, shared by q15 (corpus self-join), q58
    * (increment×corpus) and q177 (calibration pairs).
    */
  private def bandsFromSig(sig: DataFrame): DataFrame =
    sig.select(col("doc_id"),
      explode(transform(sequence(lit(0), lit(NumBands - 1)), b =>
        concat_ws(":", b, element_at(col("mhs"), b * 2 + 1),
          element_at(col("mhs"), b * 2 + 2)))).as("bkey"))

  /** [[sigOf]] + [[bandsFromSig]] for consumers that never touch the
    * signatures themselves.
    */
  private def bandsOf(sigs: DataFrame): DataFrame =
    bandsFromSig(sigOf(sigs))

  def dedupMinhash(spark: SparkSession, dir: String): DataFrame = {
    // the signature table feeds 4 plan branches (band self-join + both
    // verify probes); localCheckpoint materialises it once instead of
    // re-hashing the corpus per branch — the local analog of persisting
    // the signature table, which is what a 100 TB deployment does
    // explicitly (storage is executor-local, GC-cleaned with the plan)
    val d = docShingleHashes(spark, dir).cp()
    val bands = bandsOf(d)
    val cand = bands.as("a").join(bands.as("b"),
        col("a.bkey") === col("b.bkey") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(d.select(col("doc_id").as("doc_a"), col("hsh").as("hsa")), "doc_a")
      .join(d.select(col("doc_id").as("doc_b"), col("hsh").as("hsb")), "doc_b")
      .withColumn("inter",
        graft.functions.ArrayOps.sorted_intersect_count(col("hsa"), col("hsb")))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("hsa")) + size(col("hsb")) - col("inter")))
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** q177: MINHASH CALIBRATION AUDIT — is the sketch telling the
    * truth? For every LSH candidate pair, the signature-agreement
    * Jaccard estimate (fraction of the [[NumHashes]] slots that agree,
    * in milli — an unbiased estimator of true Jaccard) is compared
    * against the EXACT shingle-set Jaccard, and the audit reports the
    * calibration curve: per estimate bucket (multiples of
    * 1000/[[NumHashes]]; band candidates share ≥ one 2-hash band, so
    * the attainable floor is 250), the pair count and the
    * exact-Jaccard sum/min/max.
    * This is the q45-for-MinHash: the number that justifies q15's
    * banding parameters on a NEW corpus before trusting them, and the
    * evidence for retuning [[NumHashes]]/[[NumBands]] when the
    * estimator's spread per bucket is too wide.
    *
    * Scale: signatures are row-local ([[sigOf]]); candidates are the
    * SAME banded equi-join as q15 (never all-pairs — the audit costs
    * what the dedup itself costs); the exact verify is the q15
    * merge-intersect kernel per candidate; the curve is a 9-group
    * aggregation with map-side partials. All-integer outputs
    * (milli-Jaccard), hash-stable on any engine.
    */
  def minhashCalibration(spark: SparkSession, dir: String): DataFrame = {
    // the estimate scale is embedded as the integer 1000/NumHashes in
    // BOTH engines: a retune to a non-divisor (the scaladoc invites
    // retuning) would silently deflate every bucket on both sides at
    // once — the one failure the cross-engine hash gate cannot see
    require(1000 % NumHashes == 0,
      s"q177 milli estimate needs NumHashes | 1000, got $NumHashes")
    // one signature pass feeds the band join AND both per-pair probes
    val sig = sigOf(docShingleHashes(spark, dir)).cp()
    val bands = bandsFromSig(sig)
    val cand = bands.as("a").join(bands.as("b"),
        col("a.bkey") === col("b.bkey") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(sig.select(col("doc_id").as("doc_a"), col("hsh").as("hsa"),
        col("mhs").as("ma")), "doc_a")
      .join(sig.select(col("doc_id").as("doc_b"), col("hsh").as("hsb"),
        col("mhs").as("mb")), "doc_b")
      .withColumn("agree",
        size(filter(zip_with(col("ma"), col("mb"), (x, y) => x === y),
          b => b)))
      // 1000/NumHashes = 125 exactly, so the estimate is integer milli
      .withColumn("est_milli",
        (col("agree") * (1000 / NumHashes)).cast("long"))
      .withColumn("inter",
        graft.functions.ArrayOps.sorted_intersect_count(col("hsa"), col("hsb")))
      .withColumn("exact_milli",
        expr("1000 * inter DIV (size(hsa) + size(hsb) - inter)"))
      .groupBy(col("est_milli"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("exact_milli")).as("sum_exact_milli"),
        min(col("exact_milli")).as("min_exact_milli"),
        max(col("exact_milli")).as("max_exact_milli"))
  }

  /** q54: duplicate CLUSTERS — connected components over the q15
    * MinHash near-dup pairs, the step a real dedup pipeline runs after
    * pair generation (pairs alone under-delete: near-dup similarity is
    * transitive in practice, so {a~b, b~c} must collapse to one keeper
    * even when (a,c) never collided in a band).
    *
    * Algorithm: min-label propagation on the PAIR GRAPH only — nodes
    * are the docs appearing in at least one pair (a tiny fraction of
    * the corpus at any scale), labels start as doc_id, and each round
    * every node takes the min of its own and its neighbors' labels.
    * [[ClusterRounds]] unrolled rounds converge for components of
    * diameter ≤ that bound (planted near-dup clusters are shallow —
    * sizes 2-3 at sf0.01; DedupSpec asserts fixpoint against a
    * union-find oracle). A production deployment loops the same two
    * operators to fixpoint with a driver-side convergence check; the
    * unroll keeps the query a single lazy plan per the driver contract.
    *
    * Scale shape: the expensive part (minhash pair-gen) is shared via
    * the checkpointed signature table; each round is one equi-join +
    * one min-aggregation over label rows, never touching full text.
    */
  val ClusterRounds = 6

  /** The undirected near-dup pair graph, checkpointed: 2 edge
    * directions × (rounds of joins + the node seed) all reuse it;
    * without it every round would re-run the whole minhash pipeline.
    */
  private def pairGraph(spark: SparkSession, dir: String): DataFrame = {
    val pairs = dedupMinhash(spark, dir)
      .select(col("doc_a"), col("doc_b")).cp()
    pairs.union(pairs.select(col("doc_b"), col("doc_a"))).toDF("src", "dst")
  }

  /** One min-label propagation round. Each round references the
    * previous labels twice (self ∪ messages) — without a per-round
    * checkpoint the lazy plan doubles every iteration (2^rounds
    * branches, hundreds of exchanges); the lazy checkpoint
    * materialises each round exactly once, the driver-loop structure a
    * production fixpoint iteration has anyway.
    */
  private def propagateBody(edges: DataFrame, labels: DataFrame): DataFrame = {
    val msgs = edges.join(labels, edges("src") === labels("node"))
      .select(edges("dst").as("node"), labels("label"))
    labels.union(msgs)
      .groupBy("node").agg(min("label").as("label"))
  }

  private def propagate(edges: DataFrame, labels: DataFrame): DataFrame =
    propagateBody(edges, labels).cpIter()

  /** Audit hook (see [[SimSearch.fixturePlans]]): the label-propagation
    * family's plans split at the iteration barrier — the pre-loop
    * pair/edge pipelines and ONE propagation round — because the
    * unrolled fixpoint cannot print un-truncated (the tree doubles
    * every round; see [[Checkpoints.CpOps.cpIter]]). Total loop cost =
    * the round row × rounds, over edge-sized inputs.
    */
  private[graft] def auditPlans(spark: SparkSession,
      dir: String): Seq[(String, DataFrame)] = {
    val pg = pairGraph(spark, dir)
    val seed = pg.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    Seq(
      "q54/q91/q165:pair_graph" -> pg,
      "q160:name_edges" -> goldenEdges(goldenNames(spark, dir)),
      // round cost over materialized (truncated) inputs — the per-round
      // marginal work, not a re-print of the pair pipeline
      "fixpoint:propagate_round" -> propagateBody(pg.cpIter(), seed.cpIter()))
  }

  private def clusterOutput(labels: DataFrame): DataFrame = {
    val sizes = labels.groupBy(col("label"))
      .agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "label")
      .select(col("node").as("doc_id"), col("label").as("cluster_id"),
        col("cluster_size"),
        (col("node") === col("label")).as("is_canonical"))
  }

  def dupClusters(spark: SparkSession, dir: String): DataFrame = {
    val edges = pairGraph(spark, dir)
    val nodes = edges.select(col("src").as("node")).distinct()
    var labels = nodes.withColumn("label", col("node"))
    for (_ <- 1 to ClusterRounds) labels = propagate(edges, labels)
    // IN-PLAN convergence guard: run one more round and fail LOUDLY if
    // any label would still shrink — a component deeper than the
    // unroll must never silently ship wrong cluster ids. assert_true
    // feeds the output column, so it cannot be pruned away; when
    // converged it is null and coalesce passes the label through.
    val next = propagate(edges, labels)
    val guarded = labels
      .join(next.withColumnRenamed("label", "label_next"), "node")
      .select(col("node"),
        coalesce(
          assert_true(col("label") === col("label_next"),
            lit(s"q54: min-label propagation not converged after " +
              s"$ClusterRounds rounds — component diameter exceeds the " +
              "unroll; raise ClusterRounds or use dupClustersConverged"))
            .cast("long"),
          col("label")).as("label"))
    clusterOutput(guarded)
  }

  /** PRODUCTION fixpoint variant of [[dupClusters]]: propagate until
    * the label table stops changing, detected by a driver-side check
    * on a TINY aggregate — `sum(label)` is strictly decreasing until
    * fixpoint (every node's label is monotone non-increasing), so one
    * unchanged sum proves convergence. Fails loudly after `maxRounds`.
    * DedupSpec proves loop-until-converged ≡ the unrolled query.
    */
  def dupClustersConverged(spark: SparkSession, dir: String,
      maxRounds: Int = 64): DataFrame = {
    val edges = pairGraph(spark, dir)
    val nodes = edges.select(col("src").as("node")).distinct()
    var labels = nodes.withColumn("label", col("node"))
    def checksum(l: DataFrame): (Long, Long) = {
      // coalesce: an EMPTY label table (a corpus with zero near-dup
      // pairs) sums to null, which must read as the stable empty
      // checksum — not NPE — so the loop converges to an empty result
      // exactly like the unrolled q54 does on the same input
      val r = l.agg(coalesce(sum(col("label")), lit(0L)), count(lit(1)))
        .collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    var prev = (-1L, -1L)
    var rounds = 0
    var done = false
    while (!done && rounds < maxRounds) {
      labels = propagate(edges, labels)
      val cur = checksum(labels)
      done = cur == prev
      prev = cur
      rounds += 1
    }
    if (!done)
      throw new IllegalStateException(
        s"q54: label propagation did not converge within $maxRounds rounds")
    clusterOutput(labels)
  }

  /** q58: INCREMENTAL dedup — screen a new batch against the existing
    * corpus without re-deduplicating the corpus, the daily-ingest shape
    * of a production pipeline. The "increment" is the deterministic
    * doc_id ≡ 7 (mod 10) slice; the corpus is the rest.
    *
    * Verdict per new doc, first match wins:
    *   dup_exact — content hash already in the corpus (anti-joinable);
    *   dup_near  — shares a MinHash band with a corpus doc AND verifies
    *               at shingle-Jaccard ≥ 0.5 (q15's band + verify kernel,
    *               but increment×corpus instead of corpus×corpus);
    *   new       — accepted.
    *
    * Scale shape: the corpus side's hash/signature tables are exactly
    * what q14/q15 already compute — a deployment stores them and joins
    * the (small) increment against them; nothing here rescans corpus
    * text per batch except the signature build this self-contained
    * query includes. Joins are equi-joins on content hash / band key;
    * the increment side is the broadcast/probe side at any corpus size.
    */
  def dedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val isNew = col("doc_id") % 10 === 7
    val hashed = Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("text")).as("h"))
    val sigs = docShingleHashes(spark, dir).cp()
    val bands = bandsOf(sigs).cp()
    val exactDup = hashed.filter(isNew).join(
      hashed.filter(!isNew).select(col("h")).distinct(), "h")
      .select(col("doc_id")).distinct()
    val nearCand = bands.filter(isNew).join(
        bands.filter(!isNew).select(col("doc_id").as("corpus_id"), col("bkey")),
        "bkey")
      .select(col("doc_id"), col("corpus_id")).distinct()
    val nearDup = nearCand
      .join(sigs.select(col("doc_id"), col("hsh").as("hsn")), "doc_id")
      .join(sigs.select(col("doc_id").as("corpus_id"), col("hsh").as("hsc")),
        "corpus_id")
      .withColumn("inter",
        graft.functions.ArrayOps.sorted_intersect_count(col("hsn"), col("hsc")))
      .filter(col("inter").cast("double") /
        (size(col("hsn")) + size(col("hsc")) - col("inter")) >= 0.5)
      .select(col("doc_id")).distinct()
    Tables.documents(spark, dir).filter(isNew).select(col("doc_id"))
      .join(exactDup.withColumn("is_exact", lit(true)), Seq("doc_id"), "left")
      .join(nearDup.withColumn("is_near", lit(true)), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("is_exact"), "dup_exact")
          .when(col("is_near"), "dup_near")
          .otherwise("new").as("verdict"))
  }

  /** q16: 16-bit SimHash per document over the word multiset. Hashes
    * are row-local; the bit votes are one grouped aggregation with
    * map-side partials (16 narrow int sums — a few bytes per doc of
    * shuffle at any scale).
    */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    val tokens = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(words(col("text"))).as("w"))
      .select(col("doc_id"), hash16(col("w")).as("h"))
    val voteCols = (0 until 16).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1)) === 1, 1)
        .otherwise(-1)).as(s"s$b")
    }
    val votes = tokens.groupBy(col("doc_id"))
      .agg(voteCols.head, voteCols.tail: _*)
    votes.select(col("doc_id"),
      (0 until 16).map(b => when(col(s"s$b") > 0, 1 << b).otherwise(0))
        .reduce(_ + _).as("simhash16"))
  }

  /** q17: n-gram Jaccard near-dup via bottom-3 sketch anchoring:
    * candidates are docs sharing the three smallest char-5-gram hashes
    * (bucket-size calibration at sf0.1: bottom-1 → 1.3M candidate
    * pairs, bottom-2 → 183k, bottom-3 → 26k, while 0.9+-similar docs
    * still collide with p≈j³), verified with exact Jaccard over the
    * HASHED gram sets via the codegen'd merge-intersect kernel.
    */
  def dedupNgram(spark: SparkSession, dir: String): DataFrame = {
    val grams = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism) // one-file testdata, see docShingleHashes
      .filter(length(col("text")) >= 11) // >= 3 grams (not yet distinct)
      .select(col("doc_id"), array_sort(array_distinct(
        graft.functions.HashOps.gram_hash60(col("text"), 5))).as("hs"))
      // the bottom-3 anchor needs 3 DISTINCT grams — a low-entropy doc
      // (e.g. "ababab…") passes the length filter with fewer, and
      // element_at(hs, 3) would throw under ANSI mode
      .filter(size(col("hs")) >= 3)
      .withColumn("anchor",
        concat_ws(":", element_at(col("hs"), 1), element_at(col("hs"), 2),
          element_at(col("hs"), 3)))
      .select(col("doc_id"), col("hs"), col("anchor"))
      .cp() // both sides of the self-join share one gram pass
    val cand = grams.as("a").join(grams.as("b"),
        col("a.anchor") === col("b.anchor") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.hs").as("hsa"), col("b.hs").as("hsb"))
    cand
      .withColumn("inter",
        graft.functions.ArrayOps.sorted_intersect_count(col("hsa"), col("hsb")))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("hsa")) + size(col("hsb")) - col("inter")))
      .filter(col("jaccard") >= 0.6)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** q18: embedding-cosine near-dup, blocked by the `label` column
    * (block-nested pairs within a category — the classic blocking-key
    * dedup join; the unblocked N² cross join is exactly what this
    * avoids at 100 TB). Cosine is exact-integer milli-quantised:
    * dot/norms in BIGINT, one final double division+sqrt.
    */
  def dedupEmbed(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), qvec(col("embedding")).as("qv"))
      .withColumn("n2", norm2(col("qv")))
    e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        col("a.label").as("label"),
        cosineq(dotq(col("a.qv"), col("b.qv")), col("a.n2"), col("b.n2"))
          .as("cosine"))
      .filter(col("cosine") >= 0.35)
  }

  private val ChunkWords = 10
  /** q66: SUB-document exact dedup — ExactSubstr-style duplicated-span
    * removal (Lee et al., "Deduplicating Training Data Makes Language
    * Models Better") at word-window granularity: documents are cut
    * into consecutive [[ChunkWords]]-word chunks, every chunk that
    * already occurred anywhere in the corpus (by global first
    * occurrence in (doc_id, chunk_idx) order) is dropped, and each
    * document is reassembled from its surviving chunks. Doc-level
    * dedup (q14/q15) misses boilerplate shared BETWEEN distinct
    * documents; this is the operator that removes it.
    *
    * Scale shape: chunking is row-local; first-occurrence is ONE
    * shuffle on the 60-bit chunk hash with a map-side-partial `min`
    * (the q14 discipline, at chunk granularity); the keep-filter is an
    * equi-join back on the same hash (no second shuffle of the big
    * side under AQE-preserved partitioning); reassembly groups by
    * doc_id — partition size bounded by document length. A true
    * suffix-array ExactSubstr needs a global sort of all suffixes;
    * fixed windows trade boundary-straddling duplicates for exactly
    * this shuffle-bounded plan, the standard engineering compromise.
    *
    * The first-occurrence key is `min(struct(doc_id, chunk_idx))` —
    * lexicographic struct ordering, so no packed-scalar range to
    * overflow however long a pathological document gets; the oracle
    * mirrors it with a `row_number() OVER (PARTITION BY h ORDER BY
    * doc_id, ci)` window.
    */
  def dedupChunks(spark: SparkSession, dir: String): DataFrame = {
    val inst = Tables.documents(spark, dir)
      .select(col("doc_id"), words(col("text")).as("ws"))
      .filter(size(col("ws")) > 0)
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0L, CAST(size(ws)-1 AS BIGINT) DIV $ChunkWords),
           |  i -> array_join(slice(ws, CAST(i*$ChunkWords+1 AS INT), $ChunkWords), ' '))"""
          .stripMargin)))
      .select(col("doc_id"), col("pos").cast("long").as("ci"), col("col").as("chunk"))
      .withColumn("h", hash60(col("chunk")))
    val first = inst.groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("ci"))).as("keeper"))
    inst.join(first, "h")
      .withColumn("keep", struct(col("doc_id"), col("ci")) === col("keeper"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(!col("keep"), 1L).otherwise(0L)).as("n_removed"),
        // collect_list drops the nulls `when` leaves on removed chunks;
        // sort by (ci, chunk) ≡ ci (ci is unique per doc)
        nullif(array_join(transform(
          array_sort(collect_list(when(col("keep"),
            struct(col("ci"), col("chunk"))))),
          s => s.getField("chunk")), " "), lit("")).as("cleaned_text"))
  }

  private val CdcMod = 8L // expected CDC chunk length in words

  /** q95: CONTENT-DEFINED CHUNKING dedup — q66's sub-document dedup
    * with boundaries chosen by CONTENT, not position: a chunk ends at
    * word `i` where the 3-gram hash ending there ≡ 0 (mod [[CdcMod]])
    * (and always at the document end). Fixed-stride chunking (q66)
    * breaks on insertion — one added word shifts every later chunk and
    * nothing dedupes; content-defined boundaries re-synchronize within
    * one expected chunk length, so shared passages dedupe regardless
    * of where they sit (the rolling-hash trick rsync/CDC storage and
    * corpus near-dedup pipelines use). Expected chunk ≈ [[CdcMod]]
    * words; first occurrence by (doc_id, chunk index) wins, same
    * contract as q66.
    *
    * Scale shape: chunking is ROW-LOCAL — one codegen kernel pass per
    * document computes every 3-gram hash, every boundary, and every
    * chunk-identity hash ([[graft.functions.HashOps.cdc_chunks60]]);
    * the dedup is q66's one (chunk-hash) shuffle + one per-doc
    * aggregate, and the shuffle carries only span offsets + hashes,
    * never chunk text — nothing new moves.
    */
  def dedupCdcChunks(spark: SparkSession, dir: String): DataFrame =
    cdcDedupOf(Tables.documents(spark, dir))

  /** The q95 kernel over any (doc_id, text) frame — split out so the
    * spec can prove the re-synchronization property on constructed
    * documents (a word inserted up front must not stop later chunks
    * from deduping, which is exactly where fixed-stride q66 fails).
    *
    * Chunking is [[graft.functions.HashOps.cdc_chunks60]] — ONE native
    * codegen pass computing boundaries AND identity hashes; the digest
    * eats word bytes + separators straight off the word array,
    * bit-identical to `hash60(array_join(slice(ws, …), ' '))` (which is
    * what the DuckDB oracle computes) with ZERO chunk strings built.
    * Only (doc_id, ci, span-offsets, h) flow through the shuffle; chunk
    * text is materialized ONCE, for KEPT spans only, by slicing the
    * original word array after the keep-decision join. First occurrence
    * is `min(struct(doc_id, ci))` — no packed-scalar key, so a
    * pathological >10^6-chunk document cannot corrupt keeper selection.
    * `explode_outer` (not `explode`) keeps `InferFiltersFromGenerate`
    * from re-deriving the kernel into a Filter that would evaluate it
    * twice more per row; no row is ever actually null-extended (every
    * non-empty doc has >= 1 chunk).
    */
  private[graft] def cdcDedupOf(docs: DataFrame): DataFrame = {
    val base = docs
      .select(col("doc_id"), words(col("text")).as("ws"))
      .filter(size(col("ws")) > 0)
    val spans = base
      .select(col("doc_id"), explode_outer(
        graft.functions.HashOps.cdc_chunks60(col("ws"), CdcMod.toInt)).as("c"))
      .select(col("doc_id"), col("c.ci"), col("c.s"), col("c.len"), col("c.h"))
    val first = spans.groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("ci"))).as("keeper"))
    val decided = spans.join(first, "h")
      .withColumn("keep", struct(col("doc_id"), col("ci")) === col("keeper"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(!col("keep"), 1L).otherwise(0L)).as("n_removed"),
        // collect_list drops the nulls `when` leaves on removed spans;
        // sort by (ci, s, len) ≡ ci (ci is unique per doc)
        array_sort(collect_list(when(col("keep"),
          struct(col("ci"), col("s"), col("len"))))).as("kept"))
    decided.join(base, "doc_id")
      .select(col("doc_id"), col("n_chunks"), col("n_removed"),
        nullif(array_join(flatten(transform(col("kept"),
          sp => slice(col("ws"), sp.getField("s"), sp.getField("len")))),
          " "), lit("")).as("cleaned_text"))
  }

  /** q96: SPLIT LEAKAGE AUDIT — assign every document a deterministic
    * content-hash train/val/test split (800/100/100 of 1000 buckets on
    * `hash60(text)` — exact duplicates land in the SAME split by
    * construction, so exact-dup contamination is impossible), then
    * count the q15 verified near-dup pairs by (split_a, split_b): any
    * pair crossing splits is evaluation leakage a dedup-unaware split
    * would ship. The audit every train/test separation needs before a
    * benchmark number can be trusted, complementing q51 (external
    * probe-set contamination) with INTERNAL split hygiene.
    *
    * Scale shape: split assignment is a row-local hash; the audit
    * joins the (near-dup-sized, not corpus-sized) pair set to the
    * assignment twice on doc id — equi-joins AQE sizes freely — and
    * aggregates a ≤9-row grid. Cost ∝ near-dup pairs, the same
    * candidate set q15 already bounded by banding.
    */
  def splitLeakage(spark: SparkSession, dir: String): DataFrame = {
    val split = Tables.documents(spark, dir)
      // q121's shared bucket function AND fractions
      // (Curation.splitBucket / SplitTrainMilli / SplitValMilli): the
      // audit measures the split the pipeline ships, from one site
      .select(col("doc_id"), Curation.splitBucket(col("text")).as("m"))
      .select(col("doc_id"),
        when(col("m") < Curation.SplitTrainMilli, "train")
          .when(col("m") < Curation.SplitValMilli, "val")
          .otherwise("test").as("split"))
    val pairs = dedupMinhash(spark, dir).select(col("doc_a"), col("doc_b"))
    pairs
      .join(split.select(col("doc_id").as("doc_a"), col("split").as("split_a")),
        "doc_a")
      .join(split.select(col("doc_id").as("doc_b"), col("split").as("split_b")),
        "doc_b")
      .groupBy(col("split_a"), col("split_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("leaked", col("split_a") =!= col("split_b"))
  }

  /** q191: SOFT-DEDUP SAMPLING WEIGHTS — the SemDeDup/D4 move: instead
    * of DROPPING near-duplicates (q54 keeps one canonical doc per
    * cluster), keep every copy but weight each by 1/cluster_size, so
    * each distinct CONTENT contributes equal expected training mass
    * regardless of how many times the crawl caught it. Hard dedup
    * loses the (often useful) distributional signal of which
    * boilerplate variants exist; soft dedup keeps it while removing
    * the over-counting. Weights are integer milli (1000 DIV size —
    * the q122 sampler consumes them directly as rate buckets);
    * singletons — docs in no q15 candidate pair — weigh exactly 1000.
    * Cluster sizes come from the SAME q54 label propagation, so the
    * weights and the hard-dedup verdicts can never disagree on what a
    * cluster is.
    *
    * Scale: q54's checkpointed propagation (pair-graph sized), then
    * ONE left equi-join of the corpus against the label table — the
    * label side is bounded by the number of DUPLICATED docs, which can
    * be corpus-scale, so the plan correctly stays a shuffle join and
    * broadcasts only when statistics prove the label table small.
    */
  def softDedupWeights(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(col("doc_id"), col("source"))
      .join(dupClusters(spark, dir)
        .select(col("doc_id"), col("cluster_size")), Seq("doc_id"), "left")
      .withColumn("cluster_size", coalesce(col("cluster_size"), lit(1L)))
      .withColumn("weight_milli", expr("1000 DIV cluster_size"))

  /** q190: CROSS-SOURCE DUPLICATION MATRIX — q15's near-dup pair set
    * folded onto document provenance: per unordered source pair, how
    * many near-duplicate pairs connect them. The off-diagonal is the
    * SYNDICATION map (which crawl sources mirror which), the number
    * that picks q165's keeper-priority source order and tells a
    * mixture planner that two "distinct" sources are really one
    * corpus counted twice; the diagonal is each source's internal
    * duplication load. Same shape as q96 with provenance in place of
    * split — one shared pair kernel ([[dedupMinhash]]), so this audit
    * and the dedup it audits can never disagree on candidates.
    *
    * Scale: the pair set is band-join bounded (never all-pairs); the
    * two provenance joins are broadcast-size (doc_id → source), and
    * the matrix is at most sources² rows.
    */
  def crossSourceDups(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"))
    dedupMinhash(spark, dir).select(col("doc_a"), col("doc_b"))
      .join(src.select(col("doc_id").as("doc_a"),
        col("source").as("source_a")), "doc_a")
      .join(src.select(col("doc_id").as("doc_b"),
        col("source").as("source_b")), "doc_b")
      .select(least(col("source_a"), col("source_b")).as("source_lo"),
        greatest(col("source_a"), col("source_b")).as("source_hi"))
      .groupBy(col("source_lo"), col("source_hi"))
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("cross_source",
        (col("source_lo") =!= col("source_hi")).cast("int"))
  }

  private val LeakN = 8 // decontamination gram width — the 8–13-token
  // overlap convention published eval decontamination uses, at the
  // low end because the corpus' documents are ~10²-token scale

  /** q178: CROSS-SPLIT N-GRAM LEAKAGE — decontamination at n-gram
    * granularity, the check q96 (whole-document near-dup leakage)
    * cannot make: for every TEST-split document, what fraction of its
    * distinct word-[[LeakN]]-grams also appears anywhere in the TRAIN
    * split. This is the published-eval hygiene number (the "13-gram
    * overlap" style audit): a test doc can be far from every train doc
    * by whole-document similarity and still have most of its n-grams
    * memorizable verbatim. Splits come from [[Curation.splitBucket]] —
    * the q121 assignment function itself, with its
    * [[Curation.SplitTrainMilli]]/[[Curation.SplitValMilli]] fractions
    * — so this audit and the assignment it audits can never use
    * different splits.
    *
    * Scale: gram hashing is row-local ([[graft.functions.HashOps]]
    * one-pass kernel); the train gram set and the probe are ONE
    * gram-hash-keyed equi-join (distinct + left join with map-side
    * partials) — exactly the shape production decontamination runs,
    * where the train gram table is the big side and shards by hash.
    * The per-doc fraction is exact integer milli.
    */
  def ngramLeakage(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), Curation.splitBucket(col("text")).as("m"),
        words(col("text")).as("ws"))
      .filter(size(col("ws")) >= LeakN)
      .select(col("doc_id"), col("m"), array_distinct(
        graft.functions.HashOps.shingle_hash60(col("ws"), LeakN)).as("gs"))
      .cp() // feeds the train gram set AND the test probes
    val train = d.filter(col("m") < Curation.SplitTrainMilli)
      .select(explode(col("gs")).as("g")).distinct()
      .withColumn("seen", lit(1L))
    val test = d.filter(col("m") >= Curation.SplitValMilli)
      .select(col("doc_id"), explode(col("gs")).as("g"))
    test.join(train, Seq("g"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("seen"), lit(0L))).as("n_seen"))
      .withColumn("leak_milli", expr("1000 * n_seen DIV n_grams"))
  }

  private val GramQuarantineMilli = 500L // q194 gram-leak threshold

  /** q194: EVAL-SET DECONTAMINATION VERDICTS — the REPAIR step the
    * q96/q178 audits feed: for every TEST-split document, decide
    * whether its eval score can be trusted, quarantining docs that
    * leak through EITHER channel — a q15 near-dup partner in the
    * train split (whole-document leakage) or ≥
    * [[GramQuarantineMilli]]‰ of its [[LeakN]]-grams present anywhere
    * in train (verbatim-memorization leakage; docs too short to gram
    * carry 0). Quarantine means EXCLUDE FROM EVAL — the published
    * convention — never "move to train", which would re-leak the
    * partner in the other direction on the next split audit. All
    * three kernels are the shared shipping ones ([[Curation
    * .splitBucket]], [[dedupMinhash]], [[ngramLeakage]]), so the
    * verdicts govern exactly the split, candidates, and grams the
    * pipeline uses.
    *
    * Scale: the pair channel is the band-join pair set against a
    * train-id semi-join; the gram channel is q178's one gram shuffle;
    * the final assembly is two left joins on doc_id. Nothing rescans
    * the corpus beyond what the audits already scan.
    */
  def evalDecontam(spark: SparkSession, dir: String): DataFrame = {
    val split = Tables.documents(spark, dir)
      .select(col("doc_id"), Curation.splitBucket(col("text")).as("m"))
    val test = split.filter(col("m") >= Curation.SplitValMilli)
      .select(col("doc_id"))
    val train = split.filter(col("m") < Curation.SplitTrainMilli)
      .select(col("doc_id").as("partner"))
    val pairs = dedupMinhash(spark, dir).select(col("doc_a"), col("doc_b"))
    val pairLeaked = pairs
      .select(col("doc_a").as("doc_id"), col("doc_b").as("partner"))
      .unionByName(pairs
        .select(col("doc_b").as("doc_id"), col("doc_a").as("partner")))
      .join(train, "partner").select(col("doc_id")).distinct()
      .withColumn("pair_leak", lit(1))
    val gram = ngramLeakage(spark, dir)
      .select(col("doc_id"), col("leak_milli"))
    test.join(pairLeaked, Seq("doc_id"), "left")
      .join(gram, Seq("doc_id"), "left")
      .withColumn("leak_milli", coalesce(col("leak_milli"), lit(0L)))
      .withColumn("pair_leak", coalesce(col("pair_leak"), lit(0)))
      .withColumn("gram_leak",
        (col("leak_milli") >= GramQuarantineMilli).cast("int"))
      .withColumn("reason",
        when(col("pair_leak") === 1 && col("gram_leak") === 1, "both")
          .when(col("pair_leak") === 1, "pair")
          .when(col("gram_leak") === 1, "gram")
          .otherwise("none"))
      .select(col("doc_id"), col("leak_milli"), col("reason"),
        when(col("reason") === "none", "keep").otherwise("quarantine")
          .as("verdict"))
  }

  private val FuzzyQ = 3 // q-gram width
  private val FuzzyMaxDist = 2 // edit-distance acceptance threshold

  /** q127: FUZZY ENTITY JOIN (q-gram blocking + edit-distance verify)
    * — near-identical part names (`'new rod'` ≈ `'red rod'`), the
    * entity-resolution sibling of document dedup: candidates are pairs
    * sharing ≥1 DISTINCT character 3-gram (a bucket equi-join over the
    * gram key — q15's banding discipline, never all-pairs), verified
    * with exact `levenshtein` only on candidates — the filter-verify
    * shape keeps the O(len²) kernel off all non-pairs.
    *
    * Recall contract, stated precisely: the positional-q-gram bound
    * (ed ≤ k destroys ≤ k·q grams) guarantees ≥ max(len)−q+1−k·q
    * MATCHING POSITIONS, so ≥1 shared gram STRING whenever
    * max(len) ≥ q·(k+1) = 9 here — gram blocking is provably lossless
    * whenever the LONGER name has ≥ 9 chars. Pairs where BOTH names
    * are shorter get a second, equally lossless candidate path: ed ≤ k
    * forces |len(a)−len(b)| ≤ k, so the short tail (len ≤ 8) is
    * length-band equi-joined (each short name fans out to its k=2
    * neighboring lengths — a vocabulary-sized, alphabet-bounded set).
    * Together the two generators make the ENGINE zero-false-negative
    * for every input, and the ORACLE is the order-independent
    * brute-force all-pairs join (the q137 discipline) — hash equality
    * IS the corpus-wide no-recall-loss proof, every round, so a
    * testdata regen with adversarial short names fails loudly instead
    * of silently losing pairs. The tighter multiset COUNT filter from
    * the ppjoin literature is deliberately NOT applied: over distinct
    * grams it is unsound (a repeated-trigram name like `aaaaaaaaaaaa`
    * has ONE distinct gram and would be falsely pruned);
    * `n_shared_grams` is reported as a signal, never used to prune.
    *
    * Scale: the entity catalog is vocabulary-sized (distinct names),
    * orders smaller than the corpus that references it; gram-bucket
    * skew (a stop-gram shared by everything) is the q72 salting story
    * if it appears, and the length-band buckets are bounded by the
    * count of ≤ 8-char names — an alphabet-bounded short tail.
    */
  def fuzzyJoin(spark: SparkSession, dir: String): DataFrame =
    fuzzyJoinOf(Tables.part(spark, dir).select(col("p_name").as("name")))

  /** The q127 kernel over an explicit `name` column — exposed for the
    * repeated-gram regression spec. Normalizes (distinct + length
    * floor) before handing off to [[fuzzyJoinNormalized]].
    */
  private[graft] def fuzzyJoinOf(names0: DataFrame): DataFrame =
    fuzzyJoinNormalized(names0.distinct()
      .filter(length(col("name")) >= FuzzyQ))

  /** The kernel proper, over names the CALLER guarantees distinct and
    * ≥ [[FuzzyQ]] chars — q160 feeds its already-normalized,
    * checkpointed name universe here directly, so the vocabulary isn't
    * re-distinct'd and re-checkpointed a second time per run.
    */
  private def fuzzyJoinNormalized(names0: DataFrame): DataFrame = {
    val withGrams = names0
      .select(col("name"), array_distinct(
        transform(sequence(lit(1), length(col("name")) - (FuzzyQ - 1)), i =>
          col("name").substr(i, lit(FuzzyQ)))).as("gs"))
      .cp() // feeds both generators + verify
    val grams = withGrams.select(col("name"), explode(col("gs")).as("g"))
    val gramCand = grams.as("a")
      .join(grams.as("b"),
        col("a.g") === col("b.g") && col("a.name") < col("b.name"))
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
    // lossless short-tail path: gram blocking only covers pairs whose
    // LONGER name has >= q*(k+1) chars; both-short pairs come from a
    // length-band equi-join instead (ed <= k forces |len diff| <= k)
    val shortMax = FuzzyQ * (FuzzyMaxDist + 1) - 1
    val short = withGrams.select(col("name"))
      .filter(length(col("name")) <= shortMax)
    val bandCand = short
      .select(col("name"), explode(sequence(
        length(col("name")) - FuzzyMaxDist,
        length(col("name")) + FuzzyMaxDist)).as("lb")).as("a")
      .join(short.select(col("name"), length(col("name")).as("lb")).as("b"),
        col("a.lb") === col("b.lb") && col("a.name") < col("b.name"))
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
    gramCand.union(bandCand).distinct()
      .join(withGrams.select(col("name").as("name_a"), col("gs").as("ga")),
        "name_a")
      .join(withGrams.select(col("name").as("name_b"), col("gs").as("gb")),
        "name_b")
      .withColumn("n_shared_grams",
        size(array_intersect(col("ga"), col("gb"))).cast("long"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= FuzzyMaxDist)
      .select(col("name_a"), col("name_b"), col("n_shared_grams"),
        col("dist"))
  }

  private val SketchLgK = 12 // HLL registers: rsd ≈ 1.04/√2^12 ≈ 1.6%
  private val SketchBoundMilli = 100L // accepted |est−exact| ≤ 10%
  // The q134/q138 oracles hard-code est_ok = 1 — a DETERMINISTIC gate
  // over a statistical estimate. That is only sound while the accepted
  // bound dwarfs the sketch's relative standard deviation: at ≥ 5×rsd
  // the pass probability is ≈ 1 − 6e-7 per pair (Gaussian tail), so a
  // failure means a broken sketch, not bad luck. Anyone tuning either
  // constant must keep (or consciously revisit) this margin — the
  // require makes the contract unskippable at class-load time.
  private val SketchRsdMilli: Long =
    math.ceil(1040.0 / math.sqrt((1L << SketchLgK).toDouble)).toLong
  require(SketchBoundMilli >= 5 * SketchRsdMilli,
    s"q134/q138 est_ok is pinned TRUE in the oracles; bound " +
      s"${SketchBoundMilli}m must stay >= 5x rsd ${SketchRsdMilli}m " +
      "or the deterministic hash gate becomes a coin flip")

  /** q134: MERGEABLE DISTINCT SKETCHES — per-source HLL sketches of
    * the shingle-hash sets, UNIONED pairwise to estimate cross-source
    * content overlap (`est(A∪B)` + exact counts → inclusion-exclusion)
    * with the q90 bound-check discipline: the engine compares its own
    * estimate to the exact union IN-PLAN and emits the verdict, so a
    * drifted sketch breaks the oracle hash. Mergeability is the whole
    * 100 TB story: per-source sketches build in one pass with map-side
    * partials (register-max merges, order-insensitive), persist KB-
    * sized, and any pair/rollup unions later WITHOUT rescanning the
    * corpus — the exact intersection here exists only to check the
    * contract at test scale and is the thing the sketch replaces at
    * 100 TB.
    */
  /** Per-source shingle hashes (duplicates retained — HLL inserts are
    * idempotent; set consumers add `.distinct()`). ONE pipeline shared
    * by q134 and q138 so their oracle contracts (copies of the same
    * DuckDB CTE) can never diverge on the shingle derivation.
    */
  private def sourceShingles(docs: DataFrame): DataFrame = docs
    .select(col("source"), words(col("text")).as("ws"))
    .filter(size(col("ws")) >= 3)
    .select(col("source"),
      explode(graft.functions.HashOps.shingle_hash60(col("ws"), 3)).as("h"))

  def sketchUnion(spark: SparkSession, dir: String): DataFrame = {
    val sh = sourceShingles(Tables.documents(spark, dir))
      .distinct() // the (source, shingle-hash) SET
      .cp() // feeds counts, sketches, intersections
    val counts = sh.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val sketches = sh.groupBy(col("source"))
      .agg(expr(s"hll_sketch_agg(h, $SketchLgK)").as("sk"))
      .join(counts, "source")
    val inter = sh.as("a").join(sh.as("b"),
        col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("exact_inter"))
    val pairs = sketches.as("x").join(broadcast(sketches.as("y")),
        col("x.source") < col("y.source"))
      .select(col("x.source").as("source_a"), col("y.source").as("source_b"),
        col("x.n").as("n_a"), col("y.n").as("n_b"),
        expr("hll_sketch_estimate(hll_union(x.sk, y.sk))").as("est_union"))
    pairs.join(inter, Seq("source_a", "source_b"), "left")
      .withColumn("exact_inter", coalesce(col("exact_inter"), lit(0L)))
      .withColumn("exact_union", col("n_a") + col("n_b") - col("exact_inter"))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        col("exact_inter"), col("exact_union"),
        (abs(col("est_union") - col("exact_union")) * 1000 <=
          lit(SketchBoundMilli) * col("exact_union")).cast("int").as("est_ok"))
  }

  private val PrefixT = 0.5 // q137 Jaccard threshold

  /** q137: EXACT SET-SIMILARITY JOIN via PREFIX FILTERING — every pair
    * with shingle-set Jaccard ≥ [[PrefixT]], with ZERO false negatives
    * (q15's LSH banding trades recall for pruning; this is the exact
    * counterpart). Theorem: J(A,B) ≥ t ⟹ |A∩B| ≥ ⌈t·max(|A|,|B|)⌉,
    * and two sets with overlap ≥ k must collide within their
    * (len−k+1)-prefixes under ANY shared global element order — so
    * emitting only each doc's first |S|−⌈t·|S|⌉+1 hashes under that
    * order as candidate keys loses nothing. Candidates are a bucket
    * equi-join on those prefix hashes (the q15 discipline), verified
    * with the exact sorted-intersection kernel. The ORACLE is the
    * brute-force all-pairs join — hash equality IS the
    * no-false-negative proof, corpus-wide, every round.
    *
    * The global order is ASCENDING DOCUMENT FREQUENCY (ties by hash) —
    * the canonical prefix-filter choice (Chaudhuri/Ganti/Kaushik's
    * SSJoin, Bayardo's All-Pairs): prefixes carry each doc's RAREST
    * shingles, so a Zipf-hot stop-shingle (df ≈ corpus size) sorts
    * LAST and lands in almost no prefix, where a value-ordered prefix
    * would bucket a constant fraction of the corpus on it and that
    * bucket's candidate list grows quadratically in its df. The df
    * rank costs one extra groupBy(h).count + equi-join before the
    * prefix slice — both shuffles on the exploded shingle key, never
    * all-pairs. The brute-force oracle is order-independent, so the
    * hash gate pins correctness across the ordering change.
    *
    * Scale: prefix length shrinks as t grows (at t=0.5, half of each
    * set), candidate buckets are per-(rare-)hash doc lists, and
    * [[DedupSpec]] asserts the candidate count on a crafted Zipf
    * corpus stays linear where hash-ordered prefixes go quadratic.
    */
  def prefixJoin(spark: SparkSession, dir: String): DataFrame =
    prefixJoinOf(docShingleHashes(spark, dir).cp())

  /** The q137 kernel over an explicit (doc_id, hsh) frame;
    * `rarestFirst = false` reproduces the naive value-ordered prefix —
    * test-only, for the skew spec's quadratic-vs-linear comparison.
    */
  private[graft] def prefixCandidates(d: DataFrame,
      rarestFirst: Boolean = true): DataFrame = {
    val pref =
      if (!rarestFirst)
        d.select(col("doc_id"),
          explode(slice(col("hsh"), lit(1),
            size(col("hsh")) - ceil(lit(PrefixT) * size(col("hsh"))).cast("int") + 1))
            .as("h"))
      else {
        val ex = d.select(col("doc_id"), explode(col("hsh")).as("h"))
        val freq = ex.groupBy(col("h")).agg(count(lit(1)).as("df"))
        ex.join(freq, "h")
          .groupBy(col("doc_id"))
          .agg(sort_array(collect_list(struct(col("df"), col("h"))))
            .as("ranked"))
          .select(col("doc_id"),
            explode(slice(col("ranked"), lit(1),
              size(col("ranked")) -
                ceil(lit(PrefixT) * size(col("ranked"))).cast("int") + 1))
              .as("r"))
          .select(col("doc_id"), col("r.h").as("h"))
      }
    pref.as("a").join(pref.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  private[graft] def prefixJoinOf(d: DataFrame): DataFrame = {
    val cand = prefixCandidates(d)
    cand
      .join(d.select(col("doc_id").as("doc_a"), col("hsh").as("hsa")), "doc_a")
      .join(d.select(col("doc_id").as("doc_b"), col("hsh").as("hsb")), "doc_b")
      .withColumn("inter",
        graft.functions.ArrayOps.sorted_intersect_count(col("hsa"), col("hsb")))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("hsa")) + size(col("hsb")) - col("inter")))
      .filter(col("jaccard") >= PrefixT)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** q138: SKETCH PERSISTENCE + INCREMENTAL MERGE — the production
    * lifecycle q134's one-shot build omits: per-source HLL sketches of
    * the BASE corpus (q58's increment convention: doc_id % 10 == 7 is
    * the new drop) are written to parquet as binary columns, READ BACK
    * (round-tripping the datasketches serialization through the
    * column format), and unioned with sketches of the increment alone
    * — the merged estimate covers the full corpus while the base is
    * never rescanned. Bound-checked in-plan against the exact distinct
    * count (q90/q134 discipline), so a serialization bug or a drifted
    * merge breaks the driver hash.
    *
    * Scale: this is THE reason sketches go in the metadata tier — a
    * nightly drop updates every per-source distinct count by scanning
    * only |increment|, with KB-sized reads of yesterday's state;
    * HLL inserts are idempotent, so dup hashes across strata merge
    * correctly by construction (no distinct needed anywhere).
    */
  def sketchIncrement(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val isNew = col("doc_id") % 10 === 7
    val skDir = Scratch.dir("graft_sketch")
    sourceShingles(docs.filter(!isNew))
      .groupBy(col("source"))
      .agg(expr(s"hll_sketch_agg(h, $SketchLgK)").as("sk"))
      .write.mode("overwrite").parquet(skDir)
    val baseSk = spark.read.parquet(skDir)
    val incSk = sourceShingles(docs.filter(isNew))
      .groupBy(col("source"))
      .agg(expr(s"hll_sketch_agg(h, $SketchLgK)").as("sk_inc"))
    val merged = baseSk.join(incSk, Seq("source"), "full_outer")
      .select(col("source"), expr("hll_sketch_estimate(CASE " +
        "WHEN sk IS NULL THEN sk_inc WHEN sk_inc IS NULL THEN sk " +
        "ELSE hll_union(sk, sk_inc) END)").as("est_n"))
    val exact = sourceShingles(docs).distinct()
      .groupBy(col("source")).agg(count(lit(1)).as("exact_n"))
    merged.join(exact, "source")
      .select(col("source"), col("exact_n"),
        (abs(col("est_n") - col("exact_n")) * 1000 <=
          lit(SketchBoundMilli) * col("exact_n")).cast("int").as("est_ok"))
  }

  /** q168: CROSS-MODAL DEDUP AGREEMENT — the corpus pairs documents
    * with embeddings by id (the caption↔vector convention of a
    * multimodal corpus), so q15's TEXT near-dup pairs and q18's
    * EMBEDDING near-dup pairs describe the same items through two
    * modalities. This audit full-outer-joins the two pair sets and
    * classifies each pair: `both` validates cheap text dedup against
    * the semantic signal, `text_only` is surface duplication the
    * embedding model separates (e.g. shared boilerplate), and
    * `embed_only` is the semantic-duplicate mass that text hashing
    * structurally cannot see — the number that decides whether a
    * deployment needs the expensive embedding pass at all. Both input
    * pair generators are the UNCHANGED q15/q18 operators (and the
    * oracle splices their standalone SQL verbatim), so this gate can
    * never drift from theirs.
    *
    * Scale: the pair sets are dedup outputs — orders smaller than the
    * corpus — and the audit is one full-outer merge join on the pair
    * key. Nothing here rescans documents or embeddings.
    */
  def modalAgreement(spark: SparkSession, dir: String): DataFrame = {
    val t = dedupMinhash(spark, dir)
      .select(col("doc_a"), col("doc_b"), lit(1).as("text_dup"))
    val g = dedupEmbed(spark, dir)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"),
        lit(1).as("embed_dup"))
    t.join(g, Seq("doc_a", "doc_b"), "full_outer")
      .select(col("doc_a"), col("doc_b"),
        coalesce(col("text_dup"), lit(0)).as("text_dup"),
        coalesce(col("embed_dup"), lit(0)).as("embed_dup"))
      .withColumn("agreement",
        when(col("text_dup") === 1 && col("embed_dup") === 1, "both")
          .when(col("text_dup") === 1, "text_only")
          .otherwise("embed_only"))
  }

  /** q165: CLUSTER KEEPER ELECTION — which duplicate survives: q54
    * elects the MIN-ID member (a storage convention); a curation
    * pipeline keeps the BEST one. Per duplicate cluster (q54's label
    * propagation, unchanged), members are scored by the q157 lexical
    * diversity proxy and the (score DESC, doc_id ASC) argmax wins —
    * computed as a `max(struct(score, −doc_id))` aggregation, never a
    * per-cluster sort. Output is the replacement plan: keeper, its
    * score, and how many duplicates it retires — the table a dedup
    * executor joins against to rewrite the corpus.
    *
    * Scale: scoring is row-local; the election is ONE cluster-keyed
    * aggregation with map-side partials (the q99 bounded-state shape
    * at k = 1). A quality-classifier score swaps in for the proxy
    * without touching the plan.
    */
  def clusterElect(spark: SparkSession, dir: String): DataFrame =
    scoredClusterMembers(spark, dir)
      .groupBy(col("cluster_id"), col("cluster_size"))
      .agg(max(struct(col("score_milli"), (-col("doc_id")).as("nid")))
        .as("k"))
      .select(col("cluster_id"), col("cluster_size"),
        (-col("k.nid")).as("keeper_doc_id"),
        col("k.score_milli").as("keeper_score_milli"),
        (col("cluster_size") - 1).as("n_dropped"))

  /** Cluster members joined with their lexical-diversity scores — the
    * shared input of the q165 election and the q176 preference pairs:
    * q54's labels, [[graft.functions.Portable.scoreMilli]] per member
    * (docs with zero words carry no score and drop out, same as the
    * oracles' `len(ws) > 0` gate).
    */
  private def scoredClusterMembers(spark: SparkSession,
      dir: String): DataFrame = {
    val labs = dupClusters(spark, dir)
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
    val scores = Tables.documents(spark, dir)
      .select(col("doc_id"), words(col("text")).as("ws"))
      .filter(size(col("ws")) > 0)
      .select(col("doc_id"), scoreMilli(col("ws")).as("score_milli"))
    labs.join(scores, "doc_id")
  }

  /** q176: PREFERENCE-PAIR CONSTRUCTION — alignment data from the
    * dedup byproduct: within each near-dup cluster the members are
    * variants of the same content at different quality, so (best,
    * worst) per cluster is a natural (chosen, rejected) preference
    * pair with a quality margin — the cheap seed corpus for a reward
    * model, mined from data the pipeline already computed. Chosen =
    * (score DESC, doc_id ASC) argmax, rejected = (score ASC, doc_id
    * DESC) argmin — deterministic and distinct whenever ≥ 2 members
    * carry scores (an all-tied cluster still yields min-id vs max-id).
    *
    * Scale: ONE cluster-keyed aggregation carrying two k=1 bounded
    * heaps (`max(struct)`/`min(struct)` with map-side partials) over
    * the pair-graph members only — a tiny fraction of any corpus. A
    * learned quality score swaps in for the proxy without touching
    * the plan (same discipline as q165).
    */
  def prefPairs(spark: SparkSession, dir: String): DataFrame =
    scoredClusterMembers(spark, dir)
      .groupBy(col("cluster_id"), col("cluster_size"))
      .agg(count(lit(1)).as("n_scored"),
        max(struct(col("score_milli"), (-col("doc_id")).as("nid")))
          .as("c"),
        min(struct(col("score_milli"), (-col("doc_id")).as("nid")))
          .as("r"))
      .filter(col("n_scored") >= 2)
      .select(col("cluster_id"), col("cluster_size"),
        (-col("c.nid")).as("chosen_doc_id"),
        col("c.score_milli").as("chosen_score_milli"),
        (-col("r.nid")).as("rejected_doc_id"),
        col("r.score_milli").as("rejected_score_milli"),
        (col("c.score_milli") - col("r.score_milli")).as("margin_milli"))

  /** q160: GOLDEN-RECORD ENTITY RESOLUTION — the full MDM composition
    * the pieces q127/q54 each prove alone: fuzzy-match part names
    * (q127's blocked join, unchanged), close matches into entity
    * clusters (q54's min-label propagation with its loud convergence
    * guard, over name-hash nodes plus self-loops so singletons keep
    * their own label), elect a canonical name (lexicographic min per
    * cluster — deterministic, engine-independent), then SURVIVORSHIP:
    * merge every raw record of the entity into one golden row (modal
    * brand with (count, brand)-max tie-break, max price in exact
    * cents, size bounds, record/name counts). Names shorter than the
    * gram width are outside the q127 contract and stay unresolved by
    * design.
    *
    * Scale: candidate generation is q127's bucketed join; propagation
    * is per-round edge-sized equi-joins (q54's checkpointed shape);
    * survivorship is two keyed aggregations. The cluster graph is
    * vocabulary-sized — orders below the record corpus that references
    * it — so the whole resolution runs in the metadata tier, and the
    * record-side join is one broadcast of the name→canonical map.
    */
  /** q160's name universe and its fuzzy-pair edge graph — split out so
    * the audit can print the pre-fixpoint pipeline un-truncated.
    */
  private def goldenNames(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir).select(col("p_name").as("name")).distinct()
      .filter(length(col("name")) >= FuzzyQ)
      .cp() // feeds pairs, nodes, record join

  private def goldenEdges(names: DataFrame): DataFrame = {
    // names is goldenNames: already distinct, length-filtered and
    // checkpointed — go straight to the kernel
    val pairs = fuzzyJoinNormalized(names).select(col("name_a"), col("name_b"))
    val e = pairs.select(hash60(col("name_a")).as("src"),
      hash60(col("name_b")).as("dst"))
    e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .union(names.select(hash60(col("name")).as("src"),
        hash60(col("name")).as("dst")))
      .distinct().cp()
  }

  def goldenRecord(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.part(spark, dir)
    val names = goldenNames(spark, dir)
    val edges = goldenEdges(names)
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    for (_ <- 1 to ClusterRounds) labels = propagate(edges, labels)
    val next = propagate(edges, labels)
    val guarded = labels
      .join(next.withColumnRenamed("label", "label_next"), "node")
      .select(col("node"),
        coalesce(
          assert_true(col("label") === col("label_next"),
            lit(s"q160: name clustering not converged after " +
              s"$ClusterRounds rounds — raise ClusterRounds"))
            .cast("long"),
          col("label")).as("label"))
    val named = names.select(col("name"), hash60(col("name")).as("node"))
      .join(guarded, "node")
    val canon = named.groupBy(col("label"))
      .agg(min(col("name")).as("canonical"), count(lit(1)).as("n_names"))
    val recs = parts
      .join(broadcast(named.select(col("name").as("p_name"), col("label"))),
        "p_name")
      .join(broadcast(canon), "label")
    val brand = recs.groupBy(col("canonical"), col("p_brand"))
      .agg(count(lit(1)).as("bc"))
      .groupBy(col("canonical"))
      .agg(max(struct(col("bc"), col("p_brand"))).as("bw"))
      .select(col("canonical"), col("bw.p_brand").as("brand"))
    recs.groupBy(col("canonical"), col("n_names"))
      .agg(count(lit(1)).as("n_records"),
        max(expr("CAST(round(p_retailprice * 100, 0) AS BIGINT)"))
          .as("max_price_cents"),
        min(col("p_size")).as("min_size"), max(col("p_size")).as("max_size"))
      .join(brand, "canonical")
      .select(col("canonical"), col("n_names"), col("n_records"),
        col("brand"), col("max_price_cents"), col("min_size"),
        col("max_size"))
  }

  private val KmvK = 1024 // bottom-k sketch size (distinct k-min hashes)
  // q151's est_ok is pinned TRUE in the oracle (the q134/q138 contract
  // pattern): the KMV Jaccard estimator is a hypergeometric sample of
  // k union elements, sd <= 0.5/sqrt(k) ≈ 15.7 milli absolute at
  // k = 1024, so the accepted absolute bound must stay >= 6 sigma or
  // the deterministic hash gate becomes a coin flip.
  private val KmvBoundMilli = 100L
  require(KmvBoundMilli.toDouble >= 6.0 * 500.0 / math.sqrt(KmvK.toDouble),
    s"q151 est_ok is pinned TRUE; bound ${KmvBoundMilli}m must stay " +
      s">= 6x the k=$KmvK KMV sd (${500.0 / math.sqrt(KmvK.toDouble)}m)")

  /** q151: KMV (BOTTOM-K) SKETCH JACCARD — per-source k-minimum-values
    * sketches of the shingle-hash sets ([[graft.functions.KMinLongs]]),
    * pairwise-merged to estimate cross-source JACCARD directly: the
    * set operation HLL registers structurally cannot support (q134
    * unions two HLLs but must inclusion-exclude intersections from
    * exact counts; a KMV sketch retains sample VALUES, so
    * `|kmin_k(A∪B) ∩ A ∩ B| / k` estimates J(A,B) from the sketches
    * alone). Merge is sorted-union-truncate — order-insensitive,
    * idempotent, k longs of state — so per-source sketches build in
    * ONE pass with map-side partials and any pair compares later
    * without rescanning the corpus. The estimate is bound-checked
    * IN-PLAN against the exact intersection join (the q90/q134
    * discipline, |est−exact| ≤ [[KmvBoundMilli]] milli absolute) and
    * every arithmetic step is integer (DIV), so the oracle replays
    * the identical sketch — hash equality pins the estimator itself,
    * not just the verdict.
    *
    * Scale: the exact intersection here exists only to check the
    * contract at test scale and is the thing the sketch replaces at
    * 100 TB; sketch state is k·8 bytes per source — metadata-tier.
    */
  def kmvJaccard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sh = sourceShingles(Tables.documents(spark, dir))
      .cp() // feeds sketch build + exact check
    val km = sh.as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new graft.functions.KMinLongs(KmvK).toColumn.name("kl"))
      .toDF("source", "kl")
    val dsh = sh.distinct()
    val counts = dsh.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val inter = dsh.as("a").join(dsh.as("b"),
        col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("exact_inter"))
    val sk = km.join(counts, "source")
    sk.as("x").join(broadcast(sk.as("y")), col("x.source") < col("y.source"))
      .select(col("x.source").as("source_a"), col("y.source").as("source_b"),
        col("x.n").as("n_a"), col("y.n").as("n_b"),
        col("x.kl").as("ka"), col("y.kl").as("kb"))
      .join(inter, Seq("source_a", "source_b"), "left")
      .withColumn("exact_inter", coalesce(col("exact_inter"), lit(0L)))
      .withColumn("u",
        slice(array_sort(array_union(col("ka"), col("kb"))), 1, KmvK))
      .withColumn("kp", size(col("u")).cast("long"))
      .withColumn("n_both", size(array_intersect(col("u"),
        array_intersect(col("ka"), col("kb")))).cast("long"))
      .withColumn("est_milli", expr("(1000 * n_both) DIV kp"))
      .withColumn("exact_milli",
        expr("(1000 * exact_inter) DIV (n_a + n_b - exact_inter)"))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        col("exact_inter"), col("est_milli"), col("exact_milli"),
        (abs(col("est_milli") - col("exact_milli")) <= KmvBoundMilli)
          .cast("int").as("est_ok"))
  }

  /** q140: THE NIGHTLY DROP — the incremental steps q58/q121/q138 each
    * prove alone, composed into ONE plan that takes the new-corpus
    * drop (q58's doc_id ≡ 7 mod 10 convention) from raw text to a
    * per-(source, split) ingest manifest with merged corpus stats,
    * WITHOUT rescanning the base corpus where the design forbids it:
    *
    *  1. the drop is screened against the base (q58's exact-hash +
    *     band/verify joins — the ONE place the base participates, and
    *     only through its hash/signature tables, which a deployment
    *     stores; this self-contained query rebuilds them);
    *  2. accepted docs (`verdict = 'new'`) get content-keyed splits
    *     (q121's salted-hash threshold — append-stable, so the drop
    *     never reshuffles yesterday's splits) and token counts, read
    *     from the INCREMENT slice only;
    *  3. per-source distinct-shingle stats update by HLL merge
    *     (q138): yesterday's persisted sketches are READ BACK from
    *     their parquet state and unioned with increment-only
    *     sketches — the base corpus contributes KB of state, zero
    *     text; the exact count in the output exists only to bound-
    *     check the estimate at test scale (q90/q134 discipline).
    *
    * Output: (source, split, n_docs, n_tokens, exact_n, est_ok) — the
    * manifest a nightly ingest job would publish. The oracle replays
    * the whole composition; the spec additionally asserts the plan
    * reads the persisted sketch state (not a base rescan) for stats.
    */
  def nightlyDrop(spark: SparkSession, dir: String): DataFrame = {
    val isNew = col("doc_id") % 10 === 7
    val accepted = dedupIncremental(spark, dir)
      .filter(col("verdict") === "new").select(col("doc_id"))
    val perSplit = Tables.documents(spark, dir).filter(isNew)
      .join(accepted, "doc_id")
      .withColumn("bucket", Curation.splitBucket(col("text")))
      .withColumn("split",
        when(col("bucket") < Curation.SplitTrainMilli, "train")
          .when(col("bucket") < Curation.SplitValMilli, "val")
          .otherwise("test"))
      .withColumn("n_tokens", size(words(col("text"))).cast("long"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
    perSplit.join(sketchIncrement(spark, dir), "source")
      .select(col("source"), col("split"), col("n_docs"), col("n_tokens"),
        col("exact_n"), col("est_ok"))
  }

  private[graft] val DupSpanN = 20 // tokens per exact-duplicate span

  /** q143: DUPLICATED-SPAN COVERAGE — for every document, the fraction
    * of its tokens covered by an exact [[DupSpanN]]-token span that
    * occurs more than once in the corpus (within- or cross-document):
    * the deduplicate-training-data diagnostic that motivates exact
    * substring dedup — boilerplate headers, license blocks, templated
    * passages show up as high `dup_milli` long before whole-doc
    * hashes match. Composes two existing kernels: the one-pass
    * shingle hasher (positional 20-gram hashes, `ShingleHash60Expr`)
    * and q126's gaps-and-islands interval merge (overlapping dup
    * spans coalesce, so a token is counted once however many
    * duplicated spans cover it).
    *
    * Scale: span hashes are row-local; the duplicate test is ONE
    * span-grain groupBy(h) with map-side partials + an equi-join back
    * — never all-pairs; the island merge is a per-doc window. A
    * 60-bit hash stands in for byte equality (the q15/q95 convention:
    * collision probability ~2⁻⁶⁰ per pair); a production pass
    * verifies flagged spans byte-wise before cutting.
    */
  def dupSpans(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), words(col("text")).as("ws"))
      .filter(size(col("ws")) >= DupSpanN)
      .select(col("doc_id"), size(col("ws")).cast("long").as("n_tokens"),
        col("ws"))
    val spans = docs
      .select(col("doc_id"), col("n_tokens"),
        posexplode(graft.functions.HashOps.shingle_hash60(col("ws"), DupSpanN)))
      .select(col("doc_id"), col("n_tokens"),
        col("pos").cast("long").as("pos"), col("col").as("h"))
      .cp() // feeds the dup aggregate AND the join back
    val dupH = spans.groupBy(col("h")).agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= 2).select(col("h"))
    val cov = Events.coverageOf(
      spans.join(dupH, "h")
        .select(col("doc_id").as("user_id"), col("pos").as("event_id"),
          col("pos").as("us"), (col("pos") + DupSpanN).as("end_us")))
      .select(col("user_id").as("doc_id"), col("n_islands"),
        col("covered_us"))
    docs.select(col("doc_id"), col("n_tokens"))
      .join(cov, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_islands"), lit(0L)).as("dup_islands"),
        coalesce(col("covered_us"), lit(0L)).as("dup_tokens"),
        expr("coalesce(covered_us, 0) * 1000 DIV n_tokens").as("dup_milli"))
  }

  /** q197: EXACT-SUBSTRING DEDUP SURGERY — the repair step q143
    * diagnoses. Every duplicated [[DupSpanN]]-token span elects ONE
    * canonical occurrence corpus-wide (the lexicographically first
    * (doc_id, pos) — deterministic, and append-stable while ids are);
    * every OTHER occurrence is cut. Overlapping cuts coalesce through
    * q126's island merge, so per document the audit reports tokens
    * cut, tokens kept, and the cut fraction in milli — the exact
    * substring-dedup accounting (the "train on each passage once"
    * repair), with the corpus-level guarantee that no passage
    * disappears entirely: its canonical home always survives.
    *
    * Scale: identical shape to q143 — row-local positional span
    * hashes, ONE span-grain groupBy with map-side partials, an
    * equi-join back, a per-doc island window — plus the canonical
    * election, a min(struct) that rides the SAME duplicate-test
    * aggregate for free. Never all-pairs, never a global sort.
    */
  def dupSpanSurgery(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), words(col("text")).as("ws"))
      .filter(size(col("ws")) >= DupSpanN)
      .select(col("doc_id"), size(col("ws")).cast("long").as("n_tokens"),
        col("ws"))
    val spans = docs
      .select(col("doc_id"),
        posexplode(graft.functions.HashOps.shingle_hash60(col("ws"), DupSpanN)))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("col").as("h"))
      .cp() // feeds the owner election AND the join back
    val owner = spans.groupBy(col("h"))
      .agg(count(lit(1)).as("n_occ"),
        min(struct(col("doc_id"), col("pos"))).as("own"))
      .filter(col("n_occ") >= 2)
      .select(col("h"), col("own.doc_id").as("own_doc"),
        col("own.pos").as("own_pos"))
    val cut = spans.join(owner, "h")
      .filter(!(col("doc_id") === col("own_doc") &&
        col("pos") === col("own_pos")))
    val cov = Events.coverageOf(
      cut.select(col("doc_id").as("user_id"), col("pos").as("event_id"),
        col("pos").as("us"), (col("pos") + DupSpanN).as("end_us")))
      .select(col("user_id").as("doc_id"), col("covered_us"))
    docs.select(col("doc_id"), col("n_tokens"))
      .join(cov, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("covered_us"), lit(0L)).as("cut_tokens"),
        (col("n_tokens") - coalesce(col("covered_us"), lit(0L)))
          .as("kept_tokens"),
        expr("coalesce(covered_us, 0) * 1000 DIV n_tokens").as("cut_milli"))
  }

  /** q198: QUALITY×DUPLICATION CALIBRATION — does the cheap quality
    * gate's verdict predict the expensive duplication problems? Per
    * q22 quality bucket: corpus count, exact-duplicate rate (q14's
    * content-hash kernel: the text occurs more than once verbatim)
    * and near-duplicate rate (q15 band-join pair membership), both in
    * milli. This is the audit that justifies (or refutes) running
    * gates cheapest-first in q100's pipeline: if `short`/`repetitive`
    * docs duplicate at 10× the `ok` rate, the quality gate is also a
    * cheap pre-dedup filter; if the rates are flat, it is not.
    *
    * Scale: three shared kernels (row-local scoring, one
    * content-hash shuffle, the banded pair join), assembled by two
    * doc_id left joins and ONE bucket-grain aggregation with map-side
    * partials. Nothing here adds a pass over the corpus.
    */
  def qualityDupCalibration(spark: SparkSession, dir: String): DataFrame = {
    val q = TextAnalysis.quality(spark, dir)
      .select(col("doc_id"), col("quality_bucket"))
    val exact = Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("text")).as("content_hash"))
      .join(dedupExact(spark, dir).filter(col("n_copies") >= 2)
        .select(col("content_hash")), "content_hash")
      .select(col("doc_id")).withColumn("is_exact", lit(1L))
    val pairs = dedupMinhash(spark, dir)
    val near = pairs.select(col("doc_a").as("doc_id"))
      .unionByName(pairs.select(col("doc_b").as("doc_id")))
      .distinct().withColumn("is_near", lit(1L))
    q.join(exact, Seq("doc_id"), "left")
      .join(near, Seq("doc_id"), "left")
      .groupBy(col("quality_bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("is_exact"), lit(0L))).as("n_exact_dup"),
        sum(coalesce(col("is_near"), lit(0L))).as("n_near_dup"))
      .withColumn("exact_milli", expr("1000 * n_exact_dup DIV n_docs"))
      .withColumn("near_milli", expr("1000 * n_near_dup DIV n_docs"))
  }

  private val CshShards = 16L // q202 dedup-domain shard count

  /** q202: DEDUP-CO-LOCATED SHARDING — the layout that makes
    * distributed dedup embarrassingly parallel: each document's shard
    * is a salted hash of its q54 CLUSTER id (the closure's min-label;
    * docs outside every near-dup pair are singletons keyed by their
    * own id), so every near-duplicate cluster lands WHOLE in one
    * shard. A per-shard local dedup pass is then globally complete —
    * no cross-shard candidate can exist, because candidacy (the q15
    * band join) is exactly what defined the clusters. The spec pins
    * the property over the live pair set; [[CshShards]] is the toy
    * default (a cluster deployment shards to its executor count).
    *
    * Scale: the q54 closure's one label table left-joined onto the
    * corpus (doc-grain equi-join); the shard key is row-local. The
    * output is the partitioning a 100 TB dedup job repartitions by
    * ONCE, after which every pass is shard-local.
    */
  def clusterSharding(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(col("doc_id"))
      .join(dupClusters(spark, dir).select(col("doc_id"), col("cluster_id")),
        Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("shard", graft.functions.HashOps.md5_prefix60(
        concat(lit("csh:"), col("cluster_id").cast("string"))) % CshShards)

  private val SnmWindow = 8 // neighborhood width (positions in sort order)
  private val SnmKeyLen = 24 // sort-key prefix length (chars)

  /** q145: SORTED-NEIGHBORHOOD dedup blocking (Hernández & Stolfo's
    * merge/purge) — the third candidate-generation discipline next to
    * hash banding (q15) and prefix filtering (q137): sort the corpus
    * by a domain key (here the text's [[SnmKeyLen]]-char prefix),
    * slide a [[SnmWindow]]-row window down the sorted order, and emit
    * only pairs within the window; survivors are verified with the
    * exact shingle-Jaccard kernel. Finds prefix-preserving near-dups
    * in O(n·w) candidates where hashing needs no order and sorting
    * needs no hashes — production systems run both and union.
    *
    * Scale shape: the global position comes from q55's two-phase
    * ranker (ONE range shuffle + a numPartitions-row offset
    * broadcast — no single-partition window). The windowed self-join
    * is an EQUI-join on `position DIV w` (each left row probes its
    * own stripe and the next — two slim keys/row, never a range
    * scan), so candidates shuffle as (id, position) pairs and the
    * heavy shingle arrays join back only for the ≤ n·w verified
    * candidates. A 1000-executor sort of 100 TB is exactly the same
    * plan: range exchange, per-partition index, stripe join.
    */
  def sortedNeighborhood(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), substring(col("text"), 1, SnmKeyLen).as("skey"),
        words(col("text")).as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), col("skey"), array_sort(array_distinct(
        graft.functions.HashOps.shingle_hash60(col("ws"), 3))).as("hsh"))
    val ranked = Relational.withGlobalRank(d,
        Seq(col("skey").asc, col("doc_id").asc))
      .withColumn("bucket", expr(s"(rnk - 1) DIV $SnmWindow"))
      .cp() // slim candidate side + both verify probes
    val slim = ranked.select(col("doc_id"), col("rnk"), col("bucket"))
    val probes = slim.select(col("doc_id").as("doc_a"),
      col("rnk").as("rn_a"),
      explode(array(col("bucket"), col("bucket") + 1)).as("jb"))
    val cand = probes.join(
        slim.select(col("doc_id").as("doc_b"), col("rnk").as("rn_b"),
          col("bucket").as("jb")), "jb")
      .filter((col("rn_b") - col("rn_a")).between(1, SnmWindow))
      .select(col("doc_a"), col("doc_b"),
        (col("rn_b") - col("rn_a")).as("gap"))
    cand
      .join(ranked.select(col("doc_id").as("doc_a"), col("hsh").as("hsa")),
        "doc_a")
      .join(ranked.select(col("doc_id").as("doc_b"), col("hsh").as("hsb")),
        "doc_b")
      .withColumn("inter",
        graft.functions.ArrayOps.sorted_intersect_count(col("hsa"), col("hsb")))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("hsa")) + size(col("hsb")) - col("inter")))
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("gap"), col("jaccard"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q145_sorted_neighborhood" -> sortedNeighborhood,
    "q143_dup_spans" -> dupSpans,
    "q140_nightly_drop" -> nightlyDrop,
    "q168_modal_agreement" -> modalAgreement,
    "q176_pref_pairs" -> prefPairs,
    "q177_minhash_calibration" -> minhashCalibration,
    "q178_ngram_leakage" -> ngramLeakage,
    "q165_cluster_elect" -> clusterElect,
    "q160_golden_record" -> goldenRecord,
    "q151_kmv_jaccard" -> kmvJaccard,
    "q138_sketch_increment" -> sketchIncrement,
    "q137_prefix_join" -> prefixJoin,
    "q134_sketch_union" -> sketchUnion,
    "q127_fuzzy_join" -> fuzzyJoin,
    "q96_split_leakage" -> splitLeakage,
    "q190_cross_source_dups" -> crossSourceDups,
    "q191_soft_dedup" -> softDedupWeights,
    "q194_eval_decontam" -> evalDecontam,
    "q197_span_surgery" -> dupSpanSurgery,
    "q198_quality_dup_calibration" -> qualityDupCalibration,
    "q202_cluster_sharding" -> clusterSharding,
    "q95_cdc_chunks" -> dedupCdcChunks,
    "q14_dedup_exact" -> dedupExact,
    "q15_dedup_minhash" -> dedupMinhash,
    "q16_dedup_simhash" -> dedupSimhash,
    "q17_dedup_ngram" -> dedupNgram,
    "q18_dedup_embed" -> dedupEmbed,
    "q54_dup_clusters" -> dupClusters,
    // the PRODUCTION fixpoint path, driver-hash-checked against the
    // same recursive-CTE oracle as the unrolled q54
    "q91_clusters_converged" ->
      ((s: SparkSession, d: String) => dupClustersConverged(s, d)),
    "q58_dedup_incremental" -> dedupIncremental,
    "q66_chunk_dedup" -> dedupChunks)

  // ---- DuckDB oracles: the same algorithms, same hashes, verbatim ----

  private val sqlShingles =
    s"""WITH w AS (SELECT doc_id, $sqlWords ws FROM documents),
       |d AS (SELECT doc_id, list_sort(list_distinct(list_transform(
       |        list_transform(range(1, len(ws)-1),
       |          i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]),
       |        s -> ${sqlHash60("s")}))) hsh
       |      FROM w WHERE len(ws) >= 3)""".stripMargin

  /** Shared CTE prefix: shingle-hash sets (`d`), minhash signatures
    * (`sig`), LSH band keys (`bands`) — used verbatim by the q15 and
    * q58 oracles so the two can never drift.
    */
  private val sigBandsSql = {
    val mhExprs = hashAB.map { case (a, b) =>
      s"list_min(list_transform(hsh, h -> (${a} * (h % $P) + ${b}) % $P))"
    }.mkString(",\n|          ")
    s"""$sqlShingles,
       |sig AS (SELECT doc_id, hsh, [
       |          $mhExprs] mhs FROM d),
       |bands AS (SELECT doc_id, unnest(list_transform(range(${NumBands}),
       |            b -> CAST(b AS VARCHAR) || ':' || CAST(mhs[2*b+1] AS VARCHAR)
       |                 || ':' || CAST(mhs[2*b+2] AS VARCHAR))) bkey FROM sig)""".stripMargin
  }

  private[operators] val minhashSql =
    // stripMargin before substituting (see clustersSql): the prefix
    // holds lines starting with a `||` concat
    """@SB@,
       |cand AS (SELECT DISTINCT a.doc_id doc_a, b.doc_id doc_b
       |         FROM bands a JOIN bands b ON a.bkey = b.bkey AND a.doc_id < b.doc_id),
       |j AS (SELECT doc_a, doc_b, len(list_intersect(x.hsh, y.hsh)) i,
       |             len(x.hsh) la, len(y.hsh) lb
       |      FROM cand JOIN d x ON x.doc_id = cand.doc_a
       |                JOIN d y ON y.doc_id = cand.doc_b)
       |SELECT doc_a, doc_b, CAST(i AS DOUBLE)/(la+lb-i) AS jaccard
       |FROM j WHERE CAST(i AS DOUBLE)/(la+lb-i) >= 0.5""".stripMargin
      .replace("@SB@", sigBandsSql)

  private val incrementalSql =
    """@SB@,
      |h AS (SELECT doc_id, md5(text) h FROM documents),
      |ex AS (SELECT DISTINCT n.doc_id FROM h n JOIN h c
      |       ON n.h = c.h AND n.doc_id % 10 = 7 AND c.doc_id % 10 <> 7),
      |cand AS (SELECT DISTINCT n.doc_id, c.doc_id corpus_id
      |         FROM bands n JOIN bands c ON n.bkey = c.bkey
      |         WHERE n.doc_id % 10 = 7 AND c.doc_id % 10 <> 7),
      |nr0 AS (SELECT cand.doc_id, len(list_intersect(x.hsh, y.hsh)) i,
      |          len(x.hsh) la, len(y.hsh) lb
      |        FROM cand JOIN d x ON x.doc_id = cand.doc_id
      |                  JOIN d y ON y.doc_id = cand.corpus_id),
      |nr AS (SELECT DISTINCT doc_id FROM nr0
      |       WHERE CAST(i AS DOUBLE)/(la+lb-i) >= 0.5)
      |SELECT doc_id, CASE WHEN doc_id IN (SELECT doc_id FROM ex) THEN 'dup_exact'
      |                    WHEN doc_id IN (SELECT doc_id FROM nr) THEN 'dup_near'
      |                    ELSE 'new' END AS verdict
      |FROM documents WHERE doc_id % 10 = 7""".stripMargin
      .replace("@SB@", sigBandsSql)

  private val simhashSql = {
    val votes = (0 until 16).map(b =>
      s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) s$b").mkString(", ")
    val combine = (0 until 16).map(b =>
      s"(CASE WHEN s$b > 0 THEN ${1 << b} ELSE 0 END)").mkString(" + ")
    s"""WITH w AS (SELECT doc_id, unnest($sqlWords) w FROM documents),
       |h AS (SELECT doc_id, ${sqlHash16("w")} h FROM w),
       |v AS (SELECT doc_id, $votes FROM h GROUP BY doc_id)
       |SELECT doc_id, $combine AS simhash16 FROM v""".stripMargin
  }

  private val ngramSql =
    s"""WITH g0 AS (SELECT doc_id, list_transform(range(1, length(text)-3),
       |              i -> substr(text, i, 5)) gr FROM documents WHERE length(text) >= 11),
       |a AS (SELECT doc_id, list_sort(list_distinct(list_transform(gr, g -> ${sqlHash60("g")}))) hs FROM g0),
       |k AS (SELECT doc_id, hs, CAST(hs[1] AS VARCHAR) || ':' || CAST(hs[2] AS VARCHAR)
       |        || ':' || CAST(hs[3] AS VARCHAR) anchor FROM a WHERE len(hs) >= 3),
       |cand AS (SELECT x.doc_id doc_a, y.doc_id doc_b, x.hs hsa, y.hs hsb
       |         FROM k x JOIN k y ON x.anchor = y.anchor AND x.doc_id < y.doc_id),
       |j AS (SELECT doc_a, doc_b, len(list_intersect(hsa, hsb)) i, len(hsa) la, len(hsb) lb FROM cand)
       |SELECT doc_a, doc_b, CAST(i AS DOUBLE)/(la+lb-i) AS jaccard
       |FROM j WHERE CAST(i AS DOUBLE)/(la+lb-i) >= 0.6""".stripMargin

  private val embedSql =
    s"""WITH e AS (SELECT vec_id, label, $sqlQvec qv FROM embeddings),
       |n AS (SELECT vec_id, label, qv, ${sqlNorm2("qv")} n2 FROM e),
       |p AS (SELECT a.vec_id vec_a, b.vec_id vec_b, a.label AS "label",
       |        CAST(${sqlDotq("a.qv", "b.qv")} AS DOUBLE) / sqrt(nullif(CAST(a.n2 AS DOUBLE)*CAST(b.n2 AS DOUBLE), 0.0)) cosine
       |      FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id)
       |SELECT vec_a, vec_b, label, cosine FROM p WHERE cosine >= 0.35""".stripMargin

  /** Oracle: true connected components via a recursive CTE (reachable
    * min label), over the identical q15 pair set — so it also proves
    * the engine's fixed unroll reached the fixpoint.
    */
  // shared closure prefix (q54/q91 AND q165): true connected
  // components via recursive CTE over the identical q15 pair set
  private val closureCte =
    // stripMargin BEFORE substituting: minhashSql contains lines whose
    // first non-blank chars are a `||` concat, which an outer
    // stripMargin would truncate to `|`
    """WITH RECURSIVE
       |pr AS (SELECT doc_a, doc_b FROM (@PAIRS@)),
       |e AS (SELECT doc_a s, doc_b d FROM pr
       |      UNION ALL SELECT doc_b, doc_a FROM pr),
       |n AS (SELECT DISTINCT s AS node FROM e),
       |reach(node, label) AS (
       |  SELECT node, node FROM n
       |  UNION
       |  SELECT e.d, r.label FROM reach r JOIN e ON e.s = r.node),
       |lab AS (SELECT node, min(label) AS cluster_id FROM reach GROUP BY node),
       |sz AS (SELECT cluster_id, count(*) cnt FROM lab GROUP BY cluster_id)""".stripMargin
      .replace("@PAIRS@", minhashSql)

  // both pair generators spliced VERBATIM from their standalone
  // oracles (stripMargin'd before substitution, see closureCte).
  // LAZY: embedSql is declared further down; a strict val here would
  // splice null at object init
  private lazy val modalAgreementSql =
    """WITH tp AS (SELECT doc_a, doc_b FROM (@TEXT@)),
      |gp AS (SELECT vec_a AS doc_a, vec_b AS doc_b FROM (@EMBED@)),
      |u AS (SELECT coalesce(tp.doc_a, gp.doc_a) AS doc_a,
      |        coalesce(tp.doc_b, gp.doc_b) AS doc_b,
      |        CAST(CASE WHEN tp.doc_a IS NULL THEN 0 ELSE 1 END AS INTEGER)
      |          AS text_dup,
      |        CAST(CASE WHEN gp.doc_a IS NULL THEN 0 ELSE 1 END AS INTEGER)
      |          AS embed_dup
      |      FROM tp FULL OUTER JOIN gp
      |        ON tp.doc_a = gp.doc_a AND tp.doc_b = gp.doc_b)
      |SELECT doc_a, doc_b, text_dup, embed_dup,
      |  CASE WHEN text_dup = 1 AND embed_dup = 1 THEN 'both'
      |       WHEN text_dup = 1 THEN 'text_only'
      |       ELSE 'embed_only' END AS agreement
      |FROM u""".stripMargin
      .replace("@TEXT@", minhashSql)
      .replace("@EMBED@", embedSql)

  // tails stripMargin'd SEPARATELY, then concatenated — an outer
  // stripMargin over the substituted closureCte would truncate
  // minhashSql's `||` continuation lines to `|`
  private val clustersSql = closureCte + "\n" +
    """SELECT lab.node AS doc_id, lab.cluster_id,
      |       CAST(sz.cnt AS BIGINT) AS cluster_size,
      |       (lab.node = lab.cluster_id) AS is_canonical
      |FROM lab JOIN sz USING (cluster_id)""".stripMargin

  // q191: the q54 closure's cluster sizes left-joined onto the whole
  // corpus; docs outside every pair are singletons of size 1
  private val softDedupSql = closureCte + "\n" +
    """SELECT d.doc_id, d.source,
      |       CAST(coalesce(sz.cnt, 1) AS BIGINT) AS cluster_size,
      |       1000 // CAST(coalesce(sz.cnt, 1) AS BIGINT) AS weight_milli
      |FROM documents d
      |LEFT JOIN lab ON lab.node = d.doc_id
      |LEFT JOIN sz ON sz.cluster_id = lab.cluster_id""".stripMargin

  // q202: the q54 closure's labels onto the whole corpus (q191's
  // singleton convention), shard = salted hash of the cluster id
  private val clusterShardingSql = closureCte + "\n" +
    s"""SELECT d.doc_id,
       |  coalesce(lab.cluster_id, d.doc_id) AS cluster_id,
       |  ${graft.functions.Portable.sqlHash60(
            "'csh:' || CAST(coalesce(lab.cluster_id, d.doc_id) AS VARCHAR)")}
       |    % $CshShards AS shard
       |FROM documents d LEFT JOIN lab ON lab.node = d.doc_id""".stripMargin

  // q54's closure + the q157 diversity score + a rank-1 election —
  // keeper by QUALITY, not by min id
  // scored cluster members (q165 AND q176 — the SQL twin of
  // scoredClusterMembers): q54's closure + the q157 diversity score
  private val scoredMembersCte =
    s"""s AS (SELECT doc_id,
       |        CAST((1000 * len(list_distinct(ws))) // len(ws) AS BIGINT)
       |          score_milli
       |      FROM (SELECT doc_id, $sqlWords ws FROM documents)
       |      WHERE len(ws) > 0),
       |j AS (SELECT lab.node AS doc_id, lab.cluster_id,
       |        CAST(sz.cnt AS BIGINT) AS cluster_size, s.score_milli
       |      FROM lab JOIN sz USING (cluster_id)
       |      JOIN s ON s.doc_id = lab.node)""".stripMargin

  private val clusterElectSql = closureCte + ",\n" + scoredMembersCte +
    ",\n" +
    """k AS (SELECT *, row_number() OVER (PARTITION BY cluster_id
      |        ORDER BY score_milli DESC, doc_id ASC) rn FROM j)
      |SELECT cluster_id, cluster_size, doc_id AS keeper_doc_id,
      |  score_milli AS keeper_score_milli,
      |  CAST(cluster_size - 1 AS BIGINT) AS n_dropped
      |FROM k WHERE rn = 1""".stripMargin

  // q176: both rank-1 elections over the same scored members, glued by
  // cluster — chosen (score DESC, id ASC), rejected (score ASC, id
  // DESC), clusters with ≥ 2 scored members only
  private val prefPairsSql = closureCte + ",\n" + scoredMembersCte +
    ",\n" +
    """k AS (SELECT *,
      |        row_number() OVER (PARTITION BY cluster_id
      |          ORDER BY score_milli DESC, doc_id ASC) rc,
      |        row_number() OVER (PARTITION BY cluster_id
      |          ORDER BY score_milli ASC, doc_id DESC) rr,
      |        count(*) OVER (PARTITION BY cluster_id) ns FROM j)
      |SELECT c.cluster_id, c.cluster_size,
      |  c.doc_id AS chosen_doc_id, c.score_milli AS chosen_score_milli,
      |  r.doc_id AS rejected_doc_id, r.score_milli AS rejected_score_milli,
      |  c.score_milli - r.score_milli AS margin_milli
      |FROM k c JOIN k r ON c.cluster_id = r.cluster_id
      |WHERE c.rc = 1 AND r.rr = 1 AND c.ns >= 2""".stripMargin

  // q177: candidates and per-pair probes spliced from the SAME
  // sig/bands CTEs as q15 — the estimate is slot agreement over `sig`,
  // the truth is the exact intersection over `d`
  private val minhashCalibrationSql =
    s"""@SB@,
      |cand AS (SELECT DISTINCT a.doc_id doc_a, b.doc_id doc_b
      |         FROM bands a JOIN bands b
      |           ON a.bkey = b.bkey AND a.doc_id < b.doc_id),
      |p AS (SELECT doc_a, doc_b,
      |        CAST(${1000 / NumHashes} * len(list_filter(
      |          range($NumHashes), i -> x.mhs[i+1] = y.mhs[i+1]))
      |          AS BIGINT) est_milli,
      |        len(list_intersect(x.hsh, y.hsh)) i,
      |        len(x.hsh) la, len(y.hsh) lb
      |      FROM cand JOIN sig x ON x.doc_id = cand.doc_a
      |                JOIN sig y ON y.doc_id = cand.doc_b),
      |e AS (SELECT est_milli,
      |        CAST(1000 * i AS BIGINT) // (la + lb - i) exact_milli
      |      FROM p)
      |SELECT est_milli, CAST(count(*) AS BIGINT) n_pairs,
      |  CAST(sum(exact_milli) AS BIGINT) sum_exact_milli,
      |  CAST(min(exact_milli) AS BIGINT) min_exact_milli,
      |  CAST(max(exact_milli) AS BIGINT) max_exact_milli
      |FROM e GROUP BY est_milli""".stripMargin
      .replace("@SB@", sigBandsSql)

  /** q66 replay: identical chunking, identical 60-bit chunk hash; the
    * first-occurrence keeper (`min(struct(doc_id, ci))` in the engine)
    * expressed as a rank-1 window over the same (doc_id, ci) order.
    */
  private val chunkSql =
    s"""WITH w AS (SELECT doc_id, $sqlWords ws FROM documents),
       |c AS (SELECT doc_id, CAST(i AS BIGINT) ci,
       |        array_to_string(ws[CAST(i*$ChunkWords+1 AS BIGINT):CAST((i+1)*$ChunkWords AS BIGINT)], ' ') chunk
       |      FROM w, LATERAL unnest(range((len(ws)-1)//$ChunkWords + 1)) t(i)
       |      WHERE len(ws) > 0),
       |h AS (SELECT doc_id, ci, chunk, row_number() OVER (
       |        PARTITION BY ${sqlHash60("chunk")} ORDER BY doc_id, ci) rn FROM c)
       |SELECT doc_id, count(*) AS n_chunks,
       |  count(*) FILTER (rn > 1) AS n_removed,
       |  string_agg(chunk, ' ' ORDER BY ci) FILTER (rn = 1) AS cleaned_text
       |FROM h GROUP BY doc_id""".stripMargin

  private val cdcChunkSql =
    s"""WITH w0 AS (SELECT doc_id, ws
       |  FROM (SELECT doc_id, $sqlWords ws FROM documents) WHERE len(ws) > 0),
       |g AS (SELECT doc_id, ws, list_transform(range(1, len(ws)-1),
       |        i -> ${sqlHash60("ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]")}) hs
       |      FROM w0),
       |b AS (SELECT doc_id, ws, list_filter(list_transform(range(1, len(ws)+1),
       |        i -> CASE WHEN i = len(ws) OR (i >= 3 AND i < len(ws)
       |                  AND hs[i-2] % $CdcMod = 0) THEN i END),
       |        x -> x IS NOT NULL) bounds FROM g),
       |c AS (SELECT doc_id, CAST(i AS BIGINT) ci,
       |        array_to_string(ws[(CASE WHEN i = 0 THEN 0 ELSE bounds[i] END)+1
       |          : bounds[i+1]], ' ') chunk
       |      FROM b, LATERAL unnest(range(len(bounds))) t(i)),
       |h AS (SELECT doc_id, ci, chunk, row_number() OVER (
       |        PARTITION BY ${sqlHash60("chunk")} ORDER BY doc_id, ci) rn FROM c)
       |SELECT doc_id, count(*) AS n_chunks,
       |  count(*) FILTER (rn > 1) AS n_removed,
       |  string_agg(chunk, ' ' ORDER BY ci) FILTER (rn = 1) AS cleaned_text
       |FROM h GROUP BY doc_id""".stripMargin

  private val splitLeakageSql =
    s"""WITH pr AS (SELECT doc_a, doc_b FROM (@PAIRS@)),
       |s AS (SELECT doc_id,
       |        CASE WHEN m < ${Curation.SplitTrainMilli} THEN 'train'
       |             WHEN m < ${Curation.SplitValMilli} THEN 'val'
       |             ELSE 'test' END split
       |      FROM (SELECT doc_id, @BUCKET@ m FROM documents))
       |SELECT sa.split AS split_a, sb.split AS split_b,
       |       CAST(count(*) AS BIGINT) AS n_pairs,
       |       sa.split <> sb.split AS leaked
       |FROM pr JOIN s sa ON pr.doc_a = sa.doc_id
       |        JOIN s sb ON pr.doc_b = sb.doc_id
       |GROUP BY 1, 2, 4""".stripMargin
      .replace("@PAIRS@", minhashSql)
      .replace("@BUCKET@", Curation.splitBucketSql)

  private val crossSourceDupsSql =
    s"""WITH pr AS (SELECT doc_a, doc_b FROM (@PAIRS@)),
       |s AS (SELECT doc_id, source FROM documents)
       |SELECT least(sa.source, sb.source) AS source_lo,
       |       greatest(sa.source, sb.source) AS source_hi,
       |       CAST(count(*) AS BIGINT) AS n_pairs,
       |       CAST(least(sa.source, sb.source)
       |         <> greatest(sa.source, sb.source) AS INTEGER)
       |         AS cross_source
       |FROM pr JOIN s sa ON pr.doc_a = sa.doc_id
       |        JOIN s sb ON pr.doc_b = sb.doc_id
       |GROUP BY 1, 2, 4""".stripMargin
      .replace("@PAIRS@", minhashSql)

  // q194: both leak channels spliced from their standalone oracles —
  // the pair set verbatim, the gram audit as a CTE-in-subquery.
  // LAZY: ngramLeakageSql is declared below; a strict val would
  // splice null at object init (the embedSql precedent)
  private lazy val evalDecontamSql =
    s"""WITH s AS (SELECT doc_id, ${Curation.splitBucketSql} m
       |           FROM documents),
       |te AS (SELECT doc_id FROM s WHERE m >= ${Curation.SplitValMilli}),
       |tr AS (SELECT doc_id AS partner FROM s
       |       WHERE m < ${Curation.SplitTrainMilli}),
       |pr AS (SELECT doc_a, doc_b FROM (@PAIRS@)),
       |pl AS (SELECT DISTINCT u.doc_id FROM (
       |         SELECT doc_a AS doc_id, doc_b AS partner FROM pr
       |         UNION ALL SELECT doc_b, doc_a FROM pr) u
       |       JOIN tr ON tr.partner = u.partner),
       |gl AS (SELECT doc_id, leak_milli FROM (@GRAM@)),
       |v AS (SELECT te.doc_id,
       |        coalesce(gl.leak_milli, 0) AS leak_milli,
       |        CASE WHEN pl.doc_id IS NOT NULL THEN 1 ELSE 0 END pairlk,
       |        CASE WHEN coalesce(gl.leak_milli, 0)
       |               >= $GramQuarantineMilli THEN 1 ELSE 0 END gramlk
       |      FROM te LEFT JOIN pl ON pl.doc_id = te.doc_id
       |           LEFT JOIN gl ON gl.doc_id = te.doc_id)
       |SELECT doc_id, leak_milli,
       |  CASE WHEN pairlk = 1 AND gramlk = 1 THEN 'both'
       |       WHEN pairlk = 1 THEN 'pair'
       |       WHEN gramlk = 1 THEN 'gram'
       |       ELSE 'none' END AS reason,
       |  CASE WHEN pairlk = 0 AND gramlk = 0 THEN 'keep'
       |       ELSE 'quarantine' END AS verdict
       |FROM v""".stripMargin
      .replace("@PAIRS@", minhashSql)
      .replace("@GRAM@", ngramLeakageSql)

  // q178: the shipped split convention (Curation.splitBucketSql, the
  // q121 oracle's own expression), grams joined with the shingle
  // kernel's single-space convention (q15's sqlShingles)
  private val ngramLeakageSql = {
    val gram = (0 until LeakN).map(j => s"ws[i+$j]").mkString(" || ' ' || ")
    s"""WITH w AS (SELECT doc_id, ${Curation.splitBucketSql} m, $sqlWords ws
       |           FROM documents),
       |g AS (SELECT doc_id, m, list_distinct(list_transform(
       |        range(1, len(ws) - ${LeakN - 2}),
       |        i -> ${sqlHash60(gram)})) gs
       |      FROM w WHERE len(ws) >= $LeakN),
       |tr AS (SELECT DISTINCT unnest(gs) g FROM g
       |       WHERE m < ${Curation.SplitTrainMilli}),
       |te AS (SELECT doc_id, unnest(gs) g FROM g
       |       WHERE m >= ${Curation.SplitValMilli}),
       |j AS (SELECT doc_id, CASE WHEN tr.g IS NULL THEN 0 ELSE 1 END seen
       |      FROM te LEFT JOIN tr USING (g))
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       |  CAST(sum(seen) AS BIGINT) AS n_seen,
       |  CAST(1000 * sum(seen) AS BIGINT) // count(*) AS leak_milli
       |FROM j GROUP BY doc_id""".stripMargin
  }

  // Deliberately BRUTE FORCE (all pairs, no gram blocking): the oracle
  // must not replay the engine's candidate generation, or the
  // cross-engine hash gate is structurally blind to recall loss. The
  // entity catalog is vocabulary-sized, so all-pairs is affordable in
  // the oracle even though the engine never does it.
  private val fuzzyJoinSql =
    s"""WITH g AS (SELECT name, list_distinct(list_transform(
       |        range(1, len(name) - ${FuzzyQ - 2}),
       |        i -> substr(name, CAST(i AS INTEGER), $FuzzyQ))) AS gs
       |      FROM (SELECT DISTINCT p_name AS name FROM part
       |            WHERE len(p_name) >= $FuzzyQ)),
       |f AS (SELECT a.name AS name_a, b.name AS name_b,
       |        len(list_intersect(a.gs, b.gs)) AS n_shared_grams,
       |        levenshtein(a.name, b.name) AS dist
       |      FROM g a JOIN g b ON a.name < b.name)
       |SELECT name_a, name_b, CAST(n_shared_grams AS BIGINT) AS n_shared_grams,
       |  dist
       |FROM f WHERE dist <= $FuzzyMaxDist""".stripMargin

  // est_ok is asserted as literal truth: the engine computed the
  // verdict in-plan against the exact union; a sketch outside the
  // bound emits 0 there and fails this hash
  private val sketchUnionSql =
    s"""WITH w AS (SELECT source, $sqlWords ws FROM documents),
       |s AS (SELECT DISTINCT source, h FROM (
       |    SELECT source, unnest(list_transform(
       |        list_transform(range(1, len(ws)-1),
       |          i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]),
       |        g -> ${sqlHash60("g")})) AS h
       |    FROM w WHERE len(ws) >= 3)),
       |c AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM s GROUP BY 1),
       |i AS (SELECT a.source sa, b.source sb, CAST(count(*) AS BIGINT) AS xi
       |      FROM s a JOIN s b ON a.h = b.h AND a.source < b.source
       |      GROUP BY 1, 2),
       |p AS (SELECT x.source source_a, y.source source_b, x.n n_a, y.n n_b
       |      FROM c x JOIN c y ON x.source < y.source)
       |SELECT source_a, source_b, n_a, n_b,
       |  coalesce(xi, 0) AS exact_inter,
       |  n_a + n_b - coalesce(xi, 0) AS exact_union,
       |  CAST(1 AS INTEGER) AS est_ok
       |FROM p LEFT JOIN i ON source_a = i.sa AND source_b = i.sb""".stripMargin

  // brute-force ground truth: hash equality proves the prefix filter
  // loses no pair (the exactness claim), corpus-wide, every round
  private val prefixJoinSql =
    s"""$sqlShingles,
       |p AS (SELECT a.doc_id doc_a, b.doc_id doc_b,
       |        CAST(len(list_intersect(a.hsh, b.hsh)) AS BIGINT) i,
       |        len(a.hsh) na, len(b.hsh) nb
       |      FROM d a JOIN d b ON a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, CAST(i AS DOUBLE)/(na + nb - i) AS jaccard
       |FROM p WHERE CAST(i AS DOUBLE)/(na + nb - i) >= $PrefixT""".stripMargin

  // est_ok asserted as literal truth — q134's contract pattern: the
  // in-plan verdict fails the hash if the round-tripped merge drifts
  private val sketchIncrementSql =
    s"""WITH w AS (SELECT source, $sqlWords ws FROM documents),
       |s AS (SELECT DISTINCT source, h FROM (
       |    SELECT source, unnest(list_transform(
       |        list_transform(range(1, len(ws)-1),
       |          i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]),
       |        g -> ${sqlHash60("g")})) AS h
       |    FROM w WHERE len(ws) >= 3))
       |SELECT source, CAST(count(*) AS BIGINT) AS exact_n,
       |  CAST(1 AS INTEGER) AS est_ok
       |FROM s GROUP BY source""".stripMargin

  // Full sketch REPLICATION, not just a pinned verdict: KMV is pure
  // integer arithmetic over md5-derived hashes, so the oracle rebuilds
  // the identical bottom-k sets and the identical estimate — a drifted
  // merge or estimator changes est_milli and fails the hash directly.
  private val kmvJaccardSql =
    s"""WITH w AS (SELECT source, $sqlWords ws FROM documents),
       |s AS (SELECT DISTINCT source, h FROM (
       |    SELECT source, unnest(list_transform(
       |        list_transform(range(1, len(ws)-1),
       |          i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]),
       |        g -> ${sqlHash60("g")})) AS h
       |    FROM w WHERE len(ws) >= 3)),
       |km AS (SELECT source, list_sort(list(h)) kl FROM (
       |    SELECT source, h FROM s
       |    QUALIFY row_number() OVER (PARTITION BY source ORDER BY h)
       |      <= $KmvK) GROUP BY source),
       |cnt AS (SELECT source, CAST(count(*) AS BIGINT) n FROM s
       |        GROUP BY source),
       |c AS (SELECT km.source, km.kl, cnt.n FROM km
       |      JOIN cnt ON km.source = cnt.source),
       |i AS (SELECT a.source sa, b.source sb, CAST(count(*) AS BIGINT) xi
       |      FROM s a JOIN s b ON a.h = b.h AND a.source < b.source
       |      GROUP BY 1, 2),
       |p AS (SELECT x.source source_a, y.source source_b, x.n n_a, y.n n_b,
       |        list_slice(list_sort(list_distinct(list_concat(x.kl, y.kl))),
       |          1, $KmvK) u,
       |        list_intersect(x.kl, y.kl) xb
       |      FROM c x JOIN c y ON x.source < y.source),
       |e AS (SELECT source_a, source_b, n_a, n_b,
       |        CAST(len(u) AS BIGINT) kp,
       |        CAST(len(list_intersect(u, xb)) AS BIGINT) n_both
       |      FROM p)
       |SELECT source_a, source_b, n_a, n_b,
       |  coalesce(xi, 0) AS exact_inter,
       |  CAST((1000 * n_both) // kp AS BIGINT) AS est_milli,
       |  CAST((1000 * coalesce(xi, 0)) //
       |    (n_a + n_b - coalesce(xi, 0)) AS BIGINT) AS exact_milli,
       |  CAST(1 AS INTEGER) AS est_ok
       |FROM e LEFT JOIN i ON source_a = i.sa AND source_b = i.sb""".stripMargin

  // q127's brute pairs (verbatim), a recursive-CTE closure (the q54
  // oracle discipline), then canonical election + survivorship — the
  // composed gate reuses each part's standalone oracle so they cannot
  // drift
  private val goldenRecordSql =
    s"""WITH RECURSIVE
       |p AS (SELECT name_a, name_b FROM (@FUZZY@)),
       |nm AS (SELECT DISTINCT p_name AS name FROM part
       |       WHERE len(p_name) >= $FuzzyQ),
       |e AS (SELECT name_a s, name_b d FROM p
       |      UNION ALL SELECT name_b, name_a FROM p),
       |reach(node, label) AS (
       |  SELECT name, name FROM nm
       |  UNION
       |  SELECT e.d, r.label FROM reach r JOIN e ON e.s = r.node),
       |lab AS (SELECT node, min(label) lbl FROM reach GROUP BY node),
       |canon AS (SELECT lbl, min(node) AS canonical,
       |          CAST(count(*) AS BIGINT) AS n_names FROM lab GROUP BY lbl),
       |r AS (SELECT pr.*, c.canonical, c.n_names FROM part pr
       |      JOIN lab ON pr.p_name = lab.node
       |      JOIN canon c ON lab.lbl = c.lbl),
       |br AS (SELECT canonical, p_brand, count(*) bc FROM r GROUP BY 1, 2),
       |bw AS (SELECT canonical, p_brand AS brand FROM (
       |    SELECT *, row_number() OVER (PARTITION BY canonical
       |      ORDER BY bc DESC, p_brand DESC) rn FROM br) WHERE rn = 1),
       |agg AS (SELECT canonical, n_names, CAST(count(*) AS BIGINT) n_records,
       |    max(CAST(round(p_retailprice * 100, 0) AS BIGINT)) max_price_cents,
       |    min(p_size) min_size, max(p_size) max_size
       |  FROM r GROUP BY 1, 2)
       |SELECT agg.canonical, agg.n_names, agg.n_records, bw.brand,
       |  agg.max_price_cents, agg.min_size, agg.max_size
       |FROM agg JOIN bw USING (canonical)""".stripMargin
      .replace("@FUZZY@", fuzzyJoinSql)

  // the q58 verdict, q121 split rule, and q138 exact-side replayed as
  // one composition — each CTE verbatim from its standalone oracle so
  // the composed gate can never drift from the parts
  private val nightlyDropSql =
    s"""WITH v AS (@INC@),
       |acc AS (SELECT d.doc_id, d.source, d.text FROM documents d
       |        JOIN v ON v.doc_id = d.doc_id AND v.verdict = 'new'),
       |sp AS (SELECT source,
       |         CASE WHEN ${Curation.splitBucketSql}
       |                < ${Curation.SplitTrainMilli} THEN 'train'
       |              WHEN ${Curation.splitBucketSql}
       |                < ${Curation.SplitValMilli} THEN 'val'
       |              ELSE 'test' END AS split,
       |         len($sqlWords) AS n_tokens
       |       FROM acc),
       |ps AS (SELECT source, split, count(*) AS n_docs,
       |         CAST(sum(n_tokens) AS BIGINT) AS n_tokens
       |       FROM sp GROUP BY source, split),
       |ex AS (@EX@)
       |SELECT ps.source, ps.split, ps.n_docs, ps.n_tokens,
       |  ex.exact_n, ex.est_ok
       |FROM ps JOIN ex ON ps.source = ex.source""".stripMargin
      // placeholders spliced AFTER stripMargin: the embedded oracles
      // contain `||` continuation lines a second margin strip would eat
      .replace("@INC@", incrementalSql)
      .replace("@EX@", sketchIncrementSql)

  // positional 20-gram hashes -> dup filter -> the q126 island sweep
  // per doc, replayed with the same window arithmetic
  private val dupSpansSql =
    s"""WITH w AS (SELECT doc_id, $sqlWords ws FROM documents),
       |d AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens, ws
       |      FROM w WHERE len(ws) >= $DupSpanN),
       |g AS (SELECT doc_id, unnest(range(1, len(ws) - ${DupSpanN - 2})) AS i,
       |        ws FROM d),
       |h AS (SELECT doc_id, i - 1 AS pos,
       |        ${sqlHash60(s"array_to_string(list_slice(ws, i, i + ${DupSpanN - 1}), ' ')")} AS h
       |      FROM g),
       |dup AS (SELECT h FROM h GROUP BY h HAVING count(*) >= 2),
       |iv AS (SELECT doc_id, pos AS s, pos + $DupSpanN AS e
       |       FROM h JOIN dup USING (h)),
       |m AS (SELECT *, max(e) OVER (PARTITION BY doc_id ORDER BY s
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |        AS prev_max FROM iv),
       |f AS (SELECT *, CASE WHEN prev_max IS NULL OR s > prev_max
       |        THEN 1 ELSE 0 END AS ni FROM m),
       |s2 AS (SELECT *, sum(ni) OVER (PARTITION BY doc_id
       |         ORDER BY s ROWS UNBOUNDED PRECEDING) AS island FROM f),
       |isl AS (SELECT doc_id, island, min(s) AS gs, max(e) AS ge
       |        FROM s2 GROUP BY doc_id, island),
       |cov AS (SELECT doc_id, count(*) AS n_islands,
       |          sum(ge - gs) AS covered FROM isl GROUP BY doc_id)
       |SELECT d.doc_id, d.n_tokens,
       |  CAST(coalesce(cov.n_islands, 0) AS BIGINT) AS dup_islands,
       |  CAST(coalesce(cov.covered, 0) AS BIGINT) AS dup_tokens,
       |  CAST(coalesce(cov.covered, 0) * 1000 // d.n_tokens AS BIGINT)
       |    AS dup_milli
       |FROM d LEFT JOIN cov USING (doc_id)""".stripMargin

  // q197: q143's span CTEs plus the canonical election (lexicographic
  // tuple min, the engine's min(struct) twin); only non-canonical
  // occurrences become cut intervals, then the same island merge
  private val spanSurgerySql =
    s"""WITH w AS (SELECT doc_id, $sqlWords ws FROM documents),
       |d AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens, ws
       |      FROM w WHERE len(ws) >= $DupSpanN),
       |g AS (SELECT doc_id, unnest(range(1, len(ws) - ${DupSpanN - 2})) AS i,
       |        ws FROM d),
       |h AS (SELECT doc_id, i - 1 AS pos,
       |        ${sqlHash60(s"array_to_string(list_slice(ws, i, i + ${DupSpanN - 1}), ' ')")} AS h
       |      FROM g),
       |own AS (SELECT h, min((doc_id, pos)) AS own FROM h
       |        GROUP BY h HAVING count(*) >= 2),
       |iv AS (SELECT doc_id, pos AS s, pos + $DupSpanN AS e
       |       FROM h JOIN own USING (h) WHERE (doc_id, pos) <> own),
       |m AS (SELECT *, max(e) OVER (PARTITION BY doc_id ORDER BY s
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |        AS prev_max FROM iv),
       |f AS (SELECT *, CASE WHEN prev_max IS NULL OR s > prev_max
       |        THEN 1 ELSE 0 END AS ni FROM m),
       |s2 AS (SELECT *, sum(ni) OVER (PARTITION BY doc_id
       |         ORDER BY s ROWS UNBOUNDED PRECEDING) AS island FROM f),
       |isl AS (SELECT doc_id, island, min(s) AS gs, max(e) AS ge
       |        FROM s2 GROUP BY doc_id, island),
       |cov AS (SELECT doc_id, sum(ge - gs) AS covered FROM isl
       |        GROUP BY doc_id)
       |SELECT d.doc_id, d.n_tokens,
       |  CAST(coalesce(cov.covered, 0) AS BIGINT) AS cut_tokens,
       |  CAST(d.n_tokens - coalesce(cov.covered, 0) AS BIGINT)
       |    AS kept_tokens,
       |  CAST(coalesce(cov.covered, 0) * 1000 // d.n_tokens AS BIGINT)
       |    AS cut_milli
       |FROM d LEFT JOIN cov USING (doc_id)""".stripMargin

  // q198: the q22 bucket expression spliced whole, the q14 exact-dup
  // grouping and the q15 pair set inlined as membership flags
  private val qualityDupSql =
    s"""WITH q AS (SELECT doc_id, quality_bucket
       |           FROM (${TextAnalysis.qualitySql})),
       |eh AS (SELECT md5(text) AS content_hash FROM documents
       |       GROUP BY 1 HAVING count(*) >= 2),
       |e AS (SELECT doc_id, 1 AS is_exact FROM documents
       |      JOIN eh ON md5(text) = content_hash),
       |pr AS (SELECT doc_a, doc_b FROM (@PAIRS@)),
       |n AS (SELECT DISTINCT doc_id, 1 AS is_near FROM (
       |        SELECT doc_a AS doc_id FROM pr
       |        UNION ALL SELECT doc_b FROM pr) u)
       |SELECT quality_bucket, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(coalesce(is_exact, 0)) AS BIGINT) AS n_exact_dup,
       |  CAST(sum(coalesce(is_near, 0)) AS BIGINT) AS n_near_dup,
       |  (1000 * CAST(sum(coalesce(is_exact, 0)) AS BIGINT))
       |    // CAST(count(*) AS BIGINT) AS exact_milli,
       |  (1000 * CAST(sum(coalesce(is_near, 0)) AS BIGINT))
       |    // CAST(count(*) AS BIGINT) AS near_milli
       |FROM q LEFT JOIN e USING (doc_id) LEFT JOIN n USING (doc_id)
       |GROUP BY quality_bucket""".stripMargin
      .replace("@PAIRS@", minhashSql)

  private val snmSql =
    s"""WITH w AS (SELECT doc_id, substr(text, 1, $SnmKeyLen) skey,
       |        $sqlWords ws FROM documents),
       |d AS (SELECT doc_id, skey, list_sort(list_distinct(list_transform(
       |        list_transform(range(1, len(ws)-1),
       |          i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]),
       |        s -> ${sqlHash60("s")}))) hsh
       |      FROM w WHERE len(ws) >= 3),
       |r AS (SELECT doc_id, hsh,
       |        row_number() OVER (ORDER BY skey, doc_id) rn FROM d),
       |j AS (SELECT a.doc_id doc_a, b.doc_id doc_b, b.rn - a.rn gap,
       |        len(list_intersect(a.hsh, b.hsh)) i,
       |        len(a.hsh) la, len(b.hsh) lb
       |      FROM r a JOIN r b ON b.rn - a.rn BETWEEN 1 AND $SnmWindow)
       |SELECT doc_a, doc_b, CAST(gap AS BIGINT) AS gap,
       |  CAST(i AS DOUBLE)/(la+lb-i) AS jaccard
       |FROM j WHERE CAST(i AS DOUBLE)/(la+lb-i) >= 0.5""".stripMargin

  val oracle: Map[String, String] = Map(
    "q145_sorted_neighborhood" -> snmSql,
    "q143_dup_spans" -> dupSpansSql,
    "q140_nightly_drop" -> nightlyDropSql,
    "q168_modal_agreement" -> modalAgreementSql,
    "q165_cluster_elect" -> clusterElectSql,
    "q176_pref_pairs" -> prefPairsSql,
    "q177_minhash_calibration" -> minhashCalibrationSql,
    "q160_golden_record" -> goldenRecordSql,
    "q151_kmv_jaccard" -> kmvJaccardSql,
    "q138_sketch_increment" -> sketchIncrementSql,
    "q137_prefix_join" -> prefixJoinSql,
    "q134_sketch_union" -> sketchUnionSql,
    "q127_fuzzy_join" -> fuzzyJoinSql,
    "q96_split_leakage" -> splitLeakageSql,
    "q190_cross_source_dups" -> crossSourceDupsSql,
    "q191_soft_dedup" -> softDedupSql,
    "q194_eval_decontam" -> evalDecontamSql,
    "q197_span_surgery" -> spanSurgerySql,
    "q198_quality_dup_calibration" -> qualityDupSql,
    "q202_cluster_sharding" -> clusterShardingSql,
    "q178_ngram_leakage" -> ngramLeakageSql,
    "q95_cdc_chunks" -> cdcChunkSql,
    "q54_dup_clusters" -> clustersSql,
    "q91_clusters_converged" -> clustersSql,
    "q58_dedup_incremental" -> incrementalSql,
    "q14_dedup_exact" ->
      ("SELECT md5(text) AS content_hash, min(doc_id) AS keep_doc_id, " +
        "count(*) AS n_copies FROM documents GROUP BY md5(text)"),
    "q15_dedup_minhash" -> minhashSql,
    "q16_dedup_simhash" -> simhashSql,
    "q17_dedup_ngram" -> ngramSql,
    "q18_dedup_embed" -> embedSql,
    "q66_chunk_dedup" -> chunkSql)
}
