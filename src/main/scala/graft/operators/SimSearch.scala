package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable._
import graft.operators.Checkpoints._
import graft.sources.Tables

/** Approximate-nearest-neighbour search over `embeddings.embedding`
  * (`array<float>`): brute-force cosine top-k as the exact baseline and
  * a sign-LSH bucketed variant as the scale path.
  *
  * Scale shape: the query set is SMALL (it's the thing being searched
  * for) and is explicitly `broadcast` — the corpus never shuffles. The
  * LSH variant additionally prunes the corpus scan to band-key matches,
  * turning top-k from corpus×queries into Σ bucket-hits. Cosine uses
  * the exact milli-quantised integer dot/norms from
  * [[graft.functions.Portable]] so the DuckDB oracle matches exactly.
  */
object SimSearch {

  private val K = 3 // neighbours returned per query
  private val NQ = 8 // query vectors: vec_id < NQ

  private def base(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), qvec(col("embedding")).as("qv"))
      .withColumn("n2", norm2(col("qv")))

  /** q19: brute-force cosine top-k — every corpus vector scored against
    * every (broadcast) query vector, per-query top-3 via row_number.
    * The window has NQ partitions: fine for a bounded query set; a huge
    * query set would use the salted two-phase top-k of q10 instead.
    */
  def annBrute(spark: SparkSession, dir: String): DataFrame = {
    val e = base(spark, dir)
    val q = e.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("q_id"), col("qv").as("qqv"), col("n2").as("qn2"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        cosineq(dotq(col("qqv"), col("qv")), col("qn2"), col("n2")).as("cosine"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= K)
      .select(col("q_id"), col("rnk"), col("vec_id"), col("cosine"))
  }

  /** q99: brute-force top-K via the TYPED TOP-K AGGREGATOR
    * ([[graft.functions.TopKScored]]) instead of a per-query window —
    * the same exact scoring as q19, but ranked by a bounded
    * partial-aggregating heap: each map task ships at most K rows per
    * query to the shuffle (the window form shuffles EVERY candidate,
    * then sorts each group before cutting). Same result by
    * construction (identical IEEE cosine, identical tie-break), so
    * q19's oracle hash-checks the aggregator; at 100 TB this shape is
    * how "top-k per key" composes into any aggregation without a
    * group-wide sort.
    */
  def annTopkAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = base(spark, dir)
    val q = e.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("q_id"), col("qv").as("qqv"),
        col("n2").as("qn2"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        // null cosine (a zero-norm vector) rides the heap as −∞: the
        // typed Aggregator can't hold nulls, but (−score, id) ordering
        // over −∞ IS q19's `cosine DESC NULLS LAST, vec_id` — so a
        // query with < K finite candidates emits the same null-cosine
        // tail rows as the window form, instead of silently fewer rows
        // (−∞ can't collide with a real cosine: the range is [−1, 1])
        coalesce(
          cosineq(dotq(col("qqv"), col("qv")), col("qn2"), col("n2")),
          lit(Double.NegativeInfinity)).as("cosine"))
      .as[(Long, Long, Double)]
    scored.groupByKey(_._1)
      .agg(new graft.functions.TopKScored(K).toColumn.name("top"))
      .toDF("q_id", "top")
      .select(col("q_id"), posexplode(col("top")).as(Seq("i", "s")))
      .select(col("q_id"), (col("i") + 1).as("rnk"),
        col("s._1").as("vec_id"),
        when(col("s._2") === Double.NegativeInfinity,
          lit(null).cast("double")).otherwise(col("s._2")).as("cosine"))
  }

  /** Shared exact re-rank tail for the bucketed ANN variants: join the
    * (q_id, vec_id) candidate pairs back onto the quantised features
    * (query side broadcast), exact integer cosine, per-query top-K.
    */
  private def rerank(feat0: DataFrame, cand: DataFrame): DataFrame = {
    val feat = feat0.select(col("vec_id"), col("qv"), col("n2"))
    val qfeat = feat.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("q_id"), col("qv").as("qqv"), col("n2").as("qn2"))
    val scored = cand
      .join(feat, "vec_id")
      .join(broadcast(qfeat), "q_id")
      .select(col("q_id"), col("vec_id"),
        cosineq(dotq(col("qqv"), col("qv")), col("qn2"), col("n2")).as("cosine"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= K)
      .select(col("q_id"), col("rnk"), col("vec_id"), col("cosine"))
  }

  private val SigBits = 32 // sign bits in the LSH signature
  private val Bands = 8 // bands of 4 bits each

  /** 32-bit sign signature of the quantised vector, as a '0'/'1' string.
    * 8 bands × 4 bits was chosen from a measured recall/scan sweep at
    * sf0.01 (recall@3 in milli vs fraction of corpus scanned):
    * 4×4 → 458 @ 0.23, 8×4 → 791 @ 0.41, 6×3 → 833 @ 0.54,
    * 8×2 → 1000 @ 0.89. 8×4 crosses the 0.75 recall mark while still
    * pruning ~60% of the corpus — the knee of the curve on this
    * weakly-clustered corpus (neighbour cosines ≈ 0.3).
    */
  private def sigBits(qv: Column): Column =
    array_join(transform(sequence(lit(1), lit(SigBits)), i =>
      when(element_at(qv, i) > 0, "1").otherwise("0")), "")

  /** band keys: 8 bands × 4 sign bits. */
  private def bandKeys(sig: Column): Column =
    transform(sequence(lit(0), lit(Bands - 1)), b =>
      concat_ws(":", b, sig.substr(b * 4 + 1, lit(4))))

  /** q20: sign-LSH bucketed ANN — candidates are corpus vectors sharing
    * at least one 4-bit sign band with the query (multi-probe OR),
    * then exact top-3 among candidates. The band join replaces the full
    * corpus scan per query; recall is the documented LSH trade-off and
    * the oracle implements the identical bucketing.
    */
  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    // lazy checkpoint: the featurized corpus (qvec + norm + signature)
    // feeds the corpus bands, the query bands AND the re-rank join —
    // compute it once per action instead of once per branch (the
    // Dedup.scala signature-sharing pattern)
    val e = base(spark, dir).withColumn("sig", sigBits(col("qv")))
      .cp()
    val corpusBands = e.select(col("vec_id"),
      explode(bandKeys(col("sig"))).as("bkey"))
    val queryBands = e.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("q_id"), explode(bandKeys(col("sig"))).as("bkey"))
    val cand = corpusBands.join(broadcast(queryBands), "bkey")
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"))
      .distinct()
    rerank(e, cand)
  }

  private val MatDims = 32 // q125 coarse-stage prefix dims (of 64)
  // coarse candidates per query: from a measured recall@3 sweep at
  // sf0.01 (q45 audits it every round) — C=40 → 708 milli, C=80 → 875,
  // matching IVF-PQ's recall while stage 2 still touches only
  // C/corpus of the full-width vectors
  private val MatC = 80

  /** q125: MATRYOSHKA TWO-STAGE ANN — coarse search over the leading
    * [[MatDims]]-dim PREFIX of each embedding (half the bytes per
    * distance), exact full-dim re-rank over the per-query top-[[MatC]]
    * survivors. This is the retrieval pattern matryoshka-trained
    * embeddings exist for: stage 1 scans cheap truncated vectors
    * (at 100 TB: half the scan bytes and FLOPs of q19, or the IVF/PQ
    * variants run directly on the prefix), stage 2 touches full
    * vectors only for candidates·queries rows. Prefix slicing is
    * row-local (`slice`), the integer dot/norm discipline is
    * unchanged, so the oracle replays both stages exactly.
    */
  def annMatryoshka(spark: SparkSession, dir: String): DataFrame = {
    val e = base(spark, dir)
      .withColumn("qvh", slice(col("qv"), 1, MatDims))
      .withColumn("n2h", norm2(col("qvh")))
      .cp() // feeds coarse scan AND re-rank
    val q = e.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("q_id"), col("qvh").as("qqvh"),
        col("n2h").as("qn2h"))
    val coarse = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        cosineq(dotq(col("qqvh"), col("qvh")), col("qn2h"), col("n2h"))
          .as("ccos"))
    val wc = Window.partitionBy(col("q_id"))
      .orderBy(col("ccos").desc, col("vec_id").asc)
    val cand = coarse.withColumn("crnk", row_number().over(wc))
      .filter(col("crnk") <= MatC)
      .select(col("q_id"), col("vec_id"))
    rerank(e, cand)
  }

  private val NCells = 16 // IVF coarse-quantizer cells
  private val NProbe = 4 // cells probed per query (prunes 3/4 of corpus)

  private val KmK = 8 // k-means clusters (q59's reported clustering)
  private val KmIters = 2 // unrolled Lloyd iterations

  /** Squared L2 distance from exactly-computed integers:
    * ||x-c||² = n2x − 2·x·c + n2c.
    */
  private def dist2(qv: Column, n2: Column, cqv: Column, cn2: Column): Column =
    n2 - lit(2L) * dotq(qv, cqv) + cn2

  /** [[KmIters]] Lloyd rounds at `k` cells over the featurized corpus
    * `e` (seeds = vectors 0..k-1) — the shared trainer behind q59's
    * clustering AND q34's coarse quantizer. Exact integer math
    * throughout (see [[kmeansEmbed]]); each round's K-row centroid
    * table is checkpointed so the lazy plan stays linear.
    */
  private def kmSeeds(e: DataFrame, k: Int): DataFrame =
    e.filter(col("vec_id") < k)
      .select(col("vec_id").cast("int").as("cell"),
        col("qv").as("cqv"), col("n2").as("cn2"))

  /** One Lloyd round: argmin assignment against the broadcast K-row
    * centroid table, then exact floor(sum/count) centroid update. The
    * K-row result is checkpointed so downstream consumers (and the
    * next round) don't re-run the assign/update chain.
    */
  private def lloydRound(e: DataFrame, cent: DataFrame): DataFrame = {
    val assigned = e.crossJoin(broadcast(cent))
      .withColumn("d2", dist2(col("qv"), col("n2"), col("cqv"), col("cn2")))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("cell"), col("qv"))).as("w"))
      .select(col("w.cell").as("cell"), col("w.qv").as("qv"))
    assigned
      .select(col("cell"), posexplode(col("qv")).as(Seq("pos", "v")))
      .groupBy(col("cell"), col("pos"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .withColumn("cv", expr("(s - ((s % n) + n) % n) DIV n"))
      .groupBy(col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cv")))),
        p => p.getField("cv")).as("cqv"))
      .withColumn("cn2", norm2(col("cqv")))
      .cp()
  }

  private def trainCentroids(e: DataFrame, k: Int): DataFrame =
    trainedAfter(e, k, KmIters)

  /** One TRAINED centroid table per (JVM, sf dir, k), eagerly
    * checkpointed at first use: q34, q59, q68, q85 (and q45 through
    * the q34 path) all consume the IDENTICAL deterministic training
    * (seeds + [[KmIters]] exact integer Lloyd rounds over the same
    * corpus), so the multi-pass training cost is paid once per session
    * instead of once per query invocation — the Sink fixture pattern
    * applied to a derived K-row artifact. Results are bit-identical to
    * per-query training by construction, so every oracle hash is
    * unchanged. Keys include the SparkContext's applicationId:
    * localCheckpoint blocks are BOUND to the context that built them,
    * so a cached plan must never outlive its context (a same-JVM
    * session restart would otherwise serve dangling checkpoints).
    */
  private val centFixtures =
    scala.collection.concurrent.TrieMap.empty[(String, String, Int), DataFrame]
  private val centLock = new Object

  /** Drop cache entries built by a DEAD SparkContext (their plans
    * reference checkpoint blocks that died with it) — called under
    * [[centLock]] on every fixture insert, so a JVM that cycles
    * sessions holds at most one application's worth of cached plans
    * instead of accumulating stranded plan trees forever.
    */
  private def evictStale[K, V](m: scala.collection.concurrent.TrieMap[K, V],
      appOf: K => String, liveApp: String): Unit =
    m.keysIterator.filter(appOf(_) != liveApp).toList.foreach(m.remove)

  private[graft] def centroidFixture(spark: SparkSession, dir: String,
      k: Int): DataFrame =
    centLock.synchronized {
      val app = spark.sparkContext.applicationId
      evictStale(centFixtures, (k: (String, String, Int)) => k._1, app)
      centFixtures.getOrElseUpdate((app, dir, k),
        trainCentroids(featurized(spark, dir), k)
          .cp(eager = true))
    }

  /** Build every shared trained artifact eagerly (centroids at both
    * K's, PQ codebooks, IVF-PQ residual codebooks) — the Bench prelude
    * runs this UNTIMED so each query's first timed run measures the
    * query, not whichever shared fixture it happened to touch first.
    */
  def warmFixtures(spark: SparkSession, dir: String): Unit = {
    centroidFixture(spark, dir, KmK)
    pqBookFixture(spark, dir)
    ivfPqBooks(spark, dir) // builds the NCells centroids too
    ()
  }

  /** Seeds + exactly `rounds` Lloyd rounds — the unroll at a given
    * depth (spec hook for proving loop ≡ unroll). */
  private[graft] def trainedAfter(e: DataFrame, k: Int, rounds: Int): DataFrame = {
    var cent = kmSeeds(e, k)
    for (_ <- 1 to rounds) cent = lloydRound(e, cent)
    cent
  }

  private[graft] def featurized(spark: SparkSession, dir: String): DataFrame =
    base(spark, dir).cp()

  /** PRODUCTION fixpoint variant of [[trainCentroids]]: iterate
    * [[lloydRound]] until the K-row centroid table is bit-identical
    * round over round (a driver-side check on K tiny rows — the
    * "driver-loop with a cheap convergence test" the unrolled
    * [[KmIters]] stand-in documents), failing LOUDLY after `maxIters`
    * instead of silently emitting an unconverged clustering. Returns
    * the centroids and the number of rounds run; SimSearch's spec
    * proves loop-until-converged ≡ the unroll at the same depth.
    */
  def trainCentroidsConverged(spark: SparkSession, dir: String, k: Int,
      maxIters: Int = 32): (DataFrame, Int) = {
    val e = featurized(spark, dir)
    def snap(c: DataFrame): Seq[(Int, Seq[Long])] =
      c.collect().map(r => (r.getInt(0), r.getSeq[Long](1))).toSeq.sortBy(_._1)
    var cent = lloydRound(e, kmSeeds(e, k))
    var prev = snap(cent)
    var iters = 1
    var done = false
    while (!done && iters < maxIters) {
      cent = lloydRound(e, cent)
      val cur = snap(cent)
      done = cur == prev
      prev = cur
      iters += 1
    }
    if (!done)
      throw new IllegalStateException(
        s"k-means did not converge within $maxIters Lloyd rounds")
    (cent, iters)
  }

  /** q34: IVF ANN with a TRAINED coarse quantizer — [[NCells]] k-means
    * centroids ([[trainCentroids]], the promised swap-in for the
    * earlier deterministic ±1 stand-in): corpus vectors are assigned to
    * their nearest centroid (the inverted lists), queries probe their
    * [[NProbe]] nearest cells, exact cosine re-rank on the probed
    * lists only. The DuckDB oracle replays the training bit-for-bit
    * (exact integer Lloyd), so the whole train→assign→probe→re-rank
    * pipeline is hash-checked.
    *
    * Scale shape: training cost is [[KmIters]]+1 corpus passes, each a
    * K-row centroid broadcast + row-local argmin folded into map-side
    * partials (no corpus×corpus anything); the probe is an equi-join
    * on cell id; re-rank touches the probed lists only. Versus q20's
    * LSH: cells PARTITION the corpus (each vector in exactly one
    * list — storage ∝ N), while LSH replicates per band (storage ∝
    * N·bands); recall comes from probing more cells, not more bands.
    *
    * Measured (sf0.01, recall@3 milli vs corpus fraction scanned):
    * trained 4/16 probes → **958 @ 0.26**, vs the previous untrained
    * ±1 pattern's 500 @ 0.29 and sign-LSH's 791 @ 0.41 — training the
    * quantizer nearly doubled recall while scanning LESS of the
    * corpus, refuting the earlier "data-bound ceiling" reading: the
    * corpus does cluster, the untrained projections just couldn't see
    * it. q45 re-measures per round.
    */
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    // shared across training, the corpus lists, the probes and the
    // re-rank join (see annLsh)
    val e = base(spark, dir).cp()
    val cent = centroidFixture(spark, dir, NCells)
    val scored = e.crossJoin(broadcast(cent))
      .withColumn("d2", dist2(col("qv"), col("n2"), col("cqv"), col("cn2")))
    val corpus = scored.groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("cell"))).as("w"))
      .select(col("vec_id"), col("w.cell").as("cell"))
    val queryProbes = scored.filter(col("vec_id") < NQ)
      .withColumn("rn", row_number().over(Window.partitionBy(col("vec_id"))
        .orderBy(col("d2"), col("cell"))))
      .filter(col("rn") <= NProbe)
      .select(col("vec_id").as("q_id"), col("cell"))
    val cand = corpus
      .join(broadcast(queryProbes), "cell")
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"))
      .distinct()
    rerank(e, cand)
  }

  /** q59: K-MEANS over the quantised embeddings — the trained coarse
    * quantizer q34's IVF is designed to consume (its scaladoc documents
    * the deterministic ±1 pattern as the untrained stand-in). Lloyd's
    * algorithm, made engine-portable and exactly integer:
    * seeds = vectors 0..K-1, squared-L2 assignment with (dist², cell)
    * tie-break, centroid update = element-wise FLOOR(sum/count) via the
    * sign-portable remainder identity `(s - ((s%n)+n)%n) DIV n` (Spark
    * DIV truncates, DuckDB // floors; on the exactly-divisible numerator
    * both yield the true quotient). [[KmIters]] iterations unrolled so
    * the query stays one lazy plan; a production run loops
    * assign/update with a driver-side convergence test.
    *
    * Scale shape per iteration: assignment is a broadcast of K
    * centroids + a row-local argmin folded into a map-side-partial
    * `min(struct(...))` groupBy (shuffle = one row per vector);
    * the update shuffles (cell, dim) partial sums — K×64 groups, a few
    * KB at any corpus size. Empty cells simply drop out (both engines
    * agree); k-means++-style reseeding is a policy layer, not a plan
    * change. Output: per-cell membership and exact integer inertia.
    */
  def kmeansEmbed(spark: SparkSession, dir: String): DataFrame = {
    val e = base(spark, dir).cp()
    val cent = centroidFixture(spark, dir, KmK)
    e.crossJoin(broadcast(cent))
      .withColumn("d2", dist2(col("qv"), col("n2"), col("cqv"), col("cn2")))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("cell"))).as("w"))
      .groupBy(col("w.cell").as("cell"))
      .agg(count(lit(1)).as("n_members"), sum(col("w.d2")).as("inertia"))
  }

  private val SemThr = 0.4 // within-cell cosine above which the
  // higher-id vector is a semantic duplicate (data-calibrated like
  // q18's 0.35; the planted near-dups sit well above it)

  /** q68: SEMANTIC DEDUP — SemDeDup (Abbas et al. 2023): cluster the
    * embedding corpus with the q59 k-means quantizer, then remove,
    * WITHIN each cell only, every vector that has a lower-id neighbour
    * above [[SemThr]] cosine. The cells turn the N² near-dup search
    * into Σ|cell|² — the same candidate-pruning role they play for
    * q34's IVF probe, reused for curation; cross-cell near-dups are
    * the accepted miss (the paper's trade), and the keep-lowest-id
    * rule is order-free and deterministic, so both engines agree
    * without any iterative clustering.
    *
    * Scale shape: training + assignment are the q59 passes (broadcast
    * K centroids, map-side argmin); the pair generation is an
    * equi-self-join on cell id — at 100 TB you raise K so max|cell|
    * stays bounded (K ∝ N keeps Σ|cell|² ≈ N·|cell|), which is a
    * config change, not a plan change. Output is one row per corpus
    * vector with its cell and removal verdict.
    */
  def semanticDedup(spark: SparkSession, dir: String): DataFrame = {
    val e = base(spark, dir).cp()
    val cent = centroidFixture(spark, dir, KmK)
    val feat = e.crossJoin(broadcast(cent))
      .withColumn("d2", dist2(col("qv"), col("n2"), col("cqv"), col("cn2")))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("cell"), col("qv"), col("n2"))).as("w"))
      .select(col("vec_id"), col("w.cell").as("cell"),
        col("w.qv").as("qv"), col("w.n2").as("n2"))
      .cp()
    val dup = feat.as("a").join(feat.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .filter(cosineq(dotq(col("a.qv"), col("b.qv")),
        col("a.n2"), col("b.n2")) >= SemThr)
      .select(col("b.vec_id").as("vec_id")).distinct()
      .withColumn("removed", lit(true))
    feat.join(dup, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        coalesce(col("removed"), lit(false)).as("removed"))
  }

  private val QuotaK = 24 // per-cell diversity quota

  /** q180: CLUSTER-BALANCED DIVERSITY SAMPLE — cap every semantic
    * region at [[QuotaK]] vectors: assign each vector to its nearest
    * q59 centroid (q68's cells), then keep a deterministic per-cell
    * quota by salted-hash priority. Where q68 removes near-DUPLICATES
    * within a cell and q159 balances LABELS, this flattens semantic
    * DENSITY — the over-represented topic contributes the same sample
    * budget as the rare one, the embedding-space analog of q175's
    * per-language temperature flattening (and the cheap version of the
    * facility-location selection the data-pruning literature ends at).
    * Hash priorities (not distance ranks) make the sample unbiased
    * WITHIN each cell and append-stable: re-running after a corpus
    * grow only swaps members whose priorities beat the incumbents.
    *
    * Scale: assignment is q34's broadcast-argmin (row-local, map-side
    * partials); selection is the q159 bounded-heap Aggregator — at
    * most [[QuotaK]] rows per cell leave each map task, so the shuffle
    * carries cells×K rows no matter the corpus size. No windows, no
    * per-cell sorts.
    */
  def cellQuotaSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = base(spark, dir).cp()
    val cent = centroidFixture(spark, dir, KmK)
    val asg = e.crossJoin(broadcast(cent))
      .withColumn("d2", dist2(col("qv"), col("n2"), col("cqv"), col("cn2")))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("cell"))).as("w"))
      .select(col("vec_id"), col("w.cell").as("cell"))
    asg
      .withColumn("pri", graft.functions.HashOps.md5_prefix60(
        concat(lit("quota:"), col("vec_id").cast("string"))))
      .select(col("cell").cast("long"), col("pri"), col("vec_id"), lit(0L))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .agg(new graft.functions.BottomKRanked(QuotaK).toColumn.name("top"))
      .toDF("cell", "top")
      .select(col("cell").cast("int").as("cell"),
        posexplode(col("top")).as(Seq("i", "s")))
      .select(col("cell"), (col("i") + 1).as("rnk"),
        col("s._2").as("vec_id"), col("s._1").as("pri"))
  }

  /** q85: FILTERED vector search — top-K under a metadata predicate
    * (here: even labels only), the production shape where ANN meets a
    * WHERE clause. Strategy is FILTER-THEN-PROBE over the trained IVF:
    * the inverted lists are pre-filtered by the predicate BEFORE the
    * probe join, so candidate generation scans only qualifying
    * vectors — the correct-recall ordering (probe-then-filter can
    * return < K when a probed cell is predicate-sparse; filtering
    * first keeps the per-cell candidate flow full). Queries probe the
    * same NProbe cells as q34; the exact re-rank runs on filtered
    * candidates only. At 100 TB the predicate typically reaches the
    * list storage as a pushed filter (a label-partitioned list table),
    * which this plan's shape — filter directly on the scan side of the
    * probe join — is exactly positioned to exploit.
    */
  def annFiltered(spark: SparkSession, dir: String): DataFrame = {
    val e0 = Tables.embeddings(spark, dir)
      .select(col("vec_id"), qvec(col("embedding")).as("qv"), col("label"))
      .withColumn("n2", norm2(col("qv")))
      .cp()
    val e = e0.select(col("vec_id"), col("qv"), col("n2"))
    val cent = centroidFixture(spark, dir, NCells)
    val scored = e0.crossJoin(broadcast(cent))
      .withColumn("d2", dist2(col("qv"), col("n2"), col("cqv"), col("cn2")))
    // (d2, cell) is unique per vector, so carrying label through the
    // argmin struct can never perturb the tie-break
    val corpus = scored.groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("cell"), col("label"))).as("w"))
      .select(col("vec_id"), col("w.cell").as("cell"), col("w.label").as("label"))
      .filter(col("label") % 2 === 0)
    val queryProbes = scored.filter(col("vec_id") < NQ)
      .withColumn("rn", row_number().over(Window.partitionBy(col("vec_id"))
        .orderBy(col("d2"), col("cell"))))
      .filter(col("rn") <= NProbe)
      .select(col("vec_id").as("q_id"), col("cell"))
    val cand = corpus
      .join(broadcast(queryProbes), "cell")
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"))
      .distinct()
    rerank(e, cand)
  }

  private val PqM = 4 // subspaces (64 dims → 4 × 16)
  private val PqDs = 16 // dims per subspace
  private val PqKs = 16 // centroids per subspace codebook
  private val PqIters = 1 // Lloyd rounds per codebook
  private val PqShort = 32 // ADC shortlist size fed to the exact re-rank

  /** Per-subspace codebooks: seeds = subvectors of vectors
    * 0..[[PqKs]]-1, then [[PqIters]] Lloyd rounds — the q59 trainer
    * keyed by (m, cell) so all [[PqM]] codebooks train in the same
    * passes. Exact integer math; the (M·Ks)-row codebook table is
    * checkpointed and broadcast everywhere it is used.
    */
  private def pqCodebooks(subs: DataFrame): DataFrame = {
    var cent = subs.filter(col("vec_id") < PqKs)
      .select(col("m"), col("vec_id").cast("int").as("cell"),
        col("sqv").as("cqv"), col("sn2").as("cn2"))
    for (_ <- 1 to PqIters) {
      val assigned = subs.join(broadcast(cent), "m")
        .withColumn("d2", dist2(col("sqv"), col("sn2"), col("cqv"), col("cn2")))
        .groupBy(col("vec_id"), col("m"))
        .agg(min(struct(col("d2"), col("cell"), col("sqv"))).as("w"))
        .select(col("m"), col("w.cell").as("cell"), col("w.sqv").as("sqv"))
      cent = assigned
        .select(col("m"), col("cell"), posexplode(col("sqv")).as(Seq("pos", "v")))
        .groupBy(col("m"), col("cell"), col("pos"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .withColumn("cv", expr("(s - ((s % n) + n) % n) DIV n"))
        .groupBy(col("m"), col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("cv")))),
          p => p.getField("cv")).as("cqv"))
        .withColumn("cn2", norm2(col("cqv")))
        .cp()
    }
    cent
  }

  /** q78: PRODUCT-QUANTIZATION ANN — the memory-scale path of the ANN
    * family (brute q19 → LSH q20 → IVF q34 → PQ): each vector is
    * stored as [[PqM]] one-byte codes (its nearest codebook centroid
    * per subspace), and queries score the WHOLE corpus from those
    * codes alone via asymmetric distance computation (ADC): adist =
    * Σ_m d²(query subvector, codebook[m][code_m]) — at 100 TB the
    * scored representation is M bytes/vector instead of 4·dims, the
    * difference between a corpus that fits executor memory and one
    * that doesn't. The ADC shortlist (top [[PqShort]] by approximate
    * distance) is then re-ranked with the exact integer cosine —
    * standard IVF-PQ practice, and it makes the whole pipeline
    * hash-checkable: train → encode → ADC → re-rank replays in DuckDB.
    *
    * Measured (sf0.01, recall@3 milli, q45): 4×16-centroid codebooks
    * with shortlist 16, 24, 32 → 583, 666, 750 (shipped); 8 subspaces of 8 dims
    * → 541 (worse — per-subspace resolution matters more than subspace
    * count on this corpus); 4-centroid codebooks → 166 (toy). The
    * shipped 750 @ 32-of-N-rescored sits between LSH's 791 (which
    * re-scores ~40% of the corpus) and IVF's 958 (whole vectors in
    * memory) — PQ's niche is the memory budget, not the recall crown.
    *
    * Scale shape: training/encoding are the q59 passes keyed by (m,
    * cell) — broadcast (M·Ks)-row codebook, map-side argmin; ADC is a
    * broadcast join of the per-query distance table (NQ·M·Ks rows)
    * onto the code table (N·M rows) + a (q, vec) sum — shuffle rows ∝
    * N·NQ like every per-query scorer here, but each row is a few
    * longs, not a vector. The window top-[[PqShort]] partitions per
    * query (bounded NQ; the q10 salted two-phase replaces it for huge
    * query sets).
    */
  /** PQ codebooks share the same once-per-session discipline as
    * [[centroidFixture]]: q78 and q45's PQ leg train identically.
    */
  private val pqBookFixtures =
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]
  private def pqBookFixture(spark: SparkSession, dir: String): DataFrame =
    centLock.synchronized {
      val app = spark.sparkContext.applicationId
      evictStale(pqBookFixtures, (k: (String, String)) => k._1, app)
      pqBookFixtures.getOrElseUpdate((app, dir),
        pqCodebooks(subsOf(featurized(spark, dir)))
          .cp(eager = true))
    }

  def annPq(spark: SparkSession, dir: String): DataFrame = {
    val e = base(spark, dir).cp()
    val subs = subsOf(e).cp()
    val books = pqBookFixture(spark, dir)
    val codes = subs.join(broadcast(books), "m")
      .withColumn("d2", dist2(col("sqv"), col("sn2"), col("cqv"), col("cn2")))
      .groupBy(col("vec_id"), col("m"))
      .agg(min(struct(col("d2"), col("cell"))).as("w"))
      .select(col("vec_id"), col("m"), col("w.cell").as("cell"))
    val qdt = subs.filter(col("vec_id") < NQ)
      .join(broadcast(books), "m")
      .select(col("vec_id").as("q_id"), col("m"), col("cell"),
        dist2(col("sqv"), col("sn2"), col("cqv"), col("cn2")).as("d2"))
    val adist = codes.join(broadcast(qdt), Seq("m", "cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("d2")).as("adist"))
    val short = adist
      .withColumn("rn", row_number().over(Window.partitionBy(col("q_id"))
        .orderBy(col("adist").asc, col("vec_id").asc)))
      .filter(col("rn") <= PqShort)
      .select(col("q_id"), col("vec_id"))
    rerank(e, short)
  }

  /** Subvector split of an arbitrary (keys..., qv) frame — the single
    * [[PqM]]×[[PqDs]] subspace-layout kernel behind corpus encoding, q97's
    * residual split, and the query-side distance tables. `keys` are
    * the passenger columns carried through the explode (vector id by
    * default; (q_id, cell) for per-probe query residuals).
    */
  private def subsOf(v: DataFrame,
      keys: Seq[String] = Seq("vec_id")): DataFrame =
    v.select(keys.map(col) :+
        explode(sequence(lit(0), lit(PqM - 1))).as("m") :+ col("qv"): _*)
      .select(keys.map(col) :+ col("m") :+
        slice(col("qv"), col("m") * PqDs + 1, lit(PqDs)).as("sqv"): _*)
      .withColumn("sn2", norm2(col("sqv")))

  /** q97's residual codebooks, once per session (see
    * [[centroidFixture]]): trained on the corpus residuals against the
    * q34 coarse quantizer — deterministic, so shared across q97 and
    * q45's ivfpq leg.
    */
  private val ivfPqBookFixtures =
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]
  private def ivfPqBooksPlan(spark: SparkSession, dir: String): DataFrame = {
    val e = featurized(spark, dir)
    val cent = centroidFixture(spark, dir, NCells)
    val assigned = e.crossJoin(broadcast(cent))
      .withColumn("d2", dist2(col("qv"), col("n2"), col("cqv"), col("cn2")))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("cell"), col("qv"))).as("w"))
      .select(col("vec_id"), col("w.cell").as("cell"), col("w.qv").as("qv"))
    val resid = assigned.join(broadcast(cent), "cell")
      .select(col("vec_id"),
        zip_with(col("qv"), col("cqv"), (a, b) => a - b).as("qv"))
    pqCodebooks(subsOf(resid))
  }
  private def ivfPqBooks(spark: SparkSession, dir: String): DataFrame =
    centLock.synchronized {
      val app = spark.sparkContext.applicationId
      evictStale(ivfPqBookFixtures, (k: (String, String)) => k._1, app)
      ivfPqBookFixtures.getOrElseUpdate((app, dir),
        ivfPqBooksPlan(spark, dir).cp(eager = true))
    }

  /** Audit hook: the UN-checkpointed build pipelines of every shared
    * trained artifact, so SCALE.md can count their shuffles on their
    * own `fixture:*` rows (amortized once per corpus) instead of
    * inlining training into every consumer's row.
    */
  private[graft] def fixturePlans(spark: SparkSession,
      dir: String): Seq[(String, DataFrame)] = Seq(
    s"fixture:centroids_k$KmK" -> trainCentroids(featurized(spark, dir), KmK),
    s"fixture:centroids_k$NCells" ->
      trainCentroids(featurized(spark, dir), NCells),
    "fixture:pq_codebooks" -> pqCodebooks(subsOf(featurized(spark, dir))),
    "fixture:ivfpq_residual_books" -> ivfPqBooksPlan(spark, dir),
    "q173:calibration" -> int8CalPlan(spark, dir))

  /** q97: IVF-PQ with RESIDUAL codebooks — the production ANN shape
    * (FAISS `IVFx,PQy`): vectors assign to a trained coarse cell
    * (q34's quantizer), and PQ codes encode the RESIDUAL against the
    * cell centroid instead of the raw vector — residuals concentrate
    * near zero, so the same [[PqKs]]-centroid budget spends its
    * resolution where the data actually is, and the probe restricts
    * ADC scoring to the [[NProbe]] probed cells' lists (q78 scores the
    * whole corpus). Per probed (query, cell) pair the query re-centers
    * against THAT cell before building its distance table — the
    * asymmetric-distance trick that makes residual coding work.
    * Training, encoding, probing and re-rank all replay exactly in
    * DuckDB (integer math end to end).
    *
    * Scale: storage is M bytes + a cell id per vector (the PQ memory
    * story) while scoring touches probed lists only (the IVF I/O
    * story) — the combination is what a billion-vector deployment
    * actually runs. Shapes: broadcast K-row/(M·Ks)-row tables,
    * map-side argmins, one (cell, m, code) equi-join for ADC.
    *
    * Measured (sf0.01, recall@3 milli, q45): ivfpq 875 — above
    * raw-vector PQ's 750 while ADC-scoring only ~0.26 of the corpus
    * (q78 scores ALL of it), below in-memory IVF's 958 (whole vectors,
    * no 4-byte codes): exactly the memory/recall/IO middle ground the
    * shape exists for. Residual coding is worth +125 recall milli over
    * raw-vector PQ at a quarter of the scoring work.
    */
  def annIvfPq(spark: SparkSession, dir: String): DataFrame = {
    val e = base(spark, dir).cp()
    val cent = centroidFixture(spark, dir, NCells)
    val scored = e.crossJoin(broadcast(cent))
      .withColumn("d2", dist2(col("qv"), col("n2"), col("cqv"), col("cn2")))
    val assigned = scored.groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("cell"), col("qv"))).as("w"))
      .select(col("vec_id"), col("w.cell").as("cell"), col("w.qv").as("qv"))
      .cp()
    val books = ivfPqBooks(spark, dir)
      .select(col("m"), col("cell").as("code"), col("cqv"), col("cn2"))
    // encode: residual vs the assigned centroid, nearest book code per m
    val resid = assigned.join(broadcast(cent), "cell")
      .select(col("vec_id"), col("cell"),
        zip_with(col("qv"), col("cqv"), (a, b) => a - b).as("qv"))
    val codes = subsOf(resid.select(col("vec_id"), col("qv")))
      .join(broadcast(books), "m")
      .withColumn("d2", dist2(col("sqv"), col("sn2"), col("cqv"), col("cn2")))
      .groupBy(col("vec_id"), col("m"))
      .agg(min(struct(col("d2"), col("code"))).as("w"))
      .select(col("vec_id"), col("m"), col("w.code").as("code"))
      .join(assigned.select(col("vec_id"), col("cell")), "vec_id")
    // probe: NProbe nearest coarse cells per query (q34's probes)
    val queryProbes = scored.filter(col("vec_id") < NQ)
      .withColumn("rn", row_number().over(Window.partitionBy(col("vec_id"))
        .orderBy(col("d2"), col("cell"))))
      .filter(col("rn") <= NProbe)
      .select(col("vec_id").as("q_id"), col("cell"))
    // per probed (query, cell): re-center the query against THAT cell,
    // then its subspace distance table over the residual codebooks
    val qresid = queryProbes
      .join(e.filter(col("vec_id") < NQ)
        .select(col("vec_id").as("q_id"), col("qv")), "q_id")
      .join(broadcast(cent), "cell")
      .select(col("q_id"), col("cell"),
        zip_with(col("qv"), col("cqv"), (a, b) => a - b).as("qv"))
    val qdt = subsOf(qresid, keys = Seq("q_id", "cell"))
      .join(broadcast(books), "m")
      .select(col("q_id"), col("cell"), col("m"), col("code"),
        dist2(col("sqv"), col("sn2"), col("cqv"), col("cn2")).as("d2"))
    // ADC over probed lists only: codes match qdt on (cell, m, code)
    val adist = codes.join(broadcast(qdt), Seq("cell", "m", "code"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("d2")).as("adist"))
    val short = adist
      .withColumn("rn", row_number().over(Window.partitionBy(col("q_id"))
        .orderBy(col("adist").asc, col("vec_id").asc)))
      .filter(col("rn") <= PqShort)
      .select(col("q_id"), col("vec_id"))
    rerank(e, short)
  }

  /** q115: INCREMENTAL IVF MAINTENANCE — the index operation a live
    * vector store runs continuously: new arrivals (here the vec_id %
    * 10 == 9 decile) are assigned to the EXISTING coarse cells — one
    * broadcast-argmin pass over only the increment, the q58 increment
    * discipline applied to the ANN index — while the quantizer trained
    * on the base corpus stays frozen. Output per cell: base list
    * size, arrival count, and the arrivals' summed assignment dist²
    * (the drift signal: a cell whose arrivals sit far from its
    * centroid is the retrain trigger). No all-corpus retrain, no
    * all-pairs anything; at 100 TB the increment pass touches
    * |arrivals| rows against a broadcast K-row table.
    */
  def ivfIncrement(spark: SparkSession, dir: String): DataFrame = {
    val all = base(spark, dir).cp()
    val baseSet = all.filter(col("vec_id") % 10 =!= 9)
    val newSet = all.filter(col("vec_id") % 10 === 9)
    // frozen quantizer: trained on the BASE corpus only (seeds = base
    // ids < NCells), deliberately NOT the shared full-corpus fixture
    val cent = trainCentroids(baseSet, NCells)
    def assign(v: DataFrame): DataFrame = v.crossJoin(broadcast(cent))
      .withColumn("d2", dist2(col("qv"), col("n2"), col("cqv"), col("cn2")))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("cell"))).as("w"))
    val b = assign(baseSet)
      .groupBy(col("w.cell").as("cell"))
      .agg(count(lit(1)).as("n_base"))
    val a = assign(newSet)
      .groupBy(col("w.cell").as("cell"))
      .agg(count(lit(1)).as("n_new"), sum(col("w.d2")).as("drift_d2"))
    b.join(a, Seq("cell"), "full_outer")
      .select(col("cell"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("drift_d2"), lit(0L)).as("drift_d2"))
  }

  /** q45: recall@K of the approximate variants against the exact
    * brute-force top-K — the accuracy/cost trade-off measured inside
    * the engine itself. Exact integer recall (`hits*1000 DIV total`)
    * so the oracle hash-matches.
    */
  def annRecall(spark: SparkSession, dir: String): DataFrame = {
    // lazy checkpoint: the brute-force top-K computes once on first
    // action and is shared by all three consumers below — no job runs
    // at query-build time (the q33 tfidf discipline)
    val b = annBrute(spark, dir).select(col("q_id"), col("vec_id"))
      .cp()
    // total in-plan as a broadcast 1-row aggregate instead of a
    // driver-side count()
    val tot = b.agg(count(lit(1)).as("n_brute"))
    def row(method: String, approx: DataFrame): DataFrame =
      approx.select(col("q_id"), col("vec_id"))
        .join(b, Seq("q_id", "vec_id"), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
        .transform(withScalar(_, tot))
        .select(lit(method).as("method"), col("n_hits"), col("n_brute"),
          expr("n_hits * 1000 DIV n_brute").as("recall_milli"))
    row("ivf", annIvf(spark, dir))
      .unionByName(row("lsh", annLsh(spark, dir)))
      .unionByName(row("pq", annPq(spark, dir)))
      .unionByName(row("ivfpq", annIvfPq(spark, dir)))
      .unionByName(row("matryoshka", annMatryoshka(spark, dir)))
  }

  /** q205: FILTERED-SEARCH RECALL — closes q85's loop the way q45
    * closes the unfiltered ladder's: truth is the EXACT brute top-K
    * over only the predicate-qualifying corpus (filter-then-score),
    * the approximate side is q85's filter-then-probe IVF, and the
    * output is one recall row. This is the number a production
    * filtered-vector-search deployment tunes NProbe against: a
    * predicate empties some probed cells, so filtered recall sits
    * below the unfiltered q45 figure unless probes widen — measuring
    * it is how you notice.
    *
    * Scale: the truth side is q19's broadcast-query brute scan
    * narrowed by the predicate; the hit test is one left-semi join on
    * two K·NQ-row frames; totals are 1-row broadcast aggregates.
    */
  def annFilteredRecall(spark: SparkSession, dir: String): DataFrame = {
    val e0 = Tables.embeddings(spark, dir)
      .select(col("vec_id"), qvec(col("embedding")).as("qv"), col("label"))
      .withColumn("n2", norm2(col("qv")))
      .cp()
    val q = e0.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("q_id"), col("qv").as("qqv"),
        col("n2").as("qn2"))
    val truth = e0.filter(col("label") % 2 === 0)
      .join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        cosineq(dotq(col("qqv"), col("qv")), col("qn2"), col("n2"))
          .as("cosine"))
      .withColumn("rnk", row_number().over(Window.partitionBy(col("q_id"))
        .orderBy(col("cosine").desc, col("vec_id").asc)))
      .filter(col("rnk") <= K)
      .select(col("q_id"), col("vec_id"))
      .cp()
    val tot = truth.agg(count(lit(1)).as("n_truth"))
    annFiltered(spark, dir).select(col("q_id"), col("vec_id"))
      .join(truth, Seq("q_id", "vec_id"), "left_semi")
      .agg(count(lit(1)).as("n_hits"))
      .transform(withScalar(_, tot))
      .select(lit("ivf_filtered").as("method"), col("n_hits"),
        col("n_truth"),
        expr("n_hits * 1000 DIV n_truth").as("recall_milli"))
  }

  // q209 adaptive-probe knobs: widen until the qualifying candidate
  // pool reaches the floor (or the cap), never below the static base
  private val CandFloor = 80L
  private val MaxProbe = 12

  /** q209: ADAPTIVE PROBE WIDENING for filtered search — the
    * self-tuning step q205's audit motivates: a selective predicate
    * empties probed cells, and a STATIC NProbe silently under-recalls
    * until a human reads the recall row. Here each query widens its
    * own probe list down the cell-distance ranking until the
    * PREDICATE-QUALIFYING candidate pool reaches [[CandFloor]]
    * (admission mirrors the byte-budget stream rule: cells are taken
    * while the pool so far is under the floor, so the crossing cell is
    * included), bounded by [[MaxProbe]] and never below the static
    * [[NProbe]] base. The pool arithmetic needs no data I/O beyond
    * what q85 already plans: per-cell qualifying counts are the
    * inverted-list LENGTHS (metadata a deployed index keeps next to
    * the lists), joined to the per-query cell ranking and prefix-
    * summed in a bounded window (NQ × [[NCells]] rows). Output is
    * q85's top-K shape plus the per-query `n_probes` actually used —
    * the tuning loop's telemetry.
    *
    * Scale: counts are one [[NCells]]-group aggregate over the
    * assignment q85 computes anyway; the widening window is bounded
    * by queries × cells; candidate generation stays a probed
    * equi-join, never all-pairs. The oracle replays the widened probe
    * set exactly (the q85 chain-replay discipline).
    */
  def annFilteredAdaptive(spark: SparkSession, dir: String): DataFrame = {
    val e0 = Tables.embeddings(spark, dir)
      .select(col("vec_id"), qvec(col("embedding")).as("qv"), col("label"))
      .withColumn("n2", norm2(col("qv")))
      .cp()
    adaptiveFiltered(e0, centroidFixture(spark, dir, NCells),
      col("label") % 2 === 0, CandFloor, MaxProbe)
  }

  /** The q209 kernel over explicit features/centroids/predicate —
    * exposed so the spec can construct a geometry where the static
    * probe demonstrably returns nothing and the adaptive one recovers
    * the true neighbours. `floor = 0` degenerates to q85's static
    * probing (the admission clause never fires past the base).
    */
  private[graft] def adaptiveFiltered(e0: DataFrame, cent: DataFrame,
      pred: Column, floor: Long, cap: Int): DataFrame = {
    val e = e0.select(col("vec_id"), col("qv"), col("n2"))
    val scored = e0.crossJoin(broadcast(cent))
      .withColumn("d2", dist2(col("qv"), col("n2"), col("cqv"), col("cn2")))
    val corpus = scored.groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("cell"), col("label"))).as("w"))
      .select(col("vec_id"), col("w.cell").as("cell"),
        col("w.label").as("label"))
      .filter(pred)
    val counts = corpus.groupBy(col("cell")).agg(count(lit(1)).as("n"))
    val ranked = scored.filter(col("vec_id") < NQ)
      .withColumn("rn", row_number().over(Window.partitionBy(col("vec_id"))
        .orderBy(col("d2"), col("cell"))))
      .select(col("vec_id").as("q_id"), col("cell"), col("rn"))
    val widened = ranked
      .join(broadcast(counts), Seq("cell"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("cum", sum(col("n")).over(Window.partitionBy(col("q_id"))
        .orderBy(col("rn"))))
      .filter(col("rn") <= cap &&
        (col("rn") <= NProbe || col("cum") - col("n") < floor))
    val probesUsed = widened.groupBy(col("q_id"))
      .agg(max(col("rn")).as("n_probes"))
    val cand = corpus
      .join(broadcast(widened.select(col("q_id"), col("cell"))), "cell")
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"))
      .distinct()
    rerank(e, cand).join(broadcast(probesUsed), "q_id")
      .select(col("q_id"), col("rnk"), col("vec_id"), col("cosine"),
        col("n_probes"))
  }

  private val CoresetK = 10 // representatives kept per label

  /** q159: LABEL-BALANCED CORESET — per class, the [[CoresetK]]
    * vectors closest to the class's mean embedding: the deterministic
    * class-balanced subset selection a fine-tune / eval pipeline uses
    * where a random stratified sample (q52) would over-sample
    * outliers. Centroids are the exact integer mean of the quantised
    * vectors (the q59 floored-division kernel, one exploded (label,
    * dim) sum with map-side partials); distances are exact integer d²
    * against the broadcast label-count-sized centroid table; selection
    * is the bounded-heap [[graft.functions.BottomKRanked]] Aggregator:
    * ≤ [[CoresetK]] rows per label reach the shuffle (map-side
    * partials), so per-task memory is labels×k regardless of corpus
    * size. A rank window here would be the scale-killer, NOT the
    * escape hatch: with a handful of labels each window partition is
    * |corpus|/|labels| rows, fully sorted on one task — the window
    * form is only safe when group CARDINALITY is high enough to keep
    * partitions small, the opposite of this configuration.
    * Everything is integer arithmetic, so the oracle replays centroid,
    * distance, and rank bit-for-bit (sequence order IS the rank —
    * PlanSpec pins the window-form twin bit-identical).
    */
  /** The q159 scored frame — (label, d2, vec_id) for every corpus
    * vector against its label's exact-integer centroid. Shared by the
    * shipped Aggregator selection and the spec-only window twin so
    * their bit-identity proof covers the same kernels.
    */
  private def coresetScored(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), qvec(col("embedding")).as("qv"))
      .withColumn("n2", norm2(col("qv")))
      .cp() // feeds centroid build + ranking
    val cent = e.select(col("label"), posexplode(col("qv")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .withColumn("cv", expr("(s - ((s % n) + n) % n) DIV n"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cv")))),
        p => p.getField("cv")).as("cqv"))
      .withColumn("cn2", norm2(col("cqv")))
    e.join(broadcast(cent), "label")
      .withColumn("d2",
        col("n2") - lit(2L) * dotq(col("qv"), col("cqv")) + col("cn2"))
      .select(col("label"), col("d2"), col("vec_id"))
  }

  def labelCoreset(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    coresetScored(spark, dir)
      .select(col("label").cast("long"), col("d2"), col("vec_id"), lit(0L))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .agg(new graft.functions.BottomKRanked(CoresetK).toColumn.name("top"))
      .toDF("label", "top")
      .select(col("label").cast("int").as("label"),
        posexplode(col("top")).as(Seq("i", "s")))
      .select(col("label"), (col("i") + 1).as("rnk"),
        col("s._2").as("vec_id"), col("s._1").as("d2"))
  }

  /** Spec-only rank-window twin of [[labelCoreset]]'s selection — the
    * shape the Aggregator replaced (corpus-sized per-label sort
    * partitions when labels are few); PlanSpec proves the two
    * bit-identical over the same scored frame.
    */
  private[graft] def labelCoresetWindowForm(spark: SparkSession,
      dir: String): DataFrame = {
    val w = Window.partitionBy(col("label"))
      .orderBy(col("d2").asc, col("vec_id").asc)
    coresetScored(spark, dir)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= CoresetK)
      .select(col("label"), col("rnk"), col("vec_id"), col("d2"))
  }

  private val SrpBits = 256 // signature width
  private val SrpDim = 64 // embedding dimensionality (driver testdata)

  /** Driver-side md5-prefix60 — the Scala twin of
    * [[graft.functions.Portable.hash60]] for plan-CONSTANT inputs (the
    * SRP projection matrix), so the deterministic ±1 matrix can be
    * embedded as a literal instead of 16k md5 calls per row. The
    * oracle recomputes the same matrix with SQL md5 — the hash gate
    * cross-checks this helper against DuckDB every round.
    */
  private def hash60Local(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(8).map(b => f"${b & 0xff}%02x").mkString.take(15), 16)
  }

  /** The ±1 Rademacher projection matrix, derived from the shared md5
    * hash (row b, dim d ← parity of hash60("srp:b:d")) — deterministic,
    * data-independent, identical in both engines — PACKED one 64-bit
    * mask per projection row (bit i set ⟺ dim i+1 projects +1). The
    * plan embeds [[SrpBits]] long literals and unpacks signs in-plan
    * (`shiftright`/AND — codegen integer ops), instead of a
    * [[SrpBits]]×[[SrpDim]] = 16,384-element nested array literal:
    * same signatures bit-for-bit, 64× smaller plan tree (the unpacked
    * literal measurably taxed full-sweep analysis/codegen caches).
    * PipelineSpec ("q161 packed SRP masks decode to the md5-parity
    * matrix") pins mask↔parity agreement against [[hash60Local]].
    */
  private[graft] lazy val srpMasks: Seq[Long] =
    (0 until SrpBits).map { b =>
      (0 until SrpDim).foldLeft(0L) { (m, i) =>
        if (hash60Local(s"srp:$b:${i + 1}") % 2 == 0) m | (1L << i) else m
      }
    }

  /** Parity of hash60("srp:b:d") — exposed for the mask-agreement spec. */
  private[graft] def srpSignAt(b: Int, d: Int): Long =
    if (hash60Local(s"srp:$b:$d") % 2 == 0) 1L else -1L

  /** q161: SIGNED-RANDOM-PROJECTION SIGNATURES for embeddings — the
    * embedding-side sibling of q16's text SimHash (Charikar's SRP:
    * sign of a ±1 projection preserves angles; hamming distance over
    * [[SrpBits]] bits estimates cosine). Signatures are 256 bits = 32
    * bytes/vector vs 256 float bytes — the compressed serving tier a
    * billion-vector dedup/retrieval layer actually stores, with the
    * same banding trick as q20 for candidate generation. This query
    * audits the ESTIMATOR on a bounded sample: per (query, sampled
    * corpus vector) pair, the hamming distance, the integer linear
    * estimate `1000 − 2000·h DIV B` (the 1−2h/B small-angle form —
    * deliberately trig-free so both engines compute identical
    * integers), and the exact cosine for comparison. Everything from
    * the projection matrix (md5-parity Rademacher — a plan literal
    * here, recomputed via SQL md5 in the oracle) to the signature bits
    * is integer-exact, so the hash gate pins the whole signature
    * pipeline, not a statistical verdict.
    *
    * Scale: signatures are row-local (one codegen span over the
    * scan); the pair audit broadcasts the bounded query set (q19's
    * allow-listed discipline). Production candidate generation bands
    * the signature (q20), never brute-forces hamming.
    */
  def srpSignatures(spark: SparkSession, dir: String): DataFrame = {
    val masks = typedLit(srpMasks)
    // sign of dim i+1 under projection row m: 2·bit(m, i) − 1 ∈ {−1, 1}
    def srpSign(m: Column, i: Column): Column =
      call_function("shiftright", m, i).bitwiseAND(lit(1L)) * lit(2L) - lit(1L)
    // Guard the hardcoded projection width: a corpus whose embedding
    // dimensionality drifts from SrpDim would otherwise null-propagate
    // through zip_with (bit=0) while the oracle's list_sum skips
    // nulls — surfacing only as an opaque hash mismatch. Fail loudly
    // in-plan instead.
    val sample = Tables.embeddings(spark, dir)
      .filter(col("vec_id") < NQ || col("vec_id") % 7 === 3)
      .select(col("vec_id"), qvec(col("embedding")).as("qv"))
      .withColumn("qv", when(size(col("qv")) === SrpDim, col("qv"))
        .otherwise(raise_error(concat(
          lit(s"q161: SRP matrix is $SrpDim-wide but embedding has "),
          size(col("qv")).cast("string"), lit(" dims")))))
      .withColumn("n2", norm2(col("qv")))
      .withColumn("sig", transform(sequence(lit(0), lit(SrpBits - 1)), b =>
        when(aggregate(
          zip_with(col("qv"), sequence(lit(0), lit(SrpDim - 1)), (v, d) =>
            v * srpSign(element_at(masks, b + 1), d)),
          lit(0L), (acc, x) => acc + x) >= 0, 1).otherwise(0)))
      .cp() // both sides of the pair audit
    val q = sample.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("q_id"), col("qv").as("qqv"),
        col("n2").as("qn2"), col("sig").as("qsig"))
    sample.filter(col("vec_id") % 7 === 3)
      .join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("hamming", size(filter(
        zip_with(col("sig"), col("qsig"), (a, b) => a =!= b), x => x))
        .cast("long"))
      .withColumn("est_milli",
        lit(1000L) - expr(s"(2000 * hamming) DIV $SrpBits"))
      .select(col("q_id"), col("vec_id"), col("hamming"), col("est_milli"),
        cosineq(dotq(col("qqv"), col("qv")), col("qn2"), col("n2"))
          .as("cosine"))
  }

  /** q173: INT8 QUANTIZATION CALIBRATION — per-dimension affine int8
    * compression of the embedding corpus with an exact reconstruction-
    * error report: calibrate `(min, span)` per dimension over the
    * milli-quantised corpus, encode every value to
    * `q8 = (v−mn)·255 DIV span` ∈ [0, 255], decode back, and return
    * each vector's total/max absolute error — the audit a serving tier
    * runs before switching its 4×-smaller int8 index on (the scalar-
    * quantization sibling of q78's product quantization: PQ compresses
    * by codebook, SQ by per-dim affine range). All arithmetic is
    * integer (the DIVs truncate non-negative operands), so the oracle
    * replays calibration, round trip, and error bit-for-bit.
    *
    * Scale: calibration is ONE dim-keyed aggregate (DIM groups,
    * map-side partials) collected to a DIM-row literal (the K-row
    * centroid discipline — bounded by the embedding width, never the
    * corpus); encode/decode/error is then a row-local indexed
    * `transform` over the scan — zero shuffles besides the DIM-group
    * agg, no per-row join, nothing corpus-sized ever moves.
    */
  /** q173's calibration pipeline — split out because it executes at
    * query construction (a DIM-row collect, the centroid-literal
    * discipline), so the query's own audit row shows the shuffle-free
    * encode frame; this plan is counted on its `q173:calibration`
    * row.
    */
  private def int8CalPlan(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(posexplode(qvec(col("embedding"))).as(Seq("pos", "v")))
      .groupBy(col("pos"))
      .agg(min(col("v")).as("mn"),
        greatest(max(col("v")) - min(col("v")), lit(1L)).as("span"))

  def int8Quant(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), qvec(col("embedding")).as("qv"))
    val cal = int8CalPlan(spark, dir)
      .orderBy(col("pos")).collect() // DIM rows — bounded, corpus-free
    val mnA = typedLit(cal.map(_.getLong(1)).toSeq)
    val spA = typedLit(cal.map(_.getLong(2)).toSeq)
    // integer division via double divide + trunc: operands are
    // non-negative and < 2^31, exact in double, trunc ≡ floor ≡ DIV
    def idiv(a: Column, b: Column): Column = (a / b).cast("long")
    val errs = transform(col("qv"), (v, i) => {
      val mn = element_at(mnA, i + 1)
      val span = element_at(spA, i + 1)
      val q8 = idiv((v - mn) * lit(255L), span)
      abs(v - (mn + idiv(q8 * span, lit(255L))))
    })
    e.select(col("vec_id"), errs.as("errs"))
      .select(col("vec_id"),
        aggregate(col("errs"), lit(0L), (acc, x) => acc + x)
          .as("sum_abs_err"),
        array_max(col("errs")).as("max_abs_err"),
        size(col("errs")).cast("long").as("n_dims"))
  }

  private val NegK = 5 // negatives drawn per anchor

  /** q167: DETERMINISTIC NEGATIVE SAMPLING — per anchor vector, [[NegK]]
    * uniform negatives from OTHER classes, drawn by salted-hash
    * priority (`hash60("neg:anchor:candidate")`, smallest-k wins):
    * contrastive/triplet training needs fresh-but-reproducible
    * negatives per anchor, and `rand()` destroys reproducibility
    * across engines, runs, and retries (q52's argument, applied to
    * pair mining). The per-(anchor, candidate) salt makes draws
    * independent across anchors; APPEND-STABLE: a grown corpus only
    * swaps in new candidates whose priorities beat old ones — it
    * never reshuffles the surviving draw order.
    *
    * Scale: anchors broadcast (bounded query set, q19's discipline);
    * priorities are row-local; selection is per-anchor smallest-k via
    * the bounded-heap [[graft.functions.BottomKRanked]] Aggregator —
    * ≤ [[NegK]] survivors per anchor leave each map task, so the
    * NQ×|corpus| candidate fan-out collapses BEFORE the shuffle. The
    * rank-window form is exactly wrong here: a BOUNDED anchor set over
    * a huge corpus means each per-anchor window partition holds nearly
    * the whole corpus (NQ mega-partition sorts — bounded parallelism);
    * windows only stay safe when anchors are numerous and groups
    * correspondingly small. Mining HARD negatives instead is q34's
    * probe path (nearest other-class neighbors) — this operator is the
    * uniform baseline that every curriculum starts from.
    */
  /** The q167 candidate frame — every (anchor, other-class candidate)
    * pair with its salted-hash priority. Shared by the shipped
    * Aggregator selection and the spec-only window twin.
    */
  private def negCandidates(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables.embeddings(spark, dir).select(col("vec_id"), col("label"))
    val anchors = v.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("anchor_id"), col("label").as("a_label"))
    v.join(broadcast(anchors), col("label") =!= col("a_label"))
      .withColumn("priority", hash60(concat_ws(":", lit("neg"),
        col("anchor_id"), col("vec_id"))))
      .select(col("anchor_id"), col("priority"), col("vec_id"), col("label"))
  }

  def negSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    negCandidates(spark, dir)
      .select(col("anchor_id"), col("priority"), col("vec_id"),
        col("label").cast("long"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .agg(new graft.functions.BottomKRanked(NegK).toColumn.name("top"))
      .toDF("anchor_id", "top")
      .select(col("anchor_id"), posexplode(col("top")).as(Seq("i", "s")))
      .select(col("anchor_id"), (col("i") + 1).as("neg_rank"),
        col("s._2").as("neg_id"), col("s._3").cast("int").as("neg_label"),
        col("s._1").as("priority"))
  }

  /** Spec-only rank-window twin of [[negSample]]'s selection (the NQ
    * mega-partition-sort shape the Aggregator replaced); PlanSpec
    * proves the two bit-identical over the same candidate frame.
    */
  private[graft] def negSampleWindowForm(spark: SparkSession,
      dir: String): DataFrame =
    negCandidates(spark, dir)
      .withColumn("neg_rank", row_number().over(
        Window.partitionBy(col("anchor_id"))
          .orderBy(col("priority"), col("vec_id"))))
      .filter(col("neg_rank") <= NegK)
      .select(col("anchor_id"), col("neg_rank"), col("vec_id").as("neg_id"),
        col("label").as("neg_label"), col("priority"))

  /** q185: PER-DIMENSION VARIANCE AUDIT — the number that justifies
    * (or indicts) q125's matryoshka truncation and q173's per-corpus
    * quantization range: for each of the [[SrpDim]] embedding
    * dimensions, the exact population variance of the milli-quantised
    * values, ranked descending, with a flag for whether the dimension
    * falls inside the [[MatDims]]-wide coarse-stage prefix. A
    * matryoshka-trained embedding concentrates variance in the prefix;
    * a flat profile means prefix truncation throws away signal and the
    * coarse stage should use a projection instead.
    *
    * Exactness: variance rides the q132 power-sum form — n·Σx² − (Σx)²
    * over exact longs, never a streamed float moment (x ≤ 10³ ⇒ safe
    * to ~10⁶ vectors per the same audit; widen to decimal past that).
    *
    * Scale: ONE posexplode + ONE aggregation on the dimension id (at
    * most [[SrpDim]] groups, map-side partials); the rank window sorts
    * [[SrpDim]] rows on one partition — bounded by dimensionality, not
    * by the corpus.
    */
  def dimVariance(spark: SparkSession, dir: String): DataFrame =
    base(spark, dir)
      .select(posexplode(col("qv")).as(Seq("d", "x")))
      .groupBy(col("d"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      .withColumn("var_n", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("var_n").desc, col("d").asc)))
      .select(col("d"), col("n"), col("sx"), col("var_n"), col("rnk"),
        (col("d") < MatDims).cast("int").as("in_prefix"))

  /** q192: EMBEDDING SECOND-MOMENT (COVARIANCE) MATRIX — the exact
    * integer input to PCA / whitening / OPQ rotation decisions: for
    * every unordered dimension pair (i ≤ j) of the quantised
    * embeddings, n·Σxᵢxⱼ − Σxᵢ·Σxⱼ over exact longs (q132's power-sum
    * discipline lifted from scalars to the [[SrpDim]]² upper
    * triangle). q185 is this matrix's diagonal; the off-diagonal is
    * what tells you whether matryoshka prefixes are decorrelated
    * enough to truncate or whether retrieval wants a rotation first.
    *
    * Scale: the per-vector outer product explodes map-side, but the
    * hash aggregation's partial combine collapses everything to at
    * most dims·(dims+1)/2 groups PER TASK before the exchange — the
    * shuffle carries tasks × 2,080 rows, never corpus × 2,080. The
    * per-dimension sum table is [[SrpDim]] rows, broadcast twice.
    * Overflow: every term (the sxy accumulation, n·sxy, sxi·sxj) is
    * bounded by n²·max|x|², so the kernel carries an IN-PLAN guard
    * (q161's raise_error discipline) that refuses loudly once that
    * bound approaches Long range — a corpus too big for exact longs
    * must widen the power sums to decimal, never silently corrupt the
    * matrix behind a clean-looking hash.
    */
  def embedCovariance(spark: SparkSession, dir: String): DataFrame =
    covKernel(base(spark, dir))

  private[graft] def covKernel(e: DataFrame): DataFrame = {
    // scalar bound check: one map-side-combined agg (count + max |x|),
    // a 1-row broadcast into the output. Doubles are exact far beyond
    // the 2× headroom compared against (cov_n ≤ 2·n²·max|x|²).
    val guard = e.agg(count(lit(1)).cast("double").as("gn"),
      max(aggregate(col("qv"), lit(0L), (a, x) => greatest(a, abs(x))))
        .cast("double").as("gmax"))
    val sums = e.select(posexplode(col("qv")).as(Seq("d", "x")))
      .groupBy(col("d")).agg(sum(col("x")).as("sx"))
    e.select(posexplode(col("qv")).as(Seq("i", "xi")), col("qv"))
      .select(col("i"), col("xi"), posexplode(col("qv")).as(Seq("j", "xj")))
      .filter(col("j") >= col("i"))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n"), sum(col("xi") * col("xj")).as("sxy"))
      .join(broadcast(sums.select(col("d").as("i"), col("sx").as("sxi"))),
        "i")
      .join(broadcast(sums.select(col("d").as("j"), col("sx").as("sxj"))),
        "j")
      .crossJoin(broadcast(guard))
      .select(col("i"), col("j"), col("n"), col("sxy"),
        when(col("gn") * col("gn") * col("gmax") * col("gmax") >
            lit(Long.MaxValue.toDouble / 2),
          raise_error(lit("q192: n²·max|x|² exceeds " +
            "exact-long range — widen the power sums to decimal")))
          .otherwise(col("n") * col("sxy") - col("sxi") * col("sxj"))
          .as("cov_n"))
  }

  /** q193: IVF CELL-BALANCE AUDIT — the index-maintenance number for
    * q34/q97's coarse quantizer: per trained cell, how many corpus
    * vectors land in it and its load relative to the uniform ideal
    * (milli; 1000 = perfectly balanced, ≥ 2000 flags a cell carrying
    * over twice its share). A skewed cell makes probed searches scan
    * corpus-sized lists (the ANN equivalent of a hot shuffle
    * partition) — this audit is what schedules re-training the
    * quantizer or splitting hot cells, the same decision q112 makes
    * for joins. Empty cells surface with zero counts: they waste
    * probe budget and signal over-provisioned [[NCells]].
    *
    * Scale: ONE argmin assignment against the broadcast K-row trained
    * centroid table (shared [[centroidFixture]] — the audit measures
    * the index the queries actually probe) and a [[NCells]]-group
    * count; the scalar total rides a 1-row broadcast.
    */
  def ivfBalance(spark: SparkSession, dir: String): DataFrame = {
    val e = base(spark, dir)
    val cent = centroidFixture(spark, dir, NCells)
    val counts = e.crossJoin(broadcast(cent))
      .withColumn("d2", dist2(col("qv"), col("n2"), col("cqv"), col("cn2")))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("cell"))).as("w"))
      .select(col("w.cell").as("cell"))
      .groupBy(col("cell")).agg(count(lit(1)).as("n_vectors"))
    // both sides are K-row; the post-aggregation side has no stats, so
    // pin the broadcast rather than let it fall to a sort-merge. The
    // corpus total is a whole-frame window over the SAME K-row table —
    // bounded by NCells, and no scalar join enters the plan at all.
    cent.select(col("cell"))
      .join(broadcast(counts), Seq("cell"), "left")
      .withColumn("n_vectors", coalesce(col("n_vectors"), lit(0L)))
      .withColumn("total", sum(col("n_vectors")).over(Window.partitionBy()))
      .withColumn("balance_milli",
        expr(s"(1000 * n_vectors * $NCells) DIV total"))
      .select(col("cell"), col("n_vectors"), col("balance_milli"),
        (col("balance_milli") >= 2000L).cast("int").as("skewed"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q185_dim_variance" -> dimVariance,
    "q192_embed_covariance" -> embedCovariance,
    "q193_ivf_balance" -> ivfBalance,
    "q173_int8_quant" -> int8Quant,
    "q167_neg_sample" -> negSample,
    "q161_srp_bits" -> srpSignatures,
    "q159_label_coreset" -> labelCoreset,
    "q125_ann_matryoshka" -> annMatryoshka,
    "q115_ivf_increment" -> ivfIncrement,
    "q99_topk_agg" -> annTopkAgg,
    "q97_ann_ivfpq" -> annIvfPq,
    "q19_ann_brute" -> annBrute,
    "q20_ann_lsh" -> annLsh,
    "q34_ann_ivf" -> annIvf,
    "q45_ann_recall" -> annRecall,
    "q59_kmeans_embed" -> kmeansEmbed,
    "q68_semantic_dedup" -> semanticDedup,
    "q180_cell_quota" -> ((sp: SparkSession, d: String) => cellQuotaSample(sp, d)),
    "q78_ann_pq" -> annPq,
    "q85_ann_filtered" -> annFiltered,
    "q209_ann_adaptive" -> annFilteredAdaptive,
    "q205_filtered_recall" -> annFilteredRecall)

  private val baseSql =
    s"""WITH e AS (SELECT vec_id, $sqlQvec qv FROM embeddings),
       |n AS (SELECT vec_id, qv, ${sqlNorm2("qv")} n2 FROM e)""".stripMargin

  private val bruteSql =
    s"""$baseSql,
       |s AS (SELECT q.vec_id q_id, c.vec_id vec_id,
       |        CAST(${sqlDotq("q.qv", "c.qv")} AS DOUBLE) / sqrt(nullif(CAST(q.n2 AS DOUBLE)*CAST(c.n2 AS DOUBLE), 0.0)) cosine
       |      FROM n q JOIN n c ON q.vec_id < $NQ AND c.vec_id <> q.vec_id),
       |r AS (SELECT q_id, vec_id, cosine,
       |        row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id ASC) rnk FROM s)
       |SELECT q_id, rnk, vec_id, cosine FROM r WHERE rnk <= $K""".stripMargin

  private val matryoshkaSql =
    s"""$baseSql,
       |h AS (SELECT vec_id, qv, n2,
       |        list_transform(range(1, ${MatDims + 1}), i -> qv[i]) qvh FROM n),
       |hn AS (SELECT vec_id, qv, n2, qvh, ${sqlNorm2("qvh")} n2h FROM h),
       |c AS (SELECT q.vec_id q_id, x.vec_id vec_id,
       |        CAST(${sqlDotq("q.qvh", "x.qvh")} AS DOUBLE) / sqrt(nullif(CAST(q.n2h AS DOUBLE)*CAST(x.n2h AS DOUBLE), 0.0)) ccos
       |      FROM hn q JOIN hn x ON q.vec_id < $NQ AND x.vec_id <> q.vec_id),
       |cr AS (SELECT q_id, vec_id,
       |        row_number() OVER (PARTITION BY q_id ORDER BY ccos DESC, vec_id ASC) crnk FROM c),
       |cand AS (SELECT q_id, vec_id FROM cr WHERE crnk <= $MatC),
       |s AS (SELECT cand.q_id, cand.vec_id,
       |        CAST(${sqlDotq("q.qv", "x.qv")} AS DOUBLE) / sqrt(nullif(CAST(q.n2 AS DOUBLE)*CAST(x.n2 AS DOUBLE), 0.0)) cosine
       |      FROM cand JOIN n q ON q.vec_id = cand.q_id JOIN n x ON x.vec_id = cand.vec_id),
       |r AS (SELECT q_id, vec_id, cosine,
       |        row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id ASC) rnk FROM s)
       |SELECT q_id, rnk, vec_id, cosine FROM r WHERE rnk <= $K""".stripMargin

  private val lshSql =
    s"""$baseSql,
       |b AS (SELECT vec_id, qv, n2, array_to_string(list_transform(range(1, ${SigBits + 1}),
       |        i -> CASE WHEN qv[i] > 0 THEN '1' ELSE '0' END), '') sig FROM n),
       |bands AS (SELECT vec_id, unnest(list_transform(range($Bands),
       |            k -> CAST(k AS VARCHAR) || ':' || substr(sig, CAST(k*4+1 AS INTEGER), 4))) bkey FROM b),
       |cand AS (SELECT DISTINCT q.vec_id q_id, c.vec_id vec_id
       |         FROM bands q JOIN bands c ON q.bkey = c.bkey
       |         WHERE q.vec_id < $NQ AND c.vec_id <> q.vec_id),
       |s AS (SELECT cand.q_id, cand.vec_id,
       |        CAST(${sqlDotq("q.qv", "c.qv")} AS DOUBLE) / sqrt(nullif(CAST(q.n2 AS DOUBLE)*CAST(c.n2 AS DOUBLE), 0.0)) cosine
       |      FROM cand JOIN n q ON q.vec_id = cand.q_id JOIN n c ON c.vec_id = cand.vec_id),
       |r AS (SELECT q_id, vec_id, cosine,
       |        row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id ASC) rnk FROM s)
       |SELECT q_id, rnk, vec_id, cosine FROM r WHERE rnk <= $K""".stripMargin

  /** Replay of q34: train the [[NCells]]-cell quantizer exactly as
    * Spark does (two Lloyd rounds, integer math), assign the corpus
    * (a3 = final assignment), rank each query's cells by dist², probe
    * the top [[NProbe]], exact re-rank.
    */
  private val ivfSql = {
    val probeD2 = s"x.n2 - 2*${sqlDotq("x.qv", "c.cqv")} + c.cn2"
    s"""$baseSql,
       |cent0 AS (SELECT CAST(vec_id AS INTEGER) cell, qv cqv, n2 cn2
       |          FROM n WHERE vec_id < $NCells),
       |${kmAssignSql("cent0", "1")},
       |${kmUpdateSql("1", "1")},
       |${kmAssignSql("centn1", "2")},
       |${kmUpdateSql("2", "2")},
       |${kmAssignSql("centn2", "3")},
       |corpus AS (SELECT vec_id, cell FROM a3),
       |probes AS (SELECT q_id, cell FROM (
       |    SELECT x.vec_id q_id, c.cell,
       |      row_number() OVER (PARTITION BY x.vec_id
       |        ORDER BY $probeD2, c.cell) rn
       |    FROM n x CROSS JOIN centn2 c WHERE x.vec_id < $NQ)
       |  WHERE rn <= $NProbe),
       |cand AS (SELECT DISTINCT p.q_id, c.vec_id
       |         FROM probes p JOIN corpus c ON c.cell = p.cell
       |         WHERE c.vec_id <> p.q_id),
       |s AS (SELECT cand.q_id, cand.vec_id,
       |        CAST(${sqlDotq("q.qv", "c.qv")} AS DOUBLE) / sqrt(nullif(CAST(q.n2 AS DOUBLE)*CAST(c.n2 AS DOUBLE), 0.0)) cosine
       |      FROM cand JOIN n q ON q.vec_id = cand.q_id JOIN n c ON c.vec_id = cand.vec_id),
       |r AS (SELECT q_id, vec_id, cosine,
       |        row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id ASC) rnk FROM s)
       |SELECT q_id, rnk, vec_id, cosine FROM r WHERE rnk <= $K""".stripMargin
  }

  /** q78 replay: subvector table keyed by (vec_id, m), one keyed Lloyd
    * round per codebook (all [[PqM]] at once), code assignment, the
    * per-query ADC distance table, shortlist, exact re-rank.
    */
  private val pqSql = {
    val subD2 = s"x.sn2 - 2*${sqlDotq("x.sqv", "c.cqv")} + c.cn2"
    s"""$baseSql,
       |subs0 AS (SELECT vec_id, unnest(range($PqM)) m, qv FROM n),
       |subs AS (SELECT vec_id, m,
       |           list_transform(range(1, ${PqDs + 1}), i -> qv[m*$PqDs + i]) sqv
       |         FROM subs0),
       |subsn AS (SELECT vec_id, m, sqv, ${sqlNorm2("sqv")} sn2 FROM subs),
       |pcent0 AS (SELECT m, CAST(vec_id AS INTEGER) cell, sqv cqv, sn2 cn2
       |           FROM subsn WHERE vec_id < $PqKs),
       |pa1 AS (SELECT vec_id, m, cell, sqv FROM (
       |    SELECT x.vec_id, x.m, c.cell, x.sqv,
       |      row_number() OVER (PARTITION BY x.vec_id, x.m
       |        ORDER BY $subD2, c.cell) rn
       |    FROM subsn x JOIN pcent0 c ON x.m = c.m) WHERE rn = 1),
       |ppx AS (SELECT m, cell, unnest(range(1, len(sqv)+1)) i, unnest(sqv) v
       |        FROM pa1),
       |ps AS (SELECT m, cell, i, CAST(sum(v) AS BIGINT) s, count(*) cnt
       |       FROM ppx GROUP BY m, cell, i),
       |pc AS (SELECT m, cell,
       |         list((s - ((s % cnt) + cnt) % cnt) // cnt ORDER BY i) cqv
       |       FROM ps GROUP BY m, cell),
       |books AS (SELECT m, cell, cqv, ${sqlNorm2("cqv")} cn2 FROM pc),
       |codes AS (SELECT vec_id, m, cell FROM (
       |    SELECT x.vec_id, x.m, c.cell,
       |      row_number() OVER (PARTITION BY x.vec_id, x.m
       |        ORDER BY $subD2, c.cell) rn
       |    FROM subsn x JOIN books c ON x.m = c.m) WHERE rn = 1),
       |qdt AS (SELECT x.vec_id q_id, c.m, c.cell, $subD2 d2
       |        FROM subsn x JOIN books c ON x.m = c.m
       |        WHERE x.vec_id < $NQ),
       |adist AS (SELECT q.q_id, c.vec_id, CAST(sum(q.d2) AS BIGINT) adist
       |          FROM codes c JOIN qdt q ON q.m = c.m AND q.cell = c.cell
       |          WHERE c.vec_id <> q.q_id
       |          GROUP BY q.q_id, c.vec_id),
       |short AS (SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id,
       |      row_number() OVER (PARTITION BY q_id
       |        ORDER BY adist ASC, vec_id ASC) rn
       |    FROM adist) WHERE rn <= $PqShort),
       |s AS (SELECT short.q_id, short.vec_id,
       |        CAST(${sqlDotq("q.qv", "c.qv")} AS DOUBLE) / sqrt(nullif(CAST(q.n2 AS DOUBLE)*CAST(c.n2 AS DOUBLE), 0.0)) cosine
       |      FROM short JOIN n q ON q.vec_id = short.q_id
       |                 JOIN n c ON c.vec_id = short.vec_id),
       |r AS (SELECT q_id, vec_id, cosine,
       |        row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id ASC) rnk FROM s)
       |SELECT q_id, rnk, vec_id, cosine FROM r WHERE rnk <= $K""".stripMargin
  }

  /** q97 replay: coarse training (the q34 chain), integer residuals
    * against the assigned centroid, residual-codebook training and
    * encoding (the q78 chain over residual subvectors), per-probed-cell
    * query re-centering, cell-restricted ADC, exact re-rank.
    */
  private val ivfpqSql = {
    val subD2 = s"x.sn2 - 2*${sqlDotq("x.sqv", "c.cqv")} + c.cn2"
    val probeD2 = s"x.n2 - 2*${sqlDotq("x.qv", "c.cqv")} + c.cn2"
    val D = PqM * PqDs
    s"""$baseSql,
       |cent0 AS (SELECT CAST(vec_id AS INTEGER) cell, qv cqv, n2 cn2
       |          FROM n WHERE vec_id < $NCells),
       |${kmAssignSql("cent0", "1")},
       |${kmUpdateSql("1", "1")},
       |${kmAssignSql("centn1", "2")},
       |${kmUpdateSql("2", "2")},
       |${kmAssignSql("centn2", "3")},
       |resid AS (SELECT a.vec_id, a.cell,
       |            list_transform(range(1, ${D + 1}), i -> a.qv[i] - c.cqv[i]) rv
       |          FROM a3 a JOIN centn2 c USING (cell)),
       |rsubs0 AS (SELECT vec_id, cell, unnest(range($PqM)) m, rv FROM resid),
       |rsubs AS (SELECT vec_id, cell, m,
       |            list_transform(range(1, ${PqDs + 1}), i -> rv[m*$PqDs + i]) sqv
       |          FROM rsubs0),
       |rsubsn AS (SELECT vec_id, cell, m, sqv, ${sqlNorm2("sqv")} sn2 FROM rsubs),
       |pcent0 AS (SELECT m, CAST(vec_id AS INTEGER) cell, sqv cqv, sn2 cn2
       |           FROM rsubsn WHERE vec_id < $PqKs),
       |pa1 AS (SELECT vec_id, m, cell, sqv FROM (
       |    SELECT x.vec_id, x.m, c.cell, x.sqv,
       |      row_number() OVER (PARTITION BY x.vec_id, x.m
       |        ORDER BY $subD2, c.cell) rn
       |    FROM rsubsn x JOIN pcent0 c ON x.m = c.m) WHERE rn = 1),
       |ppx AS (SELECT m, cell, unnest(range(1, len(sqv)+1)) i, unnest(sqv) v
       |        FROM pa1),
       |ps AS (SELECT m, cell, i, CAST(sum(v) AS BIGINT) s, count(*) cnt
       |       FROM ppx GROUP BY m, cell, i),
       |pc AS (SELECT m, cell,
       |         list((s - ((s % cnt) + cnt) % cnt) // cnt ORDER BY i) cqv
       |       FROM ps GROUP BY m, cell),
       |books AS (SELECT m, cell, cqv, ${sqlNorm2("cqv")} cn2 FROM pc),
       |codes AS (SELECT vec_id, ccell, m, code FROM (
       |    SELECT x.vec_id, x.cell ccell, x.m, c.cell code,
       |      row_number() OVER (PARTITION BY x.vec_id, x.m
       |        ORDER BY $subD2, c.cell) rn
       |    FROM rsubsn x JOIN books c ON x.m = c.m) WHERE rn = 1),
       |probes AS (SELECT q_id, cell FROM (
       |    SELECT x.vec_id q_id, c.cell,
       |      row_number() OVER (PARTITION BY x.vec_id
       |        ORDER BY $probeD2, c.cell) rn
       |    FROM n x CROSS JOIN centn2 c WHERE x.vec_id < $NQ)
       |  WHERE rn <= $NProbe),
       |qres AS (SELECT p.q_id, p.cell,
       |           list_transform(range(1, ${D + 1}), i -> x.qv[i] - c.cqv[i]) rv
       |         FROM probes p JOIN n x ON x.vec_id = p.q_id
       |                       JOIN centn2 c USING (cell)),
       |qsub0 AS (SELECT q_id, cell, unnest(range($PqM)) m, rv FROM qres),
       |qsub AS (SELECT q_id, cell, m,
       |           list_transform(range(1, ${PqDs + 1}), i -> rv[m*$PqDs + i]) sqv
       |         FROM qsub0),
       |qsubn AS (SELECT q_id, cell, m, sqv, ${sqlNorm2("sqv")} sn2 FROM qsub),
       |qdt AS (SELECT x.q_id, x.cell, x.m, c.cell code, $subD2 d2
       |        FROM qsubn x JOIN books c ON x.m = c.m),
       |adist AS (SELECT q.q_id, v.vec_id, CAST(sum(q.d2) AS BIGINT) adist
       |          FROM codes v JOIN qdt q
       |            ON q.cell = v.ccell AND q.m = v.m AND q.code = v.code
       |          WHERE v.vec_id <> q.q_id
       |          GROUP BY q.q_id, v.vec_id),
       |short AS (SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id,
       |      row_number() OVER (PARTITION BY q_id
       |        ORDER BY adist ASC, vec_id ASC) rn
       |    FROM adist) WHERE rn <= $PqShort),
       |s AS (SELECT short.q_id, short.vec_id,
       |        CAST(${sqlDotq("q.qv", "c.qv")} AS DOUBLE) / sqrt(nullif(CAST(q.n2 AS DOUBLE)*CAST(c.n2 AS DOUBLE), 0.0)) cosine
       |      FROM short JOIN n q ON q.vec_id = short.q_id
       |                 JOIN n c ON c.vec_id = short.vec_id),
       |r AS (SELECT q_id, vec_id, cosine,
       |        row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id ASC) rnk FROM s)
       |SELECT q_id, rnk, vec_id, cosine FROM r WHERE rnk <= $K""".stripMargin
  }

  /** q85 replay: the q34 train/assign/probe chain with the corpus
    * inverted lists pre-filtered by the label predicate.
    */
  private val filteredSql = {
    val probeD2 = s"x.n2 - 2*${sqlDotq("x.qv", "c.cqv")} + c.cn2"
    s"""$baseSql,
       |cent0 AS (SELECT CAST(vec_id AS INTEGER) cell, qv cqv, n2 cn2
       |          FROM n WHERE vec_id < $NCells),
       |${kmAssignSql("cent0", "1")},
       |${kmUpdateSql("1", "1")},
       |${kmAssignSql("centn1", "2")},
       |${kmUpdateSql("2", "2")},
       |${kmAssignSql("centn2", "3")},
       |corpus AS (SELECT a3.vec_id, a3.cell
       |           FROM a3 JOIN embeddings emb ON emb.vec_id = a3.vec_id
       |           WHERE emb.label % 2 = 0),
       |probes AS (SELECT q_id, cell FROM (
       |    SELECT x.vec_id q_id, c.cell,
       |      row_number() OVER (PARTITION BY x.vec_id
       |        ORDER BY $probeD2, c.cell) rn
       |    FROM n x CROSS JOIN centn2 c WHERE x.vec_id < $NQ)
       |  WHERE rn <= $NProbe),
       |cand AS (SELECT DISTINCT p.q_id, c.vec_id
       |         FROM probes p JOIN corpus c ON c.cell = p.cell
       |         WHERE c.vec_id <> p.q_id),
       |s AS (SELECT cand.q_id, cand.vec_id,
       |        CAST(${sqlDotq("q.qv", "c.qv")} AS DOUBLE) / sqrt(nullif(CAST(q.n2 AS DOUBLE)*CAST(c.n2 AS DOUBLE), 0.0)) cosine
       |      FROM cand JOIN n q ON q.vec_id = cand.q_id JOIN n c ON c.vec_id = cand.vec_id),
       |r AS (SELECT q_id, vec_id, cosine,
       |        row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id ASC) rnk FROM s)
       |SELECT q_id, rnk, vec_id, cosine FROM r WHERE rnk <= $K""".stripMargin
  }

  /** q209 replay: q85's train/assign/probe chain, then the adaptive
    * widening verbatim — per-cell qualifying counts, prefix sums down
    * each query's cell ranking, the floor/cap admission, and the
    * per-query probes-used audit.
    */
  private val adaptiveSql = {
    val probeD2 = s"x.n2 - 2*${sqlDotq("x.qv", "c.cqv")} + c.cn2"
    s"""$baseSql,
       |cent0 AS (SELECT CAST(vec_id AS INTEGER) cell, qv cqv, n2 cn2
       |          FROM n WHERE vec_id < $NCells),
       |${kmAssignSql("cent0", "1")},
       |${kmUpdateSql("1", "1")},
       |${kmAssignSql("centn1", "2")},
       |${kmUpdateSql("2", "2")},
       |${kmAssignSql("centn2", "3")},
       |corpus AS (SELECT a3.vec_id, a3.cell
       |           FROM a3 JOIN embeddings emb ON emb.vec_id = a3.vec_id
       |           WHERE emb.label % 2 = 0),
       |counts AS (SELECT cell, count(*) n FROM corpus GROUP BY cell),
       |ranked AS (SELECT x.vec_id q_id, c.cell,
       |      row_number() OVER (PARTITION BY x.vec_id
       |        ORDER BY $probeD2, c.cell) rn
       |    FROM n x CROSS JOIN centn2 c WHERE x.vec_id < $NQ),
       |prc AS (SELECT r.q_id, r.cell, r.rn, coalesce(cn.n, 0) n,
       |      sum(coalesce(cn.n, 0)) OVER (PARTITION BY r.q_id
       |        ORDER BY r.rn) cum
       |    FROM ranked r LEFT JOIN counts cn USING (cell)),
       |wide AS (SELECT q_id, cell, rn FROM prc
       |    WHERE rn <= $MaxProbe
       |      AND (rn <= $NProbe OR cum - n < $CandFloor)),
       |np AS (SELECT q_id, max(rn) n_probes FROM wide GROUP BY q_id),
       |cand AS (SELECT DISTINCT p.q_id, c.vec_id
       |         FROM wide p JOIN corpus c ON c.cell = p.cell
       |         WHERE c.vec_id <> p.q_id),
       |s AS (SELECT cand.q_id, cand.vec_id,
       |        CAST(${sqlDotq("q.qv", "c.qv")} AS DOUBLE) / sqrt(nullif(CAST(q.n2 AS DOUBLE)*CAST(c.n2 AS DOUBLE), 0.0)) cosine
       |      FROM cand JOIN n q ON q.vec_id = cand.q_id JOIN n c ON c.vec_id = cand.vec_id),
       |r AS (SELECT q_id, vec_id, cosine,
       |        row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id ASC) rnk FROM s)
       |SELECT q_id, rnk, vec_id, cosine, n_probes
       |FROM r JOIN np USING (q_id) WHERE rnk <= $K""".stripMargin
  }

  // q205: the filtered brute truth beside q85's plan (spliced as a
  // CTE-in-subquery AFTER stripMargin — the @-placeholder discipline)
  private val filteredRecallSql =
    s"""$baseSql,
       |ap AS (SELECT q_id, vec_id FROM (@FILT@)),
       |fb0 AS (SELECT x.vec_id q_id, c.vec_id,
       |    CAST(${sqlDotq("x.qv", "c.qv")} AS DOUBLE)
       |      / sqrt(nullif(CAST(x.n2 AS DOUBLE)*CAST(c.n2 AS DOUBLE), 0.0))
       |      AS cosine
       |  FROM n x
       |  JOIN n c ON c.vec_id <> x.vec_id
       |  JOIN embeddings emb ON emb.vec_id = c.vec_id
       |    AND emb.label % 2 = 0
       |  WHERE x.vec_id < $NQ),
       |fb AS (SELECT q_id, vec_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id
       |      ORDER BY cosine DESC, vec_id ASC) rnk FROM fb0)
       |  WHERE rnk <= $K),
       |tot AS (SELECT count(*) t FROM fb)
       |SELECT 'ivf_filtered' AS method,
       |  (SELECT count(*) FROM ap JOIN fb USING (q_id, vec_id)) AS n_hits,
       |  (SELECT t FROM tot) AS n_truth,
       |  (SELECT count(*) FROM ap JOIN fb USING (q_id, vec_id)) * 1000
       |    // (SELECT t FROM tot) AS recall_milli""".stripMargin
      .replace("@FILT@", filteredSql)

  private val recallSql =
    s"""WITH brute AS (SELECT q_id, vec_id FROM ($bruteSql)),
       |lsh AS (SELECT q_id, vec_id FROM ($lshSql)),
       |ivf AS (SELECT q_id, vec_id FROM ($ivfSql)),
       |pq AS (SELECT q_id, vec_id FROM ($pqSql)),
       |ivfpq AS (SELECT q_id, vec_id FROM ($ivfpqSql)),
       |mat AS (SELECT q_id, vec_id FROM ($matryoshkaSql)),
       |tot AS (SELECT count(*) t FROM brute)
       |SELECT 'ivf' AS method,
       |  (SELECT count(*) FROM ivf JOIN brute USING (q_id, vec_id)) AS n_hits,
       |  (SELECT t FROM tot) AS n_brute,
       |  (SELECT count(*) FROM ivf JOIN brute USING (q_id, vec_id)) * 1000
       |    // (SELECT t FROM tot) AS recall_milli
       |UNION ALL
       |SELECT 'lsh' AS method,
       |  (SELECT count(*) FROM lsh JOIN brute USING (q_id, vec_id)) AS n_hits,
       |  (SELECT t FROM tot) AS n_brute,
       |  (SELECT count(*) FROM lsh JOIN brute USING (q_id, vec_id)) * 1000
       |    // (SELECT t FROM tot) AS recall_milli
       |UNION ALL
       |SELECT 'pq' AS method,
       |  (SELECT count(*) FROM pq JOIN brute USING (q_id, vec_id)) AS n_hits,
       |  (SELECT t FROM tot) AS n_brute,
       |  (SELECT count(*) FROM pq JOIN brute USING (q_id, vec_id)) * 1000
       |    // (SELECT t FROM tot) AS recall_milli
       |UNION ALL
       |SELECT 'ivfpq' AS method,
       |  (SELECT count(*) FROM ivfpq JOIN brute USING (q_id, vec_id)) AS n_hits,
       |  (SELECT t FROM tot) AS n_brute,
       |  (SELECT count(*) FROM ivfpq JOIN brute USING (q_id, vec_id)) * 1000
       |    // (SELECT t FROM tot) AS recall_milli
       |UNION ALL
       |SELECT 'matryoshka' AS method,
       |  (SELECT count(*) FROM mat JOIN brute USING (q_id, vec_id)) AS n_hits,
       |  (SELECT t FROM tot) AS n_brute,
       |  (SELECT count(*) FROM mat JOIN brute USING (q_id, vec_id)) * 1000
       |    // (SELECT t FROM tot) AS recall_milli""".stripMargin

  /** One Lloyd assignment against centroid CTE `cent`, emitting CTE
    * `a$tag` (vec_id, qv, cell, dist2). The dist² expression repeats in
    * the window ORDER BY because SQL can't reference the alias there.
    */
  private def kmAssignSql(cent: String, tag: String): String = {
    val d2 = s"x.n2 - 2*${sqlDotq("x.qv", "c.cqv")} + c.cn2"
    s"""a$tag AS (SELECT vec_id, qv, cell, dist2 FROM (
       |  SELECT x.vec_id, x.qv, c.cell, $d2 AS dist2,
       |    row_number() OVER (PARTITION BY x.vec_id
       |      ORDER BY $d2, c.cell) rn
       |  FROM n x CROSS JOIN $cent c) WHERE rn = 1)""".stripMargin
  }

  /** Centroid update from assignment CTE `a$from`, emitting `cent$tag`
    * (cell, cqv, cn2) with element-wise exact floor(sum/count).
    */
  private def kmUpdateSql(from: String, tag: String): String =
    s"""px$tag AS (SELECT cell, unnest(range(1, len(qv)+1)) i, unnest(qv) v
       |           FROM a$from),
       |s$tag AS (SELECT cell, i, CAST(sum(v) AS BIGINT) s, count(*) cnt
       |          FROM px$tag GROUP BY cell, i),
       |cent$tag AS (SELECT cell,
       |    list((s - ((s % cnt) + cnt) % cnt) // cnt ORDER BY i) cqv
       |  FROM s$tag GROUP BY cell),
       |centn$tag AS (SELECT cell, cqv, ${sqlNorm2("cqv")} cn2 FROM cent$tag)""".stripMargin

  /** q115 replay: features split into base (`n`, which the shared
    * training fragments consume) and arrivals; train on base, assign
    * both against the frozen `centn2`, full-join the per-cell counts.
    */
  private val ivfIncSql = {
    val d2 = s"x.n2 - 2*${sqlDotq("x.qv", "c.cqv")} + c.cn2"
    s"""WITH e AS (SELECT vec_id, $sqlQvec qv FROM embeddings),
       |na AS (SELECT vec_id, qv, ${sqlNorm2("qv")} n2 FROM e),
       |n AS (SELECT * FROM na WHERE vec_id % 10 <> 9),
       |cent0 AS (SELECT CAST(vec_id AS INTEGER) cell, qv cqv, n2 cn2
       |          FROM n WHERE vec_id < $NCells),
       |${kmAssignSql("cent0", "1")},
       |${kmUpdateSql("1", "1")},
       |${kmAssignSql("centn1", "2")},
       |${kmUpdateSql("2", "2")},
       |${kmAssignSql("centn2", "3")},
       |anew AS (SELECT vec_id, cell, dist2 FROM (
       |    SELECT x.vec_id, c.cell, $d2 dist2,
       |      row_number() OVER (PARTITION BY x.vec_id ORDER BY $d2, c.cell) rn
       |    FROM (SELECT * FROM na WHERE vec_id % 10 = 9) x
       |    CROSS JOIN centn2 c) WHERE rn = 1),
       |b AS (SELECT cell, count(*) n_base FROM a3 GROUP BY cell),
       |w AS (SELECT cell, count(*) n_new, CAST(sum(dist2) AS BIGINT) sum_d2
       |      FROM anew GROUP BY cell)
       |SELECT coalesce(b.cell, w.cell) AS cell,
       |       coalesce(b.n_base, 0) AS n_base,
       |       coalesce(w.n_new, 0) AS n_new,
       |       coalesce(w.sum_d2, 0) AS drift_d2
       |FROM b FULL JOIN w ON b.cell = w.cell""".stripMargin
  }

  private val kmeansSql =
    s"""$baseSql,
       |cent0 AS (SELECT CAST(vec_id AS INTEGER) cell, qv cqv, n2 cn2
       |          FROM n WHERE vec_id < $KmK),
       |${kmAssignSql("cent0", "1")},
       |${kmUpdateSql("1", "1")},
       |${kmAssignSql("centn1", "2")},
       |${kmUpdateSql("2", "2")},
       |${kmAssignSql("centn2", "3")}
       |SELECT cell, count(*) AS n_members,
       |       CAST(sum(dist2) AS BIGINT) AS inertia
       |FROM a3 GROUP BY cell""".stripMargin

  /** q68 replay: the q59 training chain verbatim (seeds, two exact
    * Lloyd rounds, final assignment a3), then the within-cell pair
    * screen and keep-lowest-id verdict.
    */
  private val semdedupSql =
    s"""$baseSql,
       |cent0 AS (SELECT CAST(vec_id AS INTEGER) cell, qv cqv, n2 cn2
       |          FROM n WHERE vec_id < $KmK),
       |${kmAssignSql("cent0", "1")},
       |${kmUpdateSql("1", "1")},
       |${kmAssignSql("centn1", "2")},
       |${kmUpdateSql("2", "2")},
       |${kmAssignSql("centn2", "3")},
       |feat AS (SELECT a.vec_id, a.cell, a.qv, n.n2
       |         FROM a3 a JOIN n USING (vec_id)),
       |dup AS (SELECT DISTINCT b.vec_id
       |        FROM feat a JOIN feat b
       |          ON a.cell = b.cell AND a.vec_id < b.vec_id
       |        WHERE CAST(${sqlDotq("a.qv", "b.qv")} AS DOUBLE)
       |          / sqrt(nullif(CAST(a.n2 AS DOUBLE)*CAST(b.n2 AS DOUBLE), 0.0)) >= $SemThr)
       |SELECT f.vec_id, f.cell, (d.vec_id IS NOT NULL) AS removed
       |FROM feat f LEFT JOIN dup d ON f.vec_id = d.vec_id""".stripMargin

  // centroid/distance/rank replayed integer-for-integer (q59's mean
  // kernel, the shared floored-division expression)
  private val coresetSql =
    s"""WITH e AS (SELECT vec_id, label, $sqlQvec qv FROM embeddings),
       |px AS (SELECT label, unnest(range(1, len(qv)+1)) i, unnest(qv) v
       |       FROM e),
       |s AS (SELECT label, i, CAST(sum(v) AS BIGINT) s, count(*) cnt
       |      FROM px GROUP BY label, i),
       |c AS (SELECT label,
       |        list((s - ((s % cnt) + cnt) % cnt) // cnt ORDER BY i) cqv
       |      FROM s GROUP BY label),
       |d AS (SELECT e.vec_id, e.label,
       |        ${sqlNorm2("e.qv")} - 2*${sqlDotq("e.qv", "c.cqv")}
       |          + ${sqlNorm2("c.cqv")} AS d2
       |      FROM e JOIN c ON e.label = c.label),
       |r AS (SELECT label, vec_id, d2,
       |        row_number() OVER (PARTITION BY label
       |          ORDER BY d2 ASC, vec_id ASC) rnk FROM d)
       |SELECT label, rnk, vec_id, CAST(d2 AS BIGINT) AS d2
       |FROM r WHERE rnk <= $CoresetK""".stripMargin

  // q180: the q68 training/assignment chain verbatim (a3), hash
  // priorities, per-cell rank — the window form is fine oracle-side
  private val cellQuotaSql =
    s"""$baseSql,
       |cent0 AS (SELECT CAST(vec_id AS INTEGER) cell, qv cqv, n2 cn2
       |          FROM n WHERE vec_id < $KmK),
       |${kmAssignSql("cent0", "1")},
       |${kmUpdateSql("1", "1")},
       |${kmAssignSql("centn1", "2")},
       |${kmUpdateSql("2", "2")},
       |${kmAssignSql("centn2", "3")},
       |p AS (SELECT vec_id, cell,
       |        ${sqlHash60("'quota:' || CAST(vec_id AS VARCHAR)")} pri
       |      FROM a3),
       |r AS (SELECT cell, vec_id, pri, row_number() OVER (
       |        PARTITION BY cell ORDER BY pri ASC, vec_id ASC) rnk FROM p)
       |SELECT cell, rnk, vec_id, pri FROM r WHERE rnk <= $QuotaK""".stripMargin

  // the projection matrix is REBUILT from SQL md5 here — the oracle
  // cross-checks the engine's driver-side md5 literal every round
  private val srpSql =
    s"""WITH e AS (SELECT vec_id, $sqlQvec qv FROM embeddings
       |           WHERE vec_id < $NQ OR vec_id % 7 = 3),
       |n AS (SELECT vec_id, qv, ${sqlNorm2("qv")} n2 FROM e),
       |rm AS (SELECT b,
       |    list(CASE WHEN ${sqlHash60("'srp:' || b || ':' || d")} % 2 = 0
       |      THEN 1 ELSE -1 END ORDER BY d) rv
       |  FROM (SELECT unnest(range($SrpBits)) b),
       |       (SELECT unnest(range(1, ${SrpDim + 1})) d)
       |  GROUP BY b),
       |sg AS (SELECT vec_id,
       |    list(CASE WHEN s >= 0 THEN 1 ELSE 0 END ORDER BY b) sig
       |  FROM (SELECT n.vec_id, rm.b,
       |          list_sum(list_transform(range(1, ${SrpDim + 1}),
       |            d -> n.qv[d] * rm.rv[d])) s
       |        FROM n, rm)
       |  GROUP BY vec_id),
       |qs AS (SELECT n.vec_id q_id, n.qv qqv, n.n2 qn2, sg.sig qsig
       |       FROM n JOIN sg USING (vec_id) WHERE n.vec_id < $NQ),
       |cs AS (SELECT n.vec_id, n.qv, n.n2, sg.sig
       |       FROM n JOIN sg USING (vec_id) WHERE n.vec_id % 7 = 3),
       |p AS (SELECT qs.q_id, cs.vec_id, qs.qqv, qs.qn2, cs.qv, cs.n2,
       |        CAST(len(list_filter(range(1, ${SrpBits + 1}),
       |          i -> qs.qsig[i] <> cs.sig[i])) AS BIGINT) hamming
       |      FROM qs, cs WHERE cs.vec_id <> qs.q_id)
       |SELECT q_id, vec_id, hamming,
       |  CAST(1000 - (2000 * hamming) // $SrpBits AS BIGINT) AS est_milli,
       |  ${sqlCosineq(sqlDotq("qqv", "qv"), "qn2", "n2")} AS cosine
       |FROM p""".stripMargin

  private val negSampleSql =
    s"""WITH v AS (SELECT vec_id, label FROM embeddings),
       |a AS (SELECT vec_id AS anchor_id, label AS a_label FROM v
       |      WHERE vec_id < $NQ),
       |c AS (SELECT a.anchor_id, v.vec_id, v.label,
       |        ${sqlHash60("'neg:' || anchor_id || ':' || vec_id")} AS priority
       |      FROM v, a WHERE v.label <> a.a_label),
       |r AS (SELECT *, row_number() OVER (PARTITION BY anchor_id
       |        ORDER BY priority, vec_id) AS neg_rank FROM c)
       |SELECT anchor_id, neg_rank, vec_id AS neg_id, label AS neg_label,
       |  priority
       |FROM r WHERE neg_rank <= $NegK""".stripMargin

  private val int8QuantSql =
    s"""WITH e AS (SELECT vec_id, $sqlQvec qv FROM embeddings),
       |px AS (SELECT vec_id, unnest(range(1, len(qv)+1)) i, unnest(qv) v
       |       FROM e),
       |cal AS (SELECT i, min(v) mn, greatest(max(v) - min(v), 1) span
       |        FROM px GROUP BY i),
       |q AS (SELECT vec_id, v, mn, span, ((v - mn) * 255) // span AS q8
       |      FROM px JOIN cal USING (i)),
       |d AS (SELECT vec_id, abs(v - (mn + (q8 * span) // 255)) AS err FROM q)
       |SELECT vec_id, CAST(sum(err) AS BIGINT) AS sum_abs_err,
       |  CAST(max(err) AS BIGINT) AS max_abs_err,
       |  CAST(count(*) AS BIGINT) AS n_dims
       |FROM d GROUP BY vec_id""".stripMargin

  private val dimVarianceSql =
    s"""WITH e AS (SELECT vec_id, $sqlQvec qv FROM embeddings),
       |x AS (SELECT CAST(i - 1 AS INTEGER) AS d, qv[CAST(i AS INTEGER)] AS x
       |      FROM e, range(1, ${SrpDim + 1}) AS r(i)),
       |g AS (SELECT d, CAST(count(*) AS BIGINT) AS n,
       |        CAST(sum(x) AS BIGINT) AS sx,
       |        CAST(sum(x * x) AS BIGINT) AS sxx
       |      FROM x GROUP BY d)
       |SELECT d, n, sx, n * sxx - sx * sx AS var_n,
       |  row_number() OVER (ORDER BY n * sxx - sx * sx DESC, d ASC) AS rnk,
       |  CAST(d < $MatDims AS INTEGER) AS in_prefix
       |FROM g""".stripMargin

  private val embedCovarianceSql =
    s"""WITH e AS (SELECT vec_id, $sqlQvec qv FROM embeddings),
       |x AS (SELECT vec_id, CAST(i - 1 AS INTEGER) AS d,
       |        qv[CAST(i AS INTEGER)] AS x
       |      FROM e, range(1, ${SrpDim + 1}) AS r(i)),
       |p AS (SELECT a.d AS i, b.d AS j, CAST(count(*) AS BIGINT) AS n,
       |        CAST(sum(a.x * b.x) AS BIGINT) AS sxy
       |      FROM x a JOIN x b ON a.vec_id = b.vec_id AND b.d >= a.d
       |      GROUP BY 1, 2),
       |s AS (SELECT d, CAST(sum(x) AS BIGINT) AS sx FROM x GROUP BY d)
       |SELECT i, j, n, sxy, n * sxy - si.sx * sj.sx AS cov_n
       |FROM p JOIN s si ON si.d = i JOIN s sj ON sj.d = j""".stripMargin

  // replays the q34 training chain verbatim (cent0 → 2 Lloyd updates →
  // final assignment), then counts per cell against the uniform ideal
  private val ivfBalanceSql =
    s"""$baseSql,
       |cent0 AS (SELECT CAST(vec_id AS INTEGER) cell, qv cqv, n2 cn2
       |          FROM n WHERE vec_id < $NCells),
       |${kmAssignSql("cent0", "1")},
       |${kmUpdateSql("1", "1")},
       |${kmAssignSql("centn1", "2")},
       |${kmUpdateSql("2", "2")},
       |${kmAssignSql("centn2", "3")},
       |cnt AS (SELECT cell, CAST(count(*) AS BIGINT) n_vectors
       |        FROM a3 GROUP BY cell),
       |b AS (SELECT c.cell,
       |        CAST(coalesce(cnt.n_vectors, 0) AS BIGINT) AS n_vectors
       |      FROM centn2 c LEFT JOIN cnt USING (cell)),
       |w AS (SELECT cell, n_vectors,
       |        (1000 * n_vectors * $NCells)
       |          // CAST(sum(n_vectors) OVER () AS BIGINT) AS balance_milli
       |      FROM b)
       |SELECT cell, n_vectors, balance_milli,
       |  CAST(balance_milli >= 2000 AS INTEGER) AS skewed
       |FROM w""".stripMargin

  val oracle: Map[String, String] = Map(
    "q185_dim_variance" -> dimVarianceSql,
    "q192_embed_covariance" -> embedCovarianceSql,
    "q193_ivf_balance" -> ivfBalanceSql,
    "q173_int8_quant" -> int8QuantSql,
    "q167_neg_sample" -> negSampleSql,
    "q161_srp_bits" -> srpSql,
    "q159_label_coreset" -> coresetSql,
    "q115_ivf_increment" -> ivfIncSql,
    "q19_ann_brute" -> bruteSql,
    "q125_ann_matryoshka" -> matryoshkaSql,
    "q20_ann_lsh" -> lshSql,
    "q34_ann_ivf" -> ivfSql,
    "q45_ann_recall" -> recallSql,
    "q59_kmeans_embed" -> kmeansSql,
    "q68_semantic_dedup" -> semdedupSql,
    "q180_cell_quota" -> cellQuotaSql,
    "q78_ann_pq" -> pqSql,
    "q85_ann_filtered" -> filteredSql,
    "q209_ann_adaptive" -> adaptiveSql,
    "q205_filtered_recall" -> filteredRecallSql,
    "q97_ann_ivfpq" -> ivfpqSql,
    // identical result contract to q19 — the aggregator vs window proof
    "q99_topk_agg" -> bruteSql)
}
