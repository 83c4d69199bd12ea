package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Quality, TextAnalysis}

class QualitySpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf0001}

  test("q224 tercile cut matches a local replay and populates all three buckets") {
    val scores = TextAnalysis.lmQuality(spark, sf0001)
      .select(col("doc_id"), col("surprisal_milli")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = scores.size
    val sorted = scores.values.toSeq.sorted
    // smallest value covering >= 1/3 (2/3) of documents, ties included
    def cut(k: Int): Long =
      sorted.find(v => sorted.count(_ <= v) * 3 >= n * k).get
    val (t1, t2) = (cut(1), cut(2))
    val got = Quality.ccnetBuckets(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.length === n)
    got.foreach { case (id, s, b) =>
      assert(s === scores(id))
      val expect = if (s <= t1) "head" else if (s <= t2) "middle" else "tail"
      assert(b === expect, s"doc $id s=$s")
    }
    val byBucket = got.groupBy(_._3).view.mapValues(_.length).toMap
    assert(byBucket.keySet === Set("head", "middle", "tail"),
      "the cut must stratify — a degenerate corpus proves nothing")
    // the value-cut guarantee: head covers at least a third
    assert(byBucket("head") * 3 >= n)
  }

  test("q225 novelty matches a local gram-frequency replay and both regimes occur") {
    val docGrams = Dedup.docShingleHashes(spark, sf0001)
      .select(col("doc_id"), col("hsh")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1))
    val df = docGrams.flatMap(_._2).groupBy(identity)
      .view.mapValues(_.length).toMap
    val expected = docGrams.map { case (id, gs) =>
      val novel = gs.count(df(_) == 1).toLong
      (id, gs.length.toLong, novel, 1000L * novel / gs.length)
    }.toSet
    val got = Quality.gramNovelty(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === expected)
    // the score discriminates on this corpus: shared grams exist
    // (near-dups are planted) AND unique grams exist
    assert(got.exists(_._4 < 1000L) && got.exists(_._4 > 0L))
  }

  test("q226 eval slate: stratified, quota-bounded, dedup-excluded, salted order") {
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
    }
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), md5(col("text")).as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val keepers = docs.groupBy(_._3).values.map(_.map(_._1).min).toSet
    val buckets = Quality.ccnetBuckets(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val expected = docs.filter(d => keepers(d._1))
      .map { case (id, lang, _) => (id, lang, buckets(id)) }
      .groupBy(d => (d._2, d._3)).values.flatMap { stratum =>
        stratum.sortBy(d => (h60(s"eval:${d._1}"), d._1))
          .take(Quality.SlateQuota).zipWithIndex
          .map { case ((id, lang, b), i) => (lang, b, i + 1, id) }
      }.toSet
    val got = Quality.evalSlate(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2).toLong,
        r.getLong(3)))
      .map(t => (t._1, t._2, t._3.toInt, t._4)).toSet
    assert(got === expected)
    // every selected doc is its hash group's keeper (no contaminated
    // twin of a training doc can enter the slate)
    assert(got.forall(r => keepers(r._4)))
    // the slate stratifies: more than one stratum, none over quota
    val strata = got.groupBy(r => (r._1, r._2))
    assert(strata.size > 1)
    assert(strata.values.forall(_.size <= Quality.SlateQuota))
  }

  test("q227 budget allocation matches a local greedy replay and spends exactly the budget") {
    val buckets = Quality.ccnetBuckets(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val toks = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), size(
        org.apache.spark.sql.functions.split(col("text"), " ")).as("raw"),
        col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(2).split(" ").count(_.nonEmpty).toLong).toMap
    val total = toks.values.sum
    val budget = 6 * total / 10
    val weights = Map("head" -> 500L, "middle" -> 400L, "tail" -> 100L)
    val prio = Seq("head", "middle", "tail")
    val avail = buckets.toSeq.groupBy(_._2).view
      .mapValues(_.map(d => toks(d._1)).sum).toMap
    val p1 = prio.map(b => b -> math.min(avail(b),
      budget * weights(b) / 1000L)).toMap
    var leftover = budget - p1.values.sum
    val alloc = prio.map { b =>
      val extra = math.min(avail(b) - p1(b), math.max(0L, leftover))
      leftover -= extra
      b -> (p1(b) + extra)
    }.toMap
    val expected = prio.map(b => (b, avail(b), weights(b), alloc(b),
      1000L * alloc(b) / avail(b))).toSet
    val got = Quality.bucketBudget(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got === expected)
    // the plan's hard invariants: the budget is spent exactly (the
    // corpus can absorb 60%), and no bucket is over-allocated
    assert(got.toSeq.map(_._4).sum === budget)
    assert(got.forall(r => r._4 <= r._2))
  }

  test("q229 bigram quality: local replay, token conservation, stratifier diagonal") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
      .filter(_._2.nonEmpty)
    // local interpolated-bigram LM: unigram counts, bigram counts,
    // left-context totals — integer bits via toBinaryString length
    val uni = docs.flatMap(_._2).groupBy(identity).map { case (w, g) =>
      w -> g.length.toLong }
    val nTotal = docs.map(_._2.length.toLong).sum
    val bgAll = docs.flatMap(_._2.sliding(2).filter(_.length == 2)
      .map(p => (p(0), p(1))))
    val cuv = bgAll.groupBy(identity).map { case (p, g) => p -> g.length.toLong }
    val cu = bgAll.groupBy(_._1).map { case (u, g) => u -> g.length.toLong }
    def bits(x: Long): Long = java.lang.Long.toBinaryString(x).length - 1L
    val local = docs.map { case (id, ws) =>
      val first = bits(nTotal / uni(ws.head))
      val rest = ws.sliding(2).filter(_.length == 2).map { p =>
        val (u, v) = (p(0), p(1))
        bits(2L * cu(u) * nTotal / (cuv((u, v)) * nTotal + uni(v) * cu(u)))
      }.sum
      (id, ws.length.toLong, first + rest)
    }.map { case (id, n, sb) => (id, n, sb, sb * 1000 / n) }
    val n = local.length
    val sorted = local.map(_._4).sorted
    def cut(k: Int): Long =
      sorted.find(v => sorted.count(_ <= v) * 3 >= n * k).get
    val (t1, t2) = (cut(1), cut(2))
    val expected = local.map { case (id, nt, sb, s) =>
      (id, nt, sb, s,
        if (s <= t1) "head" else if (s <= t2) "middle" else "tail")
    }.toSet
    val got = Quality.bigramQuality(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSet
    assert(got === expected, "bigram stratifier diverged from the local LM")
    // token conservation (the q94 spec discipline): every token scored
    // exactly once — per doc AND corpus-wide
    val wc = docs.toMap.map { case (id, ws) => id -> ws.length.toLong }
    got.foreach(r => assert(r._2 === wc(r._1), s"doc ${r._1}"))
    assert(got.toSeq.map(_._2).sum === nTotal)
    // all three buckets populated; head covers at least a third
    val byBucket = got.groupBy(_._5).view.mapValues(_.size).toMap
    assert(byBucket.keySet === Set("head", "middle", "tail"))
    assert(byBucket("head") * 3 >= n)
    // the SECOND-stratifier payoff: context moves documents across
    // buckets relative to q224's unigram cut (the disagreement
    // diagonal is the curation signal this query exists to surface)
    val uniBuckets = Quality.ccnetBuckets(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got.exists(r => uniBuckets(r._1) != r._5),
      "bigram terciles identical to unigram — no added signal at this SF")
  }

  test("q236 KN quality: local replay, conservation, continuation mass adds signal") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
      .filter(_._2.nonEmpty)
    val uni = docs.flatMap(_._2).groupBy(identity).map { case (w, g) =>
      w -> g.length.toLong }
    val nTotal = docs.map(_._2.length.toLong).sum
    val bgAll = docs.flatMap(_._2.sliding(2).filter(_.length == 2)
      .map(p => (p(0), p(1))))
    val cuv = bgAll.groupBy(identity).map { case (p, g) => p -> g.length.toLong }
    val cu = bgAll.groupBy(_._1).map { case (u, g) => u -> g.length.toLong }
    val n1u = cuv.keys.toSeq.groupBy(_._1).map { case (u, g) => u -> g.length.toLong }
    val n1v = cuv.keys.toSeq.groupBy(_._2).map { case (v, g) => v -> g.length.toLong }
    val tTypes = cuv.size.toLong
    def bits(x: Long): Long = java.lang.Long.toBinaryString(x).length - 1L
    val local = docs.map { case (id, ws) =>
      val first = bits(nTotal / uni(ws.head))
      val rest = ws.sliding(2).filter(_.length == 2).map { p =>
        val (u, v) = (p(0), p(1))
        bits(4L * cu(u) * tTypes /
          ((4L * cuv((u, v)) - 3L) * tTypes + 3L * n1u(u) * n1v(v)))
      }.sum
      (id, ws.length.toLong, first + rest)
    }.map { case (id, n, sb) => (id, n, sb, sb * 1000 / n) }
    val n = local.length
    val sorted = local.map(_._4).sorted
    def cut(k: Int): Long =
      sorted.find(v => sorted.count(_ <= v) * 3 >= n * k).get
    val (t1, t2) = (cut(1), cut(2))
    val expected = local.map { case (id, nt, sb, s) =>
      (id, nt, sb, s,
        if (s <= t1) "head" else if (s <= t2) "middle" else "tail")
    }.toSet
    val got = Quality.knBigramQuality(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSet
    assert(got === expected, "KN stratifier diverged from the local LM")
    // token conservation, as q229
    assert(got.toSeq.map(_._2).sum === nTotal)
    assert(got.groupBy(_._5).keySet === Set("head", "middle", "tail"))
    // continuation mass must actually move scores relative to the
    // naive interpolation somewhere (KN's whole point), and the two
    // bigram stratifiers must not be the same cut in disguise
    val interp = Quality.bigramQuality(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getString(4))).toMap
    assert(got.exists(r => interp(r._1)._1 != r._4),
      "KN scores identical to interpolated — continuation mass inert")
    assert(got.exists(r => interp(r._1)._2 != r._5),
      "KN terciles identical to interpolated — no added stratification")
  }

  test("q250 trigram KN: local replay, conservation, trigram context adds signal over bigram KN") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
      .filter(_._2.nonEmpty)
    val uni = docs.flatMap(_._2).groupBy(identity).map { case (w, g) =>
      w -> g.length.toLong }
    val nTotal = docs.map(_._2.length.toLong).sum
    val bgAll = docs.flatMap(_._2.sliding(2).filter(_.length == 2)
      .map(p => (p(0), p(1))))
    val cuv = bgAll.groupBy(identity).map { case (p, g) => p -> g.length.toLong }
    val cu = bgAll.groupBy(_._1).map { case (u, g) => u -> g.length.toLong }
    val n1u = cuv.keys.toSeq.groupBy(_._1).map { case (u, g) => u -> g.length.toLong }
    val n1v = cuv.keys.toSeq.groupBy(_._2).map { case (v, g) => v -> g.length.toLong }
    val tTypes = cuv.size.toLong
    val tgAll = docs.flatMap(_._2.sliding(3).filter(_.length == 3)
      .map(t => (t(0), t(1), t(2))))
    val c3 = tgAll.groupBy(identity).map { case (t, g) => t -> g.length.toLong }
    val ctxUv = c3.toSeq.groupBy(t => (t._1._1, t._1._2)).map { case (uv, g) =>
      uv -> (g.map(_._2).sum, g.length.toLong) } // (c2x, n1p_uv)
    val contVw = c3.keys.toSeq.groupBy(t => (t._2, t._3)).map { case (vw, g) =>
      vw -> g.length.toLong } // N1-(·vw)
    val contV = contVw.toSeq.groupBy(_._1._1).map { case (v, g) =>
      v -> (g.map(_._2).sum, g.length.toLong) } // (c'(v), N1+(v·))
    def bits(x: Long): Long = java.lang.Long.toBinaryString(x).length - 1L
    val local = docs.map { case (id, ws) =>
      val first = bits(nTotal / uni(ws.head))
      val second = if (ws.length >= 2) {
        val (u, v) = (ws(0), ws(1))
        bits(4L * cu(u) * tTypes /
          ((4L * cuv((u, v)) - 3L) * tTypes + 3L * n1u(u) * n1v(v)))
      } else 0L
      val rest = ws.sliding(3).filter(_.length == 3).map { t =>
        val (u, v, w) = (t(0), t(1), t(2))
        val (c2x, n1pUv) = ctxUv((u, v))
        val (cpv, n1pV) = contV(v)
        bits(16L * c2x * cpv * tTypes /
          ((4L * c3((u, v, w)) - 3L) * 4L * cpv * tTypes +
            3L * n1pUv * ((4L * contVw((v, w)) - 3L) * tTypes +
              3L * n1pV * n1v(w))))
      }.sum
      (id, ws.length.toLong, first + second + rest)
    }.map { case (id, n, sb) => (id, n, sb, sb * 1000 / n) }
    val n = local.length
    val sorted = local.map(_._4).sorted
    def cut(k: Int): Long =
      sorted.find(v => sorted.count(_ <= v) * 3 >= n * k).get
    val (t1, t2) = (cut(1), cut(2))
    val expected = local.map { case (id, nt, sb, s) =>
      (id, nt, sb, s,
        if (s <= t1) "head" else if (s <= t2) "middle" else "tail")
    }.toSet
    val got = Quality.knTrigramQuality(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSet
    assert(got === expected, "trigram KN diverged from the local LM")
    // token conservation: 1 unigram + 1 bigram + (n−2) trigram scores
    // per n-word document
    assert(got.toSeq.map(_._2).sum === nTotal)
    assert(got.groupBy(_._5).keySet === Set("head", "middle", "tail"))
    // the tri↔bi disagreement diagonal must be non-empty — the added
    // trigram context has to move scores AND the tercile cut somewhere
    val bi = Quality.knBigramQuality(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getString(4))).toMap
    assert(got.exists(r => bi(r._1)._1 != r._4),
      "trigram KN scores identical to bigram KN — context inert")
    assert(got.exists(r => bi(r._1)._2 != r._5),
      "trigram KN terciles identical to bigram KN — no added stratification")
  }

  test("q254 4-gram KN: local replay, conservation, 4-gram context adds signal over trigram KN") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
      .filter(_._2.nonEmpty)
    val uni = docs.flatMap(_._2).groupBy(identity).map { case (w, g) =>
      w -> g.length.toLong }
    val nTotal = docs.map(_._2.length.toLong).sum
    val bgAll = docs.flatMap(_._2.sliding(2).filter(_.length == 2)
      .map(p => (p(0), p(1))))
    val cuv = bgAll.groupBy(identity).map { case (p, g) => p -> g.length.toLong }
    val cu = bgAll.groupBy(_._1).map { case (u, g) => u -> g.length.toLong }
    val n1u = cuv.keys.toSeq.groupBy(_._1).map { case (u, g) => u -> g.length.toLong }
    val n1v = cuv.keys.toSeq.groupBy(_._2).map { case (v, g) => v -> g.length.toLong }
    val tTypes = cuv.size.toLong
    val tgAll = docs.flatMap(_._2.sliding(3).filter(_.length == 3)
      .map(t => (t(0), t(1), t(2))))
    val c3 = tgAll.groupBy(identity).map { case (t, g) => t -> g.length.toLong }
    val ctxUv = c3.toSeq.groupBy(t => (t._1._1, t._1._2)).map { case (uv, g) =>
      uv -> (g.map(_._2).sum, g.length.toLong) } // (c2x, n1p_uv)
    val contVw = c3.keys.toSeq.groupBy(t => (t._2, t._3)).map { case (vw, g) =>
      vw -> g.length.toLong } // N1-(·vw)
    val contV = contVw.toSeq.groupBy(_._1._1).map { case (v, g) =>
      v -> (g.map(_._2).sum, g.length.toLong) } // (c'(v), N1+(v·))
    val qgAll = docs.flatMap(_._2.sliding(4).filter(_.length == 4)
      .map(q => (q(0), q(1), q(2), q(3))))
    val c4 = qgAll.groupBy(identity).map { case (q, g) => q -> g.length.toLong }
    val ctx3 = c4.toSeq.groupBy(q => (q._1._1, q._1._2, q._1._3))
      .map { case (tuv, g) =>
        tuv -> (g.map(_._2).sum, g.length.toLong) } // (c3x, N1+(tuv·))
    val cp3 = c4.keys.toSeq.groupBy(q => (q._2, q._3, q._4))
      .map { case (uvw, g) => uvw -> g.length.toLong } // N1-(·uvw)
    val cpUv = cp3.toSeq.groupBy(t => (t._1._1, t._1._2)).map { case (uv, g) =>
      uv -> (g.map(_._2).sum, g.length.toLong) } // (c'(uv), N1+'(uv·))
    def bits(x: Long): Long = java.lang.Long.toBinaryString(x).length - 1L
    def triBits(u: String, v: String, w: String): Long = {
      val (c2x, n1pUv) = ctxUv((u, v))
      val (cpv, n1pV) = contV(v)
      bits(16L * c2x * cpv * tTypes /
        ((4L * c3((u, v, w)) - 3L) * 4L * cpv * tTypes +
          3L * n1pUv * ((4L * contVw((v, w)) - 3L) * tTypes +
            3L * n1pV * n1v(w))))
    }
    val local = docs.map { case (id, ws) =>
      val first = bits(nTotal / uni(ws.head))
      val second = if (ws.length >= 2) {
        val (u, v) = (ws(0), ws(1))
        bits(4L * cu(u) * tTypes /
          ((4L * cuv((u, v)) - 3L) * tTypes + 3L * n1u(u) * n1v(v)))
      } else 0L
      val third =
        if (ws.length >= 3) triBits(ws(0), ws(1), ws(2)) else 0L
      val rest = ws.sliding(4).filter(_.length == 4).map { q =>
        val (t, u, v, w) = (q(0), q(1), q(2), q(3))
        val (c3x, n1pTuv) = ctx3((t, u, v))
        val (cpuv, n1ppUv) = cpUv((u, v))
        val (cpv, n1pV) = contV(v)
        bits(64L * c3x * cpuv * cpv * tTypes /
          ((4L * c4((t, u, v, w)) - 3L) * 16L * cpuv * cpv * tTypes +
            3L * n1pTuv * ((4L * cp3((u, v, w)) - 3L) * 4L * cpv * tTypes +
              3L * n1ppUv * ((4L * contVw((v, w)) - 3L) * tTypes +
                3L * n1pV * n1v(w)))))
      }.sum
      (id, ws.length.toLong, first + second + third + rest)
    }.map { case (id, n, sb) => (id, n, sb, sb * 1000 / n) }
    val n = local.length
    val sorted = local.map(_._4).sorted
    def cut(k: Int): Long =
      sorted.find(v => sorted.count(_ <= v) * 3 >= n * k).get
    val (t1, t2) = (cut(1), cut(2))
    val expected = local.map { case (id, nt, sb, s) =>
      (id, nt, sb, s,
        if (s <= t1) "head" else if (s <= t2) "middle" else "tail")
    }.toSet
    val got = Quality.knFourgramQuality(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSet
    assert(got === expected, "4-gram KN diverged from the local LM")
    // token conservation: 1 uni + 1 bi + 1 tri + (n−3) 4-gram scores
    // per n-word document
    assert(got.toSeq.map(_._2).sum === nTotal)
    assert(got.groupBy(_._5).keySet === Set("head", "middle", "tail"))
    // the 4↔3 disagreement diagonal must be non-empty — measured 66%
    // of sf0.01 docs move tercile, the justification for the order
    val tri = Quality.knTrigramQuality(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getString(4))).toMap
    assert(got.exists(r => tri(r._1)._1 != r._4),
      "4-gram KN scores identical to trigram KN — context inert")
    assert(got.exists(r => tri(r._1)._2 != r._5),
      "4-gram KN terciles identical to trigram KN — no added stratification")
  }

  test("r15 merged KN level tables equal the unmerged count-table joins") {
    // bi2/tri3/quad4 are pure re-associations of the same inner
    // equi-joins the scorers used to run per query; any drift here
    // would silently move four oracle-hashed quality stratifiers
    val nt = Quality.ngramTablesCached(spark, sf0001)
    val bi = nt.cb.join(nt.cu, Seq("u")).join(nt.nv, Seq("v"))
    assert(nt.bi2.count() === bi.count())
    assert(nt.bi2.select(bi.columns.map(col): _*).except(bi).isEmpty &&
      bi.except(nt.bi2.select(bi.columns.map(col): _*)).isEmpty)
    val tri = nt.c3.join(nt.ctx, Seq("u", "v"))
      .join(nt.contVw, Seq("v", "w")).join(nt.contV, Seq("v"))
      .join(nt.nv.withColumnRenamed("v", "w"), Seq("w"))
    assert(nt.tri3.count() === tri.count())
    assert(nt.tri3.select(tri.columns.map(col): _*).except(tri).isEmpty &&
      tri.except(nt.tri3.select(tri.columns.map(col): _*)).isEmpty)
    val quad = nt.c4.join(nt.ctx3, Seq("t", "u", "v"))
      .join(nt.cp3, Seq("u", "v", "w")).join(nt.cpUv, Seq("u", "v"))
      .join(nt.contVw, Seq("v", "w")).join(nt.contV, Seq("v"))
      .join(nt.nv.withColumnRenamed("v", "w"), Seq("w"))
    assert(nt.quad4.count() === quad.count())
    assert(nt.quad4.select(quad.columns.map(col): _*).except(quad).isEmpty &&
      quad.except(nt.quad4.select(quad.columns.map(col): _*)).isEmpty)
  }
}
