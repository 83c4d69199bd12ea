package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation

/** Semantic checks for the curation operators (q49-q52) against
  * independently-computed ground truth on sf0.001.
  */
class CurationSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf0001, sf001}

  private val deny = Set("key", "hash", "secret", "token", "password")

  private lazy val docs: Map[Long, Array[String]] =
    graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
      .toMap

  test("q49 redaction: counts and rewritten text match a scala reimplementation") {
    val rows = Curation.redact(spark, sf0001).collect()
    assert(rows.length === docs.size)
    var hits = 0
    rows.foreach { r =>
      val ws = docs(r.getLong(0))
      val expN = ws.count(deny)
      val expText = ws.map(w => if (deny(w)) "[REDACTED]" else w).mkString(" ")
      assert(r.getInt(1) === expN)
      assert(r.getString(2) === expText)
      hits += expN
    }
    assert(hits > 0, "deny list must be non-vacuous on the corpus")
  }

  test("q50 repetition: fractions match brute-force multiset counts") {
    def maxRun[T](xs: Seq[T]): Int =
      xs.groupBy(identity).values.map(_.size).max
    val rows = Curation.repetition(spark, sf0001).collect()
    val expected = docs.filter(_._2.length >= 3)
    assert(rows.length === expected.size)
    rows.foreach { r =>
      val ws = docs(r.getLong(0)).toSeq
      val g2 = ws.sliding(2).map(_.mkString(" ")).toSeq
      val g3 = ws.sliding(3).map(_.mkString(" ")).toSeq
      assert(r.getAs[Int]("n_words") === ws.size)
      assert(r.getAs[Int]("top_word_run") === maxRun(ws))
      assert(r.getAs[Double]("top_word_frac")
        === maxRun(ws).toDouble / ws.size)
      assert(r.getAs[Double]("top_2gram_frac")
        === maxRun(g2).toDouble / g2.size)
      assert(r.getAs[Double]("dup_word_frac")
        === (ws.size - ws.distinct.size).toDouble / ws.size)
      assert(r.getAs[Double]("dup_2gram_frac")
        === (g2.size - g2.distinct.size).toDouble / g2.size)
      assert(r.getAs[Double]("dup_3gram_frac")
        === (g3.size - g3.distinct.size).toDouble / g3.size)
    }
    assert(rows.map(_.getAs[String]("rep_bucket")).distinct.length > 1,
      "bucket thresholds must split the corpus")
  }

  test("q51 contamination: probes self-match at overlap 1.0; counts match brute force") {
    def shingles(ws: Seq[String]): Set[String] =
      ws.sliding(3).map(_.mkString(" ")).toSet
    val found = Curation.contamination(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val probes = docs.filter { case (id, ws) => id % 50 == 0 && ws.length >= 3 }
    assert(probes.nonEmpty)
    // every probe leaks into the corpus as itself: overlap exactly 1.0
    probes.keys.foreach { p =>
      assert(found.contains((p, p)), s"probe $p must self-match")
      assert(found((p, p))._2 === 1.0)
    }
    // every reported pair matches the brute-force overlap
    found.foreach { case ((c, p), (nShared, overlap)) =>
      val sc = shingles(docs(c).toSeq)
      val sp = shingles(docs(p).toSeq)
      val inter = (sc & sp).size
      assert(nShared === inter.toLong, s"pair ($c,$p)")
      assert(overlap === inter.toDouble / sp.size)
      assert(overlap >= 0.5)
    }
  }

  test("q63 two-phase source cap equals the single-window top-N, cap binds") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // run at sf0.01 so sources (25 docs each) actually exceed the cap
    val dir = "/root/testdata/sf0.01"
    val got = Curation.sourceCap(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    // ground truth: ONE window over each full source
    val single = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        graft.functions.HashOps.md5_prefix60(concat(lit("cap:"),
          col("doc_id").cast("string"))).as("h"))
      .withColumn("rank_in_source", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))))
      .filter(col("rank_in_source") <= 12)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(3))).toSet
    assert(got === single)
    // the cap binds: every source is clipped to exactly 12 of its 25
    val perSource = got.groupBy(_._2).view.mapValues(_.size).toMap
    assert(perSource.values.forall(_ == 12), perSource.toString)
    assert(perSource.size == 20)
  }

  test("q70 boilerplate: strip-all per source matches a scala reimplementation") {
    val srcOf: Map[Long, String] =
      graft.sources.Tables.documents(spark, sf0001)
        .select(col("doc_id"), col("source")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    def chunksOf(ws: Array[String]): Seq[String] =
      ws.grouped(5).map(_.mkString(" ")).toSeq
    // inventory: (source, chunk) seen in >= 2 distinct docs
    val boiler: Set[(String, String)] = docs.toSeq
      .flatMap { case (id, ws) =>
        chunksOf(ws).distinct.map(c => (srcOf(id), c) -> id)
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size)
      .filter(_._2 >= 2).keys.toSet
    assert(boiler.nonEmpty, "threshold must be non-vacuous on the corpus")
    val rows = Curation.boilerplate(spark, sf0001).collect()
    assert(rows.length === docs.count(_._2.nonEmpty))
    var removedTotal = 0L
    rows.foreach { r =>
      val id = r.getLong(0)
      val cs = chunksOf(docs(id))
      val kept = cs.filterNot(c => boiler((srcOf(id), c)))
      assert(r.getLong(1) === cs.size.toLong, s"doc $id n_chunks")
      assert(r.getLong(2) === (cs.size - kept.size).toLong, s"doc $id n_boiler")
      val expText = if (kept.isEmpty) null else kept.mkString(" ")
      assert(r.getString(3) === expText, s"doc $id cleaned_text")
      removedTotal += cs.size - kept.size
    }
    // strip-ALL semantics: every instance of a boilerplate chunk goes,
    // so removals must be >= 2 per inventory entry
    assert(removedTotal >= 2L * boiler.size)
  }

  test("q52 stratified sample: deterministic, append-stable, rate-respecting") {
    val s1 = Curation.stratifiedSample(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val s2 = Curation.stratifiedSample(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(s1 === s2, "sample must be reproducible run-to-run")
    assert(s1.nonEmpty && s1.size < docs.size,
      "sample must be a proper subset")
    // per-stratum rate: en keeps more than zh on any non-trivial corpus
    val byLang = s1.groupBy(_._2).view.mapValues(_.size).toMap
    val total = graft.sources.Tables.documents(spark, sf0001)
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((lang, kept) <- byLang)
      assert(kept <= total(lang))
  }

  test("q100 pipeline verdicts cover the corpus and agree with component gates") {
    import graft.operators.{Dedup, TextAnalysis}
    val res = Curation.curationPipeline(spark, sf0001).cache()
    val nDocs = docs.size.toLong
    // exactly one verdict per document
    assert(res.count() === nDocs)
    assert(res.select("doc_id").distinct().count() === nDocs)
    // closed verdict vocabulary
    res.select("verdict").distinct().collect().map(_.getString(0)).foreach { v =>
      assert(Set("dup_exact", "dup_near", "no_mixture_slot", "sampled_out",
        "kept").contains(v) || v.startsWith("low_quality:"), s"verdict $v")
    }
    // gates fire in policy order: a kept doc passed EVERY earlier gate
    val kept = res.filter(col("verdict") === "kept")
    assert(kept.count() > 0)
    assert(kept.filter(col("quality_bucket") =!= "ok").count() === 0)
    // quality gate is authoritative: verdict low_quality iff bucket != ok
    val qual = TextAnalysis.quality(spark, sf0001)
      .select(col("doc_id"), col("quality_bucket").as("qb"))
    assert(res.join(qual, "doc_id")
      .filter((col("qb") =!= "ok") =!=
        col("verdict").startsWith("low_quality:")).count() === 0)
    // every dup_near names a minhash doc_b; every doc_b that reached the
    // near gate (quality ok, exact keeper) is flagged dup_near
    val near = Dedup.dedupMinhash(spark, sf0001)
      .select(col("doc_b").as("doc_id")).distinct()
    assert(res.filter(col("verdict") === "dup_near")
      .join(near, Seq("doc_id"), "left_anti").count() === 0)
    res.join(near, "doc_id").select("verdict").collect()
      .map(_.getString(0)).foreach { v =>
        assert(v == "dup_near" || v == "dup_exact" ||
          v.startsWith("low_quality:"), s"near-dup partner verdict $v")
      }
    res.unpersist()
    ()
  }

  /** The q172 packing invariants at an arbitrary stream count — the
    * fan-out is a cluster-scaled argument, so the contract must hold
    * at any value, not just the compiled default.
    */
  private def checkSequencePack(streams: Int): Unit = {
    val frags = Curation.sequencePack(spark, sf0001, streams).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(frags.nonEmpty)
    // stream ids land in [0, streams); at this corpus size every
    // stream is populated
    assert(frags.forall(f => f._1 >= 0 && f._1 < streams))
    assert(frags.map(_._1).distinct.length === streams)
    // every fragment is non-empty and fits the budget
    val budget = 64L
    frags.foreach { case (_, _, _, offDoc, offSeq, n) =>
      assert(n >= 1 && n <= budget && offDoc >= 0 &&
        offSeq >= 0 && offSeq + n <= budget)
    }
    // token conservation: each doc's fragments sum to its token count
    // and tile the doc contiguously from offset 0
    val byDoc = frags.groupBy(_._3)
    val nTokens = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        size(graft.functions.Portable.words(col("text"))).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byDoc.foreach { case (doc, fs) =>
      val sorted = fs.sortBy(_._4)
      assert(sorted.map(_._6).sum === nTokens(doc), s"doc $doc loses tokens")
      sorted.foldLeft(0L) { case (expect, f) =>
        assert(f._4 === expect, s"doc $doc gap at ${f._4}")
        expect + f._6
      }
      ()
    }
    // every sequence except each stream's LAST is exactly full, and
    // within a sequence the fragments tile [0, fill) contiguously
    val byStream = frags.groupBy(_._1)
    byStream.foreach { case (_, fs) =>
      val lastSeq = fs.map(_._2).max
      fs.groupBy(_._2).foreach { case (seq, sf) =>
        val fill = sf.map(_._6).sum
        if (seq < lastSeq) assert(fill === budget, s"seq $seq underfull")
        val sorted = sf.sortBy(_._5)
        sorted.foldLeft(0L) { case (expect, f) =>
          assert(f._5 === expect, s"seq $seq gap at ${f._5}")
          expect + f._6
        }
        ()
      }
    }
  }

  test("q172 packing: token conservation, full sequences, contiguous fragments") {
    checkSequencePack(graft.operators.Curation.PackStreams)
  }

  test("q172 packing holds at a non-default stream count") {
    checkSequencePack(3)
  }

  test("q175 temperature weights match an exact BigInt replay and flatten the mixture") {
    // independent replay: per-language token totals from the raw docs,
    // then the published integer formula in BigInt (no Spark exprs)
    val langs = graft.sources.Tables.documents(spark, sf0001)
      .select(col("lang"), col("text")).collect()
      .groupBy(_.getString(0))
      .map { case (l, rs) =>
        l -> rs.map(_.getString(1).split(" ").count(_.nonEmpty).toLong).sum
      }
    val rootSum = langs.values.map(n => math.sqrt(n.toDouble).toLong).sum
    val total = langs.values.sum
    val expected = langs.map { case (l, n) =>
      val w = BigInt(math.sqrt(n.toDouble).toLong) * 1000000 / rootSum
      val drawn = BigInt(total) * w / 1000000
      (l, n, BigInt(n) * 1000000 / total, w, drawn, drawn * 1000 / n)
    }.map { case (l, n, s, w, d, e) =>
      (l, n, s.toLong, w.toLong, d.toLong, e.toLong)
    }.toSet
    val rows = Curation.mixTemperature(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.toSet === expected)
    // normalization: weights sum to 10^6 minus at most one floor ulp
    // per language
    val wsum = rows.map(_._4).sum
    assert(wsum <= 1000000L && wsum > 1000000L - rows.length)
    // the flattening effect: the rarest language is up-sampled at
    // least as hard as any other, the head language the least
    val byTokens = rows.sortBy(_._2)
    assert(byTokens.head._6 === rows.map(_._6).max,
      "rarest language is not the most up-sampled")
    assert(byTokens.last._6 === rows.map(_._6).min,
      "head language is not the most down-sampled")
  }

  test("q184 affinity scores match an exact integer replay; target skews high") {
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val feats = docs.map { case (id, src, text) =>
      (id, src, text.split(" ").filter(_.nonEmpty)
        .map(w => h60("aff:" + w) % 256))
    }
    val cntS = feats.flatMap(_._3).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val cntT = feats.filter(_._2 == "src0").flatMap(_._3)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
      .withDefaultValue(0L)
    val (ns, nt) = (cntS.values.sum, cntT.values.sum)
    val expected = feats.filter(_._3.nonEmpty).map { case (id, src, fs) =>
      val st = fs.map(cntT).sum
      val ss = fs.map(cntS).sum
      val score = 1000L * st * ns / (ss * nt)
      (id, src, fs.length.toLong, score, if (score >= 1000) 1 else 0)
    }.toSet
    val rows = Curation.domainAffinity(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))
    assert(rows.toSet === expected)
    // the target domain must score itself above the corpus mean more
    // often than the rest — the discriminative floor that makes the
    // score usable for resampling at all
    val (tgt, rest) = rows.partition(_._2 == "src0")
    assert(tgt.nonEmpty && rest.nonEmpty)
    def selRate(xs: Array[(Long, String, Long, Long, Int)]) =
      xs.count(_._5 == 1).toDouble / xs.length
    assert(selRate(tgt) > selRate(rest),
      s"target select-rate ${selRate(tgt)} not above rest ${selRate(rest)}")
  }

  test("q188 FIM spans partition every doc exactly and replay the hash gates") {
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val rows = Curation.fimSpans(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, p, m, s, mode) =>
      // spans always partition the doc exactly
      assert(p + m + s === n, s"doc $id")
      assert(p >= 0 && m >= 0 && s >= 0, s"doc $id")
      val gate = h60("fimg:" + id) % 1000
      if (gate < 700) {
        val (u, v) = (h60("fim1:" + id) % n, h60("fim2:" + id) % n)
        assert(p === math.min(u, v) && m === math.abs(u - v), s"doc $id")
        assert(mode === (if (h60("fimm:" + id) % 2 == 0) "psm" else "spm"),
          s"doc $id")
      } else {
        assert((p, m, s, mode) === (n, 0L, 0L, "none"), s"doc $id")
      }
    }
    // both orderings and the pass-through gate all occur at this SF
    assert(Set("psm", "spm", "none").subsetOf(rows.map(_._6).toSet))
  }

  test("q200 curriculum: brute order replay; buckets ascend contiguously") {
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val expected = docs.toSeq
      .filter(_._2.nonEmpty)
      .map { case (id, ws) =>
        val dm = 1000L * ws.distinct.length / ws.length
        (dm / 250, h60("curr:" + id), id, dm)
      }
      .sortBy { case (b, h, id, _) => (b, h, id) }
      .zipWithIndex
      .map { case ((b, _, id, dm), i) => (id, dm, b, i + 1L) }
      .toSet
    val got = Curation.curriculumOrder(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === expected)
    // positions sorted by bucket: each bucket occupies one contiguous
    // range (the property a curriculum schedule consumes)
    val byPos = got.toSeq.sortBy(_._4).map(_._3)
    assert(byPos === byPos.sorted)
    assert(byPos.distinct.size >= 2, "fixture spans multiple buckets")
  }

  test("q201 decorrelation: brute pair agreement; hashing is near-uniform") {
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val shards = docs.keys.toSeq.map(id =>
      id -> (0 until 4).map(e => h60(s"epoch:$e:$id") % 8)).toMap
    val expected = (for {
      e1 <- 0 until 4; e2 <- (e1 + 1) until 4
    } yield {
      val n = shards.size.toLong
      val agree = shards.values.count(v => v(e1) == v(e2)).toLong
      (e1, e2, n, agree, 1000L * agree / n)
    }).toSet
    val got = Curation.shuffleDecorrelation(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got === expected)
    assert(got.size === 6, "all C(4,2) epoch pairs audited")
    // independent hashing predicts ~125 permille agreement (1/8); a
    // correlated salt would spike toward 1000
    assert(got.forall(_._5 < 400), got.toString)
  }

  test("q195 masks compose q172 fragments with q100 verdicts exactly") {
    val verdicts = Curation.curationPipeline(spark, sf0001)
      .select(col("doc_id"), col("verdict")).collect()
      .map(r => r.getLong(0) -> (r.getString(1) != "kept")).toMap
    val frags = Curation.sequencePack(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5)))
    val expected = frags.groupBy(f => (f._1, f._2)).map { case (k, fs) =>
      val masked = fs.filter(f => verdicts(f._3)).map(_._4).sum
      val total = fs.map(_._4).sum
      k -> (fs.length.toLong, total, masked,
        1000L * (total - masked) / total)
    }
    val got = Curation.lossMaskBudget(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got === expected)
    // token conservation: masking never changes the pack layout
    assert(got.values.map(_._2).sum === frags.map(_._4).sum)
    // the gate actually bites at this SF, and some sequences stay clean
    assert(got.values.exists(_._3 > 0) && got.values.exists(_._3 == 0))
  }

  test("q216 classifier inference matches a local replay and the threshold splits the corpus") {
    // sf0.01: same 500-doc corpus size; the trained model separates THIS
    // corpus (sf0.001's it scores all-negative — see SURVEY Â§8)
    // INFERENCE replayed locally — featurization (hash-bucketed
    // unigrams+bigrams) and the Σ w·cnt scorer — with the trained
    // model as input (its own bytes are pinned by q248's unrolled-SQL
    // oracle and ClassifierSpec; this test owns the APPLY step)
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
    }
    val wmap = graft.operators.Classifier.modelWeightMap(spark, sf001)
    val docs = graft.sources.Tables.documents(spark, sf001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val expected = docs.flatMap { case (id, text) =>
      val ws = text.split(" ").filter(_.nonEmpty)
      if (ws.isEmpty) None else {
        val grams = ws ++ ws.sliding(2).filter(_.length == 2)
          .map(_.mkString(" "))
        val score = grams.map(g =>
          wmap.getOrElse(h60("feat:" + g) % Curation.ClfBuckets, 0L)).sum
        Some(id -> ((grams.length.toLong, score,
          if (score >= Curation.ClfThreshold) 1 else 0)))
      }
    }.toMap
    val got = Curation.classifierScore(spark, sf001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3))))
      .toMap
    assert(got === expected)
    // the trained model is a real discriminator at this SF: both
    // verdicts occur, so downstream gate specs exercise both arms
    assert(got.values.exists(_._3 == 1) && got.values.exists(_._3 == 0))
  }

  test("q219 batch shaping matches a local replay and beats unbucketed batching") {
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
    }
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ")
        .count(_.nonEmpty).toLong))
      .filter(_._2 > 0)
      .map { case (id, n) => (id, n, h60(s"batch:$id")) }
    def batches(group: (Long, Long, Long) => (Int, Int))
        : Seq[(Int, Int, Long, Long, Long, Long)] =
      docs.groupBy { case (id, n, k) => group(id, n, k) }.toSeq
        .flatMap { case ((bucket, stream), rows) =>
          rows.sortBy { case (id, _, k) => (k, id) }
            .grouped(Curation.BatchDocs).zipWithIndex
            .map { case (b, i) =>
              val mx = b.map(_._2).max
              val sm = b.map(_._2).sum
              (bucket, stream, i.toLong, b.length.toLong, mx, sm)
            }
        }
    val expected = batches((_, n, k) =>
      (java.lang.Long.toBinaryString(n).length,
        (k % Curation.BatchStreams).toInt))
      .map { case (b, s, i, nd, mx, sm) =>
        (b, s, i, nd, mx, sm, 1000L * (nd * mx - sm) / (nd * mx))
      }.toSet
    val got = Curation.batchShaping(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got === expected)
    // the justification: same corpus, same order, same batch size —
    // bucketing strictly reduces total padded tokens here
    def waste(rows: Seq[(Int, Int, Long, Long, Long, Long)]): Long =
      rows.map { case (_, _, _, nd, mx, sm) => nd * mx - sm }.sum
    val unbucketed = batches((_, _, k) =>
      (0, (k % Curation.BatchStreams).toInt))
    assert(waste(batches((_, n, k) =>
      (java.lang.Long.toBinaryString(n).length,
        (k % Curation.BatchStreams).toInt))) < waste(unbucketed),
      "bucketing must reduce padding waste or the operator is pointless")
    // non-default stream shape conserves every document exactly once
    val twoStream = Curation.batchShaping(spark, sf0001, streams = 2)
      .agg(sum(col("n_docs"))).head().getLong(0)
    assert(twoStream === docs.length.toLong)
  }
}
