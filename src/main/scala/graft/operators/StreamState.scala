package graft.operators

import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

/** The `transformWithState` processor classes behind q98 (ValueState
  * online features), q101 (event-time retirement timers), q130
  * (MapState cross-batch top-k), and q131 (ListState recent-history
  * buffers), with their row/state/output records (top-level so the
  * product encoders resolve). Split from `Streaming.scala`: the
  * processors are self-contained state machines; the queries that
  * drive them stay there.
  */
case class TypeTopOut(event_type: String, seq: Long, rnk: Int,
  user_id: Long, n_cells: Long)

/** q130's [[org.apache.spark.sql.streaming.StatefulProcessor]]: the
  * MAP-STATE half of the transformWithState API (q98/q101 exercise
  * ValueState + timers + TTL): one `MapState[user → live-cell count]`
  * per event type, accumulated ACROSS micro-batches, with the
  * current top-k emitted per batch tagged by an emission sequence
  * (a ValueState counter) — the consumer keeps each key's LAST
  * emission, i.e. the final snapshot. Exact top-k over updatable
  * counts requires the full per-key map (a bounded top-k heap can't
  * handle a lower-ranked user overtaking later); state is entities
  * per type, the same bound a batch groupBy's shuffle carries, and
  * the per-batch emission scan is what a production processor would
  * amortize behind a timer cadence.
  */
class TypeTopUsersProcessor(k: Int) extends org.apache.spark.sql.streaming
    .StatefulProcessor[String, (String, Long), TypeTopOut] {
  import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig}
  @transient private var counts: org.apache.spark.sql.streaming.MapState[Long, Long] = _
  @transient private var seq: org.apache.spark.sql.streaming.ValueState[Long] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    counts = getHandle.getMapState[Long, Long]("counts",
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    seq = getHandle.getValueState[Long]("seq",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
  }
  override def handleInputRows(key: String, rows: Iterator[(String, Long)],
      timers: TimerValues): Iterator[TypeTopOut] = {
    rows.foreach { case (_, uid) =>
      val cur = if (counts.containsKey(uid)) counts.getValue(uid) else 0L
      counts.updateValue(uid, cur + 1L)
    }
    val s = (if (seq.exists()) seq.get() else 0L) + 1L
    seq.update(s)
    val top = counts.iterator().map { p => (p._1, p._2) }.toVector
      .sortBy { case (uid, n) => (-n, uid) }.take(k)
    top.iterator.zipWithIndex.map { case ((uid, n), i) =>
      TypeTopOut(key, s, i + 1, uid, n)
    }
  }
}

case class RecentCell(us: Long, name: String, vbytes: Long)
case class RecentOut(user_id: Long, seq: Long, n_recent: Int,
  earliest_us: Long, latest_us: Long, value_bytes: Long)

/** q131's [[org.apache.spark.sql.streaming.StatefulProcessor]]: the
  * LIST-STATE third of the transformWithState API (ValueState/timers:
  * q98/q101; MapState: q130): a BOUNDED per-user buffer of the n most
  * recent cells (by write-time, name-tiebroken), rewritten with
  * `put()` each batch after merging arrivals — state per user is n
  * rows by construction, whatever the history length, which is the
  * whole point of a recent-history feature buffer. Emits the buffer
  * summary per batch, seq-tagged like q130 so the consumer keeps the
  * final snapshot.
  */
class RecentBufferProcessor(n: Int) extends org.apache.spark.sql.streaming
    .StatefulProcessor[Long, (Long, Long, String, Long), RecentOut] {
  import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig}
  @transient private var buf: org.apache.spark.sql.streaming.ListState[RecentCell] = _
  @transient private var seq: org.apache.spark.sql.streaming.ValueState[Long] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    buf = getHandle.getListState[RecentCell]("recent",
      org.apache.spark.sql.Encoders.product[RecentCell], TTLConfig.NONE)
    seq = getHandle.getValueState[Long]("seq",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
  }
  override def handleInputRows(key: Long,
      rows: Iterator[(Long, Long, String, Long)],
      timers: TimerValues): Iterator[RecentOut] = {
    val arrivals = rows.map { case (_, us, nm, vb) => RecentCell(us, nm, vb) }
    // (us DESC, name DESC) — the reverse of the natural (us, name) order
    val kept = (buf.get().toVector ++ arrivals)
      .sorted(Ordering.by[RecentCell, (Long, String)](c => (c.us, c.name)).reverse)
      .take(n)
    buf.put(kept.toArray)
    val s = (if (seq.exists()) seq.get() else 0L) + 1L
    seq.update(s)
    Iterator.single(RecentOut(key, s, kept.size,
      kept.map(_.us).min, kept.map(_.us).max, kept.map(_.vbytes).sum))
  }
}

case class UserFeatAcc(n: Long, vc: Long, last_us: Long)
case class UserFeatOut(user_id: Long, n_events: Long, sum_vc: Long,
  last_us: Long)

/** q98's [[org.apache.spark.sql.streaming.StatefulProcessor]]: ONE
  * ValueState row per user holding (event count, value-cents sum, last
  * event µs) — the online feature-store shape, expressed in Spark 4's
  * transformWithState API (typed state variables + TTLConfig +
  * timers) rather than the single-blob flatMapGroupsWithState state.
  * State lifecycle is covered by this processor's two dedicated
  * companions, matching the API's own split: TTL state is
  * processing-time-ONLY (EventTime mode throws
  * `STATEFUL_PROCESSOR_INCORRECT_TIME_MODE_TO_ASSIGN_TTL`, and under
  * AvailableNow a pending TTL keeps requesting wrap-up batches until
  * wall time passes it — inherently not oracle-checkable), so the
  * TTLConfig knob is proven by a spec-local processor with a
  * sub-second TTL that wall time CAN pass (PipelineSpec "state TTL");
  * event-time retirement, which IS deterministic, is q101's
  * driver-checked [[RetiringFeatureProcessor]].
  */
class UserFeatureProcessor extends org.apache.spark.sql.streaming
    .StatefulProcessor[Long, (Long, Long, Long), UserFeatOut] {
  import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig}
  @transient private var st: org.apache.spark.sql.streaming.ValueState[UserFeatAcc] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[UserFeatAcc]("features",
      org.apache.spark.sql.Encoders.product[UserFeatAcc], TTLConfig.NONE)
  override def handleInputRows(key: Long, rows: Iterator[(Long, Long, Long)],
      timers: TimerValues): Iterator[UserFeatOut] = {
    var acc = if (st.exists()) st.get() else UserFeatAcc(0L, 0L, Long.MinValue)
    rows.foreach { case (_, vc, us) =>
      acc = UserFeatAcc(acc.n + 1, acc.vc + vc, math.max(acc.last_us, us))
    }
    st.update(acc)
    Iterator.single(UserFeatOut(key, acc.n, acc.vc, acc.last_us))
  }
}

/** q101's [[org.apache.spark.sql.streaming.StatefulProcessor]]: q98's
  * per-user feature accumulator plus the state-LIFECYCLE half of the
  * transformWithState API that q98 leaves dormant — an EVENT-TIME
  * retirement timer per user and a `TTLConfig` on the state variable.
  * Each input batch replaces the user's single timer with
  * `last-event-ms + ttlMs`; when the event-time watermark passes it,
  * [[handleExpiredTimer]] emits the user's final feature vector and
  * DROPS the state — the mechanism that keeps a 100 TB feature store's
  * state proportional to ACTIVE users, not ever-seen users. A user who
  * re-appears after retirement re-accumulates from zero (proven by
  * spec). State TTLConfig is NONE by engine contract: TTL state is
  * processing-time-only and EventTime mode rejects it
  * (`STATEFUL_PROCESSOR_INCORRECT_TIME_MODE_TO_ASSIGN_TTL`); the
  * processing-time knob is exercised by [[UserFeatureProcessor]].
  *
  * Timer semantics pinned against the engine: a timer fires iff
  * `expiryMs <= watermarkMs` where `watermarkMs = floor(max event-time
  * µs / 1000) - delay` — the oracle mirrors exactly that comparison.
  */
class RetiringFeatureProcessor(ttlMs: Long) extends org.apache.spark.sql
    .streaming.StatefulProcessor[Long, (Long, Long, Long), UserFeatOut] {
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimeMode, TimerValues, TTLConfig}
  @transient private var st: org.apache.spark.sql.streaming.ValueState[UserFeatAcc] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[UserFeatAcc]("features",
      org.apache.spark.sql.Encoders.product[UserFeatAcc], TTLConfig.NONE)
  override def handleInputRows(key: Long, rows: Iterator[(Long, Long, Long)],
      timers: TimerValues): Iterator[UserFeatOut] = {
    var acc = if (st.exists()) st.get() else UserFeatAcc(0L, 0L, Long.MinValue)
    rows.foreach { case (_, vc, us) =>
      acc = UserFeatAcc(acc.n + 1, acc.vc + vc, math.max(acc.last_us, us))
    }
    st.update(acc)
    // exactly one retirement timer per key: replace any earlier one
    getHandle.listTimers().foreach(getHandle.deleteTimer)
    getHandle.registerTimer(acc.last_us / 1000 + ttlMs)
    Iterator.empty
  }
  override def handleExpiredTimer(key: Long, timers: TimerValues,
      info: ExpiredTimerInfo): Iterator[UserFeatOut] = {
    // guard: state could already be gone (TTL eviction in a long-lived
    // deployment); a timer without state retires silently
    if (!st.exists()) Iterator.empty
    else {
      val acc = st.get()
      st.clear()
      Iterator.single(UserFeatOut(key, acc.n, acc.vc, acc.last_us))
    }
  }
}

/** q255 records: one exploded (band key, doc) arrival, one in-window
  * state entry, and the emitted row (kind 0 = exported content tuple,
  * kind 1 = quarantine notice for the pair's event-time-later member).
  * `hsh` is the BOTTOM-K shingle sketch (the k smallest distinct
  * 3-shingle hashes, ascending — [[graft.operators.StreamCurate.NdsSketchK]]),
  * not the full array: it caps per-doc window state (and per-arrival
  * shuffle bytes) at k longs instead of O(doc length), and the
  * [[graft.tools.SketchParity]] calibration measured zero verdict
  * divergence vs the exact kernel before the switch. Top-level for
  * the product encoders.
  */
case class NdsIn(bkey: String, ts: Long, h: String, hsh: Array[Long],
  payload: String)
case class NdsEntry(ts: Long, h: String, hsh: Array[Long])
case class NdsOut(kind: Int, h: String, ts: Long, payload: String)

/** q255's [[org.apache.spark.sql.streaming.StatefulProcessor]]: the
  * STREAMING NEAR-DUP SCREEN — per MinHash band key, a ListState
  * window of the docs whose event time can still pair with a future
  * arrival (retention: watermark ≤ ts + horizon, enforced every
  * batch), against which each arrival is Jaccard-≥-1/2-verified over
  * bottom-k shingle sketches ([[Dedup.bottomKVerdict]] — exact q15
  * integer form whenever the union fits the sketch, the calibrated
  * estimator beyond). A verified pair
  * within the horizon emits a quarantine NOTICE for its event-time-
  * LATER member (ties h-broken) — decided from EVENT time, not
  * arrival order, so the verdict is batch-split-invariant: whichever
  * member arrives second finds the other in the window and the same
  * loser is named. Arrivals are processed in (ts, h) order within the
  * batch (same-batch pairs resolve deterministically) and an arrival
  * whose exact (ts, h) is already windowed is the at-least-once
  * redelivery — collapsed silently, emitting nothing. Every NEW
  * (ts, h) emits its content tuple ONCE, from the band-0 bucket only
  * (kind 0): band keys embed their band index as the leading
  * component ([[Dedup.bandKeysCol]]), every doc owns exactly one key
  * per band, and all bands see the same arrivals — so gating the
  * content emit on `key.startsWith("0:")` cuts the export write
  * volume (and the read-back DISTINCT's shuffle input) 4× with an
  * identical export set: exactly q208's gate composition. Notices
  * keep flowing from ALL bands (each bucket sees different
  * candidates — that is the LSH). The read-back DISTINCT still
  * stands, for cross-restart redelivery copies.
  *
  * Scale: state per band group is the horizon window's docs at k
  * longs each (the bottom-k sketch, ×NumBands across groups) —
  * bounded by the watermark clock, never the corpus OR the doc
  * length; candidate verification is
  * band-bucket-local (the q15 LSH economics, online), and a band
  * bucket holds ~horizon/corpus-dup-rate entries, never an unbounded
  * chain. Cross-horizon pairs are the nightly sweep's job (q211) —
  * the stream screens what a bounded window CAN see, the batch
  * backstop converges the rest.
  */
class NearDupScreenProcessor(horizonUs: Long, sketchK: Int)
    extends org.apache.spark.sql
    .streaming.StatefulProcessor[String, NdsIn, NdsOut] {
  import org.apache.spark.sql.streaming.{TimerValues, TTLConfig}
  @transient private var win: org.apache.spark.sql.streaming.ListState[NdsEntry] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    win = getHandle.getListState[NdsEntry]("window",
      org.apache.spark.sql.Encoders.product[NdsEntry], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[NdsIn],
      timers: TimerValues): Iterator[NdsOut] = {
    val arrivals = rows.toVector.sortBy(r => (r.ts, r.h))
    var window = win.get().toVector
    val out = Vector.newBuilder[NdsOut]
    // the 4×-amplification guard: content tuples leave from band 0's
    // bucket alone; the other bands contribute candidates/notices only
    val emitContent = key.startsWith("0:")
    arrivals.foreach { r =>
      if (!window.exists(e => e.ts == r.ts && e.h == r.h)) {
        if (emitContent) out += NdsOut(0, r.h, r.ts, r.payload)
        window.foreach { e =>
          // same-h entries are exact-dup CONTENT at another event time:
          // exact dedup's jurisdiction (the read-back DISTINCT), never a
          // near-dup quarantine
          if (e.h != r.h && math.abs(r.ts - e.ts) <= horizonUs) {
            if (Dedup.bottomKVerdict(e.hsh, r.hsh, sketchK)) {
              val eLoses = r.ts < e.ts || (r.ts == e.ts && r.h < e.h)
              out += (if (eLoses) NdsOut(1, e.h, e.ts, "")
                      else NdsOut(1, r.h, r.ts, ""))
            }
          }
        }
        window = window :+ NdsEntry(r.ts, r.h, r.hsh)
      }
    }
    // event-time retention: an entry can still name (or lose to) a
    // future in-watermark arrival only while watermark ≤ ts + horizon.
    // `kept` can be EMPTY despite arrivals (a straggler older than
    // wm − horizon evicts itself immediately) — clear, never put([])
    val wmUs = timers.getCurrentWatermarkInMs() * 1000L
    val kept = window.filter(_.ts + horizonUs >= wmUs)
    if (kept.isEmpty) win.clear() else win.put(kept.toArray)
    // the q101 lifecycle discipline: a band bucket that never sees
    // another arrival must still retire its window — one event-time
    // timer at the LAST entry's expiry sweeps it (without this, state
    // is bounded only for ACTIVE buckets; dormant ones would hold
    // their last window forever)
    getHandle.listTimers().foreach(getHandle.deleteTimer)
    if (kept.nonEmpty)
      getHandle.registerTimer(
        kept.map(_.ts).max / 1000 + horizonUs / 1000 + 1)
    out.result().iterator
  }

  override def handleExpiredTimer(key: String, timers: TimerValues,
      info: org.apache.spark.sql.streaming.ExpiredTimerInfo)
      : Iterator[NdsOut] = {
    val wmUs = timers.getCurrentWatermarkInMs() * 1000L
    val kept = win.get().toVector.filter(_.ts + horizonUs >= wmUs)
    if (kept.isEmpty) win.clear()
    else {
      // unreachable by construction (handleInputRows points the single
      // timer at the LAST entry's expiry, so when it fires the whole
      // window is past retention) — kept defensively, but the re-armed
      // timer must land strictly beyond the current watermark or a
      // reachable path would re-fire it every batch without advancing
      win.put(kept.toArray)
      getHandle.registerTimer(math.max(
        kept.map(_.ts).max / 1000 + horizonUs / 1000 + 1,
        timers.getCurrentWatermarkInMs() + 1))
    }
    Iterator.empty
  }
}

/** Structured Streaming path: the q26 daily aggregation executed as a
  * stream — `readStream` file source → event-time derivation +
  * watermark → stateful groupBy → memory sink, driven to completion
  * with `Trigger.AvailableNow`. Batch/stream parity is the check: the
  * result must hash-match the SAME DuckDB oracle as the batch q26.
  *
  * Scale: this is the incremental-ingest shape — at 100 TB the file
  * source discovers new parquet files per micro-batch and state is
  * bounded by (day_bucket × event_type); `collect_set(user_id)` is the
  * one deliberately-bounded-cardinality piece (distinct aggregation is
  * unsupported in streaming), acceptable because users-per-day is
  * bounded; an unbounded-cardinality deployment would switch to
  * approx_count_distinct.
  */
