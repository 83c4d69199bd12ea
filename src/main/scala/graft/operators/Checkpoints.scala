package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage-truncation / share-one-scan shim — and, since round 15, the
  * engine's defense against a LOCK-ORDER DEADLOCK inside Spark's
  * checkpoint machinery, observed live in a bench sweep:
  *
  *   - `RDDCheckpointData.checkpoint()` (run by `doCheckpoint` at the
  *     END of EVERY `runJob`, on the calling thread) takes the GLOBAL
  *     `RDDCheckpointData` class monitor, then the RDD's own lock
  *     (`markCheckpointed`);
  *   - `DAGScheduler.getCacheLocs` (stage submission) takes the RDD's
  *     lock, then — via `RDD.partitions → checkpointRDD` — the global
  *     monitor.
  *
  *   A LAZILY-marked localCheckpoint RDD that first materializes
  *   under a `broadcast-exchange-*` thread's collect — while the DAG
  *   scheduler concurrently submits a shuffle stage whose lineage
  *   holds the same RDD (routine under AQE: a small cp'd frame
  *   consumed once broadcast, once shuffled) — deadlocks the whole
  *   SparkContext: `jstack` shows `dag-scheduler-event-loop` and
  *   `broadcast-exchange-155` each holding one monitor and waiting
  *   for the other, every executor idle, forever.
  *
  * The fix is structural — no lazily-marked checkpoint RDD may ever
  * exist where another thread's job can reach it:
  *
  *   - `cp()` (lazy share-one-scan) now PERSISTS (`MEMORY_AND_DISK`)
  *     instead of localCheckpointing: caching involves none of the
  *     checkpoint monitors, shares the one materialization across
  *     consumers exactly the same, and — unlike checkpoint blocks —
  *     survives unpersist-then-reuse (the lineage stays intact, a
  *     dropped frame silently recomputes instead of throwing
  *     "Checkpoint block not found"). Persisted private frames
  *     register here and the harness drains them per query
  *     ([[drainPrivate]]) so CacheManager entries and blocks can't
  *     accumulate across a 255-query sweep.
  *   - `cp(eager = true)` (session-shared trained artifacts) and
  *     `cpIter()` (fixpoint-loop barriers, which genuinely NEED plan
  *     truncation — an un-truncated unroll doubles the plan per
  *     round) keep `localCheckpoint`, but ALWAYS EAGER: the marking
  *     thread materializes the RDD immediately, so the
  *     mark-to-materialize window in which a broadcast thread could
  *     pick it up is gone, and at most one marked-unmaterialized RDD
  *     exists at any instant — the top of the currently-running
  *     eager job, which no broadcast subtree of that job contains.
  *
  * Audit interplay (unchanged): under [[planAudit]] — which ONLY
  * [[graft.tools.ScaleAudit]] sets — `cp()` is the identity, so
  * post-hoc inspection sees the full un-truncated, un-cached plan;
  * shuffle/broadcast counts in SCALE.md would otherwise silently
  * under-report q125/q127/q134/q137/q150/q151/q159/q160/q161-class
  * queries. Eager checkpoints stay materialized-input boundaries with
  * their own `fixture:*` audit rows, and [[CpOps.cpIter]] ignores the
  * flag precisely so iterative lineage stays bounded under audit too.
  */
private[graft] object Checkpoints {
  @volatile var planAudit: Boolean = false

  /** Per-query-private persisted frames since the last drain. Only
    * `cp(eager = false)` registers here — every memoized session
    * fixture is `cp(eager = true)` (checkpointed, not cached), so
    * draining can never strand a cross-query consumer: the worst case
    * for a drained frame is lazy recomputation.
    */
  private val privateCached =
    scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  private def persistPrivate(df: DataFrame): DataFrame = synchronized {
    df.persist()
    privateCached += df
    df
  }

  /** Unpersist every private frame registered since the last drain —
    * blocks AND CacheManager entries. Bench calls this after each
    * timed query, Verify after each dump; always safe (persist, not
    * checkpoint: dropped frames recompute from intact lineage).
    */
  private[graft] def drainPrivate(): Unit = synchronized {
    privateCached.foreach { df =>
      try df.unpersist(blocking = false)
      catch { case _: Throwable => () }
    }
    privateCached.clear()
  }

  implicit final class CpOps(private val df: DataFrame) extends AnyVal {
    def cp(eager: Boolean = false): DataFrame =
      if (eager) df.localCheckpoint(true)
      else if (planAudit) df
      else Checkpoints.persistPrivate(df)

    /** Iteration barrier: ALWAYS truncates (audit or not — a fixpoint
      * round's output references the previous round twice, so an
      * un-truncated unroll is 2^rounds branches; q160 printed as 25k
      * shuffles), and ALWAYS eager (see the deadlock note above: the
      * loop thread must be the one that materializes its own barrier).
      */
    def cpIter(): DataFrame = df.localCheckpoint(true)
  }
}
