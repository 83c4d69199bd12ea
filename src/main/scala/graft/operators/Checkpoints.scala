package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage-truncation shim: `df.cp(...)` is `df.localCheckpoint(...)`
  * in every normal run (Verify, Bench, tests, user code — the flag is
  * never set there), and the identity under [[planAudit]], which ONLY
  * [[graft.tools.ScaleAudit]] sets, per query, for queries that do
  * not execute at construction.
  *
  * Why: localCheckpoint truncates the plan, so post-hoc inspection of
  * a checkpointing query sees `Scan ExistingRDD` stubs where the
  * expensive half of the pipeline ran — shuffle/broadcast counts in
  * SCALE.md silently under-reported q125/q127/q134/q137/q150/q151/
  * q159/q160/q161-class queries. With the audit flag on, the SAME
  * query builder yields the full un-truncated plan for counting.
  *
  * Only LAZY checkpoints (`eager = false` — the per-query
  * share-one-scan truncations) are bypassed. Eager checkpoints mark
  * session-shared derived ARTIFACTS (trained centroids/codebooks, the
  * consolidated co-purchase graph) whose production analogue is a
  * persisted model/materialized view: inlining their training into
  * every consumer's row would misattribute amortized build cost
  * (q97 would read as ~90 shuffles), so they stay materialized-input
  * boundaries and their build pipelines get their OWN audit rows
  * (`fixture:*` via each module's `fixturePlans`). Audit mode is safe
  * for on-build queries too: their fixpoint loops truncate through
  * [[CpOps.cpIter]], which ignores the flag precisely so iterative
  * lineage stays bounded — a construction that executes under audit
  * mode at worst recomputes a shared single-pass frame per round.
  * The audit never executes the frames it inspects beyond what the
  * builders themselves execute.
  */
private[graft] object Checkpoints {
  @volatile var planAudit: Boolean = false

  implicit final class CpOps(private val df: DataFrame) extends AnyVal {
    def cp(eager: Boolean = false): DataFrame =
      if (planAudit && !eager) df else df.localCheckpoint(eager)

    /** Iteration barrier: ALWAYS truncates, audit or not. A fixpoint
      * round's output references the previous round twice (self ∪
      * messages), so an un-truncated unroll doubles the plan tree per
      * round (2^rounds branches — q160 printed as 25k shuffles).
      * Loops get audit visibility from dedicated `auditPlans` rows
      * (the pre-loop pipeline + ONE round) instead.
      */
    def cpIter(): DataFrame = df.localCheckpoint(false)
  }
}
