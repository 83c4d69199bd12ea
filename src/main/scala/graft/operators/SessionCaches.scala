package graft.operators

/** Registry of every per-JVM memoization cache (session fixtures,
  * trained-artifact checkpoints, bucketed-table names). Each caching
  * module registers its cache handle at object initialization — an
  * untouched module holds an empty cache and needs no handling, so
  * init-time registration covers exactly the populated set.
  *
  * The ONE consumer is `QueryBuildTraitSpec`'s construction sweep:
  * the `QueryTraits.executesOnBuild` invariant is defined against
  * construction from a known cache state, which is only observable
  * with the ability to clear every cache (cold start) and to restore
  * a snapshot (per-query isolation). Both are always safe — every
  * builder is idempotent and rebuilds into the same map — just
  * wasteful, which is why nothing else calls them.
  */
private[graft] object SessionCaches {
  final case class Handle(clear: () => Unit, snapshot: () => () => Unit)

  private val handles = scala.collection.mutable.ArrayBuffer.empty[Handle]

  /** `clear` empties the cache; `snapshot` captures current contents
    * and returns a restorer that resets the cache to exactly that
    * state (dropping anything added since). Both must take the
    * module's own lock if the cache has one.
    */
  def register(clear: () => Unit, snapshot: () => () => Unit): Unit =
    synchronized { handles += Handle(clear, snapshot) }

  private[graft] def clearAll(): Unit =
    synchronized { handles.foreach(_.clear()) }

  /** Capture every registered cache; the returned thunk restores all
    * of them to the captured state.
    */
  private[graft] def snapshotAll(): () => Unit = synchronized {
    val restorers = handles.map(_.snapshot()).toList
    () => restorers.foreach(_.apply())
  }

  /** The common case: a TrieMap guarded by `lock`. */
  def registerMap[K, V](lock: AnyRef,
      m: scala.collection.concurrent.TrieMap[K, V]): Unit =
    register(
      () => lock.synchronized { m.clear(); () },
      () => {
        val copy = lock.synchronized(m.readOnlySnapshot().toMap)
        () => lock.synchronized { m.clear(); m ++= copy; () }
      })
}
