package graft.util

/** Access-ordered LRU map bounded at `max` entries — the shared shape of
  * the session memo caches ([[graft.ops.KMeans]] `modelCache`,
  * [[graft.ops.PQ]] `refineCache`/`calFloorCache`,
  * [[graft.ops.Similarity]] `tuneCache`). Each keys on a canonicalized
  * logical plan, which retains file-index state, so an unbounded map in a
  * long-lived session querying many corpora would accumulate analyzed
  * plans forever; 32 entries covers any realistic number of
  * concurrently-served corpora while keeping retention O(1).
  *
  * Thread safety: `Collections.synchronizedMap` — its `computeIfAbsent`
  * runs under the wrapper mutex, so concurrent callers of the memoized
  * derivations compute each key at most once per residence.
  */
object BoundedLru {
  def apply[K, V](max: Int = 32): java.util.Map[K, V] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
        override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
          size() > max
      })
}
