package graft.engine

/** Process-wide once-per-key staging with BLOCKING semantics.
  *
  * The per-module `set.add(key)` guards this replaces had a race: the
  * LOSER of the add returned immediately and read a table the winner
  * was still building. Harmless under a sequential Verify sweep, wrong
  * the moment queries run concurrently (parallel Verify, sbt's
  * parallel suites). `ConcurrentHashMap.computeIfAbsent` runs the
  * builder under the key's bin lock, so concurrent callers for the
  * same key BLOCK until the build completes — and a build that throws
  * stores nothing, so the next caller (including one that was blocked
  * on the failing build) retries instead of consuming a half-built
  * table forever (the un-poisoning contract the old guards had).
  *
  * Keys are namespaced by the OWNER — the guard-set instance each call
  * site already passes — compared by reference identity: several
  * staging features key on the same (applicationId, dir) tuple, and a
  * value-equality owner (an empty Set equals every other empty Set)
  * would silently fuse them into one build.
  *
  * Different keys in the same hash bin serialize against each other —
  * a rare, bounded perf cost (staging keys number in the dozens),
  * never a correctness one.
  */
object Staging {
  private final class IdKey(val owner: AnyRef, val k: Any) {
    override def hashCode: Int = System.identityHashCode(owner) * 31 + k.##
    override def equals(o: Any): Boolean = o match {
      case other: IdKey => (other.owner eq owner) && other.k == k
      case _ => false
    }
  }

  private val done = new java.util.concurrent.ConcurrentHashMap[IdKey, AnyRef]()

  def once(owner: AnyRef, key: Any)(build: => Unit): Unit = {
    done.computeIfAbsent(new IdKey(owner, key), _ => { build; java.lang.Boolean.TRUE })
    ()
  }
}
