package graft.engine

/** Process-wide once-per-key staging with BLOCKING semantics.
  *
  * The per-module `set.add(key)` guards this replaces had a race: the
  * LOSER of the add returned immediately and read a table the winner
  * was still building. Harmless under a sequential Verify sweep, wrong
  * the moment queries run concurrently (parallel Verify, sbt's
  * parallel suites).
  *
  * The build runs OUTSIDE any map lock: `putIfAbsent` claims the key
  * with an incomplete CompletableFuture, the winner builds and
  * completes it, losers block on `join()`. The earlier
  * `computeIfAbsent` form held the ConcurrentHashMap BIN lock for the
  * whole build, so a build that (even transitively) staged another key
  * in the same bin could hit the map's recursive-update
  * IllegalStateException or livelock — hash-dependent and
  * nondeterministic. With the future form, unrelated keys never
  * serialize and a nested `once` for a DIFFERENT key is always safe.
  * (A build that re-enters `once` for its OWN key is a programming
  * error and self-deadlocks on join — same as any once-guard.)
  *
  * A build that throws removes its claim and completes the future
  * exceptionally, so every caller — the winner, anyone blocked on it,
  * and anyone arriving later — retries instead of consuming a
  * half-built table forever (the un-poisoning contract the old guards
  * had).
  *
  * Keys are namespaced by the OWNER — the guard-set instance each call
  * site already passes — compared by reference identity: several
  * staging features key on the same (applicationId, dir) tuple, and a
  * value-equality owner (an empty Set equals every other empty Set)
  * would silently fuse them into one build.
  */
object Staging {
  private final class IdKey(val owner: AnyRef, val k: Any) {
    override def hashCode: Int = System.identityHashCode(owner) * 31 + k.##
    override def equals(o: Any): Boolean = o match {
      case other: IdKey => (other.owner eq owner) && other.k == k
      case _ => false
    }
  }

  private val done = new java.util.concurrent.ConcurrentHashMap[
    IdKey, java.util.concurrent.CompletableFuture[Unit]]()

  @annotation.tailrec
  def once(owner: AnyRef, key: Any)(build: => Unit): Unit = {
    val k = new IdKey(owner, key)
    val fresh = new java.util.concurrent.CompletableFuture[Unit]()
    val existing = done.putIfAbsent(k, fresh)
    if (existing == null) {
      try { build; fresh.complete(()); () }
      catch {
        case t: Throwable =>
          done.remove(k, fresh)
          fresh.completeExceptionally(t)
          throw t
      }
    } else {
      val ok =
        try { existing.join(); true }
        catch {
          // the claimant's build failed (it already removed the claim);
          // retry — this caller may become the new builder
          case _: java.util.concurrent.CompletionException |
               _: java.util.concurrent.CancellationException => false
        }
      if (!ok) once(owner, key)(build)
    }
  }
}
