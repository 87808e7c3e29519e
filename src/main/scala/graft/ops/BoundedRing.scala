package graft.ops

/** ONE definition of the bounded in-memory event ring the driver-side
  * observability logs share (ResultCache's cache decisions, RouteLog's
  * routing decisions): a ConcurrentLinkedDeque paired with an explicit
  * size counter — `size` on the deque itself is O(n), so at the bound
  * every append would otherwise scan the whole ring. Eviction drops
  * from the HEAD (oldest); consumers that diff windows across the ring
  * must therefore key on monotonic counters/stamps carried IN their
  * events, never on offsets into the ring. Concurrency-sensitive bits
  * (the paired-poll drain — a clear()+set(0) would race an interleaved
  * add and leave the counter permanently off the deque) live here once
  * instead of per consumer. */
private[graft] final class BoundedRing[T](max: Int) {
  private val log = new java.util.concurrent.ConcurrentLinkedDeque[T]()
  private val count = new java.util.concurrent.atomic.AtomicInteger(0)

  def add(e: T): Unit = {
    log.addLast(e)
    if (count.incrementAndGet() > max && log.pollFirst() != null)
      count.decrementAndGet()
  }

  /** The recorded events, oldest first. */
  def snapshot: Seq[T] = {
    val it = log.iterator()
    val b = Seq.newBuilder[T]
    while (it.hasNext) b += it.next()
    b.result()
  }

  /** Drain via paired polls — see the class doc for why never
    * clear()+set(0). */
  def drain(): Unit =
    while (log.pollFirst() != null) count.decrementAndGet()
}
