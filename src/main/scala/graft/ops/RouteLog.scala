package graft.ops

/** Route-decision observability — the ResultCache decision-log
  * discipline applied to the MEASURED routers (ann auto-route, the
  * MaxSim single/batch routers): every routing choice lands in a
  * bounded in-memory ring so the bench can fold CHOSEN ROUTE per row
  * into the recorded board (the `routes` column next to
  * `fixtureBuilds`) — a routing flip between rounds is then visible in
  * the artifact, not just in stderr logs. Driver-side state only,
  * never part of a query answer.
  *
  * `seq` is a monotonic stamp: a consumer diffing a window (the
  * bench's per-row capture) filters on `seq > before` instead of
  * indexing into the ring, so eviction at the bound never misattributes
  * decisions (the ResultCache offset-staleness lesson).
  */
object RouteLog {

  /** One routing decision: `site` is the router (e.g. "maxsim-batch"),
    * `choice` the arm it picked (e.g. "indexed"). */
  final case class RouteDecision(seq: Long, site: String, choice: String)

  private val ring = new BoundedRing[RouteDecision](10000)
  private val seqGen = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Record a decision; returns its seq stamp. */
  def record(site: String, choice: String): Long = {
    val s = seqGen.incrementAndGet()
    ring.add(RouteDecision(s, site, choice))
    s
  }

  /** The latest issued seq — snapshot this before a window, then filter
    * `recent` on `seq > snapshot` to get exactly the window's decisions. */
  def latestSeq: Long = seqGen.get()

  /** The recorded decisions, oldest first. */
  def recent: Seq[RouteDecision] = ring.snapshot
}
