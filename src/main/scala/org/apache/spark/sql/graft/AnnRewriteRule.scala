package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, IntegerType, NumericType}

import graft.vector.IndexBuilder.RandomHyperplaneLsh

/** Optimizer rule: rewrite an exact k-NN plan over an LSH-indexed corpus
  * into a multi-probe bucket-pruned scan (SURVEY.md §4's optional
  * perf-only rewrite — the declarative analog of ChromaDB answering a
  * similarity query from its HNSW index instead of a full scan,
  * `query_rag_database.py:361`).
  *
  * Pattern:  Limit k ─ Sort [score DESC, …] ─ …plan whose output carries a
  * `bucket` column and whose `score` is (any expression over)
  * `graft_dot(embedding, <literal query vector>)`.
  *
  * Rewrite:  the same plan with `bucket IN <multi-probe set>` injected
  * below the Sort. The probe set is computed at plan time from the literal
  * query vector with the SAME seeded hyperplanes that built the index;
  * Catalyst then pushes the IN-filter to the scan, where it becomes
  * partition/file pruning on a `partitionBy("bucket")` index table — the
  * full corpus is never read.
  *
  * This trades exactness for scan volume (ANN semantics: recall < 1.0 is
  * possible), so it is strictly OPT-IN via session conf and OFF by
  * default — enabling it is the user declaring "my ORDER BY dot LIMIT k
  * queries may be answered approximately from the index":
  *
  *   spark.graft.ann.rewrite = true        // master switch (default false)
  *   spark.graft.ann.nBits   = <int>       // must match the index build
  *   spark.graft.ann.seed    = <long>      // must match the index build
  *   spark.graft.ann.radius  = <int>       // multi-probe Hamming radius
  *
  * Plans carrying a `cluster_id` column instead take the IVF route:
  * `cluster_id IN <nProbe nearest centroids>`, ranked at plan time against
  * the centroid sidecar of the index table —
  *
  *   spark.graft.ann.ivf.centroidsPath = <index table dir>
  *   spark.graft.ann.ivf.nProbe        = <int>   (default 4)
  */
object AnnRewriteRule extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.ann.rewrite"
  val NBitsKey = "spark.graft.ann.nBits"
  val SeedKey = "spark.graft.ann.seed"
  val RadiusKey = "spark.graft.ann.radius"
  // IVF variant: plans carrying a `cluster_id` column prune to the nProbe
  // clusters nearest the literal query vector, ranked against the centroid
  // sidecar written by IndexBuilder.buildIvfIndex.
  val IvfCentroidsPathKey = "spark.graft.ann.ivf.centroidsPath"
  val IvfNProbeKey = "spark.graft.ann.ivf.nProbe"

  // Hyperplanes are O(nBits*dim) doubles and deterministic in (dim, nBits,
  // seed) — memoized so repeated optimizer invocations don't re-draw them.
  private val lshCache =
    scala.collection.concurrent.TrieMap.empty[(Int, Int, Long), RandomHyperplaneLsh]

  // Centroid sidecars are O(k*dim) doubles; memoized per (path, mtime,
  // size) so rebuilding an index at the same path invalidates the entry
  // instead of serving stale centroids for the JVM's lifetime.
  private val centroidCache =
    scala.collection.concurrent.TrieMap.empty[(String, Long, Long), Array[Array[Double]]]

  /** Hard cap on the injected IN-list: beyond this the rewrite stops
    * helping (plan bloat) and a hostile radius could otherwise make
    * probes() enumerate a combinatorial signature set at plan time.
    */
  private val MaxProbes = 1024

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // A malformed conf value must disable the rewrite, not throw inside
    // the optimizer (which would fail EVERY query in the session).
    if (!conf.getConfString(EnabledKey, "false").equalsIgnoreCase("true")) return plan
    val parsed = try {
      (conf.getConfString(NBitsKey, "16").trim.toInt,
        conf.getConfString(SeedKey, "42").trim.toLong,
        conf.getConfString(RadiusKey, "1").trim.toInt)
    } catch {
      case _: NumberFormatException =>
        logWarning(s"graft ANN rewrite disabled: non-numeric $NBitsKey/$SeedKey/$RadiusKey")
        return plan
    }
    val (nBits, seed, radius) = parsed
    // radius <= 6: the multi-probe set is sum_{i<=r} C(nBits, i); an
    // unbounded radius would enumerate a combinatorial Hamming ball inside
    // the optimizer (every query in the session stalls) — the same failure
    // class the NumberFormatException guard above prevents.
    if (nBits <= 0 || nBits > 30 || radius < 0 || radius > 6) {
      logWarning(s"graft ANN rewrite disabled: out-of-range nBits=$nBits radius=$radius")
      return plan
    }
    plan.transformDown {
      case l @ Limit(le, sort @ Sort(
            SortOrder(scoreRef, Descending, _, _) +: _, true, child, _))
          if !alreadyPruned(child) =>
        val rewritten = for {
          score <- resolveScore(scoreRef, child)
          qvec <- queryVector(score)
          pruned <- pruneLsh(child, qvec, nBits, seed, radius)
            .orElse(pruneIvf(child, qvec))
        } yield Limit(le, sort.copy(child = pruned))
        rewritten.getOrElse(l)
    }
  }

  /** LSH variant: `bucket IN <multi-probe set>` from the seeded planes.
    * Declines when the probe set exceeds MaxProbes (pruning that scans
    * most buckets is all plan-bloat, no benefit).
    */
  private def pruneLsh(child: LogicalPlan, qvec: Array[Float],
      nBits: Int, seed: Long, radius: Int): Option[LogicalPlan] = {
    // Hamming-ball size, computed arithmetically BEFORE enumerating: a
    // too-large probe set is declined without ever materializing it.
    val ballSize = (0 to radius).map { i =>
      (0 until i).map(j => (nBits - j).toLong).product /
        (1 to math.max(i, 1)).map(_.toLong).product
    }.sum
    if (ballSize > MaxProbes) {
      logWarning(s"graft ANN rewrite declined: ~$ballSize probes > $MaxProbes")
      return None
    }
    lazy val probes = {
      val lsh = lshCache.getOrElseUpdate((qvec.length, nBits, seed),
        new RandomHyperplaneLsh(qvec.length, nBits, seed))
      lsh.probes(lsh.signature(qvec.toSeq), radius)
    }
    injectProbeFilter(child, "bucket", probes)
  }

  /** IVF variant: `cluster_id IN <nProbe nearest centroids>` ranked
    * against the sidecar written by IndexBuilder.buildIvfIndex. Any
    * missing/unreadable sidecar or bad nProbe disables (never throws).
    */
  private def pruneIvf(child: LogicalPlan, qvec: Array[Float]): Option[LogicalPlan] = {
    val path = conf.getConfString(IvfCentroidsPathKey, "")
    if (path.isEmpty) return None
    val centersOpt =
      try {
        val sidecar = java.nio.file.Paths.get(path,
          graft.vector.IndexBuilder.IvfCentroidsFile)
        val stamp = (path,
          java.nio.file.Files.getLastModifiedTime(sidecar).toMillis,
          java.nio.file.Files.size(sidecar))
        Some(centroidCache.getOrElseUpdate(stamp,
          graft.vector.IndexBuilder.loadIvfCentroids(path)))
      } catch {
        case scala.util.control.NonFatal(e) =>
          logWarning(s"graft ANN IVF rewrite disabled: cannot read centroids at $path: $e")
          None
      }
    for {
      centers <- centersOpt
      nProbe <- conf.getConfString(IvfNProbeKey, "4").trim.toIntOption.filter(_ > 0)
      pruned <- injectProbeFilter(child, "cluster_id",
        graft.vector.IndexBuilder.nearestClusters(centers, qvec, nProbe))
    } yield pruned
  }

  /** The plan's index column (`bucket` or `cluster_id`). */
  private def indexAttr(plan: LogicalPlan, name: String): Option[Attribute] =
    plan.output.find(a => a.name == name && a.dataType == IntegerType)

  /** Place `<indexCol> IN probes` at the topmost node that still outputs
    * the index column. Column pruning may have projected it away above the
    * scan (a k-NN query selects id/score, not the index column), so
    * descend — but only through operators a filter passes unchanged
    * (Project/Filter/aliasing); anything else (aggregate, limit, join…)
    * stops the descent rather than risk changing semantics. Returns None
    * when no reachable node outputs the column (nothing to prune on).
    */
  private def injectProbeFilter(plan: LogicalPlan, name: String,
      probes: => Seq[Int]): Option[LogicalPlan] =
    indexAttr(plan, name) match {
      case Some(b) =>
        Some(Filter(In(b, probes.map(Literal(_, IntegerType))), plan))
      case None => plan match {
        case p @ (_: Project | _: Filter | _: SubqueryAlias) =>
          injectProbeFilter(p.children.head, name, probes)
            .map(nc => p.withNewChildren(Seq(nc)))
        case _ => None
      }
    }

  /** A sort on a bare attribute resolves through the Alias that computes
    * it somewhere below; an inline sort expression is used as-is.
    */
  private def resolveScore(e: Expression, plan: LogicalPlan): Option[Expression] =
    e match {
      case a: AttributeReference =>
        plan.collectFirst {
          case p: Project => p.projectList.collectFirst {
            case al @ Alias(expr, _) if al.exprId == a.exprId => expr
          }
        }.flatten
      case other => Some(other)
    }

  /** The literal query vector — accepted ONLY when the score expression is
    * monotonically non-decreasing in the dot product: bare graft_dot,
    * round/cast of it, + or - a constant, * or / a POSITIVE constant, and
    * nestings thereof. A descending sort on a decreasing function of the
    * dot (e.g. `1 - graft_dot(...)`, a distance) is a farthest-first
    * query; pruning it to buckets NEAR the literal would invert its
    * semantics, so such scores must not match.
    */
  private def queryVector(score: Expression): Option[Array[Float]] = {
    def vecLit(e: Expression): Option[Array[Float]] = e match {
      case Literal(arr: ArrayData, ArrayType(FloatType, _)) =>
        Some(arr.toFloatArray())
      case Literal(arr: ArrayData, ArrayType(DoubleType, _)) =>
        Some(arr.toDoubleArray().map(_.toFloat))
      case _ => None
    }
    def numConst(e: Expression): Option[Double] = e match {
      case Literal(v, _: NumericType) if v != null =>
        scala.util.Try(v.toString.toDouble).toOption
      case _ => None
    }
    def mono(e: Expression): Option[Array[Float]] = e match {
      case DotProduct(a, b) => vecLit(a).orElse(vecLit(b))
      case r: Round => mono(r.child)
      case c: Cast => mono(c.child)
      case Add(l, r, _) if numConst(r).isDefined => mono(l)
      case Add(l, r, _) if numConst(l).isDefined => mono(r)
      case Subtract(l, r, _) if numConst(r).isDefined => mono(l)
      case Multiply(l, r, _) if numConst(r).exists(_ > 0) => mono(l)
      case Multiply(l, r, _) if numConst(l).exists(_ > 0) => mono(r)
      case Divide(l, r, _) if numConst(r).exists(_ > 0) => mono(l)
      case _ => None
    }
    mono(score)
  }

  private val IndexCols = Set("bucket", "cluster_id")

  /** Idempotence: skip when an index-column membership filter already
    * exists anywhere below the sort (ours from a previous pass, a
    * hand-written prune, or one the optimizer pushed toward the scan).
    */
  private def alreadyPruned(plan: LogicalPlan): Boolean =
    plan.collectFirst {
      case Filter(cond, _) if cond.exists {
            case In(a: Attribute, _) => IndexCols(a.name)
            case InSet(a: Attribute, _) => IndexCols(a.name)
            case _ => false
          } => ()
    }.isDefined
}
