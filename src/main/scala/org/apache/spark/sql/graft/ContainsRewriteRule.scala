package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.StringType

/** Optimizer rule: route a substring filter over a registered corpus
  * through its TRIGRAM POSTING INDEX — the optimizer-driven version of
  * the `knn_where_contains_indexed` serve, so a user writing nothing
  * but `WHERE contains(text, 'needle')` (or `.filter(col("text")
  * .contains(...))`, or a [[graft.ops.ChromaFilter]] `$contains` tree)
  * gets the index route without calling a routed API.
  *
  * Pattern:  Filter(cond, <bare scan of a registered source>) where
  * `cond` has a gateable conjunct over the REGISTERED text column and
  * the scan outputs `doc_id`. Two conjunct shapes gate:
  *
  *  - `Contains(textCol, <literal of >= 3 lowered code points>)` — the
  *    conjunctive gate: the doc must carry EVERY needle's trigrams.
  *  - an OR-tree whose EVERY branch is such a Contains (ChromaFilter's
  *    `$or`-of-`$contains` compiles to exactly this) — the DISJUNCTIVE
  *    gate: the doc must carry at least ONE branch's full trigram set.
  *    A disjunction with any non-gateable branch (another column, a
  *    sub-trigram needle, a non-literal) never gates — gating it would
  *    drop rows the ungated branch admits.
  *
  * A contains over any OTHER column of the source never routes — the
  * posting index covers one column, and gating a title filter on text
  * trigrams would silently drop rows.
  *
  * Rewrite:  the SAME Filter over LeftSemi join(s) of the scan against
  * the posting gate(s) — each gated conjunct becomes one semi-join
  * against the shared [[graft.ops.VectorSearch.trigramGateFrame]] (its
  * distinct-then-sum formulation is planner-safe for a plan built
  * AFTER the distinct-aggregate rewrite batch has already run). Every
  * gate is a SUPERSET of its conjunct's true matches (trigram
  * co-occurrence admits false positives; needle and index sides lower
  * identically by construction — the needle enumerates one trigram
  * variant per lowering path Spark's `lower()` can take, see
  * [[graft.ops.VectorSearch.needleTrigramVariants]]) and the original
  * conjuncts stay as the verify, so unlike [[AnnRewriteRule]] this
  * rewrite is EXACT — semantics are preserved bit-for-bit PROVIDED the
  * posting table indexes every document in the source. That
  * completeness is the registration contract (the [[MvRewriteRule]]
  * freshness discipline): opting in declares "postingsPath is a
  * complete trigram index of source.textCol", and the
  * index-maintenance lifecycle rows (append/upsert/delete/stream/
  * reclaim) are how it stays one. EXTRA postings (a tombstoned doc not
  * yet reclaimed, a stale upsert generation) only widen the gate — the
  * kept verify keeps the answer exact, and the gate's dedup aggregate
  * collapses duplicate rows; MISSING postings are the one hazard the
  * contract excludes.
  *
  * Registration — one pair, or a registry of many:
  *
  *   spark.graft.contains.rewrite      = true   (default false)
  *   spark.graft.contains.source       = <documents parquet path>
  *   spark.graft.contains.postingsPath = <(doc_id, tg) posting parquet>
  *   spark.graft.contains.textCol      = <indexed column> (default text)
  *   spark.graft.contains.registry     = {"<sourcePath>":
  *     {"postings": "<postingsPath>", "textCol": "<col>"}, …}
  *
  * The registry is a JSON object (a deployment has many corpora, each
  * with its own index); the legacy single pair participates as one
  * more entry. Per-entry decline: a malformed registry entry, a
  * sub-trigram needle, an oversized trigram set, a doc_id type
  * mismatch, or an unreadable posting table declines THAT rewrite
  * rather than failing the query (the AnnRewriteRule discipline), and
  * other entries still route.
  *
  * Idempotence is scoped PER SCAN, not per plan: a scan relation
  * already sitting under a posting-gate semi-join's left side is left
  * alone (under fixed-point optimization PushDownPredicates pushes the
  * kept verify back below the injected join, re-creating the matched
  * Filter-over-scan shape over the SAME relation instance — re-matching
  * it would add one gate per iteration until maxIterations), while an
  * INDEPENDENT scan of the same source elsewhere in the plan (a union
  * of filtered scans, a self-join) still gates — the r19 whole-plan
  * guard gated only the first. A user's own pre-existing semi-join
  * against a postings path shields exactly the scan under it, nothing
  * else. The analyzed posting relation is cached on a CONTENT-address
  * (sorted leaf name+length+mtime hash over a recursive listing — a
  * same-size in-place overwrite or a partitioned `tb=` layout would
  * fool the r19 flat (count, max-mtime, bytes) triple) so matching
  * queries don't pay a footer read per optimization pass. */
object ContainsRewriteRule extends Rule[LogicalPlan] with PredicateHelper {

  val EnabledKey = "spark.graft.contains.rewrite"
  val SourceKey = "spark.graft.contains.source"
  val PostingsKey = "spark.graft.contains.postingsPath"
  val TextColKey = "spark.graft.contains.textCol"
  val RegistryKey = "spark.graft.contains.registry"

  private case class Registration(source: String, postings: String,
      textCol: String)

  /** Past this many distinct trigrams the injected IN-list stops paying
    * for itself (plan bloat; the posting probe reads more lists than
    * the verify would save). */
  private val MaxTrigrams = 256

  /** Analyzed posting relation cache keyed by path, invalidated on a
    * CONTENT-ADDRESSED signature: an MD5 over the recursive leaf
    * listing's sorted (name, length, mtime) triples. The r19 signature
    * (top-level file count, max mtime, total bytes) went stale two
    * ways: a partitioned posting table keeps its leaves under `tb=`
    * DIRECTORIES (top-level listing sees only `_SUCCESS`, so rewrites
    * never invalidated), and an overwrite preserving count+bytes within
    * mtime granularity served a shrunken index — and because the
    * rewrite's exactness depends on posting completeness, that silently
    * drops matching rows. */
  private case class CachedRel(signature: String, rel: LogicalRelation)
  private val relCache =
    new java.util.concurrent.ConcurrentHashMap[String, CachedRel]()

  /** Recursive non-hidden leaf listing → content signature; None when
    * the path is unlistable (decline, never fail). */
  private def contentSignature(session: SparkSession,
      path: String): Option[String] = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    try {
      val fs = hPath.getFileSystem(session.sessionState.newHadoopConf())
      val leaves = scala.collection.mutable.ArrayBuffer[String]()
      def walk(p: org.apache.hadoop.fs.Path): Unit =
        fs.listStatus(p).foreach { st =>
          val name = st.getPath.getName
          if (!name.startsWith("_") && !name.startsWith(".")) {
            if (st.isDirectory) walk(st.getPath)
            else leaves += s"$name ${st.getLen} ${st.getModificationTime}"
          }
        }
      walk(hPath)
      val md = java.security.MessageDigest.getInstance("MD5")
      leaves.sorted.foreach(l =>
        md.update(l.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      Some(md.digest().map("%02x".format(_)).mkString)
    } catch { case _: java.io.IOException => None }
  }

  /** One analyzed frame per gate spec (fresh exprIds per injected
    * join), over a signature computed ONCE per rewrite — the recursive
    * walk is the expensive half; paying it per gate spec would undo
    * what the cache buys on multi-gate conjuncts. */
  private def postingsFrame(session: SparkSession, path: String,
      signature: String): Option[DataFrame] = {
    val cached = relCache.get(path)
    val rel =
      if (cached != null && cached.signature == signature) cached.rel
      else {
        val analyzed =
          try session.read.parquet(path).queryExecution.analyzed
          catch { case _: Exception => return None }
        val lr = analyzed.collectFirst { case l: LogicalRelation => l }
          .getOrElse(return None)
        relCache.put(path, CachedRel(signature, lr))
        lr
      }
    // fresh exprIds per rewrite, light plan on top re-analyzes without
    // touching the filesystem (Dataset.ofRows is private[sql] — this
    // rule lives under org.apache.spark.sql for exactly this access)
    Some(org.apache.spark.sql.classic.Dataset.ofRows(
      session.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      rel.newInstance()))
  }

  /** The registered (source → postings, textCol) map: the JSON registry
    * plus the legacy single pair. A malformed registry declines
    * WHOLESALE with a warning (half-parsing a registry could route some
    * sources and silently strand others the user believes registered).
    * The parse is memoized on the registry STRING — this runs on every
    * fixed-point pass of every optimized query while the rule is
    * enabled, and the conf value only changes when the user re-sets it. */
  private val registryMemo = new java.util.concurrent.ConcurrentHashMap[
    String, Seq[Registration]]()
  private def registrations(): Seq[Registration] = {
    val legacy = {
      val s = conf.getConfString(SourceKey, "")
      val p = conf.getConfString(PostingsKey, "")
      val t = conf.getConfString(TextColKey, "text")
      if (s.nonEmpty && p.nonEmpty) Seq(Registration(s, p, t)) else Nil
    }
    val json = conf.getConfString(RegistryKey, "")
    val fromRegistry =
      if (json.isEmpty) Nil
      else registryMemo.computeIfAbsent(json, parseRegistry)
    // legacy pair wins on a duplicate source (it is the more explicit
    // registration); distinct by source path
    (legacy ++ fromRegistry).groupBy(_.source).map(_._2.head).toSeq
  }

  private def parseRegistry(json: String): Seq[Registration] = {
    try {
        import org.json4s._
        org.json4s.jackson.JsonMethods.parse(json) match {
          case JObject(fields) => fields.map {
            case (src, JObject(entry)) =>
              val m = entry.toMap
              val postings = m.get("postings") match {
                case Some(JString(p)) if p.nonEmpty => p
                case _ => throw new IllegalArgumentException(
                  s"registry entry '$src' missing string 'postings'")
              }
              val textCol = m.get("textCol") match {
                case Some(JString(t)) if t.nonEmpty => t
                case None => "text"
                case _ => throw new IllegalArgumentException(
                  s"registry entry '$src' has non-string 'textCol'")
              }
              Registration(src, postings, textCol)
            case (src, JString(postings)) => // shorthand: source -> postings
              Registration(src, postings, "text")
            case (src, _) => throw new IllegalArgumentException(
              s"registry entry '$src' must be a string or object")
          }
          case _ => throw new IllegalArgumentException(
            "registry must be a JSON object")
        }
      } catch {
        case e: Exception =>
          logWarning(s"graft contains rewrite: unreadable registry — " +
            s"declining all registry routes: $e")
          Nil
      }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "false").equalsIgnoreCase("true"))
      return plan
    val regs = registrations()
    if (regs.isEmpty) return plan
    val postingsPaths = regs.map(_.postings).toSet
    // PER-SCAN idempotency: collect every source relation already
    // sitting under a posting-gate semi-join's LEFT side — under
    // fixed-point optimization PushDownPredicates pushes the kept
    // verify below the injected join, re-creating Filter-over-scan
    // over the SAME relation instance; re-matching it would add one
    // gate per iteration until maxIterations. An independent scan of
    // the same source (union of filtered scans, self-join) is a
    // DIFFERENT relation instance (fresh exprIds) and still gates.
    val gatedScans: Set[LogicalPlan] = plan.collect {
      case Join(left, right, LeftSemi, _, _)
          if right.collectLeaves().exists {
            case lr: LogicalRelation =>
              postingsPaths.exists(RewriteSupport.relationAtPath(lr, _))
            case _ => false
          } =>
        left.collectLeaves().collect {
          case lr: LogicalRelation
              if regs.exists(r => RewriteSupport.relationAtPath(lr, r.source))
            => lr: LogicalPlan
        }
    }.flatten.toSet
    plan.transformUp {
      case f @ Filter(cond, child)
          if regs.exists(r => RewriteSupport.scansSource(child, r.source)) &&
            !child.collectLeaves().exists(gatedScans.contains) =>
        val reg = regs.find(r => RewriteSupport.scansSource(child, r.source)).get
        rewrite(cond, child, reg.postings, reg.textCol) match {
          case Some(r) => r
          case None => f
        }
    }
  }

  /** A gateable needle's trigram probe set, or None (decline: too
    * short after lowering, or the variant enumeration refused). */
  private def gateableNeedle(n: String): Option[String] =
    try { graft.ops.VectorSearch.needleTrigrams(n); Some(n) }
    catch { case _: IllegalArgumentException => None }

  private def rewrite(cond: Expression, child: LogicalPlan,
      postings: String, textCol: String): Option[LogicalPlan] = {
    def containsNeedle(e: Expression): Option[String] = e match {
      case Contains(a: AttributeReference, Literal(s, StringType))
          if s != null && a.name == textCol && child.outputSet.contains(a) =>
        Some(s.toString)
      case _ => None
    }
    val conjuncts = splitConjunctivePredicates(cond)
    // plain Contains conjuncts: gate conjunctively (every needle's full
    // trigram set must be present); sub-trigram needles stay as plain
    // verify conjuncts (the rewrite still helps)
    val andNeedles = conjuncts.flatMap(containsNeedle)
      .flatMap(gateableNeedle)
    // OR-of-contains conjuncts: each gates disjunctively, but ONLY when
    // every branch is a gateable contains over the registered column —
    // a partial gate would drop rows the ungated branch admits
    val orGroups = conjuncts.filter(_.isInstanceOf[Or]).flatMap { c =>
      val branches = splitDisjunctivePredicates(c)
      val needles = branches.flatMap(containsNeedle)
      if (needles.length == branches.length &&
          needles.flatMap(gateableNeedle).length == needles.length)
        Some(needles)
      else None
    }
    if (andNeedles.isEmpty && orGroups.isEmpty) return None
    val allNeedles = andNeedles ++ orGroups.flatten
    val nTrigrams = allNeedles
      .flatMap(graft.ops.VectorSearch.needleTrigrams).distinct.size
    if (nTrigrams > MaxTrigrams) {
      logWarning(s"graft contains rewrite declined: $nTrigrams " +
        s"trigrams exceed $MaxTrigrams")
      return None
    }
    val docId = child.output.find(_.name == "doc_id").getOrElse(return None)
    val session = RewriteSupport.resolveSession(conf).getOrElse(return None)
    // one gate plan per group: the conjunctive needles share one
    // aggregation; each OR group is its own ANY-gate — all against the
    // SAME cached posting relation (fresh exprIds per gate)
    val gateSpecs: Seq[(Seq[String], Boolean)] =
      (if (andNeedles.nonEmpty) Seq((andNeedles, true)) else Nil) ++
        orGroups.map(g => (g, false))
    val signature = contentSignature(session, postings)
      .getOrElse(return None)
    val gatePlans =
      try gateSpecs.map { case (needles, conjunctive) =>
        val pf = postingsFrame(session, postings, signature)
          .getOrElse(return None)
        graft.ops.VectorSearch.trigramGateFrame(pf, needles, conjunctive)
          .queryExecution.analyzed
      } catch {
        case e: Exception =>
          logWarning(s"graft contains rewrite declined: $e")
          return None
      }
    // a postings table whose doc_id type drifted from the corpus would
    // make the join condition unresolved — decline, never fail
    gatePlans.foreach { gp =>
      val gateDocId = gp.output.find(_.name == "doc_id")
        .getOrElse(return None)
      if (gateDocId.dataType != docId.dataType) {
        logWarning("graft contains rewrite declined: postings doc_id is " +
          s"${gateDocId.dataType}, corpus doc_id is ${docId.dataType}")
        return None
      }
    }
    val gated = gatePlans.foldLeft(child) { (left, gp) =>
      val gateDocId = gp.output.find(_.name == "doc_id").get
      Join(left, gp, LeftSemi,
        Some(EqualTo(docId, gateDocId)), JoinHint.NONE)
    }
    Some(Filter(cond, gated))
  }
}
