package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Chroma's filter LANGUAGE compiled to Spark [[Column]]s — the query
  * surface a user of the reference hands its store verbatim
  * (`collection.query(..., where={...}, where_document={...})`;
  * `query_rag_database.py` / `Auto_query_rag_database.py` build these
  * dicts for filtered retrieval). The k-NN filter rows construct their
  * predicates THROUGH this translator, so every operator is exercised
  * under the DuckDB oracle, not just unit-tested: a reference user's
  * filter dicts run unchanged against this engine.
  *
  * Semantics follow Chroma's documented contract:
  *  - `where` (metadata): `{"field": value}` is equality;
  *    `{"field": {"$op": value}}` with `$eq $ne $gt $gte $lt $lte`
  *    (scalar compare) and `$in $nin` (list membership);
  *    `{"$and"/"$or": [subtree, ...]}` compose. A level carries
  *    EXACTLY one key — Chroma rejects `{"a": 1, "b": 2}` ("expected
  *    where to have exactly one operator"), and so does this
  *    translator, LOUDLY, instead of silently picking a key.
  *  - `where_document`: `{"$contains"/"$not_contains": text}` plus the
  *    same `$and`/`$or` composition, over a caller-supplied text
  *    column.
  *
  * Because the output is an ordinary Catalyst expression tree over the
  * metadata/text columns, everything downstream is free: equality and
  * range clauses push into the parquet scan (`PushedFilters`, plan-
  * audited by the row specs), `$in` prunes via dictionaries, ranges
  * compose with the zone-map file prune, and `$contains` routes
  * through the trigram index where the router chooses it. Unknown
  * operators, empty conjunctions, and malformed trees all throw —
  * a silently-dropped clause would widen a filter, which for a
  * retrieval store is data leakage, not a convenience.
  */
object ChromaFilter {

  private val CompareOps: Map[String, (Column, Column) => Column] = Map(
    "$eq" -> (_ === _), "$ne" -> (_ =!= _),
    "$gt" -> (_ > _), "$gte" -> (_ >= _),
    "$lt" -> (_ < _), "$lte" -> (_ <= _))

  /** Compile a metadata `where` tree. */
  def where(filter: Map[String, Any]): Column = {
    val (key, value) = exactlyOne(filter, "where")
    key match {
      case "$and" | "$or" =>
        combine(key, value, "where").map(m => where(m))
          .reduce((a, b) => if (key == "$and") a && b else a || b)
      case "$contains" | "$not_contains" =>
        throw new IllegalArgumentException(
          s"'$key' is a where_document operator — pass it to " +
            "whereDocument, not where")
      case op if op.startsWith("$") =>
        // a typo'd logical operator ($nad) must not silently become a
        // metadata FIELD named '$nad' — equality against a column that
        // does not exist, surfacing later as a confusing resolution
        // error (or a wrong filter if such a column ever existed)
        throw new IllegalArgumentException(
          s"unknown where operator '$op' — expected a field name or " +
            "$and/$or")
      case field =>
        value match {
          case m @ (_: Map[_, _] | _: java.util.Map[_, _]) =>
            val (op, v) =
              exactlyOne(asFilterMap(m, s"where.$field"), s"where.$field")
            op match {
              case "$in" => col(field).isin(literalList(v, op): _*)
              case "$nin" => !col(field).isin(literalList(v, op): _*)
              case _ => CompareOps.getOrElse(op,
                  throw new IllegalArgumentException(
                    s"unknown where operator '$op' on field '$field'"))
                .apply(col(field), scalarLit(v, op))
            }
          case v => col(field) === scalarLit(v, field) // bare equality
        }
    }
  }

  /** Compile a `where_document` tree against `text`. */
  def whereDocument(filter: Map[String, Any], text: Column): Column = {
    val (key, value) = exactlyOne(filter, "where_document")
    key match {
      case "$and" | "$or" =>
        combine(key, value, "where_document")
          .map(m => whereDocument(m, text))
          .reduce((a, b) => if (key == "$and") a && b else a || b)
      case "$contains" => text.contains(needle(value, key))
      case "$not_contains" => !text.contains(needle(value, key))
      case other => throw new IllegalArgumentException(
        s"unknown where_document operator '$other' — expected " +
          "$contains, $not_contains, $and, $or")
    }
  }

  /** JSON-string convenience (the exact dicts a Chroma client sends),
    * parsed with the Jackson shipped in Spark. */
  def whereJson(json: String): Column = where(parseJsonMap(json))

  def whereDocumentJson(json: String, text: Column): Column =
    whereDocument(parseJsonMap(json), text)

  // ---- helpers ----

  private def exactlyOne(m: Map[String, Any],
      ctx: String): (String, Any) = {
    if (m.size != 1) throw new IllegalArgumentException(
      s"$ctx level must have exactly one operator/field, got " +
        s"${m.keys.toSeq.sorted.mkString("{", ", ", "}")} — compose " +
        "multiple clauses with \"$and\"")
    m.head
  }

  private def combine(op: String, value: Any,
      ctx: String): Seq[Map[String, Any]] = value match {
    case s: Seq[_] if s.nonEmpty =>
      s.map(x => asFilterMap(x, s"$ctx.$op"))
    case l: java.util.List[_] if !l.isEmpty =>
      scala.jdk.CollectionConverters.ListHasAsScala(l).asScala.toSeq
        .map(x => asFilterMap(x, s"$ctx.$op"))
    case _ => throw new IllegalArgumentException(
      s"'$op' expects a non-empty list of subtrees")
  }

  private def asFilterMap(x: Any, ctx: String): Map[String, Any] = x match {
    case m: Map[_, _] => m.map {
      case (k: String, v) => k -> (v: Any)
      case (k, _) => throw new IllegalArgumentException(
        s"$ctx: non-string key '$k'")
    }
    case m: java.util.Map[_, _] =>
      scala.jdk.CollectionConverters.MapHasAsScala(m).asScala.map {
        case (k: String, v) => k -> (v: Any)
        case (k, _) => throw new IllegalArgumentException(
          s"$ctx: non-string key '$k'")
      }.toMap
    case other => throw new IllegalArgumentException(
      s"$ctx: expected a filter object, got $other")
  }

  /** Chroma metadata values are str/int/float/bool — anything else is
    * a malformed filter, refused loudly (a silently-stringified value
    * would compare unequal everywhere and empty the result). */
  private def scalarLit(v: Any, ctx: String): Column = v match {
    case s: String => lit(s)
    case b: Boolean => lit(b)
    case i: Int => lit(i)
    case l: Long => lit(l)
    case d: Double => lit(d)
    case f: Float => lit(f)
    case i: java.lang.Integer => lit(i.intValue())
    case l: java.lang.Long => lit(l.longValue())
    case d: java.lang.Double => lit(d.doubleValue())
    case b: java.lang.Boolean => lit(b.booleanValue())
    case other => throw new IllegalArgumentException(
      s"$ctx: unsupported metadata value $other " +
        s"(${if (other == null) "null" else other.getClass.getName})")
  }

  private def literalList(v: Any, op: String): Seq[Any] = v match {
    case s: Seq[_] if s.nonEmpty => s.map(checkScalar(_, op))
    case l: java.util.List[_] if !l.isEmpty =>
      scala.jdk.CollectionConverters.ListHasAsScala(l).asScala.toSeq
        .map(checkScalar(_, op))
    case _ => throw new IllegalArgumentException(
      s"'$op' expects a non-empty list of scalar values")
  }

  private def checkScalar(v: Any, op: String): Any = v match {
    case _: String | _: Boolean | _: Int | _: Long | _: Double |
        _: Float | _: java.lang.Integer | _: java.lang.Long |
        _: java.lang.Double | _: java.lang.Boolean => v
    case other => throw new IllegalArgumentException(
      s"'$op' list holds a non-scalar value: $other")
  }

  private def needle(v: Any, op: String): String = v match {
    case s: String if s.nonEmpty => s
    case _ => throw new IllegalArgumentException(
      s"'$op' expects a non-empty string")
  }

  private def parseJsonMap(json: String): Map[String, Any] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    asFilterMap(
      mapper.readValue(json, classOf[java.util.Map[String, Object]]),
      "json filter")
  }
}
