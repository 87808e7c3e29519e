package graft

import org.apache.spark.sql.functions._
import graft.ops.ChromaFilter

/** The Chroma filter-language translator, operator by operator — the
  * oracle rows exercise the common paths end-to-end; this spec pins
  * the full operator matrix, the JSON entry point, and the loud
  * refusals (a silently-dropped clause WIDENS a retrieval filter —
  * data leakage, not a convenience).
  */
class ChromaFilterSpec extends SparkSpec {

  private lazy val df = {
    val spark2 = spark
    import spark2.implicits._
    Seq(
      (1L, "alpha zz", "src0", 10L, true),
      (2L, "beta zz", "src1", 20L, false),
      (3L, "gamma", "src1", 30L, true),
      (4L, "delta zz", "src2", 40L, false)
    ).toDF("id", "text", "source", "n", "flag")
  }

  private def ids(c: org.apache.spark.sql.Column): Seq[Long] =
    df.filter(c).select("id").collect().map(_.getLong(0)).toSeq.sorted

  test("metadata where: bare equality, $eq, $ne and every scalar comparison") {
    assert(ids(ChromaFilter.where(Map("source" -> "src1"))) === Seq(2L, 3L))
    assert(ids(ChromaFilter.where(Map("source" -> Map("$eq" -> "src1"))))
      === Seq(2L, 3L))
    assert(ids(ChromaFilter.where(Map("source" -> Map("$ne" -> "src1"))))
      === Seq(1L, 4L))
    assert(ids(ChromaFilter.where(Map("n" -> Map("$gt" -> 20L)))) === Seq(3L, 4L))
    assert(ids(ChromaFilter.where(Map("n" -> Map("$gte" -> 20L))))
      === Seq(2L, 3L, 4L))
    assert(ids(ChromaFilter.where(Map("n" -> Map("$lt" -> 20L)))) === Seq(1L))
    assert(ids(ChromaFilter.where(Map("n" -> Map("$lte" -> 20L))))
      === Seq(1L, 2L))
    assert(ids(ChromaFilter.where(Map("flag" -> true))) === Seq(1L, 3L))
  }

  test("metadata where: $in / $nin, and $and / $or composition nests") {
    assert(ids(ChromaFilter.where(
      Map("source" -> Map("$in" -> Seq("src0", "src2"))))) === Seq(1L, 4L))
    assert(ids(ChromaFilter.where(
      Map("source" -> Map("$nin" -> Seq("src0", "src2"))))) === Seq(2L, 3L))
    // ($or of an equality and a range) $and a $nin — a real nested tree
    val tree = Map("$and" -> Seq(
      Map("$or" -> Seq(
        Map("source" -> "src0"),
        Map("n" -> Map("$gte" -> 30L)))),
      Map("source" -> Map("$nin" -> Seq("src2")))))
    assert(ids(ChromaFilter.where(tree)) === Seq(1L, 3L))
  }

  test("where_document: $contains, $not_contains, and their $and/$or composition") {
    def d(m: Map[String, Any]) = ids(ChromaFilter.whereDocument(m, col("text")))
    assert(d(Map("$contains" -> "zz")) === Seq(1L, 2L, 4L))
    assert(d(Map("$not_contains" -> "zz")) === Seq(3L))
    assert(d(Map("$and" -> Seq(Map("$contains" -> "zz"),
      Map("$not_contains" -> "beta")))) === Seq(1L, 4L))
    assert(d(Map("$or" -> Seq(Map("$contains" -> "gamma"),
      Map("$contains" -> "delta")))) === Seq(3L, 4L))
  }

  test("the JSON entry point compiles the exact client dict to the same rows") {
    assert(ids(ChromaFilter.whereJson(
      """{"$and": [{"n": {"$gte": 20}}, {"source": {"$ne": "src2"}}]}"""))
      === Seq(2L, 3L))
    assert(ids(ChromaFilter.whereDocumentJson(
      """{"$or": [{"$contains": "alpha"}, {"$not_contains": "zz"}]}""",
      col("text"))) === Seq(1L, 3L))
    // JSON integers arrive as java.lang.Integer and must compare
    // correctly against a LongType column (no silent type mismatch)
    assert(ids(ChromaFilter.whereJson("""{"n": {"$in": [10, 40]}}"""))
      === Seq(1L, 4L))
  }

  test("property: random where trees agree with an in-memory reference evaluator") {
    val spark2 = spark
    import spark2.implicits._
    val rows = (0 until 12).map(i =>
      (i.toLong, s"s${i % 3}", (i * 17 % 101).toLong))
    val pdf = rows.toDF("id", "source", "n")
    val rnd = new scala.util.Random(20260816L)
    def leaf(): Map[String, Any] = rnd.nextInt(7) match {
      case 0 => Map("source" -> s"s${rnd.nextInt(4)}")
      case 1 => Map("n" -> Map("$gte" -> rnd.nextInt(120).toLong))
      case 2 => Map("n" -> Map("$lt" -> rnd.nextInt(120).toLong))
      case 3 => Map("n" -> Map("$gt" -> rnd.nextInt(120).toLong))
      case 4 => Map("source" -> Map("$in" ->
        Seq(s"s${rnd.nextInt(4)}", s"s${rnd.nextInt(4)}")))
      case 5 => Map("source" -> Map("$nin" -> Seq(s"s${rnd.nextInt(4)}")))
      case 6 => Map("n" -> Map("$ne" -> rnd.nextInt(120).toLong))
    }
    def tree(depth: Int): Map[String, Any] =
      if (depth == 0 || rnd.nextInt(3) == 0) leaf()
      else Map((if (rnd.nextBoolean()) "$and" else "$or") ->
        Seq(tree(depth - 1), tree(depth - 1)))
    def eval(t: Map[String, Any], source: String, n: Long): Boolean = {
      val (k, v) = t.head
      (k, v) match {
        case ("$and", xs: Seq[_]) => xs
          .forall(x => eval(x.asInstanceOf[Map[String, Any]], source, n))
        case ("$or", xs: Seq[_]) => xs
          .exists(x => eval(x.asInstanceOf[Map[String, Any]], source, n))
        case ("source", s: String) => source == s
        case ("source", m: Map[_, _]) =>
          m.asInstanceOf[Map[String, Any]].head match {
            case ("$in", xs: Seq[_]) => xs.contains(source)
            case ("$nin", xs: Seq[_]) => !xs.contains(source)
            case other => fail(s"unexpected leaf $other")
          }
        case ("n", m: Map[_, _]) =>
          m.asInstanceOf[Map[String, Any]].head match {
            case ("$gte", x: Long) => n >= x
            case ("$gt", x: Long) => n > x
            case ("$lt", x: Long) => n < x
            case ("$ne", x: Long) => n != x
            case other => fail(s"unexpected leaf $other")
          }
        case other => fail(s"unexpected node $other")
      }
    }
    // one filter per generated tree, each over a 12-row local relation —
    // 60 tiny jobs; the reference evaluator is the Chroma semantics in
    // plain Scala, so any divergence is a translator bug
    (0 until 60).foreach { _ =>
      val t = tree(3)
      val got = pdf.filter(ChromaFilter.where(t))
        .select("id").collect().map(_.getLong(0)).toSet
      val want = rows.filter(r => eval(t, r._2, r._3)).map(_._1).toSet
      assert(got === want, s"tree $t: spark=$got reference=$want")
    }
  }

  test("malformed filters refuse loudly instead of widening the result") {
    def boom(f: => Any): String =
      intercept[IllegalArgumentException](f).getMessage
    // multi-key level: Chroma's 'exactly one operator' contract
    assert(boom(ChromaFilter.where(Map("a" -> 1, "b" -> 2)))
      .contains("exactly one"))
    assert(boom(ChromaFilter.where(Map("n" -> Map("$between" -> 5))))
      .contains("$between"))
    // a typo'd LOGICAL operator must not silently become a metadata
    // field named '$nad' (equality against a nonexistent column)
    assert(boom(ChromaFilter.where(Map("$nad" -> Seq(Map("a" -> 1)))))
      .contains("$nad"))
    assert(boom(ChromaFilter.where(Map("$and" -> Seq.empty[Map[String, Any]])))
      .contains("non-empty"))
    // a document operator in the metadata tree is a caller bug
    assert(boom(ChromaFilter.where(Map("$contains" -> "x")))
      .contains("where_document"))
    assert(boom(ChromaFilter.whereDocument(Map("$regex" -> "x"), col("text")))
      .contains("$regex"))
    assert(boom(ChromaFilter.whereDocument(Map("$contains" -> ""), col("text")))
      .contains("non-empty"))
    assert(boom(ChromaFilter.where(Map("n" -> Map("$in" -> Seq(Seq(1))))))
      .contains("non-scalar"))
    assert(boom(ChromaFilter.where(Map("n" -> null))).contains("unsupported"))
  }
}
