package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{GroupTopK, TopKBuffer}
import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec

/** Native bounded top-k-per-group aggregate: equivalence with the
  * window-rank idiom, tie determinism, partial-merge + serialization
  * round-trip across a forced shuffle, and the plan shape (partial →
  * final ObjectHashAggregate — the O(groups·k) exchange).
  */
class GroupTopKSpec extends SparkSpec {
  import spark.implicits._

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("s").desc, col("p").asc)))
      .filter(col("rn") <= k)
      .select("g", "s", "p")
  }

  private def nativeTopK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("g")
      .agg(GroupTopK.topK(col("s"), col("p"), k).as("top"))
      .select(col("g"), explode(col("top")))
      .select(col("g"), col("col.score").as("s"), col("col.payload").as("p"))

  test("matches the window-rank result on skewed data with ties") {
    val df = (1 to 500).map(i => (s"g${i % 7}", (i * 31 % 50).toLong, s"p$i"))
      .toDF("g", "s", "p")
      .repartition(8) // multiple partials per group → merge + serialize paths
    val native = nativeTopK(df, 5).collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val window = windowTopK(df, 5).collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(native === window)
    assert(native.size === 35) // 7 groups × 5
  }

  test("tie-break is the total order (score DESC, payload ASC)") {
    val df = Seq(("g", 10L, "b"), ("g", 10L, "a"), ("g", 10L, "c"), ("g", 9L, "z"))
      .toDF("g", "s", "p").repartition(3)
    val top = df.groupBy("g").agg(GroupTopK.topK(col("s"), col("p"), 2).as("t"))
      .select(explode(col("t"))).select("col.score", "col.payload")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(top === Seq((10L, "a"), (10L, "b"))) // sorted best-first, c and z cut
  }

  test("groups smaller than k return all rows; null score/payload ignored") {
    val df = Seq(
      ("a", Some(1L), Some("x")), ("a", None, Some("y")), ("a", Some(2L), None),
      ("b", Some(5L), Some("q")))
      .toDF("g", "s", "p")
    val out = nativeTopK(df, 3).collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(out === Set(("a", 1L, "x"), ("b", 5L, "q")))
  }

  test("serialization round-trips a buffer exactly") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val agg = GroupTopK(Literal(0L), Literal.create("", org.apache.spark.sql.types.StringType), 3)
    val buf = agg.createAggregationBuffer()
    buf.insert(5L, org.apache.spark.unsafe.types.UTF8String.fromString("a"))
    buf.insert(7L, org.apache.spark.unsafe.types.UTF8String.fromString("b"))
    buf.insert(7L, org.apache.spark.unsafe.types.UTF8String.fromString("aa"))
    buf.insert(9L, org.apache.spark.unsafe.types.UTF8String.fromString("c")) // evicts (5,a)
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.sorted.map { case (s, p) => (s, p.toString) }.toSeq ===
      Seq((9L, "c"), (7L, "aa"), (7L, "b")))
  }

  test("plan is partial→final ObjectHashAggregate (map-side bounded buffers)") {
    val df = (1 to 100).map(i => (s"g${i % 3}", i.toLong, s"p$i")).toDF("g", "s", "p")
    val plan = df.groupBy("g").agg(GroupTopK.topK(col("s"), col("p"), 3).as("t"))
      .queryExecution.sparkPlan
    val aggs = plan.collect { case a: ObjectHashAggregateExec => a }
    assert(aggs.size === 2, s"expected partial+final ObjectHashAggregate, got:\n$plan")
    val modes = aggs.flatMap(_.aggregateExpressions.map(_.mode.toString)).toSet
    assert(modes === Set("Partial", "Final"), s"modes: $modes")
  }

  test("graft_topk is callable from pure SQL") {
    org.apache.spark.sql.graft.GraftExtensions.register(spark)
    (1 to 50).map(i => (s"g${i % 2}", i.toLong, s"p$i")).toDF("g", "s", "p")
      .createOrReplaceTempView("topk_input")
    val rows = spark.sql(
      """SELECT g, t.score, t.payload
        |FROM (SELECT g, graft_topk(s, p, 2) AS top FROM topk_input GROUP BY g)
        |LATERAL VIEW explode(top) AS t
        |ORDER BY g, t.score DESC""".stripMargin).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    assert(rows === Seq(
      ("g0", 50L, "p50"), ("g0", 48L, "p48"),
      ("g1", 49L, "p49"), ("g1", 47L, "p47")))
  }

  test("property: buffer top-k under random inserts+merges equals sort-based top-k") {
    val rnd = new scala.util.Random(11)
    (1 to 100).foreach { _ =>
      val k = 1 + rnd.nextInt(6)
      val n = rnd.nextInt(40)
      val items = Seq.fill(n)((rnd.nextInt(10).toLong,
        org.apache.spark.unsafe.types.UTF8String.fromString(s"p${rnd.nextInt(8)}")))
      // split into random partial buffers, then merge — the shuffle path
      val parts = items.grouped(1 + rnd.nextInt(5)).toSeq
      val bufs = parts.map { p =>
        val b = new TopKBuffer(k)
        p.foreach { case (s, u) => b.insert(s, u) }
        b
      }
      val merged = bufs.foldLeft(new TopKBuffer(k))(_ mergeFrom _)
      val got = merged.sorted.map { case (s, p) => (s, p.toString) }.toSeq
      val want = items.map { case (s, p) => (s, p.toString) }
        .sortWith((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
        .take(k)
      assert(got === want, s"k=$k items=$items")
    }
  }

  test("driver query grouped_topk_native matches its oracle shape on sf0.001") {
    val out = SparkEntry.queries("grouped_topk_native")(spark, sf)
    val rows = out.collect()
    assert(rows.length === 15) // 5 priorities × top-3
    // per group: ranks 1..3, scores non-increasing
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).toSeq === Seq(1L, 2L, 3L))
      val scores = rs.sortBy(_.getLong(1)).map(_.getLong(2))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }
}
