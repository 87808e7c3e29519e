package graft

import graft.ops.Forget
import org.apache.spark.sql.functions.col

class ForgetSpec extends SparkSpec {

  test("forget_propagated_topk: one ledger commit excludes the doc from every surface") {
    val out = SparkEntry.queries("forget_propagated_topk")(spark, sf).collect()
    val bySurface = out.groupBy(_.getAs[String]("surface"))
      .view.mapValues(_.map(_.getAs[Long]("doc_id")).toSeq).toMap
    assert(bySurface.keySet === Set("knn", "maxsim", "export"))
    bySurface.foreach { case (s, ids) =>
      assert(!ids.contains(100000L),
        s"surface $s still serves the forgotten doc — the ledger did " +
          "not propagate")
    }
    val ties = 0L +: (100001L to 100009L)
    assert(bySurface("knn") === ties)
    assert(bySurface("maxsim") === ties)
    assert(bySurface("export") === (100001L to 100009L).toSeq,
      "the export ships only the surviving planted ids")
  }

  test("concurrent forgetters merge: both ids survive the CAS race") {
    val root = java.nio.file.Files
      .createTempDirectory("forgetrace").toString + "/r"
    val t1 = new Thread(() => Forget.forget(spark, root, Seq(7L)))
    val t2 = new Thread(() => Forget.forget(spark, root, Seq(11L)))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert(Forget.forgottenIds(spark, root).toSet === Set(7L, 11L),
      "the CAS loser must retry on the winner's head, keeping both ids")
    // idempotent re-forget: one line per id, no duplicates
    Forget.forget(spark, root, Seq(7L))
    assert(Forget.forgottenIds(spark, root) === Seq(7L, 11L))
  }

  test("streaming_forget_retrieval: a mid-stream forget flips the next micro-batch") {
    val out = SparkEntry.queries("streaming_forget_retrieval")(spark, sf)
      .collect()
    val b0 = out.filter(_.getAs[Int]("batch") == 0)
      .map(_.getAs[Long]("vec_id")).toSeq
    val b1 = out.filter(_.getAs[Int]("batch") == 1)
      .map(_.getAs[Long]("vec_id")).toSeq
    assert(b0 === Seq(0L, 900000L),
      "pre-forget the planted copy must serve (it is a live exact match)")
    assert(b1 === Seq(0L),
      "the forget committed between batches must exclude the copy from " +
        "the NEXT micro-batch — no index rebuild, no stream restart")
  }

  test("forget_reclaimed_topk: the bytes are gone and the ledger is retired") {
    val out = SparkEntry.queries("forget_reclaimed_topk")(spark, sf).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq ===
      (0L +: (100001L to 100009L)).sorted,
      "the reclaimed copy must be gone with NO serve-time exclusion")
    // physical: no posting row carries the reclaimed id
    val path = Tables.scratchPath("maxsim_postings_rcl", sf)
    assert(spark.read.parquet(path)
      .filter(col("doc_id") === 100000L).count() === 0L,
      "reclaim must rewrite the forgotten id's postings away")
    // retired: the ledger holds only logically-not-yet-physically
    // deleted ids — here, none
    val root = Tables.scratchPath("forget_rcl", sf)
    assert(graft.ops.Forget.forgottenIds(spark, root).isEmpty,
      "reclaimed ids must retire from the ledger")
  }

  test("a fresh root forgets nothing: the ledger read is empty, not an error") {
    val root = java.nio.file.Files
      .createTempDirectory("forgetempty").toString + "/r"
    assert(Forget.forgottenIds(spark, root).isEmpty)
  }
}
