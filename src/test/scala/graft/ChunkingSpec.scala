package graft

import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkSpec {

  test("chunk_docs_200 explodes docs into numbered chunks with consistent totals") {
    // the raw chunk frame (the driver row is now its violation gate)
    val df = ops.Chunking.chunkDocs200(spark, sf).cache()
    val docs = Tables.documents(spark, sf).count()
    assert(df.count() >= docs, "every doc yields at least one chunk")
    // chunk_number runs 1..total_chunks within each doc
    val bad = df.groupBy("doc_id")
      .agg(max("chunk_number").as("mx"), count(lit(1)).as("n"),
        first("total_chunks").as("t"))
      .filter(col("mx") =!= col("n") || col("n") =!= col("t"))
      .count()
    assert(bad === 0, "chunk numbering inconsistent")
    // ids are unique
    assert(df.select("chunk_id").distinct().count() === df.count())
    // every chunk respects the size bound
    assert(df.filter(length(col("chunk_text")) > 200).count() === 0)
  }

  test("chunk_docs_default gives one chunk per short doc equal to trimmed text") {
    val df = SparkEntry.queries("chunk_docs_default")(spark, sf)
    val docs = Tables.documents(spark, sf)
      .filter(length(col("text")) <= 1000 && length(trim(col("text"))) > 0)
    assert(df.count() === docs.count())
    assert(df.filter(col("total_chunks") =!= 1).count() === 0)
  }

  test("chunk_invariants finds no contract violations on the test corpus") {
    assert(ops.Chunking.chunkInvariants(spark, sf).count() === 0)
  }

  test("native ChunkSplit generator is row-identical to the UDF+posexplode path") {
    val docs = Tables.documents(spark, sf)
    val gen = graft.ops.Chunking.chunkDocuments(docs, 200, 30)
      .orderBy("chunk_id").collect()
    val udfP = graft.ops.Chunking.chunkDocumentsUdf(docs, 200, 30)
      .orderBy("chunk_id").collect()
    assert(gen.length === udfP.length)
    gen.zip(udfP).foreach { case (a, b) => assert(a === b) }
  }

  test("planted paragraph docs chunk exactly as the hand-traced oracle enumerates") {
    import graft.text.Chunker
    // overlap carry-back: the 25-char middle paragraph rides into chunk 2
    assert(Chunker.split(("a" * 120) + "\n\n" + ("b" * 25) + "\n\n" + ("c" * 150), 200, 30) ===
      List(("a" * 120) + "\n\n" + ("b" * 25), ("b" * 25) + "\n\n" + ("c" * 150)))
    // no carry: 180-char paragraphs exceed the 30-char overlap budget
    assert(Chunker.split(("p" * 180) + "\n\n" + ("q" * 180) + "\n\n" + ("r" * 180), 200, 30) ===
      List("p" * 180, "q" * 180, "r" * 180))
    // character-level fallback: exact 200/30 sliding windows over 450 chars
    assert(Chunker.split("x" * 450, 200, 30) ===
      List("x" * 200, "x" * 200, "x" * 110))
  }

  test("generator plans a Generate node with no shuffle") {
    val plan = graft.ops.Chunking.chunkDocuments(
      Tables.documents(spark, sf), 200, 30).queryExecution.executedPlan.toString
    assert(plan.contains("Generate chunk_split"), s"expected chunk_split Generate:\n$plan")
    assert(!plan.contains("Exchange"), s"chunking must be a narrow map:\n$plan")
  }
}
