package graft

import org.apache.spark.sql.functions._
import graft.ingest.Compaction

class CompactionSpec extends SparkSpec {

  test("compaction merges many small appends into few files, content identical") {
    val dir = java.nio.file.Files.createTempDirectory("compact").toString + "/chunks"
    import spark.implicits._
    // 10 append batches -> >= 10 part files (the incremental-ingest shape)
    (0 until 10).foreach { b =>
      Seq.tabulate(50)(i => (b * 50L + i, s"chunk-$b-$i"))
        .toDF("id", "text").coalesce(1)
        .write.mode("append").parquet(dir)
    }
    val before = spark.read.parquet(dir).collect().map(_.toString).sorted

    val stats = Compaction.compact(spark, dir, targetFileBytes = 256L * 1024 * 1024)
    assert(stats.filesBefore >= 10)
    assert(stats.filesAfter === 1) // 500 tiny rows fit one byte-budgeted file
    assert(stats.rows === 500L)

    val after = spark.read.parquet(dir).collect().map(_.toString).sorted
    assert(after === before)
  }

  test("partitioned index tables compact per partition, preserving layout and pruning") {
    import graft.vector.IndexBuilder
    val lsh = new IndexBuilder.RandomHyperplaneLsh(64, 4, 42L)
    val dir = java.nio.file.Files.createTempDirectory("compact_idx").toString + "/index"
    val emb = Tables.embeddings(spark, sf)
    // two incremental appends -> >=2 files in touched partitions
    IndexBuilder.withLshBucket(emb.filter(col("vec_id") < 250), "embedding", lsh)
      .write.mode("append").partitionBy("bucket").parquet(dir)
    IndexBuilder.withLshBucket(emb.filter(col("vec_id") >= 250), "embedding", lsh)
      .write.mode("append").partitionBy("bucket").parquet(dir)
    val before = spark.read.parquet(dir)
      .groupBy("bucket").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap

    // flat compact must refuse the partitioned root
    intercept[IllegalArgumentException] {
      graft.ingest.Compaction.compact(spark, dir)
    }
    val stats = graft.ingest.Compaction.compactPartitioned(spark, dir)
    assert(stats.filesBefore > stats.filesAfter)

    val after = spark.read.parquet(dir)
      .groupBy("bucket").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(after === before, "per-bucket contents must be unchanged")
    // pruning still works on the compacted layout
    val plan = spark.read.parquet(dir).filter(col("bucket") === before.keySet.head)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && !plan.contains("PartitionFilters: []"))
  }

  test("compaction works for json directories (the K1 JSONL sink layout)") {
    val dir = java.nio.file.Files.createTempDirectory("compactj").toString + "/jsonl"
    import spark.implicits._
    (0 until 5).foreach { b =>
      Seq.tabulate(20)(i => (b * 20L + i, s"line-$b-$i"))
        .toDF("id", "text").coalesce(1)
        .write.mode("append").json(dir)
    }
    val stats = Compaction.compact(spark, dir, format = "json")
    assert(stats.filesBefore >= 5 && stats.filesAfter === 1 && stats.rows === 100L)
    assert(spark.read.json(dir).count() === 100L)
  }
}
