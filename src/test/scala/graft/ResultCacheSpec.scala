package graft

import java.nio.file.Files
import graft.ops.ResultCache
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class ResultCacheSpec extends SparkSpec {
  import spark.implicits._

  private def listing(dir: String): Set[(String, Long, Long)] = {
    val d = new java.io.File(dir)
    if (!d.exists()) Set.empty
    else d.listFiles().map(f => (f.getName, f.length(), f.lastModified())).toSet
  }

  test("second serve hits the cache: same rows, no rewrite of the entry") {
    val root = Files.createTempDirectory("rescache").toString
    def q(): DataFrame = Tables.orders(spark, sf)
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    val first = ResultCache.cached(spark, q(), root)
      .collect().map(_.toSeq).toSet
    val key = ResultCache.cacheKey(q())
    val before = listing(s"$root/$key")
    assert(before.nonEmpty, "first serve must materialize the entry")
    val second = ResultCache.cached(spark, q(), root)
      .collect().map(_.toSeq).toSet
    assert(second === first)
    assert(listing(s"$root/$key") === before,
      "a hit must not rewrite the cache entry")
  }

  test("changing the input data changes the key and the answer — never stale") {
    val root = Files.createTempDirectory("rescache2").toString
    val input = Files.createTempDirectory("rescache_in").toString + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(input)
    def q(): DataFrame =
      spark.read.parquet(input).agg(count(lit(1)).as("n"))
    assert(ResultCache.cached(spark, q(), root).head.getLong(0) === 2L)
    // swap the input: same path, same schema, different contents
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .write.mode("overwrite").parquet(input)
    assert(ResultCache.cached(spark, q(), root).head.getLong(0) === 3L,
      "cache served a stale result after the input changed")
  }

  test("different plans over the same input get different keys") {
    val a = Tables.orders(spark, sf).groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"))
    val b = Tables.orders(spark, sf).groupBy("o_orderstatus")
      .agg(max(col("o_totalprice")).as("m"))
    assert(ResultCache.cacheKey(a) !== ResultCache.cacheKey(b))
  }
}
