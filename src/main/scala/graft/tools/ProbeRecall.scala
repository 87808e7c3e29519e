package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.vector.{IndexBuilder, VectorFunctions => V}
import graft.ops.AnnIndex

/** Dev measurement: for stored query vec 0, at each SF, find the smallest
  * LSH multi-probe radius and IVF nProbe whose pruned top-10 equals the
  * exact top-10 (the candidate setting for the exact-oracle driver rows).
  *
  * Usage: runMain graft.tools.ProbeRecall
  */
object ProbeRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val dir = s"/root/testdata/$sf"
      val e = Tables.embeddings(spark, dir)
      val qv = e.filter(col("vec_id") === 0L)
        .select("embedding").head().getSeq[Float](0).toArray
      val exact = e
        .withColumn("score", round(V.cosineUnit(col("embedding"), typedlit(qv.toSeq)), 6))
        .orderBy(col("score").desc, col("vec_id").asc)
        .limit(10).select("vec_id").collect().map(_.getLong(0)).toSet
      (0 to 6).foreach { r =>
        val pruned = IndexBuilder.lshTopK(e, "embedding", "vec_id",
            AnnIndex.defaultLsh, qv, k = 10, radius = r)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        println(s"[$sf] lsh radius=$r match=${pruned == exact} missed=${(exact -- pruned).size}")
      }
      (1 to 16).foreach { p =>
        val pruned = IndexBuilder.ivfTopK(e, "embedding", "vec_id",
            qv, k = 10, numClusters = 16, nProbe = p, seed = 42L)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        println(s"[$sf] ivf nProbe=$p match=${pruned == exact} missed=${(exact -- pruned).size}")
      }
    }
    spark.stop()
  }
}
