package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.vector.{VectorFunctions => V}
object MaxCosine {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val dir = s"/root/testdata/$sf"
      val e = Tables.embeddings(spark, dir)
      val qv = e.filter(col("vec_id") === 0L).select("embedding").head().getSeq[Float](0).toArray
      val m = e.filter(col("vec_id") =!= 0L)
        .agg(max(V.cosineUnit(col("embedding"), typedlit(qv.toSeq)))).head().getDouble(0)
      val ndup = e.groupBy(col("embedding")).count().filter(col("count") > 1).count()
      // doc 0 text dup count and max feature-cosine among distinct docs vs doc 0
      val d = Tables.documents(spark, dir)
      val d0dups = d.join(d.filter(col("doc_id") === 0).select(md5(col("text")).as("h")),
        md5(col("text")) === col("h")).count()
      println(s"[$sf] max_nonself_cosine=$m dup_vectors=$ndup doc0_text_copies=$d0dups")
    }
    spark.stop()
  }
}
