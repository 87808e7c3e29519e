package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

object WalkJobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = scala.collection.mutable.ListBuffer.empty[String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = synchronized {
        names += j.properties.getProperty("callSite.short", "?") + " | " + j.stageInfos.map(_.name.takeWhile(_ != '\n')).mkString(" ;; ")
      }
    })
    import graft.ops.AnnIndex
    import graft.vector.GraphAnn
    val corpus = AnnIndex.withPlantedSelfCopies(spark, graft.Tables.embeddings(spark, sfDir))
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_prof_walk_" + Integer.toHexString(sfDir.hashCode)).getAbsolutePath
    graft.ops.ResultCache.buildIfAbsent(spark, corpus,
      s"nsw:m=8:bits=${AnnIndex.defaultLsh.nBits}:seed=42", path) {
      GraphAnn.buildNswGraph(corpus, "embedding", "vec_id", AnnIndex.defaultLsh, m = 8, path)
    }
    val qv = graft.Tables.embeddings(spark, sfDir).filter(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0).toArray
    // warm
    GraphAnn.nswSearch(spark, path, corpus, "embedding", "vec_id", qv, k = 10)
      .write.format("noop").mode("overwrite").save()
    names.clear()
    val t0 = System.nanoTime()
    GraphAnn.nswSearch(spark, path, corpus, "embedding", "vec_id", qv, k = 10)
      .write.format("noop").mode("overwrite").save()
    println(f"== warm nswSearch: ${(System.nanoTime()-t0)/1e9}%.3f s, ${names.size} jobs ==")
    names.zipWithIndex.foreach { case (n, i) => println(f"$i%3d  ${n.take(140)}") }
    spark.stop()
  }
}
