package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiler: run a list of registered queries under the bench session
  * config and print per-query wall time AND Spark job count for each of n
  * iterations — job count separates "many sequential driver-side jobs"
  * (probes, counts, fixture builds) from "one slow job" (a heavy stage),
  * which need different optimizations.
  *
  * Usage: runMain graft.tools.ProfileBoard <q1,q2,...|all> [sfDir] [n]
  */
object ProfileBoard {
  def main(args: Array[String]): Unit = {
    val names: Seq[String] =
      if (args(0) == "all") graft.SparkEntry.queries.keys.toSeq.sorted
      else args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.withRecommended(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
    val stageLog = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Int)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet()
          tasks.addAndGet(s.stageInfo.numTasks)
          val i = s.stageInfo
          val dur = (for {a <- i.completionTime; b <- i.submissionTime}
            yield a - b).getOrElse(-1L)
          stageLog.add((i.name.takeWhile(_ != '\n').take(70), dur, i.numTasks))
        }
      })
    def settled(c: java.util.concurrent.atomic.AtomicInteger): Int = {
      var prev = -1; var cur = c.get(); var waited = 0
      while (cur != prev && waited < 30) {
        Thread.sleep(100); waited += 1; prev = cur; cur = c.get()
      }
      cur
    }
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[board] no such query: $name")
        case Some(fn) =>
          (1 to n).foreach { i =>
            val j0 = settled(jobs); val s0 = stages.get(); val t0c = tasks.get()
            val t0 = System.nanoTime()
            try {
              fn(spark, sfDir).write.format("noop").mode("overwrite").save()
              val dt = (System.nanoTime() - t0) / 1e9
              val dj = settled(jobs) - j0
              println(f"[board] $name%-42s iter $i: $dt%7.3f s $dj%4d jobs ${stages.get() - s0}%4d stages ${tasks.get() - t0c}%6d tasks")
              if (sys.env.contains("PROFILE_STAGES")) {
                import scala.jdk.CollectionConverters._
                val drained = stageLog.asScala.toSeq
                stageLog.clear()
                drained.sortBy(-_._2).take(8).foreach { case (n, d, t) =>
                  println(f"[board]     stage $d%6d ms $t%4d tasks  $n")
                }
              } else stageLog.clear()
            } catch { case e: Throwable =>
              println(s"[board] $name iter $i FAILED: ${e.getMessage}")
            }
            spark.catalog.clearCache()
          }
      }
    }
    spark.stop()
  }
}
