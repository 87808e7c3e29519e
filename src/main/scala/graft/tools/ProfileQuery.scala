package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiler: run one registered query N times and print per-iteration
  * wall time — separates one-time planning/codegen cost (iteration 1) from
  * steady-state execution (iterations 2+).
  *
  * Usage: runMain graft.tools.ProfileQuery <queryName> [sfDir] [n]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })
    val fn = graft.SparkEntry.queries(name)
    if (sys.env.contains("PROFILE_EXPLAIN")) {
      val qe = fn(spark, sfDir).queryExecution
      println("[profile] === ANALYZED ===")
      println(qe.analyzed.toString)
      val plan = qe.executedPlan.toString
      println(s"[profile] UDF count in plan: ${"UDF".r.findAllIn(plan).length}")
      println(plan)
    }
    // the listener bus is async: quiesce until the count is stable so
    // late JobStart events don't leak into the next iteration's tally.
    // BOUNDED (max ~5 s): a query that launches jobs continuously (a
    // streaming source, a stray background listener) must not hang the
    // profiler — past the bound the count is reported as-is (approximate)
    def settledJobs(): Int = {
      var prev = -1
      var cur = jobs.get()
      var waited = 0
      while (cur != prev && waited < 50) {
        Thread.sleep(100)
        waited += 1
        prev = cur
        cur = jobs.get()
      }
      if (waited >= 50)
        println("[profile] WARNING: job count did not settle in 5 s — approximate")
      cur
    }
    (1 to n).foreach { i =>
      val j0 = settledJobs()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[profile] $name iter $i: ${(System.nanoTime() - t0) / 1e9}%.3f s  ${settledJobs() - j0}%4d jobs")
    }
    spark.stop()
  }
}
