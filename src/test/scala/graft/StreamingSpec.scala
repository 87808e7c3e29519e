package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("batch session_window matches the lag/cumsum formulation on a hand case") {
    // user 1: events at 0, 10, 55 min (one session: gaps 10, 45>30 → two sessions)
    val df = Seq(
      (1L, ts(0), 1.0), (1L, ts(10), 2.0), (1L, ts(55), 3.0),
      (2L, ts(5), 4.0))
      .toDF("user_id", "ts", "value")
    val sessions = df
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), min(col("ts")).as("start"))
      .select("user_id", "start", "n")
      .orderBy("user_id", "start")
      .collect()
    assert(sessions.map(r => (r.getLong(0), r.getLong(2))).toSeq ===
      Seq((1L, 2L), (1L, 1L), (2L, 1L)))
    assert(sessions(0).getTimestamp(1) === ts(0))
    assert(sessions(1).getTimestamp(1) === ts(55))
  }

  test("streaming: watermarked hourly window counts over a memory source") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val events = mem.toDF().toDF("ts", "event_type")
    val q = EventStreams.hourlyCountsStream(events)
      .writeStream.format("memory").queryName("hourly_counts")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData((ts(5), "click"), (ts(15), "click"), (ts(65), "view"))
      q.processAllAvailable()
      val out = spark.table("hourly_counts")
        .groupBy("window_start", "event_type").agg(max("n_events").as("n"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(out === Set(
        (ts(0), "click", 2L),
        (ts(60), "view", 1L)))
    } finally q.stop()
  }

  test("streaming retrieval: stream-static bucket join matches the batch threshold path") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.QueryStreams
    import graft.vector.{IndexBuilder, VectorFunctions}
    val lsh = new IndexBuilder.RandomHyperplaneLsh(64, 6, 42L)
    val corpus = IndexBuilder.withLshBucket(
      Tables.embeddings(spark, sf), "embedding", lsh)
    val qvecs = Tables.embeddings(spark, sf)
      .filter(col("vec_id").isin(0L, 1L, 2L))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))

    val mem = MemoryStream[(Long, Seq[Float])]
    val queries = mem.toDF().toDF("query_id", "qvec")
    val stream = QueryStreams.retrieveStream(queries, corpus, lsh,
      threshold = 0.2, radius = 1)
    val q = stream.writeStream.format("memory").queryName("retrieved")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(qvecs.toSeq: _*)
      q.processAllAvailable()
      val got = spark.table("retrieved").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // batch reference: same probe buckets, same score, same threshold
      val expected = qvecs.flatMap { case (qid, qv) =>
        val probes = lsh.probes(lsh.signature(qv), 1)
        corpus.filter(col("bucket").isin(probes: _*))
          .withColumn("score", round(
            VectorFunctions.cosineUnit(col("embedding"), typedlit(qv)), 6))
          .filter(col("score") >= 0.2)
          .select(col("vec_id"), col("score")).collect()
          .map(r => (qid, r.getLong(0), r.getDouble(1)))
      }.toSet
      assert(got === expected)
      qvecs.foreach { case (qid, _) =>
        assert(got.exists { case (g, vid, s) => g == qid && vid == qid && s == 1.0 },
          s"query $qid should at least retrieve itself at score 1.0")
      }
    } finally q.stop()
  }

  test("streaming index ingestion: foreachBatch stages exactly-once under replay") {
    import graft.vector.IndexBuilder
    implicit val sqlCtx = spark.sqlContext
    val lsh = new IndexBuilder.RandomHyperplaneLsh(64, 6, 42L)
    val root = java.nio.file.Files.createTempDirectory("lsh_stream_ingest").toString + "/idx"
    val arrivals = Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 40).select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))

    val mem = MemoryStream[(Long, Seq[Float])]
    val writer = mem.toDF().toDF("vec_id", "embedding")
      .writeStream.outputMode(OutputMode.Append()).foreachBatch {
        (batch: org.apache.spark.sql.DataFrame, batchId: Long) => {
          IndexBuilder.stageLshBatch(batch, "embedding", lsh, root, batchId)
          ()
        }
      }
    val q = writer.start()
    try {
      mem.addData(arrivals.take(20).toSeq: _*)
      q.processAllAvailable()
      mem.addData(arrivals.drop(20).toSeq: _*)
      q.processAllAvailable()
      assert(spark.read.parquet(root).count() === 40)
    } finally q.stop()
    // crash-replay: a fresh query re-delivers from batch 0 — the staged
    // directories are rewritten in place, never duplicated
    val mem2 = MemoryStream[(Long, Seq[Float])]
    val q2 = mem2.toDF().toDF("vec_id", "embedding")
      .writeStream.outputMode(OutputMode.Append()).foreachBatch {
        (batch: org.apache.spark.sql.DataFrame, batchId: Long) => {
          IndexBuilder.stageLshBatch(batch, "embedding", lsh, root, batchId)
          ()
        }
      }.start()
    try {
      mem2.addData(arrivals.take(20).toSeq: _*)
      q2.processAllAvailable()
      val idx = spark.read.parquet(root)
      assert(idx.count() === 40, "replayed batch must not duplicate rows")
      // buckets identical to a fresh batch hash (same seeded hyperplanes)
      val fresh = IndexBuilder.withLshBucket(
        Tables.embeddings(spark, sf).filter(col("vec_id") < 40),
        "embedding", lsh).select("vec_id", "bucket").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      idx.select("vec_id", "bucket").collect()
        .foreach(r => assert(r.getInt(1) === fresh(r.getLong(0))))
    } finally q2.stop()
  }

  test("streaming retrieval micro-batch path: literal probe set prunes a partitioned index") {
    import graft.streaming.QueryStreams
    import graft.vector.IndexBuilder
    val lsh = new IndexBuilder.RandomHyperplaneLsh(64, 6, 42L)
    val dir = java.nio.file.Files.createTempDirectory("lsh_idx_stream").toString
    IndexBuilder.buildLshIndex(Tables.embeddings(spark, sf), "embedding", lsh, dir)
    val corpus = spark.read.parquet(dir)
    import spark.implicits._
    val batch = Tables.embeddings(spark, sf).filter(col("vec_id").isin(0L, 1L))
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val out = QueryStreams.retrieveMicroBatch(batch, corpus, lsh, threshold = 0.2)
    val plan = out.queryExecution.executedPlan.toString
    // the CORPUS scan must carry the bucket partition filter (the query
    // side is unpartitioned and legitimately shows an empty filter list)
    assert(plan.contains("PartitionFilters: [bucket"),
      s"probe set did not reach partition pruning on the corpus scan:\n$plan")
    // identical to the unpruned stream-static join semantics
    val unpruned = QueryStreams.retrieveStream(batch, corpus, lsh, threshold = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pruned = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pruned === unpruned)
    assert(Seq(0L, 1L).forall(q => pruned.contains((q, q, 1.0))))
  }

  test("streaming: mapGroupsWithState keeps running per-user counts across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val counts = mem.toDS()
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[(Long, Double)]) =>
          val (c0, s0) = state.getOption.getOrElse((0L, 0.0))
          val batch = rows.toSeq
          val updated = (c0 + batch.size, s0 + batch.map(_._2).sum)
          state.update(updated)
          (user, updated._1, updated._2)
      }
      .toDF("user_id", "n_events", "value_sum")
    val q = counts.writeStream.format("memory").queryName("user_state")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData((1L, 1.0), (1L, 2.0), (2L, 5.0))
      q.processAllAvailable()
      mem.addData((1L, 4.0))
      q.processAllAvailable()
      val latest = spark.table("user_state")
        .groupBy("user_id").agg(max("n_events").as("n"), max("value_sum").as("s"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(latest === Set((1L, 3L, 7.0), (2L, 1L, 5.0)),
        "state must accumulate across micro-batches")
    } finally q.stop()
  }

  test("streaming as-of attribution: hand case across batches, newest click wins") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Long)]
    val out = EventStreams.attributionStream(mem.toDS(), toleranceSeconds = Some(3600L))
    val q = out.writeStream.format("memory").queryName("attribution_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: click then a same-batch purchase at the same instant
      mem.addData((1L, ts(0), "click", 10L), (1L, ts(0), "purchase", 90L))
      q.processAllAvailable()
      // batch 2: a purchase using state from batch 1, then a newer click + purchase
      mem.addData((1L, ts(5), "purchase", 91L),
        (1L, ts(10), "click", 11L), (1L, ts(20), "purchase", 92L))
      q.processAllAvailable()
      // batch 3: stale-by-tolerance purchase (70 min after click 11)
      mem.addData((1L, ts(80), "purchase", 93L), (2L, ts(80), "purchase", 94L))
      q.processAllAvailable()
      val got = spark.table("attribution_stream").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
      assert(got === Map(90L -> 10L, 91L -> 10L, 92L -> 11L, 93L -> -1L, 94L -> -1L))
    } finally q.stop()
  }

  test("streaming as-of attribution: exact parity with the oracled batch query") {
    implicit val sqlCtx = spark.sqlContext
    val ev = Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("ts"), col("event_type"), col("event_id"))
      .orderBy("ts")
      .as[(Long, Timestamp, String, Long)]
      .collect()
    val mem = MemoryStream[(Long, Timestamp, String, Long)]
    val out = EventStreams.attributionStream(mem.toDS(),
      toleranceSeconds = Some(7L * 24 * 3600))
    val q = out.writeStream.format("memory").queryName("attribution_parity")
      .outputMode(OutputMode.Append()).start()
    try {
      // event-time-ordered feed in three micro-batches (the per-key-ordered
      // log deployment the operator documents)
      ev.grouped(math.max(1, ev.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      def key(r: org.apache.spark.sql.Row): (Long, Long, Long, Long) =
        (r.getLong(r.fieldIndex("purchase_id")), r.getLong(r.fieldIndex("user_id")),
          if (r.isNullAt(r.fieldIndex("click_id"))) -1L else r.getLong(r.fieldIndex("click_id")),
          if (r.isNullAt(r.fieldIndex("gap_seconds"))) -1L else r.getLong(r.fieldIndex("gap_seconds")))
      val streamed = spark.table("attribution_parity").collect().map(key).toSet
      val batch = SparkEntry.queries("asof_attribution")(spark, sf).collect().map(key).toSet
      assert(streamed === batch, "stream must equal the oracled batch as-of join")
    } finally q.stop()
  }

  test("streaming dedup: later-batch duplicates are dropped, watermark bounds state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val deduped = EventStreams.dedupStream(
      mem.toDF().toDF("doc_id", "ts", "text"), "doc_id", "ts", "1 hour")
    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((1L, ts(0), "a"), (2L, ts(1), "b"), (1L, ts(2), "a-dup"))
      q.processAllAvailable()
      mem.addData((2L, ts(3), "b-dup"), (3L, ts(4), "c"))
      q.processAllAvailable()
      val out = spark.table("dedup_stream").collect()
        .map(r => r.getLong(0) -> r.getString(2)).toMap
      assert(out === Map(1L -> "a", 2L -> "b", 3L -> "c"),
        "first arrival wins; duplicates in the same or later batches drop")
    } finally q.stop()
  }

  test("streaming curation: line filter + hash dedup compose in a stream with batch parity") {
    // the curation stages are narrow projections + keyed dedup, so the
    // SAME operators run unmodified inside a structured stream; the
    // streaming answer must equal the batch answer on the same rows
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rows = Seq(
      (1L, ts(0), "This line is long enough to keep and ends well.\nshort"),
      (2L, ts(1), "Another keeper line with the needed words here!"),
      (3L, ts(2), "This line is long enough to keep and ends well.\nshort"), // dup of 1 by text
      (4L, ts(3), "lorem ipsum dolor sit amet consectetur adipiscing."))
    val mem = MemoryStream[(Long, Timestamp, String)]
    def curate(df: org.apache.spark.sql.DataFrame) = {
      val lines = split(col("text"), "\n")
      val kept = filter(lines, l =>
        size(graft.ops.Dedup.tokensCol(l)) >= 5 &&
          !l.contains("{") && !lower(l).contains("lorem ipsum") &&
          trim(l).rlike("[.!?]$"))
      df.withColumn("cleaned", array_join(kept, "\n"))
        .filter(length(col("cleaned")) > 0)
        .withColumn("content_hash", md5(col("cleaned")))
    }
    val streamed = EventStreams.dedupStream(
      curate(mem.toDF().toDF("doc_id", "ts", "text")), "content_hash", "ts", "1 hour")
    val q = streamed.writeStream.format("memory").queryName("curated_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(rows.take(2): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(2): _*)
      q.processAllAvailable()
      val stream = spark.table("curated_stream")
        .select("doc_id", "cleaned").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val batch = curate(rows.toDF("doc_id", "ts", "text"))
        .groupBy(col("content_hash"))
        .agg(min(col("doc_id")).as("doc_id"), first(col("cleaned")).as("cleaned"))
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("cleaned")).toMap
      assert(stream === batch, "stream and batch curation must agree")
      assert(stream.keySet === Set(1L, 2L), "doc 3 dedups against 1, doc 4 is all-lorem")
    } finally q.stop()
  }

  test("driver batch queries: hourly windows partition the event count") {
    val hourly = SparkEntry.queries("events_hourly")(spark, sf)
    val total = hourly.agg(sum("n_events")).head().getLong(0)
    assert(total === Tables.events(spark, sf).count())
    val sessions = SparkEntry.queries("events_sessions")(spark, sf)
    val stotal = sessions.agg(sum("n_events")).head().getLong(0)
    assert(stotal === total, "sessions must also partition all events")
  }

  test("stream-stream click-purchase join matches the oracled batch interval join") {
    implicit val sqlCtx = spark.sqlContext
    val ev = Tables.events(spark, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("c_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    val cMem = MemoryStream[(Long, Long, Timestamp)]
    val pMem = MemoryStream[(Long, Long, Timestamp)]
    val q = EventStreams.clickPurchaseJoinStream(
      cMem.toDF().toDF("user_id", "click_id", "c_ts"),
      pMem.toDF().toDF("user_id", "purchase_id", "p_ts"))
      .writeStream.format("memory").queryName("cp_join")
      .outputMode(OutputMode.Append()).start()
    try {
      cMem.addData(clicks.collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2))))
      pMem.addData(purchases.collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2))))
      q.processAllAvailable()
      val stream = spark.table("cp_join")
        .select("user_id", "click_id", "purchase_id", "gap_seconds")
        .collect().map(_.toSeq).toSet
      val batch = SparkEntry.queries("click_purchase_pairs")(spark, sf)
        .collect().map(_.toSeq).toSet
      assert(batch.nonEmpty, "sf0.001 must contain at least one attributed pair")
      assert(stream === batch, "stream-stream join must equal the batch interval join")
    } finally q.stop()
  }

  test("left-outer stream join: abandoned clicks emit only after the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    // base offset off epoch-0: rows AT the initial watermark are late-dropped
    def t(min: Int) = new Timestamp(86400000L + min * 60000L)
    val cMem = MemoryStream[(Long, Long, Timestamp)]
    val pMem = MemoryStream[(Long, Long, Timestamp)]
    val q = EventStreams.clickAbandonmentStream(
      cMem.toDF().toDF("user_id", "click_id", "c_ts"),
      pMem.toDF().toDF("user_id", "purchase_id", "p_ts"),
      windowSeconds = 600L, watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("cp_abandon")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1 converts inside the window; user 2 never purchases
      cMem.addData((1L, 100L, t(0)), (2L, 200L, t(0)))
      pMem.addData((1L, 900L, t(5)))
      q.processAllAvailable()
      val early = spark.table("cp_abandon").collect()
      // user 2's NULL row cannot emit yet: a purchase could still arrive
      assert(!early.exists(r => r.getLong(0) == 2L),
        s"abandonment emitted before the watermark: ${early.toSeq}")
      // advance BOTH watermarks far past click window + delay (the global
      // watermark is the min across inputs — a silent click side pins it)
      cMem.addData((98L, 800L, t(60)))
      pMem.addData((99L, 901L, t(60)))
      q.processAllAvailable()
      cMem.addData((98L, 801L, t(120)))
      pMem.addData((99L, 902L, t(120)))
      q.processAllAvailable()
      val rows = spark.table("cp_abandon").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3))).toSet
      assert(rows.contains((1L, 100L, 900L, false)), s"converted click missing: $rows")
      assert(rows.contains((2L, 200L, -1L, true)), s"abandoned click missing: $rows")
    } finally q.stop()
  }

  test("leaderboard stream: state stays k-bounded and equals the batch top-k") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, String)]
    val q = EventStreams.leaderboardStream(
      mem.toDF().toDF("group", "score", "payload"), k = 3)
      .writeStream.format("memory").queryName("leaderboard")
      .outputMode(OutputMode.Update()).start()
    try {
      def boards: Set[(String, List[(Long, String)])] =
        spark.table("leaderboard").collect()
          .map(r => (r.getString(0), r.getSeq[org.apache.spark.sql.Row](1)
            .map(x => (x.getLong(0), x.getString(1))).toList)).toSet
      mem.addData(("a", 5L, "p1"), ("a", 9L, "p2"), ("a", 1L, "p3"), ("b", 4L, "q1"))
      q.processAllAvailable()
      assert(boards.contains(("a", List((9L, "p2"), (5L, "p1"), (1L, "p3")))))
      mem.addData(("a", 7L, "p4"), ("a", 9L, "p0"), ("b", 2L, "q2"))
      q.processAllAvailable()
      // cumulative top-3 under (score DESC, payload ASC): p0 ties p2 at 9
      // and sorts first; p4 displaces p1; p3 falls off the board
      assert(boards.contains(("a", List((9L, "p0"), (9L, "p2"), (7L, "p4")))))
      assert(boards.contains(("b", List((4L, "q1"), (2L, "q2")))))
    } finally q.stop()
  }

  test("event_rate_anomaly: planted 10x burst alarms, steady traffic never does") {
    // 30 steady hours at 4 events/hour, then one hour with 40 events.
    val base = 1700000000L * 1000000L // epoch micros, hour-aligned enough
    val steady = for (h <- 0 until 30; i <- 0 until 4)
      yield (new Timestamp((base / 1000L) + h * 3600000L + i * 60000L), "click")
    val burst = for (i <- 0 until 40)
      yield (new Timestamp((base / 1000L) + 30 * 3600000L + i * 1000L), "click")
    val events = (steady ++ burst).toDF("ts", "event_type")
    val out = EventStreams.eventRateAnomalyOf(events).collect()
    val spikes = out.filter(_.getAs[Boolean]("is_spike"))
    assert(spikes.length === 1, s"exactly the burst hour alarms: ${spikes.toSeq}")
    assert(spikes.head.getAs[Long]("n_events") === 40L)
    // cold start: the first 12 hours can never alarm regardless of counts
    out.sortBy(_.getAs[Long]("hour_id")).take(12)
      .foreach(r => assert(!r.getAs[Boolean]("is_spike")))
  }

  test("streaming MV maintenance: merged summary equals a batch recompute") {
    implicit val sqlCtx = spark.sqlContext
    val mvPath = java.nio.file.Files
      .createTempDirectory("graft_stream_mv").toString + "/mv"
    val mem = MemoryStream[String]
    val events = mem.toDF().toDF("event_type")
    val q = EventStreams.mvMaintenanceWriter(events, "event_type", mvPath).start()
    try {
      mem.addData("click", "click", "view")
      q.processAllAvailable()
      mem.addData("click", "purchase", "view", "view")
      q.processAllAvailable()
      // merge across micro-batches ≡ one batch recompute over all events
      // (the schema MvRewriteRule routes to; routing itself is pinned in
      // MvRewriteSpec)
      val mv = spark.read.parquet(mvPath).collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      assert(mv === Map("click" -> 3L, "view" -> 3L, "purchase" -> 1L))
    } finally q.stop()

    // sum partials: the second MV shape (counts + integer-unit sums)
    // maintained by the same writer, merge ≡ recompute for the pair
    val mvPathSums = java.nio.file.Files
      .createTempDirectory("graft_stream_mv_sums").toString + "/mv"
    val memS = MemoryStream[(String, Long)]
    val qS = EventStreams.mvMaintenanceWriter(
      memS.toDF().toDF("event_type", "value_e6"),
      "event_type", mvPathSums, sumCol = Some("value_e6")).start()
    try {
      memS.addData(("click", 10L), ("click", 5L), ("view", 7L))
      qS.processAllAvailable()
      memS.addData(("click", 1L), ("view", 2L))
      qS.processAllAvailable()
      val mvS = spark.read.parquet(mvPathSums).collect()
        .map(r => r.getAs[String]("event_type") ->
          ((r.getAs[Long]("cnt"), r.getAs[Long]("sum_value_e6")))).toMap
      assert(mvS === Map("click" -> ((3L, 16L)), "view" -> ((2L, 9L))))
    } finally qS.stop()

    // min/max partials: the third MV shape — per-group extrema maintained
    // next to counts; re-taking the extremum of stored extrema across
    // micro-batches ≡ one batch recompute
    val mvPathMm = java.nio.file.Files
      .createTempDirectory("graft_stream_mv_mm").toString + "/mv"
    val memM = MemoryStream[(String, Long)]
    val qM = EventStreams.mvMaintenanceWriter(
      memM.toDF().toDF("event_type", "value_e6"),
      "event_type", mvPathMm, minMaxCols = Seq("value_e6")).start()
    try {
      memM.addData(("click", 10L), ("click", 5L), ("view", 7L))
      qM.processAllAvailable()
      memM.addData(("click", 1L), ("view", 20L))
      qM.processAllAvailable()
      val mvM = spark.read.parquet(mvPathMm).collect()
        .map(r => r.getAs[String]("event_type") ->
          ((r.getAs[Long]("cnt"), r.getAs[Long]("min_value_e6"),
            r.getAs[Long]("max_value_e6")))).toMap
      assert(mvM === Map("click" -> ((3L, 1L, 10L)), "view" -> ((2L, 7L, 20L))))
    } finally qM.stop()

    // replay protection: a delivery whose batchId was already applied is
    // skipped (foreachBatch is at-least-once; the applied id travels
    // inside the summary dir). A fresh query restarts at batchId 0 — both
    // its batches are ≤ the applied id 1, so the MV must not change.
    val mem2 = MemoryStream[String]
    val q2 = EventStreams.mvMaintenanceWriter(
      mem2.toDF().toDF("event_type"), "event_type", mvPath).start()
    try {
      mem2.addData("click", "click", "click")
      q2.processAllAvailable()
      mem2.addData("view")
      q2.processAllAvailable()
      val after = spark.read.parquet(mvPath).collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      assert(after === Map("click" -> 3L, "view" -> 3L, "purchase" -> 1L),
        s"replayed batch ids must not re-merge: $after")
    } finally q2.stop()
  }

  test("streaming graph ingest: foreachBatch appends reach the walk; replay is view-idempotent") {
    import graft.vector.GraphAnn
    import graft.ops.AnnIndex
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = java.nio.file.Files
      .createTempDirectory("nsw_stream").toString + "/g"
    val base = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").filter(col("vec_id") < 100)
    GraphAnn.buildNswGraph(base, "embedding", "vec_id", AnnIndex.defaultLsh, 8, path)
    // arrivals: existing vectors under fresh ids — near their sources, so
    // the candidate equi-join genuinely links them into the graph
    val arrivalRows = graft.Tables.embeddings(spark, sf)
      .filter(col("vec_id") >= 50 && col("vec_id") < 55)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0) + 5000L, r.getSeq[Float](1)))
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = mem.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        GraphAnn.appendToNswGraph(spark, batch, "embedding", "vec_id",
          AnnIndex.defaultLsh, 8, path, base)
        ()
      }
      .start()
    try {
      mem.addData(arrivalRows.toSeq: _*)
      q.processAllAvailable()
      def view() = GraphAnn.readNswAdjacency(spark, path).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
      val afterFirst = view()
      arrivalRows.foreach { case (id, _) =>
        assert(afterFirst.contains(id), s"arrival $id missing from the merged view")
      }
      // the appended node must be REACHABLE, not just present: search for
      // its own vector and require it in the emission
      val qv = arrivalRows.head._2.toArray
      val got = GraphAnn.nswSearch(spark, path,
          base.unionByName(arrivalRows.toSeq.toDF("vec_id", "embedding")),
          "embedding", "vec_id", qv, k = 3)
        .collect().map(_.getLong(0)).toSet
      assert(got.contains(arrivalRows.head._1),
        s"appended node unreachable through the walk: $got")
      // at-least-once redelivery of the same rows (a fresh delivery id):
      // the merged view must not change — latest-wins resolves the
      // re-landed generation to the identical adjacency
      mem.addData(arrivalRows.toSeq: _*)
      q.processAllAvailable()
      assert(view() === afterFirst, "a replayed append changed the merged view")
    } finally q.stop()
  }
}
