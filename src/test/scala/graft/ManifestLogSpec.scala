package graft

import graft.ingest.ManifestLog

class ManifestLogSpec extends SparkSpec {

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/log"

  test("CAS commit: two interleaved committers — exactly one wins v1, the loser's retry lands v2 with both updates") {
    val dir = freshDir("mlog_race")
    // both committers read the same (empty) head and race for version 1
    assert(ManifestLog.tryCommit(spark, dir, 1L, Seq("a")),
      "first claim of v1 must win")
    assert(!ManifestLog.tryCommit(spark, dir, 1L, Seq("b")),
      "second claim of the SAME version must lose — never overwrite")
    assert(ManifestLog.currentVersion(spark, dir) === 1L)
    assert(ManifestLog.read(spark, dir, 1L) === Some(Seq("a")))
    // the loser retries through the optimistic loop: its update applies
    // ON TOP of the winner's head — no lost update
    val v = ManifestLog.commit(spark, dir, head => head :+ "b")
    assert(v === 2L, "loser's retry must land on the NEXT version")
    assert(ManifestLog.read(spark, dir, 2L) === Some(Seq("a", "b")))
  }

  test("a torn claim is invisible to readers and permanently consumes its number") {
    val dir = freshDir("mlog_torn")
    assert(ManifestLog.commit(spark, dir, _ => Seq("a")) === 1L)
    // crash between claim and install: a sentinel-less v2 file
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val torn = new org.apache.hadoop.fs.Path(dir, "v2.manifest")
    val out = fs.create(torn, true)
    try out.write("half-writ".getBytes("UTF-8")) finally out.close()
    // readers resolve v1 — the torn head never serves
    assert(ManifestLog.currentVersion(spark, dir) === 1L)
    assert(ManifestLog.read(spark, dir, 2L) === None)
    // the next commit claims PAST the torn number — it is burned, so a
    // reviving v2 writer could never clobber a later-installed version
    assert(ManifestLog.commit(spark, dir, h => h :+ "c") === 3L)
    assert(ManifestLog.currentVersion(spark, dir) === 3L)
    assert(ManifestLog.read(spark, dir, 3L) === Some(Seq("a", "c")))
  }

  test("compatSentinel conf writes the bare pre-salt sentinel a pre-salt reader accepts; default stays salted") {
    def lastLine(dir: String, v: Long): String = {
      val p = new org.apache.hadoop.fs.Path(dir, s"v$v.manifest")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toSeq.last
      finally in.close()
    }
    // default: salted — the incarnation-fingerprint hardening is on
    val salted = freshDir("mlog_salted")
    ManifestLog.commit(spark, salted, _ => Seq("a"))
    assert(lastLine(salted, 1L).startsWith("end:"),
      "default commits must carry the incarnation salt")
    // mixed-binary rollout: compat mode writes EXACTLY the pre-salt
    // format, so an old binary reading this head sees a valid version
    // (not a "torn" one it would silently resolve below — the
    // resurrected-deletes hazard the knob exists to close)
    val compat = freshDir("mlog_compat")
    spark.conf.set(graft.ingest.ManifestLog.CompatSentinelKey, "true")
    try {
      ManifestLog.commit(spark, compat, _ => Seq("a"))
      assert(lastLine(compat, 1L) === "end",
        "compat commits must be byte-identical to the pre-salt format")
      // and salted readers still read it fine
      assert(ManifestLog.read(spark, compat, 1L) === Some(Seq("a")))
    } finally spark.conf.unset(graft.ingest.ManifestLog.CompatSentinelKey)
  }

  test("concurrent committers: every update survives, versions are distinct and dense above the base") {
    val dir = freshDir("mlog_threads")
    val perWriter = 5
    val writers = 4
    val committed = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val threads = (0 until writers).map { w =>
      new Thread(() => {
        (0 until perWriter).foreach { i =>
          committed.add(ManifestLog.commit(spark, dir, h => h :+ s"w$w-$i"))
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    val versions = committed.asScala.toSeq.sorted
    assert(versions.size === writers * perWriter, "every commit must land")
    assert(versions.distinct.size === versions.size, "versions must be unique")
    val head = ManifestLog.read(spark, dir,
      ManifestLog.currentVersion(spark, dir)).get
    val expected = (for (w <- 0 until writers; i <- 0 until perWriter)
      yield s"w$w-$i").toSet
    assert(head.toSet === expected,
      s"lost updates: missing ${expected -- head.toSet}")
  }

  test("index-manifest race: appender vs compactor — the loser's retry preserves the winner's update") {
    // The fleet race the ANN index version logs (AnnIndex commitIndexVersion)
    // exist for: an APPENDER (head ++ new files) racing a COMPACTOR
    // (rewrite the head's files as compacted ones, KEEPING files it did
    // not rewrite). The compactor derives from v1, loses the v2 claim to
    // the appender, and its optimistic retry must re-derive from the NEW
    // head — the appended file survives compaction instead of being lost.
    val dir = freshDir("mlog_idx")
    assert(ManifestLog.commit(spark, dir, _ => Seq("b1", "b2")) === 1L)
    val base = ManifestLog.read(spark, dir, 1L).get.toSet
    // appender wins v2 first (simulating the compactor losing the race)
    assert(ManifestLog.commit(spark, dir, h => h :+ "a1") === 2L)
    // compactor's loop: rewrite exactly the files that existed when it
    // STARTED (base), keep everything committed since
    val v = ManifestLog.commit(spark, dir,
      head => head.filterNot(base) :+ "compacted-0")
    assert(v === 3L)
    assert(ManifestLog.read(spark, dir, 3L) === Some(Seq("a1", "compacted-0")),
      "the compactor must carry the appended file it did not rewrite")
    // expiry below the head leaves the survivors readable and reclaims
    // the rest from the liveness set (the index vacuum rows' protocol)
    assert(ManifestLog.expire(spark, dir, keepFrom = 3L) === Seq(1L, 2L))
    assert(ManifestLog.read(spark, dir, 1L) === None)
    assert(ManifestLog.currentVersion(spark, dir) === 3L)
    assert(ManifestLog.allReferenced(spark, dir) === Set("a1", "compacted-0"))
    // expiry may never drop the valid head
    intercept[IllegalArgumentException] {
      ManifestLog.expire(spark, dir, keepFrom = 4L)
    }
  }
}
