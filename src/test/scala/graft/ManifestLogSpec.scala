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
}
