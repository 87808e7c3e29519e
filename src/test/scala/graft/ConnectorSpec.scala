package graft

import graft.ingest.Connector
import graft.ingest.Connector.{FetchResult, StatusFailed, StatusOk, StatusUnavailable}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator
import java.nio.file.Files

/** Deterministic fake fetcher: key suffix controls the outcome. */
class FakeFetcher extends Connector.Fetcher {
  def fetch(key: String): FetchResult =
    if (key.endsWith("_missing")) FetchResult(key, StatusUnavailable, null, null)
    else if (key.endsWith("_boom")) throw new RuntimeException(s"boom on $key")
    else FetchResult(key, StatusOk, s"payload for $key", null)
}

class ConnectorSpec extends SparkSpec {
  import spark.implicits._

  private def seeds(keys: String*) = keys.toDF("video_id")

  test("S5 shape: every seed yields exactly one typed result row") {
    val out = Connector.fetchAll(
      seeds("a", "b_missing", "c_boom", "d"), "video_id", new FakeFetcher,
      parallelism = 3, sleeper = _ => ()).collect()
    assert(out.length === 4)
    val byKey = out.map(r => r.key -> r).toMap
    assert(byKey("a").status === StatusOk && byKey("a").payload === "payload for a")
    assert(byKey("b_missing").status === StatusUnavailable)
    assert(byKey("c_boom").status === StatusFailed)
    assert(byKey("c_boom").error.contains("boom on c_boom"))
    assert(byKey("d").status === StatusOk)
  }

  test("failures are rows, never task failures") {
    val out = Connector.fetchAll(
      seeds((1 to 50).map(i => s"k${i}_boom"): _*), "video_id", new FakeFetcher,
      parallelism = 4, sleeper = _ => ()).collect()
    assert(out.length === 50)
    assert(out.forall(_.status === StatusFailed))
  }

  test("rate limiter pauses once per fetch with bounded jitter") {
    val sc = spark.sparkContext
    val pauses: LongAccumulator = sc.longAccumulator("pauses")
    val totalMs: LongAccumulator = sc.longAccumulator("totalMs")
    Connector.fetchAll(
      seeds((1 to 20).map(i => s"k$i"): _*), "video_id", new FakeFetcher,
      delayMs = 500, jitterFrac = 0.1, parallelism = 2,
      sleeper = ms => { pauses.add(1); totalMs.add(ms) })
      .write.format("noop").mode("overwrite").save()
    assert(pauses.value === 20, "one pause per request")
    val avg = totalMs.value.toDouble / pauses.value
    assert(avg >= 450 && avg <= 550, s"mean pause $avg outside 500±10%")
  }

  test("resumable run: re-run fetches only unprocessed keys; unavailable keys retry") {
    val base = Files.createTempDirectory("connector").toString
    val out = s"$base/out"
    val state = s"$base/state"
    val r1 = Connector.resumableRun(
      seeds("a", "b_missing", "c"), "video_id", new FakeFetcher,
      out, state, parallelism = 2, sleeper = _ => ()).collect()
    assert(r1.length === 3)

    val r2 = Connector.resumableRun(
      seeds("a", "b_missing", "c", "d"), "video_id", new FakeFetcher,
      out, state, parallelism = 2, sleeper = _ => ()).collect()
    // a and c are in the state table; b_missing was not marked → retried
    assert(r2.map(_.getAs[String]("key")).sorted.toSeq === Seq("b_missing", "d"))

    // the K4 sink accumulated every result row across both runs
    assert(spark.read.json(out).count() === 5)
  }
}
