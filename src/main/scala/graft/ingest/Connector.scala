package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Acquisition-connector shape (SURVEY.md §2.1 S5/S6): the reference's
  * scrapers are single-threaded driver loops over a seed list with
  * rate-limited fetches and typed failure statuses
  * (`scrape_youtube_metadata.py:98-144`, `download_ia_collection.py:38-95`).
  * The at-scale Spark shape is: seed DataFrame → repartition to the
  * desired fetch parallelism → `mapPartitions` connector where each
  * partition holds one rate-limited client → typed result rows that flow
  * into the ordinary ingest surface (K4 sink, K5 state table for resume).
  *
  * The network itself is out of engine scope (and unavailable offline), so
  * `Fetcher` is an injection point: production supplies an HTTP client,
  * tests and this repo supply deterministic fakes. Everything Spark-side —
  * partition-granular client setup, per-request pacing with seeded jitter
  * (the reference's 0.5 s ±10%, `scrape_youtube_metadata.py:42,142-143`),
  * per-record failure isolation into typed statuses, resumability via the
  * processed-key anti-join — is real and tested.
  *
  * Scale notes: fetch parallelism is the partition count, NOT the cluster
  * size — a polite connector over a 1B-seed frame still runs a bounded
  * number of concurrent clients; seeds and results shuffle as compact
  * keys/payloads; failures stay rows (never task failures), so one bad
  * record cannot kill a 10-hour acquisition job.
  */
object Connector {

  /** Typed outcome statuses, mirroring the reference's enum
    * (`scrape_youtube_metadata.py:45-48`).
    */
  val StatusOk = "success"
  val StatusUnavailable = "unavailable"
  val StatusFailed = "fetch_failed"

  final case class FetchResult(
    key: String,
    status: String,
    payload: String, // null unless status == success
    error: String)   // null unless status == fetch_failed

  /** One fetch; implementations must be Serializable (shipped to tasks). */
  trait Fetcher extends Serializable {
    def fetch(key: String): FetchResult
  }

  /** Per-partition pacing: fixed delay with seeded ±jitterFrac jitter —
    * deterministic per (seed, partition) for tests; the sleeper is
    * injectable so specs count pauses instead of sleeping.
    */
  final class RateLimiter(delayMs: Long, jitterFrac: Double, seed: Long,
      sleeper: Long => Unit) extends Serializable {
    private val rnd = new java.util.Random(seed)
    def pause(): Unit = {
      val jitter = ((rnd.nextDouble() * 2 - 1) * jitterFrac * delayMs).toLong
      sleeper(math.max(0L, delayMs + jitter))
    }
  }

  /** Run the connector: one rate-limited fetch per seed key, failures
    * isolated into typed rows. `parallelism` bounds concurrent clients.
    */
  def fetchAll(seeds: DataFrame, keyCol: String, fetcher: Fetcher,
      delayMs: Long = 500, jitterFrac: Double = 0.1,
      parallelism: Int = 8,
      sleeper: Long => Unit = Thread.sleep): Dataset[FetchResult] = {
    val spark = seeds.sparkSession
    implicit val enc = Encoders.product[FetchResult]
    import spark.implicits._
    seeds.select(col(keyCol).cast("string").as("key")).as[String]
      .repartition(parallelism)
      .mapPartitions { keys =>
        // one client + one limiter per partition (the mapInPandas-style
        // init-once shape); jitter seeded by partition for determinism
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val limiter = new RateLimiter(delayMs, jitterFrac, seed = 42L + pid, sleeper)
        keys.map { k =>
          limiter.pause()
          try fetcher.fetch(k)
          catch {
            case scala.util.control.NonFatal(e) =>
              FetchResult(k, StatusFailed, null, String.valueOf(e.getMessage))
          }
        }
      }
  }

  /** Resumable acquisition run: anti-join seeds against the processed-key
    * state (J2), fetch the remainder, append results to the JSON sink (K4
    * layout) and successful keys to the state table (K5) — the reference's
    * scraper loop as one resumable batch job.
    *
    * Delivery contract: the sink is **at-least-once, keyed by `keyCol`**.
    * Results are appended to `outDir` *before* the state marker is written;
    * a crash between the two re-fetches and re-appends those keys on the
    * next run. This is deliberate — the alternative (marker first) silently
    * *loses* fetched data on a crash, and lost rows are unrecoverable while
    * duplicate rows are a `dropDuplicates(keyCol)` away. Downstream
    * consumers must dedup by key, exactly as the ingest pipeline's J1
    * anti-join already does for every sink in this engine.
    */
  def resumableRun(seeds: DataFrame, keyCol: String, fetcher: Fetcher,
      outDir: String, statePath: String,
      delayMs: Long = 500, parallelism: Int = 8,
      sleeper: Long => Unit = Thread.sleep): DataFrame = {
    val todo = graft.ops.Ingest.filterProcessed(seeds, statePath, keyCol)
    // localCheckpoint (not cache): the lineage includes the state-table
    // scan, and appending to that table below would invalidate a cache
    // entry via refreshByPath — recomputing the "results" against the NEW
    // state. Truncating lineage pins this run's results.
    val results = fetchAll(todo, keyCol, fetcher, delayMs = delayMs,
      parallelism = parallelism, sleeper = sleeper).toDF()
      .localCheckpoint(true)
    results.write.mode("append").json(outDir)
    graft.ops.Ingest.markProcessed(
      results.filter(col("status") === StatusOk)
        .withColumnRenamed("key", keyCol), statePath, keyCol)
    results
  }
}
