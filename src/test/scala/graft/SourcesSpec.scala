package graft

import graft.ingest.Sources
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def write(path: String, content: String): Unit = {
    Files.createDirectories(Paths.get(path).getParent)
    Files.write(Paths.get(path), content.getBytes("UTF-8"))
  }

  test("S2: per-file JSON scan recurses, filters extension, validates transcripts") {
    val dir = Files.createTempDirectory("videos").toString
    write(s"$dir/ch1/v1.json",
      """{"video_id": "v1", "title": "T1", "channel_folder": "ch1",
        |"tags": ["a"], "view_count": 10, "transcript": "hello transcript",
        |"status": "FETCHED"}""".stripMargin)
    write(s"$dir/ch1/nested/v2.json",
      """{"video_id": "v2", "title": "T2", "channel_folder": "ch1",
        |"transcript": "", "status": "NO_TRANSCRIPT_FOUND"}""".stripMargin)
    write(s"$dir/ch2/v3.json",
      """{"video_id": "v3", "title": "T3", "channel_folder": "ch2",
        |"transcript": "bonjour", "status": "FETCHED"}""".stripMargin)
    write(s"$dir/ch2/notes.txt", "not json, must be ignored")
    val out = Sources.readVideoJsonDir(spark, dir)
    assert(out.select("video_id").as[String].collect().sorted.toSeq === Seq("v1", "v3"))
  }

  test("S3: KEV catalog array scan explodes vulnerabilities") {
    val dir = Files.createTempDirectory("kev").toString
    write(s"$dir/kev.json",
      """{"title": "KEV Catalog", "count": 2, "vulnerabilities": [
        |  {"cveID": "CVE-2021-1", "vendorProject": "V1", "product": "P1",
        |   "dateAdded": "2021-11-03", "cwes": ["CWE-1"]},
        |  {"cveID": "CVE-2022-2", "vendorProject": "V2", "product": "P2",
        |   "dateAdded": "2022-01-10", "cwes": []}
        |]}""".stripMargin)
    val out = Sources.readKevCatalog(spark, s"$dir/kev.json")
    assert(out.count() === 2)
    assert(out.select("cveID").as[String].collect().sorted.toSeq ===
      Seq("CVE-2021-1", "CVE-2022-2"))
    assert(out.columns.contains("cwes"))
  }

  test("S4: binary scan extracts text, skips undecodable files") {
    val dir = Files.createTempDirectory("bins").toString
    write(s"$dir/a/good.txt", "extracted text content")
    Files.createDirectories(Paths.get(s"$dir/b"))
    Files.write(Paths.get(s"$dir/b/bad.txt"),
      Array[Byte](-1, -2, -60, 0, 65, -77, -1, -9)) // invalid UTF-8
    write(s"$dir/b/skip.dat", "wrong extension")
    val out = Sources.readBinaryDocs(spark, dir, "*.txt")
    val rows = out.collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[String]("text") === "extracted text content")
    assert(rows.head.getAs[String]("path").endsWith("good.txt"))
  }

  test("K4: partitioned JSON sink lays out records by partition column") {
    val out = Files.createTempDirectory("k4").toString + "/sink"
    val df = Seq(("v1", "ch1"), ("v2", "ch1"), ("v3", "ch2"))
      .toDF("video_id", "channel_folder")
    Sources.writePartitionedJson(df, "channel_folder", out)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq === Seq("channel_folder=ch1", "channel_folder=ch2"))
    val back = spark.read.json(out)
    assert(back.count() === 3)
    assert(back.filter(col("channel_folder") === "ch1").count() === 2)
  }
}
