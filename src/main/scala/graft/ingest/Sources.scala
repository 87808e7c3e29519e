package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** File-based source readers (SURVEY.md §2.1 S2-S4, §2.2 K4) beyond the
  * JSONL chunk scan in ops.Ingest.
  *
  * All readers are declarative `spark.read` scans: directory recursion,
  * extension filtering, and hidden-file pruning happen at file-listing
  * time (the S4/P8 scan-time pruning the reference hand-codes with
  * os.walk), and per-record parsing is distributed — no driver loops.
  */
object Sources {

  /** Video source record schema (FIXTURES.md A2, subset used by the
    * chunker consumer `chunk_youtube_transcripts.py:144-173`).
    */
  val VideoSchema: StructType = StructType(Seq(
    StructField("video_id", StringType),
    StructField("title", StringType),
    StructField("channel_folder", StringType),
    StructField("upload_date", StringType),
    StructField("tags", ArrayType(StringType)),
    StructField("view_count", LongType),
    StructField("duration_seconds", LongType),
    StructField("transcript", StringType),
    StructField("status", StringType)))

  /** S2: per-file JSON document scan — recursive walk, .json filter,
    * hidden files pruned by the default listing, one multi-line record per
    * file (`chunk_youtube_transcripts.py:113-145`). P2 transcript validity
    * filter applied.
    */
  def readVideoJsonDir(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .schema(VideoSchema)
      .option("multiLine", true)
      .option("recursiveFileLookup", true)
      .option("pathGlobFilter", "*.json")
      .json(dir)
      .filter(col("video_id").isNotNull &&
        col("transcript").isNotNull && length(trim(col("transcript"))) > 0)

  /** S3: JSON array scan — one file holding a catalog object whose
    * `vulnerabilities` array is the record stream
    * (`chunk_cisa_kev.py:98-113`): read multiLine, explode the array.
    */
  def readKevCatalog(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", true).json(path)
      .select(explode(col("vulnerabilities")).as("v"))
      .select("v.*")

  /** S4 (generic): binary scan + text extraction — recursive listing with
    * extension filter via binaryFile (content, path, length,
    * modificationTime), then a per-file extraction step (UTF-8 decode;
    * extraction-failure → null → filter reproduces the reference's
    * corrupt-file skip, `chunk_local_pdfs.py:138-158`). For PDFs use
    * readPdfDir below, which extracts real text.
    */
  def readBinaryDocs(spark: SparkSession, dir: String, glob: String): DataFrame = {
    val extract = udf((bytes: Array[Byte]) =>
      if (bytes == null) null
      else
        try {
          val s = new String(bytes, "UTF-8")
          if (s.contains('�')) null else s // undecodable → corrupt → skip
        } catch { case _: Exception => null })
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", true)
      .load(dir)
      .withColumn("text", extract(col("content")))
      .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
      .select(col("path"), col("length"), col("text"))
  }

  /** S4 (PDF): binary scan + native text extraction (graft.ingest.PdfText)
    * — per-page text in reading order joined with "\n\n" and the document
    * metadata the reference captures (`chunk_local_pdfs.py:138-158`:
    * title/author/subject/keywords). Unparseable files → null → filtered,
    * the same corrupt-skip path. The extractor runs inside the scan's
    * narrow map: payload bytes never shuffle.
    */
  def readPdfDir(spark: SparkSession, dir: String): DataFrame = {
    val extract = udf((bytes: Array[Byte]) =>
      PdfText.extract(bytes).map(d => (
        d.text, d.pages.length,
        d.title.orNull, d.author.orNull, d.subject.orNull, d.keywords.orNull)))
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.pdf")
      .option("recursiveFileLookup", true)
      .load(dir)
      .withColumn("doc", extract(col("content")))
      .filter(col("doc").isNotNull && length(trim(col("doc._1"))) > 0)
      .select(
        col("path"),
        col("length"),
        col("doc._1").as("text"),
        col("doc._2").as("n_pages"),
        col("doc._3").as("pdf_title"),
        col("doc._4").as("pdf_author"),
        col("doc._5").as("pdf_subject"),
        col("doc._6").as("pdf_keywords"))
  }

  /** Typed per-file status companion to readPdfDir — `ok` / `encrypted` /
    * `not_pdf` / `corrupt` per file instead of one silent skip bucket
    * (the reference's typed fetch statuses,
    * `scrape_youtube_metadata.py:45-48`): an ingest run can now report
    * "3 skipped: 2 encrypted, 1 corrupt" and route encrypted files to a
    * password queue rather than losing them indistinguishably. Same
    * narrow-map scan shape; payload bytes never shuffle.
    */
  def readPdfDirStatuses(spark: SparkSession, dir: String): DataFrame = {
    val status = udf((bytes: Array[Byte]) => PdfText.extractionStatus(bytes))
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.pdf")
      .option("recursiveFileLookup", true)
      .load(dir)
      .select(col("path"), col("length"), status(col("content")).as("status"))
  }

  /** K4: partitioned JSON sink — the scalable replacement for the
    * reference's one-file-per-record layout (`scrape_youtube_metadata
    * .py:146-152`): records land under partition directories keyed by the
    * grouping column.
    */
  def writePartitionedJson(df: DataFrame, partitionCol: String, outDir: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).json(outDir)
}
