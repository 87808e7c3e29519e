package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}
import graft.vector.VectorFunctions

/** Multimodal column plumbing (training-data-pipeline requirement):
  * image/audio/video as opaque binary columns with typed metadata, plus
  * decode / feature-extract / resize / frame-sample operators.
  *
  * The IMAGE codec is REAL: `javax.imageio` (pure JVM, offline) encodes
  * and decodes PNG payloads — `renderPng` produces actual PNG bytes,
  * `decodeToGrid` decodes any ImageIO-supported format (PNG/BMP/GIF…) to
  * a grayscale grid, and the aHash / feature paths run on decoded
  * PIXELS when the payload decodes (reference analog: PyMuPDF pixmap
  * access, `chunk_local_pdfs.py:138-158`). The AUDIO codec is REAL too:
  * `javax.sound.sampled` (also pure JVM) encodes and decodes RIFF/WAVE —
  * `renderWav` produces actual PCM16 WAV bytes, `decodeWavEnvelope`
  * parses any JDK-supported container (WAV/AIFF/AU) into a fixed-bin
  * amplitude envelope, and the feature / fingerprint paths run on
  * decoded SAMPLES. The VIDEO codec is REAL too: MJPEG-in-AVI is plain
  * RIFF (the WAV lane's chunk grammar) around per-frame JPEGs, so
  * `renderAvi` muxes actual ImageIO-encoded frames into a well-formed
  * AVI and `aviFrameChunks`/`decodeVideoGrid` demux and decode REAL
  * frames — the byte-level STUB remains only as the fallback lane for
  * undecodable payloads (non-AVI video, garbage) — and everything
  * Spark-side is real and tested: the schema (binary payload + metadata
  * struct), the partition-batched execution shape (one codec init per
  * partition, records processed in fixed-size batches — the
  * mapPartitions analog of mapInPandas batching), the feature schema
  * (fixed-dim float array compatible with the vector-search surface),
  * and the partitioning behavior (narrow maps, no shuffle).
  *
  * At 100 TB: payloads live in the parquet as binary; feature extraction
  * is a narrow map whose cost dominates, so partition sizing
  * (`spark.sql.files.maxPartitionBytes`) controls batch memory; extracted
  * features (small) flow into the ANN index build, payloads are never
  * shuffled.
  */
object Multimodal extends QueryModule {

  val FeatureDim = 64
  val BatchSize = 64

  /** Typed media record: opaque payload + modality-specific metadata. */
  case class MediaMeta(width: Int, height: Int, sampleRate: Int, nFrames: Int)
  case class MediaRow(media_id: Long, modality: String, content: Array[Byte],
    meta: MediaMeta)
  case class MediaFeatures(media_id: Long, modality: String,
    features: Array[Float], batch_id: Int, partition_id: Int)

  /** Deterministic synthetic media table derived from documents: payload =
    * utf-8 text bytes (stands in for real image/audio/video bytes; makes
    * byte-level results oracle-reconstructable), modality by id, metadata
    * derived from payload length.
    */
  def syntheticMedia(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(length(col("text")) > 0)
      .select(
        col("doc_id").as("media_id"),
        element_at(typedlit(Seq("image", "audio", "video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
        encode(col("text"), "UTF-8").as("content"),
        struct(
          (lit(64) + pmod(col("n_chars"), lit(448))).cast("int").as("width"),
          (lit(64) + pmod(col("n_chars") * 7, lit(448))).cast("int").as("height"),
          lit(16000).as("sampleRate"),
          (lit(1) + pmod(col("n_chars"), lit(120))).cast("int").as("nFrames")).as("meta"))

  /** STUB decode/feature-extract: a real implementation would decode the
    * payload with an image/audio codec and run a feature model; offline we
    * hash byte windows into a fixed-dim unit-norm vector — deterministic,
    * modality-tagged, same shape/contract as the real thing.
    */
  def stubFeatures(content: Array[Byte], modality: String): Array[Float] = {
    val acc = new Array[Double](FeatureDim)
    if (content != null) {
      var i = 0
      while (i < content.length) {
        val idx = java.lang.Byte.toUnsignedInt(content(i)) % FeatureDim
        acc(idx) += (if (((content(i) >> 3) & 1) == 0) 1.0 else -1.0)
        i += 1
      }
    }
    val modSeed = modality.hashCode.abs % FeatureDim
    acc(modSeed) += 2.0
    var ss = 0.0
    var j = 0
    while (j < FeatureDim) { ss += acc(j) * acc(j); j += 1 }
    val out = new Array[Float](FeatureDim)
    if (ss > 0) {
      val inv = 1.0 / math.sqrt(ss)
      j = 0
      while (j < FeatureDim) { out(j) = (acc(j) * inv).toFloat; j += 1 }
    }
    out
  }

  // ---- REAL image codec (javax.imageio — pure JVM, offline) ----------

  /** The deterministic grayscale render the PNG and MJPEG lanes share:
    * pixel j is the average of byte-window j of the source
    * (position-dependent, so permuted payloads render differently). */
  private def grayImageOf(source: Array[Byte],
      side: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(side, side,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val n = if (source == null) 0 else source.length
    val cells = side * side
    var j = 0
    while (j < cells) {
      val from = (j.toLong * n / cells).toInt
      val until = math.max(from + 1, ((j + 1).toLong * n / cells).toInt)
      var s = 0.0; var c = 0; var i = from
      while (i < math.min(until, n)) {
        s += java.lang.Byte.toUnsignedInt(source(i)); c += 1; i += 1
      }
      img.getRaster.setSample(j % side, j / side, 0,
        if (c == 0) 0 else (s / c).toInt)
      j += 1
    }
    img
  }

  /** REAL ImageIO PNG encode of the deterministic render — the output is
    * actual image bytes any PNG decoder reads. */
  def renderPng(source: Array[Byte], side: Int = 16): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    // write() returns false (no exception) when no PNG writer is
    // registered — an unchecked return would silently render EMPTY
    // payloads and every downstream decode would fall back to the stub
    require(javax.imageio.ImageIO.write(grayImageOf(source, side),
      "png", baos), "renderPng: no registered PNG ImageWriter in this JVM")
    baos.toByteArray
  }

  /** REAL image decode: ImageIO reads the payload (PNG/BMP/GIF/…), the
    * pixels are luma-converted and area-averaged down to a `grid`×`grid`
    * grayscale grid — the decode + resize step of the pipeline on actual
    * pixels. None when the payload is not a decodable image (the caller
    * falls back to the byte-level stub).
    */
  def decodeToGrid(content: Array[Byte], grid: Int = 8): Option[Array[Double]] =
    try {
      if (content == null || content.isEmpty) return None
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(content))
      if (img == null) return None
      val (w, h) = (img.getWidth, img.getHeight)
      if (w <= 0 || h <= 0) return None
      val sums = new Array[Double](grid * grid)
      val counts = new Array[Int](grid * grid)
      // Bulk row reads: per-pixel getRGB(x,y) pays a ColorModel/SRGB
      // conversion CALL per pixel — the classic slow path once images are
      // megapixel-sized (at 100 TB the decode IS the pipeline cost). One
      // getRGB per ROW converts the row in a single library pass while
      // bounding the buffer at w ints regardless of image height.
      val rowBuf = new Array[Int](w)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, rowBuf, 0, w)
        val rowBase = (y * grid / h) * grid
        var x = 0
        while (x < w) {
          val rgb = rowBuf(x)
          val luma = (((rgb >> 16) & 255) * 299 + ((rgb >> 8) & 255) * 587 +
            (rgb & 255) * 114) / 1000.0
          val cell = rowBase + (x * grid / w)
          sums(cell) += luma; counts(cell) += 1
          x += 1
        }
        y += 1
      }
      Some(Array.tabulate(grid * grid)(i =>
        if (counts(i) == 0) 0.0 else sums(i) / counts(i)))
    } catch { case scala.util.control.NonFatal(_) => None }
    // NonFatal only: a fatal error (an executor OOM mid-decode during
    // the ONE-TIME fixture build) must fail that build — swallowing it
    // would persist stub features under a valid cache marker and serve
    // them forever

  // ---- REAL audio codec (javax.sound.sampled — pure JVM, offline) ----

  /** Render deterministic PCM16 mono WAV from source bytes: sample j is
    * the (centered, scaled) average of byte-window j — the audio twin of
    * `renderPng`. REAL `javax.sound.sampled` WAV encode: the output is an
    * actual RIFF/WAVE payload any WAV decoder reads.
    */
  def renderWav(source: Array[Byte], nSamples: Int = 256,
      sampleRate: Float = 16000f): Array[Byte] = {
    val n = if (source == null) 0 else source.length
    val pcm = new Array[Byte](nSamples * 2)
    var j = 0
    while (j < nSamples) {
      val from = (j.toLong * n / nSamples).toInt
      val until = math.max(from + 1, ((j + 1).toLong * n / nSamples).toInt)
      var s = 0.0; var c = 0; var i = from
      while (i < math.min(until, n)) {
        s += java.lang.Byte.toUnsignedInt(source(i)); c += 1; i += 1
      }
      val sample = if (c == 0) 0 else (((s / c) - 128.0) * 256.0).toInt
      pcm(2 * j) = (sample & 0xff).toByte          // little-endian PCM16
      pcm(2 * j + 1) = ((sample >> 8) & 0xff).toByte
      j += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1,
      true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** REAL audio decode: `AudioSystem` parses the payload (WAV/AIFF/AU —
    * the JDK's built-in containers), PCM frames are mixed down to mono
    * doubles and area-averaged into a fixed `bins`-window mean-absolute-
    * amplitude envelope — the decode + resample step on actual samples.
    * None when the payload is not decodable audio (caller falls back to
    * the byte stub), including PCM widths other than 8/16-bit.
    */
  def decodeWavEnvelope(content: Array[Byte],
      bins: Int = FeatureDim): Option[Array[Double]] =
    try {
      if (content == null || content.isEmpty) return None
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      val fmt = ais.getFormat
      val bytesPerSample = fmt.getSampleSizeInBits / 8
      // LINEAR PCM only, in the width/signedness combinations the frame
      // parser below actually implements (16-bit signed, 8-bit unsigned
      // — the WAV conventions). u-law/A-law and signed-8 AIFF/AU would
      // parse as garbage amplitudes; they take the stub lane instead.
      val enc = fmt.getEncoding
      val okPcm =
        (bytesPerSample == 2 &&
          enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) ||
        (bytesPerSample == 1 &&
          enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED)
      if (!okPcm) return None
      val channels = fmt.getChannels
      val frameBytes = bytesPerSample * channels
      val raw = ais.readAllBytes()
      val nFrames = raw.length / frameBytes
      if (nFrames <= 0) return None
      val sums = new Array[Double](bins)
      val counts = new Array[Int](bins)
      var f = 0
      while (f < nFrames) {
        var mono = 0.0
        var ch = 0
        while (ch < channels) {
          val base = f * frameBytes + ch * bytesPerSample
          val v =
            if (bytesPerSample == 2) {
              val lo = raw(base) & 0xff
              val hi = raw(base + 1).toInt
              if (fmt.isBigEndian) ((raw(base).toInt << 8) | (raw(base + 1) & 0xff)).toShort.toDouble
              else ((hi << 8) | lo).toShort.toDouble
            } else java.lang.Byte.toUnsignedInt(raw(base)) - 128.0
          mono += v
          ch += 1
        }
        val cell = (f.toLong * bins / nFrames).toInt
        sums(cell) += math.abs(mono / channels)
        counts(cell) += 1
        f += 1
      }
      Some(Array.tabulate(bins)(i =>
        if (counts(i) == 0) 0.0 else sums(i) / counts(i)))
    } catch { case scala.util.control.NonFatal(_) => None } // see decodeToGrid

  // ---- REAL video codec: MJPEG-in-AVI (RIFF mux + ImageIO JPEG) -------
  // The AVI container is plain RIFF — the SAME chunk grammar the WAV lane
  // already rides — and MJPEG stores each frame as an ordinary JPEG, which
  // javax.imageio decodes offline. So the video lane needs no external
  // demuxer: mux = RIFF chunks around ImageIO-encoded JPEG frames, demux =
  // the RIFF walk + the existing decodeToGrid per `00dc` frame chunk. The
  // byte-level stub remains ONLY as the non-AVI fallback.

  private def le32(v: Int): Array[Byte] = Array((v & 255).toByte,
    ((v >> 8) & 255).toByte, ((v >> 16) & 255).toByte,
    ((v >> 24) & 255).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 255).toByte, ((v >> 8) & 255).toByte)
  private def fcc(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  private def riffChunk(id: String, data: Array[Byte]): Array[Byte] = {
    val pad = if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
    fcc(id) ++ le32(data.length) ++ data ++ pad
  }
  private def riffList(listType: String, inner: Array[Byte]): Array[Byte] =
    riffChunk("LIST", fcc(listType) ++ inner)

  /** Render a deterministic MJPEG-in-AVI payload: frame f is the
    * grayscale render of byte-window f of the source, JPEG-encoded by
    * ImageIO and muxed as a `00dc` chunk inside a well-formed RIFF/AVI
    * (avih + vids/MJPG strh + BITMAPINFOHEADER strf + movi) — real video
    * bytes with the standard structure any AVI demuxer walks. */
  def renderAvi(source: Array[Byte], nFrames: Int = 3,
      side: Int = 16): Array[Byte] = {
    val n = if (source == null) 0 else source.length
    val frames = (0 until math.max(1, nFrames)).map { f =>
      val from = (f.toLong * n / math.max(1, nFrames)).toInt
      val until = math.max(from + 1,
        ((f + 1).toLong * n / math.max(1, nFrames)).toInt)
      val slice =
        if (n == 0) Array.empty[Byte] else source.slice(from, math.min(until, n))
      val baos = new java.io.ByteArrayOutputStream()
      // checked like renderPng: a JVM with no JPEG writer must fail
      // loudly, not mux empty frames into a well-formed AVI
      require(javax.imageio.ImageIO.write(grayImageOf(slice, side),
        "jpg", baos), "renderAvi: no registered JPEG ImageWriter in this JVM")
      baos.toByteArray
    }
    muxAvi(frames, side)
  }

  /** Mux PRE-ENCODED frame chunks into a well-formed MJPEG AVI —
    * renderAvi's container around EXISTING frame bytes. This is the
    * remux half of re-encode/trim provenance: a trimmed copy built here
    * keeps its surviving frames byte-identical to the original's, which
    * is exactly what the per-frame near-dup lane detects and the
    * whole-video mean-grid hash cannot (dropping a frame moves the
    * mean grid of every surviving cell). */
  def muxAvi(frames: Seq[Array[Byte]], side: Int = 16): Array[Byte] = {
    require(frames.nonEmpty, "muxAvi: no frames")
    val maxFrame = frames.map(_.length).max
    val avih = riffChunk("avih", le32(100000) ++ le32(0) ++ le32(0) ++
      le32(0) ++ le32(frames.length) ++ le32(0) ++ le32(1) ++
      le32(maxFrame) ++ le32(side) ++ le32(side) ++ Array.fill(16)(0.toByte))
    val strh = riffChunk("strh", fcc("vids") ++ fcc("MJPG") ++
      le32(0) ++ le16(0) ++ le16(0) ++ le32(0) ++ le32(1) ++ le32(10) ++
      le32(0) ++ le32(frames.length) ++ le32(maxFrame) ++ le32(0) ++
      le32(0) ++ le16(0) ++ le16(0) ++ le16(side) ++ le16(side))
    val strf = riffChunk("strf", le32(40) ++ le32(side) ++ le32(side) ++
      le16(1) ++ le16(24) ++ fcc("MJPG") ++ le32(side * side * 3) ++
      Array.fill(16)(0.toByte))
    val hdrl = riffList("hdrl", avih ++ riffList("strl", strh ++ strf))
    val movi = riffList("movi",
      frames.flatMap(f => riffChunk("00dc", f)).toArray)
    val body = fcc("AVI ") ++ hdrl ++ movi
    fcc("RIFF") ++ le32(body.length) ++ body
  }

  private def readLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 255) | ((b(off + 1) & 255) << 8) |
      ((b(off + 2) & 255) << 16) | ((b(off + 3) & 255) << 24)
  private def fccAt(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** REAL video demux: walk the RIFF/AVI chunk tree to the `movi` list
    * and return every video frame chunk's bytes (`##dc` compressed /
    * `##db` uncompressed ids, `rec ` sub-lists included) — None when the
    * payload is not a RIFF/AVI container (the caller falls back to the
    * byte stub). Bounds-checked throughout: a truncated or lying size
    * field ends the walk instead of throwing. */
  def aviFrameChunks(content: Array[Byte]): Option[Seq[Array[Byte]]] = {
    if (content == null || content.length < 12) return None
    if (fccAt(content, 0) != "RIFF" || fccAt(content, 8) != "AVI ")
      return None
    val out = Seq.newBuilder[Array[Byte]]
    // size fields are UNTRUSTED: validate against the remaining bytes
    // BEFORE any arithmetic that could overflow Int (a lying size near
    // 2^31 would wrap `off + 8 + size` negative, defeat the bounds
    // guard, and throw instead of ending the walk)
    def chunkEnd(off: Int, size: Int, until: Int): Int =
      if (size < 0 || size > until - off - 8) -1 else off + 8 + size
    // DEPTH-CAPPED recursion (real AVIs nest hdrl→strl and movi→rec —
    // a handful of levels): a crafted payload of ~100k nested LIST
    // headers would otherwise drive the walk into StackOverflowError, a
    // FATAL error no fallback catch can save — violating the no-throw
    // contract and failing the whole query on one malicious payload
    val MaxDepth = 16
    def walkFrames(from: Int, until: Int, depth: Int): Unit = {
      if (depth > MaxDepth) return
      var off = from
      while (off + 8 <= until) {
        val id = fccAt(content, off)
        val size = readLe32(content, off + 4)
        val dataEnd = chunkEnd(off, size, until)
        if (dataEnd < 0) return // truncated/lying size
        if (id == "LIST" && size >= 4 &&
            fccAt(content, off + 8) == "rec ")
          walkFrames(off + 12, dataEnd, depth + 1)
        else if (size > 0 && id.length == 4 &&
            (id.endsWith("dc") || id.endsWith("db")))
          out += java.util.Arrays.copyOfRange(content, off + 8, dataEnd)
        off = dataEnd + (size & 1) // RIFF chunks pad to even
      }
    }
    def findMovi(from: Int, until: Int, depth: Int): Unit = {
      if (depth > MaxDepth) return
      var off = from
      while (off + 8 <= until) {
        val id = fccAt(content, off)
        val size = readLe32(content, off + 4)
        val dataEnd = chunkEnd(off, size, until)
        if (dataEnd < 0) return
        if (id == "LIST" && size >= 4) {
          if (fccAt(content, off + 8) == "movi")
            walkFrames(off + 12, dataEnd, depth + 1)
          else findMovi(off + 12, dataEnd, depth + 1)
        }
        off = dataEnd + (size & 1)
      }
    }
    // the RIFF size is unsigned; clamp through Long so a huge declared
    // size cannot overflow the walk bound
    findMovi(12, math.min(content.length.toLong,
      8L + (readLe32(content, 4) & 0xFFFFFFFFL)).toInt, 0)
    val frames = out.result()
    if (frames.isEmpty) None else Some(frames)
  }

  /** Decoded per-frame 8×8 grids of an AVI payload — each frame chunk
    * through the SAME ImageIO decode the image lane uses. None when the
    * payload is not an AVI or no frame decodes. */
  def decodeAviGrids(content: Array[Byte]): Option[Seq[Array[Double]]] =
    aviFrameChunks(content)
      .map(_.flatMap(f => decodeToGrid(f, 8)))
      .filter(_.nonEmpty)

  /** The video lane's fixed-dim grid: uniform temporal sampling down to
    * `maxFrames` frames (the sampleFrames discipline on DECODED frames),
    * then the per-cell mean across sampled grids. */
  def decodeVideoGrid(content: Array[Byte],
      maxFrames: Int = 4): Option[Array[Double]] =
    aviFrameChunks(content).flatMap { chunks =>
      // uniform temporal sampling to AT MOST maxFrames, applied to the
      // frame CHUNKS before any decode (index i·len/n — the sampleFrames
      // discipline): the cap is the per-payload JPEG-decode budget, so a
      // long video decodes exactly maxFrames frames, never all of them
      val n = math.min(maxFrames, chunks.length)
      val grids = (0 until n)
        .map(i => chunks((i.toLong * chunks.length / n).toInt))
        .flatMap(f => decodeToGrid(f, 8))
      if (grids.isEmpty) None
      else Some(Array.tabulate(grids.head.length)(c =>
        grids.map(_(c)).sum / grids.length))
    }

  /** Decode-aware feature extraction: a payload that DECODES as an image
    * yields the unit-normalized 8×8 grayscale grid; one that decodes as
    * AUDIO yields the unit-normalized amplitude envelope; a RIFF/AVI
    * payload yields the frame-sampled mean grid over DECODED MJPEG
    * frames — all real samples through real JVM codecs; anything else
    * falls back to the deterministic stub (the undecodable-payload lane
    * a mixed corpus always has). Image is probed first: ImageIO,
    * AudioSystem, and the RIFF/AVI magic sniff disjoint headers, so the
    * order only breaks ties on garbage.
    */
  def decodedFeatures(content: Array[Byte], modality: String): Array[Float] =
    decodeToGrid(content, 8).orElse(decodeWavEnvelope(content))
      .orElse(decodeVideoGrid(content)) match {
      case Some(cells) =>
        var ss = 0.0; var j = 0
        while (j < cells.length) { ss += cells(j) * cells(j); j += 1 }
        val out = new Array[Float](FeatureDim)
        if (ss > 0) {
          val inv = 1.0 / math.sqrt(ss)
          j = 0
          while (j < cells.length) { out(j) = (cells(j) * inv).toFloat; j += 1 }
        }
        out
      case None => stubFeatures(content, modality)
    }

  /** Feature extraction with the production execution shape: per-partition
    * "codec" initialization (once), then fixed-size batches — the
    * mapPartitions analog of mapInPandas batch processing. Narrow map:
    * payloads never shuffle. `decodeAware = true` routes payloads through
    * the REAL ImageIO decode first (stub only as fallback).
    */
  def extractFeatures(media: DataFrame, decodeAware: Boolean = false): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      val partitionId = org.apache.spark.TaskContext.getPartitionId()
      // real pipeline: load codec/model here, once per partition
      rows.grouped(BatchSize).zipWithIndex.flatMap { case (batch, batchId) =>
        batch.map(r => MediaFeatures(r.media_id, r.modality,
          if (decodeAware) decodedFeatures(r.content, r.modality)
          else stubFeatures(r.content, r.modality), batchId, partitionId))
      }
    }.toDF()
  }

  /** STUB resize: metadata-correct resize of an image payload — scales the
    * byte budget to the target pixel count (real impl: decode → scale →
    * re-encode). Deterministic truncation/padding keeps tests exact.
    */
  def resizeStub(df: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val resize = udf((content: Array[Byte], w: Int, h: Int) =>
      if (content == null) null
      else {
        // clamp in LONG before the Int narrowing: a large upscale
        // overflows Int, wraps negative, and would truncate the payload
        // to one byte instead of padding it
        val targetLen = math.max(1L, math.min(Int.MaxValue.toLong,
          content.length.toLong * (targetW.toLong * targetH) /
            math.max(1L, w.toLong * h))).toInt
        if (targetLen <= content.length) content.take(targetLen)
        else content ++ Array.fill[Byte](targetLen - content.length)(0)
      })
    df.withColumn("content", resize(col("content"), col("meta.width"), col("meta.height")))
      .withColumn("meta", struct(
        lit(targetW).as("width"), lit(targetH).as("height"),
        col("meta.sampleRate").as("sampleRate"), col("meta.nFrames").as("nFrames")))
  }

  /** Frame sampling for video payloads: split the payload into nFrames
    * equal byte windows ("frames"), keep every stride-th — the
    * uniform-temporal-sampling shape. Output one row per sampled frame.
    */
  def sampleFrames(df: DataFrame, stride: Int): DataFrame = {
    // fail at the operator boundary, not as an opaque executor-side
    // Range exception (stride 0) or silent zero frames (negative)
    require(stride > 0, s"sampleFrames stride must be positive: $stride")
    val frames = udf((content: Array[Byte], nFrames: Int) =>
      if (content == null || nFrames <= 0) Array.empty[Array[Byte]]
      else {
        val frameLen = math.max(1, content.length / nFrames)
        (0 until nFrames by stride).map { f =>
          content.slice(f * frameLen, math.min((f + 1) * frameLen, content.length))
        }.filter(_.nonEmpty).toArray
      })
    df.filter(col("modality") === "video")
      .select(col("media_id"),
        posexplode(frames(col("content"), col("meta.nFrames"))).as(Seq("frame_idx", "frame")))
      .select(col("media_id"), (col("frame_idx") * stride).cast("int").as("frame_number"),
        col("frame"))
  }

  /** The synthetic table with REAL codec payloads on EVERY modality:
    * image rows carry an actual PNG (rendered deterministically from the
    * doc text by `renderPng`, decoded back by any PNG reader), audio rows
    * an actual RIFF/WAVE payload (`renderWav`), and video rows an actual
    * MJPEG-in-AVI container (`renderAvi` — three ImageIO-encoded JPEG
    * frames muxed into well-formed RIFF). The byte-level stub remains
    * only as the undecodable-payload fallback a mixed corpus always has.
    */
  def pngMedia(spark: SparkSession, dir: String): DataFrame = {
    val render = udf((content: Array[Byte], modality: String) =>
      modality match {
        case "image" => renderPng(content)
        case "audio" => renderWav(content)
        case "video" => renderAvi(content)
        case _ => content
      })
    syntheticMedia(spark, dir)
      .withColumn("content", render(col("content"), col("modality")))
  }

  /** The codec media as a STANDING parquet table (built once per data
    * version) — the production shape the class doc describes: payloads
    * live in the parquet as binary, queries read and decode them; the
    * synthetic render is corpus PREPARATION, not per-query work, so
    * serving rows must not pay it on every call. */
  /** The codec fixture generation tag. Every DERIVED fixture (features,
    * hashes) chains this tag into its own key, so a codec change that
    * rebuilds the media table can never hit a stale derived fixture.
    * A JPEG round-trip FINGERPRINT is folded in because the JPEG lanes
    * (encode in renderAvi, decode in decodeToGrid) are implementation-
    * defined at the bit level: a JVM upgrade — or a different vendor at
    * the SAME version string — must rebuild, or cached features could
    * diverge from per-serve extraction by low decode bits. The probe
    * runs on the DRIVER and as a FLEET SWEEP (2× default-parallelism
    * single-element tasks, best-effort spread across live executors,
    * cached per SparkContext): it VERIFIES the uniform-image assumption
    * instead of assuming it, catches the common driver≠executor image
    * split, and FAILS LOUDLY on a mixed fleet (two executors that
    * decode differently cannot share one cached fixture — serving one
    * executor's bits as the other's extraction is the silent divergence
    * the tag exists to prevent). Executors joining AFTER the sweep
    * (dynamic allocation) stay out of scope, as for Spark's own
    * uniform-image deployment expectation. */
  private def jpegFingerprint(): String = {
    val probe = renderAvi(Array.tabulate(256)(_.toByte), nFrames = 1)
    val cells = decodeVideoGrid(probe).getOrElse(Array.empty[Double])
    java.security.MessageDigest.getInstance("MD5")
      .digest(cells.mkString(",")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(12)
  }

  // keyed by SparkContext, not JVM: a long-lived driver that rebuilds
  // its session against a DIFFERENT executor image must re-probe, or
  // the cached tag's executor half goes silently stale
  @volatile private var codecTagCache: (org.apache.spark.SparkContext, String) = null
  private def codecTag(spark: SparkSession): String = {
    val ctx = spark.sparkContext
    val cached = codecTagCache
    if (cached != null && (cached._1 eq ctx)) cached._2
    else {
      val driverFp = jpegFingerprint()
      val sweep = math.max(2, ctx.defaultParallelism * 2)
      val execFps = ctx.parallelize(1 to sweep, sweep)
        .map(_ => jpegFingerprint()).distinct().collect().sorted
      require(execFps.length == 1,
        s"mixed executor fleet: ${execFps.length} distinct JPEG codec " +
          s"fingerprints (${execFps.mkString(", ")}) — cached media " +
          "fixtures cannot serve a fleet whose nodes decode differently; " +
          "align the executor images before building media fixtures")
      val tag = s"media:codec:png+wav+avi:v2:jpeg=$driverFp-${execFps.head}"
      codecTagCache = (ctx, tag)
      tag
    }
  }

  def pngMediaCached(spark: SparkSession, dir: String): DataFrame = {
    val path = graft.Tables.scratchPath("graft_media_codec", dir)
    ResultCache.buildIfAbsent(spark,
      graft.Tables.documents(spark, dir), codecTag(spark), path) {
      pngMedia(spark, dir).write.mode("overwrite").parquet(path)
    }
    spark.read.parquet(path)
  }

  /** Decode-aware features of the codec media as a STANDING fixture —
    * the pngMediaCached discipline one stage further: extraction is a
    * pure function of the media table, so decoding the whole corpus is
    * corpus PREPARATION (once per data version), never per-query work.
    * Serving rows union the bounded planted rows' features (extracted
    * per serve, still through the real decode path) on top. */
  def mediaFeaturesCached(spark: SparkSession, dir: String): DataFrame = {
    val path = graft.Tables.scratchPath("graft_media_feats", dir)
    ResultCache.buildIfAbsent(spark,
      graft.Tables.documents(spark, dir), s"media:feats:decode:v1:${codecTag(spark)}",
      path) {
      extractFeatures(pngMediaCached(spark, dir), decodeAware = true)
        .write.mode("overwrite").parquet(path)
    }
    spark.read.parquet(path)
  }

  /** Decode-aware perceptual hashes of the codec media as a STANDING
    * fixture (same rationale as [[mediaFeaturesCached]]). */
  def mediaPhashCached(spark: SparkSession, dir: String): DataFrame = {
    val path = graft.Tables.scratchPath("graft_media_phash", dir)
    ResultCache.buildIfAbsent(spark,
      graft.Tables.documents(spark, dir), s"media:phash:decode:v1:${codecTag(spark)}",
      path) {
      val hashUdf = udf((c: Array[Byte]) => pHashDecoded(c))
      pngMediaCached(spark, dir)
        .select(col("media_id"), hashUdf(col("content")).as("ph"))
        .write.mode("overwrite").parquet(path)
    }
    spark.read.parquet(path)
  }

  // ---- driver queries ----

  /** Payload stats per modality — byte-level, so the oracle reconstructs
    * the synthetic payload with encode() and must agree exactly. The mean
    * width is emitted in exact integer 1e-4 units (floor(sum*10000/count))
    * rather than round(avg,4): Spark and DuckDB disagree in the last ulp
    * of float averaging, integer division cannot.
    */
  def multimodalStats(spark: SparkSession, dir: String): DataFrame =
    syntheticMedia(spark, dir)
      .groupBy("modality")
      .agg(count(lit(1)).as("n_media"),
        sum(length(col("content"))).as("total_bytes"),
        min(length(col("content"))).cast("long").as("min_bytes"),
        max(length(col("content"))).cast("long").as("max_bytes"),
        expr("(sum(meta.width) * 10000) div count(1)").as("avg_width_e4"))
      .orderBy("modality")

  private val multimodalStatsSql =
    """SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
      |       count(*) AS n_media,
      |       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
      |       min(octet_length(encode(text))) AS min_bytes,
      |       max(octet_length(encode(text))) AS max_bytes,
      |       CAST(sum(64 + n_chars % 448) * 10000 // count(*) AS BIGINT) AS avg_width_e4
      |FROM documents WHERE length(text) > 0
      |GROUP BY 1 ORDER BY modality""".stripMargin

  /** Feature extraction + similarity search over media features: the
    * multimodal retrieval path (extract → cosine vs a query media's
    * features → top-10), oracle-checked via the self-query construction.
    * Extracted features are engine-specific (not SQL-expressible), so nine
    * exact copies of media 0 (same payload + modality ⇒ bit-identical
    * features through the batched extractor — for media 0, an actual PNG
    * through the actual ImageIO decoder) are planted at ids
    * 100000..100008: the true top-10 is exactly {0, planted} — media 0's
    * text is md5-unique in the testdata, and distinct payloads score
    * strictly below the float-identical self-score tie (a raw tie at 1.0
    * would need every one of the 256 rounded byte-window pixel averages
    * to coincide). Ordering uses the RAW score (id tiebreak inside the
    * exact-tie group); the emitted score is rounded, where the planted
    * green sibling already proves identical payloads round to exactly
    * 1.0.
    */
  /** The shared self-query serve both retrieval rows ride: nine exact
    * copies of the query medium planted, corpus features from the
    * standing fixture, planted rows extracted per serve through the SAME
    * real decode lane (identical bytes ⇒ identical decoded samples ⇒
    * cosine exactly 1.0) — one definition so the two driver rows cannot
    * drift. ALL modalities decode for real here: images through ImageIO,
    * audio through AudioSystem, video through the RIFF/MJPEG demux. */
  private def mediaSelfKnn(spark: SparkSession, dir: String,
      queryId: Long): DataFrame = {
    val media = pngMediaCached(spark, dir)
    val planted = spark.range(100000L, 100009L).toDF("new_id")
      .crossJoin(broadcast(media.filter(col("media_id") === queryId)))
      .select(col("new_id").as("media_id"), col("modality"), col("content"),
        col("meta"))
    val feats = mediaFeaturesCached(spark, dir)
      .select("media_id", "modality", "features")
      .unionByName(extractFeatures(planted, decodeAware = true)
        .select("media_id", "modality", "features"))
    val q = feats.filter(col("media_id") === queryId)
      .select(col("features").as("query_features"))
    feats.crossJoin(broadcast(q))
      .withColumn("raw_score",
        VectorFunctions.cosineUnit(col("features"), col("query_features")))
      .orderBy(col("raw_score").desc, col("media_id").asc)
      .limit(10)
      .select(col("media_id"), col("modality"),
        round(col("raw_score"), 6).as("score"))
  }

  def multimodalKnn(spark: SparkSession, dir: String): DataFrame =
    mediaSelfKnn(spark, dir, queryId = 0L) // media 0: a real PNG

  // All 10 rows are media 0 or exact copies of it, so every modality is
  // media 0's: doc_id 0 % 3 = 0 → 'image'.
  private val multimodalKnnSql =
    """SELECT media_id, 'image' AS modality, 1.0::DOUBLE AS score
      |FROM (
      |  SELECT doc_id AS media_id FROM documents WHERE doc_id = 0
      |  UNION ALL
      |  SELECT doc_id + 100000 FROM documents WHERE doc_id < 9) t
      |ORDER BY media_id""".stripMargin

  /** The VIDEO lane's retrieval row — multimodalKnn's construction with a
    * video query: media 2 (doc 2 % 3 = 2 → video) is a real MJPEG-in-AVI
    * payload; nine exact copies are planted, so the top-10 is exactly
    * {2, 100000..100008} with every tie's features computed from DECODED
    * JPEG frames through the RIFF demux (identical bytes ⇒ identical
    * decoded frames ⇒ cosine exactly 1.0). Doc 2 has no token-sequence
    * twin at any sf (the maxsim batch oracle's verified fact), so no
    * other video renders the same AVI. */
  def multimodalVideoKnn(spark: SparkSession, dir: String): DataFrame =
    mediaSelfKnn(spark, dir, queryId = 2L) // media 2: a real MJPEG AVI

  private val multimodalVideoKnnSql =
    """SELECT media_id, 'video' AS modality, 1.0::DOUBLE AS score
      |FROM (
      |  SELECT doc_id AS media_id FROM documents WHERE doc_id = 2
      |  UNION ALL
      |  SELECT doc_id + 100000 FROM documents WHERE doc_id < 9) t
      |ORDER BY media_id""".stripMargin

  /** Structural oracle for the multimodal retrieval path: plant an exact
    * copy (media_id + 100000) of every media row with media_id < 30; the
    * feature extractor is a pure function of (payload bytes, modality), so
    * each planted pair must score cosine exactly 1.0 under the batched
    * extraction pipeline. A nondeterministic extractor, batching artifact,
    * or scoring regression drops rows against the enumerating oracle.
    */
  def multimodalPlantedPairs(spark: SparkSession, dir: String): DataFrame = {
    val base = syntheticMedia(spark, dir).filter(col("media_id") < 200)
    val planted = base.filter(col("media_id") < 30)
      .select((col("media_id") + 100000).as("media_id"),
        col("modality"), col("content"), col("meta"))
    val feats = extractFeatures(base.union(planted))
      .select("media_id", "modality", "features")
    feats.as("x").join(feats.as("y"),
        col("x.modality") === col("y.modality") &&
        col("x.media_id") === col("y.media_id") - 100000)
      .withColumn("cosine", round(
        VectorFunctions.cosineUnit(col("x.features"), col("y.features")), 6))
      .filter(col("cosine") === 1.0)
      .select(col("x.media_id").as("media_a"), col("y.media_id").as("media_b"),
        col("x.modality").as("modality"), col("cosine"))
      .orderBy("media_a")
  }

  private val multimodalPlantedPairsSql =
    """SELECT doc_id AS media_a, doc_id + 100000 AS media_b,
      |       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
      |       1.0::DOUBLE AS cosine
      |FROM documents WHERE doc_id < 30 AND length(text) > 0
      |ORDER BY media_a""".stripMargin

  // ---- perceptual-hash near-dup (aHash + banded hamming join) ----

  /** Average hash (aHash — the classic perceptual image hash): decode to
    * an 8×8 grid, bit = cell above the grid mean, 64 bits total. The
    * grid here comes from the byte-window stub (64 equal byte windows,
    * window average = "pixel") — the fallback lane for payloads that are
    * not decodable images; `pHashDecoded` runs the SAME aHash stage over
    * an actual ImageIO decode when the payload is a real image. Identical
    * payloads hash identically, small edits perturb few cells.
    */
  def pHash(content: Array[Byte]): Long = {
    if (content == null || content.isEmpty) return 0L
    val n = content.length
    val cells = new Array[Double](64)
    var j = 0
    while (j < 64) {
      val from = (j.toLong * n / 64).toInt
      val until = ((j + 1).toLong * n / 64).toInt
      if (until > from) {
        var s = 0.0
        var i = from
        while (i < until) { s += java.lang.Byte.toUnsignedInt(content(i)); i += 1 }
        cells(j) = s / (until - from)
      }
      j += 1
    }
    aHashBits(cells)
  }

  /** The aHash threshold stage, shared by both grid sources. */
  private def aHashBits(cells: Array[Double]): Long = {
    val mean = cells.sum / cells.length
    var bits = 0L
    var j = 0
    while (j < cells.length) {
      if (cells(j) > mean) bits |= (1L << j)
      j += 1
    }
    bits
  }

  /** Decode-aware aHash: a payload that DECODES (real PNG/BMP bytes
    * through javax.imageio) is hashed over its decoded 8×8 pixel grid —
    * the textbook aHash on real pixels; anything else falls back to the
    * byte-window stub grid.
    */
  def pHashDecoded(content: Array[Byte]): Long =
    decodeToGrid(content, 8).orElse(decodeWavEnvelope(content))
      .orElse(decodeVideoGrid(content)) match {
      // images: aHash over decoded pixels; audio: the same above-mean
      // bit discipline over the decoded 64-bin amplitude envelope (an
      // acoustic fingerprint); video: over the frame-sampled mean grid
      // of decoded MJPEG frames; undecodable payloads: the byte stub
      case Some(cells) => aHashBits(cells)
      case None => pHash(content)
    }

  /** Perceptual near-dup pairs via the SimHash discipline: 64-bit hash →
    * 8 × 8-bit chunks; by pigeonhole any pair within hamming distance 7
    * shares at least one chunk, so candidates come from an equi-join on
    * (chunk index, chunk value) — never all-pairs — and exact
    * `bit_count(a ^ b)` refines. Payloads never shuffle; 8 (id, byte)
    * rows per media cross the exchange.
    *
    * Driver row: exact copies planted at media_id + 900000 for ids < 30
    * (hamming 0 ⇒ must be found through the banded join); the output is
    * restricted to the planted pairs so the DuckDB oracle can enumerate
    * it. Organic near-dup pairs are the production output; the spec
    * exercises them on perturbed payloads.
    */
  def phashPlantedPairs(spark: SparkSession, dir: String): DataFrame = {
    // real PNG/WAV payloads on the image/audio rows + decode-aware
    // hashing: the planted copies round-trip identical bytes through
    // the actual JDK codecs (hamming 0 over decoded pixels / envelope
    // bins); video rows band through the stub-fallback lane in the
    // same join
    val media = pngMediaCached(spark, dir)
    val planted = media.filter(col("media_id") < 30)
      .select((col("media_id") + 900000L).as("media_id"),
        col("modality"), col("content"), col("meta"))
    // corpus hashes from the standing fixture; the 30 planted copies
    // hash per serve through the same decode-aware path
    val hashUdf = udf((c: Array[Byte]) => pHashDecoded(c))
    val hashed = mediaPhashCached(spark, dir).unionByName(
      planted.select(col("media_id"), hashUdf(col("content")).as("ph")))
    phashNearDupesHashed(hashed, maxHamming = 7)
      .filter(col("media_b") === col("media_a") + 900000L)
      .orderBy("media_a")
  }

  /** The reusable operator: hash, band, join, refine. */
  def phashNearDupes(media: DataFrame, maxHamming: Int,
      decodeAware: Boolean = false): DataFrame = {
    val hashUdf =
      if (decodeAware) udf((c: Array[Byte]) => pHashDecoded(c))
      else udf((c: Array[Byte]) => pHash(c))
    phashNearDupesHashed(
      media.select(col("media_id"), hashUdf(col("content")).as("ph")),
      maxHamming)
  }

  /** The band-join core over a pre-hashed (media_id, ph) frame — shared
    * by the per-call hash path and the standing-fixture serve. */
  def phashNearDupesHashed(hashed: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming <= 7, "8x8-bit banding only pigeonholes hamming <= 7")
    val chunks = hashed.select(col("media_id"), col("ph"),
      posexplode(expr(
        "transform(sequence(0, 7), c -> (ph >> (c * 8)) & 255)"))
        .as(Seq("chunk_idx", "chunk")))
    chunks.as("a").join(chunks.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") &&
          col("a.chunk") === col("b.chunk") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("media_a"), col("b.media_id").as("media_b"),
        expr("CAST(bit_count(a.ph ^ b.ph) AS BIGINT)").as("hamming"))
      // filter BEFORE distinct: most chunk collisions on organic data sit
      // at hamming 8..64 and would otherwise ride the dedup exchange
      .filter(col("hamming") <= maxHamming)
      .distinct() // a surviving pair can share several chunks
  }

  private val phashPlantedPairsSql =
    """SELECT doc_id AS media_a, doc_id + 900000 AS media_b,
      |       CAST(0 AS BIGINT) AS hamming
      |FROM documents WHERE doc_id < 30 AND length(text) > 0
      |ORDER BY media_a""".stripMargin

  // ---- TEMPORAL video near-dup (per-frame aHash + banded join) -------

  /** Trimmed remux: demux the AVI, drop the first `dropFrames` frames,
    * re-mux the rest BYTE-IDENTICAL — the provenance shape of a trimmed
    * re-containered copy. None when the payload is not an AVI or nothing
    * would survive the trim. */
  def remuxAviDropFirst(content: Array[Byte],
      dropFrames: Int = 1, side: Int = 16): Option[Array[Byte]] =
    aviFrameChunks(content).filter(_.length > dropFrames)
      .map(ch => muxAvi(ch.drop(dropFrames), side))

  /** Per-frame aHash of an AVI payload: every demuxed frame decodes
    * through the SAME ImageIO lane the image hash uses and hashes with
    * the shared aHash stage (byte-stub fallback per frame). Non-AVI
    * payloads yield no rows — the temporal lane is video-only. */
  def videoFrameHashes(content: Array[Byte]): Seq[Long] =
    aviFrameChunks(content)
      .map(_.map(f => decodeToGrid(f, 8).map(aHashBits).getOrElse(pHash(f))))
      .getOrElse(Seq.empty)

  /** Per-frame hashes of the codec media's VIDEO rows as a STANDING
    * fixture (the mediaPhashCached discipline on the temporal lane);
    * chains the codec tag so a codec change rebuilds. Schema:
    * (media_id, frame_idx, fh). */
  def mediaFrameHashCached(spark: SparkSession, dir: String): DataFrame = {
    val path = graft.Tables.scratchPath("graft_media_framehash", dir)
    ResultCache.buildIfAbsent(spark,
      graft.Tables.documents(spark, dir),
      s"media:framehash:decode:v1:${codecTag(spark)}", path) {
      val fhUdf = udf((c: Array[Byte]) => videoFrameHashes(c))
      pngMediaCached(spark, dir).filter(col("modality") === "video")
        .select(col("media_id"),
          posexplode(fhUdf(col("content"))).as(Seq("frame_idx", "fh")))
        .write.mode("overwrite").parquet(path)
    }
    spark.read.parquet(path)
  }

  /** TEMPORAL near-dup pairs over per-frame hashes: two videos pair when
    * ANY frame pair lands within the hamming bound — so a trimmed or
    * re-containered copy (surviving frames byte-identical) pairs at
    * hamming 0 even though its WHOLE-video mean-grid hash moved with the
    * frame set. Candidates come from the same 8×8-bit-chunk pigeonhole
    * equi-join as the image lane, at FRAME granularity; the per-video
    * reduction is a min over matched frame pairs. 100 TB: payloads never
    * shuffle — nFrames (id, frame, hash) rows per video band through the
    * exchange, 8 chunk rows each, and the pigeonhole bounds candidates
    * to chunk-equal frame pairs exactly as in the image lane. */
  def videoNearDupesHashed(frameHashes: DataFrame,
      maxHamming: Int): DataFrame =
    // the ONE band-join core (phashNearDupesHashed) at FRAME granularity
    // — a frame hash is just a hash row, and media_id repeats per frame,
    // so the same chunk join yields frame-pair candidates; the temporal
    // lane only adds the per-video-pair min reduction on top (a band-join
    // fix must never have to land in two places)
    phashNearDupesHashed(
        frameHashes.select(col("media_id"), col("fh").as("ph")), maxHamming)
      .groupBy("media_a", "media_b")
      .agg(min(col("hamming")).as("min_hamming"))

  /** Driver row: a TRIMMED copy (first frame dropped, survivors
    * byte-identical through the remux) of every video with media_id < 30
    * is planted at media_id + 900000; the per-frame banded join must
    * pair each original with its trimmed copy at min hamming 0 — found
    * through frames that decode identically, which the whole-video hash
    * lane provably cannot guarantee (the mean grid moves with the frame
    * set). Corpus frame hashes come from the standing fixture; the ~10
    * planted copies remux + hash per serve through the same lanes. */
  def videoPhashNearDupes(spark: SparkSession, dir: String): DataFrame = {
    val remuxUdf = udf((c: Array[Byte]) => remuxAviDropFirst(c).orNull)
    val fhUdf = udf((c: Array[Byte]) => videoFrameHashes(c))
    val planted = pngMediaCached(spark, dir)
      .filter(col("modality") === "video" && col("media_id") < 30)
      .select((col("media_id") + 900000L).as("media_id"),
        remuxUdf(col("content")).as("content"))
      .select(col("media_id"),
        posexplode(fhUdf(col("content"))).as(Seq("frame_idx", "fh")))
    val hashes = mediaFrameHashCached(spark, dir).unionByName(planted)
    videoNearDupesHashed(hashes, maxHamming = 7)
      .filter(col("media_b") === col("media_a") + 900000L)
      .orderBy("media_a")
  }

  private val videoPhashNearDupesSql =
    """SELECT doc_id AS media_a, doc_id + 900000 AS media_b,
      |       CAST(0 AS BIGINT) AS min_hamming
      |FROM documents WHERE doc_id % 3 = 2 AND doc_id < 30
      |  AND length(text) > 0
      |ORDER BY media_a""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_stats" -> multimodalStats,
    "multimodal_knn" -> multimodalKnn,
    "multimodal_video_knn" -> multimodalVideoKnn,
    "multimodal_planted_pairs" -> multimodalPlantedPairs,
    "phash_planted_pairs" -> phashPlantedPairs,
    "video_phash_near_dupes" -> videoPhashNearDupes)

  def oracles: Map[String, String] = Map(
    "multimodal_stats" -> multimodalStatsSql,
    "multimodal_knn" -> multimodalKnnSql,
    "multimodal_video_knn" -> multimodalVideoKnnSql,
    "multimodal_planted_pairs" -> multimodalPlantedPairsSql,
    "phash_planted_pairs" -> phashPlantedPairsSql,
    "video_phash_near_dupes" -> videoPhashNearDupesSql)
}
