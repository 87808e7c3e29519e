package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.syntheticMedia(spark, sf)

  test("synthetic media schema: binary payload + typed metadata struct") {
    val schema = media.schema
    assert(schema("content").dataType.typeName === "binary")
    val meta = schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq === Seq("width", "height", "sampleRate", "nFrames"))
    assert(media.select("modality").distinct().as[String].collect().toSet ===
      Set("image", "audio", "video"))
  }

  test("feature extraction: deterministic, unit-norm, fixed dim, batched shape") {
    val f1 = Multimodal.extractFeatures(media).collect()
    val f2 = Multimodal.extractFeatures(media).collect()
    assert(f1.map(_.getSeq[Float](2).toList).toList ===
      f2.map(_.getSeq[Float](2).toList).toList, "features must be deterministic")
    f1.foreach { r =>
      val v = r.getSeq[Float](2)
      assert(v.length === Multimodal.FeatureDim)
      val norm = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(norm - 1.0) < 1e-4, s"unit norm, got $norm")
      assert(r.getAs[Int]("batch_id") >= 0)
      assert(r.getAs[Int]("partition_id") >= 0)
    }
    // batch ids restart per partition and cap at ceil(rows/batch)
    val perPartition = f1.groupBy(_.getAs[Int]("partition_id"))
    perPartition.foreach { case (_, rows) =>
      val maxBatch = rows.map(_.getAs[Int]("batch_id")).max
      assert(maxBatch <= rows.size / Multimodal.BatchSize + 1)
    }
  }

  test("modality shifts features: same payload, different modality → different vector") {
    val bytes = "identical payload".getBytes("UTF-8")
    val a = Multimodal.stubFeatures(bytes, "image")
    val b = Multimodal.stubFeatures(bytes, "audio")
    assert(!a.sameElements(b))
  }

  test("resize: metadata updated, byte budget scales with pixel count") {
    val resized = Multimodal.resizeStub(media.filter($"modality" === "image"), 32, 32)
    val r = resized.select("meta.width", "meta.height").head()
    assert((r.getInt(0), r.getInt(1)) === (32, 32))
    val src = media.filter($"modality" === "image")
      .select(col("media_id"), length(col("content")).as("len"),
        col("meta.width").as("w"), col("meta.height").as("h"))
    val out = resized.select(col("media_id"), length(col("content")).as("len2"))
    val joined = src.join(out, "media_id").collect()
    joined.foreach { row =>
      val expected = math.max(1L,
        row.getAs[Int]("len").toLong * (32L * 32) /
          (row.getAs[Int]("w").toLong * row.getAs[Int]("h")))
      assert(row.getAs[Int]("len2").toLong === expected)
    }
  }

  test("frame sampling: every stride-th frame, counts match metadata") {
    val sampled = Multimodal.sampleFrames(media, stride = 3)
    val counts = sampled.groupBy("media_id").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = media.filter($"modality" === "video")
      .select(col("media_id"), col("meta.nFrames")).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1) + 2) / 3).toLong).toMap
    counts.foreach { case (id, n) =>
      assert(n <= expected(id), s"media $id: sampled $n > expected max ${expected(id)}")
      assert(n >= 1)
    }
    val fn = sampled.select("frame_number").as[Int].collect()
    assert(fn.forall(_ % 3 === 0), "only stride-aligned frames")
  }

  test("multimodal knn: self-query top-10 is media 0 then the planted copies, all at 1.0") {
    val out = SparkEntry.queries("multimodal_knn")(spark, sf).collect()
    assert(out.head.getAs[Long]("media_id") === 0L)
    assert(out.map(_.getAs[Long]("media_id")).sorted.toSeq === (0L +: (100000L to 100008L)))
    assert(out.forall(_.getAs[Double]("score") === 1.0))
    assert(out.forall(_.getAs[String]("modality") === "image"))
  }

  test("real PNG codec: render → ImageIO decode round-trips pixels deterministically") {
    val src = "the quick brown fox jumps over the lazy dog " * 20
    val png = Multimodal.renderPng(src.getBytes("UTF-8"))
    // actual PNG bytes: magic header, decodable by the stock JVM reader
    assert(png.take(4).toSeq === Seq(0x89.toByte, 0x50.toByte, 0x4e.toByte, 0x47.toByte))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img != null && img.getWidth === 16 && img.getHeight === 16)
    // decode is deterministic and render is a pure function of the bytes
    val g1 = Multimodal.decodeToGrid(png).get
    val g2 = Multimodal.decodeToGrid(Multimodal.renderPng(src.getBytes("UTF-8"))).get
    assert(g1.toSeq === g2.toSeq)
    assert(g1.length === 64)
    // non-image bytes do not decode — the stub fallback lane
    assert(Multimodal.decodeToGrid("not an image".getBytes("UTF-8")).isEmpty)
  }

  test("decoded aHash: real pixels drive the hash — identical images tie, inverted images differ") {
    // hand-built images through the real encoder (independent of renderPng)
    def gradientPng(invert: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(32, 32,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until 32; x <- 0 until 32) {
        val v = (x * 8) % 256
        img.getRaster.setSample(x, y, 0, if (invert) 255 - v else v)
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val a = Multimodal.pHashDecoded(gradientPng(invert = false))
    val b = Multimodal.pHashDecoded(gradientPng(invert = false))
    val inv = Multimodal.pHashDecoded(gradientPng(invert = true))
    assert(a === b, "identical images must hash identically")
    assert(java.lang.Long.bitCount(a ^ inv) > 32,
      "an inverted image must flip most aHash bits")
    // decoded and stub lanes genuinely differ on the same PNG bytes —
    // proof the decoded path is not the byte-window stub renamed
    assert(Multimodal.pHashDecoded(gradientPng(false)) !==
      Multimodal.pHash(gradientPng(false)))
  }

  test("wav codec: render → decode round-trips deterministically; non-audio bytes do not decode") {
    val src = ("Some synthetic source content for the audio lane " * 10)
      .getBytes("UTF-8")
    val wav = Multimodal.renderWav(src)
    assert(wav.take(4).toSeq === "RIFF".getBytes("US-ASCII").toSeq &&
      wav.slice(8, 12).toSeq === "WAVE".getBytes("US-ASCII").toSeq,
      "renderWav must produce an actual RIFF/WAVE container")
    val env1 = Multimodal.decodeWavEnvelope(wav)
    val env2 = Multimodal.decodeWavEnvelope(Multimodal.renderWav(src.clone()))
    assert(env1.isDefined, "a rendered WAV must decode")
    assert(env1.get.toSeq === env2.get.toSeq,
      "identical source bytes must round-trip to identical envelopes")
    assert(env1.get.length === Multimodal.FeatureDim)
    // a DIFFERENT source renders a different envelope (the codec is not
    // a constant function)
    val other = Multimodal.decodeWavEnvelope(
      Multimodal.renderWav("entirely different payload text".getBytes("UTF-8")))
    assert(other.get.toSeq !== env1.get.toSeq)
    // non-audio bytes fall through to None — the stub-fallback lane
    assert(Multimodal.decodeWavEnvelope("not audio".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeWavEnvelope(Array.empty[Byte]).isEmpty)
  }

  test("wav decode: a hand-built stereo 16-bit WAV decodes through real sample parsing") {
    // independent of renderWav: two channels, big-amplitude L, silent R —
    // the mono mixdown must land at half the left amplitude
    val n = 128
    val pcm = new Array[Byte](n * 4)
    (0 until n).foreach { i =>
      val v = 16000
      pcm(4 * i) = (v & 0xff).toByte; pcm(4 * i + 1) = ((v >> 8) & 0xff).toByte
      pcm(4 * i + 2) = 0; pcm(4 * i + 3) = 0
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    val env = Multimodal.decodeWavEnvelope(baos.toByteArray)
    assert(env.isDefined)
    env.get.foreach(v => assert(math.abs(v - 8000.0) < 1e-9,
      s"stereo mixdown of (16000, 0) must average to 8000, got $v"))
  }

  test("wav decode: non-linear-PCM audio (u-law) is refused, not decoded as garbage") {
    // a u-law WAV parses in AudioSystem (sampleSizeInBits=8) but its
    // bytes are companded, not linear PCM — decoding them linearly maps
    // silence to near-max amplitude; the envelope must decline instead
    val n = 64
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.ULAW,
      8000f, 8, 1, 1, 8000f, false)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(Array.fill[Byte](n)(0x7f)),
        fmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    assert(Multimodal.decodeWavEnvelope(baos.toByteArray).isEmpty,
      "u-law payloads must take the stub lane, not linear-parse")
  }

  test("decoded audio fingerprint: identical WAVs tie; the decoded lane is not the byte stub") {
    val src = ("acoustic fingerprint source material " * 15).getBytes("UTF-8")
    val wav = Multimodal.renderWav(src)
    assert(Multimodal.pHashDecoded(wav) === Multimodal.pHashDecoded(wav.clone()))
    assert(Multimodal.pHashDecoded(wav) !== Multimodal.pHash(wav),
      "the envelope aHash must differ from the byte-window stub on the " +
        "same WAV bytes")
  }

  test("pngMedia: audio rows carry real WAV payloads that decode") {
    val am = Multimodal.pngMedia(spark, sf)
      .filter(col("modality") === "audio").limit(5)
    am.select("content").as[Array[Byte]].collect().foreach { bytes =>
      assert(bytes.take(4).toSeq === "RIFF".getBytes("US-ASCII").toSeq,
        "audio payload must be an actual WAV")
      assert(Multimodal.decodeWavEnvelope(bytes).isDefined)
    }
  }

  test("pngMedia: image rows carry real PNG payloads; decode-aware features are decoded pixels") {
    val pm = Multimodal.pngMedia(spark, sf).filter(col("modality") === "image").limit(5)
    pm.select("content").as[Array[Byte]].collect().foreach { bytes =>
      assert(bytes.take(4).toSeq ===
        Seq(0x89.toByte, 0x50.toByte, 0x4e.toByte, 0x47.toByte),
        "image payload must be an actual PNG")
    }
    val feats = Multimodal.extractFeatures(pm, decodeAware = true)
      .select("features").as[Array[Float]].collect()
    feats.foreach { v =>
      // decoded grids are luma averages: non-negative — the stub's signed
      // histogram lane cannot produce these vectors
      assert(v.forall(_ >= 0f), "decoded features must be non-negative pixels")
      assert(math.abs(math.sqrt(v.map(x => x.toDouble * x).sum) - 1.0) < 1e-4)
    }
  }

  test("phash: identical payloads hash identically; edits perturb few bits") {
    val bytes = ("The quick brown fox jumps over the lazy dog. " * 30).getBytes("UTF-8")
    val h1 = Multimodal.pHash(bytes)
    assert(h1 === Multimodal.pHash(bytes.clone()))
    // perturb one byte window's worth at the tail: a local edit
    val edited = bytes.clone()
    (bytes.length - 10 until bytes.length).foreach(i => edited(i) = 'z'.toByte)
    val dist = java.lang.Long.bitCount(h1 ^ Multimodal.pHash(edited))
    assert(dist < 16, s"local edit flipped $dist/64 bits")
    assert(Multimodal.pHash(Array.empty[Byte]) === 0L)
  }

  test("phash near-dupes: banded join finds perturbed payloads within the bound") {
    import spark.implicits._
    val base = ("A reasonably long synthetic payload for hashing " * 20).getBytes("UTF-8")
    val perturbed = base.clone()
    (base.length - 8 until base.length).foreach(i => perturbed(i) = '!'.toByte)
    val actual = java.lang.Long.bitCount(
      Multimodal.pHash(base) ^ Multimodal.pHash(perturbed))
    assume(actual <= 7, s"perturbation landed at hamming $actual; test needs <= 7")
    val media = Seq((1L, base), (2L, perturbed),
      (3L, ("entirely different content " * 40).getBytes("UTF-8")))
      .toDF("media_id", "content")
    val pairs = Multimodal.phashNearDupes(media, maxHamming = 7).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.exists { case (a, b, h) => a == 1L && b == 2L && h == actual.toLong })
  }

  test("phash pigeonhole: hamming <= 7 always shares an 8-bit chunk") {
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val h1 = rnd.nextLong()
      // flip <= 7 random bits
      val flips = rnd.nextInt(8)
      val h2 = (1 to flips).foldLeft(h1)((h, _) => h ^ (1L << rnd.nextInt(64)))
      val shares = (0 until 8).exists(c => ((h1 >>> (c * 8)) & 0xff) === ((h2 >>> (c * 8)) & 0xff))
      assert(shares, f"no shared chunk for $h1%x vs $h2%x")
    }
  }

  test("extraction plan is a narrow map (no shuffle upstream of features)") {
    val plan = Multimodal.extractFeatures(media).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"feature extraction must not shuffle:\n$plan")
  }

  test("avi codec: render → RIFF demux → JPEG decode round-trips real frames deterministically") {
    val src = Array.tabulate(1000)(i => (i * 37 % 251).toByte)
    val avi = Multimodal.renderAvi(src, nFrames = 3)
    // a well-formed RIFF/AVI container, not a bespoke blob
    assert(new String(avi, 0, 4, "US-ASCII") === "RIFF")
    assert(new String(avi, 8, 4, "US-ASCII") === "AVI ")
    val chunks = Multimodal.aviFrameChunks(avi)
    assert(chunks.isDefined && chunks.get.length === 3,
      "the demux must find exactly the three muxed 00dc frames")
    // every frame chunk is a REAL JPEG that ImageIO decodes
    chunks.get.foreach { f =>
      assert(f.length > 2 && (f(0) & 0xff) === 0xff && (f(1) & 0xff) === 0xd8,
        "each frame chunk must start with the JPEG SOI marker")
      assert(Multimodal.decodeToGrid(f, 8).isDefined,
        "each 00dc chunk must be an ImageIO-decodable JPEG frame")
    }
    val grids = Multimodal.decodeAviGrids(avi)
    assert(grids.isDefined && grids.get.length === 3)
    // frames are position-dependent renders: not all identical
    assert(grids.get.map(_.toSeq).distinct.length > 1,
      "distinct byte windows must render distinct frames")
    // deterministic: re-render + re-decode is bit-equal
    val again = Multimodal.decodeAviGrids(Multimodal.renderAvi(src, 3))
    assert(grids.get.map(_.toSeq) === again.get.map(_.toSeq))
    // disjoint magic: image/audio payloads never take the video lane,
    // and AVI payloads never take theirs
    assert(Multimodal.aviFrameChunks(Multimodal.renderPng(src)).isEmpty)
    assert(Multimodal.aviFrameChunks(Multimodal.renderWav(src)).isEmpty)
    assert(Multimodal.decodeToGrid(avi, 8).isEmpty)
    assert(Multimodal.decodeWavEnvelope(avi).isEmpty)
    // truncated container: the bounds-checked walk degrades to None
    assert(Multimodal.aviFrameChunks(avi.take(40)).isEmpty)
  }

  test("video features route through decoded frames, not the byte stub") {
    val src = Array.tabulate(800)(i => (i * 13 % 241).toByte)
    val avi = Multimodal.renderAvi(src)
    val decoded = Multimodal.decodedFeatures(avi, "video")
    assert(!decoded.sameElements(Multimodal.stubFeatures(avi, "video")),
      "an AVI payload must take the decoded-frame lane")
    // identical payloads tie exactly through the decoded lane
    assert(decoded.sameElements(Multimodal.decodedFeatures(
      Multimodal.renderAvi(src), "video")))
    // frame-sampled: the grid is the mean of DECODED frame grids
    val grids = Multimodal.decodeAviGrids(avi).get
    val mean = Multimodal.decodeVideoGrid(avi).get
    assert(math.abs(mean(0) - grids.map(_(0)).sum / grids.length) < 1e-12)
    // decoded aHash: identical AVIs tie at hamming 0 through real frames
    assert(Multimodal.pHashDecoded(avi) ===
      Multimodal.pHashDecoded(Multimodal.renderAvi(src)))
    assert(Multimodal.pHashDecoded(avi) !== Multimodal.pHash(avi),
      "the decoded video hash must not be the byte-stub hash")
  }

  test("remuxAviDropFirst keeps the surviving frames byte-identical") {
    val src = Array.tabulate(300)(i => (i * 7).toByte)
    val avi = Multimodal.renderAvi(src, nFrames = 3)
    val orig = Multimodal.aviFrameChunks(avi).get
    val trimmed = Multimodal.remuxAviDropFirst(avi).get
    val tf = Multimodal.aviFrameChunks(trimmed).get
    assert(tf.length === orig.length - 1)
    tf.zip(orig.drop(1)).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b),
        "a remuxed frame must be byte-identical to its source frame") }
    assert(Multimodal.remuxAviDropFirst(avi, dropFrames = 3).isEmpty,
      "a trim that leaves no frames must decline, not mux an empty AVI")
    assert(Multimodal.remuxAviDropFirst(
      "not an avi".getBytes("UTF-8")).isEmpty)
  }

  test("temporal near-dup pairs a trimmed copy; the whole-video hash provably moved") {
    val spark2 = spark
    import spark2.implicits._
    val src = Array.tabulate(400)(i => (i * 13).toByte)
    val avi = Multimodal.renderAvi(src, nFrames = 3)
    val trimmed = Multimodal.remuxAviDropFirst(avi).get
    val rows = Seq((1L, avi), (2L, trimmed)).flatMap { case (id, payload) =>
      Multimodal.videoFrameHashes(payload).zipWithIndex
        .map { case (fh, i) => (id, i, fh) }
    }.toDF("media_id", "frame_idx", "fh")
    val pairs = Multimodal.videoNearDupesHashed(rows, maxHamming = 7)
      .collect()
    assert(pairs.length === 1)
    assert(pairs.head.getAs[Long]("media_a") === 1L)
    assert(pairs.head.getAs[Long]("media_b") === 2L)
    assert(pairs.head.getAs[Long]("min_hamming") === 0L,
      "surviving frames are byte-identical, so the best frame pair ties")
    // the motivation: the WHOLE-video mean-grid hash moved with the
    // frame set (if these ever tie the temporal lane is not adding
    // detection power on this fixture — pick a different src)
    assert(Multimodal.pHashDecoded(avi) !== Multimodal.pHashDecoded(trimmed))
  }

  test("video_phash_near_dupes: every planted trimmed copy pairs at hamming 0") {
    val out = SparkEntry.queries("video_phash_near_dupes")(spark, sf)
      .collect()
    val expected = Tables.documents(spark, sf)
      .filter(col("doc_id") % 3 === 2 && col("doc_id") < 30 &&
        length(col("text")) > 0)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(out.map(_.getAs[Long]("media_a")).toSeq === expected)
    assert(out.forall(r =>
      r.getAs[Long]("media_b") === r.getAs[Long]("media_a") + 900000L))
    assert(out.forall(_.getAs[Long]("min_hamming") === 0L))
  }

  test("pngMedia: video rows carry real AVI payloads whose frames decode") {
    val vids = Multimodal.pngMedia(spark, sf)
      .filter(col("modality") === "video").limit(3)
      .select("content").collect().map(_.getAs[Array[Byte]](0))
    assert(vids.nonEmpty)
    vids.foreach { payload =>
      val grids = Multimodal.decodeAviGrids(payload)
      assert(grids.isDefined && grids.get.length === 3,
        "every video payload must demux into three decodable frames")
    }
  }
}
