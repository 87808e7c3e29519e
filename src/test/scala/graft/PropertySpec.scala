package graft

import org.scalacheck.{Gen, Prop}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, TextAnalysis}
import graft.vector.Embedding

/** Property tests over the engine's pure-function kernels (SURVEY.md §5.2)
  * — no SparkSession needed, so hundreds of cases run in milliseconds.
  * Column-level equivalences with these functions are asserted separately
  * in the Spark suites; the driver oracle covers end-to-end values.
  */
class PropertySpec extends AnyFunSuite {

  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 500)
    chars <- Gen.listOfN(n, Gen.frequency(
      (20, Gen.alphaNumChar),
      (5, Gen.const(' ')),
      (2, Gen.const('\n')),
      (1, Gen.oneOf('é', 'ß', '中', '.', ','))))
  } yield chars.mkString

  private def samples[A](gen: Gen[A], n: Int = 200): Seq[A] =
    (0 until n).flatMap(i => gen(Gen.Parameters.default, Seed(i.toLong)))

  test("hashingEmbed: deterministic, fixed-dim, unit-norm (or zero for tokenless text)") {
    samples(textGen).foreach { t =>
      val v1 = Embedding.hashingEmbed(t, 64)
      val v2 = Embedding.hashingEmbed(t, 64)
      assert(v1.toSeq === v2.toSeq, "embedding must be deterministic")
      assert(v1.length === 64)
      val norm = math.sqrt(v1.map(x => x.toDouble * x).sum)
      if (Embedding.tokenize(t).nonEmpty)
        assert(math.abs(norm - 1.0) < 1e-5, s"norm $norm for ${t.take(40)}")
      else assert(norm === 0.0)
    }
  }

  test("hashingEmbed: identical token sequences embed identically across formatting") {
    samples(textGen).foreach { t =>
      // collapsing whitespace / changing case must not change the vector
      val reformatted = t.toUpperCase(java.util.Locale.ROOT)
        .replaceAll("\\s+", " ")
      if (Embedding.tokenize(t).sameElements(Embedding.tokenize(reformatted)))
        assert(Embedding.hashingEmbed(t, 64).toSeq ===
          Embedding.hashingEmbed(reformatted, 64).toSeq)
    }
  }

  test("minhash: 64-long signature, self-similarity 1, permutation invariance") {
    val shingleGen = Gen.listOf(Gen.identifier).map(_.take(50))
    samples(shingleGen).foreach { sh =>
      val sig = Dedup.minhashSig(sh)
      assert(sig.length === 64)
      assert(sig.toSeq === Dedup.minhashSig(sh).toSeq)
      // a signature is an order-independent function of the shingle SET
      assert(sig.toSeq === Dedup.minhashSig(scala.util.Random.shuffle(sh)).toSeq)
      // estimated Jaccard with itself = every component agrees
      assert(sig.zip(Dedup.minhashSig(sh)).count { case (a, b) => a == b } === 64)
    }
  }

  test("minhash: containment estimates dominate disjoint-set estimates") {
    def est(a: Seq[String], b: Seq[String]): Double = {
      val (sa, sb) = (Dedup.minhashSig(a), Dedup.minhashSig(b))
      sa.zip(sb).count { case (x, y) => x == y } / 64.0
    }
    var containSum = 0.0; var disjointSum = 0.0; var n = 0
    samples(Gen.listOfN(30, Gen.identifier), 100).foreach { sh =>
      val whole = sh.distinct.filter(_.nonEmpty)
      if (whole.size >= 8) {
        val half = whole.take(whole.size / 2)
        val disjoint = whole.map(_ + "_disjoint_suffix")
        val eC = est(whole, half)
        val eD = est(whole, disjoint)
        assert(eC >= 0.0 && eC <= 1.0 && eD >= 0.0 && eD <= 1.0)
        containSum += eC; disjointSum += eD; n += 1
      }
    }
    assert(n > 20)
    // half ⊂ whole has true jaccard ~0.5; disjoint sets have jaccard 0 —
    // the averaged estimates must reflect that with a wide margin
    assert(containSum / n > 0.3, s"containment est too low: ${containSum / n}")
    assert(disjointSum / n < 0.1, s"disjoint est too high: ${disjointSum / n}")
    assert(containSum / n > disjointSum / n + 0.2)
  }

  test("simhash: deterministic, multiset-order-invariant, identical sets at hamming 0") {
    val tokGen = Gen.listOf(Gen.identifier).map(_.take(60))
    samples(tokGen).foreach { toks =>
      val h1 = Dedup.simhash64(toks)
      assert(h1 === Dedup.simhash64(toks))
      assert(h1 === Dedup.simhash64(scala.util.Random.shuffle(toks)))
    }
  }

  test("winnowing: deterministic, nonempty for long-enough text, shared-substring detection") {
    samples(textGen.suchThat(_.length >= 40), 100).foreach { t =>
      val fp = TextAnalysis.winnowFingerprint(t)
      assert(fp.toSeq === TextAnalysis.winnowFingerprint(t).toSeq)
      val norm = t.toLowerCase(java.util.Locale.ROOT).replaceAll("[^\\p{L}\\p{N}]+", " ").trim
      if (norm.length >= 8) assert(fp.nonEmpty)
      // Schleimer's winnowing guarantee: two docs sharing a substring of
      // length >= w + k - 1 share at least one selected fingerprint. Embed
      // t verbatim inside unrelated text and assert detection.
      if (norm.length >= 12) {
        val containing = "zzz unrelated prefix 999 " + t + " qqq unrelated suffix 111"
        val fpC = TextAnalysis.winnowFingerprint(containing)
        assert(fp.toSet.intersect(fpC.toSet).nonEmpty,
          s"winnowing missed an embedded copy of: ${t.take(40)}")
      }
    }
  }

  test("parseCMap: random bfchar tables round-trip every entry") {
    import graft.ingest.PdfText
    val entryGen = for {
      n <- Gen.choose(1, 30)
      codes <- Gen.listOfN(n, Gen.choose(1, 0xFFFE))
      dsts <- Gen.listOfN(n, Gen.choose(0x20, 0xD700)) // below surrogates
    } yield codes.distinct.zip(dsts)
    samples(entryGen, 100).filter(_.nonEmpty).foreach { entries =>
      val src = "2 beginbfchar\n" +
        entries.map { case (c, d) => f"<$c%04X> <$d%04X>" }.mkString("\n") +
        "\nendbfchar"
      val cm = PdfText.parseCMap(src).get
      assert(cm.codeLen === 2)
      entries.foreach { case (c, d) =>
        assert(cm.map(c) === d.toChar.toString,
          f"code $c%04X should map to $d%04X")
      }
    }
  }

  test("parseCMap: bfrange scalar form increments the last code unit per step") {
    import graft.ingest.PdfText
    val g = for {
      lo <- Gen.choose(0x100, 0xF000)
      len <- Gen.choose(0, 50)
      dst <- Gen.choose(0x41, 0xD000)
    } yield (lo, lo + len, dst)
    samples(g, 100).foreach { case (lo, hi, dst) =>
      val src = f"1 beginbfrange%n<$lo%04X> <$hi%04X> <$dst%04X>%nendbfrange"
      val cm = PdfText.parseCMap(src).get
      (lo to hi).foreach { c =>
        assert(cm.map(c) === (dst + (c - lo)).toChar.toString)
      }
    }
  }

  test("PdfText.extract: arbitrary byte blobs never throw, corrupt input yields None") {
    import graft.ingest.PdfText
    val blobGen = for {
      n <- Gen.choose(0, 4096)
      prefix <- Gen.oneOf("", "%PDF-1.4\n", "%PDF-")
      bytes <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield prefix.getBytes("ISO-8859-1") ++ bytes
    samples(blobGen, 150).foreach { blob =>
      // contract: total function — corrupt input is a None, never an
      // exception or a hang (the executor-task safety property)
      val r = PdfText.extract(blob)
      assert(r == null || r.isEmpty || r.isDefined) // any Option is fine
    }
    // structured-ish garbage: objects with streams of random bytes
    val structured = for {
      body <- Gen.listOfN(200, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield ("%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
      "2 0 obj\n<< /Type /ObjStm /N 9999 /First 3 /Filter /FlateDecode >>\nstream\n")
      .getBytes("ISO-8859-1") ++ body ++ "\nendstream\nendobj\n".getBytes("ISO-8859-1")
    samples(structured, 50).foreach { blob =>
      PdfText.extract(blob) // must return, whatever the value
    }
  }

  test("langId: deterministic, score in [0, 1e6], known-language sentences classify") {
    samples(textGen).foreach { t =>
      val (s1, l1) = TextAnalysis.langIdScala(t)
      assert((s1, l1) === TextAnalysis.langIdScala(t))
      assert(s1 >= 0L && s1 <= 1000000L)
    }
    assert(TextAnalysis.langIdScala("the cat and the dog in the house")._2 === "en")
    assert(TextAnalysis.langIdScala("der Hund und die Katze ist nicht zu Hause")._2 === "de")
    assert(TextAnalysis.langIdScala("这是一个中文句子里面没有空格")._2 === "zh")
  }
}
