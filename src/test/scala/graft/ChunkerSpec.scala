package graft

import graft.text.Chunker
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

class ChunkerSpec extends AnyFunSuite {

  test("short text yields a single trimmed chunk") {
    assert(Chunker.split("hello world") === List("hello world"))
    assert(Chunker.split("  hello world \n") === List("hello world"))
  }

  test("empty / whitespace-only text yields nothing") {
    assert(Chunker.split("") === Nil)
    assert(Chunker.split("   \n\n  ") === Nil)
  }

  test("unbroken 2500-char token falls back to character split: 1000/1000/800 with 150 overlap") {
    val text = "a" * 2500
    val chunks = Chunker.split(text, 1000, 150)
    assert(chunks.map(_.length) === List(1000, 1000, 800))
    // overlap: chunk i+1 starts 850 chars after chunk i
    assert(chunks(1) === text.substring(850, 1850))
    assert(chunks(2) === text.substring(1700, 2500))
  }

  test("paragraph separator is preferred and kept with the following piece") {
    val p1 = "x" * 600
    val p2 = "y" * 600
    val chunks = Chunker.split(s"$p1\n\n$p2", 1000, 150)
    // 600 + (2 + 600) > 1000 so the two paragraphs cannot merge
    assert(chunks === List(p1, p2))
  }

  test("small paragraphs merge greedily up to chunkSize") {
    val paras = Seq.fill(6)("w" * 100)
    val text = paras.mkString("\n\n")
    val chunks = Chunker.split(text, 1000, 150)
    assert(chunks.size === 1)
    assert(chunks.head === text)
  }

  test("overlap carries trailing pieces into the next chunk") {
    // words of 9 chars + space = 10 per piece
    val words = (0 until 50).map(i => f"w$i%07d")
    val text = words.mkString(" ")
    val chunks = Chunker.split(text, 100, 30)
    assert(chunks.size > 1)
    // consecutive chunks share content (the overlap region)
    chunks.sliding(2).foreach {
      case List(a, b) =>
        val tail = a.split(" ").last
        assert(b.contains(tail), s"chunk '$b' should carry overlap word '$tail'")
      case _ =>
    }
  }

  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 4000)
    chars <- Gen.listOfN(n, Gen.frequency(
      (20, Gen.alphaNumChar),
      (4, Gen.const(' ')),
      (2, Gen.const('\n')),
      (1, Gen.const('é'))))
  } yield chars.mkString

  /** Deterministic sampling loop (no scalatest-scalacheck bridge offline). */
  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => gen(Gen.Parameters.default, Seed(i.toLong)))

  test("property: every chunk is non-empty, <= chunkSize, stripped, and a substring of the input") {
    for {
      text <- samples(textGen, 150)
      size <- Seq(10, 37, 200, 500)
    } {
      val overlap = size / 4
      val chunks = Chunker.split(text, size, overlap)
      chunks.foreach { c =>
        assert(c.nonEmpty)
        assert(c.length <= size, s"chunk len ${c.length} > $size")
        assert(text.contains(c), "chunk not a substring")
        assert(c.trim === c, "chunks are whitespace-stripped")
      }
    }
  }

  test("property: chunks cover all non-whitespace content") {
    for (text <- samples(textGen, 150)) {
      val chunks = Chunker.split(text, 120, 24)
      val nonWs = text.count(!_.isWhitespace)
      val covered = chunks.map(_.count(!_.isWhitespace)).sum
      // overlap duplicates content, stripping only removes whitespace
      assert(covered >= nonWs, s"lost content: covered=$covered original=$nonWs")
    }
  }

  test("property: determinism") {
    for (text <- samples(textGen, 50))
      assert(Chunker.split(text) === Chunker.split(text))
  }
}
