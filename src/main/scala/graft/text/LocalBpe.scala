package graft.text

/** The IN-PROCESS half of production BPE training. Shipped tokenizer
  * trainers (HF `tokenizers`, SentencePiece) run exactly this split: the
  * corpus-scale stage is ONE distributed word/pre-token frequency
  * aggregation (map-side partial, vocabulary-sized output), and the
  * merge loop itself runs locally over that vocabulary — the loop's
  * state is O(distinct words), never O(corpus), so pushing it through
  * cluster jobs buys nothing and costs a scheduler round-trip per merge
  * (50k merges = 50k jobs). The distributed loop
  * (`TextAnalysis.bpeTrainSeg`) remains the unbounded-vocabulary
  * fallback; a spec pins both loops produce IDENTICAL merges on the
  * same vocabulary.
  *
  * Semantics match the distributed loop exactly: per step, count
  * adjacent symbol pairs weighted by word frequency; pick max count,
  * ties broken on the `left|right` pair string ascending; merge
  * greedily left-to-right (non-overlapping — `a a a a` → `aa aa`);
  * stop early when no pairs remain (reference-BPE exhaustion).
  * Reference: Sennrich et al. 2016, Algorithm 1.
  */
object LocalBpe {

  /** A string ordered by its UTF-8 BYTES (unsigned) — the collation
    * Spark's UTF8String and DuckDB both sort by. */
  private final class Utf8Key(s: String) extends Ordered[Utf8Key] {
    val bytes: Array[Byte] =
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    override def compare(that: Utf8Key): Int =
      java.util.Arrays.compareUnsigned(bytes, that.bytes)
  }

  /** One greedy left-to-right merge pass over a segmentation. */
  private[graft] def mergeLR(syms: Vector[String], l: String,
      r: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
        b += (l + r); i += 2
      } else { b += syms(i); i += 1 }
    }
    b.result()
  }

  /** Train `steps` merges over pre-segmented vocabulary entries.
    * Returns (step, left, right, count) rows, possibly fewer than
    * `steps` on exhaustion. */
  def train(segs0: Iterable[(Vector[String], Long)],
      steps: Int): Seq[(Long, String, String, Long)] = {
    // identical segmentations merge their frequencies (a caller feeding
    // raw words relies on this after a merge unifies two entries)
    var segs: Map[Vector[String], Long] =
      segs0.groupMapReduce(_._1)(_._2)(_ + _)
    val out = Seq.newBuilder[(Long, String, String, Long)]
    var step = 1
    var done = false
    while (step <= steps && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- segs; i <- 0 until syms.length - 1) {
        val k = (syms(i), syms(i + 1))
        counts(k) = counts.getOrElse(k, 0L) + f
      }
      if (counts.isEmpty) done = true
      else {
        // max count, then ascending on the joined pair string in BINARY
        // UTF-8 order — the EXACT tie order the distributed argmax
        // (Spark's UTF8String compare) and the DuckDB oracle use.
        // Java's String.compareTo orders UTF-16 code units, which
        // DISAGREES with UTF-8 byte order for supplementary-plane
        // symbols vs U+E000–U+FFFF — latent for today's hex/char
        // alphabets, fatal for a caller feeding arbitrary symbols.
        val ((l, r), c) = counts.minBy[(Long, Utf8Key)] {
          case ((a, b), n) => (-n, new Utf8Key(a + "|" + b))
        }
        segs = segs.groupMapReduce { case (syms, _) =>
          mergeLR(syms, l, r) }(_._2)(_ + _)
        out += ((step.toLong, l, r, c))
        step += 1
      }
    }
    out.result()
  }

  /** Char-level entry: one symbol per character. */
  def trainWords(words: Iterable[(String, Long)],
      steps: Int): Seq[(Long, String, String, Long)] =
    train(words.map { case (w, f) => w.map(_.toString).toVector -> f },
      steps)

  /** Byte-level entry: one symbol per UTF-8 byte, spelled as two
    * uppercase hex digits — the distributed byte front-end's alphabet. */
  def trainByteWords(words: Iterable[(String, Long)],
      steps: Int): Seq[(Long, String, String, Long)] =
    train(words.map { case (w, f) =>
      w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .map(b => f"${b & 0xff}%02X").toVector -> f
    }, steps)
}
