package graft.vector

import scala.util.hashing.MurmurHash3

/** Deterministic text embedding (SURVEY.md §2.9 V2).
  *
  * The reference embeds with `BAAI/bge-base-en-v1.5`, L2-normalized, and uses
  * the SAME function for corpus and query (`ingest_chunks_to_chromadb.py:
  * 60-74`, `query_rag_database.py:122-136`). Neural weights are unavailable
  * offline and non-deterministic across environments, so the engine
  * substitutes signed feature hashing (hashing-trick TF over unigrams +
  * bigrams, Weinberger et al. 2009, "Feature Hashing for Large Scale
  * Multitask Learning") with a fixed seed: text → fixed-dim unit-norm
  * vector, bit-stable across runs, partitionings, and machines.
  *
  * Pure function — embarrassingly parallel, no fitted state to ship (unlike
  * TF-IDF there is no model artifact to keep consistent between the 100 TB
  * corpus build and query time).
  */
object Embedding {

  /** Reference embedding dimension (`ingest_chunks_to_chromadb.py:35`). */
  val DefaultDim: Int = 768
  private val IndexSeed = 0x5bd1e995
  private val SignSeed = 0x9747b28c

  /** Precompiled token splitter: `String.split` with a multi-char pattern
    * re-runs `Pattern.compile` on EVERY call, and tokenize sits in the
    * hottest per-row loops (doc embedding, per-window MaxSim embedding —
    * hundreds of thousands of calls per corpus pass). Same pattern, same
    * split semantics, compiled once. */
  private val TokenSplit = java.util.regex.Pattern.compile("[^\\p{L}\\p{N}]+")

  def tokenize(text: String): Array[String] =
    if (text == null) Array.empty
    else TokenSplit.split(text.toLowerCase(java.util.Locale.ROOT)).filter(_.nonEmpty)

  /** Unit-norm hashed embedding; all-zeros for empty/null text. */
  def hashingEmbed(text: String, dim: Int = DefaultDim): Array[Float] =
    hashingEmbedTokens(tokenize(text), dim)

  /** The same embedding from pre-tokenized input — BIT-IDENTICAL to
    * `hashingEmbed(toks.mkString(" "))` when `toks` came out of `tokenize`
    * (tokens carry no separator chars and are already lowercased, so the
    * round trip re-splits to the same array): the exact per-feature ±1
    * accumulation and index-order normalization below are unchanged.
    * Callers that already hold token arrays (the MaxSim window scorer
    * embeds T windows per doc) skip the window-string build AND its
    * re-tokenization. */
  def hashingEmbedTokens(toks: Array[String], dim: Int = DefaultDim): Array[Float] = {
    require(dim > 0)
    val acc = new Array[Double](dim)
    var i = 0
    while (i < toks.length) {
      addFeature(acc, toks(i), dim)
      if (i + 1 < toks.length) addFeature(acc, toks(i) + " " + toks(i + 1), dim)
      i += 1
    }
    var ss = 0.0
    var j = 0
    while (j < dim) { ss += acc(j) * acc(j); j += 1 }
    val out = new Array[Float](dim)
    if (ss > 0) {
      val inv = 1.0 / math.sqrt(ss)
      j = 0
      while (j < dim) { out(j) = (acc(j) * inv).toFloat; j += 1 }
    }
    out
  }

  private def addFeature(acc: Array[Double], feature: String, dim: Int): Unit = {
    val h = MurmurHash3.stringHash(feature, IndexSeed)
    val idx = ((h % dim) + dim) % dim
    val sign = if (MurmurHash3.stringHash(feature, SignSeed) < 0) -1.0 else 1.0
    acc(idx) += sign
  }
}
