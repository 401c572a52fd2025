package graft.text

/**
 * Viterbi (best-path) subword segmentation under a unigram piece model —
 * the SentencePiece inference rule (Kudo 2018 §3.1) and the E-step of
 * [[graft.pipeline.UnigramLm]]'s hard-EM trainer.
 *
 * Symbol space as in [[GreedyPieces]]: a word of n codepoints is n
 * single-codepoint symbols plus the atomic end-of-word marker. dp(j) is
 * the max probability of segmenting symbols [0, j); at each j the argmax
 * over candidate last pieces is pinned to (path probability desc, piece
 * length desc) — lengths are distinct per position, so the order is total.
 * Probabilities multiply as raw doubles in prefix order (no logs) so the
 * arithmetic stays bit-identical to the SQL oracle replay — ln/log differ
 * across libm implementations, products do not. The trade: a pathological
 * "word" of hundreds of low-probability pieces (a long URL, a base64 blob,
 * an unspaced CJK sentence) can underflow every path to exactly 0.0, where
 * the (prob desc, len desc) tie-break — not likelihood — picks the
 * segmentation. The oracle computes the same products in the same order,
 * so engine and oracle agree even then; SentencePiece proper works in
 * log-space and would differ on such words. A word with no feasible segmentation becomes
 * the single `unk` token (HF rule); with `unk = null` (training over the
 * corpus that built the vocabulary — infeasibility impossible, every
 * used piece survives a round) it throws instead of silently emitting.
 *
 * Serializable; embedded in Catalyst expressions and shipped to executors.
 */
final class ViterbiPieces(probs: Map[String, Double], val unk: String)
    extends Serializable {
  require(probs.nonEmpty, "viterbi encoder needs a non-empty piece model")

  private val Marker: String = graft.pipeline.Bpe.EndOfWord

  private def symLen(v: String): Int =
    if (v.endsWith(Marker)) {
      val plain = v.substring(0, v.length - Marker.length)
      plain.codePointCount(0, plain.length) + 1
    } else v.codePointCount(0, v.length)

  private val maxSyms: Int = probs.keysIterator.map(symLen).max

  /** Best-path token stream of one word (called from generated code). */
  def encodeArray(word: String): Array[String] = {
    val cps = word.codePoints().toArray
    val n = cps.length + 1 // symbols: codepoints + the atomic marker
    val best = new Array[Double](n + 1)
    val bestLen = new Array[Int](n + 1)
    best(0) = 1.0
    java.util.Arrays.fill(bestLen, -1)
    bestLen(0) = 0
    var j = 1
    while (j <= n) {
      var v = -1.0
      var vl = -1
      var len = 1
      val maxL = math.min(maxSyms, j)
      while (len <= maxL) {
        val i = j - len
        if (bestLen(i) >= 0) {
          val cstr = candidate(cps, i, len)
          // symLen guard as in GreedyPieces: real codepoints spelling the
          // marker text must not match the atomic marker entry (or any
          // entry whose symbol length differs from the span consumed).
          val p =
            if (symLen(cstr) == len) probs.getOrElse(cstr, -1.0) else -1.0
          if (p >= 0) {
            val cand = best(i) * p
            // (prob desc, len desc): strictly-greater OR equal-with-longer
            if (cand > v || (cand == v && len > vl)) { v = cand; vl = len }
          }
        }
        len += 1
      }
      if (vl >= 0) { best(j) = v; bestLen(j) = vl }
      j += 1
    }
    if (bestLen(n) < 0) {
      if (unk == null)
        throw new IllegalStateException(s"viterbi: no segmentation for '$word'")
      return Array(unk)
    }
    // backtrack
    var pos = n
    val out = new scala.collection.mutable.ArrayBuffer[String]
    while (pos > 0) {
      val l = bestLen(pos)
      out += candidate(cps, pos - l, l)
      pos -= l
    }
    out.reverseIterator.toArray
  }

  /** Concatenation of symbols [pos, pos+len): codepoints, marker last. */
  private def candidate(cps: Array[Int], pos: Int, len: Int): String = {
    val sb = new java.lang.StringBuilder
    var i = pos
    val end = pos + len
    while (i < end) {
      if (i < cps.length) sb.appendCodePoint(cps(i))
      else sb.append(Marker)
      i += 1
    }
    sb.toString
  }
}
