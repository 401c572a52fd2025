package graft.text

/**
 * WordPiece-style greedy subword encoding — repeated longest-vocabulary-
 * entry match ("maximal munch", Schuster & Nakajima 2012; the BERT
 * tokenizer's inference rule) over a trained subword vocabulary in the
 * engine's end-of-word-marker representation (see [[graft.pipeline.Bpe]]:
 * subwords are plain character runs, word-final subwords carry a trailing
 * `</w>`).
 *
 * The scan works in SYMBOL space: a word of n codepoints is the sequence of
 * its n single-codepoint symbols plus the atomic end marker. At each
 * position the LONGEST vocabulary entry formed by concatenating consecutive
 * symbols is emitted (ties impossible — a position and a symbol count
 * determine the candidate string uniquely); if no entry matches, the WHOLE
 * word becomes the `unk` token (the HF WordPiece rule — partial emissions
 * are discarded). Treating the marker as one atom keeps a stray `<`/`w`
 * vocabulary character from matching inside the marker text.
 *
 * Codepoint-indexed ([[CjkDictSegmenter]] precedent); instances embed in
 * Catalyst expressions and ship to executors — Serializable, structures
 * built eagerly at construction.
 */
final class GreedyPieces(vocabulary: Seq[String], val unk: String)
    extends Serializable {
  require(vocabulary.nonEmpty, "greedy encoder needs a non-empty vocabulary")

  private val vocab: Set[String] = vocabulary.toSet
  private val Marker: String = graft.pipeline.Bpe.EndOfWord

  /** Symbol count of a vocabulary entry: codepoints of the plain part, plus
   * one for the atomic trailing marker if present. */
  private def symLen(v: String): Int =
    if (v.endsWith(Marker)) {
      val plain = v.substring(0, v.length - Marker.length)
      plain.codePointCount(0, plain.length) + 1
    } else v.codePointCount(0, v.length)

  private val maxSyms: Int = vocabulary.iterator.map(symLen).max

  /** The greedy token stream of one word (called from generated code —
   * signature stays Java-friendly). */
  def encodeArray(word: String): Array[String] = {
    val cps = word.codePoints().toArray
    val n = cps.length + 1 // symbol positions: each codepoint + the marker
    val out = Array.newBuilder[String]
    var pos = 0
    while (pos < n) {
      var len = math.min(maxSyms, n - pos)
      var hit: String = null
      while (hit == null && len >= 1) {
        val cand = candidate(cps, pos, len)
        // symLen(cand) == len rejects string-space collisions: a word whose
        // REAL codepoints spell the marker text (e.g. a literal "</w>" in
        // markup-remnant input) builds a candidate that string-equals the
        // atomic 1-symbol marker entry but spans 4 symbols — matching it
        // would desynchronize the symbol accounting.
        if (vocab.contains(cand) && symLen(cand) == len) hit = cand
        else len -= 1
      }
      if (hit == null) return Array(unk)
      out += hit
      pos += len
    }
    out.result()
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
