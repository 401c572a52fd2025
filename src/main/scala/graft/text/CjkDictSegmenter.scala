package graft.text

/**
 * User-dictionary CJK segmentation — forward maximum matching ("FMM", the
 * greedy longest-match rule gse's default segmenter applies) over a
 * user-supplied word list (reference: entities/tokenizer/tokenizer.go:122-173
 * — the gse/kagome user-dictionary loading path; this closes the dictionary
 * modes honestly without bundling dictionary data: the USER brings the
 * vocabulary, exactly like the reference's `tokenizerUserDictPaths`).
 *
 * Rule, per CJK script run (Han/Hiragana/Katakana/Hangul — same run split as
 * [[Tokenize.cjkBigram]]): scan left to right; at each position emit the
 * LONGEST dictionary word starting there, else the single character, and
 * advance past the emitted token. Non-CJK alphanumeric runs stay lowercased
 * word tokens. Equivalent formulation: leftmost scanning with a
 * longest-first alternation — which is how the q_bm25_cjk_dict oracle
 * independently replays it in DuckDB regex SQL.
 *
 * Codepoint-indexed throughout (supplementary-plane CJK would break
 * UTF-16-char indexing). Instances are embedded in Catalyst expressions and
 * shipped to executors — Serializable, trie built eagerly at construction.
 */
final class CjkDictSegmenter(words: Seq[String]) extends Serializable {
  require(words.nonEmpty, "user dictionary must not be empty")

  /** Lowercased dictionary as codepoint arrays, longest first (ties by the
   * word itself for determinism — irrelevant to matching, stable for
   * inspection). */
  private val dict: Array[Array[Int]] = words.iterator
    .map(_.toLowerCase.trim).filter(_.nonEmpty).toSeq.distinct
    .map(w => w.codePoints().toArray)
    .sortBy(cps => (-cps.length, new String(cps.flatMap(Character.toChars))))
    .toArray
  require(dict.nonEmpty, "user dictionary must contain a non-blank word")

  /** Codepoint trie node — specialized LongMap children (no Integer boxing
   * on the per-codepoint walk). */
  private val root: CjkDictSegmenter.Node = {
    val r = new CjkDictSegmenter.Node
    dict.foreach { cps =>
      var n = r
      var i = 0
      while (i < cps.length) {
        val cp = cps(i).toLong
        var child = n.children.getOrNull(cp)
        if (child == null) {
          child = new CjkDictSegmenter.Node
          n.children.update(cp, child)
        }
        n = child
        i += 1
      }
      n.terminal = true
    }
    r
  }

  /** The segmentation, as a plain array (called from generated code —
   * signature stays Java-friendly). The longest match at each position is
   * one trie walk — no per-candidate slices or boxed set probes (this runs
   * per codepoint of every indexed row). */
  def segmentArray(s: String): Array[String] = {
    val out = Array.newBuilder[String]
    val m = CjkDictSegmenter.RunRegex.matcher(s.toLowerCase)
    while (m.find()) {
      val run = m.group()
      val firstCp = run.substring(0, Character.charCount(run.codePointAt(0)))
      if (CjkDictSegmenter.CjkCharRegex.matcher(firstCp).matches()) {
        val cps = run.codePoints().toArray
        var pos = 0
        while (pos < cps.length) {
          // walk the trie from pos, remembering the deepest terminal
          var best = 0
          var node = root
          var d = 0
          while (node != null && pos + d < cps.length) {
            node = node.children.getOrNull(cps(pos + d).toLong)
            d += 1
            if (node != null && node.terminal) best = d
          }
          val take = if (best > 0) best else 1
          out += new String(cps, pos, take)
          pos += take
        }
      } else out += run
    }
    out.result()
  }

  def segment(s: String): Seq[String] = segmentArray(s).toSeq
}

object CjkDictSegmenter {
  /** Trie node. `children` is a specialized LongMap keyed by codepoint —
   * walks allocate nothing and box nothing. */
  private final class Node extends Serializable {
    val children = new scala.collection.mutable.LongMap[Node]()
    var terminal = false
  }

  // same run alphabet as Tokenize.cjkBigram (Lucene CJK script set + the
  // two Script=Common Japanese marks) — keep the two in sync
  private val CjkClass = "\\p{IsHan}\\p{IsHiragana}\\p{IsKatakana}\\p{IsHangul}ー々"
  private[text] val RunRegex =
    java.util.regex.Pattern.compile(s"[$CjkClass]+|[[\\p{L}\\p{N}]&&[^$CjkClass]]+")
  private[text] val CjkCharRegex = java.util.regex.Pattern.compile(s"[$CjkClass]")
}
