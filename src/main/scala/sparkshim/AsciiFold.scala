package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * ASCII (accent) folding as a native Catalyst expression — the engine's
 * analogue of the reference's per-property `textAnalyzer.asciiFold`
 * (reference: entities/tokenizer/ascii_fold.go; applied to BOTH the indexed
 * text and the query/filter terms, bm25_searcher.go:393-405,
 * searcher.go:889-908).
 *
 * Same three-phase algorithm as the reference:
 *  1. table replacement for Latin letters Unicode NFD does NOT decompose
 *     (ø→o, æ→ae, ß→ss, ð→d, þ→th, ł→l, đ→d, ħ→h, ŧ→t, ı→i, œ→oe + capitals);
 *  2. NFD decomposition + strip nonspacing marks (category Mn only, so
 *     vowel signs of non-Latin scripts are untouched);
 *  3. NFC recomposition.
 * CJK/Cyrillic/Arabic pass through unchanged. ASCII-only input short-circuits
 * before the (allocating) normalizer runs — the common case costs one scan.
 */
case class AsciiFold(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ascii_fold"

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(AsciiFold.fold(v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val utf8 = classOf[UTF8String].getName
    val helper = AsciiFold.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $utf8.fromString($helper.fold($a.toString()));")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object AsciiFold {

  /** Phase-1 table: Latin letters with no NFD decomposition
   * (ascii_fold.go's documented fold table). */
  private val Table: Map[Char, String] = Map(
    'ł' -> "l", 'Ł' -> "L",
    'ø' -> "o", 'Ø' -> "O",
    'æ' -> "ae", 'Æ' -> "AE",
    'œ' -> "oe", 'Œ' -> "OE",
    'ß' -> "ss", 'ẞ' -> "SS",
    'ð' -> "d", 'Ð' -> "D",
    'þ' -> "th", 'Þ' -> "TH", // ascii_fold.go:99 folds capital thorn to "TH"
    'đ' -> "d", 'Đ' -> "D",
    'ħ' -> "h", 'Ħ' -> "H",
    'ŧ' -> "t", 'Ŧ' -> "T",
    'ı' -> "i",
    // hooked/tailed letters without decompositions (ascii_fold.go:55)
    'ɓ' -> "b", 'ƈ' -> "c", 'ɗ' -> "d", 'ƒ' -> "f", 'ɠ' -> "g",
    'ƙ' -> "k", 'ƚ' -> "l", 'ɲ' -> "n", 'ƥ' -> "p", 'ƭ' -> "t",
    'ʈ' -> "t", 'ƴ' -> "y", 'ȥ' -> "z")

  /** Called from generated code — must stay public static-reachable. */
  def fold(s: String): String = {
    var needsTable = false
    var hasNonAscii = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c > 127) {
        hasNonAscii = true
        if (Table.contains(c)) needsTable = true
      }
      i += 1
    }
    if (!hasNonAscii) return s
    val phase1 =
      if (!needsTable) s
      else {
        val sb = new java.lang.StringBuilder(s.length + 8)
        var j = 0
        while (j < s.length) {
          val c = s.charAt(j)
          Table.get(c) match {
            case Some(r) => sb.append(r)
            case None    => sb.append(c)
          }
          j += 1
        }
        sb.toString
      }
    val decomposed = java.text.Normalizer.normalize(phase1, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(decomposed.length)
    var k = 0
    while (k < decomposed.length) {
      val cp = decomposed.codePointAt(k)
      if (Character.getType(cp) != Character.NON_SPACING_MARK)
        sb.appendCodePoint(cp)
      k += Character.charCount(cp)
    }
    java.text.Normalizer.normalize(sb.toString, java.text.Normalizer.Form.NFC)
  }
}

/**
 * User-dictionary CJK segmentation as a native Catalyst expression (the
 * column form of [[graft.text.CjkDictSegmenter]] — see its scaladoc for the
 * FMM rule and the reference anchor, tokenizer.go:122-173). The segmenter is
 * a codegen reference object, so the tokenization stays inside whole-stage
 * codegen like every other Tokenize mode.
 */
case class CjkDictSegment(child: Expression, seg: graft.text.CjkDictSegmenter)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cjk_dict_segment"

  override def nullSafeEval(v: Any): Any =
    CjkDictSegment.toArrayData(seg.segmentArray(v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val segRef = ctx.addReferenceObj("cjkDictSeg", seg,
      classOf[graft.text.CjkDictSegmenter].getName)
    val helper = CjkDictSegment.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $helper.toArrayData($segRef.segmentArray($a.toString()));")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object CjkDictSegment {
  /** Called from generated code — must stay public static-reachable. */
  def toArrayData(tokens: Array[String]): org.apache.spark.sql.catalyst.util.ArrayData =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      tokens.map(UTF8String.fromString))
}

/**
 * WordPiece-style greedy longest-match subword encoding as a native
 * Catalyst expression (the column form of [[graft.text.GreedyPieces]] —
 * see its scaladoc for the maximal-munch rule). Runs once per DISTINCT
 * word on the dictionary-join path, inside whole-stage codegen.
 */
case class GreedyPieceEncode(child: Expression, enc: graft.text.GreedyPieces)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "greedy_piece_encode"

  override def nullSafeEval(v: Any): Any =
    CjkDictSegment.toArrayData(enc.encodeArray(v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val encRef = ctx.addReferenceObj("greedyPieces", enc,
      classOf[graft.text.GreedyPieces].getName)
    val helper = CjkDictSegment.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $helper.toArrayData($encRef.encodeArray($a.toString()));")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/**
 * Viterbi unigram-model segmentation as a native Catalyst expression (the
 * column form of [[graft.text.ViterbiPieces]] — the SentencePiece inference
 * rule and the UnigramLm E-step). Runs once per DISTINCT word on the
 * dictionary-join path, inside whole-stage codegen.
 */
case class ViterbiPieceEncode(child: Expression, enc: graft.text.ViterbiPieces)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "viterbi_piece_encode"

  override def nullSafeEval(v: Any): Any =
    CjkDictSegment.toArrayData(enc.encodeArray(v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val encRef = ctx.addReferenceObj("viterbiPieces", enc,
      classOf[graft.text.ViterbiPieces].getName)
    val helper = CjkDictSegment.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $helper.toArrayData($encRef.encodeArray($a.toString()));")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Column-level entry points for text analysis expressions. */
object TextFunctions {
  private def c(e: Expression): Column = ExpressionUtils.column(e)
  private def x(col: Column): Expression = ExpressionUtils.expression(col)

  def asciiFold(col: Column): Column = c(AsciiFold(x(col)))
  def cjkDictSegment(col: Column, seg: graft.text.CjkDictSegmenter): Column =
    c(CjkDictSegment(x(col), seg))
  def greedyPieces(col: Column, enc: graft.text.GreedyPieces): Column =
    c(GreedyPieceEncode(x(col), enc))
  def viterbiPieces(col: Column, enc: graft.text.ViterbiPieces): Column =
    c(ViterbiPieceEncode(x(col), enc))
}
