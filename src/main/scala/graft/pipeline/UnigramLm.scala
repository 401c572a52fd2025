package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.ViterbiPieces

/**
 * Distributed unigram-language-model tokenizer training (Kudo 2018,
 * "Subword Regularization" — the SentencePiece default; the third classic
 * subword-vocabulary trainer next to [[Bpe]] and its WordPiece scoring).
 * This is the hard-EM ("Viterbi-EM") variant: the E-step assigns each word
 * its single best segmentation under the current piece probabilities
 * rather than the full forward–backward lattice — deterministic, and the
 * standard simplification when soft counts aren't needed.
 *
 * Scale shape mirrors [[Bpe]]: everything runs on the Heaps-law word
 * FREQUENCY table, never the corpus. Seeding is one explode of the ≤
 * `maxPieceLen`-symbol substrings per vocabulary word + a hash-agg; the
 * top-`seedSize` pieces come back through a TakeOrdered (k rows cross the
 * shuffle), single-symbol pieces (the coverage guarantee) through a
 * bounded alphabet-sized filter. Each EM round Viterbi-segments every
 * DISTINCT word with a codegen expression carrying the broadcast piece
 * table (a bounded model constant, the Lloyd/zero-shot precedent), then
 * one explode + hash-agg re-estimates counts.
 *
 * Determinism pins (replayed verbatim by the q_unigram_* oracles):
 * seed rank = (count desc, piece asc); kept = rank ≤ seedSize OR
 * single-symbol; p(x) = count(x)/Σcount over kept (exact BIGINT → IEEE
 * double division); Viterbi argmax = (path probability desc, last-piece
 * length desc) with prefix-product association; pieces unused by any best
 * path drop out of the next round. Probabilities multiply raw (no logs —
 * words are bounded, no underflow, and raw products keep the double math
 * bit-identical to the SQL replay, where `ln` would not be).
 *
 * Symbol space is [[Bpe]]'s: single characters plus the atomic trailing
 * end-of-word marker (pieces may end with, never contain, the marker).
 */
object UnigramLm {

  final case class Piece(piece: String, count: Long, prob: Double)

  /** A trained model: pieces with their final hard-EM usage counts and
   * probabilities, sorted (prob desc, piece asc). */
  final case class Model(pieces: Seq[Piece]) {
    def probs: Map[String, Double] = pieces.map(p => p.piece -> p.prob).toMap
  }

  /** Symbol count of a piece: codepoints of the plain part + 1 for the
   * atomic trailing marker. */
  private[pipeline] def symLen(piece: String): Int =
    if (piece.endsWith(Bpe.EndOfWord)) {
      val plain = piece.substring(0, piece.length - Bpe.EndOfWord.length)
      plain.codePointCount(0, plain.length) + 1
    } else piece.codePointCount(0, piece.length)

  /** Freq-weighted counts of every ≤ `maxPieceLen`-symbol substring of the
   * vocabulary words (symbol space: chars + marker). */
  private[pipeline] def seedCounts(wordFreqs: DataFrame, maxPieceLen: Int): DataFrame =
    wordFreqs
      .select(col("__freq"), Bpe.symbols(Bpe.initSeg(col("__w"))).as("__sy"))
      .select(col("__freq"), explode(expr(
        s"""flatten(transform(sequence(1, size(__sy)), i ->
           |  transform(sequence(i, least(i + ${maxPieceLen - 1}, size(__sy))), j ->
           |    array_join(slice(__sy, i, j - i + 1), ''))))""".stripMargin))
        .as("__piece"))
      .groupBy(col("__piece")).agg(sum(col("__freq")).as("__cnt"))

  private def symLenCol(piece: Column): Column =
    when(piece.endsWith(Bpe.EndOfWord), length(piece) - lit(Bpe.EndOfWord.length - 1))
      .otherwise(length(piece))

  /** Train: seed → `emRounds` hard-EM rounds. The word-frequency frame is
   * cached only for the duration of training (each round re-scans it) and
   * released before returning — the model itself is the whole artifact. */
  def train(df: DataFrame, textCol: Column, seedSize: Int = 64,
            maxPieceLen: Int = 4, emRounds: Int = 2): Model = {
    require(seedSize >= 1 && seedSize <= (1 << 20),
      "unigram: seed vocabulary is a bounded model constant")
    require(maxPieceLen >= 1 && maxPieceLen <= 16, "unigram: piece length bound")
    require(emRounds >= 1 && emRounds <= 64, "unigram: EM schedule bound")
    val wf = Bpe.wordFrequencies(df, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = seedCounts(wf, maxPieceLen)
    val topS = counts
      .orderBy(col("__cnt").desc, col("__piece").asc).limit(seedSize)
    val singles = counts.where(symLenCol(col("__piece")) === 1)
    val kept: Map[String, Long] = topS.unionByName(singles).distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    var probs: Map[String, Double] = normalize(kept)
    var counted: Map[String, Long] = kept
    for (_ <- 1 to emRounds) {
      val vit = new ViterbiPieces(probs, unk = null)
      counted = wf
        .select(col("__freq"), explode(
          org.apache.spark.sql.graft.TextFunctions.viterbiPieces(col("__w"), vit))
          .as("__piece"))
        .groupBy(col("__piece")).agg(sum(col("__freq")).as("__cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      probs = normalize(counted)
    }
    wf.unpersist(false)
    val pieces = counted.toSeq
      .map { case (p, c) => Piece(p, c, probs(p)) }
      .sortBy(p => (-p.prob, p.piece))
    Model(pieces)
  }

  private def normalize(counts: Map[String, Long]): Map[String, Double] = {
    val total = counts.valuesIterator.sum.toDouble
    counts.map { case (p, c) => p -> c.toDouble / total }
  }

  /** Viterbi-encode a corpus under a trained model — same distinct-word
   * dictionary-join amortization as [[Bpe.encode]]. */
  def encode(df: DataFrame, idCol: Column, textCol: Column, model: Model,
             unk: String = "[UNK]"): DataFrame = {
    val vit = new ViterbiPieces(model.probs, unk)
    val occ = df.select(idCol.as("__id"), posexplode(graft.text.Tokenize.whitespace(textCol))
      .as(Seq("__pos", "__w")))
    val dict = occ.select(col("__w")).distinct()
      .withColumn("__sy",
        org.apache.spark.sql.graft.TextFunctions.viterbiPieces(col("__w"), vit))
    occ.join(dict, Seq("__w"))
      .groupBy(col("__id"))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("__pos"), col("__sy")))),
        e => e.getField("__sy"))).as("tokens"))
  }
}
