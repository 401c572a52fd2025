package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.text.Tokenize

/**
 * Distributed byte-pair-encoding tokenizer training + encoding (Sennrich et
 * al. 2016, "Neural Machine Translation of Rare Words with Subword Units" —
 * the vocabulary step every LLM training pipeline runs before token-budget
 * accounting; an engine extension beyond the weaviate surface, which only
 * COUNTS tokens via its module clients).
 *
 * The classic algorithm is sequential (one merge per round, global pair-count
 * argmax), so the scale trick is the original paper's own: train on the WORD
 * FREQUENCY table, not the corpus. The only corpus-scale operation is one
 * tokenize → explode → hash-agg producing (word, freq); every merge round
 * then runs over the vocabulary table (Heaps-law sized — millions of rows at
 * 100 TB, not billions of tokens), as one explode + partial-aggregated
 * hash-agg + a single-row argmax collect (a bounded model-constant fetch,
 * the Lloyd/quantizer-training precedent). Applying the winning merge is a
 * codegen'd literal string replace on the segmentation column; lineage is
 * truncated every [[Bpe.CheckpointEvery]] rounds so a long merge schedule
 * doesn't grow the plan without bound (the Postings delta precedent).
 *
 * Segmentation representation: symbols joined by DOUBLE spaces with single
 * leading/trailing boundary spaces (`" h  i  </w> "`). A merge of pair
 * `a b` rewrites `" a  b "` → `" ab "`: the boundary spaces make matches
 * align to whole symbols (no mid-symbol hits), and the double separators
 * give ADJACENT occurrences their own boundary chars, so the engine's
 * left-to-right non-overlapping `replace` IS the left-to-right greedy merge
 * application of reference BPE ("a a a" → "aa a", "a b a b" → "ab ab") and
 * each replacement restores the representation invariant. Symbols never
 * contain whitespace (words come from the whitespace tokenizer), so the
 * encoding is unambiguous — and because both the trainer and the DuckDB
 * oracle express every step (char split, pair count, argmax tie on the pair
 * string, merge replace) over this same representation, the q_bpe_train /
 * q_bpe_encode oracles replay the WHOLE model in SQL.
 *
 * Encoding a corpus re-uses the same amortization: apply the rank-ordered
 * merge fold (nested codegen replaces — applying merges in learned order to
 * a word's char segmentation is exactly reference BPE encoding) to each
 * DISTINCT word once, then an equi-join maps word occurrences back to their
 * symbol lists (vocab-side is dictionary-sized → broadcastable; AQE picks).
 */
object Bpe {

  /** End-of-word marker symbol (Sennrich §3.2 — lets the decoder restore
   * word boundaries and keeps word-final pairs distinct from word-internal
   * ones). */
  val EndOfWord = "</w>"

  /** Merge-selection rule. [[Scoring.Frequency]] is classic BPE (argmax raw
   * pair count); [[Scoring.Likelihood]] is the WordPiece trainer's rule
   * (Schuster & Nakajima 2012; the BERT tokenizer): argmax
   * count(ab) / (count(a) · count(b)) — the pair whose merge most increases
   * the corpus unigram-LM likelihood. Both stop when no pair's raw count
   * reaches `minCount`, and both break ties on the pair string ascending. */
  sealed trait Scoring
  object Scoring {
    case object Frequency extends Scoring
    case object Likelihood extends Scoring
  }

  private[pipeline] val CheckpointEvery = 8

  /** A trained merge table, rank order = application order.
   * `pair` is the canonical single-space form `"a b"`. */
  final case class Merge(rank: Int, pair: String, count: Long) {
    def merged: String = pair.replace(" ", "")
  }

  final case class BpeModel(merges: Seq[Merge]) {

    /** Fold the rank-ordered merges over a word's initial character
     * segmentation — nested literal replaces, fully codegen'd. */
    private[pipeline] def segmentWord(word: Column): Column =
      merges.foldLeft(initSeg(word)) { (seg, m) =>
        replace(seg, lit(" " + m.pair.replace(" ", "  ") + " "),
          lit(" " + m.merged + " "))
      }

    /** Subword symbols of one word (array<string>). */
    def encodeWord(word: Column): Column = symbols(segmentWord(word))
  }

  /** Initial segmentation of a word: every character its own symbol plus the
   * end-of-word marker — `"hi"` → `" h  i  </w> "`. */
  private[pipeline] def initSeg(word: Column): Column =
    concat(regexp_replace(word, "(.)", " $1 "), lit(" " + EndOfWord + " "))

  /** Symbol list of a segmentation string. */
  private[graft] def symbols(seg: Column): Column = split(trim(seg), "  ")

  /** Corpus → (word, freq) — the one corpus-scale pass. */
  def wordFrequencies(df: DataFrame, textCol: Column): DataFrame =
    df.select(explode(Tokenize.whitespace(textCol)).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__freq"))

  /** Adjacent-symbol pair counts over a (seg, freq) vocabulary frame —
   * position-based (overlapping occurrences both count, per the reference
   * algorithm), weighted by word frequency. */
  private[pipeline] def pairCounts(vocab: DataFrame): DataFrame =
    vocab.select(symbols(col("__seg")).as("__sy"), col("__freq"))
      // a fully-merged word (single symbol) has no adjacent pairs — and
      // sequence(1, 0) is the DESCENDING [1, 0], not empty, so without the
      // guard the transform indexes __sy out of bounds (throws under ANSI)
      .where(size(col("__sy")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(__sy) - 1), i -> concat(__sy[i - 1], ' ', __sy[i]))"))
        .as("__pair"), col("__freq"))
      .groupBy(col("__pair")).agg(sum(col("__freq")).as("__cnt"))

  /** Freq-weighted symbol occurrence counts over a (seg, freq) vocabulary
   * frame — the denominator terms of the WordPiece likelihood score. */
  private[pipeline] def symbolCounts(vocab: DataFrame): DataFrame =
    vocab.select(explode(symbols(col("__seg"))).as("__s"), col("__freq"))
      .groupBy(col("__s")).agg(sum(col("__freq")).as("__scnt"))

  /** One merge application over the vocabulary frame (see representation
   * note in the object scaladoc). */
  private[pipeline] def applyMerge(vocab: DataFrame, pair: String): DataFrame =
    vocab.withColumn("__seg",
      replace(col("__seg"), lit(" " + pair.replace(" ", "  ") + " "),
        lit(" " + pair.replace(" ", "") + " ")))

  /**
   * Train `numMerges` merges. Each round: pair-count hash-agg over the
   * vocabulary table, argmax by (selection key desc, pair asc — a
   * deterministic total order; the key is the raw count for
   * [[Scoring.Frequency]], the likelihood score for [[Scoring.Likelihood]]),
   * apply. Stops early when no pair occurs twice (`minCount`).
   *
   * @return the model plus the final segmented vocabulary frame
   *         (__w, __seg, __freq) — callers encoding the SAME corpus reuse it
   *         instead of re-folding the merges.
   */
  def train(df: DataFrame, textCol: Column, numMerges: Int,
            minCount: Long = 2L,
            scoring: Scoring = Scoring.Frequency): (BpeModel, DataFrame) = {
    require(numMerges >= 1 && numMerges <= 4096,
      "bpe: merge schedule is a bounded model constant")
    val base = wordFrequencies(df, textCol)
      .withColumn("__seg", initSeg(col("__w")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var vocab: DataFrame = base
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      val eligible = pairCounts(vocab).where(col("__cnt") >= minCount)
      val ranked = scoring match {
        case Scoring.Frequency =>
          eligible.withColumn("__key", col("__cnt").cast("double"))
        case Scoring.Likelihood =>
          // count(ab) / (count(a)·count(b)) in DOUBLE (long·long overflows
          // at corpus scale); the symbol-count side table is
          // vocabulary-alphabet sized — AQE broadcasts it
          val sc = symbolCounts(vocab)
          eligible
            .withColumn("__a", split(col("__pair"), " ").getItem(0))
            .withColumn("__b", split(col("__pair"), " ").getItem(1))
            .join(sc.select(col("__s").as("__a"), col("__scnt").as("__ca")), Seq("__a"))
            .join(sc.select(col("__s").as("__b"), col("__scnt").as("__cb")), Seq("__b"))
            .withColumn("__key", col("__cnt").cast("double") /
              (col("__ca").cast("double") * col("__cb").cast("double")))
      }
      val best = ranked.orderBy(col("__key").desc, col("__pair").asc).limit(1)
        .select(col("__pair"), col("__cnt")).collect()
      best.headOption match {
        case Some(row) =>
          val pair = row.getString(0)
          merges += Merge(rank, pair, row.getLong(1))
          vocab = applyMerge(vocab, pair)
          if (rank % CheckpointEvery == 0) vocab = vocab.localCheckpoint(true)
          rank += 1
        case None => done = true
      }
    }
    // materialize the final frame off the cached base, then release the
    // cache — otherwise every train() pins a Heaps-law-sized vocabulary in
    // the block manager for the life of the session
    val out = vocab.localCheckpoint(true)
    base.unpersist(false)
    (BpeModel(merges.result()), out)
  }

  /**
   * Encode a corpus with a trained vocabulary frame: explode word
   * occurrences with their positions, equi-join the (word → symbols)
   * dictionary, reassemble per document in word order. One explode, one
   * dictionary join, one hash-agg — linear in corpus size; the collect_list
   * is bounded by the document's own token count (the substringCoverage
   * shape).
   */
  def encode(df: DataFrame, idCol: Column, textCol: Column,
             vocab: DataFrame): DataFrame = {
    val dict = vocab.select(col("__w"), symbols(col("__seg")).as("__sy"))
    val occ = df.select(idCol.as("__id"), posexplode(Tokenize.whitespace(textCol))
      .as(Seq("__pos", "__w")))
    occ.join(dict, Seq("__w"))
      .groupBy(col("__id"))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("__pos"), col("__sy")))),
        e => e.getField("__sy"))).as("tokens"))
  }

  /** The subword vocabulary a trained segmentation frame induces: every
   * distinct symbol in the final segmentations. Bounded by
   * |alphabet| + numMerges (each merge adds at most one new symbol) — a
   * model constant, safe to collect and embed in the encoder. */
  def vocabularyOf(vocab: DataFrame): Seq[String] =
    vocab.select(explode(symbols(col("__seg"))).as("__s"))
      .distinct().orderBy(col("__s"))
      .collect().map(_.getString(0)).toSeq

  /**
   * WordPiece-style greedy encoding: each word is tokenized by repeated
   * LONGEST-vocabulary-entry match (maximal munch — the actual WordPiece
   * inference rule, which differs from BPE's merge-order fold), with the
   * end-of-word marker as one atomic trailing symbol and HF's whole-word
   * `unk` fallback when a position has no match. Same amortization as
   * [[encode]]: the greedy scan runs once per DISTINCT word via a codegen
   * expression, an equi-join maps occurrences back.
   */
  def encodeGreedy(df: DataFrame, idCol: Column, textCol: Column,
                   vocabulary: Seq[String], unk: String = "[UNK]"): DataFrame = {
    val enc = new graft.text.GreedyPieces(vocabulary, unk)
    val occ = df.select(idCol.as("__id"), posexplode(Tokenize.whitespace(textCol))
      .as(Seq("__pos", "__w")))
    val dict = occ.select(col("__w")).distinct()
      .withColumn("__sy",
        org.apache.spark.sql.graft.TextFunctions.greedyPieces(col("__w"), enc))
    occ.join(dict, Seq("__w"))
      .groupBy(col("__id"))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("__pos"), col("__sy")))),
        e => e.getField("__sy"))).as("tokens"))
  }
}
