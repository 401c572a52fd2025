package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Bpe, UnigramLm}
import graft.text.ViterbiPieces

/**
 * Ground truth is an independent plain-Scala trainer whose E-step picks the
 * best segmentation by ENUMERATING all compositions of the word (words are
 * short, ≤ 2^(n-1) candidates) instead of the engine's DP — two different
 * formulations of the same argmax, tie rule included: (left-to-right prefix
 * product desc, then piece-length sequence read from the END, lexicographic
 * desc — which is exactly what per-position "longest last piece" DP
 * resolution selects).
 */
class UnigramLmSpec extends SparkSpecBase {
  import spark.implicits._

  private def refInit(word: String): Vector[String] =
    word.map(_.toString).toVector :+ Bpe.EndOfWord

  private def symCat(sy: Vector[String], i: Int, j: Int): String =
    sy.slice(i, j).mkString

  private def refSymLen(p: String): Int =
    if (p.endsWith(Bpe.EndOfWord)) p.length - Bpe.EndOfWord.length + 1 else p.length

  /** All segmentations of sy into vocab pieces of ≤ maxL symbols. */
  private def segmentations(sy: Vector[String], vocab: Set[String],
                            maxL: Int): Seq[Vector[String]] =
    if (sy.isEmpty) Seq(Vector.empty)
    else (1 to math.min(maxL, sy.length)).flatMap { l =>
      val head = symCat(sy, 0, l)
      if (vocab.contains(head))
        segmentations(sy.drop(l), vocab, maxL).map(head +: _)
      else Seq.empty
    }

  /** Enumeration Viterbi: max by (prefix-product prob, reversed lengths). */
  private def refViterbi(probs: Map[String, Double], word: String,
                         maxL: Int): Option[Vector[String]] = {
    val segs = segmentations(refInit(word), probs.keySet, maxL)
    if (segs.isEmpty) None
    else Some(segs.maxBy { s =>
      (s.foldLeft(1.0)((acc, p) => acc * probs(p)),
        s.reverseIterator.map(refSymLen).toVector.mkString(","))
    }(Ordering.Tuple2(Ordering.Double.TotalOrdering,
      Ordering.String))) // lengths < 10 → one char each; string lex works
  }

  private def refTrain(words: Map[String, Long], seedSize: Int, maxL: Int,
                       rounds: Int): Seq[(String, Long, Double)] = {
    // seed: all ≤maxL-symbol substrings, rank (cnt desc, piece asc),
    // keep rank ≤ seedSize OR single-symbol
    val counts = scala.collection.mutable.Map.empty[String, Long]
    for ((w, f) <- words; sy = refInit(w); i <- sy.indices;
         j <- (i + 1) to math.min(i + maxL, sy.length))
      counts(symCat(sy, i, j)) = counts.getOrElse(symCat(sy, i, j), 0L) + f
    val ranked = counts.toSeq.sortBy { case (p, c) => (-c, p) }
    val kept = (ranked.take(seedSize) ++ ranked.filter(pc => refSymLen(pc._1) == 1)).distinct.toMap
    def norm(c: Map[String, Long]): Map[String, Double] = {
      val t = c.values.sum.toDouble
      c.map { case (p, n) => p -> (n.toDouble / t) }
    }
    var probs = norm(kept)
    var counted: Map[String, Long] = kept
    for (_ <- 1 to rounds) {
      val c = scala.collection.mutable.Map.empty[String, Long]
      for ((w, f) <- words; p <- refViterbi(probs, w, maxL).get)
        c(p) = c.getOrElse(p, 0L) + f
      counted = c.toMap
      probs = norm(counted)
    }
    counted.toSeq.map { case (p, c) => (p, c, probs(p)) }
      .sortBy { case (p, _, pr) => (-pr, p) }
  }

  private val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    .select($"doc_id", $"text").limit(200)

  private lazy val wordFreqs: Map[String, Long] =
    docs.select(explode(split($"text", "\\s+")).as("w")).filter($"w" =!= "")
      .groupBy($"w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("hard-EM training matches the enumeration reference on real corpus text") {
    val model = UnigramLm.train(docs, $"text", seedSize = 40,
      maxPieceLen = 4, emRounds = 2)
    val exp = refTrain(wordFreqs, 40, 4, 2)
    assert(model.pieces.map(p => (p.piece, p.count, p.prob)) == exp)
    // EM actually reshaped the vocabulary: some seed pieces earned no best
    // path and dropped out, and a multi-symbol piece survived
    assert(model.pieces.size < 40 + wordFreqs.keySet.flatMap(refInit).size)
    assert(model.pieces.exists(p => refSymLen(p.piece) > 1))
  }

  test("viterbi beats greedy: picks the globally best path, not maximal munch") {
    // vocab: 'ab' cheap, 'a' and 'b'+marker pieces expensive — greedy munch
    // would take 'ab' first and strand the tail; viterbi must not
    val probs = Map("ab" -> 0.05, "a" -> 0.3, "b</w>" -> 0.3,
      "b" -> 0.05, Bpe.EndOfWord -> 0.3)
    val vit = new ViterbiPieces(probs, unk = "[UNK]")
    // "ab": [a][b</w>] has prob 0.09 > [ab][</w>] 0.015 — greedy picks ab
    assert(vit.encodeArray("ab").toSeq == Seq("a", "b</w>"))
    val greedy = new graft.text.GreedyPieces(probs.keys.toSeq, "[UNK]")
    assert(greedy.encodeArray("ab").toSeq == Seq("ab", Bpe.EndOfWord))
  }

  test("encode matches per-word enumeration; OOV char yields whole-word unk") {
    val model = UnigramLm.train(docs, $"text", seedSize = 40,
      maxPieceLen = 4, emRounds = 2)
    val got = UnigramLm.encode(docs, $"doc_id", $"text", model)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    val probs = model.probs
    val maxL = probs.keys.map(refSymLen).max
    val expected = docs.select($"doc_id", $"text").collect().map { r =>
      val toks = r.getString(1).split("\\s+").filter(_.nonEmpty).toVector
      r.getLong(0) -> toks.flatMap(w => refViterbi(probs, w, maxL).get)
    }.toMap
    assert(got == expected)
    val oov = Seq((1L, "søren")).toDF("doc_id", "text")
    assert(UnigramLm.encode(oov, $"doc_id", $"text", model)
      .head().getSeq[String](1) == Seq("[UNK]"))
  }

  test("tie rule: equal-probability paths resolve to longest-last-piece") {
    // two paths with the SAME product: [aa][b</w>] and [a][ab</w>]
    // (0.2*0.2 each); reversed-lengths (2) vs (3,1): last piece longer wins
    val probs = Map("aa" -> 0.2, "b</w>" -> 0.2, "a" -> 0.2, "ab</w>" -> 0.2,
      "b" -> 0.1, Bpe.EndOfWord -> 0.1)
    val vit = new ViterbiPieces(probs, unk = "[UNK]")
    assert(vit.encodeArray("aab").toSeq == Seq("a", "ab</w>"))
    assert(refViterbi(probs, "aab", 3).get == Vector("a", "ab</w>"))
  }
}
