package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Bpe

/**
 * The ground truth here is an independent PLAIN-SCALA reference BPE
 * (symbol-LIST segmentations, index loops — no string-replace trick), so the
 * engine's double-space replace representation is checked against a second
 * formulation of the algorithm, not against itself.
 */
class BpeSpec extends SparkSpecBase {
  import spark.implicits._

  // ---- reference implementation (Sennrich alg. 1, word-freq table) ----
  private def refInit(word: String): Vector[String] =
    word.map(_.toString).toVector :+ Bpe.EndOfWord

  private def refApply(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2 // left-to-right greedy, non-overlapping
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def refTrain(words: Map[String, Long], k: Int,
                       minCount: Long = 2L): (Seq[(String, Long)], Map[String, Vector[String]]) = {
    var segs: Map[String, Vector[String]] = words.keys.map(w => w -> refInit(w)).toMap
    val merges = Seq.newBuilder[(String, Long)]
    var r = 0
    var stop = false
    while (r < k && !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, sy) <- segs; i <- 0 until sy.length - 1)
        counts((sy(i), sy(i + 1))) = counts.getOrElse((sy(i), sy(i + 1)), 0L) + words(w)
      if (counts.isEmpty) stop = true
      else {
        val ((a, b), c) = counts.minBy { case ((x, y), n) => (-n, x + " " + y) }
        if (c < minCount) stop = true
        else {
          merges += (s"$a $b" -> c)
          segs = segs.map { case (w, sy) => w -> refApply(sy, a, b) }
          r += 1
        }
      }
    }
    (merges.result(), segs)
  }

  private val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    .select($"doc_id", $"text").limit(200)

  private lazy val wordFreqs: Map[String, Long] =
    docs.select(explode(split($"text", "\\s+")).as("w")).filter($"w" =!= "")
      .groupBy($"w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("train matches the sequential reference algorithm on real corpus text") {
    val (model, vocab) = Bpe.train(docs, $"text", numMerges = 12)
    val (expMerges, expSegs) = refTrain(wordFreqs, 12)
    assert(model.merges.map(m => (m.pair, m.count)) == expMerges)
    // the returned vocabulary frame carries the final segmentations
    val segs = vocab.select($"__w", Bpe.symbols($"__seg")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    assert(segs == expSegs)
  }

  test("adjacent and mid-symbol cases: replace representation = greedy merge") {
    // crafted bed where naive single-space replace goes wrong:
    //  "a a a"  → merge (a,a) must give [aa, a], not [aa] or [a, aa]
    //  "xa b"   → merge (a,b) must NOT fire mid-symbol
    //  "a b a b"→ merge (a,b) must fire twice
    val bed = Seq((1L, "aaa aaa bxy"), (2L, "abab abab xab")).toDF("doc_id", "text")
    val (model, vocab) = Bpe.train(bed, $"text", numMerges = 4, minCount = 2L)
    val freqs = Map("aaa" -> 2L, "bxy" -> 1L, "abab" -> 2L, "xab" -> 1L)
    val (expMerges, expSegs) = refTrain(freqs, 4, minCount = 2L)
    assert(model.merges.map(m => (m.pair, m.count)) == expMerges)
    val segs = vocab.select($"__w", Bpe.symbols($"__seg")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    assert(segs == expSegs)
  }

  test("encode reassembles per-document token streams in word order") {
    val (model, vocab) = Bpe.train(docs, $"text", numMerges = 8)
    val enc = Bpe.encode(docs, $"doc_id", $"text", vocab)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    val (_, expSegs) = refTrain(wordFreqs, 8)
    val expected = docs.select($"doc_id", $"text").collect().map { r =>
      val toks = r.getString(1).split("\\s+").filter(_.nonEmpty).toVector
      r.getLong(0) -> toks.flatMap(expSegs)
    }.toMap
    assert(enc == expected)
  }

  test("encodeWord fold over merges equals the vocabulary-frame segmentation") {
    val (model, vocab) = Bpe.train(docs, $"text", numMerges = 8)
    val viaFold = vocab.select($"__w", model.encodeWord($"__w")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    val viaVocab = vocab.select($"__w", Bpe.symbols($"__seg")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    assert(viaFold == viaVocab)
  }

  test("fully-merged single-symbol words stop pairing instead of crashing") {
    // "a" fully merges to the single symbol "a</w>" in round 1; the next
    // round's pair scan over that word must yield nothing (sequence(1, 0)
    // is [1, 0] — unguarded it indexes out of bounds under ANSI), while
    // "bc" keeps training until it too is a single symbol, then early stop
    val bed = Seq((1L, "a a a bc bc")).toDF("doc_id", "text")
    val (model, vocab) = Bpe.train(bed, $"text", numMerges = 10)
    val (expMerges, expSegs) = refTrain(Map("a" -> 3L, "bc" -> 2L), 10)
    assert(model.merges.map(m => (m.pair, m.count)) == expMerges)
    assert(model.merges.nonEmpty)
    val segs = vocab.select($"__w", Bpe.symbols($"__seg")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    assert(segs == expSegs)
  }

  test("early stop: merge schedule halts when no pair reaches minCount") {
    val bed = Seq((1L, "ab cd")).toDF("doc_id", "text")
    val (model, _) = Bpe.train(bed, $"text", numMerges = 10)
    assert(model.merges.isEmpty) // every pair occurs once; minCount=2
  }

  // ---- WordPiece: likelihood-scored merges + greedy maximal munch ----

  /** refTrain with the WordPiece selection rule: score = cnt/(ca·cb) in
   * double, eligibility cnt >= minCount, ties on the pair string. */
  private def refTrainWP(words: Map[String, Long], k: Int,
                         minCount: Long = 2L): (Seq[(String, Long)], Map[String, Vector[String]]) = {
    var segs: Map[String, Vector[String]] = words.keys.map(w => w -> refInit(w)).toMap
    val merges = Seq.newBuilder[(String, Long)]
    var r = 0
    var stop = false
    while (r < k && !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      val syms = scala.collection.mutable.Map.empty[String, Long]
      for ((w, sy) <- segs) {
        for (i <- 0 until sy.length - 1)
          counts((sy(i), sy(i + 1))) = counts.getOrElse((sy(i), sy(i + 1)), 0L) + words(w)
        for (s <- sy) syms(s) = syms.getOrElse(s, 0L) + words(w)
      }
      val eligible = counts.filter(_._2 >= minCount)
      if (eligible.isEmpty) stop = true
      else {
        val ((a, b), c) = eligible.minBy { case ((x, y), n) =>
          (-(n.toDouble / (syms(x).toDouble * syms(y).toDouble)), x + " " + y)
        }
        merges += (s"$a $b" -> c)
        segs = segs.map { case (w, sy) => w -> refApply(sy, a, b) }
        r += 1
      }
    }
    (merges.result(), segs)
  }

  /** Plain maximal munch over the symbol sequence (chars + atomic marker). */
  private def refGreedy(vocab: Set[String], word: String, unk: String): Vector[String] = {
    val sy = refInit(word)
    val out = Vector.newBuilder[String]
    var pos = 0
    while (pos < sy.length) {
      val len = (math.min(sy.length - pos, 32) to 1 by -1)
        .find(l => vocab.contains(sy.slice(pos, pos + l).mkString)) // marker atomic
        .getOrElse(return Vector(unk))
      out += sy.slice(pos, pos + len).mkString
      pos += len
    }
    out.result()
  }

  test("likelihood scoring matches the sequential WordPiece trainer") {
    val (model, vocab) =
      Bpe.train(docs, $"text", numMerges = 10, scoring = Bpe.Scoring.Likelihood)
    val (expMerges, expSegs) = refTrainWP(wordFreqs, 10)
    assert(model.merges.map(m => (m.pair, m.count)) == expMerges)
    val segs = vocab.select($"__w", Bpe.symbols($"__seg")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    assert(segs == expSegs)
    // the two scoring rules actually disagree on this corpus — otherwise
    // this spec would be re-testing Frequency under another name
    val (freqMerges, _) = refTrain(wordFreqs, 10)
    assert(expMerges.map(_._1) != freqMerges.map(_._1))
  }

  test("a word whose REAL codepoints spell the marker text cannot match " +
      "the atomic marker vocab entry (symbol-length guard)") {
    // vocab has the 1-symbol marker entry but no entry for the real
    // 4-codepoint sequence < / w > — a literal "</w>" word (markup remnant
    // in whitespace-tokenized input) must become [UNK], not a phantom
    // double-marker emission that desynchronizes symbol accounting
    val vocabulary = Seq("a", "b", "a" + Bpe.EndOfWord, "b" + Bpe.EndOfWord,
      Bpe.EndOfWord)
    val greedy = new graft.text.GreedyPieces(vocabulary, "[UNK]")
    assert(greedy.encodeArray(Bpe.EndOfWord).toSeq == Seq("[UNK]"))
    // normal words still encode through the marker entries
    assert(greedy.encodeArray("ab").toSeq == Seq("a", "b" + Bpe.EndOfWord))
    val probs = vocabulary.map(_ -> 0.2).toMap
    val vit = new graft.text.ViterbiPieces(probs, unk = "[UNK]")
    assert(vit.encodeArray(Bpe.EndOfWord).toSeq == Seq("[UNK]"))
    assert(vit.encodeArray("ab").toSeq == Seq("a", "b" + Bpe.EndOfWord))
  }

  test("greedy encode = maximal munch; OOV char makes the whole word unk") {
    val (_, vocabFrame) =
      Bpe.train(docs, $"text", numMerges = 10, scoring = Bpe.Scoring.Likelihood)
    val vocabulary = Bpe.vocabularyOf(vocabFrame)
    val vset = vocabulary.toSet
    val enc = Bpe.encodeGreedy(docs, $"doc_id", $"text", vocabulary)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    val expected = docs.select($"doc_id", $"text").collect().map { r =>
      val toks = r.getString(1).split("\\s+").filter(_.nonEmpty).toVector
      r.getLong(0) -> toks.flatMap(w => refGreedy(vset, w, "[UNK]"))
    }.toMap
    assert(enc == expected)
    // greedy longest-match is NOT the merge-order fold: it can emit a
    // subword the fold would have split differently — just prove the
    // machinery handles an unk: ø never occurs in the corpus alphabet
    val oov = Seq((1L, "søren spark")).toDF("doc_id", "text")
    val got = Bpe.encodeGreedy(oov, $"doc_id", $"text", vocabulary)
      .head().getSeq[String](1).toVector
    assert(got.head == "[UNK]")
    assert(got.tail == refGreedy(vset, "spark", "[UNK]"))
  }
}
