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
}
