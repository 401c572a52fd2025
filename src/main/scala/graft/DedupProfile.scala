package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Dedup
import graft.text.Tokenize

/** One-off profiler: candidate counts + stage timings for the dedup paths. */
object DedupProfile {
  def main(args: Array[String]): Unit = {
    val spark = Fixtures.spark()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val toks = docs.select(col("doc_id").as("__id"), Tokenize.word(col("text")).as("__toks"))
      .withColumn("__sh", array_distinct(Dedup.shingleHashes(col("__toks"), 3)))
    timed("tokenize+shingle scan")(toks.agg(sum(size(col("__sh")))).head())

    val sigs = toks
      .withColumn("__sig", Dedup.minhashSignature(col("__sh"), 128))
      .select(col("__id"), col("__sig"))
    timed("minhash signatures (HOF column path)")(sigs.count())

    val banded = sigs.withColumn("__band", explode(Dedup.bandKeys(col("__sig"), 32, 4)))
      .select(col("__id"), col("__band"))
    val cands = banded.as("a").join(banded.as("b"),
        col("a.__band") === col("b.__band") && col("a.__id") < col("b.__id"))
      .select(col("a.__id"), col("b.__id")).distinct()
    println(s"[profile] minhash candidate pairs: ${timed("band join + distinct")(cands.count())}")

    val out = timed("full minhashDuplicates")(
      Dedup.minhashDuplicates(docs, col("doc_id"), col("text"), 3, 128, 32, 0.7).count())
    println(s"[profile] minhash dup pairs: $out")

    val outJ = timed("full ngramJaccardDuplicates(source)")(
      Dedup.ngramJaccardDuplicates(docs.withColumn("source", lit("x")), // worst case: one bucket
        col("doc_id"), col("text"), Seq(col("source")), 3, 0.8).count())
    println(s"[profile] jaccard(single-bucket worst case) pairs: $outJ")

    // q_dedup_cluster shape: planted bed → minhash pairs → clusterPairs
    val bedDocs = docs.filter(col("doc_id") < 500)
    val bed = bedDocs.unionByName(bedDocs.filter(col("doc_id") % 25 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    val pairs = Dedup.minhashDuplicates(bed, col("doc_id"), col("text"),
      shingleSize = 3, numHashes = 128, bands = 64, threshold = 0.7)
    println(s"[profile] cluster-bed pairs: ${timed("bed minhashDuplicates")(pairs.count())}")
    val clustered = timed("clusterPairs")(
      Dedup.clusterPairs(pairs, col("id_a"), col("id_b")).count())
    println(s"[profile] clustered nodes: $clustered")
    spark.stop()
  }
}
