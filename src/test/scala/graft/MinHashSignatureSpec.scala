package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TextHashFunctions

import graft.pipeline.Dedup

/** The native MinHashSignature expression: codegen ≡ interpreted ≡ the SQL
 * aggregate formula it replaced (min over xxhash64(h, i) per lane). */
class MinHashSignatureSpec extends SparkSpecBase {
  import spark.implicits._

  private val rows = Seq(
    (1L, Seq(42L, -7L, 123456789L, Long.MinValue + 3)),
    (2L, Seq(0L)),
    (3L, (1L to 200L).toSeq))

  test("matches the explode -> min(xxhash64(h, i)) aggregate formula bit-for-bit") {
    val df = rows.toDF("id", "shh")
    val native = df
      .select($"id", TextHashFunctions.minhashSignature($"shh", 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val agg = df.select($"id", explode($"shh").as("h"))
      .groupBy($"id")
      .agg(array((0 until 16).map(i => min(xxhash64($"h", lit(i)))): _*).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native == agg)
  }

  test("codegen matches interpreted eval") {
    val df = rows.toDF("id", "shh")
    def run(): Map[Long, Seq[Long]] = df
      .select($"id", TextHashFunctions.minhashSignature($"shh", 32).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val on = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run() == on)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("empty array yields the all-MaxValue signature; null stays null") {
    val df = Seq((1L, Some(Seq.empty[Long])), (2L, Option.empty[Seq[Long]]))
      .toDF("id", "shh")
    val got = df.select($"id", TextHashFunctions.minhashSignature($"shh", 4).as("sig"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(got(1L).get.asInstanceOf[scala.collection.Seq[Long]].toSeq ==
      Seq.fill(4)(Long.MaxValue))
    assert(got(2L).isEmpty)
  }

  test("plan: banding is a projection, not an aggregate (no shuffle)") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val banded = docs
      .withColumn("__shh", array_distinct(
        Dedup.shingleHashes(graft.text.Tokenize.word($"text"), 3)))
      .withColumn("__sig", Dedup.minhashSignature($"__shh", 128))
      .select($"doc_id", explode(Dedup.bandKeys($"__sig", 32, 4)).as("band"))
    val plan = banded.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("HashAggregate"), plan)
  }
}
