package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/**
 * MinHash signature as a native Catalyst expression — the hashing core of
 * every LSH dedup path (reference analogue: the MinHash stage of
 * near-duplicate detection; the engine-side counterpart of
 * `Dedup.minhashDuplicates`' signature build).
 *
 * Semantics (bit-compatible with the SQL form the batch aggregate used):
 * lane i of the signature is `min over elements h of xxhash64(h, i)` where
 * the multi-argument xxhash64 chain is `hashInt(i, hashLong(h, 42))` —
 * Spark's own XXH64 primitives, seed 42, left-fold.
 *
 * Why an expression and not `transform`/`aggregate` lambdas or an
 * explode → hash-aggregate: HOF lambdas evaluate INTERPRETED per element
 * (128 lanes × shingles × interpreter overhead measured 61 s for 1000
 * docs), and the explode/agg rewrite costs a full shuffle on the doc key
 * plus a 128-column aggregate. This is one tight primitive loop inside
 * WholeStageCodegen — no shuffle, no boxing, no encoder round-trip — and
 * being a plain projection it runs identically on batch frames and
 * streams (where an aggregation before a stateful operator is not even
 * allowed).
 */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(numHashes > 0, "minhash_signature: numHashes must be positive")

  override def prettyName: String = "minhash_signature"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val base = new Array[Long](n)
    var j = 0
    while (j < n) { base(j) = XXH64.hashLong(arr.getLong(j), 42L); j += 1 }
    val sig = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      var m = Long.MaxValue
      j = 0
      while (j < n) {
        val v = XXH64.hashInt(i, base(j))
        if (v < m) m = v
        j += 1
      }
      sig(i) = m
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val xxh = classOf[XXH64].getName
      val n = ctx.freshName("n")
      val base = ctx.freshName("base")
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val v = ctx.freshName("v")
      s"""
         |int $n = $in.numElements();
         |long[] $base = new long[$n];
         |for (int $j = 0; $j < $n; $j++) {
         |  $base[$j] = $xxh.hashLong($in.getLong($j), 42L);
         |}
         |long[] $sig = new long[$numHashes];
         |for (int $i = 0; $i < $numHashes; $i++) {
         |  long $m = Long.MAX_VALUE;
         |  for (int $j = 0; $j < $n; $j++) {
         |    long $v = $xxh.hashInt($i, $base[$j]);
         |    if ($v < $m) $m = $v;
         |  }
         |  $sig[$i] = $m;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(child = c)
}

object TextHashFunctions {
  private def x(c: Column): Expression = ExpressionUtils.expression(c)
  private def c(e: Expression): Column = ExpressionUtils.column(e)

  /** MinHash signature (length `numHashes`) of a 64-bit shingle-hash array. */
  def minhashSignature(shingleHashes: Column, numHashes: Int): Column =
    c(MinHashSignature(x(shingleHashes), numHashes))
}
