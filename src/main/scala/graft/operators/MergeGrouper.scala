package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/**
 * Legacy Get-level `group { closest | merge }` — semantic grouping of ranked
 * results whose vectors lie within `force` normalized distance
 * (reference: usecases/traverser/grouper/grouper.go:30-100 greedy single-link
 * clustering with NormalizedDistance = (1−cos)/2, usecases/vectorizer/
 * distance.go:21; merge semantics merge_group.go: text "first (second, …)",
 * numbers averaged, booleans majority-true, vectors averaged).
 *
 * Driver-side over the bounded top-k pool, mirroring the reference (the pool
 * is small post-TopK; distributing an O(k²) greedy pass would only add
 * shuffles — SURVEY §2.11).
 */
object MergeGrouper {

  sealed trait Strategy
  case object Closest extends Strategy
  case object Merge extends Strategy

  /** @param pool ranked results (best first); must contain `vecCol` */
  def group(pool: DataFrame, vecCol: String, force: Double, strategy: Strategy): DataFrame = {
    val schema = pool.schema
    val vecIdx = schema.fieldIndex(vecCol)
    val rows = pool.collect()

    def vec(r: Row): Array[Double] = r.getSeq[Float](vecIdx).map(_.toDouble).toArray
    def normDist(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      val sim = if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
      (1 - sim) / 2
    }

    // greedy single-link: first group with ANY member within force wins
    val groups = scala.collection.mutable.ArrayBuffer.empty[scala.collection.mutable.ArrayBuffer[Row]]
    rows.foreach { r =>
      val v = vec(r)
      groups.find(g => g.exists(m => normDist(v, vec(m)) < force)) match {
        case Some(g) => g += r
        case None    => groups += scala.collection.mutable.ArrayBuffer(r)
      }
    }

    val outRows: Seq[Row] = strategy match {
      case Closest =>
        // reference flattenClosest: the group's first (best-ranked) element
        groups.map(g => Row.fromSeq(g.head.toSeq :+ g.size.toLong)).toSeq
      case Merge =>
        groups.map { g =>
          val merged = schema.fields.zipWithIndex.map { case (f, i) =>
            val vals = g.map(_.get(i)).toSeq
            f.dataType match {
              case _ if i == vecIdx => // mean vector
                val vecs = g.map(vec).toSeq
                val dim = vecs.head.length
                val m = new Array[Double](dim)
                vecs.foreach(v => (0 until dim).foreach(d => m(d) += v(d)))
                m.map(x => (x / vecs.size).toFloat).toSeq
              // nulls are EXCLUDED from every merge (a null member must not
              // NPE the average or read as the string "null"); an all-null
              // group merges to null
              case StringType =>
                val vs = vals.collect { case s: String => s }
                if (vs.isEmpty) null
                else if (vs.size == 1) vs.head
                else s"${vs.head} (${vs.tail.mkString(", ")})"
              case DoubleType | FloatType | LongType | IntegerType =>
                val ds = vals.collect { case n: Number => n.doubleValue() }
                if (ds.isEmpty) null else ds.sum / ds.size
              case BooleanType =>
                val bs = vals.collect { case b: java.lang.Boolean => b.booleanValue() }
                if (bs.isEmpty) null
                else { val t = bs.count(identity); t >= bs.size - t } // ties → true
              // array props (beacon lists): union in first-appearance order
              // (the reference's merged group carries every member's refs —
              // the acceptance merge case unions the three cities)
              case _: ArrayType =>
                val vs = vals.collect { case xs: scala.collection.Seq[_] => xs }
                if (vs.isEmpty) null else vs.flatten.distinct
              case _ => vals.head
            }
          }
          Row.fromSeq(merged.toSeq :+ g.size.toLong)
        }.toSeq
    }

    // numeric columns widen to double under merge-averaging
    val outSchema = StructType(schema.fields.map { f =>
      if (strategy == Merge && f.name != vecCol &&
          Seq(LongType, IntegerType, FloatType).contains(f.dataType))
        f.copy(dataType = DoubleType)
      else f
    } :+ StructField("group_size", LongType))
    pool.sparkSession.createDataFrame(
      java.util.Arrays.asList(outRows: _*), outSchema)
  }
}
