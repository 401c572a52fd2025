package graft.operators

/**
 * nearText concept-vector arithmetic — exact port of the reference's movement
 * math (usecases/modulecomponents/arguments/nearText/searcher_movements.go:
 * MoveTo `out_i = s_i·(1−w·0.5) + t_i·(w·0.5)`, MoveAwayFrom
 * `out_i = s_i + w·0.5·(s_i − t_i)`). Query-time constants, so this runs on
 * the driver before the distance scan.
 */
object Movements {

  private val Multiplier = 0.5f

  def moveTo(source: Array[Float], target: Array[Float], force: Double): Array[Float] = {
    require(source.length == target.length, "movement: vector lengths don't match")
    require(force >= 0 && force <= 1, "movement: force must be between 0 and 1")
    val w = force.toFloat * Multiplier
    Array.tabulate(source.length)(i => source(i) * (1 - w) + target(i) * w)
  }

  def moveAwayFrom(source: Array[Float], target: Array[Float], force: Double): Array[Float] = {
    require(source.length == target.length, "movement: vector lengths don't match")
    require(force >= 0, "movement (moveAwayFrom): force must be 0 or positive")
    val w = force.toFloat * Multiplier
    Array.tabulate(source.length)(i => source(i) + w * (source(i) - target(i)))
  }

  /** Mean of concept embeddings (the reference's multi-concept combination). */
  def centroid(vectors: Seq[Array[Float]]): Array[Float] = {
    require(vectors.nonEmpty, "nearText: no concept vectors")
    val dim = vectors.head.length
    val out = new Array[Float](dim)
    vectors.foreach { v => var i = 0; while (i < dim) { out(i) += v(i); i += 1 } }
    var i = 0
    while (i < dim) { out(i) /= vectors.length; i += 1 }
    out
  }
}
