package graft.streaming

import org.apache.spark.sql.SparkSession

/**
 * Streaming state-partition sizing. A stateful streaming query's state-store
 * partition count is fixed by `spark.sql.shuffle.partitions` at FIRST start
 * (it is baked into the checkpoint), and every micro-batch thereafter pays
 * one state-store task per partition — so the right number tracks STATE
 * volume, not the session's batch-shuffle setting. A session tuned for batch
 * scans (32+ partitions, or thousands on a real cluster) makes every
 * micro-batch of a modest-state stream pay tens of near-empty state tasks.
 *
 * [[withStatePartitions]] narrows `spark.sql.shuffle.partitions` for the
 * duration of `body` (which must both START and DRAIN the streaming query —
 * the conf is read at start) and restores the previous value after. At 100 TB
 * the same knob turns the other way: raise it so each state partition stays
 * within executor memory. Batch plans built after the restore are untouched.
 */
object StreamTuning {

  def withStatePartitions[T](spark: SparkSession, n: Int)(body: => T): T = {
    require(n >= 1, "withStatePartitions: n must be >= 1")
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body finally spark.conf.set(key, prev)
  }
}
