package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join: salt the hot keys so one giant key hash-partitions
  * across `saltFactor` reducers instead of melting a single task.
  *
  * AQE's skew-join split (on by default) handles most cases at runtime;
  * explicit salting remains the tool when a single KEY (not just a
  * partition) is pathological — AQE can split a skewed partition of a
  * sort-merge join but a broadcast-ineligible hot key inside one partition
  * still serializes. Left side gets a uniform random-ish salt derived
  * from a row hash (deterministic, seed-free); the right side is
  * replicated once per salt value via a small generated array — the
  * replication is `saltFactor`×, so use it on the smaller input.
  */
object Skew {

  def saltedJoin(
      left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      saltFactor: Int = 8,
  ): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    // per-row salt from the row's position, not its content: identical
    // duplicate rows of a hot key must still spread across salts (a
    // content hash sends byte-identical rows to ONE salt — exactly the
    // melt-one-task case this operator exists to prevent)
    val saltedLeft = left.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltFactor.toLong)).cast("int"))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLeft
      .join(saltedRight,
        leftKey === rightKey && saltedLeft("__salt") === saltedRight("__salt"))
      .drop("__salt")
  }
}
