package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Interval/range join: pair each left row with the right rows of the same
  * keys whose timestamp falls in [left.ts, left.ts + window).
  *
  * Spark plans a raw inequality join as a nested-loop (quadratic per key
  * group); this is the bucketed formulation: both sides bucket their
  * timestamps at `window` granularity, the right side lands in its bucket,
  * the left side probes its bucket AND the next one (a right match within
  * [t, t+window) can only live in those two), and the exact predicate
  * filters the equi-join output. ONE shuffle join on (keys, bucket), work
  * linear in matches — the standard scalable range-join shape.
  */
object RangeJoin {

  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      windowSeconds: Long,
  ): DataFrame = {
    require(windowSeconds > 0, "windowSeconds must be positive")
    // floor-division, not double-div + cast: cast truncates toward zero,
    // which would misbucket pre-1970 (negative-epoch) timestamps and
    // silently drop boundary matches.
    val lBucket = floor(col(leftTime).cast("long") / windowSeconds).cast("long")
    val rBucket = floor(col(rightTime).cast("long") / windowSeconds).cast("long")
    val l = left.withColumn("_bucket",
      explode(array(lBucket, lBucket + 1)))
    val r = right.withColumn("_bucket", rBucket)
    l.join(r, keys :+ "_bucket")
      .filter(col(rightTime) >= col(leftTime) &&
        col(rightTime) < col(leftTime) + expr(s"INTERVAL $windowSeconds SECONDS"))
      .drop("_bucket")
  }
}
