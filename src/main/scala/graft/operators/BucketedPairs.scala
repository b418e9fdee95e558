package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared LSH-style candidate-pair generation: all unordered member pairs
  * within each bucket, with a bucket-size cap.
  *
  * ONE shuffle on the bucket key, memory bounded by the cap: members are
  * gathered with the bounded [[graft.functions.TopKAgg]] at k =
  * maxBucket+1, so a degenerate bucket ships at most maxBucket+1 members
  * per map partition (never a whole-group collect_list) and shows up as a
  * size-maxBucket+1 array that the cap filter drops whole. A bucket
  * within the cap keeps its exact member set (the bound only truncates
  * buckets that are dropped anyway). Pairs are then expanded inside each
  * bucket's sorted member array — no self-join, no cross join, no window
  * sort. Used by MinHash banding (TextOps d4) and SimHash chunking
  * ([[SimHash]]).
  *
  * @param member struct (or scalar) carried per row; output columns `x`,
  *               `y` hold the pair with x < y in member sort order.
  */
object BucketedPairs {
  def pairs(df: DataFrame, bucketCols: Seq[String], member: Column,
      maxBucket: Int): DataFrame = {
    val gathered = org.apache.spark.sql.graftbridge.column(
      graft.functions.TopKAgg(
        org.apache.spark.sql.graftbridge.expression(struct(member.as("m"))),
        maxBucket + 1).toAggregateExpression())
    // Size pre-filter FIRST, with a plain codegen'd count: the member
    // gather below is a TypedImperativeAggregate, and ObjectHashAggregate
    // falls back to SORT-based aggregation past
    // spark.sql.objectHashAggregate.sortBased.fallbackThreshold (128)
    // groups — running it over every singleton bucket was measured at
    // ~7s for d49's 97k mostly-size-1 buckets at sf0.1. Counting is a
    // cheap hash aggregate; the object aggregate then only sees buckets
    // already inside [2, maxBucket], and the semi join + final groupBy
    // reuse the count's hash partitioning (no extra exchange).
    val inRange = df
      .groupBy(bucketCols.map(col): _*)
      .agg(count(lit(1)).as("_bn"))
      .filter(col("_bn").between(2, maxBucket))
      .select(bucketCols.map(col): _*)
    val buckets = df
      .join(inRange, bucketCols, "left_semi")
      .groupBy(bucketCols.map(col): _*)
      .agg(gathered.as("_mk"))
      .filter(size(col("_mk")).between(2, maxBucket))
      // TopKAgg emits descending; ascending member order matches the
      // previous sort_array(collect_list) formulation exactly.
      .withColumn("_ms", reverse(col("_mk")))
    // Pair expansion as two codegen'd generates (posexplode + slice):
    // the transform(sequence)×transform(sequence) formulation ran its
    // nested lambdas through the interpreted HOF path per element —
    // measured as the dominant cost of d11's candidate stage at sf0.1.
    buckets
      .select(col("_ms"), posexplode(col("_ms")).as(Seq("_i", "_mx")))
      .select(col("_mx").getField("m").as("x"),
        explode(expr("slice(_ms, _i + 2, size(_ms))")).as("_my"))
      .select(col("x"), col("_my").getField("m").as("y"))
  }
}
