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
    val buckets = df
      .groupBy(bucketCols.map(col): _*)
      .agg(gathered.as("_mk"))
      .filter(size(col("_mk")).between(2, maxBucket))
      // TopKAgg emits descending; ascending member order matches the
      // previous sort_array(collect_list) formulation exactly.
      .withColumn("_ms", reverse(col("_mk")))
    val n = size(col("_ms"))
    buckets.select(explode(flatten(
        transform(sequence(lit(1), n - 1), i =>
          transform(sequence(i + 1, n), j =>
            struct(element_at(col("_ms"), i).getField("m").as("x"),
              element_at(col("_ms"), j).getField("m").as("y")))))).as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"))
  }
}
