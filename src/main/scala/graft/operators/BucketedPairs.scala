package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared LSH-style candidate-pair generation: all unordered member pairs
  * within each bucket, with a bucket-size cap.
  *
  * One lineage, two shuffles on the bucket key (window count + groupBy):
  * the cap filter runs BEFORE collect_list so a degenerate bucket never
  * materializes as a giant array row, and pairs are expanded inside each
  * bucket's sorted member array — no self-join, no cross join. Used by
  * MinHash banding (TextOps d4) and SimHash chunking ([[SimHash]]).
  *
  * @param member struct (or scalar) carried per row; output columns `x`,
  *               `y` hold the pair with x < y in member sort order.
  */
object BucketedPairs {
  def pairs(df: DataFrame, bucketCols: Seq[String], member: Column,
      maxBucket: Int): DataFrame = {
    val w = Window.partitionBy(bucketCols.map(col): _*)
    val buckets = df
      .withColumn("_m", member)
      .withColumn("_bsz", count(lit(1)).over(w))
      .filter(col("_bsz").between(2, maxBucket))
      .groupBy(bucketCols.map(col): _*)
      .agg(sort_array(collect_list(col("_m"))).as("_ms"))
    val n = size(col("_ms"))
    buckets.select(explode(flatten(
        transform(sequence(lit(1), n - 1), i =>
          transform(sequence(i + 1, n), j =>
            struct(element_at(col("_ms"), i).as("x"),
              element_at(col("_ms"), j).as("y")))))).as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"))
  }
}
