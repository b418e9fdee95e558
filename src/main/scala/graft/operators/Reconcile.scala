package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Merkle-style replica reconciliation — the anti-entropy primitive for
  * cross-region table sync. Each replica folds to one row per bucket:
  * (row count, XOR of row fingerprints). XOR is order-free and
  * map-side-combinable, so a digest costs one scan + one bounded-width
  * aggregation regardless of table size, and two replicas compare in
  * O(buckets) instead of O(rows); only drifted buckets need row-level
  * follow-up. Driver query q103 exercises the full pipeline against a
  * DuckDB oracle.
  */
object Reconcile {

  /** Per-bucket digest of a replica: `fingerprint` must be a
    * deterministic per-row hash (e.g. `Md5Pack` over a canonical
    * rendering of the row), `bucketKey` a stable row-to-bucket
    * assignment (e.g. key-hash % buckets).
    */
  def digest(df: DataFrame, fingerprint: Column, bucketKey: Column)
      : DataFrame =
    df.select(bucketKey.as("bucket"), fingerprint.as("h"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("x"))

  /** Buckets where two digests disagree, classified `count_skew`
    * (cardinality drift) vs `content_skew` (same count, different rows).
    * Output is bounded by the bucket count; equal buckets vanish.
    */
  def diff(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("bucket"), col("n").as("n_a"), col("x").as("x_a"))
      .join(b.select(col("bucket"), col("n").as("n_b"), col("x").as("x_b")),
        Seq("bucket"), "full_outer")
      .withColumn("n_a", coalesce(col("n_a"), lit(0L)))
      .withColumn("n_b", coalesce(col("n_b"), lit(0L)))
      .filter(col("n_a") =!= col("n_b") || !(col("x_a") <=> col("x_b")))
      .select(col("bucket"), col("n_a"), col("n_b"),
        when(col("n_a") =!= col("n_b"), lit("count_skew"))
          .otherwise(lit("content_skew")).as("status"))
}
