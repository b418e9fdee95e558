package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join utilities for the two scale problems AQE can't always solve alone:
  * key skew (salting) and repeated co-located joins (bucketing).
  */
object ScaleJoins {

  /** Skew-safe inner equi-join: left rows get a deterministic salt in
    * [0, saltFactor), the right side is replicated saltFactor times, and
    * the join key becomes (keys..., salt) — a hot key's rows spread over
    * saltFactor reducers instead of one. Semantics identical to
    * left.join(right, keys) for inner joins (verified in tests).
    *
    * The salt is a hash of the whole left row (not the key — hashing the
    * key alone would map every hot-key row to the same salt and spread
    * nothing). Use when one side has a few keys carrying a large fraction
    * of rows and AQE skew-join splitting isn't available (e.g. non-AQE
    * paths, or skew beyond its thresholds).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      saltFactor: Int): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val l = left.withColumn("_salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(saltFactor)).cast("int"))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, keys :+ "_salt").drop("_salt")
  }

  /** Persist a frame bucketed (and sorted) by `key`: repeated equi-joins /
    * aggregations on `key` between tables bucketed with the same count
    * then run with NO shuffle exchange (verified in tests by asserting the
    * physical plan is Exchange-free). This is the amortize-the-shuffle
    * strategy for fact tables that join on the same key query after query.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, path: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }
}
