package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Approximate nearest neighbor over embedding columns via random-hyperplane
  * LSH (sign-random-projection — the hash family whose collision probability
  * is monotone in cosine similarity).
  *
  * Scale path vs the brute-force baseline (s1_cosine_topk): instead of
  * probes × corpus cosine evaluations, vectors hash to 2^numPlanes buckets
  * (one narrow shuffle) and ranking runs only within the probe's bucket.
  * Hyperplane weights are derived from xxhash64 — fully deterministic, no
  * driver-side randomness, and the plane table (numPlanes × dim rows) is
  * broadcast.
  */
object AnnLsh {

  /** Deterministic pseudo-random hyperplanes: weight(plane, pos) uniform in
    * [-1, 1], derived from an md5 hash of the coordinates. md5 (not
    * xxhash64) so the full plane table — and with it the bucket
    * assignment and the whole topK pipeline — replays bit-exactly in
    * DuckDB SQL: the weight is an exact thousandth, the per-row dot
    * products accumulate in index order on both engines.
    */
  def planes(spark: SparkSession, numPlanes: Int, dim: Int): DataFrame =
    spark.range(numPlanes).toDF("plane")
      .crossJoin(spark.range(dim).toDF("pos"))
      .select(col("plane"), col("pos"),
        ((pmod(graft.functions.Md5Pack(
          concat_ws("_", lit("plane"), col("plane"), col("pos"))), lit(2001))
          - 1000) / 1000.0).as("w"))

  /** (id, bucket) assignment: bucket = sign pattern of the numPlanes
    * projections, packed into a long.
    *
    * Map-only: the plane matrix (numPlanes × dim, a few KB) is collected
    * once and inlined as literal weight rows, so each row computes its
    * projections in a fused per-row dot product — no component explode, no
    * shuffle, no aggregation. The previous explode→join→2×groupBy shape
    * paid two shuffles of corpus×dim×numPlanes rows for the same result;
    * at cluster scale this version broadcasts nothing but the literals in
    * the task closure. Rows with NULL embeddings are dropped (they have no
    * position in hash space).
    */
  def bucketize(vecs: DataFrame, idCol: String, embCol: String,
      numPlanes: Int): DataFrame =
    withBuckets(vecs, idCol, embCol, numPlanes).select(col(idCol), col("bucket"))

  /** All of `vecs`' columns plus the `bucket` assignment — map-only, so
    * callers that need the embedding alongside the bucket (topK) never
    * join the bucket table back on id.
    */
  private def withBuckets(vecs: DataFrame, idCol: String, embCol: String,
      numPlanes: Int): DataFrame = {
    val spark = vecs.sparkSession
    // Dimensionality sniff: one tiny job; empty or all-NULL-embedding
    // corpus → empty result rather than NoSuchElementException/NPE.
    val head = vecs.filter(col(embCol).isNotNull)
      .select(size(col(embCol)).as("d")).head(1)
    if (head.isEmpty)
      return vecs.withColumn("bucket", lit(0L)).limit(0)
    val dim = head(0).getInt(0)
    val w = planes(spark, numPlanes, dim).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val mat = Array.tabulate(numPlanes, dim)((p, i) => w((p.toLong, i.toLong)))
    val bucket = org.apache.spark.sql.graftbridge.column(
      graft.functions.SrpBucket(
        org.apache.spark.sql.graftbridge.expression(col(embCol)), mat))
    vecs.filter(col(embCol).isNotNull)
      .withColumn("bucket", bucket)
  }

  /** Top-k neighbors per probe, searching the probe's LSH bucket plus
    * (when multiProbe) all buckets one sign flip away (multi-probe LSH:
    * each flipped hyperplane is a neighboring region a true neighbor may
    * have landed in — recall multiplies at the cost of numPlanes+1
    * candidate lists per probe, still an equi-join on bucket codes, never
    * a scan).
    *
    * @param probes subset of `vecs` rows to query (must share idCol/embCol)
    */
  def topK(vecs: DataFrame, probes: DataFrame, idCol: String, embCol: String,
      k: Int = 5, numPlanes: Int = 6, multiProbe: Boolean = true): DataFrame = {
    // Buckets are computed in-row on each side (map-only) — no join of a
    // bucket table back onto the vectors.
    val cand = withBuckets(vecs, idCol, embCol, numPlanes)
      .select(col(idCol).as("cand_id"), col(embCol).as("c_emb"), col("bucket"))
    val neighborCodes: Seq[org.apache.spark.sql.Column] =
      if (multiProbe)
        col("bucket") +: (0 until numPlanes)
          .map(i => col("bucket").bitwiseXOR(lit(1L << i)))
      else Seq(col("bucket"))
    val prob = withBuckets(probes, idCol, embCol, numPlanes)
      .select(col(idCol).as("probe_id"), col(embCol).as("p_emb"),
        explode(array(neighborCodes: _*)).as("search_bucket"))
    val scored = prob.join(cand,
        col("search_bucket") === cand("bucket") &&
          col("probe_id") =!= col("cand_id"))
      .select(col("probe_id"), col("cand_id"),
        round(VectorOps.cosine(col("p_emb"), col("c_emb")), 6).as("cos"))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
