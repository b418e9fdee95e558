package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** IVF-style approximate nearest neighbor: partition the corpus into
  * centroid-owned inverted lists, then search only the probe's nProbe
  * nearest lists — the second scale path next to [[AnnLsh]] (hyperplane
  * buckets). IVF trades a build-time corpus×k assignment scan for
  * query-time candidate lists ~nProbe/k of the corpus.
  *
  * Centroids start as a deterministic pseudo-random sample (smallest
  * md5-pack(id)); `lloydIters` optional k-means steps re-center them on
  * the component-wise mean of their owned vectors ([[refine]]). Both the
  * sample and the refinement are fully deterministic — means are
  * decimal-summed, so results replay bit-identically in DuckDB and are
  * independent of partitioning/summation order.
  */
object AnnIvf {

  /** nCentroids deterministic sample rows: (centroid_id, c_emb). The
    * sample key is the md5 pack of the id (not xxhash64) so the centroid
    * set — and with it the whole IVF pipeline — replays in DuckDB SQL.
    */
  def centroids(vecs: DataFrame, idCol: String, embCol: String,
      nCentroids: Int): DataFrame =
    vecs.filter(col(embCol).isNotNull)
      .select(col(idCol).as("centroid_id"), col(embCol).as("c_emb"),
        graft.functions.Md5Pack(col(idCol).cast("string")).as("_h"))
      .orderBy("_h").limit(nCentroids).drop("_h")

  /** Assign every vector to its `nearest` centroids by cosine (nearest=1
    * builds the inverted lists; nearest=nProbe routes probes).
    *
    * Map-only: the centroid table (k rows, a few KB) is collected once and
    * inlined as literal embedding arrays, so each row scores all k
    * centroids in-place and sorts the tiny score array — no crossJoin row
    * expansion, no per-id ranking window, no shuffle at all. Ordering
    * matches the previous window formulation (cos desc, centroid_id asc).
    * Rows with NULL embeddings are dropped.
    */
  def assign(vecs: DataFrame, cent: Array[(Any, Array[Double])], idCol: String,
      embCol: String, nearest: Int): DataFrame = {
    val scoredArr = array(cent.map { case (cid, ce) =>
      val ceLit = array(ce.map(lit(_)): _*)
      // negated cosine: array_sort's natural struct order (asc, asc) then
      // yields (cos desc, centroid_id asc)
      struct((-VectorOps.cosine(col(embCol), ceLit)).as("nc"),
        lit(cid).as("centroid_id"))
    }: _*)
    vecs.filter(col(embCol).isNotNull)
      .select(col(idCol),
        explode(slice(array_sort(scoredArr), 1, nearest)).as("a"))
      .select(col(idCol), col("a.centroid_id").as("centroid_id"))
  }

  /** One Lloyd refinement step: each centroid moves to the component-wise
    * MEAN of the vectors it owns (nearest=1 assignment). The mean is
    * decimal-summed — order-independent and exact — then divided and
    * rounded in double space, so the refined centroids (and every
    * downstream assignment built on them) replay bit-identically in
    * DuckDB SQL; a float sum would depend on partition/summation order.
    * Result is k x dim doubles collected to the driver — constant size,
    * the same footprint as the initial centroid collect. A centroid that
    * owns no vectors drops out (standard k-means empty-cluster drop):
    * on the first iteration every sample-seeded centroid owns at least
    * itself unless its embedding duplicates a lower-id centroid's, but
    * refined mean centroids carry no such guarantee, so `lloydIters >=
    * 2` may return fewer than nCentroids lists — the DuckDB oracle
    * replays the same drop.
    */
  def refine(vecs: DataFrame, cent: Array[(Any, Array[Double])],
      idCol: String, embCol: String): Array[(Any, Array[Double])] = {
    val owned = assign(vecs, cent, idCol, embCol, nearest = 1)
      .join(vecs.select(col(idCol), col(embCol)), idCol)
    val comp = owned
      .select(col("centroid_id"), posexplode(col(embCol)))
      .groupBy("centroid_id", "pos")
      // float -> double first: both engines then take the identical
      // double -> decimal rounding path (a direct float -> decimal cast
      // could round via the float's short decimal repr).
      .agg(round(
        sum(col("col").cast("double").cast("decimal(25,10)")).cast("double")
          / count(lit(1)),
        6).as("m"))
    comp.collect()
      .groupBy(_.get(0))
      .map { case (cid, rows) =>
        (cid, rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray)
      }
      .toArray
  }

  /** The trained index: sampled (and optionally Lloyd-refined)
    * centroids as plain data — a few KB regardless of corpus size, so
    * it persists to a parquet file and reloads bit-exactly (doubles
    * round-trip parquet unchanged), decoupling index BUILD from query
    * time the way a production vector store does.
    */
  def buildCentroids(vecs: DataFrame, idCol: String, embCol: String,
      nCentroids: Int, lloydIters: Int): Array[(Any, Array[Double])] = {
    var cent = centroids(vecs, idCol, embCol, nCentroids).collect()
      .map(r => (r.get(0): Any, r.getSeq[Float](1).toArray.map(_.toDouble)))
    (0 until lloydIters).foreach { _ =>
      cent = refine(vecs, cent, idCol, embCol)
    }
    cent
  }

  /** Top-k neighbors per probe over the nProbe nearest inverted lists. */
  def topK(vecs: DataFrame, probes: DataFrame, idCol: String, embCol: String,
      k: Int = 5, nCentroids: Int = 16, nProbe: Int = 2,
      lloydIters: Int = 0): DataFrame = {
    val cent = buildCentroids(vecs, idCol, embCol, nCentroids, lloydIters)
    searchWith(vecs, probes, idCol, embCol, cent, k, nProbe)
  }

  /** Search with an externally supplied (e.g. persisted-and-reloaded)
    * centroid index.
    */
  def searchWith(vecs: DataFrame, probes: DataFrame, idCol: String,
      embCol: String, cent: Array[(Any, Array[Double])], k: Int = 5,
      nProbe: Int = 2): DataFrame = {
    if (cent.isEmpty)
      return probes.select(col(idCol).as("probe_id"), col(idCol).as("cand_id"),
        lit(0.0).as("cos"), lit(1).as("rank")).limit(0)
    val lists = assign(vecs, cent, idCol, embCol, nearest = 1)
      .withColumnRenamed(idCol, "cand_id")
      .join(vecs.select(col(idCol).as("cand_id"), col(embCol).as("c_vec")),
        "cand_id")
    val routed = assign(probes, cent, idCol, embCol, nearest = nProbe)
      .withColumnRenamed(idCol, "probe_id")
      .join(probes.select(col(idCol).as("probe_id"), col(embCol).as("p_vec")),
        "probe_id")
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("cand_id"))
    routed.join(lists, Seq("centroid_id"))
      .filter(col("probe_id") =!= col("cand_id"))
      .select(col("probe_id"), col("cand_id"),
        round(VectorOps.cosine(col("p_vec"), col("c_vec")), 6).as("cos"))
      .distinct()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
