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
  * Centroids are a deterministic pseudo-random sample (smallest
  * xxhash64(id)) rather than Lloyd-iterated k-means: assignment, inverted
  * lists, and multi-probe — the parts that matter for the distributed
  * shape — are identical, and determinism keeps results reproducible
  * across runs and partitionings. A k-means refinement would slot in as a
  * loop over [[assign]] + centroid re-averaging on the same frames.
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
  def assign(vecs: DataFrame, cent: Array[(Any, Array[Float])], idCol: String,
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

  /** Top-k neighbors per probe over the nProbe nearest inverted lists. */
  def topK(vecs: DataFrame, probes: DataFrame, idCol: String, embCol: String,
      k: Int = 5, nCentroids: Int = 16, nProbe: Int = 2): DataFrame = {
    val cent = centroids(vecs, idCol, embCol, nCentroids).collect()
      .map(r => (r.get(0), r.getSeq[Float](1).toArray))
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
