package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 44 (similarity family, SURVEY.md §2.4):
  *
  *  - s19: IVF index persistence round-trip — the index-lifecycle step
  *    production vector stores run: TRAIN the centroid index once
  *    (md5-sampled + one Lloyd refinement, exactly s3's recipe), WRITE
  *    it to parquet (a few KB regardless of corpus size), RELOAD it in
  *    a fresh scan, and SEARCH with the loaded index. Doubles
  *    round-trip parquet bit-exactly, so the reloaded index must
  *    reproduce s3's ranking verbatim — the oracle is s3's oracle,
  *    unchanged. At 100 TB this split is the point: build pays the
  *    corpus scan once; queries pay only the routed inverted-list
  *    probes.
  */
object TextOps21 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s19_ivf_index_roundtrip" -> ((spark, dir) => {
      import spark.implicits._
      val e = t(spark, dir, "embeddings")
      val built = graft.operators.AnnIvf.buildCentroids(
        e, "vec_id", "embedding", nCentroids = 16, lloydIters = 1)
      val scratch = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_s19",
        java.nio.file.Paths.get(dir).getFileName.toString).toString
      built.map { case (id, emb) => (id.asInstanceOf[Long], emb.toSeq) }
        .toSeq.toDF("centroid_id", "c_emb")
        .write.mode("overwrite").parquet(scratch)
      val loaded = spark.read.parquet(scratch)
        .collect()
        .map(r => (r.getLong(0): Any,
          r.getSeq[Double](1).toArray))
        .sortBy(_._1.asInstanceOf[Long])
      graft.operators.AnnIvf.searchWith(
          e, e.filter(col("vec_id") < 10), "vec_id", "embedding",
          loaded, k = 5, nProbe = 2)
        .orderBy("probe_id", "rank")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    // the reloaded index must reproduce s3's ranking verbatim
    "s19_ivf_index_roundtrip" -> TextOps.oracleSql("s3_ann_ivf"),
  )
}
