package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 52 text ops (SURVEY.md §2.4):
  *
  *  - d36: cluster-vs-label agreement audit — do the lexical d4→d8
  *    duplicate clusters line up with the embedding labels? Reports
  *    majority-label purity and normalized mutual information over the
  *    (cluster, label) contingency table. The table is bounded by
  *    cluster/label cardinality, every ln() term rounds to 10dp into
  *    DECIMAL before the order-free sums, and only the final
  *    normalization is float. The external-validity companion to
  *    s20's internal coherence.
  */
object TextOps27 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d36_cluster_purity" -> ((spark, dir) => {
      val clusters = TextOps.queries("d8_dedup_clusters")(spark, dir)
        .select(col("doc_id"), col("cluster_keeper").as("cluster"))
      val lab = t(spark, dir, "embeddings")
        .select(col("vec_id"), col("label"))
      val cont = clusters.join(lab, col("doc_id") === col("vec_id"))
        .groupBy("cluster", "label").agg(count(lit(1)).as("n"))
        .localCheckpoint(true)
      val nTot = cont.agg(sum(col("n")).cast("long").as("nn"))
      val byC = cont.groupBy("cluster").agg(sum(col("n")).as("nc"),
        max(col("n")).as("maxl"))
      val byL = cont.groupBy("label").agg(sum(col("n")).as("nl"))
      // entropy/MI terms round to 10dp DECIMAL before summation so the
      // bounded-row sums are order-free in both engines
      def ent(frame: DataFrame, cnt: String) = frame.crossJoin(broadcast(nTot))
        .select(round(
          (col(cnt).cast("double") / col("nn").cast("double"))
            * log(col("nn").cast("double") / col(cnt).cast("double")), 10)
          .cast("decimal(22,10)").as("term"))
        .agg(sum(col("term")).as("h"))
      val hc = ent(byC, "nc").select(col("h").as("hc"))
      val hl = ent(byL, "nl").select(col("h").as("hl"))
      val mi = cont
        .join(broadcast(byC.select(col("cluster"), col("nc"))), "cluster")
        .join(broadcast(byL), "label")
        .crossJoin(broadcast(nTot))
        .select(round(
          (col("n").cast("double") / col("nn").cast("double"))
            * log((col("nn").cast("double") * col("n").cast("double"))
              / (col("nc").cast("double") * col("nl").cast("double"))), 10)
          .cast("decimal(22,10)").as("term"))
        .agg(sum(col("term")).as("mi"))
      val purity = byC.crossJoin(broadcast(nTot))
        .agg((sum(col("maxl")).cast("double") / max(col("nn"))
          .cast("double")).as("p"),
          count(lit(1)).as("n_clusters"))
      purity.crossJoin(broadcast(hc)).crossJoin(broadcast(hl))
        .crossJoin(broadcast(mi)).crossJoin(broadcast(nTot))
        .select(col("nn").as("n_docs"), col("n_clusters"),
          round(col("p"), 6).as("purity"),
          round(col("mi").cast("double")
            / sqrt(col("hc").cast("double") * col("hl").cast("double")), 6)
            .as("nmi"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "d36_cluster_purity" -> {
      val d8 = TextOps.oracleSql("d8_dedup_clusters")
      s"""WITH clusters AS MATERIALIZED (
         |  SELECT doc_id, cluster_keeper AS cluster FROM ($d8) t),
         |cont AS MATERIALIZED (
         |  SELECT cluster, label, CAST(count(*) AS BIGINT) AS n
         |  FROM clusters JOIN embeddings ON doc_id = vec_id
         |  GROUP BY 1, 2),
         |ntot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM cont),
         |byc AS (
         |  SELECT cluster, sum(n) AS nc, max(n) AS maxl
         |  FROM cont GROUP BY 1),
         |byl AS (SELECT label, sum(n) AS nl FROM cont GROUP BY 1),
         |hc AS (
         |  SELECT sum(CAST(round((CAST(nc AS DOUBLE) / nn)
         |    * ln(CAST(nn AS DOUBLE) / CAST(nc AS DOUBLE)), 10)
         |    AS DECIMAL(22,10))) AS hc
         |  FROM byc CROSS JOIN ntot),
         |hl AS (
         |  SELECT sum(CAST(round((CAST(nl AS DOUBLE) / nn)
         |    * ln(CAST(nn AS DOUBLE) / CAST(nl AS DOUBLE)), 10)
         |    AS DECIMAL(22,10))) AS hl
         |  FROM byl CROSS JOIN ntot),
         |mi AS (
         |  SELECT sum(CAST(round((CAST(n AS DOUBLE) / nn)
         |    * ln((CAST(nn AS DOUBLE) * CAST(n AS DOUBLE))
         |      / (CAST(nc AS DOUBLE) * CAST(nl AS DOUBLE))), 10)
         |    AS DECIMAL(22,10))) AS mi
         |  FROM cont JOIN byc USING (cluster) JOIN byl USING (label)
         |  CROSS JOIN ntot),
         |pur AS (
         |  SELECT CAST(sum(maxl) AS DOUBLE) / CAST(max(nn) AS DOUBLE) AS p,
         |    CAST(count(*) AS BIGINT) AS n_clusters
         |  FROM byc CROSS JOIN ntot)
         |SELECT nn AS n_docs, n_clusters, round(p, 6) AS purity,
         |  round(CAST(mi AS DOUBLE)
         |    / sqrt(CAST(hc AS DOUBLE) * CAST(hl AS DOUBLE)), 6) AS nmi
         |FROM pur CROSS JOIN hc CROSS JOIN hl CROSS JOIN mi
         |CROSS JOIN ntot""".stripMargin
    },
  )
}
