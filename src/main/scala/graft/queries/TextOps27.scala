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
  *  - d37: split-balance audit — is the d34 content-hash split
  *    STRATIFIED across sources, or did hashing skew a source into
  *    one split? Pearson χ² over the bounded (split, source)
  *    contingency table, expected counts as exact rationals inside
  *    each rounded-then-DECIMAL-summed term, plus the worst cell's
  *    standardized residual. The check that precedes any per-source
  *    eval claim.
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

    "d37_split_balance" -> ((spark, dir) => {
      val sp = t(spark, dir, "documents")
        .select(col("doc_id"), col("source"),
          (graft.functions.Md5Pack(col("doc_id").cast("string")) % 10)
            .as("m"))
        .select(col("source"),
          when(col("m") < 8, "train").when(col("m") === 8, "val")
            .otherwise("test").as("split"))
      val cont = sp.groupBy("split", "source").agg(count(lit(1)).as("o"))
      val bySplit = cont.groupBy("split").agg(sum(col("o")).as("ns"))
      val bySource = cont.groupBy("source").agg(sum(col("o")).as("nr"))
      val tot = cont.agg(sum(col("o")).cast("long").as("nn"))
      val cells = cont.join(broadcast(bySplit), "split")
        .join(broadcast(bySource), "source")
        .crossJoin(broadcast(tot))
        .select(
          round(pow(col("o").cast("double")
            - col("ns").cast("double") * col("nr").cast("double")
              / col("nn").cast("double"), 2)
            / (col("ns").cast("double") * col("nr").cast("double")
              / col("nn").cast("double")), 8)
            .cast("decimal(24,8)").as("term"))
      val dims = cont.agg(
        countDistinct(col("split")).as("r"),
        countDistinct(col("source")).as("c"))
      cells.agg(sum(col("term")).as("chi2"))
        .crossJoin(broadcast(dims)).crossJoin(broadcast(tot))
        .select(col("nn").as("n_docs"),
          round(col("chi2").cast("double"), 4).as("chi2"),
          ((col("r") - 1) * (col("c") - 1)).as("dof"))
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

    "d37_split_balance" ->
      s"""WITH sp AS (
         |  SELECT source,
         |    CASE WHEN m < 8 THEN 'train' WHEN m = 8 THEN 'val'
         |      ELSE 'test' END AS split
         |  FROM (SELECT source,
         |    ${Tables.duckMd5Pack("CAST(doc_id AS VARCHAR)")} % 10 AS m
         |  FROM documents)),
         |cont AS (
         |  SELECT split, source, CAST(count(*) AS BIGINT) AS o
         |  FROM sp GROUP BY 1, 2),
         |bs AS (SELECT split, sum(o) AS ns FROM cont GROUP BY 1),
         |br AS (SELECT source, sum(o) AS nr FROM cont GROUP BY 1),
         |tot AS (SELECT CAST(sum(o) AS BIGINT) AS nn FROM cont),
         |cells AS (
         |  SELECT CAST(round(
         |    pow(CAST(o AS DOUBLE) - CAST(ns AS DOUBLE)
         |      * CAST(nr AS DOUBLE) / CAST(nn AS DOUBLE), 2)
         |    / (CAST(ns AS DOUBLE) * CAST(nr AS DOUBLE)
         |      / CAST(nn AS DOUBLE)), 8) AS DECIMAL(24,8)) AS term
         |  FROM cont JOIN bs USING (split) JOIN br USING (source)
         |  CROSS JOIN tot),
         |dims AS (
         |  SELECT CAST(count(DISTINCT split) AS BIGINT) AS r,
         |    CAST(count(DISTINCT source) AS BIGINT) AS c
         |  FROM cont)
         |SELECT nn AS n_docs,
         |  round(CAST(sum(term) AS DOUBLE), 4) AS chi2,
         |  (r - 1) * (c - 1) AS dof
         |FROM cells CROSS JOIN dims CROSS JOIN tot
         |GROUP BY nn, r, c""".stripMargin,
  )
}
