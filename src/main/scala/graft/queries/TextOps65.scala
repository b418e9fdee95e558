package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 152 (SURVEY.md §2.4 dedup QA):
  *
  *  - d52: B-cubed precision/recall/F1 of the MinHash dedup clustering
  *    (d8) against exact token-Jaccard truth (connected components of
  *    d2's pairs) over the d2 universe (doc_id < 200) — the standard
  *    clustering-evaluation metric that d36's purity approximates:
  *    per-item precision |C∩T|/|C| and recall |C∩T|/|T|, averaged.
  *    Unclustered docs are singletons on both sides. Per-cell ratio
  *    terms use FLOOR-DIV parts-per-billion integers (nct²·10⁹ div
  *    n) — no rounded rational doubles anywhere (the t56 half-
  *    boundary lesson), so both engines sum identical integers.
  */
object TextOps65 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d52_bcubed" -> ((spark, dir) => {
      val universe = t(spark, dir, "documents")
        .filter(col("doc_id") < 200 && col("text").isNotNull)
        .select(col("doc_id"))
      val sysPairs = TextOps.queries("d4_minhash_pairs")(spark, dir)
        .select(col("a_id"), col("b_id"))
        .filter(col("a_id") < 200 && col("b_id") < 200)
      val truPairs = TextOps.queries("d2_token_jaccard")(spark, dir)
        .select(col("a_id"), col("b_id"))
      val sys = graft.operators.ConnectedComponents
        .labels(sysPairs, "a_id", "b_id")
        .select(col("node").as("doc_id"), col("component").as("sc"))
      val tru = graft.operators.ConnectedComponents
        .labels(truPairs, "a_id", "b_id")
        .select(col("node").as("doc_id"), col("component").as("tc"))
      val labeled = universe
        .join(sys, Seq("doc_id"), "left")
        .join(tru, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("sc"), col("doc_id")).as("sc"),
          coalesce(col("tc"), col("doc_id")).as("tc"))
      val cells = labeled.groupBy("sc", "tc").agg(count(lit(1)).as("nct"))
      val byC = cells.groupBy("sc").agg(sum(col("nct")).as("nc"))
      val byT = cells.groupBy("tc").agg(sum(col("nct")).as("nt"))
      val terms = cells.join(byC, "sc").join(byT, "tc")
        .select(
          expr("(nct * nct * 1000000000L) div nc").as("p9"),
          expr("(nct * nct * 1000000000L) div nt").as("r9"))
        .agg(sum(col("p9")).as("sp"), sum(col("r9")).as("sr"))
      terms.crossJoin(broadcast(labeled.agg(count(lit(1)).as("n"))))
        .selectExpr("n",
          "round(sp / (cast(n as double) * 1000000000.0d), 6) as b3_precision",
          "round(sr / (cast(n as double) * 1000000000.0d), 6) as b3_recall",
          """round(2.0d * (sp / (cast(n as double) * 1000000000.0d))
            |  * (sr / (cast(n as double) * 1000000000.0d))
            |  / ((sp / (cast(n as double) * 1000000000.0d))
            |    + (sr / (cast(n as double) * 1000000000.0d))), 6)
            | as b3_f1""".stripMargin)
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "d52_bcubed" -> {
      def cc(label: String) =
        s"""${label}_edges AS (
           |  SELECT a_id AS src, b_id AS dst FROM ${label}_pairs
           |  UNION SELECT b_id, a_id FROM ${label}_pairs),
           |${label}_nodes AS (
           |  SELECT DISTINCT src AS node FROM ${label}_edges),
           |${label}_reach AS (
           |  SELECT node AS src, node AS dst FROM ${label}_nodes
           |  UNION
           |  SELECT r.src, e.dst FROM ${label}_reach r
           |  JOIN ${label}_edges e ON r.dst = e.src),
           |${label}_lab AS (
           |  SELECT src AS doc_id, min(dst) AS comp
           |  FROM ${label}_reach GROUP BY src)""".stripMargin
      s"""WITH RECURSIVE
         |s_pairs AS (
         |  SELECT a_id, b_id
         |  FROM (${TextOps.oracleSql("d4_minhash_pairs")}) sp0
         |  WHERE a_id < 200 AND b_id < 200),
         |t_pairs AS (
         |  SELECT a_id, b_id
         |  FROM (${TextOps.oracleSql("d2_token_jaccard")}) tp0),
         |${cc("s")},
         |${cc("t")},
         |universe AS (
         |  SELECT doc_id FROM documents
         |  WHERE doc_id < 200 AND text IS NOT NULL),
         |labeled AS (
         |  SELECT u.doc_id,
         |    coalesce(s_lab.comp, u.doc_id) AS sc,
         |    coalesce(t_lab.comp, u.doc_id) AS tc
         |  FROM universe u
         |  LEFT JOIN s_lab ON u.doc_id = s_lab.doc_id
         |  LEFT JOIN t_lab ON u.doc_id = t_lab.doc_id),
         |cells AS (
         |  SELECT sc, tc, CAST(count(*) AS BIGINT) AS nct
         |  FROM labeled GROUP BY sc, tc),
         |byc AS (SELECT sc, CAST(sum(nct) AS BIGINT) AS nc FROM cells
         |        GROUP BY sc),
         |byt AS (SELECT tc, CAST(sum(nct) AS BIGINT) AS nt FROM cells
         |        GROUP BY tc),
         |terms AS (
         |  SELECT
         |    CAST(sum((nct * nct * 1000000000) // nc) AS BIGINT) AS sp,
         |    CAST(sum((nct * nct * 1000000000) // nt) AS BIGINT) AS sr
         |  FROM cells JOIN byc ON cells.sc = byc.sc
         |  JOIN byt ON cells.tc = byt.tc),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM labeled)
         |SELECT n,
         |  round(sp / (CAST(n AS DOUBLE) * 1000000000.0), 6)
         |    AS b3_precision,
         |  round(sr / (CAST(n AS DOUBLE) * 1000000000.0), 6) AS b3_recall,
         |  round(2.0 * (sp / (CAST(n AS DOUBLE) * 1000000000.0))
         |    * (sr / (CAST(n AS DOUBLE) * 1000000000.0))
         |    / ((sp / (CAST(n AS DOUBLE) * 1000000000.0))
         |      + (sr / (CAST(n AS DOUBLE) * 1000000000.0))), 6) AS b3_f1
         |FROM terms CROSS JOIN nn""".stripMargin
    },
  )
}
