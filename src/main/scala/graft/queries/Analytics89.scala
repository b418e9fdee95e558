package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 99 — graph density ops (SURVEY.md §2.4):
  *
  *  - q255: k-core decomposition of the sparsified nation trade graph —
  *    iterative onion peel ([[graft.operators.KCore]]) with k=10: round
  *    r removes every surviving node with < 10 surviving neighbors;
  *    survivors form the 10-core, peeled nodes carry their layer
  *    number. The oracle replays |V| unrolled peel rounds as generated
  *    CTEs (nation has 25 nodes at every SF, so 25 rounds provably
  *    reach the same fixpoint).
  *  - q256: local clustering coefficient on the same graph — per node:
  *    degree, triangle memberships (q67's ordered triple join, each
  *    triangle counted once), and lcc = 2T / (d·(d−1)) (NULL when
  *    d < 2). The per-node refinement of q67's triangle census.
  *
  *  Shared graph: distinct canonical nation pairs kept only when the
  *  pair's trade count is >= the average pair count — the comparison is
  *  the exact integer cross-multiplication cnt·n_pairs >= cnt_total, so
  *  both engines pick identical edges with no float threshold.
  */
object Analytics89 {
  import Tables.t

  /** Above-average-weight undirected nation trade edges (a < b) —
    * shared with Analytics91's closeness query.
    */
  private[queries] def sparseNationEdges(spark: SparkSession, dir: String): DataFrame = {
    val raw = t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(t(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(spark, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(t(spark, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .select(col("s_nationkey").as("u"), col("c_nationkey").as("v"))
      .filter(col("u") =!= col("v"))
    val pairs = raw
      .select(least(col("u"), col("v")).as("a"),
        greatest(col("u"), col("v")).as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("cnt"))
    val tot = pairs.agg(count(lit(1)).as("n_pairs"),
      sum(col("cnt")).as("cnt_total"))
    pairs.crossJoin(broadcast(tot))
      .filter(col("cnt") * col("n_pairs") >= col("cnt_total"))
      .select("a", "b")
  }

  /** The same sparse graph as DuckDB CTE text (ends without a comma).
    * AS MATERIALIZED on sym/nodes is load-bearing for q255: DuckDB
    * inlines plain CTEs, and 25 unrolled peel rounds reference sym once
    * each — unmaterialized, every round would re-expand the whole fact
    * join (and re-open the parquet scans).
    */
  private[queries] val sparseSql: String =
    """raw AS (
      |  SELECT s_nationkey AS u, c_nationkey AS v
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN customer ON o_custkey = c_custkey
      |  WHERE s_nationkey <> c_nationkey),
      |pairs AS (
      |  SELECT least(u, v) AS a, greatest(u, v) AS b,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM raw GROUP BY 1, 2),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
      |               CAST(sum(cnt) AS BIGINT) AS cnt_total FROM pairs),
      |sparse AS (SELECT a, b FROM pairs, tot
      |           WHERE cnt * n_pairs >= cnt_total),
      |sym AS MATERIALIZED (SELECT a, b FROM sparse
      |        UNION ALL SELECT b AS a, a AS b FROM sparse),
      |nodes AS MATERIALIZED (SELECT DISTINCT a AS node FROM sym)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q255_kcore" -> ((spark, dir) => {
      val peeled = graft.operators.KCore
        .peel(sparseNationEdges(spark, dir), "a", "b", k = 10)
      peeled
        .join(broadcast(t(spark, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
          col("node") === col("n_nationkey"))
        .select(col("n_name"), col("peel_round").isNull.as("in_core"),
          col("peel_round"))
        .orderBy("n_name")
    }),

    "q256_clustering_coeff" -> ((spark, dir) => {
      // Materialized once: degree, the triple join, and the corner
      // union all consume the same edge pipeline.
      val und = sparseNationEdges(spark, dir).localCheckpoint(true)
      val sym = und.union(und.select(col("b").as("a"), col("a").as("b")))
      val deg = sym.groupBy("a").agg(count(lit(1)).as("degree"))
        .select(col("a").as("nk"), col("degree"))
      val tri = und.as("e1")
        .join(und.as("e2"), col("e1.b") === col("e2.a"))
        .join(und.as("e3"),
          col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
        .select(col("e1.a").as("x"), col("e1.b").as("y"),
          col("e2.b").as("z"))
      val perNode = tri.select(col("x").as("nk"))
        .union(tri.select(col("y")))
        .union(tri.select(col("z")))
        .groupBy("nk").agg(count(lit(1)).as("n_tri"))
      deg.join(perNode, Seq("nk"), "left")
        .withColumn("n_tri", coalesce(col("n_tri"), lit(0L)))
        .join(broadcast(t(spark, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
          col("nk") === col("n_nationkey"))
        .select(col("n_name"), col("degree"), col("n_tri"),
          when(col("degree") >= 2,
            round((col("n_tri") * 2).cast("double")
              / (col("degree") * (col("degree") - 1)).cast("double"), 6))
            .as("lcc"))
        .orderBy("n_name")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q255_kcore" -> {
      val rounds = (1 to 25).map { r =>
        s"""deg$r AS (
           |  SELECT s.a AS node, CAST(count(*) AS BIGINT) AS d
           |  FROM sym s JOIN alive${r - 1} x ON s.a = x.node
           |  JOIN alive${r - 1} y ON s.b = y.node GROUP BY 1),
           |rem$r AS MATERIALIZED (
           |  SELECT al.node FROM alive${r - 1} al
           |  LEFT JOIN deg$r dg ON al.node = dg.node
           |  WHERE coalesce(dg.d, 0) < 10),
           |alive$r AS MATERIALIZED (SELECT node FROM alive${r - 1}
           |            EXCEPT SELECT node FROM rem$r)""".stripMargin
      }.mkString(",\n")
      val peelUnion = (1 to 25)
        .map(r => s"SELECT node, CAST($r AS BIGINT) AS peel_round FROM rem$r")
        .mkString("\n  UNION ALL ")
      s"""WITH $sparseSql,
         |alive0 AS (SELECT node FROM nodes),
         |$rounds,
         |peel AS (
         |  $peelUnion)
         |SELECT n_name, p.node IS NULL AS in_core, p.peel_round
         |FROM nodes nd
         |JOIN nation ON nd.node = n_nationkey
         |LEFT JOIN peel p ON nd.node = p.node
         |ORDER BY n_name""".stripMargin
    },

    "q256_clustering_coeff" ->
      s"""WITH $sparseSql,
         |deg AS (SELECT a AS nk, CAST(count(*) AS BIGINT) AS degree
         |        FROM sym GROUP BY 1),
         |tri AS (
         |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |  FROM sparse e1 JOIN sparse e2 ON e1.b = e2.a
         |  JOIN sparse e3 ON e1.a = e3.a AND e2.b = e3.b),
         |pern AS (
         |  SELECT nk, CAST(count(*) AS BIGINT) AS n_tri FROM (
         |    SELECT x AS nk FROM tri
         |    UNION ALL SELECT y FROM tri
         |    UNION ALL SELECT z FROM tri)
         |  GROUP BY 1)
         |SELECT n_name, degree,
         |  coalesce(n_tri, CAST(0 AS BIGINT)) AS n_tri,
         |  CASE WHEN degree >= 2 THEN
         |    round(CAST(coalesce(n_tri, 0) * 2 AS DOUBLE)
         |      / CAST(degree * (degree - 1) AS DOUBLE), 6)
         |  END AS lcc
         |FROM deg LEFT JOIN pern USING (nk)
         |JOIN nation ON nk = n_nationkey
         |ORDER BY n_name""".stripMargin,
  )
}
