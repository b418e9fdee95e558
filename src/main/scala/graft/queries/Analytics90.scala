package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 102 (SURVEY.md §2.4):
  *
  *  - q257: HITS hubs & authorities on the directed nation trade graph
  *    (exporter nation → importer nation, weight = trade count) —
  *    [[graft.operators.Hits]] runs 3 unrolled iterations of the
  *    mutually-recursive scores in exact scaled-integer arithmetic
  *    (BIGINT units of 1e-9, products in DECIMAL(38,0), integer L1
  *    normalization), so the oracle's generated HUGEINT replay is
  *    bit-identical. The directionality complement of q64's PageRank:
  *    export-heavy nations surface as hubs, import-heavy as
  *    authorities.
  */
object Analytics90 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q257_hits" -> ((spark, dir) => {
      val edges = t(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(t(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(spark, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(t(spark, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .select(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
        .filter(col("src") =!= col("dst"))
        .groupBy("src", "dst").agg(count(lit(1)).as("w"))
      val nation = t(spark, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))
      val s = graft.operators.Hits
        .scores(edges, nation.select("n_nationkey"), iters = 3)
      s.join(broadcast(nation), col("node") === col("n_nationkey"))
        .select(col("n_name"), col("hub"), col("authority"))
        .orderBy("n_name")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q257_hits" -> {
      val scale = graft.operators.Hits.Scale
      val iters = (1 to 3).map { r =>
        s"""ar$r AS (
           |  SELECT e.dst, sum(CAST(h.h AS HUGEINT) * e.w) AS araw
           |  FROM edges e JOIN h${r - 1} h ON h.node = e.src GROUP BY 1),
           |at$r AS (SELECT sum(araw) AS ta FROM ar$r),
           |a$r AS MATERIALIZED (
           |  SELECT n.node, coalesce(ar.araw, 0) // (t.ta // $scale) AS a
           |  FROM nodes n LEFT JOIN ar$r ar ON n.node = ar.dst
           |  CROSS JOIN at$r t),
           |hr$r AS (
           |  SELECT e.src, sum(CAST(a.a AS HUGEINT) * e.w) AS hraw
           |  FROM edges e JOIN a$r a ON a.node = e.dst GROUP BY 1),
           |ht$r AS (SELECT sum(hraw) AS th FROM hr$r),
           |h$r AS MATERIALIZED (
           |  SELECT n.node, coalesce(hr.hraw, 0) // (t.th // $scale) AS h
           |  FROM nodes n LEFT JOIN hr$r hr ON n.node = hr.src
           |  CROSS JOIN ht$r t)""".stripMargin
      }.mkString(",\n")
      s"""WITH edges AS MATERIALIZED (
         |  SELECT s_nationkey AS src, c_nationkey AS dst,
         |    CAST(count(*) AS BIGINT) AS w
         |  FROM lineitem
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN customer ON o_custkey = c_custkey
         |  WHERE s_nationkey <> c_nationkey
         |  GROUP BY 1, 2),
         |nodes AS MATERIALIZED (SELECT n_nationkey AS node FROM nation),
         |h0 AS (SELECT node, CAST($scale AS HUGEINT) AS h FROM nodes),
         |$iters
         |SELECT n_name, CAST(h.h AS BIGINT) AS hub,
         |  CAST(a.a AS BIGINT) AS authority
         |FROM nation
         |JOIN h3 h ON h.node = n_nationkey
         |JOIN a3 a ON a.node = n_nationkey
         |ORDER BY n_name""".stripMargin
    },
  )
}
