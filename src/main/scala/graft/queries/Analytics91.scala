package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 106 — global graph structure (SURVEY.md
  * §2.4):
  *
  *  - q259: closeness centrality + eccentricity + diameter on the
  *    sparse nation graph (Analytics89's exact above-average edge
  *    pick): all-pairs hop distances via [[graft.operators.BfsHops]]
  *    `allPairs` (sparse reached-pair frame, |V|²-bounded, O(diameter)
  *    rounds), then per source: reachable count, max distance, and
  *    closeness (reach−1)/Σdist — one integer division per node, no
  *    float sums. The oracle replays 24 unrolled relaxations over the
  *    src×node matrix (path-graph worst case for 25 nodes).
  *  - q260: modularity of the region partition over the FULL weighted
  *    nation trade graph — does geography explain the trade clusters?
  *    Q = Σ_c [e_c/W − (d_c/2W)²] evaluated as the single exact
  *    rational (4W·Σe_c − Σd_c²) / 4W², so the only float operation is
  *    the final division (per-region d² rides DECIMAL/HUGEINT — BIGINT
  *    d² overflows once W reaches ~1.5e9).
  */
object Analytics91 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q259_closeness" -> ((spark, dir) => {
      val dist = graft.operators.BfsHops
        .allPairs(Analytics89.sparseNationEdges(spark, dir), "a", "b")
      val per = dist.groupBy("src")
        .agg(count(lit(1)).as("n_reach"),
          max(col("dist")).as("ecc"),
          sum(col("dist")).as("sum_d"))
      val diam = per.agg(max(col("ecc")).as("diameter"))
      per.crossJoin(broadcast(diam))
        .join(broadcast(t(spark, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
          col("src") === col("n_nationkey"))
        .select(col("n_name"), col("n_reach"), col("ecc"),
          when(col("sum_d") > 0,
            round((col("n_reach") - 1).cast("double")
              / col("sum_d").cast("double"), 6)).as("closeness"),
          col("diameter"))
        .orderBy("n_name")
    }),

    "q260_modularity" -> ((spark, dir) => {
      val nat = broadcast(t(spark, dir, "nation")
        .select(col("n_nationkey"), col("n_regionkey")))
      val pairs = t(spark, dir, "lineitem")
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
        .select(col("s_nationkey").as("u"), col("c_nationkey").as("v"))
        .filter(col("u") =!= col("v"))
        .select(least(col("u"), col("v")).as("a"),
          greatest(col("u"), col("v")).as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("w"))
        .join(nat.select(col("n_nationkey").as("a"),
          col("n_regionkey").as("ra")), "a")
        .join(nat.select(col("n_nationkey").as("b"),
          col("n_regionkey").as("rb")), "b")
        .localCheckpoint(true) // feeds intra, degree, and W
      // per-region intra weight and weighted degree (intra counts twice)
      val intra = pairs.filter(col("ra") === col("rb"))
        .groupBy(col("ra").as("rk")).agg(sum(col("w")).as("intra_w"))
      val deg = pairs
        .select(col("ra").as("rk"), col("w"))
        .union(pairs.select(col("rb").as("rk"), col("w")))
        .groupBy("rk").agg(sum(col("w")).as("deg_w"))
      val per = deg.join(intra, Seq("rk"), "left")
        .select(col("rk"), coalesce(col("intra_w"), lit(0L)).as("intra_w"),
          col("deg_w"))
      val glob = per.agg(
          sum(col("intra_w")).as("sum_e"),
          sum(expr("cast(deg_w as decimal(38,0)) * deg_w")).as("sum_d2"))
        .crossJoin(broadcast(pairs.agg(sum(col("w")).as("big_w"))))
      per.crossJoin(broadcast(glob))
        .join(broadcast(t(spark, dir, "region")
          .select(col("r_regionkey"), col("r_name"))),
          col("rk") === col("r_regionkey"))
        .select(col("r_name"), col("intra_w"), col("deg_w"),
          round(expr(
            """(4 * cast(big_w as decimal(38,0)) * sum_e - sum_d2)
              | / (4.0 * cast(big_w as double) * cast(big_w as double))"""
              .stripMargin).cast("double"), 6).as("modularity"))
        .orderBy("r_name")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q259_closeness" -> {
      val rounds = (1 to 24).map { r =>
        s"""d$r AS MATERIALIZED (
           |  SELECT p.src, p.node,
           |    CASE WHEN o.od IS NULL THEN p.d
           |         WHEN p.d IS NULL THEN o.od
           |         ELSE least(p.d, o.od) END AS d
           |  FROM d${r - 1} p LEFT JOIN (
           |    SELECT p2.src, e.b AS node, min(p2.d + 1) AS od
           |    FROM d${r - 1} p2 JOIN sym e ON p2.node = e.a
           |    WHERE p2.d IS NOT NULL GROUP BY 1, 2) o
           |  ON p.src = o.src AND p.node = o.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH ${Analytics89.sparseSql},
         |d0 AS (
         |  SELECT x.node AS src, y.node AS node,
         |    CASE WHEN x.node = y.node THEN CAST(0 AS BIGINT) END AS d
         |  FROM nodes x CROSS JOIN nodes y),
         |$rounds,
         |per AS (
         |  SELECT src, CAST(count(d) AS BIGINT) AS n_reach,
         |    max(d) AS ecc, sum(d) AS sum_d
         |  FROM d24 GROUP BY src)
         |SELECT n_name, n_reach, ecc,
         |  CASE WHEN sum_d > 0 THEN
         |    round(CAST(n_reach - 1 AS DOUBLE) / CAST(sum_d AS DOUBLE), 6)
         |  END AS closeness,
         |  (SELECT max(ecc) FROM per) AS diameter
         |FROM per JOIN nation ON src = n_nationkey
         |ORDER BY n_name""".stripMargin
    },

    "q260_modularity" ->
      """WITH raw AS (
        |  SELECT s_nationkey AS u, c_nationkey AS v
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN customer ON o_custkey = c_custkey
        |  WHERE s_nationkey <> c_nationkey),
        |pairs AS MATERIALIZED (
        |  SELECT a, b, w, na.n_regionkey AS ra, nb.n_regionkey AS rb
        |  FROM (SELECT least(u, v) AS a, greatest(u, v) AS b,
        |          CAST(count(*) AS BIGINT) AS w
        |        FROM raw GROUP BY 1, 2)
        |  JOIN nation na ON a = na.n_nationkey
        |  JOIN nation nb ON b = nb.n_nationkey),
        |intra AS (
        |  SELECT ra AS rk, CAST(sum(w) AS BIGINT) AS intra_w
        |  FROM pairs WHERE ra = rb GROUP BY 1),
        |deg AS (
        |  SELECT rk, CAST(sum(w) AS BIGINT) AS deg_w FROM (
        |    SELECT ra AS rk, w FROM pairs
        |    UNION ALL SELECT rb AS rk, w FROM pairs)
        |  GROUP BY 1),
        |per AS (
        |  SELECT d.rk, coalesce(i.intra_w, 0) AS intra_w, d.deg_w
        |  FROM deg d LEFT JOIN intra i ON d.rk = i.rk),
        |gtot AS (
        |  SELECT CAST(sum(intra_w) AS HUGEINT) AS sum_e,
        |    sum(CAST(deg_w AS HUGEINT) * deg_w) AS sum_d2,
        |    (SELECT CAST(sum(w) AS HUGEINT) FROM pairs) AS big_w
        |  FROM per)
        |SELECT r_name, intra_w, deg_w,
        |  round(CAST(4 * big_w * sum_e - sum_d2 AS DOUBLE)
        |    / (4.0 * CAST(big_w AS DOUBLE) * CAST(big_w AS DOUBLE)), 6)
        |    AS modularity
        |FROM per CROSS JOIN gtot
        |JOIN region ON rk = r_regionkey
        |ORDER BY r_name""".stripMargin,
  )
}
