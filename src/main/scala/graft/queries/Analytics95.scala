package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 112 (SURVEY.md §2.4):
  *
  *  - q267: chi-squared independence test — the categorical drift /
  *    association audit: is order status independent of order priority?
  *    One pass builds the contingency cells, margins and total (all
  *    map-side-combinable counts); each cell's (obs·N − rs·cs)²/(rs·cs·N)
  *    term is computed in IEEE doubles over exactly-representable
  *    integers (identical in any engine), rounded to DECIMAL(38,9)
  *    BEFORE the order-free sum — the q261 discipline. Outputs χ²,
  *    degrees of freedom, N, and Cramér's V.
  *  - q268: strongly connected components of the DIRECTED sparse
  *    nation trade graph (supplier-nation → customer-nation edges kept
  *    when above the average directed pair count — exact integer
  *    cross-multiplication, no float threshold). Reachability via
  *    path-doubling transitive closure ([[graft.operators
  *    .TransitiveClosure]]: O(log diameter) self-join rounds on the
  *    sparse |V|²-bounded pair frame), SCC id = min mutually-reachable
  *    node, plus component size. The oracle unrolls 5 doubling rounds
  *    as MATERIALIZED CTEs (2^5 = 32 ≥ any 25-node path).
  */
object Analytics95 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q267_chi_squared" -> ((spark, dir) => {
      val o = t(spark, dir, "orders")
        .select(col("o_orderstatus").as("s"), col("o_orderpriority").as("p"))
      val cells = o.groupBy("s", "p").agg(count(lit(1)).as("obs"))
      val rowm = o.groupBy("s").agg(count(lit(1)).as("rs"))
      val colm = o.groupBy("p").agg(count(lit(1)).as("cs"))
      val tot = o.agg(count(lit(1)).as("n"))
      // Doubles over exact integers: each product/difference is one
      // correctly-rounded IEEE op, so both engines compute bit-identical
      // terms; the round→DECIMAL before the sum makes the order free.
      val terms = cells
        .join(broadcast(rowm), "s")
        .join(broadcast(colm), "p")
        .crossJoin(broadcast(tot))
        .withColumn("nm",
          col("obs").cast("double") * col("n")
            - col("rs").cast("double") * col("cs"))
        .withColumn("term", expr(
          "cast(round(nm * nm / (cast(rs as double) * cs * n), 9) " +
            "as decimal(38,9))"))
      terms.agg(
          sum(col("term")).as("chi2sum"),
          countDistinct(col("s")).as("r"),
          countDistinct(col("p")).as("c"),
          max(col("n")).as("n"))
        .select(
          round(col("chi2sum").cast("double"), 6).as("chi2"),
          ((col("r") - 1) * (col("c") - 1)).as("dof"),
          col("n"),
          round(sqrt(col("chi2sum").cast("double")
            / (col("n").cast("double")
              * least(col("r") - 1, col("c") - 1))), 6).as("cramers_v"))
    }),

    "q268_scc" -> ((spark, dir) => {
      val raw = t(spark, dir, "lineitem")
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
      val pairs = raw.groupBy("u", "v").agg(count(lit(1)).as("cnt"))
      val ptot = pairs.agg(count(lit(1)).as("n_pairs"),
        sum(col("cnt")).as("cnt_total"))
      // DIRECTED above-average filter — (u,v) and (v,u) survive or drop
      // independently, so the graph is genuinely asymmetric.
      val sparse = pairs.crossJoin(broadcast(ptot))
        .filter(col("cnt") * col("n_pairs") >= col("cnt_total"))
        .select("u", "v")
      val labels = graft.operators.TransitiveClosure
        .sccLabels(sparse, "u", "v")
      val sizes = labels.groupBy("scc_id")
        .agg(count(lit(1)).as("scc_size"))
      labels
        .join(broadcast(sizes), "scc_id")
        .join(broadcast(t(spark, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
          col("node") === col("n_nationkey"))
        .select(col("n_name"), col("scc_id"), col("scc_size"))
        .orderBy("n_name")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q267_chi_squared" -> """
      WITH o AS (
        SELECT o_orderstatus AS s, o_orderpriority AS p FROM orders),
      cells AS (
        SELECT s, p, CAST(count(*) AS BIGINT) AS obs FROM o GROUP BY 1, 2),
      rowm AS (SELECT s, CAST(count(*) AS BIGINT) AS rs FROM o GROUP BY 1),
      colm AS (SELECT p, CAST(count(*) AS BIGINT) AS cs FROM o GROUP BY 1),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM o),
      terms AS (
        SELECT s, p, n,
          CAST(round(
            (CAST(obs AS DOUBLE) * n - CAST(rs AS DOUBLE) * cs)
              * (CAST(obs AS DOUBLE) * n - CAST(rs AS DOUBLE) * cs)
              / (CAST(rs AS DOUBLE) * cs * n), 9) AS DECIMAL(38,9)) AS term
        FROM cells JOIN rowm USING (s) JOIN colm USING (p), tot),
      a AS (
        SELECT sum(term) AS chi2sum,
          CAST(count(DISTINCT s) AS BIGINT) AS r,
          CAST(count(DISTINCT p) AS BIGINT) AS c,
          max(n) AS n
        FROM terms)
      SELECT round(CAST(chi2sum AS DOUBLE), 6) AS chi2,
        (r - 1) * (c - 1) AS dof, n,
        round(sqrt(CAST(chi2sum AS DOUBLE)
          / (CAST(n AS DOUBLE) * least(r - 1, c - 1))), 6) AS cramers_v
      FROM a""",

    "q268_scc" -> {
      val rounds = (1 to 5).map { r =>
        s"""r$r AS MATERIALIZED (
           |  SELECT src, dst FROM r${r - 1}
           |  UNION
           |  SELECT p.src, q.dst
           |  FROM r${r - 1} p JOIN r${r - 1} q ON p.dst = q.src)"""
          .stripMargin
      }.mkString(",\n")
      s"""
      WITH raw AS (
        SELECT s_nationkey AS u, c_nationkey AS v
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        WHERE s_nationkey <> c_nationkey),
      pairs AS (
        SELECT u, v, CAST(count(*) AS BIGINT) AS cnt FROM raw GROUP BY 1, 2),
      ptot AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
                      CAST(sum(cnt) AS BIGINT) AS cnt_total FROM pairs),
      sparse AS MATERIALIZED (
        SELECT u, v FROM pairs, ptot WHERE cnt * n_pairs >= cnt_total),
      nodes AS MATERIALIZED (
        SELECT DISTINCT n FROM (
          SELECT u AS n FROM sparse UNION ALL SELECT v AS n FROM sparse)),
      r0 AS MATERIALIZED (
        SELECT u AS src, v AS dst FROM sparse
        UNION SELECT n AS src, n AS dst FROM nodes),
      $rounds,
      labels AS (
        SELECT f.src AS node, min(f.dst) AS scc_id
        FROM r5 f JOIN r5 b ON f.src = b.dst AND f.dst = b.src
        GROUP BY f.src),
      sizes AS (
        SELECT scc_id, CAST(count(*) AS BIGINT) AS scc_size
        FROM labels GROUP BY scc_id)
      SELECT n_name, scc_id, scc_size
      FROM labels
      JOIN sizes USING (scc_id)
      JOIN nation ON node = n_nationkey
      ORDER BY n_name"""
    },
  )
}
