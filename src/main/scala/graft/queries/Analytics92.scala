package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 107 (SURVEY.md §2.4):
  *
  *  - q261: exact betweenness centrality on the sparse nation graph —
  *    the broker-role complement of the centrality suite (degree q256,
  *    PageRank q64, HITS q257, closeness q259). Pipeline: all-pairs
  *    hop distances ([[graft.operators.BfsHops.allPairs]]), then
  *    shortest-path COUNTS σ(s,t) by layered DP (σ at distance d sums
  *    the σ of distance-(d−1) neighbors — exact integers, one bounded
  *    round per diameter step), then B(v) = Σ_{s<t} σ_sv·σ_vt/σ_st
  *    over triples where the distances compose. Every pair term is
  *    rounded to DECIMAL(18,9) BEFORE the sum, so the aggregation is
  *    order-free and replays exactly; the oracle unrolls both the
  *    distance matrix and 24 σ layers as generated CTEs. Scale stance:
  *    everything after the one fact-table condense is nodes²-bounded
  *    frames and a nodes³ composition join — the same condensed-graph
  *    posture as q67's triangle join.
  */
object Analytics92 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Critical path (longest weighted path) over the key-ordered trade
    // DAG — the scheduling primitive: orient every canonical nation
    // pair low→high key (acyclic by construction), weight = trade
    // count, then max-relaxation DP lp(t) = max(lp(t), lp(s) + w) to a
    // fixpoint (≤ |V| rounds on any DAG; same iterative shape as
    // BfsHops with max/+ in place of min/+1, all-integer so the 24
    // unrolled oracle rounds replay exactly). Output: per-node longest
    // inbound path weight, the global critical-path weight, and
    // whether the node is that path's sink.
    "q262_critical_path" -> ((spark, dir) => {
      val dag = t(spark, dir, "lineitem")
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
        .localCheckpoint(true)
      // The condensed DAG is NATION-DOMAIN-bounded (<= 25 nodes /
      // 300 edges at ANY corpus scale), so the fixpoint loop belongs on
      // the driver — the same constant-size-collect discipline as the
      // IVF centroid seeds. The previous synchronous Spark-round DP ran
      // ~90 jobs of 25-row frames (measured 242 jobs / 5.5s at sf0.1,
      // >90% scheduling overhead); only the fact-table condense above
      // is data-sized and it stays distributed. Jacobi rounds preserved
      // exactly (the fixpoint is unique on a DAG either way).
      val edges = dag.select(col("a").cast("int"), col("b").cast("int"),
          col("w")).collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
      val nodeIds = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
      val lp = scala.collection.mutable.Map(
        nodeIds.map(_ -> 0L): _*)
      var changed = true
      var i = 0
      while (changed && i < 30) {
        val offer = scala.collection.mutable.Map[Int, Long]()
        edges.foreach { case (a, b, w) =>
          val o = lp(a) + w
          if (o > offer.getOrElse(b, Long.MinValue)) offer(b) = o
        }
        changed = false
        offer.foreach { case (b, mx) =>
          if (mx > lp(b)) { lp(b) = mx; changed = true }
        }
        i += 1
      }
      if (changed)
        throw new IllegalStateException("critical path did not converge")
      val critW = lp.values.max
      import spark.implicits._
      val lpDf = lp.toSeq.toDF("node", "lp")
      lpDf
        .join(broadcast(t(spark, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
          col("node") === col("n_nationkey"))
        .select(col("n_name"), col("lp").as("longest_w"),
          lit(critW).as("crit_w"),
          (col("lp") === lit(critW)).as("is_crit_sink"))
        .orderBy("n_name")
    }),

    "q261_betweenness" -> ((spark, dir) => {
      // Same constant-bound argument as q262: the sparse nation graph
      // is ≤ 25 nodes at any corpus scale, so after the distributed
      // fact-table condense the all-pairs BFS, the σ layers, and the
      // nodes³ composition run on the driver over the collected edge
      // list (previously ~10 Spark rounds of ≤625-row frames plus a
      // triple self-join — measured 2.5 s of mostly scheduling at
      // sf0.1). Arithmetic mirrors the old expressions exactly: integer
      // σ sums, per-term round-to-9dp then DECIMAL(18,9) (exact,
      // order-free sums), final round to 6dp.
      val edges = Analytics89.sparseNationEdges(spark, dir)
        .select(col("a").cast("int"), col("b").cast("int")).collect()
        .map(r => (r.getInt(0), r.getInt(1)))
      val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
      val adj = nodes.map(x => x ->
        (edges.collect { case (a, b) if a == x => b } ++
          edges.collect { case (a, b) if b == x => a }).toArray).toMap
      // all-pairs BFS hop distances over the undirected graph
      val dist = scala.collection.mutable.Map[(Int, Int), Int]()
      for (s <- nodes) {
        dist((s, s)) = 0
        var frontier = List(s)
        var d = 0
        while (frontier.nonEmpty) {
          d += 1
          frontier = frontier.flatMap(adj(_))
            .filter(t2 => !dist.contains((s, t2))).distinct
          frontier.foreach(t2 => dist((s, t2)) = d)
        }
      }
      // σ(s,t): layered DP — layer-d σ sums the layer-(d−1) σ of t's
      // neighbors (exact integers)
      val sigma = scala.collection.mutable.Map[(Int, Int), Long]()
      nodes.foreach(s => sigma((s, s)) = 1L)
      val diam = if (dist.isEmpty) 0 else dist.values.max
      for (d <- 1 to diam; s <- nodes; t2 <- nodes
           if dist.get((s, t2)).contains(d)) {
        var acc = 0L
        adj(t2).foreach { y =>
          if (dist.get((s, y)).contains(d - 1)) acc += sigma((s, y))
        }
        sigma((s, t2)) = acc
      }
      // compose s→v→t where the hop counts add up; each unordered
      // {s, t} pair counted once via s < t; per-term round-then-DECIMAL
      // exactly as the former expression chain rendered it
      def term9(x: Double): BigDecimal = BigDecimal(BigDecimal(x)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      val per = scala.collection.mutable.Map[Int, BigDecimal]()
      for (((s, v), dsv) <- dist; ((v2, t2), dvt) <- dist
           if v2 == v && s < t2 && v != s && v != t2 &&
             dist.get((s, t2)).contains(dsv + dvt)) {
        val x = (sigma((s, v)) * sigma((v, t2))).toDouble /
          sigma((s, t2)).toDouble
        per(v) = per.getOrElse(v, BigDecimal(0)) + term9(x)
      }
      def r6(x: Double): Double =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      import spark.implicits._
      val bDf = nodes.toSeq
        .map(v => (v, r6(per.get(v).map(_.toDouble).getOrElse(0.0))))
        .toDF("v", "betweenness")
      bDf.join(broadcast(t(spark, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
          col("v") === col("n_nationkey"))
        .select(col("n_name"), col("betweenness"))
        .orderBy("n_name")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q262_critical_path" -> {
      val rounds = (1 to 24).map { r =>
        s"""l$r AS MATERIALIZED (
           |  SELECT n.node, greatest(n.lp, coalesce(o.mx, 0)) AS lp
           |  FROM l${r - 1} n LEFT JOIN (
           |    SELECT e.b AS node, max(l.lp + e.w) AS mx
           |    FROM l${r - 1} l JOIN dag e ON l.node = e.a
           |    GROUP BY 1) o
           |  ON n.node = o.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH raw AS (
         |  SELECT s_nationkey AS u, c_nationkey AS v
         |  FROM lineitem
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN customer ON o_custkey = c_custkey
         |  WHERE s_nationkey <> c_nationkey),
         |dag AS MATERIALIZED (
         |  SELECT least(u, v) AS a, greatest(u, v) AS b,
         |    CAST(count(*) AS BIGINT) AS w
         |  FROM raw GROUP BY 1, 2),
         |dnodes AS MATERIALIZED (
         |  SELECT DISTINCT a AS node FROM dag
         |  UNION SELECT DISTINCT b FROM dag),
         |l0 AS (SELECT node, CAST(0 AS BIGINT) AS lp FROM dnodes),
         |$rounds
         |SELECT n_name, lp AS longest_w,
         |  (SELECT max(lp) FROM l24) AS crit_w,
         |  lp = (SELECT max(lp) FROM l24) AS is_crit_sink
         |FROM l24 JOIN nation ON node = n_nationkey
         |ORDER BY n_name""".stripMargin
    },

    "q261_betweenness" -> {
      val distRounds = (1 to 24).map { r =>
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
      val sigLayers = (1 to 24).map { r =>
        s"""lay$r AS MATERIALIZED (
           |  SELECT s.src, e.b AS node, CAST(sum(s.sigma) AS BIGINT)
           |    AS sigma
           |  FROM lay${r - 1} s JOIN sym e ON s.node = e.a
           |  JOIN dm m ON m.src = s.src AND m.node = e.b AND m.d = $r
           |  GROUP BY 1, 2)""".stripMargin
      }.mkString(",\n")
      val sigUnion = (0 to 24)
        .map(r => s"SELECT src, node, sigma FROM lay$r")
        .mkString("\n  UNION ALL ")
      s"""WITH ${Analytics89.sparseSql},
         |d0 AS (
         |  SELECT x.node AS src, y.node AS node,
         |    CASE WHEN x.node = y.node THEN CAST(0 AS BIGINT) END AS d
         |  FROM nodes x CROSS JOIN nodes y),
         |$distRounds,
         |dm AS MATERIALIZED (
         |  SELECT src, node, d FROM d24 WHERE d IS NOT NULL),
         |lay0 AS (SELECT node AS src, node, CAST(1 AS BIGINT) AS sigma
         |         FROM nodes),
         |$sigLayers,
         |sd AS MATERIALIZED (
         |  SELECT s.src, s.node, s.sigma, m.d
         |  FROM ($sigUnion) s
         |  JOIN dm m ON m.src = s.src AND m.node = s.node),
         |terms AS (
         |  SELECT sv.node AS v,
         |    CAST(round(CAST(sv.sigma * vt.sigma AS DOUBLE)
         |      / CAST(st.sigma AS DOUBLE), 9) AS DECIMAL(18,9)) AS term
         |  FROM sd sv
         |  JOIN sd vt ON sv.node = vt.src
         |  JOIN sd st ON sv.src = st.src AND vt.node = st.node
         |  WHERE sv.src < vt.node AND sv.node <> sv.src
         |    AND sv.node <> vt.node AND sv.d + vt.d = st.d),
         |per AS (SELECT v, sum(term) AS b FROM terms GROUP BY v)
         |SELECT n_name,
         |  round(CAST(coalesce(b, 0) AS DOUBLE), 6) AS betweenness
         |FROM nodes nd
         |LEFT JOIN per ON nd.node = per.v
         |JOIN nation ON nd.node = n_nationkey
         |ORDER BY n_name""".stripMargin
    },
  )
}
