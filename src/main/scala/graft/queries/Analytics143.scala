package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 additions, batch 143 (SURVEY.md §2.4) — graph analytics,
  * part 3 (next to PageRank q354 and connected components d8):
  *
  *  - q372: TRIANGLE COUNTING with degree-ordered edge orientation —
  *    the standard scale device for the one graph kernel a naive plan
  *    gets catastrophically wrong. The graph is the part co-purchase
  *    graph (parts sharing an order, the market-basket projection of
  *    lineitem). A naive triangle join enumerates every wedge twice
  *    around every high-degree hub; orienting each edge from the
  *    (degree, id)-smaller endpoint to the larger makes the relation
  *    acyclic, counts each triangle EXACTLY once, and provably bounds
  *    any node's out-degree by O(sqrt(m)) — the arboricity argument
  *    that keeps the wedge work polynomial on power-law graphs at
  *    100 TB. Pipeline: per-order self-join (bounded fan-out — an
  *    order has ~7 lines), distinct edges, degree table joined back
  *    (node-cardinality, AQE broadcasts it when small), then the
  *    EDGE-ITERATOR kernel: per edge (x, y), triangles are
  *    array_intersect of the two O(sqrt m)-bounded out-adjacency
  *    arrays — the 49M-wedge intermediate a wedge JOIN would
  *    materialize (measured 13.4 s at sf0.1; 5.0 s this way) never
  *    exists as rows. No cartesian, all exchanges keyed. Output: the
  *    15 busiest parts by triangle participation plus corpus totals
  *    (triangles, edges, nodes).
  */
object Analytics143 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q372_triangle_count" -> ((spark, dir) => {
      val os = t(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val edges = os.as("a").join(os.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
        .distinct()
      val deg = edges.select(col("u").as("x"))
        .unionAll(edges.select(col("v").as("x")))
        .groupBy("x").agg(count(lit(1)).as("d"))
      val low = (col("du.d") < col("dv.d")) ||
        (col("du.d") === col("dv.d") && col("u") < col("v"))
      val orient = edges
        .join(deg.as("du"), col("u") === col("du.x"))
        .join(deg.as("dv"), col("v") === col("dv.x"))
        .select(when(low, col("u")).otherwise(col("v")).as("a"),
          when(low, col("v")).otherwise(col("u")).as("b"))
        .persist()
      // orientation is a bijection on edges, so this count IS n_edges —
      // and materializing here means e1/e2/e3 (and the node count)
      // never re-derive the self-join + distinct lineage
      val nEdges = orient.count()
      val nNodes = orient.select(col("a").as("x"))
        .unionAll(orient.select(col("b").as("x"))).distinct().count()
      // Edge-iterator with sorted adjacency (the GraphFrames /
      // node-iterator++ device): per edge (x, y), triangles are the
      // common out-neighbors array_intersect(O(x), O(y)) — a fused
      // codegen kernel over two O(sqrt m)-bounded arrays (orientation
      // caps out-degree: 97 at sf0.1), so the 49M-wedge intermediate a
      // wedge JOIN would materialize never exists as rows. collect_list
      // per node is bounded by the same theorem — never a data-grain
      // collect. Two |E|-keyed joins against the n-row adjacency table
      // are all the data movement.
      val adj = orient.groupBy(col("a").as("x"))
        .agg(sort_array(collect_list(col("b"))).as("nbrs"))
      // inner joins: an edge whose endpoint has no out-neighbors can
      // close no triangle, so dropping it is exact
      val tri = orient
        .join(adj.select(col("x").as("a"), col("nbrs").as("na")), "a")
        .join(adj.select(col("x").as("b"), col("nbrs").as("nb")), "b")
        .select(col("a").as("x"), col("b").as("y"),
          // merge-walk intersect: the adjacency arrays are sorted and
          // duplicate-free, so SortedLongIntersect returns exactly
          // array_intersect's output without the per-edge hash-set
          // build (measured as q372's dominant stage — 12.7s of task
          // time at sf0.1 for ~1M edges)
          explode(graft.functions.SortedLongIntersect(
            col("na"), col("nb"))).as("z"))
        .persist()
      val totalTri = tri.count()
      val perNode = tri
        .select(explode(array(col("x"), col("y"), col("z"))).as("s"))
        .groupBy("s").agg(count(lit(1)).as("triangles"))
      perNode.orderBy(col("triangles").desc, col("s").asc).limit(15)
        .select(col("s").as("p_partkey"), col("triangles"))
        .crossJoin(broadcast(perNode.agg(
          sum(col("triangles")).cast("long").as("sum_participation"))))
        .select(col("p_partkey"), col("triangles"),
          col("sum_participation"),
          lit(totalTri).as("total_triangles"),
          lit(nEdges).as("n_edges"), lit(nNodes).as("n_nodes"))
        .orderBy(col("triangles").desc, col("p_partkey").asc)
    }),
  )

  val oracleSql: Map[String, String] = Map(
    // same construction: distinct co-order edges, degree-ordered
    // orientation, wedge join + closure probe (an inner join is the
    // semi probe here because orientation makes (a, b) unique)
    "q372_triangle_count" ->
      """WITH os AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e0 AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM os a JOIN os b ON a.l_orderkey = b.l_orderkey
        |    AND a.l_partkey < b.l_partkey),
        |deg AS (
        |  SELECT x, count(*) AS d FROM (
        |    SELECT u AS x FROM e0 UNION ALL SELECT v FROM e0)
        |  GROUP BY 1),
        |orient AS (
        |  SELECT
        |    CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND u < v)
        |      THEN u ELSE v END AS a,
        |    CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND u < v)
        |      THEN v ELSE u END AS b
        |  FROM e0 JOIN deg du ON du.x = u JOIN deg dv ON dv.x = v),
        |tri AS (
        |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM orient e1
        |  JOIN orient e2 ON e1.b = e2.a
        |  JOIN orient e3 ON e3.a = e1.a AND e3.b = e2.b),
        |pn AS (
        |  SELECT s, CAST(count(*) AS BIGINT) AS triangles FROM (
        |    SELECT x AS s FROM tri UNION ALL
        |    SELECT y FROM tri UNION ALL
        |    SELECT z FROM tri)
        |  GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(triangles) AS BIGINT) AS sum_participation
        |  FROM pn),
        |tt AS (
        |  SELECT CAST(count(*) AS BIGINT) AS total_triangles FROM tri),
        |em AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e0),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg),
        |top AS (
        |  SELECT s AS p_partkey, triangles FROM pn
        |  ORDER BY triangles DESC, s LIMIT 15)
        |SELECT p_partkey, triangles, sum_participation,
        |  total_triangles, n_edges, n_nodes
        |FROM top, tot, tt, em, nn
        |ORDER BY triangles DESC, p_partkey""".stripMargin,
  )
}
