package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-5 additions, batch 50 (SURVEY.md §2.4):
  *
  *  - q189: recursive-CTE hierarchy walk — Spark 4.1's native WITH
  *    RECURSIVE (UnionLoop execution) against DuckDB's, on the
  *    deterministic digit-truncation part taxonomy (parent =
  *    ⌊key/10⌋, depth ≤ 4). Each part climbs to its single-digit
  *    root; the rollup reports subtree sizes and depth profiles per
  *    root. The recursion's per-step frame is corpus-sized but the
  *    step count is logarithmic in the key space — the plan a
  *    hierarchy walk should have. The SQL text is IDENTICAL in both
  *    engines (floor-division spelled portably), so this pins the
  *    recursive-CTE semantics themselves.
  */
object Analytics49 {
  import Tables.t

  private val RecursiveSql =
    """WITH RECURSIVE anc AS (
      |  SELECT p_partkey AS pk, p_partkey AS node, 0 AS depth
      |  FROM part_v
      |  UNION ALL
      |  SELECT pk, CAST(floor(node / 10) AS BIGINT) AS node,
      |    depth + 1 AS depth
      |  FROM anc WHERE node >= 10),
      |tips AS (
      |  SELECT pk, node AS root, depth
      |  FROM anc WHERE node < 10)
      |SELECT root, CAST(count(*) AS BIGINT) AS n_parts,
      |  CAST(max(depth) AS BIGINT) AS max_depth,
      |  CAST(sum(depth) AS BIGINT) AS total_depth
      |FROM tips GROUP BY root ORDER BY root""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q189_recursive_hierarchy" -> ((spark, dir) => {
      t(spark, dir, "part").createOrReplaceTempView("part_v")
      spark.sql(RecursiveSql)
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q189_recursive_hierarchy" ->
      RecursiveSql.replace("part_v", "part"),
  )
}
