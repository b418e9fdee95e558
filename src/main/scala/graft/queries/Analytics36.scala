package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 40 (SURVEY.md §2.4):
  *
  *  - q162: hierarchical share-of-parent — the drill-down ratio report:
  *    each nation's revenue share within its region AND the region's
  *    share of the world, in one result. Region subtotals come from a
  *    groupBy + broadcast join back (bounded by the dim — never a
  *    window over the region partition, which would sort fact-scale
  *    data through 5 tasks); the world total broadcasts as one row.
  *    Exact cents everywhere, two float divisions per output row.
  */
object Analytics36 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q162_share_of_parent" -> ((spark, dir) => {
      val dims = t(spark, dir, "nation")
        .join(t(spark, dir, "region"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"), col("r_name"))
      val perNation = t(spark, dir, "orders")
        .join(t(spark, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(dims), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("decimal(18,0)")).cast("decimal(38,0)").as("nation_cents"))
      val perRegion = perNation.groupBy(col("r_name").as("r2"))
        .agg(sum(col("nation_cents")).cast("decimal(38,0)")
          .as("region_cents"))
      val world = perNation.agg(sum(col("nation_cents"))
        .cast("decimal(38,0)").as("world_cents"))
      perNation
        .join(broadcast(perRegion), col("r_name") === col("r2"))
        .crossJoin(broadcast(world))
        .select(col("r_name"), col("n_name"),
          col("nation_cents").cast("long").as("nation_cents"),
          round(col("nation_cents").cast("double") /
            col("region_cents").cast("double"), 6).as("share_in_region"),
          round(col("region_cents").cast("double") /
            col("world_cents").cast("double"), 6).as("region_share"))
        .orderBy("r_name", "n_name")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q162_share_of_parent" ->
      """WITH per_nation AS (
        |  SELECT r_name, n_name,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS nation_cents
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY 1, 2),
        |per_region AS (
        |  SELECT r_name, CAST(sum(nation_cents) AS DECIMAL(38,0))
        |    AS region_cents
        |  FROM per_nation GROUP BY 1),
        |world AS (
        |  SELECT CAST(sum(nation_cents) AS DECIMAL(38,0)) AS world_cents
        |  FROM per_nation)
        |SELECT pn.r_name, n_name,
        |  CAST(nation_cents AS BIGINT) AS nation_cents,
        |  round(CAST(nation_cents AS DOUBLE)
        |    / CAST(region_cents AS DOUBLE), 6) AS share_in_region,
        |  round(CAST(region_cents AS DOUBLE)
        |    / CAST(world_cents AS DOUBLE), 6) AS region_share
        |FROM per_nation pn
        |JOIN per_region pr ON pn.r_name = pr.r_name
        |CROSS JOIN world
        |ORDER BY 1, 2""".stripMargin,
  )
}
