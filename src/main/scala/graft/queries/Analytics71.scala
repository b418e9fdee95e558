package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 78 (SURVEY.md §2.4):
  *
  *  - q230: cumulative distinct via first-occurrence prefix sums — the
  *    exact sliding COUNT DISTINCT trick that avoids any quadratic
  *    state: a part counts toward a supplier's cumulative SKU breadth
  *    only in the month it FIRST ships (row_number = 1 over the
  *    (supplier, part) history), so "distinct parts to date" is a
  *    plain running sum of first-occurrence counts — two windows, both
  *    partitioned by supplier, zero distinct-state blowup. The same
  *    identity HLL-based rollups approximate; here it is exact.
  */
object Analytics71 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q230_cumulative_distinct" -> ((spark, dir) => {
      val li = t(spark, dir, "lineitem")
        .filter(col("l_suppkey") <= 40)
        .select(col("l_suppkey"), col("l_partkey"),
          (year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
            .as("mk"),
          col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      val wFirst = Window.partitionBy("l_suppkey", "l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
      val firsts = li
        .withColumn("rn", row_number().over(wFirst))
        .filter(col("rn") === 1)
        .groupBy("l_suppkey", "mk")
        .agg(count(lit(1)).as("n_new_parts"))
      val months = li.groupBy("l_suppkey", "mk")
        .agg(count(lit(1)).as("n_shipments"))
      val wCum = Window.partitionBy("l_suppkey").orderBy("mk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      months.join(firsts, Seq("l_suppkey", "mk"), "left")
        .withColumn("n_new_parts",
          coalesce(col("n_new_parts"), lit(0L)))
        .withColumn("distinct_parts_to_date",
          sum(col("n_new_parts")).over(wCum))
        .orderBy("l_suppkey", "mk")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q230_cumulative_distinct" ->
      """WITH li AS (
        |  SELECT l_suppkey, l_partkey,
        |    CAST(year(l_shipdate) * 100 + month(l_shipdate) AS INTEGER)
        |      AS mk,
        |    l_shipdate, l_orderkey, l_linenumber
        |  FROM lineitem WHERE l_suppkey <= 40),
        |firsts AS (
        |  SELECT l_suppkey, mk, CAST(count(*) AS BIGINT) AS n_new_parts
        |  FROM (
        |    SELECT l_suppkey, mk, row_number() OVER (
        |      PARTITION BY l_suppkey, l_partkey
        |      ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn
        |    FROM li)
        |  WHERE rn = 1 GROUP BY 1, 2),
        |months AS (
        |  SELECT l_suppkey, mk, CAST(count(*) AS BIGINT) AS n_shipments
        |  FROM li GROUP BY 1, 2)
        |SELECT m.l_suppkey, m.mk, m.n_shipments,
        |  coalesce(f.n_new_parts, 0) AS n_new_parts,
        |  CAST(sum(coalesce(f.n_new_parts, 0)) OVER (
        |    PARTITION BY m.l_suppkey ORDER BY m.mk
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS distinct_parts_to_date
        |FROM months m LEFT JOIN firsts f
        |  ON m.l_suppkey = f.l_suppkey AND m.mk = f.mk
        |ORDER BY m.l_suppkey, m.mk""".stripMargin,
  )
}
