package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 44 (SURVEY.md §2.4):
  *
  *  - q166: GDPR erasure-impact audit — the compliance dry-run before a
  *    right-to-be-forgotten batch: for a deterministic set of data
  *    subjects, how many rows cascade out of each table (customer →
  *    orders → line items), and what share of each table that erasure
  *    touches. Cascades flow through LEFT SEMI joins (the erasure
  *    frontier stays distributed — no id collects), counts are exact,
  *    and the one float per row is the reported share.
  */
object Analytics40 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q166_gdpr_erasure_audit" -> ((spark, dir) => {
      val subjects = t(spark, dir, "customer")
        .filter(col("c_custkey") % 1000 === 7)
        .select(col("c_custkey"))
      val ordersHit = t(spark, dir, "orders")
        .join(subjects, col("o_custkey") === col("c_custkey"), "left_semi")
      val lineitemHit = t(spark, dir, "lineitem")
        .join(ordersHit.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_semi")
      def impact(table: String, tier: Int, hit: DataFrame,
          total: DataFrame) =
        hit.agg(count(lit(1)).as("n_erased"))
          .crossJoin(broadcast(total.agg(count(lit(1)).as("n_total"))))
          .select(lit(tier).as("tier"), lit(table).as("table_name"),
            col("n_erased"), col("n_total"),
            round(col("n_erased").cast("double") /
              col("n_total").cast("double"), 6).as("erased_share"))
      impact("customer", 0, subjects, t(spark, dir, "customer"))
        .unionByName(impact("orders", 1, ordersHit,
          t(spark, dir, "orders")))
        .unionByName(impact("lineitem", 2, lineitemHit,
          t(spark, dir, "lineitem")))
        .orderBy("tier")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q166_gdpr_erasure_audit" ->
      """WITH subjects AS (
        |  SELECT c_custkey FROM customer WHERE c_custkey % 1000 = 7),
        |orders_hit AS (
        |  SELECT o_orderkey FROM orders
        |  WHERE o_custkey IN (SELECT c_custkey FROM subjects)),
        |lineitem_hit AS (
        |  SELECT 1 AS x FROM lineitem
        |  WHERE l_orderkey IN (SELECT o_orderkey FROM orders_hit)),
        |rows_out AS (
        |  SELECT 0 AS tier, 'customer' AS table_name,
        |    (SELECT CAST(count(*) AS BIGINT) FROM subjects) AS n_erased,
        |    (SELECT CAST(count(*) AS BIGINT) FROM customer) AS n_total
        |  UNION ALL
        |  SELECT 1, 'orders',
        |    (SELECT CAST(count(*) AS BIGINT) FROM orders_hit),
        |    (SELECT CAST(count(*) AS BIGINT) FROM orders)
        |  UNION ALL
        |  SELECT 2, 'lineitem',
        |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem_hit),
        |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem))
        |SELECT CAST(tier AS INT) AS tier, table_name, n_erased, n_total,
        |  round(CAST(n_erased AS DOUBLE) / CAST(n_total AS DOUBLE), 6)
        |    AS erased_share
        |FROM rows_out ORDER BY tier""".stripMargin,
  )
}
