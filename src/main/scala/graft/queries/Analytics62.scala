package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 69 (SURVEY.md §2.4):
  *
  *  - q215: NOT IN with NULLs — the classic three-valued-logic trap,
  *    pinned through the SQL layer so Catalyst's NULL-AWARE anti join
  *    (a distinct physical operator from the left_anti that NOT EXISTS
  *    plans to) is actually exercised: one NULL in the subquery makes
  *    `NOT IN` reject EVERY row, while NOT EXISTS is unaffected. The
  *    query emits both counts side by side over the same subquery,
  *    with the NULL injected via a UNION ALL.
  *  - q216: window null-ordering pin — Spark's default ASC sort inside
  *    a window frame is NULLS FIRST; DuckDB's default is NULLS LAST,
  *    so the oracle must (and does) spell NULLS FIRST. Ranks each
  *    customer's orders by a deliberately-nullable key (urgent
  *    priority folded to NULL) and keeps the rank-1 row: if either
  *    engine drifted on null placement, every customer with an urgent
  *    order flips.
  */
object Analytics62 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q215_not_in_null" -> ((spark, dir) => {
      t(spark, dir, "customer").createOrReplaceTempView("cust_nin")
      t(spark, dir, "orders").createOrReplaceTempView("orders_nin")
      spark.sql(
        """SELECT
          |  (SELECT count(*) FROM cust_nin
          |   WHERE c_custkey NOT IN
          |     (SELECT o_custkey FROM orders_nin WHERE o_totalprice > 300000
          |      UNION ALL SELECT CAST(NULL AS BIGINT))) AS n_not_in_with_null,
          |  (SELECT count(*) FROM cust_nin c
          |   WHERE NOT EXISTS (SELECT 1 FROM orders_nin o
          |                     WHERE (o.o_custkey = c.c_custkey
          |                        OR o.o_custkey IS NULL)
          |                       AND o.o_totalprice > 300000))
          |    AS n_not_exists_nullsafe,
          |  (SELECT count(*) FROM cust_nin
          |   WHERE c_custkey NOT IN (SELECT o_custkey FROM orders_nin
          |                           WHERE o_totalprice > 300000))
          |    AS n_not_in_clean""".stripMargin)
    }),

    "q216_null_window_order" -> ((spark, dir) => {
      val o = t(spark, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          when(col("o_orderpriority") === "1-URGENT", lit(null))
            .otherwise(col("o_orderpriority")).as("p"))
      // Spark's bare asc IS nulls-first — the pinned contract
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("p").asc, col("o_orderkey").asc)
      o.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"), col("p"),
          col("p").isNull.as("picked_null_first"))
        .orderBy("o_custkey")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q215_not_in_null" ->
      """SELECT
        |  (SELECT count(*) FROM customer
        |   WHERE c_custkey NOT IN
        |     (SELECT o_custkey FROM orders WHERE o_totalprice > 300000
        |      UNION ALL SELECT CAST(NULL AS BIGINT))) AS n_not_in_with_null,
        |  (SELECT count(*) FROM customer c
        |   WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                     WHERE (o.o_custkey = c.c_custkey
        |                        OR o.o_custkey IS NULL)
        |                       AND o.o_totalprice > 300000))
        |    AS n_not_exists_nullsafe,
        |  (SELECT count(*) FROM customer
        |   WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
        |                           WHERE o_totalprice > 300000))
        |    AS n_not_in_clean""".stripMargin,

    "q216_null_window_order" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey,
        |    CASE WHEN o_orderpriority = '1-URGENT' THEN NULL
        |      ELSE o_orderpriority END AS p
        |  FROM orders),
        |r AS (
        |  SELECT o_custkey, o_orderkey, p,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY p ASC NULLS FIRST, o_orderkey ASC) AS rn
        |  FROM o)
        |SELECT o_custkey, o_orderkey, p, p IS NULL AS picked_null_first
        |FROM r WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin,
  )
}
