package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 additions, batch 138 (SURVEY.md §2.4):
  *
  *  - q347: erasure-cascade audit — the GDPR right-to-be-forgotten
  *    dry run: a deterministic deletion list (md5-keyed customers)
  *    must cascade through every dependent table; per nation, how many
  *    customers and orders go, what fraction of revenue leaves with
  *    them, and — the referential hazard — how many orders would be
  *    ORPHANED if the cascade stopped at the customer table. One
  *    broadcast of the deletion flags, two aggregations.
  *  - q348: retention-tiering plan — the storage-lifecycle advisor:
  *    events older than 7/21 days (relative to the corpus max)
  *    downsample to hourly/daily grain; the plan reports rows before
  *    and after per tier and the compression each tier buys. Exact
  *    counts from calendar-grain aggregation — the rollup a 100 TB
  *    event store runs nightly.
  */
object Analytics138 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q347_erasure_cascade" -> ((spark, dir) => {
      val cust = t(spark, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"),
          (graft.functions.Md5Pack(concat(lit("erase_"),
            col("c_custkey").cast("string"))) % 97 === 0).as("erased"))
      val orders = t(spark, dir, "orders")
        .select(col("o_custkey"),
          expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
            .as("w"))
      val joined = orders.join(broadcast(cust),
        col("o_custkey") === col("c_custkey"))
      joined.groupBy("c_nationkey")
        .agg(
          countDistinct(when(col("erased"), col("c_custkey")))
            .as("customers_erased"),
          count_if(col("erased")).as("orders_cascaded"),
          sum(when(col("erased"), col("w")).otherwise(0L))
            .as("revenue_erased_cents"),
          sum(col("w")).as("revenue_total_cents"))
        .select(col("c_nationkey"), col("customers_erased"),
          col("orders_cascaded"), col("revenue_erased_cents"),
          (col("revenue_erased_cents").cast("double")
            / col("revenue_total_cents").cast("double"))
            .as("revenue_share_lost"),
          // if only `customer` were purged, every cascaded order would
          // dangle: the orphan count IS the cascade size
          col("orders_cascaded").as("orphans_if_no_cascade"))
        .orderBy("c_nationkey")
    }),

    "q348_retention_tiering" -> ((spark, dir) => {
      val e = Tables.events(spark, dir)
        .select(col("event_id"), col("ts"), col("event_type"))
      val mx = e.agg(max(col("ts")).as("mx"))
      val tiered = e.crossJoin(broadcast(mx))
        .withColumn("age_days", datediff(to_date(col("mx")),
          to_date(col("ts"))))
        .withColumn("tier",
          when(col("age_days") <= 7, "raw")
            .when(col("age_days") <= 21, "hourly")
            .otherwise("daily"))
      val kept = tiered.groupBy("tier")
        .agg(count(lit(1)).as("rows_before"),
          countDistinct(
            when(col("tier") === "raw", col("event_id").cast("string"))
              .when(col("tier") === "hourly",
                concat(date_trunc("hour", col("ts")).cast("string"),
                  lit("|"), col("event_type")))
              .otherwise(concat(to_date(col("ts")).cast("string"),
                lit("|"), col("event_type"))))
            .as("rows_after"))
      kept.select(col("tier"), col("rows_before"), col("rows_after"),
          (col("rows_before").cast("double")
            / col("rows_after").cast("double")).as("compression"))
        .orderBy("tier")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q347_erasure_cascade" -> {
      val h = Tables.duckMd5Pack("concat('erase_', CAST(c_custkey AS VARCHAR))")
      s"""WITH cust AS (
         |  SELECT c_custkey, c_nationkey, ($h) % 97 = 0 AS erased
         |  FROM customer),
         |j AS (
         |  SELECT c_nationkey, c_custkey, erased,
         |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |      AS w
         |  FROM orders JOIN cust ON o_custkey = c_custkey)
         |SELECT c_nationkey,
         |  CAST(count(DISTINCT CASE WHEN erased THEN c_custkey END)
         |    AS BIGINT) AS customers_erased,
         |  CAST(count(*) FILTER (erased) AS BIGINT) AS orders_cascaded,
         |  CAST(sum(CASE WHEN erased THEN w ELSE 0 END) AS BIGINT)
         |    AS revenue_erased_cents,
         |  CAST(sum(CASE WHEN erased THEN w ELSE 0 END) AS DOUBLE)
         |    / CAST(sum(w) AS DOUBLE) AS revenue_share_lost,
         |  CAST(count(*) FILTER (erased) AS BIGINT)
         |    AS orphans_if_no_cascade
         |FROM j GROUP BY 1 ORDER BY c_nationkey""".stripMargin
    },

    "q348_retention_tiering" ->
      """WITH mx AS (SELECT max(ts) AS mx FROM events),
        |tiered AS (
        |  SELECT event_id, ts, event_type,
        |    CASE
        |      WHEN date_diff('day', CAST(ts AS DATE), CAST(mx AS DATE))
        |        <= 7 THEN 'raw'
        |      WHEN date_diff('day', CAST(ts AS DATE), CAST(mx AS DATE))
        |        <= 21 THEN 'hourly'
        |      ELSE 'daily' END AS tier
        |  FROM events CROSS JOIN mx)
        |SELECT tier, CAST(count(*) AS BIGINT) AS rows_before,
        |  CAST(count(DISTINCT CASE
        |    WHEN tier = 'raw' THEN CAST(event_id AS VARCHAR)
        |    WHEN tier = 'hourly' THEN
        |      CAST(date_trunc('hour', ts) AS VARCHAR) || '|' || event_type
        |    ELSE CAST(CAST(ts AS DATE) AS VARCHAR) || '|' || event_type
        |    END) AS BIGINT) AS rows_after,
        |  CAST(count(*) AS DOUBLE) / CAST(count(DISTINCT CASE
        |    WHEN tier = 'raw' THEN CAST(event_id AS VARCHAR)
        |    WHEN tier = 'hourly' THEN
        |      CAST(date_trunc('hour', ts) AS VARCHAR) || '|' || event_type
        |    ELSE CAST(CAST(ts AS DATE) AS VARCHAR) || '|' || event_type
        |    END) AS DOUBLE) AS compression
        |FROM tiered GROUP BY tier ORDER BY tier""".stripMargin,
  )
}
