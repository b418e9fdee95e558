package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 93 (SURVEY.md §2.4):
  *
  *  - q248: hot/warm/cold tiering advisor — the storage-lifecycle
  *    classifier: per part, recency (days since last shipment,
  *    against the corpus max date) and frequency (lifetime shipment
  *    count) map into HOT (shipped within 90 days), WARM (within a
  *    year), COLD otherwise — with per-tier counts and the volume
  *    share each tier would carry. Exactly the scan/agg shape a
  *    table-format's compaction policy derives its tiering from. One
  *    fact groupBy, reference date as a one-row broadcast, all
  *    integer day arithmetic.
  */
object Analytics84 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q248_storage_tiering" -> ((spark, dir) => {
      val perPart = t(spark, dir, "lineitem")
        .groupBy("l_partkey")
        .agg(max(to_date(col("l_shipdate"))).as("last_ship"),
          count(lit(1)).as("n_ship"),
          sum(col("l_quantity").cast("long")).as("qty"))
      val ref = perPart.agg(max(col("last_ship")).as("ref_day"))
      perPart.crossJoin(broadcast(ref))
        .withColumn("age_days", datediff(col("ref_day"), col("last_ship")))
        .withColumn("tier",
          when(col("age_days") <= 90, "hot")
            .when(col("age_days") <= 365, "warm")
            .otherwise("cold"))
        .groupBy("tier")
        .agg(count(lit(1)).as("n_parts"),
          sum(col("n_ship")).as("n_shipments"),
          sum(col("qty")).as("total_qty"),
          min(col("age_days")).as("min_age"),
          max(col("age_days")).as("max_age"))
        .orderBy("tier")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q248_storage_tiering" ->
      """WITH per_part AS (
        |  SELECT l_partkey,
        |    max(CAST(l_shipdate AS DATE)) AS last_ship,
        |    CAST(count(*) AS BIGINT) AS n_ship,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |  FROM lineitem GROUP BY 1),
        |ref AS (SELECT max(last_ship) AS ref_day FROM per_part),
        |aged AS (
        |  SELECT *, CAST(ref_day - last_ship AS INTEGER) AS age_days
        |  FROM per_part CROSS JOIN ref),
        |tiered AS (
        |  SELECT *,
        |    CASE WHEN age_days <= 90 THEN 'hot'
        |      WHEN age_days <= 365 THEN 'warm'
        |      ELSE 'cold' END AS tier
        |  FROM aged)
        |SELECT tier, CAST(count(*) AS BIGINT) AS n_parts,
        |  CAST(sum(n_ship) AS BIGINT) AS n_shipments,
        |  CAST(sum(qty) AS BIGINT) AS total_qty,
        |  CAST(min(age_days) AS INTEGER) AS min_age,
        |  CAST(max(age_days) AS INTEGER) AS max_age
        |FROM tiered GROUP BY 1 ORDER BY tier""".stripMargin,
  )
}
