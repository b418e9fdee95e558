package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 59 (SURVEY.md §2.4) — engine-semantics
  * pins. These queries exist to hash-lock the subtle SQL corners where
  * engines historically disagree, so any regression (or Spark upgrade)
  * that shifts them fails the oracle loudly:
  *
  *  - q197: NULL semantics — NOT IN over a list containing NULL
  *    (selects nothing), null-safe equality (<=> / IS NOT DISTINCT
  *    FROM) vs plain = on NULLIF'd keys, NULL-excluding count vs
  *    count(*), and NULLS FIRST ordering. Each case reduces to an
  *    exact count from the same orders scan.
  *  - q198: empty-input aggregates — SUM/MIN/AVG over an empty filter
  *    return NULL while COUNT returns 0, and an empty GROUP BY
  *    produces zero rows vs the global aggregate's exactly-one row.
  */
object Analytics53 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q197_null_semantics" -> ((spark, dir) => {
      val o = t(spark, dir, "orders").select(col("o_orderkey"),
        col("o_orderstatus"), nullif(col("o_orderstatus"), lit("O"))
          .as("st_null"))
      // every count comes from ONE conditional-aggregation pass;
      // count_if's NULL-is-false matches the WHERE semantics exactly
      val counts = o.agg(
        count_if(!col("o_orderstatus").isin("F", null))
          .as("cnt_not_in_with_null"),
        count_if(col("st_null") === col("st_null"))
          .as("cnt_plain_eq_self"),
        count_if(col("st_null") <=> col("st_null"))
          .as("cnt_null_safe_eq_self"),
        count(col("st_null")).as("cnt_col_excludes_null"),
        count(lit(1)).as("cnt_star"))
      val firstKey = o.orderBy(col("st_null").asc_nulls_first,
          col("o_orderkey"))
        .select(col("o_orderkey").as("first_key_nulls_first"))
        .limit(1)
      counts.crossJoin(broadcast(firstKey))
        .select(expr(
          "stack(6, " +
            "'cnt_col_excludes_null', cnt_col_excludes_null, " +
            "'cnt_not_in_with_null', cnt_not_in_with_null, " +
            "'cnt_null_safe_eq_self', cnt_null_safe_eq_self, " +
            "'cnt_plain_eq_self', cnt_plain_eq_self, " +
            "'cnt_star', cnt_star, " +
            "'first_key_nulls_first', first_key_nulls_first) " +
            "AS (semantic_case, value)"))
        .orderBy("semantic_case")
    }),

    "q198_empty_aggregates" -> ((spark, dir) => {
      val none = t(spark, dir, "orders").filter(col("o_orderkey") < 0)
      val globalRow = none.agg(
        count(lit(1)).as("cnt"),
        sum(col("o_totalprice")).as("sum_v"),
        min(col("o_totalprice")).as("min_v"),
        avg(col("o_totalprice")).as("avg_v"))
      val grouped = none.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("c"))
      globalRow.select(
        col("cnt").as("count_empty"),
        col("sum_v").isNull.as("sum_is_null"),
        col("min_v").isNull.as("min_is_null"),
        col("avg_v").isNull.as("avg_is_null"))
        .crossJoin(broadcast(
          grouped.agg(count(lit(1)).as("grouped_rows"))))
        .select(col("count_empty"), col("sum_is_null"),
          col("min_is_null"), col("avg_is_null"), col("grouped_rows"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q197_null_semantics" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    nullif(o_orderstatus, 'O') AS st_null
        |  FROM orders)
        |SELECT 'cnt_col_excludes_null' AS semantic_case,
        |  CAST(count(st_null) AS BIGINT) AS value FROM o
        |UNION ALL
        |SELECT 'cnt_not_in_with_null',
        |  CAST(count(*) AS BIGINT) FROM o
        |WHERE o_orderstatus NOT IN ('F', NULL)
        |UNION ALL
        |SELECT 'cnt_null_safe_eq_self', CAST(count(*) AS BIGINT) FROM o
        |WHERE st_null IS NOT DISTINCT FROM st_null
        |UNION ALL
        |SELECT 'cnt_plain_eq_self', CAST(count(*) AS BIGINT) FROM o
        |WHERE st_null = st_null
        |UNION ALL
        |SELECT 'cnt_star', CAST(count(*) AS BIGINT) FROM o
        |UNION ALL
        |SELECT 'first_key_nulls_first', CAST((
        |  SELECT o_orderkey FROM o
        |  ORDER BY st_null ASC NULLS FIRST, o_orderkey LIMIT 1)
        |  AS BIGINT)
        |ORDER BY semantic_case""".stripMargin,

    "q198_empty_aggregates" ->
      """WITH none AS (
        |  SELECT * FROM orders WHERE o_orderkey < 0),
        |g AS (
        |  SELECT CAST(count(*) AS BIGINT) AS cnt,
        |    sum(o_totalprice) AS sum_v, min(o_totalprice) AS min_v,
        |    avg(o_totalprice) AS avg_v
        |  FROM none),
        |grp AS (
        |  SELECT CAST(count(*) AS BIGINT) AS grouped_rows FROM (
        |    SELECT o_orderstatus, count(*) AS c
        |    FROM none GROUP BY 1))
        |SELECT cnt AS count_empty, sum_v IS NULL AS sum_is_null,
        |  min_v IS NULL AS min_is_null, avg_v IS NULL AS avg_is_null,
        |  grouped_rows
        |FROM g CROSS JOIN grp""".stripMargin,
  )
}
