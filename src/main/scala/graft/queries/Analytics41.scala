package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 46 (SURVEY.md §2.4):
  *
  *  - q167: pricing-policy what-if — the finance simulation: cap every
  *    discount at 5% and report, per ship year, booked revenue vs
  *    policy revenue and the recovered margin. One pass over the fact
  *    table; both scenarios are exact DECIMAL columns of the same scan
  *    (no second scan for the counterfactual), and the delta is a
  *    DECIMAL subtraction — floats appear only in the reported uplift
  *    share.
  */
object Analytics41 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q167_discount_cap_whatif" -> ((spark, dir) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(18,2)")
      val capped = least(dec(col("l_discount")),
        expr("CAST(0.05 AS DECIMAL(18,2))"))
      t(spark, dir, "lineitem")
        .groupBy(year(col("l_shipdate")).cast("int").as("ship_year"))
        .agg(
          count(lit(1)).as("n_lines"),
          sum((dec(col("l_extendedprice")) *
            (lit(1) - dec(col("l_discount")))).cast("decimal(38,4)"))
            .cast("decimal(38,4)").as("booked_rev"),
          sum((dec(col("l_extendedprice")) * (lit(1) - capped))
            .cast("decimal(38,4)")).cast("decimal(38,4)")
            .as("policy_rev"))
        .select(col("ship_year"), col("n_lines"),
          col("booked_rev").cast("double").as("booked_rev"),
          col("policy_rev").cast("double").as("policy_rev"),
          (col("policy_rev") - col("booked_rev")).cast("double")
            .as("uplift"),
          round((col("policy_rev") - col("booked_rev")).cast("double") /
            col("booked_rev").cast("double"), 6).as("uplift_share"))
        .orderBy("ship_year")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q167_discount_cap_whatif" ->
      """SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
        |  CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l_discount AS DECIMAL(18,2)))
        |    AS DECIMAL(38,4))) AS DOUBLE) AS booked_rev,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - least(CAST(l_discount AS DECIMAL(18,2)),
        |        CAST(0.05 AS DECIMAL(18,2))))
        |    AS DECIMAL(38,4))) AS DOUBLE) AS policy_rev,
        |  CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - least(CAST(l_discount AS DECIMAL(18,2)),
        |        CAST(0.05 AS DECIMAL(18,2))))
        |    AS DECIMAL(38,4))) AS DECIMAL(38,4))
        |    - CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l_discount AS DECIMAL(18,2)))
        |    AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS DOUBLE)
        |    AS uplift,
        |  round(CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - least(CAST(l_discount AS DECIMAL(18,2)),
        |        CAST(0.05 AS DECIMAL(18,2))))
        |    AS DECIMAL(38,4))) AS DECIMAL(38,4))
        |    - CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l_discount AS DECIMAL(18,2)))
        |    AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS DOUBLE)
        |    / CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l_discount AS DECIMAL(18,2)))
        |    AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS DOUBLE), 6)
        |    AS uplift_share
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
