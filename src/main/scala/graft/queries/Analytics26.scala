package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 29 (SURVEY.md §2.4):
  *
  *  - q147: ABC inventory classification — the Pareto workhorse of
  *    merchandising analytics. Parts rank by revenue descending via one
  *    GlobalPrefixSum scan (no single-task global window), and the
  *    80%/95% class boundaries are exact DECIMAL comparisons
  *    (cum·5 ≤ tot·4, cum·20 ≤ tot·19) — no float enters until the
  *    reported share, so boundary parts classify identically in both
  *    engines at any scale.
  *  - q148: Mann–Kendall trend test on monthly revenue. The pairwise
  *    concordance frame is months×months — bounded by the calendar
  *    (~80 rows here, ~1.2k at a century), never by the fact table —
  *    so the join broadcasts; the heavy work is the monthly rollup.
  *    S stays integer, Var(S) = n(n−1)(2n+5)/18 is exact in a double,
  *    and sqrt is IEEE-correctly-rounded in both engines, so the
  *    continuity-corrected Z hash-matches.
  */
object Analytics26 {
  import Tables.t

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q147_abc_class" -> ((spark, dir) => {
      val rev = t(spark, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(sum(dec(col("l_extendedprice")) *
            (lit(1) - dec(col("l_discount"))))
          .cast("decimal(18,4)").as("rev"))
      val ranked = graft.operators.GlobalPrefixSum.withRunningTotalBy(
        rev, struct((-col("rev")).as("s"), col("l_partkey").as("k")),
        "rev", "cum_raw")
      val cum = ranked
        .withColumn("cum", col("cum_raw").cast("decimal(28,4)"))
      val tot = rev.agg(sum(col("rev")).cast("decimal(28,4)").as("tot"))
      val five = lit(5).cast("decimal(2,0)")
      val four = lit(4).cast("decimal(2,0)")
      val twenty = lit(20).cast("decimal(2,0)")
      val nineteen = lit(19).cast("decimal(2,0)")
      cum.crossJoin(broadcast(tot))
        .withColumn("abc_class",
          when(col("cum") * five <= col("tot") * four, "A")
            .when(col("cum") * twenty <= col("tot") * nineteen, "B")
            .otherwise("C"))
        .groupBy(col("abc_class"), col("tot"))
        .agg(count(lit(1)).as("n_parts"),
          sum(col("rev")).cast("decimal(38,4)").as("class_rev"))
        .select(col("abc_class"), col("n_parts"),
          col("class_rev").cast("double").as("class_rev"),
          round(col("class_rev").cast("double") /
            col("tot").cast("double"), 6).as("share"))
        .orderBy("abc_class")
    }),

    "q148_mann_kendall" -> ((spark, dir) => {
      val monthly = t(spark, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("m"))
        .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("decimal(18,0)")).cast("decimal(38,0)").as("rev"))
      val mi = monthly.select(col("m").as("ma"), col("rev").as("ra"))
      val mj = monthly.select(col("m").as("mb"), col("rev").as("rb"))
      // month-pair frame: bounded by the calendar, not the data
      val pairs = mi.join(broadcast(mj), col("ma") < col("mb"))
      pairs.agg(
          count_if(col("rb") > col("ra")).as("n_up"),
          count_if(col("rb") < col("ra")).as("n_down"))
        .crossJoin(broadcast(
          monthly.agg(count(lit(1)).as("n_months"))))
        .select(col("n_months"),
          (col("n_up") - col("n_down")).as("s_stat"),
          round(
            when(col("n_up") === col("n_down"), lit(0.0))
              .otherwise(
                (when(col("n_up") > col("n_down"),
                  col("n_up") - col("n_down") - 1)
                  .otherwise(col("n_up") - col("n_down") + 1)
                  .cast("double")) /
                sqrt((col("n_months") * (col("n_months") - 1) *
                  (lit(2) * col("n_months") + 5)).cast("double") /
                  lit(18.0))), 6).as("z"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q147_abc_class" ->
      """WITH rev AS (
        |  SELECT l_partkey,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (1 - CAST(l_discount AS DECIMAL(18,2))))
        |      AS DECIMAL(18,4)) AS rev
        |  FROM lineitem GROUP BY 1),
        |c AS (
        |  SELECT rev,
        |    CAST(sum(rev) OVER (ORDER BY rev DESC, l_partkey)
        |      AS DECIMAL(28,4)) AS cum
        |  FROM rev),
        |tot AS (SELECT CAST(sum(rev) AS DECIMAL(28,4)) AS tot FROM rev),
        |cls AS (
        |  SELECT CASE
        |      WHEN cum * CAST(5 AS DECIMAL(2,0))
        |        <= tot * CAST(4 AS DECIMAL(2,0)) THEN 'A'
        |      WHEN cum * CAST(20 AS DECIMAL(2,0))
        |        <= tot * CAST(19 AS DECIMAL(2,0)) THEN 'B'
        |      ELSE 'C' END AS abc_class,
        |    rev, tot
        |  FROM c, tot)
        |SELECT abc_class, CAST(count(*) AS BIGINT) AS n_parts,
        |  CAST(CAST(sum(rev) AS DECIMAL(38,4)) AS DOUBLE) AS class_rev,
        |  round(CAST(CAST(sum(rev) AS DECIMAL(38,4)) AS DOUBLE)
        |    / CAST(tot AS DOUBLE), 6) AS share
        |FROM cls GROUP BY 1, tot ORDER BY 1""".stripMargin,

    "q148_mann_kendall" ->
      """WITH monthly AS (
        |  SELECT date_trunc('month', o_orderdate) AS m,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS rev
        |  FROM orders GROUP BY 1),
        |pairs AS (
        |  SELECT i.rev AS ra, j.rev AS rb
        |  FROM monthly i JOIN monthly j ON i.m < j.m),
        |cd AS (
        |  SELECT
        |    CAST(count(*) FILTER (WHERE rb > ra) AS BIGINT) AS n_up,
        |    CAST(count(*) FILTER (WHERE rb < ra) AS BIGINT) AS n_down
        |  FROM pairs),
        |nm AS (SELECT CAST(count(*) AS BIGINT) AS n_months FROM monthly)
        |SELECT n_months, n_up - n_down AS s_stat,
        |  round(CASE WHEN n_up = n_down THEN 0.0
        |    ELSE CAST(CASE WHEN n_up > n_down THEN n_up - n_down - 1
        |        ELSE n_up - n_down + 1 END AS DOUBLE)
        |      / sqrt(CAST(n_months * (n_months - 1)
        |        * (2 * n_months + 5) AS DOUBLE) / 18.0)
        |    END, 6) AS z
        |FROM cd, nm""".stripMargin,
  )
}
