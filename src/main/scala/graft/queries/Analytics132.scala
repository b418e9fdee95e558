package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 159 (SURVEY.md §2.4 statistics):
  *
  *  - q337: Cochran–Mantel–Haenszel test of segment × urgency
  *    association STRATIFIED by order year, plus the Mantel–Haenszel
  *    pooled odds ratio — the confounding-adjusted 2×2 that q95/q267
  *    (unstratified chi²) cannot express. Per-stratum expectations,
  *    variances, and OR terms are rationals rounded ONCE into
  *    DECIMAL(28,10); the year-bounded sums are exact, the statistic
  *    one double. No continuity correction (documented).
  *
  *  - q338: direct standardization — each segment's urgency rate
  *    re-weighted to the OVERALL month-of-year order mix, the
  *    epidemiology device for "compare rates as if both groups had
  *    the same seasonal exposure". Weights and cell rates round once
  *    to DECIMAL(18,9); weighted sums exact.
  */
object Analytics132 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q337_cmh" -> ((spark, dir) => {
      val seg = t(spark, dir, "customer")
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(col("c_custkey"), col("c_mktsegment").as("seg"))
      val cells = t(spark, dir, "orders")
        .join(seg, col("o_custkey") === col("c_custkey"))
        .groupBy(year(col("o_orderdate")).as("yr")).agg(
          count_if(col("seg") === "BUILDING"
            && col("o_orderpriority") === "1-URGENT").as("a"),
          count_if(col("seg") === "BUILDING"
            && col("o_orderpriority") =!= "1-URGENT").as("b"),
          count_if(col("seg") === "MACHINERY"
            && col("o_orderpriority") === "1-URGENT").as("c"),
          count_if(col("seg") === "MACHINERY"
            && col("o_orderpriority") =!= "1-URGENT").as("d"))
      val terms = cells.select(col("yr"), col("a"),
        expr("""cast(round((a + b) * (a + c)
               |  / cast(a + b + c + d as double), 10)
               |  as decimal(28,10))""".stripMargin).as("ea"),
        expr("""cast(round((a + b) * (c + d) * cast(a + c as double)
               |  * (b + d)
               |  / (cast(a + b + c + d as double) * (a + b + c + d)
               |     * (a + b + c + d - 1)), 10)
               |  as decimal(28,10))""".stripMargin).as("va"),
        expr("""cast(round(a * d / cast(a + b + c + d as double), 10)
               |  as decimal(28,10))""".stripMargin).as("adn"),
        expr("""cast(round(b * cast(c as double)
               |  / (a + b + c + d), 10)
               |  as decimal(28,10))""".stripMargin).as("bcn"))
      terms.agg(count(lit(1)).as("n_strata"), sum(col("a")).as("sa"),
          sum(col("ea")).as("sea"), sum(col("va")).as("sva"),
          sum(col("adn")).as("sadn"), sum(col("bcn")).as("sbcn"))
        .selectExpr("n_strata",
          """round((sa - cast(sea as double)) * (sa - cast(sea as double))
            | / cast(sva as double), 6) as cmh_chi2""".stripMargin,
          "1 as df",
          """round(cast(sadn as double) / cast(sbcn as double), 6)
            | as mh_odds_ratio""".stripMargin)
    }),

    "q338_direct_standardization" -> ((spark, dir) => {
      val o = t(spark, dir, "orders")
        .join(broadcast(t(spark, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment").as("seg"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("seg"), month(col("o_orderdate")).as("mo"),
          (col("o_orderpriority") === "1-URGENT").cast("long").as("u"))
      val w = o.groupBy("mo").agg(count(lit(1)).as("nm"))
        .crossJoin(broadcast(o.agg(count(lit(1)).as("nt"))))
        .select(col("mo"), expr(
          """cast(round(nm / cast(nt as double), 9)
            |  as decimal(18,9))""".stripMargin).as("w"))
      val r = o.groupBy("seg", "mo").agg(count(lit(1)).as("n"),
          sum(col("u")).as("x"))
        .select(col("seg"), col("mo"), col("n"), col("x"), expr(
          """cast(round(x / cast(n as double), 9)
            |  as decimal(18,9))""".stripMargin).as("r"))
      val std = r.join(broadcast(w), "mo")
        .groupBy("seg").agg(
          sum(col("n")).as("n"), sum(col("x")).as("x"),
          sum(expr("cast(w as decimal(28,9)) * r")).as("srw"))
      std.selectExpr("seg", "n",
          "round(x / cast(n as double), 6) as crude_rate",
          "round(cast(srw as double), 6) as standardized_rate")
        .orderBy("seg")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q337_cmh" -> """
      WITH cells AS (
        SELECT year(o_orderdate) AS yr,
          CAST(count(*) FILTER (WHERE c_mktsegment = 'BUILDING'
            AND o_orderpriority = '1-URGENT') AS BIGINT) AS a,
          CAST(count(*) FILTER (WHERE c_mktsegment = 'BUILDING'
            AND o_orderpriority <> '1-URGENT') AS BIGINT) AS b,
          CAST(count(*) FILTER (WHERE c_mktsegment = 'MACHINERY'
            AND o_orderpriority = '1-URGENT') AS BIGINT) AS c,
          CAST(count(*) FILTER (WHERE c_mktsegment = 'MACHINERY'
            AND o_orderpriority <> '1-URGENT') AS BIGINT) AS d
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
        GROUP BY 1),
      terms AS (
        SELECT yr, a,
          CAST(round((a + b) * (a + c)
            / CAST(a + b + c + d AS DOUBLE), 10) AS DECIMAL(28,10)) AS ea,
          CAST(round((a + b) * (c + d) * CAST(a + c AS DOUBLE) * (b + d)
            / (CAST(a + b + c + d AS DOUBLE) * (a + b + c + d)
               * (a + b + c + d - 1)), 10) AS DECIMAL(28,10)) AS va,
          CAST(round(a * d / CAST(a + b + c + d AS DOUBLE), 10)
            AS DECIMAL(28,10)) AS adn,
          CAST(round(b * CAST(c AS DOUBLE) / (a + b + c + d), 10)
            AS DECIMAL(28,10)) AS bcn
        FROM cells)
      SELECT CAST(count(*) AS BIGINT) AS n_strata,
        round((sum(a) - CAST(sum(ea) AS DOUBLE))
          * (sum(a) - CAST(sum(ea) AS DOUBLE))
          / CAST(sum(va) AS DOUBLE), 6) AS cmh_chi2,
        1 AS df,
        round(CAST(sum(adn) AS DOUBLE) / CAST(sum(bcn) AS DOUBLE), 6)
          AS mh_odds_ratio
      FROM terms""",

    "q338_direct_standardization" -> """
      WITH o AS (
        SELECT c_mktsegment AS seg, month(o_orderdate) AS mo,
          CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS u
        FROM orders JOIN customer ON o_custkey = c_custkey),
      w AS (
        SELECT mo, CAST(round(nm / CAST(nt AS DOUBLE), 9)
          AS DECIMAL(18,9)) AS w
        FROM (SELECT mo, CAST(count(*) AS BIGINT) AS nm FROM o
              GROUP BY mo) x
        CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS nt FROM o) t),
      r AS (
        SELECT seg, mo, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(u) AS BIGINT) AS x,
          CAST(round(sum(u) / CAST(count(*) AS DOUBLE), 9)
            AS DECIMAL(18,9)) AS r
        FROM o GROUP BY seg, mo),
      std AS (
        SELECT seg, CAST(sum(n) AS BIGINT) AS n,
          CAST(sum(x) AS BIGINT) AS x,
          sum(CAST(w AS DECIMAL(28,9)) * r) AS srw
        FROM r JOIN w ON r.mo = w.mo
        GROUP BY seg)
      SELECT seg, n,
        round(x / CAST(n AS DOUBLE), 6) AS crude_rate,
        round(CAST(srw AS DOUBLE), 6) AS standardized_rate
      FROM std ORDER BY seg""",
  )
}
