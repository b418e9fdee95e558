package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 133 (SURVEY.md §2.4 statistics/econ):
  *
  *  - q301: Laspeyres / Paasche / Fisher price indices, 1995 → 1996,
  *    over parts traded in both years — the index-number workhorse of
  *    economic reporting. Per part-year unit price is rounded ONCE to
  *    DECIMAL(18,6); all p·q cross terms and their sums then stay
  *    exact decimals (no float-order drift), with the three index
  *    ratios as single double expressions. Shape: one fact-table
  *    aggregate to part-year grain, one self-join on part — both
  *    shuffle on part keys, map-side combinable.
  *
  *  - q302: Kruskal–Wallis rank test (one-way ANOVA on ranks) of
  *    order totals across the five order priorities, with the tie
  *    correction. Average ranks stay exact integers via the q294
  *    2·rank()+cnt−1 device; per-group R²/n terms are rounded once to
  *    DECIMAL(28,10) so the 5-term sum is exact; t³−t tie mass
  *    accumulates in DECIMAL(38,0).
  */
object Analytics114 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q301_price_index" -> ((spark, dir) => {
      val py = t(spark, dir, "lineitem")
        .filter(year(col("l_shipdate")).isin(1995, 1996))
        .groupBy(col("l_partkey").as("pk"),
          year(col("l_shipdate")).as("yr"))
        .agg(
          sum(expr("cast(round(l_extendedprice, 2) as decimal(18,2))"))
            .as("spend"),
          sum(expr("cast(round(l_quantity, 2) as decimal(18,2))"))
            .as("qty"))
        .select(col("pk"), col("yr"), col("qty"),
          expr("""cast(round(cast(spend as double) / cast(qty as double), 6)
                 |  as decimal(18,6))""".stripMargin).as("p"))
      val both = py.filter(col("yr") === 1995)
        .select(col("pk"), col("p").as("p0"), col("qty").as("q0"))
        .join(py.filter(col("yr") === 1996)
          .select(col("pk"), col("p").as("p1"), col("qty").as("q1")), "pk")
      val s = both.agg(count(lit(1)).as("n_parts"),
        sum(expr("cast(p1 * q0 as decimal(38,8))")).as("l_num"),
        sum(expr("cast(p0 * q0 as decimal(38,8))")).as("l_den"),
        sum(expr("cast(p1 * q1 as decimal(38,8))")).as("p_num"),
        sum(expr("cast(p0 * q1 as decimal(38,8))")).as("p_den"))
      s.select(col("n_parts"),
        round(expr("cast(l_num as double) / cast(l_den as double)"), 6)
          .as("laspeyres"),
        round(expr("cast(p_num as double) / cast(p_den as double)"), 6)
          .as("paasche"),
        round(expr(
          """sqrt((cast(l_num as double) / cast(l_den as double))
            |  * (cast(p_num as double) / cast(p_den as double)))"""
            .stripMargin), 6).as("fisher"))
    }),

    "q302_kruskal_wallis" -> ((spark, dir) => {
      val o = t(spark, dir, "orders")
        .select(col("o_orderpriority").as("grp"),
          expr("cast(round(o_totalprice, 2) as decimal(18,2))").as("v"))
      // doubled midrank per distinct value from a distributed prefix
      // scan (the q146 device): r2(v) = 2·count(<=v) − tc(v) + 1 —
      // algebraically identical to 2·rank + tiecount − 1, but with no
      // unpartitioned fact-grain window (one thread would sort every
      // order at scale)
      val byV = o.groupBy("v").agg(count(lit(1)).as("tc"))
      val midrank = graft.operators.GlobalPrefixSum
        .withRunningTotal(byV, "v", "tc", "cum")
        .select(col("v"),
          (lit(2L) * col("cum") - col("tc") + 1L).as("r2v"))
      val groups = o.groupBy("grp", "v").agg(count(lit(1)).as("njv"))
        .join(midrank, "v")
        .groupBy("grp").agg(
          sum(col("njv")).as("nj"), sum(col("njv") * col("r2v")).as("rj2"))
        // R_j = rj2/2 exactly; R_j²/n_j rounded ONCE per group so the
        // k-term sum is exact decimal
        .select(col("nj"), expr(
          """cast(round(cast(rj2 as double) * cast(rj2 as double)
            |  / (4.0d * nj), 10) as decimal(28,10))""".stripMargin)
          .as("term"))
        .agg(sum(col("nj")).as("n"), sum(col("term")).as("sterm"),
          count(lit(1)).as("k"))
      val ties = o.groupBy("v").agg(count(lit(1)).as("tc"))
        .agg(sum(expr(
          "cast(tc as decimal(38,0)) * tc * tc - tc")).as("tmass"))
      groups.crossJoin(ties).select(col("n"), (col("k") - 1).as("df"),
        round(expr(
          """12.0d * cast(sterm as double) / (n * (n + 1.0d))
            | - 3.0d * (n + 1.0d)""".stripMargin), 6).as("h"),
        round(expr(
          """(12.0d * cast(sterm as double) / (n * (n + 1.0d))
            |  - 3.0d * (n + 1.0d))
            | / (1.0d - cast(tmass as double)
            |     / (cast(n as double) * n * n - n))""".stripMargin), 6)
          .as("h_tie_corrected"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q301_price_index" -> """
      WITH py AS (
        SELECT l_partkey AS pk, year(l_shipdate) AS yr,
          sum(CAST(round(l_quantity, 2) AS DECIMAL(18,2))) AS qty,
          CAST(round(
            CAST(sum(CAST(round(l_extendedprice, 2) AS DECIMAL(18,2)))
              AS DOUBLE)
            / CAST(sum(CAST(round(l_quantity, 2) AS DECIMAL(18,2)))
              AS DOUBLE), 6) AS DECIMAL(18,6)) AS p
        FROM lineitem
        WHERE year(l_shipdate) IN (1995, 1996)
        GROUP BY 1, 2),
      pairs AS (
        SELECT a.pk, a.p AS p0, a.qty AS q0, b.p AS p1, b.qty AS q1
        FROM py a JOIN py b ON a.pk = b.pk
        WHERE a.yr = 1995 AND b.yr = 1996),
      s AS (
        SELECT CAST(count(*) AS BIGINT) AS n_parts,
          sum(CAST(p1 * q0 AS DECIMAL(38,8))) AS l_num,
          sum(CAST(p0 * q0 AS DECIMAL(38,8))) AS l_den,
          sum(CAST(p1 * q1 AS DECIMAL(38,8))) AS p_num,
          sum(CAST(p0 * q1 AS DECIMAL(38,8))) AS p_den
        FROM pairs)
      SELECT n_parts,
        round(CAST(l_num AS DOUBLE) / CAST(l_den AS DOUBLE), 6)
          AS laspeyres,
        round(CAST(p_num AS DOUBLE) / CAST(p_den AS DOUBLE), 6)
          AS paasche,
        round(sqrt((CAST(l_num AS DOUBLE) / CAST(l_den AS DOUBLE))
          * (CAST(p_num AS DOUBLE) / CAST(p_den AS DOUBLE))), 6)
          AS fisher
      FROM s""",

    "q302_kruskal_wallis" -> """
      WITH o AS (
        SELECT o_orderpriority AS grp,
          CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) AS v
        FROM orders),
      ranked AS (
        SELECT grp,
          2 * rank() OVER (ORDER BY v)
            + count(*) OVER (PARTITION BY v) - 1 AS r2
        FROM o),
      groups AS (
        SELECT CAST(sum(nj) AS BIGINT) AS n, sum(term) AS sterm,
          CAST(count(*) AS BIGINT) AS k
        FROM (
          SELECT CAST(count(*) AS BIGINT) AS nj,
            CAST(round(CAST(sum(r2) AS DOUBLE) * CAST(sum(r2) AS DOUBLE)
              / (4.0 * count(*)), 10) AS DECIMAL(28,10)) AS term
          FROM ranked GROUP BY grp) g),
      ties AS (
        SELECT sum(CAST(tc AS DECIMAL(38,0)) * tc * tc - tc) AS tmass
        FROM (SELECT CAST(count(*) AS BIGINT) AS tc FROM o GROUP BY v) x)
      SELECT n, k - 1 AS df,
        round(12.0 * CAST(sterm AS DOUBLE) / (n * (n + 1.0))
          - 3.0 * (n + 1.0), 6) AS h,
        round((12.0 * CAST(sterm AS DOUBLE) / (n * (n + 1.0))
            - 3.0 * (n + 1.0))
          / (1.0 - CAST(tmass AS DOUBLE)
              / (CAST(n AS DOUBLE) * n * n - n)), 6) AS h_tie_corrected
      FROM groups CROSS JOIN ties""",
  )
}
