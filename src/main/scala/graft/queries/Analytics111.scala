package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 128 (SURVEY.md §2.4 statistics):
  *
  *  - q294: Spearman rank correlation per return flag — the engine's
  *    Pearson suite (q21/q202) only sees linear association; Spearman
  *    is the standard robust alternative. Average-rank ties are kept
  *    EXACT in integers: avg_rank = rank() + (cnt_eq−1)/2, so
  *    2·avg_rank = 2·rank() + cnt_eq − 1 is a BIGINT and every moment
  *    (Σr, Σr², Σr·s) accumulates exactly in DECIMAL(38,0); floats
  *    appear only in the final closed-form rho. Scale shape: ranking
  *    is two sorts within each flag partition (Spark's window sort),
  *    the honest cost of exact ranks; moments are map-side
  *    combinable.
  *
  *  - q295: Cohen's kappa — inter-annotator agreement between two
  *    deterministic "raters" bucketing documents by length in chars
  *    vs length in words: the labeling-QC primitive of a training-data
  *    pipeline (is rater agreement better than chance?). All counts
  *    integer; po/pe/kappa are one double expression each at the end.
  *    Category-marginal products go through DECIMAL(38,0) so 1e12-row
  *    marginals cannot overflow.
  */
object Analytics111 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q294_spearman" -> ((spark, dir) => {
      val li = t(spark, dir, "lineitem")
        .select(col("l_returnflag").as("flag"),
          col("l_quantity").as("q"), col("l_extendedprice").as("p"))
      val ranked = li
        .withColumn("rq2",
          lit(2L) * rank().over(Window.partitionBy("flag").orderBy("q"))
            + count(lit(1)).over(Window.partitionBy("flag", "q")) - 1L)
        .withColumn("rp2",
          lit(2L) * rank().over(Window.partitionBy("flag").orderBy("p"))
            + count(lit(1)).over(Window.partitionBy("flag", "p")) - 1L)
      val m = ranked.groupBy("flag").agg(
        count(lit(1)).as("n"),
        sum(col("rq2")).as("sx"), sum(col("rp2")).as("sy"),
        sum(expr("cast(rq2 * rq2 as decimal(38,0))")).as("sxx"),
        sum(expr("cast(rp2 * rp2 as decimal(38,0))")).as("syy"),
        sum(expr("cast(rq2 * rp2 as decimal(38,0))")).as("sxy"))
      m.select(col("flag"), col("n"),
          round(expr(
            """(cast(n as double) * cast(sxy as double)
              |  - cast(sx as double) * cast(sy as double))
              | / sqrt((cast(n as double) * cast(sxx as double)
              |    - cast(sx as double) * cast(sx as double))
              |   * (cast(n as double) * cast(syy as double)
              |    - cast(sy as double) * cast(sy as double)))"""
              .stripMargin), 6).as("rho"))
        .orderBy("flag")
    }),

    "q295_cohen_kappa" -> ((spark, dir) => {
      val base = t(spark, dir, "documents")
        .filter(col("text").isNotNull && col("n_chars").isNotNull)
        .select(
          when(col("n_chars") < 200, 0).when(col("n_chars") < 380, 1)
            .otherwise(2).as("ra"),
          when(size(split(col("text"), " ")) < 35, 0)
            .when(size(split(col("text"), " ")) < 70, 1)
            .otherwise(2).as("rb"))
      val tot = base.agg(count(lit(1)).as("n"),
        count_if(col("ra") === col("rb")).as("diag"))
      val marg = base.groupBy("ra").agg(count(lit(1)).as("cr"))
        .join(base.groupBy("rb").agg(count(lit(1)).as("cc")),
          col("ra") === col("rb"))
        .agg(sum(expr("cast(cr * cc as decimal(38,0))")).as("sumrc"))
      tot.crossJoin(marg).select(col("n"),
          round(expr("diag / cast(n as double)"), 6).as("po"),
          round(expr("cast(sumrc as double) / (cast(n as double) * n)"), 6)
            .as("pe"),
          round(expr(
            """(diag / cast(n as double)
              |  - cast(sumrc as double) / (cast(n as double) * n))
              | / (1.0d - cast(sumrc as double) / (cast(n as double) * n))"""
              .stripMargin), 6).as("kappa"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q294_spearman" -> """
      WITH ranked AS (
        SELECT l_returnflag AS flag,
          2 * rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
            + count(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1
            AS rq2,
          2 * rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
            + count(*) OVER (PARTITION BY l_returnflag, l_extendedprice) - 1
            AS rp2
        FROM lineitem),
      m AS (
        SELECT flag, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(rq2) AS BIGINT) AS sx, CAST(sum(rp2) AS BIGINT) AS sy,
          sum(CAST(rq2 * rq2 AS DECIMAL(38,0))) AS sxx,
          sum(CAST(rp2 * rp2 AS DECIMAL(38,0))) AS syy,
          sum(CAST(rq2 * rp2 AS DECIMAL(38,0))) AS sxy
        FROM ranked GROUP BY flag)
      SELECT flag, n,
        round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS rho
      FROM m ORDER BY flag""",

    "q295_cohen_kappa" -> """
      WITH base AS (
        SELECT
          CASE WHEN n_chars < 200 THEN 0 WHEN n_chars < 380 THEN 1
            ELSE 2 END AS ra,
          CASE WHEN len(string_split(text, ' ')) < 35 THEN 0
            WHEN len(string_split(text, ' ')) < 70 THEN 1
            ELSE 2 END AS rb
        FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL),
      tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(count(*) FILTER (WHERE ra = rb) AS BIGINT) AS diag
        FROM base),
      marg AS (
        SELECT sum(CAST(cr * cc AS DECIMAL(38,0))) AS sumrc
        FROM (SELECT ra, CAST(count(*) AS BIGINT) AS cr FROM base GROUP BY ra) r
        JOIN (SELECT rb, CAST(count(*) AS BIGINT) AS cc FROM base GROUP BY rb) c
          ON r.ra = c.rb)
      SELECT n,
        round(diag / CAST(n AS DOUBLE), 6) AS po,
        round(CAST(sumrc AS DOUBLE) / (CAST(n AS DOUBLE) * n), 6) AS pe,
        round((diag / CAST(n AS DOUBLE)
            - CAST(sumrc AS DOUBLE) / (CAST(n AS DOUBLE) * n))
          / (1.0 - CAST(sumrc AS DOUBLE) / (CAST(n AS DOUBLE) * n)), 6)
          AS kappa
      FROM tot CROSS JOIN marg""",
  )
}
