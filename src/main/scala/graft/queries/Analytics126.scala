package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 149 (SURVEY.md §2.4 — completes the
  * nonparametric family: q72 KS, q152 CvM, q271 Mann–Whitney, q302
  * Kruskal–Wallis):
  *
  *  - q327: Wilcoxon signed-rank test, PAIRED by part — did per-part
  *    revenue shift 1995 → 1996? Zero differences drop (Wilcoxon's
  *    rule), |d| average ranks stay exact integers via the doubled-
  *    rank device, the tie term Σ(t³−t) accumulates in DECIMAL(38,0),
  *    and W⁺ and the normal-approximation z are one double chain.
  *
  *  - q328: Friedman test across the three document raters (ordinal
  *    scores, blocked by document). Within-block average ranks over
  *    k=3 values come from pure CASE comparisons — no explode, no
  *    window — so the whole test is one map-side-combinable
  *    aggregate; block tie masses are the closed-form 0/6/24.
  */
object Analytics126 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q327_wilcoxon_signed_rank" -> ((spark, dir) => {
      val py = t(spark, dir, "lineitem")
        .filter(year(col("l_shipdate")).isin(1995, 1996))
        .groupBy(col("l_partkey").as("pk"),
          year(col("l_shipdate")).as("yr"))
        .agg(sum(expr("cast(round(l_extendedprice, 2) as decimal(18,2))"))
          .as("rev"))
      val d = py.filter(col("yr") === 1995)
        .select(col("pk"), col("rev").as("r95"))
        .join(py.filter(col("yr") === 1996)
          .select(col("pk"), col("rev").as("r96")), "pk")
        .select((col("r96") - col("r95")).as("d"))
        .filter(col("d") =!= 0)
        .withColumn("ad", abs(col("d")))
      // doubled midrank per distinct |d| via the distributed prefix
      // scan (q146 device) instead of an unpartitioned rank window over
      // the part-grain diff frame: r2(ad) = 2·count(<=ad) − tc + 1,
      // summed over positive diffs as Σ pc(ad)·r2(ad)
      val byAd = d.groupBy("ad").agg(count(lit(1)).as("tc"),
        count_if(col("d") > 0).as("pc"))
      val midrank = graft.operators.GlobalPrefixSum
        .withRunningTotal(byAd, "ad", "tc", "cum")
        .select(col("tc"), col("pc"),
          (lit(2L) * col("cum") - col("tc") + 1L).as("r2v"))
      val s = midrank.agg(sum(col("tc")).as("n"),
        sum(col("pc") * col("r2v")).as("w2p"))
      val ties = byAd
        .agg(sum(expr("cast(tc as decimal(38,0)) * tc * tc - tc"))
          .as("tmass"))
      s.crossJoin(ties).selectExpr("n",
          "w2p / 2.0d as w_plus",
          """round((w2p / 2.0d - n * (n + 1.0d) / 4.0d)
            | / sqrt(n * (n + 1.0d) * (2.0d * n + 1.0d) / 24.0d
            |   - cast(tmass as double) / 48.0d), 6) as z""".stripMargin)
    }),

    "q328_friedman" -> ((spark, dir) => {
      val v = t(spark, dir, "documents")
        .filter(col("text").isNotNull && col("n_chars").isNotNull)
        .select(
          when(col("n_chars") < 200, 0).when(col("n_chars") < 380, 1)
            .otherwise(2).as("a"),
          when(size(split(col("text"), " ")) < 35, 0)
            .when(size(split(col("text"), " ")) < 70, 1)
            .otherwise(2).as("b"),
          when(size(array_distinct(split(col("text"), " "))) < 20, 0)
            .when(size(array_distinct(split(col("text"), " "))) < 27, 1)
            .otherwise(2).as("c"))
      // doubled within-block avg rank of x among {a,b,c}:
      // 2·less + ties(incl self) + 1
      def r2(x: String, o1: String, o2: String) = expr(
        s"""2 * ((case when $o1 < $x then 1 else 0 end)
           |   + (case when $o2 < $x then 1 else 0 end))
           | + (case when $o1 = $x then 1 else 0 end)
           | + (case when $o2 = $x then 1 else 0 end) + 2"""
          .stripMargin)
      val s = v.select(r2("a", "b", "c").as("ra"),
          r2("b", "a", "c").as("rb"), r2("c", "a", "b").as("rc"),
          expr("""case when a = b and b = c then 24
                 |     when a = b or a = c or b = c then 6
                 |     else 0 end""".stripMargin).as("tm"))
        .agg(count(lit(1)).as("n"), sum(col("ra")).as("s2a"),
          sum(col("rb")).as("s2b"), sum(col("rc")).as("s2c"),
          sum(col("tm")).as("tmass"))
      s.selectExpr("n",
          """round(12.0d / (n * 3.0d * 4.0d)
            | * (cast(s2a as double) * s2a + cast(s2b as double) * s2b
            |    + cast(s2c as double) * s2c) / 4.0d
            | - 3.0d * n * 4.0d, 6) as chi2""".stripMargin,
          """round((12.0d / (n * 3.0d * 4.0d)
            |  * (cast(s2a as double) * s2a + cast(s2b as double) * s2b
            |     + cast(s2c as double) * s2c) / 4.0d
            |  - 3.0d * n * 4.0d)
            | / nullif(1.0d - cast(tmass as double) / (n * 24.0d), 0.0d),
            | 6) as chi2_tie_corrected""".stripMargin,
          "2 as df")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q327_wilcoxon_signed_rank" -> """
      WITH py AS (
        SELECT l_partkey AS pk, year(l_shipdate) AS yr,
          sum(CAST(round(l_extendedprice, 2) AS DECIMAL(18,2))) AS rev
        FROM lineitem WHERE year(l_shipdate) IN (1995, 1996)
        GROUP BY 1, 2),
      d AS (
        SELECT b.rev - a.rev AS d, abs(b.rev - a.rev) AS ad
        FROM py a JOIN py b ON a.pk = b.pk
        WHERE a.yr = 1995 AND b.yr = 1996 AND b.rev <> a.rev),
      ranked AS (
        SELECT d,
          2 * rank() OVER (ORDER BY ad)
            + count(*) OVER (PARTITION BY ad) - 1 AS r2
        FROM d),
      s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CASE WHEN d > 0 THEN r2 ELSE 0 END) AS BIGINT) AS w2p
        FROM ranked),
      ties AS (
        SELECT sum(CAST(tc AS DECIMAL(38,0)) * tc * tc - tc) AS tmass
        FROM (SELECT ad, CAST(count(*) AS BIGINT) AS tc FROM d
              GROUP BY ad) x)
      SELECT n, w2p / 2.0 AS w_plus,
        round((w2p / 2.0 - n * (n + 1.0) / 4.0)
          / sqrt(n * (n + 1.0) * (2.0 * n + 1.0) / 24.0
            - CAST(tmass AS DOUBLE) / 48.0), 6) AS z
      FROM s CROSS JOIN ties""",

    "q328_friedman" -> """
      WITH v AS (
        SELECT
          CASE WHEN n_chars < 200 THEN 0 WHEN n_chars < 380 THEN 1
            ELSE 2 END AS a,
          CASE WHEN len(string_split(text, ' ')) < 35 THEN 0
            WHEN len(string_split(text, ' ')) < 70 THEN 1 ELSE 2 END AS b,
          CASE WHEN len(list_distinct(string_split(text, ' '))) < 20
            THEN 0
            WHEN len(list_distinct(string_split(text, ' '))) < 27 THEN 1
            ELSE 2 END AS c
        FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL),
      r AS (
        SELECT
          2 * ((CASE WHEN b < a THEN 1 ELSE 0 END)
             + (CASE WHEN c < a THEN 1 ELSE 0 END))
            + (CASE WHEN b = a THEN 1 ELSE 0 END)
            + (CASE WHEN c = a THEN 1 ELSE 0 END) + 2 AS ra,
          2 * ((CASE WHEN a < b THEN 1 ELSE 0 END)
             + (CASE WHEN c < b THEN 1 ELSE 0 END))
            + (CASE WHEN a = b THEN 1 ELSE 0 END)
            + (CASE WHEN c = b THEN 1 ELSE 0 END) + 2 AS rb,
          2 * ((CASE WHEN a < c THEN 1 ELSE 0 END)
             + (CASE WHEN b < c THEN 1 ELSE 0 END))
            + (CASE WHEN a = c THEN 1 ELSE 0 END)
            + (CASE WHEN b = c THEN 1 ELSE 0 END) + 2 AS rc,
          CASE WHEN a = b AND b = c THEN 24
               WHEN a = b OR a = c OR b = c THEN 6
               ELSE 0 END AS tm
        FROM v),
      s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(sum(ra) AS BIGINT) AS s2a, CAST(sum(rb) AS BIGINT) AS s2b,
          CAST(sum(rc) AS BIGINT) AS s2c,
          CAST(sum(tm) AS BIGINT) AS tmass
        FROM r)
      SELECT n,
        round(12.0 / (n * 3.0 * 4.0)
          * (CAST(s2a AS DOUBLE) * s2a + CAST(s2b AS DOUBLE) * s2b
             + CAST(s2c AS DOUBLE) * s2c) / 4.0
          - 3.0 * n * 4.0, 6) AS chi2,
        round((12.0 / (n * 3.0 * 4.0)
            * (CAST(s2a AS DOUBLE) * s2a + CAST(s2b AS DOUBLE) * s2b
               + CAST(s2c AS DOUBLE) * s2c) / 4.0
            - 3.0 * n * 4.0)
          / nullif(1.0 - CAST(tmass AS DOUBLE) / (n * 24.0), 0.0), 6)
          AS chi2_tie_corrected,
        2 AS df
      FROM s""",
  )
}
