package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 142 (SURVEY.md §2.4 — completes the
  * labeling-QC suite: q295 Cohen, q296 Fleiss, q317 weighted kappa):
  *
  *  - q318: Krippendorff's alpha (nominal, 3 complete raters) via the
  *    coincidence-matrix formulation. With m=3 raters the pairable
  *    coincidences divide by (m−1)=2, so DOUBLED coincidences stay
  *    integers: o2_ck = 2·Σ_u n_uc·n_uk/(m−1); D_o and D_e then use
  *    the doubled totals consistently (n_tot2 = 2·N·m) and alpha is
  *    one double expression.
  *
  *  - q319: intraclass correlation ICC(2,1) — the two-way random-
  *    effects agreement index over the SAME ratings treated as
  *    ordinal scores (0/1/2). All four sums of squares come from one
  *    integer aggregate (Σx, Σx², Σ(unit sums)², per-rater sums);
  *    the MS decomposition and ICC are a single double chain.
  *
  * Both are one corpus-scale aggregate plus constant-size arithmetic.
  */
object Analytics121 {
  import Tables.t

  private def votes(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .filter(col("text").isNotNull && col("n_chars").isNotNull)
      .select(col("doc_id"),
        when(col("n_chars") < 200, 0).when(col("n_chars") < 380, 1)
          .otherwise(2).as("r1"),
        when(size(split(col("text"), " ")) < 35, 0)
          .when(size(split(col("text"), " ")) < 70, 1)
          .otherwise(2).as("r2"),
        when(size(array_distinct(split(col("text"), " "))) < 20, 0)
          .when(size(array_distinct(split(col("text"), " "))) < 27, 1)
          .otherwise(2).as("r3"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q318_krippendorff_alpha" -> ((spark, dir) => {
      val long = votes(spark, dir).select(col("doc_id"),
        explode(array(col("r1"), col("r2"), col("r3"))).as("cat"))
      val nuc = long.groupBy("doc_id", "cat").agg(count(lit(1)).as("c"))
      // doubled off-diagonal coincidence mass per unit:
      // Σ_{c≠k} n_uc·n_uk = (Σn_uc)² − Σn_uc² = 9 − Σc²  (m=3)
      val offd = nuc.groupBy("doc_id")
        .agg((lit(9L) - sum(col("c") * col("c"))).as("off2u"))
        .agg(sum(col("off2u")).as("off2"), count(lit(1)).as("nunits"))
      val marg = long.groupBy("cat").agg(count(lit(1)).as("nc2x"))
        // doubled marginals: coincidence row sums are 2·(votes per cat)
        .agg(sum(expr("cast(nc2x as decimal(38,0)) * nc2x * 4")).as("sq2"),
          sum(col("nc2x") * 2).as("ntot2"))
      offd.crossJoin(marg).selectExpr("nunits",
          "round(off2 / cast(ntot2 as double), 6) as d_o",
          // Σ_{c≠k} nc2·nk2 = (Σnc2)² − Σnc2²; /(ntot2·(ntot2−2))
          """round((cast(ntot2 as double) * ntot2 - cast(sq2 as double))
            | / (cast(ntot2 as double) * (ntot2 - 2.0d)), 6)
            | as d_e""".stripMargin,
          """round(1.0d - (off2 / cast(ntot2 as double))
            | / ((cast(ntot2 as double) * ntot2 - cast(sq2 as double))
            |    / (cast(ntot2 as double) * (ntot2 - 2.0d))), 6)
            | as alpha""".stripMargin)
    }),

    "q319_icc_2_1" -> ((spark, dir) => {
      val v = votes(spark, dir)
      val s = v.agg(count(lit(1)).as("n"),
        sum(col("r1") + col("r2") + col("r3")).as("sx"),
        sum(col("r1") * col("r1") + col("r2") * col("r2")
          + col("r3") * col("r3")).as("sxx"),
        sum((col("r1") + col("r2") + col("r3"))
          * (col("r1") + col("r2") + col("r3"))).as("srow2"),
        sum(col("r1")).as("c1"), sum(col("r2")).as("c2"),
        sum(col("r3")).as("c3"))
      s.selectExpr("n",
          """round((
            |  (srow2 / 3.0d - cast(sx as double) * sx / (3.0d * n))
            |    / (n - 1)
            |  - ((sxx - srow2 / 3.0d
            |      - ((cast(c1 as double)*c1 + cast(c2 as double)*c2
            |          + cast(c3 as double)*c3) / n
            |        - cast(sx as double) * sx / (3.0d * n)))
            |     / ((n - 1) * 2.0d))
            |) / (
            |  (srow2 / 3.0d - cast(sx as double) * sx / (3.0d * n))
            |    / (n - 1)
            |  + 2.0d * ((sxx - srow2 / 3.0d
            |      - ((cast(c1 as double)*c1 + cast(c2 as double)*c2
            |          + cast(c3 as double)*c3) / n
            |        - cast(sx as double) * sx / (3.0d * n)))
            |     / ((n - 1) * 2.0d))
            |  + 3.0d * (((cast(c1 as double)*c1 + cast(c2 as double)*c2
            |          + cast(c3 as double)*c3) / n
            |        - cast(sx as double) * sx / (3.0d * n)) / 2.0d
            |     - (sxx - srow2 / 3.0d
            |        - ((cast(c1 as double)*c1 + cast(c2 as double)*c2
            |            + cast(c3 as double)*c3) / n
            |          - cast(sx as double) * sx / (3.0d * n)))
            |       / ((n - 1) * 2.0d)) / n
            |), 6) as icc21""".stripMargin)
    }),
  )

  private val VotesSql = """
        SELECT doc_id,
          CASE WHEN n_chars < 200 THEN 0 WHEN n_chars < 380 THEN 1
            ELSE 2 END AS r1,
          CASE WHEN len(string_split(text, ' ')) < 35 THEN 0
            WHEN len(string_split(text, ' ')) < 70 THEN 1 ELSE 2 END AS r2,
          CASE WHEN len(list_distinct(string_split(text, ' '))) < 20 THEN 0
            WHEN len(list_distinct(string_split(text, ' '))) < 27 THEN 1
            ELSE 2 END AS r3
        FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL"""

  val oracleSql: Map[String, String] = Map(
    "q318_krippendorff_alpha" -> s"""
      WITH votes AS ($VotesSql),
      longf AS (SELECT doc_id, unnest([r1, r2, r3]) AS cat FROM votes),
      nuc AS (
        SELECT doc_id, cat, CAST(count(*) AS BIGINT) AS c
        FROM longf GROUP BY doc_id, cat),
      offd AS (
        SELECT CAST(sum(off2u) AS BIGINT) AS off2,
          CAST(count(*) AS BIGINT) AS nunits
        FROM (SELECT doc_id, 9 - sum(c * c) AS off2u FROM nuc
              GROUP BY doc_id) x),
      marg AS (
        SELECT sum(CAST(nc2x AS DECIMAL(38,0)) * nc2x * 4) AS sq2,
          CAST(sum(nc2x * 2) AS BIGINT) AS ntot2
        FROM (SELECT cat, CAST(count(*) AS BIGINT) AS nc2x FROM longf
              GROUP BY cat) y)
      SELECT nunits,
        round(off2 / CAST(ntot2 AS DOUBLE), 6) AS d_o,
        round((CAST(ntot2 AS DOUBLE) * ntot2 - CAST(sq2 AS DOUBLE))
          / (CAST(ntot2 AS DOUBLE) * (ntot2 - 2.0)), 6) AS d_e,
        round(1.0 - (off2 / CAST(ntot2 AS DOUBLE))
          / ((CAST(ntot2 AS DOUBLE) * ntot2 - CAST(sq2 AS DOUBLE))
             / (CAST(ntot2 AS DOUBLE) * (ntot2 - 2.0))), 6) AS alpha
      FROM offd CROSS JOIN marg""",

    "q319_icc_2_1" -> s"""
      WITH votes AS ($VotesSql),
      s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(sum(r1 + r2 + r3) AS BIGINT) AS sx,
          CAST(sum(r1*r1 + r2*r2 + r3*r3) AS BIGINT) AS sxx,
          CAST(sum((r1 + r2 + r3) * (r1 + r2 + r3)) AS BIGINT) AS srow2,
          CAST(sum(r1) AS BIGINT) AS c1, CAST(sum(r2) AS BIGINT) AS c2,
          CAST(sum(r3) AS BIGINT) AS c3
        FROM votes)
      SELECT n,
        round((
          (srow2 / 3.0 - CAST(sx AS DOUBLE) * sx / (3.0 * n)) / (n - 1)
          - ((sxx - srow2 / 3.0
              - ((CAST(c1 AS DOUBLE)*c1 + CAST(c2 AS DOUBLE)*c2
                  + CAST(c3 AS DOUBLE)*c3) / n
                - CAST(sx AS DOUBLE) * sx / (3.0 * n)))
             / ((n - 1) * 2.0))
        ) / (
          (srow2 / 3.0 - CAST(sx AS DOUBLE) * sx / (3.0 * n)) / (n - 1)
          + 2.0 * ((sxx - srow2 / 3.0
              - ((CAST(c1 AS DOUBLE)*c1 + CAST(c2 AS DOUBLE)*c2
                  + CAST(c3 AS DOUBLE)*c3) / n
                - CAST(sx AS DOUBLE) * sx / (3.0 * n)))
             / ((n - 1) * 2.0))
          + 3.0 * (((CAST(c1 AS DOUBLE)*c1 + CAST(c2 AS DOUBLE)*c2
                  + CAST(c3 AS DOUBLE)*c3) / n
                - CAST(sx AS DOUBLE) * sx / (3.0 * n)) / 2.0
             - (sxx - srow2 / 3.0
                - ((CAST(c1 AS DOUBLE)*c1 + CAST(c2 AS DOUBLE)*c2
                    + CAST(c3 AS DOUBLE)*c3) / n
                  - CAST(sx AS DOUBLE) * sx / (3.0 * n)))
               / ((n - 1) * 2.0)) / n
        ), 6) AS icc21
      FROM s""",
  )
}
