package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 143 (SURVEY.md §2.4 evaluation metrics):
  *
  *  - q320: Cochran's Q — do the three binary "is long?" raters (the
  *    q296 panel thresholded at category 2) differ systematically?
  *    Q = (k−1)[kΣC_j² − (ΣC_j)²] / (kΣR_i − ΣR_i²); everything is
  *    one integer aggregate over row/column sums.
  *
  *  - q321: Brier score with the Murphy decomposition (reliability −
  *    resolution + uncertainty) for a deterministic probability
  *    forecaster: train-half urgent-rate per fixed price bucket
  *    predicts P(urgent) on the test half. Bin rates round once to
  *    DECIMAL(9,6); per-bin decomposition terms round once to
  *    DECIMAL(18,9) so the 10-term sums are exact.
  */
object Analytics122 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q320_cochran_q" -> ((spark, dir) => {
      val v = t(spark, dir, "documents")
        .filter(col("text").isNotNull && col("n_chars").isNotNull)
        .select(
          when(col("n_chars") >= 380, 1).otherwise(0).as("x1"),
          when(size(split(col("text"), " ")) >= 70, 1).otherwise(0)
            .as("x2"),
          when(size(array_distinct(split(col("text"), " "))) >= 27, 1)
            .otherwise(0).as("x3"))
      val s = v.agg(count(lit(1)).as("n"),
        sum(col("x1")).as("c1"), sum(col("x2")).as("c2"),
        sum(col("x3")).as("c3"),
        sum(col("x1") + col("x2") + col("x3")).as("sr"),
        sum((col("x1") + col("x2") + col("x3"))
          * (col("x1") + col("x2") + col("x3"))).as("sr2"))
      s.selectExpr("n", "c1", "c2", "c3",
          """round(2.0d * (3.0d * (cast(c1 as double)*c1
            |    + cast(c2 as double)*c2 + cast(c3 as double)*c3)
            |  - cast(sr as double) * sr)
            | / (3.0d * sr - sr2), 6) as q_stat""".stripMargin,
          "2 as df")
    }),

    "q321_brier_decomposition" -> ((spark, dir) => {
      val o = t(spark, dir, "orders").select(col("o_orderkey"),
        (col("o_orderpriority") === "1-URGENT").cast("int").as("y"),
        least(floor(col("o_totalprice") / 60000.0).cast("int"), lit(9))
          .as("bin"))
      val rate = o.filter(col("o_orderkey") % 2 === 0)
        .groupBy("bin").agg(count(lit(1)).as("ntr"), sum(col("y")).as("ytr"))
        .select(col("bin"), expr(
          """cast(round(ytr / cast(ntr as double), 6)
            |  as decimal(9,6))""".stripMargin).as("p"))
      val test = o.filter(col("o_orderkey") % 2 === 1)
        .join(broadcast(rate), "bin")
      val bins = test.groupBy("bin", "p").agg(
        count(lit(1)).as("nb"), sum(col("y")).as("yb"))
      val tot = bins.agg(sum(col("nb")).as("nt"), sum(col("yb")).as("yt"))
      val terms = bins.crossJoin(broadcast(tot)).select(
        expr("""cast(round(nb * (cast(p as double) - yb / cast(nb as double))
               |  * (cast(p as double) - yb / cast(nb as double)), 9)
               |  as decimal(28,9))""".stripMargin).as("rel_t"),
        expr("""cast(round(nb * (yb / cast(nb as double)
               |    - yt / cast(nt as double))
               |  * (yb / cast(nb as double) - yt / cast(nt as double)), 9)
               |  as decimal(28,9))""".stripMargin).as("res_t"))
        .agg(sum(col("rel_t")).as("rel"), sum(col("res_t")).as("res"))
      terms.crossJoin(broadcast(tot)).selectExpr("nt",
          "round(cast(rel as double) / nt, 6) as reliability",
          "round(cast(res as double) / nt, 6) as resolution",
          """round((yt / cast(nt as double))
            | * (1.0d - yt / cast(nt as double)), 6)
            | as uncertainty""".stripMargin,
          """round(cast(rel as double) / nt - cast(res as double) / nt
            | + (yt / cast(nt as double))
            |   * (1.0d - yt / cast(nt as double)), 6)
            | as brier""".stripMargin)
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q320_cochran_q" -> """
      WITH v AS (
        SELECT
          CASE WHEN n_chars >= 380 THEN 1 ELSE 0 END AS x1,
          CASE WHEN len(string_split(text, ' ')) >= 70 THEN 1 ELSE 0 END
            AS x2,
          CASE WHEN len(list_distinct(string_split(text, ' '))) >= 27
            THEN 1 ELSE 0 END AS x3
        FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL),
      s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(sum(x1) AS BIGINT) AS c1, CAST(sum(x2) AS BIGINT) AS c2,
          CAST(sum(x3) AS BIGINT) AS c3,
          CAST(sum(x1 + x2 + x3) AS BIGINT) AS sr,
          CAST(sum((x1 + x2 + x3) * (x1 + x2 + x3)) AS BIGINT) AS sr2
        FROM v)
      SELECT n, c1, c2, c3,
        round(2.0 * (3.0 * (CAST(c1 AS DOUBLE)*c1
            + CAST(c2 AS DOUBLE)*c2 + CAST(c3 AS DOUBLE)*c3)
          - CAST(sr AS DOUBLE) * sr)
          / (3.0 * sr - sr2), 6) AS q_stat,
        2 AS df
      FROM s""",

    "q321_brier_decomposition" -> """
      WITH o AS (
        SELECT o_orderkey,
          CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y,
          least(CAST(floor(o_totalprice / 60000.0) AS INTEGER), 9) AS bin
        FROM orders),
      rate AS (
        SELECT bin,
          CAST(round(sum(y) / CAST(count(*) AS DOUBLE), 6)
            AS DECIMAL(9,6)) AS p
        FROM o WHERE o_orderkey % 2 = 0 GROUP BY bin),
      test AS (
        SELECT o.bin, p, y FROM o JOIN rate ON o.bin = rate.bin
        WHERE o_orderkey % 2 = 1),
      bins AS (
        SELECT bin, p, CAST(count(*) AS BIGINT) AS nb,
          CAST(sum(y) AS BIGINT) AS yb
        FROM test GROUP BY bin, p),
      tot AS (
        SELECT CAST(sum(nb) AS BIGINT) AS nt, CAST(sum(yb) AS BIGINT) AS yt
        FROM bins),
      terms AS (
        SELECT
          sum(CAST(round(nb * (CAST(p AS DOUBLE) - yb / CAST(nb AS DOUBLE))
            * (CAST(p AS DOUBLE) - yb / CAST(nb AS DOUBLE)), 9)
            AS DECIMAL(28,9))) AS rel,
          sum(CAST(round(nb * (yb / CAST(nb AS DOUBLE)
              - yt / CAST(nt AS DOUBLE))
            * (yb / CAST(nb AS DOUBLE) - yt / CAST(nt AS DOUBLE)), 9)
            AS DECIMAL(28,9))) AS res
        FROM bins CROSS JOIN tot)
      SELECT nt,
        round(CAST(rel AS DOUBLE) / nt, 6) AS reliability,
        round(CAST(res AS DOUBLE) / nt, 6) AS resolution,
        round((yt / CAST(nt AS DOUBLE))
          * (1.0 - yt / CAST(nt AS DOUBLE)), 6) AS uncertainty,
        round(CAST(rel AS DOUBLE) / nt - CAST(res AS DOUBLE) / nt
          + (yt / CAST(nt AS DOUBLE))
            * (1.0 - yt / CAST(nt AS DOUBLE)), 6) AS brier
      FROM terms CROSS JOIN tot""",
  )
}
