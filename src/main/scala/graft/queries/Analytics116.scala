package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 135 (SURVEY.md §2.4 statistics):
  *
  *  - q305: exact 1-D Wasserstein (earth-mover's) distance between
  *    the order-total distributions of BUILDING vs MACHINERY
  *    customers — the drift measure that, unlike KS (q72), weights BY
  *    HOW FAR mass moved. W₁ = Σ |F_a−F_b| dx over the merged 2-dp
  *    price support; cross-engine exactness comes from clearing
  *    denominators: |cumA·nB − cumB·nA| is an exact integer, × the
  *    exact decimal gap, summed as DECIMAL(38,2), ÷ (nA·nB) once at
  *    the end. The cumulative pair runs through GlobalPrefixSum (one
  *    range shuffle, both EDFs in one scan); the value grain is
  *    domain-bounded (2-dp prices), not corpus-bound.
  *
  *  - q306: Gumbel extreme-value fit on monthly block maxima of order
  *    totals by the method of moments (β = s√6/π, μ = m − γβ) plus
  *    the 99% return level μ − β·ln(−ln .99) — capacity-planning for
  *    tails. Block maxima are exact decimals; moments exact; the fit
  *    is one double chain.
  *
  *  - q307: capture–recapture (Chapman) estimate of the distinct-
  *    document population from two deterministic md5-bucket
  *    "captures" — the trick for auditing a dedup at 100 TB without
  *    a full distinct: two cheap filtered distinct-counts + overlap
  *    estimate the true cardinality; the query also reports the true
  *    count and the estimator's error.
  */
object Analytics116 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q305_wasserstein_1d" -> ((spark, dir) => {
      val seg = t(spark, dir, "customer")
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(col("c_custkey"), col("c_mktsegment").as("seg"))
      val v = t(spark, dir, "orders")
        .join(seg, col("o_custkey") === col("c_custkey"))
        .select(col("seg"),
          expr("cast(round(o_totalprice, 2) as decimal(18,2))").as("v"))
      val per = v.groupBy("v").agg(
        count_if(col("seg") === "BUILDING").as("ca"),
        count_if(col("seg") === "MACHINERY").as("cb"))
      // the same prefix scan also numbers the support points (v is
      // distinct per row, so the RANGE-frame running count is a unique
      // 1..n index); the next support value then comes from an
      // idx+1 equi-join on the bounded support frame instead of an
      // unpartitioned lead() window (whose single task would sort the
      // whole support — near row count for 2-dp prices at scale)
      val cum = graft.operators.GlobalPrefixSum.withRunningTotalsBy(
        per.withColumn("one", lit(1L)), col("v"),
        Seq("ca" -> "cuma", "cb" -> "cumb", "one" -> "idx"))
        .localCheckpoint(true) // referenced by both sides of the gap join
      val tot = per.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
      val gapped = cum.join(
        cum.select((col("idx") - 1L).as("idx"), col("v").as("nextv")),
        "idx")
      val sterm = gapped.crossJoin(broadcast(tot))
        .select(expr(
          """cast(cast(abs(cuma * nb - cumb * na) as decimal(20,0))
            |  * (nextv - v) as decimal(38,2))""".stripMargin).as("term"))
        .agg(sum(col("term")).as("sterm"))
      sterm.crossJoin(broadcast(tot)).select(col("na"), col("nb"),
        round(expr(
          "cast(sterm as double) / (cast(na as double) * nb)"), 6)
          .as("w1"))
    }),

    "q306_gumbel_blocks" -> ((spark, dir) => {
      val blocks = t(spark, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("m"))
        .agg(max(expr("cast(round(o_totalprice, 2) as decimal(18,2))"))
          .as("mx"))
      val s = blocks.agg(count(lit(1)).as("nb"), sum(col("mx")).as("sm"),
        sum(expr("cast(mx * mx as decimal(38,4))")).as("smm"))
      s.selectExpr("nb",
        """round(cast(sm as double) / nb
          | - 0.5772156649015329d
          |   * (sqrt((cast(smm as double)
          |       - nb * (cast(sm as double) / nb)
          |         * (cast(sm as double) / nb)) / (nb - 1))
          |      * sqrt(6.0d) / pi()), 6) as mu""".stripMargin,
        """round(sqrt((cast(smm as double)
          |    - nb * (cast(sm as double) / nb)
          |      * (cast(sm as double) / nb)) / (nb - 1))
          |  * sqrt(6.0d) / pi(), 6) as beta""".stripMargin,
        """round((cast(sm as double) / nb
          |  - 0.5772156649015329d
          |    * (sqrt((cast(smm as double)
          |        - nb * (cast(sm as double) / nb)
          |          * (cast(sm as double) / nb)) / (nb - 1))
          |       * sqrt(6.0d) / pi()))
          | - (sqrt((cast(smm as double)
          |      - nb * (cast(sm as double) / nb)
          |        * (cast(sm as double) / nb)) / (nb - 1))
          |    * sqrt(6.0d) / pi()) * ln(-ln(0.99d)), 6)
          | as return_level_99""".stripMargin)
    }),

    "q307_capture_recapture" -> ((spark, dir) => {
      val h = t(spark, dir, "documents").filter(col("text").isNotNull)
        .select(graft.functions.Md5Pack(col("text")).as("h"))
        .distinct()
      // `div`, not `/`: double division mangles 62-bit hash values
      val s = h.agg(count(lit(1)).as("n_true"),
        count_if(col("h") % 7 < 3).as("n1"),
        count_if(expr("(h div 7) % 5") < 2).as("n2"),
        count_if(col("h") % 7 < 3 && expr("(h div 7) % 5") < 2).as("m"))
      s.selectExpr("n1", "n2", "m", "n_true",
        """round((n1 + 1.0d) * (n2 + 1.0d) / (m + 1.0d) - 1.0d, 6)
          | as n_hat_chapman""".stripMargin,
        """round(((n1 + 1.0d) * (n2 + 1.0d) / (m + 1.0d) - 1.0d - n_true)
          | / n_true * 100.0d, 6) as err_pct""".stripMargin)
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q305_wasserstein_1d" -> """
      WITH v AS (
        SELECT c_mktsegment AS seg,
          CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) AS v
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
      per AS (
        SELECT v,
          CAST(count(*) FILTER (WHERE seg = 'BUILDING') AS BIGINT) AS ca,
          CAST(count(*) FILTER (WHERE seg = 'MACHINERY') AS BIGINT) AS cb
        FROM v GROUP BY v),
      cum AS (
        SELECT v,
          sum(ca) OVER (ORDER BY v) AS cuma,
          sum(cb) OVER (ORDER BY v) AS cumb,
          lead(v) OVER (ORDER BY v) AS nextv
        FROM per),
      tot AS (
        SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb
        FROM per),
      s AS (
        SELECT sum(CAST(CAST(abs(cuma * nb - cumb * na) AS DECIMAL(20,0))
            * (nextv - v) AS DECIMAL(38,2))) AS sterm
        FROM cum CROSS JOIN tot WHERE nextv IS NOT NULL)
      SELECT na, nb,
        round(CAST(sterm AS DOUBLE) / (CAST(na AS DOUBLE) * nb), 6) AS w1
      FROM s CROSS JOIN tot""",

    "q306_gumbel_blocks" -> """
      WITH blocks AS (
        SELECT date_trunc('month', o_orderdate) AS m,
          max(CAST(round(o_totalprice, 2) AS DECIMAL(18,2))) AS mx
        FROM orders GROUP BY 1),
      s AS (
        SELECT CAST(count(*) AS BIGINT) AS nb, sum(mx) AS sm,
          sum(CAST(mx * mx AS DECIMAL(38,4))) AS smm
        FROM blocks)
      SELECT nb,
        round(CAST(sm AS DOUBLE) / nb
          - 0.5772156649015329
            * (sqrt((CAST(smm AS DOUBLE)
                - nb * (CAST(sm AS DOUBLE) / nb)
                  * (CAST(sm AS DOUBLE) / nb)) / (nb - 1))
               * sqrt(6.0) / pi()), 6) AS mu,
        round(sqrt((CAST(smm AS DOUBLE)
            - nb * (CAST(sm AS DOUBLE) / nb)
              * (CAST(sm AS DOUBLE) / nb)) / (nb - 1))
          * sqrt(6.0) / pi(), 6) AS beta,
        round((CAST(sm AS DOUBLE) / nb
          - 0.5772156649015329
            * (sqrt((CAST(smm AS DOUBLE)
                - nb * (CAST(sm AS DOUBLE) / nb)
                  * (CAST(sm AS DOUBLE) / nb)) / (nb - 1))
               * sqrt(6.0) / pi()))
          - (sqrt((CAST(smm AS DOUBLE)
               - nb * (CAST(sm AS DOUBLE) / nb)
                 * (CAST(sm AS DOUBLE) / nb)) / (nb - 1))
             * sqrt(6.0) / pi()) * ln(-ln(0.99)), 6)
          AS return_level_99
      FROM s""",

    "q307_capture_recapture" -> s"""
      WITH h AS (
        SELECT DISTINCT ${Tables.duckMd5Pack("text")} AS h
        FROM documents WHERE text IS NOT NULL),
      s AS (
        SELECT CAST(count(*) AS BIGINT) AS n_true,
          CAST(count(*) FILTER (WHERE h % 7 < 3) AS BIGINT) AS n1,
          CAST(count(*) FILTER (WHERE (h // 7) % 5 < 2) AS BIGINT) AS n2,
          CAST(count(*) FILTER (WHERE h % 7 < 3 AND (h // 7) % 5 < 2)
            AS BIGINT) AS m
        FROM h)
      SELECT n1, n2, m, n_true,
        round((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0, 6)
          AS n_hat_chapman,
        round(((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0 - n_true)
          / n_true * 100.0, 6) AS err_pct
      FROM s""",
  )
}
