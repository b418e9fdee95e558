package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 37 (SURVEY.md §2.4):
  *
  *  - q158: histogram join-cardinality estimate — the optimizer-
  *    statistics diagnostic: equi-width key histograms on both join
  *    sides, the classic Σ c1·c2 bucket-product estimate, and the true
  *    join cardinality next to it. Buckets come from `key mod 64`
  *    (engine-portable, unlike hash partitioner internals), the product
  *    sums in exact DECIMAL (c1·c2 overflows long once both sides pass
  *    ~3e9 rows per bucket), and the actual join never materializes
  *    wide rows — it counts on the join keys only. The diagnostic's
  *    point at scale: the estimate costs two cheap rollups instead of
  *    executing the join.
  */
object Analytics33 {
  import Tables.t

  private val Buckets = 64

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q158_join_card_est" -> ((spark, dir) => {
      val h1 = t(spark, dir, "orders")
        .groupBy((col("o_orderkey") % Buckets).as("b"))
        .agg(count(lit(1)).as("c1"))
      val h2 = t(spark, dir, "lineitem")
        .groupBy((col("l_orderkey") % Buckets).as("b2"))
        .agg(count(lit(1)).as("c2"))
      val est = h1.join(h2, col("b") === col("b2"))
        .agg(sum((col("c1").cast("decimal(19,0)") *
          col("c2").cast("decimal(19,0)")).cast("decimal(38,0)"))
          .cast("decimal(38,0)").as("est_rows"))
      val actual = t(spark, dir, "orders").select(col("o_orderkey"))
        .join(t(spark, dir, "lineitem").select(col("l_orderkey")),
          col("o_orderkey") === col("l_orderkey"))
        .agg(count(lit(1)).as("actual_rows"))
      est.crossJoin(actual)
        .select(lit(Buckets).as("n_buckets"),
          col("est_rows").cast("double").as("est_rows"),
          col("actual_rows"),
          round(col("est_rows").cast("double") /
            col("actual_rows").cast("double"), 6).as("overestimate"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q158_join_card_est" ->
      s"""WITH h1 AS (
         |  SELECT o_orderkey % $Buckets AS b,
         |    CAST(count(*) AS BIGINT) AS c1
         |  FROM orders GROUP BY 1),
         |h2 AS (
         |  SELECT l_orderkey % $Buckets AS b,
         |    CAST(count(*) AS BIGINT) AS c2
         |  FROM lineitem GROUP BY 1),
         |est AS (
         |  SELECT CAST(sum(CAST(CAST(c1 AS DECIMAL(19,0))
         |    * CAST(c2 AS DECIMAL(19,0)) AS DECIMAL(38,0)))
         |    AS DECIMAL(38,0)) AS est_rows
         |  FROM h1 JOIN h2 USING (b)),
         |act AS (
         |  SELECT CAST(count(*) AS BIGINT) AS actual_rows
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey)
         |SELECT CAST($Buckets AS INT) AS n_buckets,
         |  CAST(est_rows AS DOUBLE) AS est_rows,
         |  actual_rows,
         |  round(CAST(est_rows AS DOUBLE)
         |    / CAST(actual_rows AS DOUBLE), 6) AS overestimate
         |FROM est, act""".stripMargin,
  )
}
