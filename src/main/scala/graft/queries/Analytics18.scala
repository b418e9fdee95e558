package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 20 (SURVEY.md §2.4):
  *
  *  - q132: mutual information between categorical features — the
  *    feature-dependency screen next to q95's chi-square: cell counts
  *    for segment × priority from ONE pass, MI terms
  *    p_ij·ln(p_ij·n/(n_i·n_j)) with the q117-lift float association,
  *    rounded →DECIMAL before the exact total (the q120 discipline).
  *    Margins ride along via two bounded window sums over the 25-cell
  *    frame — no second scan.
  *  - q133: inter-arrival survival curve — the churn diagnostic:
  *    per-customer consecutive-order gaps (one customer-keyed window),
  *    then survival fractions S(t) = P(gap > t) over a literal weekly
  *    threshold spine. Counts are exact; one division per threshold.
  */
object Analytics18 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q132_mutual_information" -> ((spark, dir) => {
      val cells = t(spark, dir, "orders")
        .join(t(spark, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"),
          col("o_orderpriority").as("priority"))
        .agg(count(lit(1)).as("n_ij"))
      // margins from the bounded (≤ 25-row) cell frame, not a rescan —
      // as broadcast-joined aggregates rather than empty-partition
      // windows, so the shape stays multi-task at ANY category
      // cardinality (the census's empty-orderSpec detector now counts
      // unordered global windows; this formulation plans none)
      val withMargins = cells
        .join(broadcast(cells.groupBy("segment")
          .agg(sum(col("n_ij")).as("n_i"))), Seq("segment"))
        .join(broadcast(cells.groupBy("priority")
          .agg(sum(col("n_ij")).as("n_j"))), Seq("priority"))
        .crossJoin(broadcast(cells.agg(sum(col("n_ij")).as("n"))))
      val terms = withMargins
        .withColumn("mi_term", round(
          (col("n_ij").cast("double") / col("n")) *
            log(col("n_ij").cast("double") * col("n") /
              (col("n_i") * col("n_j"))), 9))
      terms.select(col("segment"), col("priority"), col("n_ij"),
          col("mi_term"))
        .unionByName(terms.agg(sum(col("n_ij")).as("n_ij"),
          sum(col("mi_term").cast("decimal(18,9)")).cast("double")
            .as("mi_term"))
          .select(lit("_total").as("segment"), lit("_total").as("priority"),
            col("n_ij"), col("mi_term")))
        .orderBy("segment", "priority")
    }),

    "q133_survival_curve" -> ((spark, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
      val gaps = t(spark, dir, "orders")
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
        .withColumn("next_date", lead(col("o_orderdate"), 1).over(w))
        .filter(col("next_date").isNotNull)
        .select(datediff(to_date(col("next_date")),
          to_date(col("o_orderdate"))).as("gap_days"))
      val totals = gaps.agg(count(lit(1)).as("n_gaps"))
      gaps
        .crossJoin(broadcast(spark.range(1, 9)
          .select((col("id") * 7).as("t_days"))))
        .groupBy("t_days")
        .agg(count_if(col("gap_days") > col("t_days")).as("n_surviving"))
        .crossJoin(broadcast(totals))
        .select(col("t_days"), col("n_gaps"), col("n_surviving"),
          round(col("n_surviving").cast("double") / col("n_gaps"), 6)
            .as("survival"))
        .orderBy("t_days")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q132_mutual_information" ->
      """WITH cells AS (
        |  SELECT c_mktsegment AS segment, o_orderpriority AS priority,
        |    CAST(count(*) AS BIGINT) AS n_ij
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |m AS (
        |  SELECT *,
        |    CAST(sum(n_ij) OVER (PARTITION BY segment) AS BIGINT) AS n_i,
        |    CAST(sum(n_ij) OVER (PARTITION BY priority) AS BIGINT) AS n_j,
        |    CAST(sum(n_ij) OVER () AS BIGINT) AS n
        |  FROM cells),
        |terms AS (
        |  SELECT segment, priority, n_ij,
        |    round((CAST(n_ij AS DOUBLE) / n) *
        |      ln(CAST(n_ij AS DOUBLE) * n / (n_i * n_j)), 9) AS mi_term
        |  FROM m)
        |SELECT segment, priority, n_ij, mi_term FROM terms
        |UNION ALL
        |SELECT '_total', '_total', CAST(sum(n_ij) AS BIGINT),
        |  CAST(sum(CAST(mi_term AS DECIMAL(18,9))) AS DOUBLE)
        |FROM terms
        |ORDER BY segment, priority""".stripMargin,

    "q133_survival_curve" ->
      """WITH gaps AS (
        |  SELECT CAST(next_date AS DATE) - CAST(o_orderdate AS DATE)
        |    AS gap_days
        |  FROM (
        |    SELECT o_orderdate, lead(o_orderdate) OVER (
        |      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |      AS next_date
        |    FROM orders)
        |  WHERE next_date IS NOT NULL),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_gaps FROM gaps),
        |spine AS (SELECT CAST(r.range * 7 AS BIGINT) AS t_days
        |          FROM range(1, 9) r)
        |SELECT t_days, n_gaps,
        |  CAST(count(*) FILTER (WHERE gap_days > t_days) AS BIGINT)
        |    AS n_surviving,
        |  round(CAST(count(*) FILTER (WHERE gap_days > t_days) AS DOUBLE)
        |    / n_gaps, 6) AS survival
        |FROM gaps CROSS JOIN spine CROSS JOIN tot
        |GROUP BY t_days, n_gaps ORDER BY t_days""".stripMargin,
  )
}
