package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 additions, batch 137 (SURVEY.md §2.4):
  *
  *  - q345: zone-map effectiveness audit — the file-skipping question
  *    behind every lakehouse scan: orders laid out in 128 arrival-order
  *    "files" carry per-file min/max order-date stats; for each month
  *    of 1996, how many files does the zone map admit vs how many
  *    actually contain matching rows? The gap is the zone map's
  *    false-positive rate (arrival order correlates weakly with date,
  *    so ranges overlap). File ids come from the GlobalPrefixSum row
  *    scan; stats and counts are two bounded aggregations — the
  *    min/max-stats shape of Parquet row groups and Iceberg manifests,
  *    measured rather than assumed.
  *  - q346: PSI distribution drift — the industry-standard population
  *    stability index between 1996 and 1997 order-price distributions
  *    over 20 fixed price bins: Σ (p_i − q_i)·ln(p_i/q_i) with
  *    Laplace-smoothed counts so empty bins stay finite. ln only ever
  *    runs on the 20-row bin frame (the bounded-grid discipline);
  *    verdict thresholds at 0.1/0.25 mirror credit-risk practice.
  */
object Analytics137 {
  import Tables.t

  private val Files = 128L
  private val Bins = 20

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q345_zone_map_fpr" -> ((spark, dir) => {
      val o = t(spark, dir, "orders")
        .select(col("o_orderkey"), to_date(col("o_orderdate")).as("d"))
      val n = o.agg(count(lit(1)).as("n_rows"))
      // file id = arrival-order row number bucketed into 128 files
      val filed = graft.operators.GlobalPrefixSum.withRunningTotal(
        o.withColumn("one", lit(1L)), "o_orderkey", "one", "rn")
        .crossJoin(broadcast(n))
        .withColumn("file_id", expr(s"(rn - 1) * $Files div n_rows"))
      val stats = filed.groupBy("file_id")
        .agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
        .localCheckpoint(true) // probed once per month
      val months = spark.range(1, 13).select(col("id").cast("int").as("m"))
      val admitted = stats.crossJoin(broadcast(months))
        .filter(col("lo") <= last_day(make_date(lit(1996), col("m"), lit(1)))
          && col("hi") >= make_date(lit(1996), col("m"), lit(1)))
        .groupBy("m").agg(count(lit(1)).as("files_admitted"))
      val actual = filed
        .filter(year(col("d")) === 1996)
        .groupBy(month(col("d")).as("m"))
        .agg(countDistinct(col("file_id")).as("files_matching"),
          count(lit(1)).as("rows_matching"))
      admitted.join(actual, "m")
        .select(col("m"), col("files_admitted"), col("files_matching"),
          col("rows_matching"),
          ((col("files_admitted") - col("files_matching")).cast("double")
            / col("files_admitted").cast("double")).as("false_positive_rate"))
        .orderBy("m")
    }),

    "q346_psi_drift" -> ((spark, dir) => {
      val o = t(spark, dir, "orders")
        .select(year(col("o_orderdate")).as("yr"),
          expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
            .as("cents"))
        .filter(col("yr").isin(1996, 1997))
      val bounds = o.agg(min(col("cents")).as("lo"),
        max(col("cents")).as("hi"))
      val binned = o.crossJoin(broadcast(bounds))
        .withColumn("bin", least(
          expr(s"(cents - lo) * $Bins div (hi - lo + 1)"),
          lit(Bins - 1L)).cast("int"))
        .groupBy("bin")
        .agg(count_if(col("yr") === 1996).as("c_a"),
          count_if(col("yr") === 1997).as("c_b"))
      val tot = binned.agg(sum(col("c_a")).as("n_a"),
        sum(col("c_b")).as("n_b"))
      // Laplace-smoothed shares; ln only on the 20-row bin frame
      val terms = binned.crossJoin(broadcast(tot))
        .select(col("bin"), col("c_a"), col("c_b"),
          round(((col("c_a") + 1).cast("double")
            / (col("n_a") + Bins).cast("double")
            - (col("c_b") + 1).cast("double")
              / (col("n_b") + Bins).cast("double"))
            * log((col("c_a") + 1).cast("double")
              * (col("n_b") + Bins).cast("double")
              / ((col("c_b") + 1).cast("double")
                * (col("n_a") + Bins).cast("double"))), 10)
            .cast("decimal(20,10)").as("term"))
      terms.agg(count(lit(1)).as("n_bins"),
          sum(col("term")).cast("decimal(28,10)").as("psi_dec"))
        .select(col("n_bins"),
          col("psi_dec").cast("double").as("psi"))
        .withColumn("verdict",
          when(col("psi") < 0.1, "stable")
            .when(col("psi") < 0.25, "moderate_shift")
            .otherwise("major_shift"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q345_zone_map_fpr" ->
      s"""WITH o AS (
         |  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d
         |  FROM orders),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM o),
         |filed AS MATERIALIZED (
         |  SELECT d,
         |    (row_number() OVER (ORDER BY o_orderkey) - 1) * $Files
         |      // n_rows AS file_id
         |  FROM o CROSS JOIN n),
         |stats AS (
         |  SELECT file_id, min(d) AS lo, max(d) AS hi
         |  FROM filed GROUP BY 1),
         |months AS (SELECT unnest(range(1, 13)) AS m),
         |admitted AS (
         |  SELECT m, CAST(count(*) AS BIGINT) AS files_admitted
         |  FROM stats CROSS JOIN months
         |  WHERE lo <= last_day(make_date(1996, m, 1))
         |    AND hi >= make_date(1996, m, 1)
         |  GROUP BY 1),
         |actual AS (
         |  SELECT CAST(month(d) AS INTEGER) AS m,
         |    CAST(count(DISTINCT file_id) AS BIGINT) AS files_matching,
         |    CAST(count(*) AS BIGINT) AS rows_matching
         |  FROM filed WHERE year(d) = 1996 GROUP BY 1)
         |SELECT CAST(admitted.m AS INTEGER) AS m, files_admitted,
         |  files_matching, rows_matching,
         |  CAST(files_admitted - files_matching AS DOUBLE)
         |    / CAST(files_admitted AS DOUBLE) AS false_positive_rate
         |FROM admitted JOIN actual ON admitted.m = actual.m
         |ORDER BY m""".stripMargin,

    "q346_psi_drift" ->
      s"""WITH o AS (
         |  SELECT year(o_orderdate) AS yr,
         |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |      AS cents
         |  FROM orders WHERE year(o_orderdate) IN (1996, 1997)),
         |b AS (SELECT min(cents) AS lo, max(cents) AS hi FROM o),
         |binned AS (
         |  SELECT CAST(least((cents - lo) * $Bins // (hi - lo + 1),
         |      ${Bins - 1}) AS INTEGER) AS bin,
         |    CAST(count(*) FILTER (yr = 1996) AS BIGINT) AS c_a,
         |    CAST(count(*) FILTER (yr = 1997) AS BIGINT) AS c_b
         |  FROM o CROSS JOIN b GROUP BY 1),
         |tot AS (SELECT CAST(sum(c_a) AS BIGINT) AS n_a,
         |  CAST(sum(c_b) AS BIGINT) AS n_b FROM binned),
         |terms AS (
         |  SELECT CAST(round((CAST(c_a + 1 AS DOUBLE)
         |      / CAST(n_a + $Bins AS DOUBLE)
         |      - CAST(c_b + 1 AS DOUBLE) / CAST(n_b + $Bins AS DOUBLE))
         |    * ln(CAST(c_a + 1 AS DOUBLE) * CAST(n_b + $Bins AS DOUBLE)
         |      / (CAST(c_b + 1 AS DOUBLE)
         |        * CAST(n_a + $Bins AS DOUBLE))), 10)
         |    AS DECIMAL(20,10)) AS term
         |  FROM binned CROSS JOIN tot)
         |SELECT CAST(count(*) AS BIGINT) AS n_bins,
         |  CAST(CAST(sum(term) AS DECIMAL(28,10)) AS DOUBLE) AS psi,
         |  CASE WHEN CAST(CAST(sum(term) AS DECIMAL(28,10)) AS DOUBLE)
         |      < 0.1 THEN 'stable'
         |    WHEN CAST(CAST(sum(term) AS DECIMAL(28,10)) AS DOUBLE)
         |      < 0.25 THEN 'moderate_shift'
         |    ELSE 'major_shift' END AS verdict
         |FROM terms""".stripMargin,
  )
}
