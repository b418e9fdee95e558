package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 81 (SURVEY.md §2.4):
  *
  *  - q235: domain CHECK-constraint audit — the declarative column
  *    contracts a warehouse would enforce as CHECKs, evaluated as one
  *    scan per table and reported one row per constraint: discounts in
  *    [0, 0.10], tax in [0, 0.08], quantities in 1..50, prices
  *    positive, ship dates inside the corpus era, and keys positive.
  *    All-zero violations is the testdata contract; each row carries
  *    its checked-row count so a silently-empty scan can't fake a
  *    pass. Single pass per table (the constraints share the scan via
  *    one aggregate projection), then an unpivot to the report shape.
  */
object Analytics74 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q235_domain_checks" -> ((spark, dir) => {
      val li = t(spark, dir, "lineitem")
      val liChecks = li.agg(
        count(lit(1)).as("n"),
        count_if(col("l_discount") < 0 || col("l_discount") > 0.10001)
          .as("c_discount_range"),
        count_if(col("l_tax") < 0 || col("l_tax") > 0.08001)
          .as("c_tax_range"),
        count_if(col("l_quantity") < 1 || col("l_quantity") > 50)
          .as("c_quantity_range"),
        count_if(col("l_extendedprice") <= 0).as("c_price_positive"),
        count_if(year(col("l_shipdate")) < 1990
          || year(col("l_shipdate")) > 2010).as("c_shipdate_era"),
        count_if(col("l_orderkey") < 0 || col("l_partkey") < 0
          || col("l_suppkey") < 0).as("c_keys_nonneg"))
      liChecks.select(expr(
        """stack(6,
          |  'lineitem.discount_range', n, c_discount_range,
          |  'lineitem.keys_nonneg', n, c_keys_nonneg,
          |  'lineitem.price_positive', n, c_price_positive,
          |  'lineitem.quantity_range', n, c_quantity_range,
          |  'lineitem.shipdate_era', n, c_shipdate_era,
          |  'lineitem.tax_range', n, c_tax_range)
          |  AS (check_name, n_rows, n_violations)""".stripMargin))
        .orderBy("check_name")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q235_domain_checks" ->
      """WITH a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(*) FILTER (l_discount < 0 OR l_discount > 0.10001)
        |      AS BIGINT) AS c_discount_range,
        |    CAST(count(*) FILTER (l_tax < 0 OR l_tax > 0.08001)
        |      AS BIGINT) AS c_tax_range,
        |    CAST(count(*) FILTER (l_quantity < 1 OR l_quantity > 50)
        |      AS BIGINT) AS c_quantity_range,
        |    CAST(count(*) FILTER (l_extendedprice <= 0)
        |      AS BIGINT) AS c_price_positive,
        |    CAST(count(*) FILTER (year(l_shipdate) < 1990
        |      OR year(l_shipdate) > 2010) AS BIGINT) AS c_shipdate_era,
        |    CAST(count(*) FILTER (l_orderkey < 0 OR l_partkey < 0
        |      OR l_suppkey < 0) AS BIGINT) AS c_keys_nonneg
        |  FROM lineitem)
        |SELECT 'lineitem.discount_range' AS check_name, n AS n_rows,
        |  c_discount_range AS n_violations FROM a
        |UNION ALL SELECT 'lineitem.keys_nonneg', n, c_keys_nonneg FROM a
        |UNION ALL SELECT 'lineitem.price_positive', n, c_price_positive FROM a
        |UNION ALL SELECT 'lineitem.quantity_range', n, c_quantity_range FROM a
        |UNION ALL SELECT 'lineitem.shipdate_era', n, c_shipdate_era FROM a
        |UNION ALL SELECT 'lineitem.tax_range', n, c_tax_range FROM a
        |ORDER BY check_name""".stripMargin,
  )
}
