package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 34 (SURVEY.md §2.4) — inventory lifecycle:
  *
  *  - q153: ABC class migration — the quarter-over-quarter view
  *    merchandisers act on: which parts moved between Pareto classes as
  *    demand shifted? The q147 classification runs once per period
  *    (same exact-decimal boundaries, one GlobalPrefixSum scan each),
  *    a full-outer join on part aligns the two periods, and parts
  *    absent from a period class as 'N'. The transition matrix is at
  *    most 4×4 rows regardless of scale.
  *  - q154: dead-stock aging — parts bucketed by days since their last
  *    shipment (90-day buckets, never-shipped parts in a sentinel
  *    bucket), with the retail capital locked in each bucket. Integer
  *    day arithmetic and exact-decimal cents throughout; the per-part
  *    max and the part join shuffle on partkey once each.
  */
object Analytics30 {
  import Tables.t

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  /** q147's classification over an arbitrary lineitem slice. */
  private def abcOf(li: DataFrame): DataFrame = {
    val rev = li.groupBy(col("l_partkey"))
      .agg(sum(dec(col("l_extendedprice")) *
          (lit(1) - dec(col("l_discount"))))
        .cast("decimal(18,4)").as("rev"))
    val ranked = graft.operators.GlobalPrefixSum.withRunningTotalBy(
      rev, struct((-col("rev")).as("s"), col("l_partkey").as("k")),
      "rev", "cum_raw")
    val tot = rev.agg(sum(col("rev")).cast("decimal(28,4)").as("tot"))
    ranked.withColumn("cum", col("cum_raw").cast("decimal(28,4)"))
      .crossJoin(broadcast(tot))
      .select(col("l_partkey"),
        when(col("cum") * lit(5).cast("decimal(2,0)") <=
            col("tot") * lit(4).cast("decimal(2,0)"), "A")
          .when(col("cum") * lit(20).cast("decimal(2,0)") <=
            col("tot") * lit(19).cast("decimal(2,0)"), "B")
          .otherwise("C").as("abc"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q153_abc_migration" -> ((spark, dir) => {
      val li = t(spark, dir, "lineitem")
      val h1 = abcOf(li.filter(year(col("l_shipdate")) < 1998))
        .select(col("l_partkey"), col("abc").as("class_h1"))
      val h2 = abcOf(li.filter(year(col("l_shipdate")) >= 1998))
        .select(col("l_partkey"), col("abc").as("class_h2"))
      h1.join(h2, Seq("l_partkey"), "full_outer")
        .select(coalesce(col("class_h1"), lit("N")).as("class_h1"),
          coalesce(col("class_h2"), lit("N")).as("class_h2"))
        .groupBy("class_h1", "class_h2")
        .agg(count(lit(1)).as("n_parts"))
        .orderBy("class_h1", "class_h2")
    }),

    "q154_dead_stock" -> ((spark, dir) => {
      val li = t(spark, dir, "lineitem")
      val lastShip = li.groupBy(col("l_partkey"))
        .agg(max(to_date(col("l_shipdate"))).as("last_ship"))
      val maxd = li.agg(max(to_date(col("l_shipdate"))).as("maxd"))
      t(spark, dir, "part")
        .join(lastShip, col("p_partkey") === col("l_partkey"), "left")
        .crossJoin(broadcast(maxd))
        .withColumn("bucket",
          when(col("last_ship").isNull, lit(99))
            .otherwise(expr("datediff(maxd, last_ship) div 90")
              .cast("int")))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_parts"),
          sum((col("p_retailprice").cast("decimal(18,2)") * 100)
            .cast("decimal(18,0)")).cast("long")
            .as("retail_cents"))
        .orderBy("bucket")
    }),
  )

  private val AbcSql =
    """SELECT l_partkey,
      |    CASE
      |      WHEN cum * CAST(5 AS DECIMAL(2,0))
      |        <= tot * CAST(4 AS DECIMAL(2,0)) THEN 'A'
      |      WHEN cum * CAST(20 AS DECIMAL(2,0))
      |        <= tot * CAST(19 AS DECIMAL(2,0)) THEN 'B'
      |      ELSE 'C' END AS abc
      |  FROM (
      |    SELECT l_partkey, rev,
      |      CAST(sum(rev) OVER (ORDER BY rev DESC, l_partkey)
      |        AS DECIMAL(28,4)) AS cum,
      |      CAST(sum(rev) OVER () AS DECIMAL(28,4)) AS tot
      |    FROM (
      |      SELECT l_partkey,
      |        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |          * (1 - CAST(l_discount AS DECIMAL(18,2))))
      |          AS DECIMAL(18,4)) AS rev
      |      FROM lineitem WHERE PERIOD
      |      GROUP BY 1))""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q153_abc_migration" -> {
      val h1 = AbcSql.replace("PERIOD", "year(l_shipdate) < 1998")
      val h2 = AbcSql.replace("PERIOD", "year(l_shipdate) >= 1998")
      s"""WITH h1 AS ($h1),
         |h2 AS ($h2)
         |SELECT coalesce(h1.abc, 'N') AS class_h1,
         |  coalesce(h2.abc, 'N') AS class_h2,
         |  CAST(count(*) AS BIGINT) AS n_parts
         |FROM h1 FULL OUTER JOIN h2 ON h1.l_partkey = h2.l_partkey
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },

    "q154_dead_stock" ->
      """WITH last_ship AS (
        |  SELECT l_partkey, max(CAST(l_shipdate AS DATE)) AS last_ship
        |  FROM lineitem GROUP BY 1),
        |maxd AS (SELECT max(CAST(l_shipdate AS DATE)) AS maxd
        |  FROM lineitem),
        |b AS (
        |  SELECT CASE WHEN last_ship IS NULL THEN 99
        |      ELSE CAST(date_diff('day', last_ship, maxd) // 90 AS INT)
        |      END AS bucket,
        |    p_retailprice
        |  FROM part LEFT JOIN last_ship ON p_partkey = l_partkey
        |  CROSS JOIN maxd)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n_parts,
        |  CAST(sum(CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100
        |    AS DECIMAL(18,0))) AS BIGINT) AS retail_cents
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
