package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 151 (SURVEY.md §2.4 operations):
  *
  *  - q329: joint ABC–XYZ inventory classification for 1995 — ABC by
  *    cumulative value share (80 / 95% breaks), XYZ by demand
  *    variability (CV of the DENSE monthly quantity series, zero
  *    months included). The ABC cumulative ranking runs through
  *    GlobalPrefixSum (range-partitioned scan, not a single-task
  *    window) and the class breaks compare exact decimals
  *    (cum·100 ≤ 80·total — no doubles, no boundary drift); CV
  *    carries a sqrt so its 0.5/1.0 breaks cannot tie across
  *    engines. Output: the 9-cell class matrix with part counts and
  *    value mass — the planner's stocking-policy grid.
  */
object Analytics127 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q329_abc_xyz" -> ((spark, dir) => {
      val li95 = t(spark, dir, "lineitem")
        .filter(year(col("l_shipdate")) === 1995)
        .select(col("l_partkey").as("pk"),
          month(col("l_shipdate")).as("mo"),
          expr("cast(round(l_extendedprice, 2) as decimal(18,2))")
            .as("val"),
          expr("cast(round(l_quantity, 2) as decimal(18,2))").as("qty"))
      val value = li95.groupBy("pk").agg(sum(col("val")).as("v"))
      // ABC: range-partitioned cumulative value (desc), exact-decimal
      // share breaks
      val cum = graft.operators.GlobalPrefixSum.withRunningTotalBy(
        value, struct((col("v") * -1).as("nv"), col("pk")), "v", "cumv")
      val total = value.agg(sum(col("v")).as("tv"))
      val abc = cum.crossJoin(broadcast(total))
        .select(col("pk"), col("v"),
          when(col("cumv") * 100 <= col("tv") * 80, "A")
            .when(col("cumv") * 100 <= col("tv") * 95, "B")
            .otherwise("C").as("abc"))
      // XYZ: CV over the dense 12-month quantity series
      val dense = value.select("pk")
        .crossJoin(spark.range(1, 13).select(col("id").cast("int")
          .as("mo")))
        .join(li95.groupBy("pk", "mo").agg(sum(col("qty")).as("q")),
          Seq("pk", "mo"), "left")
        .select(col("pk"), coalesce(col("q"),
          lit(0).cast("decimal(28,2)")).as("q"))
      val xyz = dense.groupBy("pk").agg(sum(col("q")).as("sq"),
          sum(expr("cast(q as decimal(38,4)) * q")).as("sqq"))
        .select(col("pk"), expr(
          """case
            |  when sq = 0 then 'Z'
            |  when sqrt((cast(sqq as double)
            |      - 12 * (cast(sq as double) / 12)
            |        * (cast(sq as double) / 12)) / 11)
            |    / (cast(sq as double) / 12) <= 0.5d then 'X'
            |  when sqrt((cast(sqq as double)
            |      - 12 * (cast(sq as double) / 12)
            |        * (cast(sq as double) / 12)) / 11)
            |    / (cast(sq as double) / 12) <= 1.0d then 'Y'
            |  else 'Z' end""".stripMargin).as("xyz"))
      abc.join(xyz, "pk")
        .groupBy("abc", "xyz")
        .agg(count(lit(1)).as("n_parts"),
          sum(col("v")).cast("double").as("value_mass"))
        .orderBy("abc", "xyz")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q329_abc_xyz" -> """
      WITH li95 AS (
        SELECT l_partkey AS pk, month(l_shipdate) AS mo,
          CAST(round(l_extendedprice, 2) AS DECIMAL(18,2)) AS val,
          CAST(round(l_quantity, 2) AS DECIMAL(18,2)) AS qty
        FROM lineitem WHERE year(l_shipdate) = 1995),
      value AS (SELECT pk, sum(val) AS v FROM li95 GROUP BY pk),
      cum AS (
        SELECT pk, v,
          sum(v) OVER (ORDER BY v DESC, pk) AS cumv
        FROM value),
      total AS (SELECT sum(v) AS tv FROM value),
      abc AS (
        SELECT pk, v,
          CASE WHEN cumv * 100 <= tv * 80 THEN 'A'
               WHEN cumv * 100 <= tv * 95 THEN 'B'
               ELSE 'C' END AS abc
        FROM cum CROSS JOIN total),
      dense AS (
        SELECT value.pk, mo,
          coalesce(q, CAST(0 AS DECIMAL(28,2))) AS q
        FROM value
        CROSS JOIN (SELECT unnest(generate_series(1, 12)) AS mo) m
        LEFT JOIN (SELECT pk, mo AS qmo, sum(qty) AS q FROM li95
                   GROUP BY pk, mo) lq
          ON value.pk = lq.pk AND m.mo = lq.qmo),
      xyz AS (
        SELECT pk,
          CASE
            WHEN sum(q) = 0 THEN 'Z'
            WHEN sqrt((CAST(sum(CAST(q AS DECIMAL(38,4)) * q) AS DOUBLE)
                - 12 * (CAST(sum(q) AS DOUBLE) / 12)
                  * (CAST(sum(q) AS DOUBLE) / 12)) / 11)
              / (CAST(sum(q) AS DOUBLE) / 12) <= 0.5 THEN 'X'
            WHEN sqrt((CAST(sum(CAST(q AS DECIMAL(38,4)) * q) AS DOUBLE)
                - 12 * (CAST(sum(q) AS DOUBLE) / 12)
                  * (CAST(sum(q) AS DOUBLE) / 12)) / 11)
              / (CAST(sum(q) AS DOUBLE) / 12) <= 1.0 THEN 'Y'
            ELSE 'Z' END AS xyz
        FROM dense GROUP BY pk)
      SELECT abc.abc, xyz.xyz, CAST(count(*) AS BIGINT) AS n_parts,
        CAST(sum(v) AS DOUBLE) AS value_mass
      FROM abc JOIN xyz ON abc.pk = xyz.pk
      GROUP BY abc.abc, xyz.xyz
      ORDER BY abc, xyz""",
  )
}
