package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 53 (SURVEY.md §2.4):
  *
  *  - q191: FK fan-out profile — per relationship (orders→lineitem,
  *    customer→orders) the min/max/mean/median children per parent,
  *    zero-child parents included. The modeling audit that catches
  *    "this join will explode". The median is exact: the fan-out
  *    histogram is bounded by the distinct count values, and the
  *    2·cum ≥ n lower-median test runs on that tiny frame — no global
  *    sort of parents.
  */
object Analytics50 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q191_fk_fanout_profile" -> ((spark, dir) => {
      def profile(rel: String, parents: DataFrame, pk: String,
          children: DataFrame, fk: String): DataFrame = {
        val cnt = parents
          .join(children, col(pk) === col(fk), "left")
          .groupBy(col(pk))
          .agg(count(col(fk)).as("c"))
        val hist = cnt.groupBy("c").agg(count(lit(1)).as("f"))
        val tot = hist.agg(sum(col("f")).as("n_parents"),
          sum(col("c") * col("f")).as("n_children"),
          min(col("c")).as("min_c"), max(col("c")).as("max_c"))
        val wc = org.apache.spark.sql.expressions.Window.orderBy("c")
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)
        // bounded histogram frame: the global window is fine here
        val med = hist.withColumn("cum", sum(col("f")).over(wc))
          .crossJoin(broadcast(tot.select(col("n_parents").as("np"))))
          .filter(col("cum") * 2 >= col("np"))
          .agg(min(col("c")).as("median_c"))
        tot.crossJoin(broadcast(med))
          .select(lit(rel).as("relationship"), col("n_parents"),
            col("n_children"), col("min_c"), col("max_c"),
            round(col("n_children").cast("double")
              / col("n_parents").cast("double"), 6).as("mean_c"),
            col("median_c"))
      }
      val a = profile("orders->lineitem",
        t(spark, dir, "orders").select(col("o_orderkey")), "o_orderkey",
        t(spark, dir, "lineitem").select(col("l_orderkey")), "l_orderkey")
      val b = profile("customer->orders",
        t(spark, dir, "customer").select(col("c_custkey")), "c_custkey",
        t(spark, dir, "orders").select(col("o_custkey")), "o_custkey")
      a.unionAll(b).orderBy("relationship")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q191_fk_fanout_profile" -> {
      def rel(name: String, ptab: String, pk: String, ctab: String,
          fk: String) =
        s"""SELECT '$name' AS relationship,
           |  CAST(sum(f) AS BIGINT) AS n_parents,
           |  CAST(sum(c * f) AS BIGINT) AS n_children,
           |  CAST(min(c) AS BIGINT) AS min_c, CAST(max(c) AS BIGINT) AS max_c,
           |  round(CAST(sum(c * f) AS DOUBLE) / CAST(sum(f) AS DOUBLE), 6)
           |    AS mean_c,
           |  (SELECT CAST(min(c) AS BIGINT) FROM (
           |     SELECT c, sum(f) OVER (ORDER BY c
           |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           |     FROM (SELECT c, CAST(count(*) AS BIGINT) AS f FROM (
           |       SELECT p.$pk, count(ch.$fk) AS c
           |       FROM $ptab p LEFT JOIN $ctab ch ON p.$pk = ch.$fk
           |       GROUP BY 1) GROUP BY 1))
           |   CROSS JOIN (SELECT count(*) AS np FROM $ptab)
           |   WHERE cum * 2 >= np) AS median_c
           |FROM (SELECT c, CAST(count(*) AS BIGINT) AS f FROM (
           |  SELECT p.$pk, count(ch.$fk) AS c
           |  FROM $ptab p LEFT JOIN $ctab ch ON p.$pk = ch.$fk
           |  GROUP BY 1) GROUP BY 1)""".stripMargin
      s"""${rel("orders->lineitem", "orders", "o_orderkey",
        "lineitem", "l_orderkey")}
         |UNION ALL
         |${rel("customer->orders", "customer", "c_custkey",
        "orders", "o_custkey")}
         |ORDER BY relationship""".stripMargin
    },
  )
}
