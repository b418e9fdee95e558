package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 97 (SURVEY.md §2.4):
  *
  *  - q253: histogram intersection — the simplest distribution-overlap
  *    measure (Σ min(p_i, q_i), 1 = identical, 0 = disjoint), here
  *    between each adjacent pair of years over the order-priority mix.
  *    Complements the divergence family (PSI q120, KS q72, CvM q152)
  *    with the bounded, symmetric member. Exact rationals: the min
  *    runs on count×opposite-total cross-products so no division
  *    happens before the single final rounding.
  */
object Analytics87 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q253_histogram_intersection" -> ((spark, dir) => {
      val o = t(spark, dir, "orders")
        .select(year(col("o_orderdate")).as("y"), col("o_orderpriority"))
      val counts = o.groupBy("y", "o_orderpriority")
        .agg(count(lit(1)).as("c"))
      val totals = counts.groupBy("y").agg(sum(col("c")).as("t"))
      val a = counts.join(totals, "y")
        .select(col("y").as("y1"), col("o_orderpriority").as("p"),
          col("c").as("c1"), col("t").as("t1"))
      val b = counts.join(totals, "y")
        .select(col("y").as("y2"), col("o_orderpriority").as("p"),
          col("c").as("c2"), col("t").as("t2"))
      a.join(b, col("y2") === col("y1") + 1 && a("p") === b("p"))
        // min(c1/t1, c2/t2) = min(c1*t2, c2*t1) / (t1*t2): stay integer
        .groupBy("y1", "y2")
        .agg(sum(least(col("c1").cast("decimal(19,0)") * col("t2"),
            col("c2").cast("decimal(19,0)") * col("t1"))
            .cast("decimal(38,0)")).as("num"),
          first((col("t1").cast("decimal(19,0)") * col("t2"))
            .cast("decimal(38,0)")).as("den"),
          count(lit(1)).as("n_buckets"))
        .select(col("y1"), col("y2"), col("n_buckets"),
          round(col("num").cast("double") / col("den").cast("double"), 6)
            .as("intersection"))
        .orderBy("y1")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q253_histogram_intersection" ->
      """WITH o AS (
        |  SELECT CAST(year(o_orderdate) AS INTEGER) AS y, o_orderpriority
        |  FROM orders),
        |counts AS (
        |  SELECT y, o_orderpriority, CAST(count(*) AS BIGINT) AS c
        |  FROM o GROUP BY 1, 2),
        |totals AS (SELECT y, CAST(sum(c) AS BIGINT) AS t
        |           FROM counts GROUP BY 1),
        |j AS (
        |  SELECT a.y AS y1, b.y AS y2, a.o_orderpriority,
        |    a.c AS c1, ta.t AS t1, b.c AS c2, tb.t AS t2
        |  FROM counts a JOIN totals ta ON a.y = ta.y
        |  JOIN counts b ON b.y = a.y + 1
        |    AND b.o_orderpriority = a.o_orderpriority
        |  JOIN totals tb ON b.y = tb.y)
        |SELECT y1, y2, CAST(count(*) AS BIGINT) AS n_buckets,
        |  round(CAST(CAST(sum(least(c1 * t2, c2 * t1)) AS DECIMAL(38,0))
        |    AS DOUBLE) / CAST(CAST(min(t1 * t2) AS DECIMAL(38,0))
        |    AS DOUBLE), 6) AS intersection
        |FROM j GROUP BY 1, 2 ORDER BY y1""".stripMargin,
  )
}
