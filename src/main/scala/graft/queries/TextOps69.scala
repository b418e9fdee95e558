package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 additions, batch 69 (SURVEY.md §2.4):
  *
  *  - d55: temperature-scaled source mixing — the training-mix
  *    allocator that keeps big sources from drowning the corpus:
  *    source i gets budget share ∝ n_i^α with α = 1/2. α = 1/2 is
  *    deliberate: sqrt is correctly rounded in every engine (pow(x, α)
  *    for general α is not), and the weights are floored into integer
  *    micro-units so the largest-remainder split of the 10,000-doc
  *    budget — the q142 device — is exact Long arithmetic end to end.
  *    Per-source sampling rates fall out as raw double quotients of
  *    two small integers (identical bits cross-engine, no rounding).
  *    One tiny aggregation; the source frame is dimension-sized.
  */
object TextOps69 {
  import Tables.t

  private val Budget = 10000L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d55_temperature_mix" -> ((spark, dir) => {
      val per = t(spark, dir, "documents")
        .filter(col("text").isNotNull)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("w", floor(sqrt(col("n_docs").cast("double"))
          * 1e6).cast("long"))
      val tot = per.agg(sum(col("w")).as("big_w"))
      val base = per.crossJoin(broadcast(tot))
        .withColumn("floor_alloc", expr(s"$Budget * w div big_w"))
        .withColumn("rem", expr(s"$Budget * w - floor_alloc * big_w"))
      val leftover = base
        .agg((lit(Budget) - sum(col("floor_alloc"))).as("left"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("rem").desc, col("source"))
      // the ranking window runs on the SOURCE frame (dimension-sized);
      // the +1 goes to the `left` largest remainders, q142-style
      base.crossJoin(broadcast(leftover))
        .withColumn("rk", row_number().over(w))
        .select(col("source"), col("n_docs"), col("w").as("weight"),
          (col("floor_alloc") +
            when(col("rk") <= col("left"), 1L).otherwise(0L))
            .as("alloc"))
        .withColumn("sample_rate",
          col("alloc").cast("double") / col("n_docs").cast("double"))
        .orderBy("source")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "d55_temperature_mix" ->
      s"""WITH per AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 1e6) AS BIGINT)
         |      AS w
         |  FROM documents WHERE text IS NOT NULL GROUP BY 1),
         |tot AS (SELECT CAST(sum(w) AS BIGINT) AS big_w FROM per),
         |base AS (
         |  SELECT source, n_docs, w,
         |    $Budget * w // big_w AS floor_alloc,
         |    $Budget * w - ($Budget * w // big_w) * big_w AS rem
         |  FROM per CROSS JOIN tot),
         |lo AS (
         |  SELECT $Budget - CAST(sum(floor_alloc) AS BIGINT) AS leftv
         |  FROM base),
         |rk AS (
         |  SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk
         |  FROM base)
         |SELECT source, n_docs, w AS weight,
         |  CAST(floor_alloc + CASE WHEN rk <= leftv THEN 1 ELSE 0 END
         |    AS BIGINT) AS alloc,
         |  CAST(floor_alloc + CASE WHEN rk <= leftv THEN 1 ELSE 0 END
         |    AS DOUBLE) / CAST(n_docs AS DOUBLE) AS sample_rate
         |FROM rk CROSS JOIN lo ORDER BY source""".stripMargin,
  )
}
