package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 26 (SURVEY.md §2.4):
  *
  *  - q141: in-row CSV round-trip — the third in-row codec next to
  *    q12's JSON and q58's XML: each order renders to a CSV line and
  *    parses back through Spark's native from_csv with a typed schema
  *    (decimal money, DATE); the DuckDB oracle recomputes the
  *    expected fields directly, so any quoting/typing/format defect
  *    breaks the hash. Pure map, no shuffle.
  *  - q142: largest-remainder budget proration — Hamilton-method
  *    allocation of a fixed cent budget across nations by revenue
  *    weight: integer floor shares via DECIMAL(38,0)·div (no float
  *    cents anywhere), the ≤25 leftover cents distributed by
  *    remainder rank on the bounded nation frame, Σalloc ≡ budget by
  *    construction. The financial-allocation primitive that naive
  *    float proration gets wrong by a cent.
  */
object Analytics23 {
  import Tables.t

  private val BudgetCents = 100000000L // $1M

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q141_csv_roundtrip" -> ((spark, dir) => {
      val src = t(spark, dir, "orders")
        .filter(col("o_orderkey") % 20 === 0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice").cast("decimal(18,2)").as("tp"),
          to_date(col("o_orderdate")).as("od"))
      val lines = src.select(col("o_orderkey").as("src_key"),
        concat_ws(",",
          col("o_orderkey").cast("string"), col("o_custkey").cast("string"),
          col("o_orderstatus"), col("tp").cast("string"),
          date_format(col("od"), "yyyy-MM-dd")).as("line"))
      lines
        .withColumn("p", from_csv(col("line"), structType(
          "ok BIGINT, ck BIGINT, st STRING, tp DECIMAL(18,2), od DATE"),
          Map.empty[String, String]))
        .select(col("p.ok").as("ok"), col("p.ck").as("ck"),
          col("p.st").as("st"),
          // the round-trip itself is typed DECIMAL(18,2); the dumped
          // column is DOUBLE (driver parity: no decimal output columns)
          col("p.tp").cast("double").as("tp"), col("p.od").as("od"))
        .orderBy("ok")
    }),

    "q142_largest_remainder" -> ((spark, dir) => {
      val w = t(spark, dir, "orders")
        .join(t(spark, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nationkey"))
        .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
          .cast("long").as("w_cents"))
      val tot = w.agg(sum(col("w_cents")).as("total_w"))
      val shares = w.crossJoin(broadcast(tot))
        .withColumn("floor_cents", expr(
          s"CAST((CAST($BudgetCents AS DECIMAL(38,0)) * w_cents) div " +
            "total_w AS BIGINT)"))
        .withColumn("rem", expr(
          s"CAST($BudgetCents AS DECIMAL(38,0)) * w_cents - " +
            "CAST(floor_cents AS DECIMAL(38,0)) * total_w"))
      // ≤ 25-row frame: leftover distribution windows are bounded
      val leftover = shares.agg(
        (lit(BudgetCents) - sum(col("floor_cents"))).as("leftover"))
      shares.crossJoin(broadcast(leftover))
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("rem").desc, col("nationkey"))))
        .withColumn("extra", when(col("rnk") <= col("leftover"), 1L)
          .otherwise(0L))
        .select(col("nationkey"), col("w_cents"), col("floor_cents"),
          col("extra"), (col("floor_cents") + col("extra")).as("alloc_cents"))
        .orderBy("nationkey")
    }),
  )

  private def structType(ddl: String) =
    org.apache.spark.sql.types.StructType.fromDDL(ddl)

  val oracleSql: Map[String, String] = Map(
    "q141_csv_roundtrip" ->
      """SELECT o_orderkey AS ok, o_custkey AS ck, o_orderstatus AS st,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS tp,
        |  CAST(o_orderdate AS DATE) AS od
        |FROM orders WHERE o_orderkey % 20 = 0 ORDER BY ok""".stripMargin,

    "q142_largest_remainder" ->
      s"""WITH w AS (
         |  SELECT c_nationkey AS nationkey,
         |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
         |      AS w_cents
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  GROUP BY 1),
         |tot AS (SELECT CAST(sum(w_cents) AS BIGINT) AS total_w FROM w),
         |shares AS (
         |  SELECT nationkey, w_cents,
         |    CAST(CAST($BudgetCents AS HUGEINT) * w_cents // total_w
         |      AS BIGINT) AS floor_cents,
         |    CAST($BudgetCents AS HUGEINT) * w_cents -
         |      CAST(CAST($BudgetCents AS HUGEINT) * w_cents // total_w
         |        AS HUGEINT) * total_w AS rem
         |  FROM w CROSS JOIN tot),
         |lo AS (
         |  SELECT $BudgetCents - CAST(sum(floor_cents) AS BIGINT)
         |    AS leftover
         |  FROM shares),
         |ranked AS (
         |  SELECT *, row_number() OVER (ORDER BY rem DESC, nationkey)
         |    AS rnk
         |  FROM shares)
         |SELECT nationkey, w_cents, floor_cents,
         |  CAST(CASE WHEN rnk <= leftover THEN 1 ELSE 0 END AS BIGINT)
         |    AS extra,
         |  floor_cents + CAST(CASE WHEN rnk <= leftover THEN 1 ELSE 0 END
         |    AS BIGINT) AS alloc_cents
         |FROM ranked CROSS JOIN lo ORDER BY nationkey""".stripMargin,
  )
}
