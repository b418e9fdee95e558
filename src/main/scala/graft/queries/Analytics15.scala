package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 15 (SURVEY.md §2.4):
  *
  *  - q126: grid-bucketed spatial neighbor join — the 2D analog of
  *    q35's range join: points (deterministic md5-derived coords) land
  *    in 16×16 grid cells; each LEFT point probes its 3×3 cell
  *    neighborhood and meets RIGHT points in their single home cell,
  *    so every qualifying pair (distance ≤ ε = 15 < cell size) is
  *    found exactly once (dedup by id order, no distinct needed) and
  *    the join is equi on cell — never an all-pairs compare. The
  *    DuckDB oracle is the brute-force quadratic join, so a MATCH
  *    doubles as a completeness proof of the grid prune. Cell
  *    resolution is the density knob at scale (hash coords are
  *    uniform; real workloads tune cell ≈ ε against local density).
  *  - q127: quantile normalization — the rank-transform feature
  *    preprocessor: every account balance maps to its exact mid-rank
  *    quantile (rank − ½)/n via ONE range-partitioned GlobalPrefixSum
  *    scan (never a partition-less row_number window), ready for
  *    downstream equal-width bucketing of a skewed feature.
  */
object Analytics15 {
  import Tables.t

  private val Eps2 = 225L // ε = 15, strictly below the 16px cell size
  private val Cell = 16

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q126_grid_neighbor_join" -> ((spark, dir) => {
      val pts = t(spark, dir, "customer")
        .select(col("c_custkey").as("id"),
          (graft.functions.Md5Pack(col("c_custkey").cast("string")) % 1000)
            .as("x"),
          (graft.functions.Md5Pack(concat(col("c_custkey").cast("string"),
            lit(":y"))) % 1000).as("y"))
      val right = pts.select(col("id").as("b_id"), col("x").as("bx"),
          col("y").as("by"),
          (col("x") / Cell).cast("long").as("cx"),
          (col("y") / Cell).cast("long").as("cy"))
      val probes = pts
        .select(col("id").as("a_id"), col("x").as("ax"), col("y").as("ay"),
          explode(expr(
            "transform(sequence(0, 8), i -> named_struct(" +
              s"'cx', CAST(x AS BIGINT) div $Cell + i % 3 - 1, " +
              s"'cy', CAST(y AS BIGINT) div $Cell + i div 3 - 1))"))
            .as("c"))
        .select(col("a_id"), col("ax"), col("ay"),
          col("c.cx").as("cx"), col("c.cy").as("cy"))
      probes.join(right, Seq("cx", "cy"))
        .filter(col("a_id") < col("b_id"))
        .withColumn("dist2",
          (col("ax") - col("bx")) * (col("ax") - col("bx")) +
            (col("ay") - col("by")) * (col("ay") - col("by")))
        .filter(col("dist2") <= Eps2)
        .select(col("a_id"), col("b_id"), col("dist2"))
        .orderBy("a_id", "b_id")
    }),

    "q127_quantile_normalize" -> ((spark, dir) => {
      val cust = t(spark, dir, "customer")
        .select(col("c_custkey"), col("c_acctbal"))
      val totals = cust.agg(count(lit(1)).as("n"))
      val ranked = graft.operators.GlobalPrefixSum.withRunningTotalBy(
        cust.withColumn("one", lit(1L)),
        struct(col("c_acctbal").as("s"), col("c_custkey").as("k")),
        "one", "rnk")
      ranked.crossJoin(broadcast(totals))
        .select(col("c_custkey"), col("c_acctbal"), col("rnk"),
          round((col("rnk") - lit(0.5)) / col("n"), 6).as("quantile"))
        .orderBy("c_custkey")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q126_grid_neighbor_join" -> {
      val h = Tables.duckMd5Pack("CAST(c_custkey AS VARCHAR)")
      val hy = Tables.duckMd5Pack("CAST(c_custkey AS VARCHAR) || ':y'")
      s"""WITH pts AS (
         |  SELECT c_custkey AS id, $h % 1000 AS x, $hy % 1000 AS y
         |  FROM customer)
         |SELECT a.id AS a_id, b.id AS b_id,
         |  (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
         |FROM pts a JOIN pts b ON a.id < b.id
         |WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
         |  <= $Eps2
         |ORDER BY a_id, b_id""".stripMargin
    },

    "q127_quantile_normalize" ->
      """WITH ranked AS (
        |  SELECT c_custkey, c_acctbal,
        |    CAST(row_number() OVER (ORDER BY c_acctbal, c_custkey)
        |      AS BIGINT) AS rnk,
        |    CAST(count(*) OVER () AS BIGINT) AS n
        |  FROM customer)
        |SELECT c_custkey, c_acctbal, rnk,
        |  round((rnk - 0.5) / n, 6) AS quantile
        |FROM ranked ORDER BY c_custkey""".stripMargin,
  )
}
