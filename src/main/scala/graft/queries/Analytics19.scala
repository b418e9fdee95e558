package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 21 (SURVEY.md §2.4):
  *
  *  - q134: Holt linear-trend forecast — true double-exponential
  *    smoothing, not just q94's EMA: the last 10 revenue days pivot to
  *    one row (conditional aggregation over the calendar-bounded daily
  *    frame), then the level/trend recurrence unrolls as NINE chained
  *    steps GENERATED ONCE in Scala and rendered into both engines
  *    (the playbook render-once device; α = β = ½ makes every smoothing
  *    multiply an exact halving, and the identical expression chains
  *    make every add bit-identical). Outputs are raw doubles — no
  *    rounding boundary at all. DuckDB steps are MATERIALIZED CTEs
  *    (plain CTEs inline and a twice-referenced step would expand
  *    2^steps).
  *  - q135: degree assortativity — do high-degree customers trade with
  *    high-degree suppliers? Pearson correlation of endpoint degrees
  *    over the bipartite edge list, every moment an EXACT integer sum
  *    (degrees are ints); one float expression at the very end. Degree
  *    joins shuffle on their natural keys.
  */
object Analytics19 {
  import Tables.t

  /** (name, expr) chain for the unrolled Holt recurrence — the SAME
    * strings drive Spark withColumn and the DuckDB CTE steps.
    */
  private val holtSteps: Seq[(String, String)] =
    Seq("l1" -> "x1", "b1" -> "x2 - x1") ++
      (2 to 10).flatMap { t =>
        Seq(
          s"l$t" -> s"0.5 * x$t + 0.5 * (l${t - 1} + b${t - 1})",
          s"b$t" -> s"0.5 * (l$t - l${t - 1}) + 0.5 * b${t - 1}")
      }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q134_holt_forecast" -> ((spark, dir) => {
      val daily = t(spark, dir, "lineitem")
        .groupBy(to_date(col("l_shipdate")).as("day"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount").cast("decimal(18,2)"))).as("rev"))
      // calendar-bounded frame — the ordering window can't become a
      // scale bottleneck (the q123 precedent)
      val last10 = daily
        .withColumn("rn", row_number().over(Window.orderBy(col("day").desc)))
        .filter(col("rn") <= 10)
        .withColumn("p", lit(11) - col("rn"))
      val xs = (1 to 10).map(p =>
        sum(when(col("p") === p, col("rev").cast("double"))).as(s"x$p"))
      var row = last10.groupBy().agg(xs.head, xs.tail: _*)
      holtSteps.foreach { case (name, e) => row = row.withColumn(name, expr(e)) }
      row.select(col("x10").as("last_rev"), col("l10").as("level"),
        col("b10").as("trend"),
        expr("l10 + 1 * b10").as("forecast_1"),
        expr("l10 + 2 * b10").as("forecast_2"),
        expr("l10 + 3 * b10").as("forecast_3"))
    }),

    "q135_degree_assortativity" -> ((spark, dir) => {
      val edges = t(spark, dir, "lineitem")
        .join(t(spark, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
        .distinct()
      val cd = edges.groupBy("c").agg(count(lit(1)).as("c_deg"))
      val sd = edges.groupBy("s").agg(count(lit(1)).as("s_deg"))
      val e = edges.join(cd, "c").join(sd, "s")
        .select(col("c_deg").as("x"), col("s_deg").as("y"))
      e.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .select(col("n"),
          round(col("sx").cast("double") / col("n"), 6).as("mean_c_deg"),
          round(col("sy").cast("double") / col("n"), 6).as("mean_s_deg"),
          round((col("n") * col("sxy") - col("sx") * col("sy"))
            .cast("double") /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
              .cast("double") *
              (col("n") * col("syy") - col("sy") * col("sy"))
                .cast("double")), 6).as("assortativity"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q134_holt_forecast" -> {
      val pivotCols = (1 to 10)
        .map(p => s"sum(CASE WHEN p = $p THEN xv END) AS x$p")
        .mkString(",\n    ")
      val stepCtes = holtSteps.zipWithIndex.map { case ((name, e), i) =>
        val prev = if (i == 0) "base" else s"s$i"
        s"s${i + 1} AS MATERIALIZED (SELECT *, $e AS $name FROM $prev)"
      }.mkString(",\n")
      val last = s"s${holtSteps.size}"
      s"""WITH daily AS (
         |  SELECT CAST(l_shipdate AS DATE) AS day,
         |    sum(CAST(l_extendedprice AS DECIMAL(18,2))
         |      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev
         |  FROM lineitem GROUP BY 1),
         |ranked AS (
         |  SELECT CAST(rev AS DOUBLE) AS xv,
         |    11 - row_number() OVER (ORDER BY day DESC) AS p
         |  FROM daily ORDER BY day DESC LIMIT 10),
         |base AS (
         |  SELECT
         |    $pivotCols
         |  FROM ranked),
         |$stepCtes
         |SELECT x10 AS last_rev, l10 AS level, b10 AS trend,
         |  l10 + 1 * b10 AS forecast_1,
         |  l10 + 2 * b10 AS forecast_2,
         |  l10 + 3 * b10 AS forecast_3
         |FROM $last""".stripMargin
    },

    "q135_degree_assortativity" ->
      """WITH edges AS (
        |  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |cd AS (SELECT c, CAST(count(*) AS BIGINT) AS c_deg
        |       FROM edges GROUP BY c),
        |sd AS (SELECT s, CAST(count(*) AS BIGINT) AS s_deg
        |       FROM edges GROUP BY s),
        |e AS (
        |  SELECT c_deg AS x, s_deg AS y
        |  FROM edges JOIN cd USING (c) JOIN sd USING (s)),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM e)
        |SELECT n,
        |  round(CAST(sx AS DOUBLE) / n, 6) AS mean_c_deg,
        |  round(CAST(sy AS DOUBLE) / n, 6) AS mean_s_deg,
        |  round(CAST(n * sxy - sx * sy AS DOUBLE) /
        |    sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
        |      * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS assortativity
        |FROM m""".stripMargin,
  )
}
