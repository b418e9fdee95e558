package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 124 (SURVEY.md §2.4):
  *
  *  - q289: retention half-life — pooled weekly retention r_k (users
  *    active k weeks after their first week, over the cohorts that can
  *    still be observed at age k), then the exponential-decay fit
  *    ln r_k = a + b·k via closed-form OLS on the bounded week frame:
  *    ln terms round→DECIMAL(18,9) so every OLS moment is exact, and
  *    half-life = −ln 2/b is the one rounded double. The fact scan
  *    collapses to (user, week) FIRST; everything after is
  *    weeks²-bounded.
  *  - q290: Kaplan–Meier survival — order-fulfillment durations (order
  *    date → last line receipt), right-censored at the 1998-06-30
  *    administrative cutoff for orders still undelivered there.
  *    S(t) = Π(1 − d_i/n_i) over event days computes as
  *    exp(Σ ln(1 − d/n)) with per-day terms rounded→DECIMAL before the
  *    prefix sum — the at-risk counts come from reverse cumulative
  *    sums on the day-bounded frame, never a per-user scan.
  */
object Analytics107 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q289_retention_halflife" -> ((spark, dir) => {
      val uw = Tables.events(spark, dir)
        .select(col("user_id"),
          floor(datediff(col("ts").cast("date"), lit("2024-01-01")) / 7)
            .as("w"))
        .distinct()
        .localCheckpoint(true) // cohort anchor + activity probes
      val first = uw.groupBy("user_id").agg(min(col("w")).as("w0"))
      val maxW = uw.agg(max(col("w")).as("wmax"))
      val ages = first.join(uw, "user_id")
        .select(col("user_id"), col("w0"), (col("w") - col("w0")).as("k"))
        .filter(col("k") >= 1)
      // Pooled r_k: numerator = users active at age k; denominator =
      // users whose cohort can be observed at age k (w0 + k <= wmax).
      val num = ages.groupBy("k").agg(countDistinct(col("user_id")).as("act"))
      val den = first.crossJoin(broadcast(maxW))
        .select(col("user_id"), (col("wmax") - col("w0")).as("maxk"))
        .filter(col("maxk") >= 1)
      val denByK = num.select(col("k")).distinct()
        .join(den, col("maxk") >= col("k"))
        .groupBy("k").agg(count(lit(1)).as("obs"))
      val rk = num.join(denByK, "k")
        .select(col("k"), col("act"), col("obs"),
          expr("cast(round(ln(cast(act as double) / obs), 9) " +
            "as decimal(18,9))").as("lnr"))
        .localCheckpoint(true) // feeds the OLS moments twice
      val fit = rk.agg(
          count(lit(1)).as("n"),
          sum(col("k")).as("sx"),
          sum(expr("cast(k as decimal(38,0)) * k")).as("sxx"),
          sum(col("lnr")).as("sy"),
          sum(expr("cast(k as decimal(10,0)) * lnr")).as("sxy"))
        .select(col("n"),
          // Bounded casts keep every product inside DECIMAL(38,_):
          // long x decimal(38,9) overflows precision 38 and Spark's
          // allowPrecisionLoss silently TRUNCATES the scale to 6 —
          // found as a 6e-4 half-life drift against the oracle.
          expr("""cast((cast(n as decimal(10,0)) * cast(sxy as decimal(20,9))
                 |   - cast(sx as decimal(10,0)) * cast(sy as decimal(20,9)))
                 |  as double)
                 | / cast((cast(n as decimal(10,0)) * cast(sxx as decimal(20,0))
                 |   - cast(sx as decimal(20,0)) * sx)
                 |   as double)""".stripMargin).as("slope"))
      rk.crossJoin(broadcast(fit))
        .select(col("k"), col("act"), col("obs"),
          round(col("act").cast("double") / col("obs"), 6).as("r_k"),
          round(col("slope"), 6).as("slope"),
          // nullif: a flat (slope-0) retention curve has no finite
          // half-life — NULL, not an ANSI divide-by-zero.
          round(expr("-ln(cast(2 as double)) / nullif(slope, 0.0d)"), 6)
            .as("half_life_weeks"))
        .orderBy("k")
    }),

    "q290_survival_km" -> ((spark, dir) => {
      import Tables.t
      // Subject = an order's fulfillment: duration from order date to
      // the LAST line shipment; orders still undelivered at the
      // 1998-06-30 administrative cutoff are right-censored there.
      val cutoff = lit("1998-06-30").cast("date")
      val span = t(spark, dir, "lineitem")
        .groupBy(col("l_orderkey").as("ok"))
        .agg(max(col("l_shipdate")).as("done"))
        .join(t(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_orderdate")),
          col("ok") === col("o_orderkey"))
        .select(
          when(col("done") <= cutoff,
            datediff(col("done"), col("o_orderdate")))
            .otherwise(datediff(cutoff, col("o_orderdate")))
            .cast("long").as("dur"),
          (col("done") <= cutoff).as("delivered"))
        .filter(col("dur") >= 0)
      // Day-bounded life table: deaths per day; at-risk = everyone with
      // duration >= t (a reverse cumulative count over the day frame).
      val byDay = span.groupBy("dur")
        .agg(count(lit(1)).as("ending"),
          count_if(col("delivered")).as("deaths"))
      val wAfter = org.apache.spark.sql.expressions.Window
        .orderBy(col("dur").desc)
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)
      val wUpto = org.apache.spark.sql.expressions.Window.orderBy("dur")
      val km = byDay
        .withColumn("at_risk", sum(col("ending")).over(wAfter))
        .filter(col("deaths") > 0)
        .withColumn("lns", expr(
          """cast(round(ln(1.0 - cast(deaths as double) / at_risk), 9)
            |  as decimal(28,9))""".stripMargin))
        .withColumn("cuml", sum(col("lns")).over(wUpto))
      km.select(col("dur").as("day"), col("at_risk"), col("deaths"),
          round(exp(col("cuml").cast("double")), 6).as("survival"))
        .orderBy("day")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q289_retention_halflife" -> """
      WITH uw AS (
        SELECT DISTINCT user_id,
          datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS w
        FROM events),
      first AS (SELECT user_id, min(w) AS w0 FROM uw GROUP BY user_id),
      maxw AS (SELECT max(w) AS wmax FROM uw),
      ages AS (
        SELECT uw.user_id, w - w0 AS k
        FROM first JOIN uw USING (user_id)
        WHERE w - w0 >= 1),
      num AS (
        SELECT k, CAST(count(DISTINCT user_id) AS BIGINT) AS act
        FROM ages GROUP BY k),
      den AS (
        SELECT user_id, wmax - w0 AS maxk FROM first, maxw
        WHERE wmax - w0 >= 1),
      denbyk AS (
        SELECT k, CAST(count(*) AS BIGINT) AS obs
        FROM (SELECT DISTINCT k FROM num) ks
        JOIN den ON den.maxk >= ks.k
        GROUP BY k),
      rk AS (
        SELECT num.k, act, obs,
          CAST(round(ln(CAST(act AS DOUBLE) / obs), 9) AS DECIMAL(18,9))
            AS lnr
        FROM num JOIN denbyk ON num.k = denbyk.k),
      fit AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(sum(k) AS BIGINT) AS sx,
          sum(CAST(k AS HUGEINT) * k) AS sxx,
          sum(lnr) AS sy,
          sum(CAST(k AS DECIMAL(10,0)) * lnr) AS sxy
        FROM rk)
      SELECT k, act, obs,
        round(CAST(act AS DOUBLE) / obs, 6) AS r_k,
        round(CAST((n * sxy - sx * sy) AS DOUBLE)
          / CAST((n * sxx - CAST(sx AS HUGEINT) * sx) AS DOUBLE), 6)
          AS slope,
        round(-ln(CAST(2 AS DOUBLE))
          / nullif(CAST((n * sxy - sx * sy) AS DOUBLE)
            / CAST((n * sxx - CAST(sx AS HUGEINT) * sx) AS DOUBLE), 0.0), 6)
          AS half_life_weeks
      FROM rk, fit
      ORDER BY k""",

    "q290_survival_km" -> """
      WITH span AS (
        SELECT
          CASE WHEN done <= DATE '1998-06-30'
            THEN datediff('day', o_orderdate, done)
            ELSE datediff('day', o_orderdate, DATE '1998-06-30') END
            AS dur,
          done <= DATE '1998-06-30' AS delivered
        FROM (
          SELECT l_orderkey AS ok, max(l_shipdate) AS done
          FROM lineitem GROUP BY l_orderkey)
        JOIN orders ON ok = o_orderkey),
      spanf AS (SELECT * FROM span WHERE dur >= 0),
      byday AS (
        SELECT dur, CAST(count(*) AS BIGINT) AS ending,
          CAST(count(*) FILTER (WHERE delivered) AS BIGINT) AS deaths
        FROM spanf GROUP BY dur),
      km AS (
        SELECT dur, ending, deaths,
          CAST(sum(ending) OVER (ORDER BY dur DESC) AS BIGINT) AS at_risk
        FROM byday),
      terms AS (
        SELECT dur, at_risk, deaths,
          CAST(round(ln(1.0 - CAST(deaths AS DOUBLE) / at_risk), 9)
            AS DECIMAL(28,9)) AS lns
        FROM km WHERE deaths > 0),
      curve AS (
        SELECT dur, at_risk, deaths,
          sum(lns) OVER (ORDER BY dur) AS cuml
        FROM terms)
      SELECT dur AS day, at_risk, deaths,
        round(exp(CAST(cuml AS DOUBLE)), 6) AS survival
      FROM curve
      ORDER BY day""",
  )
}
