package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 120 (SURVEY.md §2.4):
  *
  *  - q282: bitemporal point-in-time audit — valid time AND transaction
  *    time. Finished orders receive a retroactive 5% price correction
  *    RECORDED 30 days after the order date; the query asks, for two
  *    transaction-time snapshots, "what did we BELIEVE the 1995-H1
  *    revenue was?" Version selection is one max_by over the
  *    per-order version frame (≤ 2 versions/order, the argmax key is
  *    the recording date); money is exact integer cents end to end.
  *  - q283: histogram-interpolated quantiles — the one-pass scalable
  *    quantile path beside the exact median (q14-family) and the KMV
  *    sketch (q38): fixed-width buckets aggregate map-side, the
  *    cumulative walk runs on the bucket-bounded (SF-independent)
  *    frame, and p50/p95/p99 interpolate linearly inside the covering
  *    bucket. The oracle replays the same histogram estimate — the
  *    contract is the METHOD, deterministic at any scale, not the
  *    exact order statistic it approximates.
  */
object Analytics103 {
  import Tables.t

  /** q283 bucket width in price units. */
  private val W = 25000L

  private val Quantiles: Seq[(String, Int)] =
    Seq(("p50", 50), ("p95", 95), ("p99", 99))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q282_bitemporal" -> ((spark, dir) => {
      val o = t(spark, dir, "orders")
        .select(col("o_orderkey").as("ok"), col("o_orderdate").as("vd"),
          round(col("o_totalprice") * 100).cast("long").as("cents"),
          col("o_orderstatus").as("st"))
        .localCheckpoint(true) // original + correction version branches
      val v1 = o.select(col("ok"), col("vd"), col("cents"),
        col("vd").as("txn_from"))
      val v2 = o.filter(col("st") === "F")
        .select(col("ok"), col("vd"),
          expr("cents * 95 div 100").as("cents"),
          date_add(col("vd"), 30).as("txn_from"))
      val versions = v1.union(v2)
      val probes = Seq("1996-01-01", "1998-01-01")
      val frames = probes.map { asOf =>
        versions
          .filter(col("txn_from") <= lit(asOf).cast("date"))
          .groupBy("ok", "vd")
          .agg(max_by(col("cents"), col("txn_from")).as("cents"))
          .filter(col("vd") >= lit("1995-01-01").cast("date")
            && col("vd") < lit("1995-07-01").cast("date"))
          .agg(count(lit(1)).as("n_orders"),
            sum(col("cents")).as("cents"))
          .select(lit(asOf).as("txn_asof"), col("n_orders"),
            round(col("cents").cast("double") / 100, 2).as("believed_revenue"))
      }
      frames.reduce(_ union _).orderBy("txn_asof")
    }),

    "q283_histogram_quantiles" -> ((spark, dir) => {
      val hist = t(spark, dir, "orders")
        .select(expr(
          s"cast(round(o_totalprice * 100) as bigint) div 100 div $W")
          .as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("c"))
      // Bucket-bounded cumulative walk (price range / W buckets — an
      // SF-independent frame, so the global window is a ~25-row sort).
      val cum = hist
        .withColumn("cum", sum(col("c")).over(
          org.apache.spark.sql.expressions.Window.orderBy("bucket")))
        .crossJoin(broadcast(t(spark, dir, "orders")
          .agg(count(lit(1)).as("n"))))
        .localCheckpoint(true) // one scan feeds all three quantile picks
      val rows = Quantiles.map { case (name, pct) =>
        // target rank = ceil(pct% of N) in exact integers.
        val target = expr(s"(n * $pct + 99) div 100")
        cum.filter(col("cum") >= target)
          .agg(graft.functions.TopKAgg.minK(
            struct(col("bucket"), col("cum"), col("c"), col("n")), 1)
            .as("w"))
          .select(lit(name).as("quantile"),
            col("w")(0)("n").as("n"),
            col("w")(0)("bucket").as("bucket"),
            round(col("w")(0)("bucket") * W
              + lit(W) * (expr(s"(w[0].n * $pct + 99) div 100")
                - (col("w")(0)("cum") - col("w")(0)("c")))
                .cast("double") / col("w")(0)("c"), 4).as("estimate"))
      }
      rows.reduce(_ union _).orderBy("quantile")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q282_bitemporal" -> {
      val snaps = Seq("1996-01-01", "1998-01-01").map { asOf =>
        s"""SELECT DATE '$asOf' AS snap"""
      }.mkString(" UNION ALL ")
      s"""
      WITH o AS (
        SELECT o_orderkey AS ok, o_orderdate AS vd,
          CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
          o_orderstatus AS st
        FROM orders),
      versions AS (
        SELECT ok, vd, cents, vd AS txn_from FROM o
        UNION ALL
        SELECT ok, vd, cents * 95 // 100 AS cents,
          vd + INTERVAL 30 DAY AS txn_from
        FROM o WHERE st = 'F'),
      snaps AS ($snaps),
      believed AS (
        SELECT s.snap, v.ok, v.vd,
          arg_max(v.cents, v.txn_from) AS cents
        FROM versions v JOIN snaps s ON v.txn_from <= s.snap
        GROUP BY s.snap, v.ok, v.vd)
      SELECT CAST(snap AS VARCHAR) AS txn_asof,
        CAST(count(*) AS BIGINT) AS n_orders,
        round(CAST(sum(cents) AS DOUBLE) / 100, 2) AS believed_revenue
      FROM believed
      WHERE vd >= DATE '1995-01-01' AND vd < DATE '1995-07-01'
      GROUP BY snap
      ORDER BY txn_asof"""
    },

    "q283_histogram_quantiles" -> {
      val rows = Quantiles.map { case (name, pct) =>
        s"""SELECT '$name' AS quantile, n, bucket,
           |  round(bucket * $W
           |    + $W * CAST((n * $pct + 99) // 100 - (cum - c) AS DOUBLE)
           |      / c, 4) AS estimate
           |FROM (SELECT * FROM cum
           |      WHERE cum >= (n * $pct + 99) // 100
           |      ORDER BY bucket LIMIT 1)""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""
      WITH hist AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) // 100 // $W
          AS bucket, CAST(count(*) AS BIGINT) AS c
        FROM orders GROUP BY 1),
      n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM orders),
      cum AS (
        SELECT bucket, c, CAST(sum(c) OVER (ORDER BY bucket) AS BIGINT)
          AS cum, n
        FROM hist, n)
      $rows
      ORDER BY quantile"""
    },
  )
}
