package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 analytics additions, batch 2 (SURVEY.md §2.2 engine stance):
  *
  *  - q93: deterministic HyperLogLog — the third cardinality sketch next
  *    to KMV (q38) and the engine-native HLL (q19), and the only one of
  *    the three that is BOTH mergeable-register-shaped and exactly
  *    replayable by the DuckDB oracle. 64 registers per group, trailing-
  *    zero rank of the md5-packed hash, harmonic mean + linear-counting
  *    small-range correction. The register frame is 64 rows per group
  *    regardless of input size — the canonical "sketch crosses the
  *    shuffle, not the data" shape.
  *  - q94: exponentially-weighted moving average as a BOUNDED analytic
  *    recurrence: y_t = Σ_{i<10} a(1-a)^i x_{t-i}, renormalized over the
  *    lags actually present. EMA's infinite recurrence cannot run
  *    distributed without a sequential pass; the 10-lag truncation (tail
  *    weight 0.7^10 ≈ 2.8%) turns it into a fixed-frame window — same
  *    shape at any scale.
  *  - q95: chi-square independence test (event_type × hour-of-day
  *    quadrant) — the categorical-drift / A-B companion to q72's KS test
  *    and q88's two-proportion z. Contingency cells via one aggregation;
  *    row/col/grand totals via windows over the bounded cell frame.
  *  - q96: mergeable-bitmap EXACT distinct: per-day per-64-bucket user
  *    bitmaps (bit_or of 1<<(id%64)), popcount for daily uniques, then
  *    bit_or re-merge across days for period uniques — the exact
  *    re-aggregatable distinct that count(DISTINCT) cannot give an
  *    incremental rollup (yesterday's bitmaps merge with today's;
  *    yesterday's count-distincts cannot).
  */
object Analytics7 {
  import Tables.t

  /** 2^57 — the scale factor that turns the HLL harmonic-mean terms
    * 2^-M (M ∈ 1..57) into exact integers for order-independent DECIMAL
    * summation. Double powers of two are exact, so the pow→DECIMAL cast
    * is lossless in both engines.
    */
  private val Pow57 = "144115188075855872"

  /** α_64 · m² · 2^57 — the full numerator of the HLL harmonic-mean
    * estimate, folded to ONE double in Scala and rendered verbatim to
    * both engines. Leaving the factors inline would let each engine
    * apply its own decimal-literal typing rules (DuckDB runs `0.7213/…`
    * in DECIMAL arithmetic, Spark in another scale) and the two drift in
    * the 4th decimal.
    */
  private val HllNum: String =
    f"${0.7213 / (1.0 + 1.079 / 64.0) * 4096.0 * 1.44115188075855872e17}%.17g"

  /** Truncated-EMA lag weights a(1-a)^i, a = 0.3, i = 0..9 — rendered to
    * full-precision literals once and embedded in BOTH the Spark and the
    * DuckDB expression so each engine parses the identical decimal (a
    * live pow() could differ in the last ulp between libm and the JVM).
    */
  private val EmaWd: Seq[Double] =
    (0 until 10).map(i => 0.3 * math.pow(0.7, i))
  private val EmaW: Seq[String] = EmaWd.map(w => f"$w%.17g")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // HyperLogLog, exact-replay variant: register index = hash % 64,
    // rank = trailing zeros of hash/64 (+1; empty-suffix cap 57). Only
    // (group, register) → max(rank) crosses the shuffle. The harmonic
    // mean sums 2^(57-M) as DECIMAL so register order can't perturb the
    // float result; absent registers enter as zeros · 2^57.
    "q93_hll_distinct" -> ((spark, dir) => {
      val h = graft.functions.Md5Pack(col("l_orderkey").cast("string"))
      val regs = t(spark, dir, "lineitem")
        .select(col("l_returnflag"), h.as("h"))
        .select(col("l_returnflag"),
          expr("CAST(h % 64 AS INT)").as("bucket"),
          expr("h div 64").as("w"))
        .withColumn("rho",
          when(col("w") === 0, lit(57))
            .otherwise(log2(expr("w & -w")).cast("int") + 1))
        .groupBy("l_returnflag", "bucket")
        .agg(max("rho").as("m"))
      val agged = regs.groupBy("l_returnflag")
        .agg(
          count(lit(1)).cast("int").as("v"),
          sum(expr("CAST(pow(2, 57 - m) AS DECIMAL(38,0))")).as("s_present"))
        .withColumn("zeros", lit(64) - col("v"))
        .withColumn("s_total",
          col("s_present") +
            col("zeros").cast("decimal(38,0)") * expr(s"CAST($Pow57 AS DECIMAL(38,0))"))
        .withColumn("e_raw",
          expr(s"CAST($HllNum AS DOUBLE) / CAST(s_total AS DOUBLE)"))
        .withColumn("est_distinct",
          round(when(col("zeros") > 0 && col("e_raw") <= 160.0,
            expr("64.0 * ln(64.0 / zeros)")).otherwise(col("e_raw")), 4))
      val exact = t(spark, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct("l_orderkey").as("exact_distinct"))
      agged.join(exact, "l_returnflag")
        .select(col("l_returnflag"), col("est_distinct"),
          col("exact_distinct"), col("zeros"),
          round((col("est_distinct") - col("exact_distinct")) /
            col("exact_distinct"), 6).as("rel_err"))
        .orderBy("l_returnflag")
    }),

    // Truncated EMA over the per-type daily mean series. The daily mean
    // is fixed in DECIMAL first (order-independent), so the lag inputs
    // are bit-identical across engines; the weighted combination is a
    // single fixed-association expression, not an aggregation.
    "q94_ema" -> ((spark, dir) => {
      val daily = t(spark, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(round(
          sum(round(col("value"), 6).cast("decimal(18,6)")).cast("double") /
            count(lit(1)), 6).as("v"))
      val w = Window.partitionBy("event_type").orderBy("day")
      val num = EmaWd.zipWithIndex.map { case (wi, i) =>
        lit(wi) * coalesce(lag(col("v"), i).over(w), lit(0.0))
      }.reduce(_ + _)
      val den = EmaWd.zipWithIndex.map { case (wi, i) =>
        lit(wi) * when(lag(col("v"), i).over(w).isNotNull, 1.0).otherwise(0.0)
      }.reduce(_ + _)
      daily
        .withColumn("ema", round(num / den, 6))
        .orderBy("event_type", "day")
    }),

    // Chi-square independence over the event_type × hour-quadrant
    // contingency table. Expected counts from window totals over the
    // bounded cell frame; per-cell terms rounded into DECIMAL before the
    // final sum so cell order can't wobble the statistic.
    "q95_chi2" -> ((spark, dir) => {
      val cells = t(spark, dir, "events")
        .groupBy(col("event_type"),
          expr("CAST(hour(ts) div 6 AS INT)").as("q"))
        .agg(count(lit(1)).as("n"))
      // margins as broadcast-joined aggregates over the bounded cell
      // frame (types × 4 quadrants) — no empty-partition window, so the
      // plan stays multi-task at any type cardinality
      val rowTot = cells.groupBy("event_type")
        .agg(sum("n").as("row_tot"))
      val colTot = cells.groupBy("q").agg(sum("n").as("col_tot"))
      val allTot = cells.agg(sum("n").as("all_tot"))
      cells
        .join(broadcast(rowTot), Seq("event_type"))
        .join(broadcast(colTot), Seq("q"))
        .crossJoin(broadcast(allTot))
        // expected = row·col/N with each total cast to DOUBLE BEFORE the
        // multiply: the BIGINT product row_tot·col_tot overflows Long
        // once the table passes ~3e9 rows (ANSI throw at 100 TB scale)
        .withColumn("e",
          col("row_tot").cast("double") *
            col("col_tot").cast("double") /
            col("all_tot").cast("double"))
        .withColumn("term",
          round((col("n").cast("double") - col("e")) *
            (col("n").cast("double") - col("e")) / col("e"), 8)
            .cast("decimal(28,8)"))
        .agg(
          sum("n").as("n_events"),
          count(lit(1)).cast("int").as("n_cells"),
          ((countDistinct("event_type") - 1) *
            (countDistinct("q") - 1)).cast("int").as("dof"),
          round(sum("term").cast("double"), 4).as("chi2"))
    }),

    // Mergeable-bitmap exact distinct: daily (type, id/64) bitmaps via
    // bit_or, popcounted for daily uniques, re-merged with a second
    // bit_or for period uniques. Both levels are map-side combinable;
    // the bitmap frame is |ids|/64 rows — 64× smaller than the input,
    // and mergeable where a count-distinct result is not.
    // Contract: ids are non-negative (the harness generator's invariant;
    // on negatives Spark's `div` truncates toward zero while DuckDB's
    // `//` floors, so bucket math would diverge — md5-pack ids first if
    // a real corpus ever carries signed keys).
    "q96_bitmap_distinct" -> ((spark, dir) => {
      val daily = t(spark, dir, "events")
        .select(col("event_type"), to_date(col("ts")).as("day"),
          col("user_id"))
        .groupBy(col("event_type"), col("day"),
          expr("user_id div 64").as("bucket"))
        .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(user_id % 64 AS INT)))").as("bm"))
      val dailyUnique = daily.groupBy("event_type", "day")
        .agg(sum(bit_count(col("bm"))).as("day_unique"))
        .groupBy("event_type")
        .agg(sum("day_unique").as("sum_daily"),
          count(lit(1)).as("n_days"))
      val periodUnique = daily.groupBy("event_type", "bucket")
        .agg(expr("bit_or(bm)").as("bm"))
        .groupBy("event_type")
        .agg(sum(bit_count(col("bm"))).as("period_unique"))
      periodUnique.join(dailyUnique, "event_type")
        .select(col("event_type"), col("period_unique"), col("sum_daily"),
          col("n_days"),
          round(col("sum_daily").cast("double") / col("period_unique"), 6)
            .as("revisit_factor"))
        .orderBy("event_type")
    }),

    // Key-skew census — the diagnostic that decides salting/AQE-skew
    // handling before a big join: per-key row counts folded into a
    // log2-bucketed frequency histogram (≤64 rows regardless of key
    // count) with each bucket's share of all rows and the cumulative
    // share from the heavy end. The per-key count is one map-side-
    // combinable aggregation; everything after runs on the bounded
    // histogram frame.
    "q97_skew_census" -> ((spark, dir) => {
      val cnt = t(spark, dir, "orders")
        .groupBy("o_custkey").agg(count(lit(1)).as("n"))
      val hist = cnt
        .groupBy(floor(log2(col("n"))).cast("int").as("bucket"))
        .agg(count(lit(1)).as("n_keys"), sum("n").as("n_rows"),
          min("n").as("min_n"), max("n").as("max_n"))
      val wAll = Window.partitionBy()
      val wHeavy = Window.orderBy(col("bucket").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hist
        .withColumn("row_share",
          round(col("n_rows").cast("double") /
            sum("n_rows").over(wAll).cast("double"), 6))
        .withColumn("cum_heavy_share",
          round(sum("n_rows").over(wHeavy).cast("double") /
            sum("n_rows").over(wAll).cast("double"), 6))
        .orderBy("bucket")
    }),

    // Rolling median (15-day lower median) — the robust smoother next to
    // q94's EMA: the window gathers at most 15 values (bounded frame),
    // sorts in-row, and indexes the lower median — no percentile
    // aggregate, no full-partition sort. The same explicit formula runs
    // in both engines (DuckDB's median() averages middle pairs, so the
    // oracle replays the index arithmetic instead).
    "q98_rolling_median" -> ((spark, dir) => {
      val daily = t(spark, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(round(
          sum(round(col("value"), 6).cast("decimal(18,6)")).cast("double") /
            count(lit(1)), 6).as("v"))
      val w = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(-14, Window.currentRow)
      daily
        .withColumn("win", sort_array(collect_list(col("v")).over(w)))
        .withColumn("n_win", size(col("win")))
        .withColumn("med",
          element_at(col("win"), ((col("n_win") + 1) / 2).cast("int")))
        .select("event_type", "day", "v", "n_win", "med")
        .orderBy("event_type", "day")
    }),

    // Rolling z-score anomaly flags — mean/variance over the TRAILING
    // 14 days (current day excluded, so a spike can't mask itself),
    // variance from decimal-exact Σv and Σv² via the explicit
    // (Σv² − (Σv)²/n)/(n−1) identity rather than an incremental window
    // stddev whose accumulation order differs between engines.
    "q99_rolling_zscore" -> ((spark, dir) => {
      val daily = t(spark, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(round(
          sum(round(col("value"), 6).cast("decimal(18,6)")).cast("double") /
            count(lit(1)), 6).as("v"))
        .withColumn("vd", col("v").cast("decimal(18,6)"))
      val w = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(-14, -1)
      val s1c = sum(col("vd")).over(w).cast("double")
      val s2c = sum((col("vd") * col("vd")).cast("decimal(38,12)")).over(w)
        .cast("double")
      val nW = count(col("vd")).over(w).cast("double")
      daily
        .withColumn("n_ref", nW.cast("int"))
        .withColumn("mean_ref",
          when(nW >= 2, s1c / nW))
        .withColumn("var_ref",
          when(nW >= 2, (s2c - s1c * s1c / nW) / (nW - 1.0)))
        .withColumn("z",
          when(col("var_ref") > 0,
            round((col("v") - col("mean_ref")) / sqrt(col("var_ref")), 4)))
        .withColumn("is_anomaly",
          coalesce(abs(col("z")) > 3.0, lit(false)))
        .select(col("event_type"), col("day"), col("v"), col("n_ref"),
          round(col("mean_ref"), 6).as("mean_ref"), col("z"),
          col("is_anomaly"))
        .orderBy("event_type", "day")
    }),

    // NDJSON (JSON-Lines) ingestion — the interchange format web-corpus
    // dumps actually arrive in (one JSON object per line, splittable,
    // unlike the claims loader's multiLine arrays): round-trip a doc
    // subset through .json(), plant one deterministically corrupt line,
    // and census the read-back per lang with PERMISSIVE corrupt-record
    // isolation (the O20 recovery contract on the line-delimited path).
    // The corrupt row surfaces as the NULL-lang group with its raw line
    // preserved — counted, never dropped, never failing the batch.
    "q100_jsonl_ingest" -> ((spark, dir) => {
      import java.nio.file.{Files, Paths}
      val scratch = Paths.get(System.getProperty("java.io.tmpdir"),
        "graft_q100", Paths.get(dir).getFileName.toString)
      t(spark, dir, "documents")
        .filter(col("doc_id") < 200)
        .select("doc_id", "lang", "source", "n_chars")
        .write.mode("overwrite").json(scratch.toString)
      Files.write(scratch.resolve("zz_corrupt.json"),
        "{\"doc_id\": 999999, \"lang\": BROKEN}\n".getBytes("UTF-8"))
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id BIGINT, lang STRING, source STRING, n_chars BIGINT, " +
          "_corrupt_record STRING")
      spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(scratch.toString)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          count_if(col("_corrupt_record").isNotNull).as("n_corrupt"),
          sum(col("n_chars")).as("sum_chars"))
        .orderBy("lang")
    }),

    // Per-group trend estimation — least-squares slope/intercept/R² of
    // the daily value series against a day index, from EXACT sums: x is
    // an integer day offset, v is DECIMAL-fixed, so Σx, Σv, Σxv, Σx²,
    // Σv² are all exact and the normal-equation arithmetic happens once
    // in double at the end — deterministic where a built-in regr_slope's
    // float co-moment merge is partition-order-dependent. The daily
    // frame is bounded (days × types); the sums are one map-side-
    // combinable aggregation over it.
    "q102_trend_slope" -> ((spark, dir) => {
      val daily = t(spark, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(round(
          sum(round(col("value"), 6).cast("decimal(18,6)")).cast("double") /
            count(lit(1)), 6).as("v"))
        .withColumn("x", datediff(col("day"), to_date(lit("2025-01-01"))))
        .withColumn("vd", col("v").cast("decimal(18,6)"))
      daily.groupBy("event_type")
        .agg(
          count(lit(1)).as("n_days"),
          sum(col("x").cast("long")).as("sx"),
          sum(col("x").cast("long") * col("x").cast("long")).as("sxx"),
          sum(col("vd")).as("sv"),
          sum((col("vd") * col("vd")).cast("decimal(38,12)")).as("svv"),
          sum((col("x").cast("decimal(10,0)") * col("vd"))
            .cast("decimal(38,6)")).as("sxv"))
        .select(
          col("event_type"), col("n_days"),
          round((col("n_days") * col("sxv").cast("double") -
            col("sx") * col("sv").cast("double")) /
            (col("n_days") * col("sxx") - col("sx") * col("sx"))
              .cast("double"), 6).as("slope"),
          round((col("sv").cast("double") -
            ((col("n_days") * col("sxv").cast("double") -
              col("sx") * col("sv").cast("double")) /
              (col("n_days") * col("sxx") - col("sx") * col("sx"))
                .cast("double")) * col("sx")) /
            col("n_days"), 6).as("intercept"),
          round(
            ((col("n_days") * col("sxv").cast("double") -
              col("sx") * col("sv").cast("double")) *
              (col("n_days") * col("sxv").cast("double") -
                col("sx") * col("sv").cast("double"))) /
            ((col("n_days") * col("sxx") - col("sx") * col("sx"))
              .cast("double") *
              (col("n_days") * col("svv").cast("double") -
                col("sv").cast("double") * col("sv").cast("double"))), 6)
            .as("r2"))
        .orderBy("event_type")
    }),

    // Referential-integrity audit — the warehouse-quality census over
    // every FK edge of the star schema: per edge, the non-null child key
    // count and the orphan count via a LEFT ANTI join (the exact
    // complement of q7's semi join). Each anti join shuffles (or
    // broadcasts, dim-sized) on its key — the same shape the joins
    // themselves take, so the audit costs what one pass of the joins
    // costs. The harness data is referentially clean on every edge
    // (including events→customer: user ids are a custkey subset), so the
    // all-zero orphan column is a VERIFIED result — the spec plants a
    // broken edge to prove the formulation reports violations when they
    // exist.
    "q101_fk_audit" -> ((spark, dir) => {
      FkEdges.map { case (label, ct, ck, pt, pk) =>
        val child = t(spark, dir, ct).filter(col(ck).isNotNull)
        val orphans = child.select(col(ck).as("k"))
          .join(t(spark, dir, pt).select(col(pk).as("k")), Seq("k"),
            "left_anti")
        child.agg(count(lit(1)).as("n_child"))
          .crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
          .select(lit(label).as("edge"), col("n_child"), col("n_orphans"))
      }.reduce(_.unionByName(_)).orderBy("edge")
    }),
  )

  /** FK edges audited by q101 — one shared definition drives BOTH the
    * Spark plan and the generated oracle SQL.
    * (edge label, child table, child key, parent table, parent key)
    */
  private val FkEdges: Seq[(String, String, String, String, String)] = Seq(
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("events.user_id->customer", "events", "user_id", "customer", "c_custkey"),
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"))

  val oracleSql: Map[String, String] = Map(
    "q101_fk_audit" -> {
      val rows = FkEdges.map { case (label, ct, ck, pt, pk) =>
        s"""SELECT '$label' AS edge,
           |  (SELECT CAST(count(*) AS BIGINT) FROM $ct
           |   WHERE $ck IS NOT NULL) AS n_child,
           |  (SELECT CAST(count(*) AS BIGINT) FROM $ct c
           |   WHERE c.$ck IS NOT NULL AND NOT EXISTS
           |     (SELECT 1 FROM $pt p WHERE p.$pk = c.$ck)) AS n_orphans""".stripMargin
      }
      rows.mkString("", "\nUNION ALL\n", "\nORDER BY edge")
    },

    "q102_trend_slope" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    round(CAST(sum(CAST(round(value, 6) AS DECIMAL(18,6)))
        |      AS DOUBLE) / count(*), 6) AS v
        |  FROM events GROUP BY 1, 2),
        |pts AS (
        |  SELECT event_type,
        |    datediff('day', DATE '2025-01-01', day) AS x,
        |    CAST(v AS DECIMAL(18,6)) AS vd
        |  FROM daily),
        |sums AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    sum(vd) AS sv,
        |    sum(CAST(vd * vd AS DECIMAL(38,12))) AS svv,
        |    sum(CAST(CAST(x AS DECIMAL(10,0)) * vd AS DECIMAL(38,6))) AS sxv
        |  FROM pts GROUP BY 1),
        |terms AS (
        |  SELECT event_type, n,
        |    n * CAST(sxv AS DOUBLE) - sx * CAST(sv AS DOUBLE) AS num,
        |    CAST(n * sxx - sx * sx AS DOUBLE) AS den,
        |    CAST(sv AS DOUBLE) AS svd, sx,
        |    n * CAST(svv AS DOUBLE)
        |      - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) AS vden
        |  FROM sums)
        |SELECT event_type, n AS n_days,
        |  round(num / den, 6) AS slope,
        |  round((svd - (num / den) * sx) / n, 6) AS intercept,
        |  round((num * num) / (den * vden), 6) AS r2
        |FROM terms ORDER BY event_type""".stripMargin,

    "q100_jsonl_ingest" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(0 AS BIGINT) AS n_corrupt,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE doc_id < 200 GROUP BY lang
        |UNION ALL
        |SELECT NULL, CAST(1 AS BIGINT), CAST(1 AS BIGINT),
        |  CAST(NULL AS BIGINT)
        |ORDER BY lang NULLS FIRST""".stripMargin,

    "q97_skew_census" ->
      """WITH cnt AS (
        |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n
        |  FROM orders GROUP BY 1),
        |hist AS (
        |  SELECT CAST(floor(log2(n)) AS INTEGER) AS bucket,
        |    CAST(count(*) AS BIGINT) AS n_keys,
        |    CAST(sum(n) AS BIGINT) AS n_rows,
        |    CAST(min(n) AS BIGINT) AS min_n,
        |    CAST(max(n) AS BIGINT) AS max_n
        |  FROM cnt GROUP BY 1)
        |SELECT bucket, n_keys, n_rows, min_n, max_n,
        |  round(CAST(n_rows AS DOUBLE)
        |    / CAST(sum(n_rows) OVER () AS DOUBLE), 6) AS row_share,
        |  round(CAST(sum(n_rows) OVER (ORDER BY bucket DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / CAST(sum(n_rows) OVER () AS DOUBLE), 6) AS cum_heavy_share
        |FROM hist ORDER BY bucket""".stripMargin,

    "q98_rolling_median" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    round(CAST(sum(CAST(round(value, 6) AS DECIMAL(18,6)))
        |      AS DOUBLE) / count(*), 6) AS v
        |  FROM events GROUP BY 1, 2),
        |win AS (
        |  SELECT event_type, day, v,
        |    list_sort(list(v) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN 14 PRECEDING AND CURRENT ROW)) AS win
        |  FROM daily)
        |SELECT event_type, day, v,
        |  CAST(len(win) AS INTEGER) AS n_win,
        |  win[CAST((len(win) + 1) // 2 AS INTEGER)] AS med
        |FROM win ORDER BY event_type, day""".stripMargin,

    "q99_rolling_zscore" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    round(CAST(sum(CAST(round(value, 6) AS DECIMAL(18,6)))
        |      AS DOUBLE) / count(*), 6) AS v
        |  FROM events GROUP BY 1, 2),
        |winstats AS (
        |  SELECT event_type, day, v,
        |    CAST(sum(CAST(v AS DECIMAL(18,6))) OVER w AS DOUBLE) AS s1,
        |    CAST(sum(CAST(CAST(v AS DECIMAL(18,6)) * CAST(v AS DECIMAL(18,6))
        |      AS DECIMAL(38,12))) OVER w AS DOUBLE) AS s2,
        |    CAST(count(v) OVER w AS DOUBLE) AS n
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 14 PRECEDING AND 1 PRECEDING)),
        |scored AS (
        |  SELECT event_type, day, v, CAST(n AS INTEGER) AS n_ref,
        |    CASE WHEN n >= 2 THEN s1 / n END AS mean_ref,
        |    CASE WHEN n >= 2 THEN (s2 - s1 * s1 / n) / (n - 1.0) END
        |      AS var_ref
        |  FROM winstats)
        |SELECT event_type, day, v, n_ref,
        |  round(mean_ref, 6) AS mean_ref,
        |  CASE WHEN var_ref > 0
        |    THEN round((v - mean_ref) / sqrt(var_ref), 4) END AS z,
        |  coalesce(CASE WHEN var_ref > 0
        |    THEN abs(round((v - mean_ref) / sqrt(var_ref), 4)) > 3.0 END,
        |    FALSE) AS is_anomaly
        |FROM scored ORDER BY event_type, day""".stripMargin,

    "q93_hll_distinct" -> {
      val h = Tables.duckMd5Pack("CAST(l_orderkey AS VARCHAR)")
      s"""WITH hashed AS (
         |  SELECT l_returnflag, ($h) AS h FROM lineitem),
         |regs AS (
         |  SELECT l_returnflag, CAST(h % 64 AS INTEGER) AS bucket,
         |    max(CASE WHEN h // 64 = 0 THEN 57
         |      ELSE CAST(log2((h // 64) & -(h // 64)) AS INTEGER) + 1 END) AS m
         |  FROM hashed GROUP BY 1, 2),
         |agged AS (
         |  SELECT l_returnflag, CAST(count(*) AS INTEGER) AS v,
         |    sum(CAST(pow(2, 57 - m) AS DECIMAL(38,0))) AS s_present
         |  FROM regs GROUP BY 1),
         |est AS (
         |  SELECT l_returnflag, 64 - v AS zeros,
         |    s_present + CAST(64 - v AS DECIMAL(38,0))
         |      * CAST($Pow57 AS DECIMAL(38,0)) AS s_total
         |  FROM agged),
         |est2 AS (
         |  SELECT l_returnflag, zeros,
         |    CAST($HllNum AS DOUBLE) / CAST(s_total AS DOUBLE) AS e_raw
         |  FROM est),
         |est3 AS (
         |  SELECT l_returnflag, CAST(zeros AS INTEGER) AS zeros,
         |    round(CASE WHEN zeros > 0 AND e_raw <= 160.0
         |      THEN 64.0 * ln(64.0 / zeros) ELSE e_raw END, 4)
         |      AS est_distinct
         |  FROM est2),
         |exact AS (
         |  SELECT l_returnflag,
         |    CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_distinct
         |  FROM lineitem GROUP BY 1)
         |SELECT e3.l_returnflag, est_distinct, exact_distinct, zeros,
         |  round((est_distinct - exact_distinct) / exact_distinct, 6)
         |    AS rel_err
         |FROM est3 e3 JOIN exact USING (l_returnflag)
         |ORDER BY l_returnflag""".stripMargin
    },

    "q94_ema" -> {
      val num = EmaW.zipWithIndex.map { case (wi, i) =>
        s"CAST($wi AS DOUBLE) * coalesce(lag(v, $i) OVER w, CAST(0 AS DOUBLE))"
      }.mkString(" + ")
      val den = EmaW.zipWithIndex.map { case (wi, i) =>
        s"CAST($wi AS DOUBLE) * (CASE WHEN lag(v, $i) OVER w IS NOT NULL" +
          " THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END)"
      }.mkString(" + ")
      s"""WITH daily AS (
         |  SELECT event_type, CAST(ts AS DATE) AS day,
         |    round(CAST(sum(CAST(round(value, 6) AS DECIMAL(18,6)))
         |      AS DOUBLE) / count(*), 6) AS v
         |  FROM events GROUP BY 1, 2)
         |SELECT event_type, day, v,
         |  round(($num) / ($den), 6) AS ema
         |FROM daily
         |WINDOW w AS (PARTITION BY event_type ORDER BY day)
         |ORDER BY event_type, day""".stripMargin
    },

    "q95_chi2" ->
      """WITH cells AS (
        |  SELECT event_type, CAST(hour(ts) // 6 AS INTEGER) AS q,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |exp AS (
        |  SELECT event_type, q, n,
        |    CAST(sum(n) OVER (PARTITION BY event_type) AS DOUBLE)
        |      * CAST(sum(n) OVER (PARTITION BY q) AS DOUBLE)
        |      / CAST(sum(n) OVER () AS DOUBLE) AS e
        |  FROM cells)
        |SELECT CAST(sum(n) AS BIGINT) AS n_events,
        |  CAST(count(*) AS INTEGER) AS n_cells,
        |  CAST((count(DISTINCT event_type) - 1)
        |    * (count(DISTINCT q) - 1) AS INTEGER) AS dof,
        |  round(CAST(sum(CAST(round(
        |    (CAST(n AS DOUBLE) - e) * (CAST(n AS DOUBLE) - e) / e, 8)
        |    AS DECIMAL(28,8))) AS DOUBLE), 4) AS chi2
        |FROM exp""".stripMargin,

    "q96_bitmap_distinct" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, user_id // 64 AS bucket,
        |    bit_or(CASE WHEN user_id % 64 = 63
        |      THEN CAST(-9223372036854775808 AS BIGINT)
        |      ELSE CAST(1 AS BIGINT) << CAST(user_id % 64 AS INTEGER) END) AS bm
        |  FROM events GROUP BY 1, 2, 3),
        |du AS (
        |  SELECT event_type,
        |    CAST(sum(day_unique) AS BIGINT) AS sum_daily,
        |    CAST(count(*) AS BIGINT) AS n_days
        |  FROM (
        |    SELECT event_type, day,
        |      sum(bit_count(bm)) AS day_unique
        |    FROM daily GROUP BY 1, 2)
        |  GROUP BY 1),
        |pu AS (
        |  SELECT event_type,
        |    CAST(sum(bit_count(bm)) AS BIGINT) AS period_unique
        |  FROM (
        |    SELECT event_type, bucket, bit_or(bm) AS bm
        |    FROM daily GROUP BY 1, 2)
        |  GROUP BY 1)
        |SELECT event_type, period_unique, sum_daily, n_days,
        |  round(CAST(sum_daily AS DOUBLE) / period_unique, 6)
        |    AS revisit_factor
        |FROM pu JOIN du USING (event_type)
        |ORDER BY event_type""".stripMargin,
  )
}
