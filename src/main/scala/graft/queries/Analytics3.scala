package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 relational-surface additions (SURVEY.md §2.2 engine stance):
  * UNPIVOT/melt, correlated LATERAL subqueries, gaps-and-islands CDC
  * compaction, and an ORC round-trip exercising the second columnar
  * format end to end.
  */
object Analytics3 {
  import Tables.t

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,6)")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // UNPIVOT (melt): the three charge columns become (measure, value)
    // rows — the wide→long reshape every feature pipeline needs. Native
    // Dataset.unpivot (Expand physical node: one pass over the input, no
    // join, no shuffle beyond the final aggregation). Sums in DECIMAL so
    // they are partition-order-independent; means derived from the exact
    // sums in double.
    "q52_unpivot" -> ((spark, dir) => {
      val li = t(spark, dir, "lineitem").select(col("l_returnflag"),
        dec(col("l_extendedprice")).as("l_extendedprice"),
        dec(col("l_discount")).as("l_discount"),
        dec(col("l_tax")).as("l_tax"))
      li.unpivot(
          Array(col("l_returnflag")),
          Array(col("l_extendedprice"), col("l_discount"), col("l_tax")),
          "measure", "val")
        .groupBy("l_returnflag", "measure")
        .agg(count(lit(1)).as("n"), sum(col("val")).as("sum_d"))
        .select(col("l_returnflag"), col("measure"), col("n"),
          round(col("sum_d").cast("double"), 4).as("sum_val"),
          round(col("sum_d").cast("double") / col("n"), 6).as("mean_val"))
        .orderBy("l_returnflag", "measure")
    }),

    // Correlated LATERAL subquery through the SQL layer: top-3 customers
    // by balance per nation. Catalyst rewrites the lateral correlated
    // limit into a ranked join (DomainJoin → window per key) — never a
    // per-outer-row re-execution.
    "q53_lateral_topn" -> ((spark, dir) => {
      t(spark, dir, "nation").createOrReplaceTempView("nation_lat")
      t(spark, dir, "customer").createOrReplaceTempView("cust_lat")
      spark.sql(
        """SELECT n.n_name, c.c_name, c.c_acctbal
          |FROM nation_lat n
          |JOIN LATERAL (
          |  SELECT c_name, c_acctbal FROM cust_lat
          |  WHERE c_nationkey = n.n_nationkey
          |  ORDER BY c_acctbal DESC, c_name LIMIT 3) c
          |ORDER BY n.n_name, c.c_acctbal DESC, c.c_name""".stripMargin)
    }),

    // Gaps-and-islands (CDC/SCD2 compaction): collapse each customer's
    // consecutive same-status order runs into validity intervals — the
    // change-capture step that turns an event log into slowly-changing
    // dimension rows. One shuffle on the partition key; lag + running sum
    // + groupBy all share that partitioning (single Window exchange).
    "q54_status_islands" -> ((spark, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val prev = lag(col("o_orderstatus"), 1).over(w)
      val chg = when(prev.isNull || prev =!= col("o_orderstatus"), 1)
        .otherwise(0)
      t(spark, dir, "orders")
        .withColumn("chg", chg)
        .withColumn("island", sum(col("chg"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("o_custkey", "island", "o_orderstatus")
        .agg(
          min(col("o_orderdate").cast("date")).as("valid_from"),
          max(col("o_orderdate").cast("date")).as("valid_to"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_custkey", "island")
    }),

    // Equi-width histogram: 20 bands over [min, max] of the order value
    // — the profiling operator behind data-quality dashboards and
    // range-partition planning. The two-row stats frame broadcasts to
    // the banding scan (map-side), so the input passes once for stats
    // and once for banding: two scans, one band-keyed shuffle, never a
    // sort. Band arithmetic is a fixed IEEE sequence, identical in both
    // engines; sums ride DECIMAL.
    "q57_histogram" -> ((spark, dir) => {
      val o = t(spark, dir, "orders")
      val stats = o.agg(min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"))
      o.crossJoin(broadcast(stats))
        .withColumn("band",
          least(floor((col("o_totalprice") - col("lo")) /
            ((col("hi") - col("lo")) / 20)), lit(19L)).cast("int"))
        .groupBy("band")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"))
        .orderBy("band")
    }),

    // ORC round-trip: write a pruned lineitem slice as ORC (the second
    // columnar format next to parquet — schema, compression and
    // vectorized read all exercised for real), read it back, aggregate.
    // The oracle recomputes straight from parquet, so a byte-level ORC
    // defect anywhere in the loop breaks the hash match. Scratch dir is
    // per-SF and overwritten each run.
    "q55_orc_roundtrip" -> ((spark, dir) => {
      val scratch = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_q55",
        java.nio.file.Paths.get(dir).getFileName.toString).toString
      t(spark, dir, "lineitem")
        .filter(col("l_quantity") <= 5)
        .select("l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag")
        .write.mode("overwrite").orc(scratch)
      spark.read.orc(scratch)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity")).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_price"))
        .orderBy("l_returnflag")
    }),

    // Missing-value imputation: the q45 series again, but gaps linearly
    // INTERPOLATED between the neighboring observations (ends forward-/
    // back-filled) instead of zero-filled — the feature-pipeline
    // imputation step. Ignore-nulls carry is expressed portably as
    // max/min over (day, value) structs (aggregates skip NULL inputs;
    // struct order is lexicographic, day first), so the same windows
    // replay in DuckDB without IGNORE NULLS syntax. One partitioning
    // serves both window directions and the output sort.
    "q60_interpolate" -> ((spark, dir) => {
      val li = t(spark, dir, "lineitem")
        .filter(col("l_suppkey") <= 5)
        .select(col("l_suppkey"), col("l_shipdate").cast("date").as("day"),
          col("l_quantity"))
        .filter(col("day").between("1995-03-01", "1995-03-31"))
      val daily = li.groupBy("l_suppkey", "day")
        .agg(sum(col("l_quantity")).cast("long").as("qty"))
      val days = spark.range(1).select(explode(sequence(
        to_date(lit("1995-03-01")), to_date(lit("1995-03-31")),
        expr("interval 1 day"))).as("day"))
      val spine = li.select("l_suppkey").distinct().crossJoin(days)
        .join(daily, Seq("l_suppkey", "day"), "left")
      val known = when(col("qty").isNotNull,
        struct(col("day").as("d"), col("qty").as("v")))
      val base = Window.partitionBy("l_suppkey").orderBy("day")
      val prev = max(known)
        .over(base.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      val nxt = min(known)
        .over(base.rowsBetween(Window.currentRow, Window.unboundedFollowing))
      spine
        .withColumn("prev", prev).withColumn("nxt", nxt)
        .select(col("l_suppkey"), col("day"), col("qty").as("qty_obs"),
          round(
            when(col("prev").isNull && col("nxt").isNull,
              lit(null).cast("double"))
            .when(col("prev").isNull, col("nxt.v").cast("double"))
            .when(col("nxt").isNull, col("prev.v").cast("double"))
            .when(col("prev.d") === col("nxt.d"), col("qty").cast("double"))
            .otherwise(col("prev.v").cast("double") +
              (col("nxt.v").cast("double") - col("prev.v").cast("double")) *
              (datediff(col("day"), col("prev.d")).cast("double") /
                datediff(col("nxt.d"), col("prev.d")).cast("double"))), 6)
            .as("qty_interp"),
          col("qty").isNotNull.as("is_observed"))
        .orderBy("l_suppkey", "day")
    }),

    // Conversion funnel: signup → first view after signup → first
    // purchase after that view, with the average signup→purchase lag.
    // Each stage is one keyed aggregation joined forward (stage frames
    // shrink monotonically — the joins broadcast at real scale); lag
    // hours sum in DECIMAL for order independence.
    "q61_funnel" -> ((spark, dir) => {
      val e = t(spark, dir, "events")
      val s = e.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(col("ts")).as("s_ts"))
      val v = e.filter(col("event_type") === "view")
        .join(s, "user_id").filter(col("ts") >= col("s_ts"))
        .groupBy("user_id")
        .agg(min(col("ts")).as("v_ts"), min(col("s_ts")).as("s_ts"))
      val p = e.filter(col("event_type") === "purchase")
        .join(v, "user_id").filter(col("ts") >= col("v_ts"))
        .groupBy("user_id")
        .agg(min(col("ts")).as("p_ts"), min(col("s_ts")).as("s_ts"))
      val hours = (unix_micros(col("p_ts")) - unix_micros(col("s_ts"))) /
        lit(3600000000.0)
      s.agg(count(lit(1)).as("n_signup"))
        .crossJoin(v.agg(count(lit(1)).as("n_viewed")))
        .crossJoin(p.agg(count(lit(1)).as("n_purchased"),
          round(sum(round(hours, 6).cast("decimal(18,6)")).cast("double") /
            count(lit(1)), 6).as("avg_conv_hours")))
    }),

    // XML ingestion: each order rendered as an XML record and parsed
    // back through Spark 4's native from_xml with a typed schema — the
    // third in-row codec next to JSON (q12) and the CSV/JSON file
    // sources. The render→parse loop means any schema-inference, escape
    // or numeric-typing defect breaks the oracle hash (DuckDB has no XML
    // support, so it recomputes the expected fields directly — exactly
    // what the round-trip must reproduce). Money re-parses as
    // DECIMAL(18,2): decimal→string→decimal is exact.
    "q58_xml_ingest" -> ((spark, dir) => {
      val xml = concat(
        lit("<rec><id>"), col("o_orderkey").cast("string"),
        lit("</id><status>"), col("o_orderstatus"),
        lit("</status><total>"),
        col("o_totalprice").cast("decimal(18,2)").cast("string"),
        lit("</total></rec>"))
      t(spark, dir, "orders")
        .select(from_xml(xml,
          org.apache.spark.sql.types.StructType.fromDDL(
            "id BIGINT, status STRING, total DECIMAL(18,2)")).as("r"))
        .groupBy(col("r.status").as("status"))
        .agg(count(lit(1)).as("n"),
          sum(col("r.total")).cast("double").as("sum_total"),
          min(col("r.id")).as("min_key"))
        .orderBy("status")
    }),

    // Higher-order array functions (lambda surface): filter / transform
    // / aggregate / exists / forall over the token arrays. These run as
    // CodegenFallback (interpreted lambdas — the measured reason the
    // dedup sketch kernels are custom expressions instead), so they
    // belong on the bounded documents table, not a fact-table hot path.
    "q59_hof_funcs" -> ((spark, dir) => {
      val tk = split(col("text"), " ")
      t(spark, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          size(filter(tk, t => length(t) > 4)).as("n_long"),
          aggregate(transform(tk, t => length(t).cast("long")),
            lit(0L), (acc, x) => acc + x).as("sum_len"),
          exists(tk, t => t === "the").as("has_the"),
          forall(tk, t => length(t) > 1).as("all_multi"))
        .orderBy("doc_id")
    }),

  )

  val oracleSql: Map[String, String] = Map(
    "q60_interpolate" ->
      """WITH li AS (
        |  SELECT l_suppkey, CAST(l_shipdate AS DATE) AS day, l_quantity
        |  FROM lineitem
        |  WHERE l_suppkey <= 5
        |    AND CAST(l_shipdate AS DATE)
        |      BETWEEN DATE '1995-03-01' AND DATE '1995-03-31'),
        |days AS (
        |  SELECT CAST(unnest(generate_series(DATE '1995-03-01',
        |    DATE '1995-03-31', INTERVAL 1 DAY)) AS DATE) AS day),
        |sup AS (SELECT DISTINCT l_suppkey FROM li),
        |daily AS (
        |  SELECT l_suppkey, day, CAST(sum(l_quantity) AS BIGINT) AS qty
        |  FROM li GROUP BY l_suppkey, day),
        |sp AS (
        |  SELECT s.l_suppkey, d.day, dl.qty
        |  FROM sup s CROSS JOIN days d
        |  LEFT JOIN daily dl ON s.l_suppkey = dl.l_suppkey AND d.day = dl.day),
        |w AS (
        |  SELECT l_suppkey, day, qty,
        |    max(CASE WHEN qty IS NOT NULL
        |             THEN struct_pack(d := day, v := qty) END)
        |      OVER (PARTITION BY l_suppkey ORDER BY day
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev,
        |    min(CASE WHEN qty IS NOT NULL
        |             THEN struct_pack(d := day, v := qty) END)
        |      OVER (PARTITION BY l_suppkey ORDER BY day
        |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nxt
        |  FROM sp)
        |SELECT l_suppkey, day, qty AS qty_obs,
        |  round(CASE
        |    WHEN prev IS NULL AND nxt IS NULL THEN NULL
        |    WHEN prev IS NULL THEN CAST(nxt.v AS DOUBLE)
        |    WHEN nxt IS NULL THEN CAST(prev.v AS DOUBLE)
        |    WHEN prev.d = nxt.d THEN CAST(qty AS DOUBLE)
        |    ELSE CAST(prev.v AS DOUBLE) +
        |      (CAST(nxt.v AS DOUBLE) - CAST(prev.v AS DOUBLE)) *
        |      (CAST(date_diff('day', prev.d, day) AS DOUBLE) /
        |       CAST(date_diff('day', prev.d, nxt.d) AS DOUBLE))
        |  END, 6) AS qty_interp,
        |  qty IS NOT NULL AS is_observed
        |FROM w ORDER BY l_suppkey, day""".stripMargin,

    "q61_funnel" ->
      """WITH s AS (
        |  SELECT user_id, min(ts) AS s_ts FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |v AS (
        |  SELECT e.user_id, min(e.ts) AS v_ts, min(s.s_ts) AS s_ts
        |  FROM events e JOIN s ON e.user_id = s.user_id
        |  WHERE e.event_type = 'view' AND e.ts >= s.s_ts
        |  GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS p_ts, min(v.s_ts) AS s_ts
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= v.v_ts
        |  GROUP BY e.user_id)
        |SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM s) AS n_signup,
        |  (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_viewed,
        |  (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_purchased,
        |  (SELECT round(CAST(sum(CAST(round(
        |      (epoch_us(p_ts) - epoch_us(s_ts)) / 3600000000.0, 6)
        |      AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
        |   FROM p) AS avg_conv_hours""".stripMargin,

    "q58_xml_ingest" ->
      """SELECT o_orderstatus AS status, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total,
        |  min(o_orderkey) AS min_key
        |FROM orders GROUP BY o_orderstatus ORDER BY status""".stripMargin,

    "q59_hof_funcs" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(tk, t -> length(t) > 4)) AS INTEGER) AS n_long,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(tk, t -> CAST(length(t) AS BIGINT))),
        |    (a, b) -> a + b) AS sum_len,
        |  list_contains(tk, 'the') AS has_the,
        |  len(list_filter(tk, t -> length(t) <= 1)) = 0 AS all_multi
        |FROM (SELECT doc_id, string_split(text, ' ') AS tk
        |      FROM documents WHERE text IS NOT NULL)
        |ORDER BY doc_id""".stripMargin,

    "q52_unpivot" ->
      """WITH m AS (
        |  SELECT l_returnflag, 'l_extendedprice' AS measure,
        |    CAST(l_extendedprice AS DECIMAL(18,6)) AS val FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'l_discount',
        |    CAST(l_discount AS DECIMAL(18,6)) FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'l_tax',
        |    CAST(l_tax AS DECIMAL(18,6)) FROM lineitem)
        |SELECT l_returnflag, measure, CAST(count(*) AS BIGINT) AS n,
        |  round(CAST(sum(val) AS DOUBLE), 4) AS sum_val,
        |  round(CAST(sum(val) AS DOUBLE) / count(*), 6) AS mean_val
        |FROM m GROUP BY l_returnflag, measure
        |ORDER BY l_returnflag, measure""".stripMargin,

    "q53_lateral_topn" ->
      """SELECT n.n_name, c.c_name, c.c_acctbal
        |FROM nation n, LATERAL (
        |  SELECT c_name, c_acctbal FROM customer
        |  WHERE c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_name LIMIT 3) c
        |ORDER BY n.n_name, c.c_acctbal DESC, c.c_name""".stripMargin,

    "q54_status_islands" ->
      """WITH marked AS (
        |  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
        |    CASE WHEN lag(o_orderstatus) OVER w IS NULL
        |           OR lag(o_orderstatus) OVER w <> o_orderstatus
        |         THEN 1 ELSE 0 END AS chg
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey
        |               ORDER BY o_orderdate, o_orderkey)),
        |islands AS (
        |  SELECT o_custkey, o_orderstatus, o_orderdate,
        |    CAST(sum(chg) OVER (PARTITION BY o_custkey
        |                   ORDER BY o_orderdate, o_orderkey
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS island
        |  FROM marked)
        |SELECT o_custkey, island, o_orderstatus,
        |  CAST(min(o_orderdate) AS DATE) AS valid_from,
        |  CAST(max(o_orderdate) AS DATE) AS valid_to,
        |  CAST(count(*) AS BIGINT) AS n_orders
        |FROM islands GROUP BY o_custkey, island, o_orderstatus
        |ORDER BY o_custkey, island""".stripMargin,

    "q57_histogram" ->
      """WITH s AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
        |           FROM orders)
        |SELECT band, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
        |FROM (
        |  SELECT CAST(least(floor((o_totalprice - lo) / ((hi - lo) / 20)), 19)
        |           AS INTEGER) AS band, o_totalprice
        |  FROM orders CROSS JOIN s)
        |GROUP BY band ORDER BY band""".stripMargin,

    "q55_orc_roundtrip" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
        |FROM lineitem WHERE l_quantity <= 5
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
  )
}
