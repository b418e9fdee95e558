package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 relational additions (SURVEY.md §2.2 engine stance): the
  * incremental-refresh and data-layout patterns a 100 TB corpus pipeline
  * needs around its analytics core.
  *
  *  - q73: CDC changelog application (latest-wins MERGE semantics:
  *    insert / update / delete / upsert) — the incremental corpus-refresh
  *    primitive. Latest-per-key is a `max_by` AGGREGATION (map-side
  *    combinable, one shuffle), never a window sort over the changelog.
  *  - q74: Z-order (Morton curve) layout diagnostic — bit-interleaved
  *    cluster keys vs lexicographic ordering, measured by per-block
  *    min/max spans (what file-skipping sees). Pure integer bit math.
  *  - q75: weighted (probability-proportional-to-size) Bernoulli
  *    sampling in EXACT integer arithmetic — `hash*50 < q*1e6` replays
  *    bit-identically in any engine, unlike rand()- or float-threshold
  *    samplers; includes the Horvitz-Thompson row-count estimate as an
  *    integer sum.
  *  - q76: weekly retention cohorts over the events stream — the
  *    first-touch cohort assignment joins back to activity on the user
  *    key, ratios via a whole-partition window (q70 idiom).
  *
  * Parity rules as everywhere (see spark-graft memory): money through
  * DECIMAL, doubles only at the edge with identical association on both
  * engines, md5-anchored sampling, integer `div` for cross-engine
  * division.
  */
object Analytics5 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // CDC MERGE: a snapshot (keys not divisible by 3) plus a synthetic
    // changelog derived from orders — inserts (seq 0), updates (seq 1),
    // deletes (seq 1, disjoint keys), and a second-generation update
    // (seq 2) that must WIN over seq 1. Apply = reduce changelog to the
    // latest image per key (max_by aggregation), full-outer join the
    // snapshot once, classify the action. At 100 TB this is one shuffle
    // over the changelog + one co-partitioned join — no window sort, no
    // driver state. Delete rows carry non-null sentinels so the
    // per-column max_by never has to resolve a NULL at the max key
    // (DuckDB's arg_max IGNORES null values — a silent parity trap).
    "q73_changelog_merge" -> ((spark, dir) => {
      val o = t(spark, dir, "orders")
      val key = col("o_orderkey")
      val price = col("o_totalprice").cast("decimal(18,2)")
      val snap = o.filter(key % 3 =!= 0)
        .select(key.as("k"), col("o_orderstatus").as("s_status"),
          price.as("s_price"))
      val ins = o.filter(key % 3 === 0 && key % 2 === 1)
        .select(key.as("k"), lit("I").as("op"), lit(0L).as("seq"),
          col("o_orderstatus").as("c_status"), price.as("c_price"))
      val upd1 = o.filter(key % 5 === 0)
        .select(key.as("k"), lit("U").as("op"), lit(1L).as("seq"),
          col("o_orderstatus").as("c_status"),
          (price + 100).cast("decimal(18,2)").as("c_price"))
      val del = o.filter(key % 7 === 0 && key % 5 =!= 0)
        .select(key.as("k"), lit("D").as("op"), lit(1L).as("seq"),
          lit("X").as("c_status"),
          lit(0).cast("decimal(18,2)").as("c_price"))
      val upd2 = o.filter(key % 10 === 0)
        .select(key.as("k"), lit("U").as("op"), lit(2L).as("seq"),
          col("o_orderstatus").as("c_status"),
          (price + 200).cast("decimal(18,2)").as("c_price"))
      val latest = ins.unionByName(upd1).unionByName(del).unionByName(upd2)
        .groupBy("k")
        .agg(max_by(col("op"), col("seq")).as("op"),
          max_by(col("c_status"), col("seq")).as("c_status"),
          max_by(col("c_price"), col("seq")).as("c_price"))
      snap.join(latest, Seq("k"), "full_outer")
        .withColumn("action",
          when(col("op") === "D" && col("s_status").isNotNull, "deleted")
            .when(col("op") === "D", "noop_delete")
            .when(col("op").isNotNull && col("s_status").isNotNull, "updated")
            .when(col("op").isNotNull, "inserted")
            .otherwise("unchanged"))
        .groupBy("action")
        .agg(count(lit(1)).as("n"),
          sum(when(!col("action").isin("deleted", "noop_delete"),
            when(col("op").isNotNull, col("c_price"))
              .otherwise(col("s_price")))).cast("double")
            .as("sum_price_after"),
          sum(col("k")).cast("long").as("key_sum"))
        .orderBy("action")
    }),

    // Z-order layout diagnostic: interleave the low 5 bits of two
    // dimensions (customer nation 0–24, price band 0–31) into a Morton
    // key, block rows 16 z-values at a time, and compare each block's
    // per-dimension min/max SPAN against the same blocking under a
    // lexicographic (nation-major) sort key. Narrow spans on BOTH
    // dimensions are exactly what parquet min/max file skipping prunes
    // by — the z-order layout bounds both spans where the lexicographic
    // one leaves the minor dimension unbounded. All bit math is integer
    // (shift / AND / scaled add), codegen'd, and replayed verbatim by
    // the oracle.
    "q74_zorder" -> ((spark, dir) => {
      val o = t(spark, dir, "orders")
      val c = t(spark, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val j = o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .withColumn("nat", col("c_nationkey").cast("long"))
        .withColumn("band",
          least(floor(col("o_totalprice") / 16000.0), lit(31.0)).cast("long"))
      val z = (0 until 5).map { i =>
        shiftright(col("nat"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
          shiftright(col("band"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
      }.reduce(_ + _)
      val blocked = j.withColumn("z", z)
        .withColumn("zblock", expr("z div 16"))
        .withColumn("lexblock", expr("(nat * 32 + band) div 16"))
      def spans(blockCol: String, name: String): DataFrame =
        blocked.groupBy(col(blockCol).as("blk"))
          .agg(count(lit(1)).as("n"),
            (max("nat") - min("nat")).as("nat_span"),
            (max("band") - min("band")).as("band_span"))
          .agg(count(lit(1)).as("n_blocks"),
            sum("n").cast("long").as("n_rows"),
            round(sum("nat_span").cast("double") / count(lit(1)), 6)
              .as("avg_nat_span"),
            round(sum("band_span").cast("double") / count(lit(1)), 6)
              .as("avg_band_span"))
          .select(lit(name).as("layout"), col("n_blocks"), col("n_rows"),
            col("avg_nat_span"), col("avg_band_span"))
      spans("zblock", "zorder").unionByName(spans("lexblock", "lex"))
        .orderBy("layout")
    }),

    // Weighted Bernoulli sampling: include each lineitem with
    // probability l_quantity/50, decided by pure integer arithmetic on
    // the md5 hash family (bucket*50 < q*1e6 ⇔ bucket < q*20000 out of
    // 1e6). Membership is a row-local predicate — the scan IS the
    // sampler, zero extra passes — and reproducible across engines and
    // re-runs (no rand(), no float threshold). ht_rows_e6 is the
    // Horvitz-Thompson estimator Σ 1/p over the sample kept in exact
    // integer µ-units (50e6 div q), so the unbiased-count check is
    // itself oracle-hashable.
    "q75_weighted_sample" -> ((spark, dir) => {
      val l = t(spark, dir, "lineitem")
      val bucket = pmod(graft.functions.Md5Pack(
        concat(lit("ws_"), col("l_orderkey").cast("string"), lit("_"),
          col("l_linenumber").cast("string"))), lit(1000000L))
      l.withColumn("q", col("l_quantity").cast("long"))
        .withColumn("sampled", bucket * 50L < col("q") * 1000000L)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_total"),
          count_if(col("sampled")).as("n_sampled"),
          sum(col("q")).cast("long").as("qty_total"),
          sum(when(col("sampled"), col("q"))).cast("long").as("qty_sampled"),
          sum(when(col("sampled"), expr("50000000 div q"))).cast("long")
            .as("ht_rows_e6"))
        .withColumn("achieved_rate",
          round(col("n_sampled").cast("double") / col("n_total"), 6))
        .withColumn("expected_rate",
          round(col("qty_total").cast("double") / (col("n_total") * 50L), 6))
        .withColumn("ht_count_est",
          round(col("ht_rows_e6").cast("double") / 1e6, 3))
        .orderBy("l_returnflag")
    }),

    // Weekly retention cohorts: users keyed by first-activity ISO week,
    // re-observed in later weeks; retention = active / cohort size. Two
    // aggregations on the user key plus one co-keyed join — cohort
    // assignment never sorts the event stream, and the per-cohort ratio
    // rides the q70 whole-partition window over the already-aggregated
    // (cohort, offset) frame (≤ weeks² rows, trivially windowable at
    // any corpus scale).
    "q76_retention_cohorts" -> ((spark, dir) => {
      val e = t(spark, dir, "events")
      val activity = e
        .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("week"))
        .distinct()
      val cohorts = activity.groupBy("user_id")
        .agg(min("week").as("cohort_week"))
      val counts = activity.join(cohorts, "user_id")
        .withColumn("week_offset", expr("datediff(week, cohort_week) div 7"))
        .groupBy("cohort_week", "week_offset")
        .agg(count(lit(1)).as("n_active"))
      val w = Window.partitionBy("cohort_week")
      counts
        .withColumn("cohort_size",
          max(when(col("week_offset") === 0, col("n_active"))).over(w))
        .withColumn("retention",
          round(col("n_active").cast("double") / col("cohort_size"), 6))
        .orderBy("cohort_week", "week_offset")
    }),

    // Schema-driven column profiling over an ingestion batch (orders
    // plus a planted nullable column so the null census has something
    // to count) — one shared scan, every metric map-side combinable,
    // exact distincts through the Expand rewrite. The profiler itself
    // is the reusable operators.ColumnProfiler.
    "q77_column_profile" -> ((spark, dir) => {
      val o = t(spark, dir, "orders").withColumn("o_clerk_note",
        when(col("o_orderkey") % 10 < 3, lit(null).cast("string"))
          .otherwise(col("o_orderpriority")))
      graft.operators.ColumnProfiler.profile(o)
    }),

    // Sweep-line concurrency: synthetic order-fulfilment intervals
    // (30/60/90 days by key) → +1/−1 boundary deltas → running sum.
    // The deltas AGGREGATE to one row per boundary date first (map-side
    // combinable), so the one global running-sum window orders a
    // bounded frame — distinct calendar dates, ~2.4k rows — never the
    // fact table, the same bounded-window device as q72's binned CDF.
    "q78_open_interval_peaks" -> ((spark, dir) => {
      val o = t(spark, dir, "orders")
        .withColumn("d0", to_date(col("o_orderdate")))
        .withColumn("d1", date_add(col("d0"),
          (lit(30) * (lit(1) + col("o_orderkey") % 3)).cast("int")))
      val deltas = o.select(col("d0").as("d"), lit(1L).as("delta"))
        .unionAll(o.select(col("d1").as("d"), lit(-1L).as("delta")))
        .groupBy("d").agg(sum("delta").as("net"))
      val run = Window.orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      deltas.withColumn("open", sum("net").over(run))
        .groupBy(year(col("d")).as("yr"))
        .agg(count(lit(1)).as("n_boundary_days"),
          max("open").cast("long").as("peak_open"),
          min("open").cast("long").as("trough_open"))
        .orderBy("yr")
    }),

    // Single-source BFS hop distances (operators.BfsHops) over a
    // SPARSIFIED trade graph: nations trade only along a ±2-key
    // "corridor" band, turning the near-complete trade clique into a
    // path-like network with real multi-hop structure (source
    // eccentricity ~12 instead of 1). Same condense-first shape as
    // q64/q67 — the fact join aggregates to a nodes²-bounded edge list
    // before any iteration; unreachable nations surface as NULL.
    "q81_bfs_hops" -> ((spark, dir) => {
      val raw = t(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(t(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(spark, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(t(spark, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .filter(col("s_nationkey") =!= col("c_nationkey") &&
          abs(col("s_nationkey") - col("c_nationkey")) <= 2)
        .select(least(col("s_nationkey"), col("c_nationkey")).as("a"),
          greatest(col("s_nationkey"), col("c_nationkey")).as("b"))
        .distinct()
      val dist = graft.operators.BfsHops
        .hops(raw, "a", "b", source = 0L, undirected = true)
      t(spark, dir, "nation")
        .join(broadcast(dist), col("n_nationkey") === col("node"), "left")
        .select(col("n_name"), col("dist").as("hops"))
        .orderBy("n_name")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q73_changelog_merge" ->
      """WITH snap AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS s_status,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS s_price
        |  FROM orders WHERE o_orderkey % 3 <> 0),
        |cl AS (
        |  SELECT o_orderkey AS k, 'I' AS op, 0 AS seq,
        |    o_orderstatus AS c_status,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS c_price
        |  FROM orders WHERE o_orderkey % 3 = 0 AND o_orderkey % 2 = 1
        |  UNION ALL
        |  SELECT o_orderkey, 'U', 1, o_orderstatus,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) + 100 AS DECIMAL(18,2))
        |  FROM orders WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 'D', 1, 'X', CAST(0 AS DECIMAL(18,2))
        |  FROM orders WHERE o_orderkey % 7 = 0 AND o_orderkey % 5 <> 0
        |  UNION ALL
        |  SELECT o_orderkey, 'U', 2, o_orderstatus,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) + 200 AS DECIMAL(18,2))
        |  FROM orders WHERE o_orderkey % 10 = 0),
        |latest AS (
        |  SELECT k, arg_max(op, seq) AS op, arg_max(c_status, seq) AS c_status,
        |    arg_max(c_price, seq) AS c_price
        |  FROM cl GROUP BY k),
        |merged AS (
        |  SELECT coalesce(s.k, l.k) AS k, s_status, s_price, op, c_price,
        |    CASE WHEN op = 'D' AND s_status IS NOT NULL THEN 'deleted'
        |         WHEN op = 'D' THEN 'noop_delete'
        |         WHEN op IS NOT NULL AND s_status IS NOT NULL THEN 'updated'
        |         WHEN op IS NOT NULL THEN 'inserted'
        |         ELSE 'unchanged' END AS action
        |  FROM snap s FULL OUTER JOIN latest l ON s.k = l.k)
        |SELECT action, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN action NOT IN ('deleted', 'noop_delete')
        |    THEN CASE WHEN op IS NOT NULL THEN c_price ELSE s_price END
        |    END) AS DOUBLE) AS sum_price_after,
        |  CAST(sum(k) AS BIGINT) AS key_sum
        |FROM merged GROUP BY action ORDER BY action""".stripMargin,

    "q74_zorder" ->
      """WITH j AS (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nat,
        |    CAST(least(floor(o_totalprice / 16000.0), 31.0) AS BIGINT) AS band
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |keyed AS (
        |  SELECT nat, band,
        |    (((nat >> 0) & 1) * 1 + ((band >> 0) & 1) * 2
        |     + ((nat >> 1) & 1) * 4 + ((band >> 1) & 1) * 8
        |     + ((nat >> 2) & 1) * 16 + ((band >> 2) & 1) * 32
        |     + ((nat >> 3) & 1) * 64 + ((band >> 3) & 1) * 128
        |     + ((nat >> 4) & 1) * 256 + ((band >> 4) & 1) * 512) // 16
        |      AS zblock,
        |    (nat * 32 + band) // 16 AS lexblock
        |  FROM j),
        |zb AS (
        |  SELECT zblock, count(*) AS n, max(nat) - min(nat) AS nat_span,
        |    max(band) - min(band) AS band_span
        |  FROM keyed GROUP BY 1),
        |lb AS (
        |  SELECT lexblock, count(*) AS n, max(nat) - min(nat) AS nat_span,
        |    max(band) - min(band) AS band_span
        |  FROM keyed GROUP BY 1),
        |u AS (
        |  SELECT 'zorder' AS layout, CAST(count(*) AS BIGINT) AS n_blocks,
        |    CAST(sum(n) AS BIGINT) AS n_rows,
        |    round(CAST(sum(nat_span) AS DOUBLE) / count(*), 6) AS avg_nat_span,
        |    round(CAST(sum(band_span) AS DOUBLE) / count(*), 6) AS avg_band_span
        |  FROM zb
        |  UNION ALL
        |  SELECT 'lex', CAST(count(*) AS BIGINT), CAST(sum(n) AS BIGINT),
        |    round(CAST(sum(nat_span) AS DOUBLE) / count(*), 6),
        |    round(CAST(sum(band_span) AS DOUBLE) / count(*), 6)
        |  FROM lb)
        |SELECT * FROM u ORDER BY layout""".stripMargin,

    "q75_weighted_sample" -> {
      val h = Tables.duckMd5Pack("concat('ws_', l_orderkey, '_', l_linenumber)")
      s"""WITH base AS (
         |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q,
         |    ($h % 1000000) * 50 < CAST(l_quantity AS BIGINT) * 1000000
         |      AS sampled
         |  FROM lineitem)
         |SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_total,
         |  CAST(count(*) FILTER (WHERE sampled) AS BIGINT) AS n_sampled,
         |  CAST(sum(q) AS BIGINT) AS qty_total,
         |  CAST(sum(q) FILTER (WHERE sampled) AS BIGINT) AS qty_sampled,
         |  CAST(sum(50000000 // q) FILTER (WHERE sampled) AS BIGINT)
         |    AS ht_rows_e6,
         |  round(CAST(count(*) FILTER (WHERE sampled) AS DOUBLE)
         |    / count(*), 6) AS achieved_rate,
         |  round(CAST(sum(q) AS DOUBLE) / (count(*) * 50), 6)
         |    AS expected_rate,
         |  round(CAST(CAST(sum(50000000 // q) FILTER (WHERE sampled)
         |    AS BIGINT) AS DOUBLE) / 1e6, 3) AS ht_count_est
         |FROM base GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    },

    "q76_retention_cohorts" ->
      """WITH activity AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
        |  FROM events),
        |cohorts AS (
        |  SELECT user_id, min(week) AS cohort_week
        |  FROM activity GROUP BY user_id),
        |counts AS (
        |  SELECT cohort_week,
        |    date_diff('day', cohort_week, week) // 7 AS week_offset,
        |    CAST(count(*) AS BIGINT) AS n_active
        |  FROM activity JOIN cohorts USING (user_id)
        |  GROUP BY 1, 2)
        |SELECT cohort_week, week_offset, n_active,
        |  CAST(max(CASE WHEN week_offset = 0 THEN n_active END)
        |    OVER (PARTITION BY cohort_week) AS BIGINT) AS cohort_size,
        |  round(CAST(n_active AS DOUBLE)
        |    / max(CASE WHEN week_offset = 0 THEN n_active END)
        |      OVER (PARTITION BY cohort_week), 6) AS retention
        |FROM counts ORDER BY cohort_week, week_offset""".stripMargin,

    "q77_column_profile" -> {
      def num(c: String) =
        s"""SELECT '$c' AS col_name,
           |  CAST(count(*) FILTER (WHERE $c IS NULL) AS BIGINT) AS n_nulls,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  CAST(min($c) AS DOUBLE) AS num_min,
           |  CAST(max($c) AS DOUBLE) AS num_max,
           |  CAST(NULL AS VARCHAR) AS str_min, CAST(NULL AS VARCHAR) AS str_max
           |FROM src""".stripMargin
      def str(c: String) =
        s"""SELECT '$c', CAST(count(*) FILTER (WHERE $c IS NULL) AS BIGINT),
           |  CAST(count(DISTINCT $c) AS BIGINT),
           |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), min($c), max($c)
           |FROM src""".stripMargin
      def dt(c: String) =
        s"""SELECT '$c', CAST(count(*) FILTER (WHERE $c IS NULL) AS BIGINT),
           |  CAST(count(DISTINCT $c) AS BIGINT),
           |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           |  CAST(CAST(min($c) AS DATE) AS VARCHAR),
           |  CAST(CAST(max($c) AS DATE) AS VARCHAR)
           |FROM src""".stripMargin
      s"""WITH src AS (
         |  SELECT *, CASE WHEN o_orderkey % 10 < 3 THEN NULL
         |    ELSE o_orderpriority END AS o_clerk_note
         |  FROM orders)
         |SELECT * FROM (
         |${num("o_orderkey")} UNION ALL ${num("o_custkey")}
         |UNION ALL ${str("o_orderstatus")} UNION ALL ${num("o_totalprice")}
         |UNION ALL ${dt("o_orderdate")} UNION ALL ${str("o_orderpriority")}
         |UNION ALL ${str("o_clerk_note")})
         |ORDER BY col_name""".stripMargin
    },

    "q78_open_interval_peaks" ->
      """WITH iv AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d0,
        |    CAST(o_orderdate AS DATE)
        |      + CAST(30 * (1 + o_orderkey % 3) AS INTEGER) AS d1
        |  FROM orders),
        |deltas AS (
        |  SELECT d, CAST(sum(delta) AS BIGINT) AS net FROM (
        |    SELECT d0 AS d, 1 AS delta FROM iv
        |    UNION ALL SELECT d1, -1 FROM iv)
        |  GROUP BY d),
        |run AS (
        |  SELECT d, sum(net) OVER (ORDER BY d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS open
        |  FROM deltas)
        |SELECT year(d) AS yr, CAST(count(*) AS BIGINT) AS n_boundary_days,
        |  CAST(max(open) AS BIGINT) AS peak_open,
        |  CAST(min(open) AS BIGINT) AS trough_open
        |FROM run GROUP BY 1 ORDER BY 1""".stripMargin,

    "q81_bfs_hops" ->
      """WITH RECURSIVE raw AS (
        |  SELECT DISTINCT least(s_nationkey, c_nationkey) AS a,
        |    greatest(s_nationkey, c_nationkey) AS b
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN customer ON o_custkey = c_custkey
        |  WHERE s_nationkey <> c_nationkey
        |    AND abs(s_nationkey - c_nationkey) <= 2),
        |edges AS (
        |  SELECT a AS src, b AS dst FROM raw
        |  UNION SELECT b, a FROM raw),
        |walk AS (
        |  SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist
        |  UNION
        |  SELECT e.dst, w.dist + 1
        |  FROM walk w JOIN edges e ON w.node = e.src
        |  WHERE w.dist < 30),
        |hops AS (SELECT node, min(dist) AS dist FROM walk GROUP BY node)
        |SELECT n_name, hops.dist AS hops
        |FROM nation LEFT JOIN hops ON n_nationkey = hops.node
        |ORDER BY n_name""".stripMargin,
  )
}
