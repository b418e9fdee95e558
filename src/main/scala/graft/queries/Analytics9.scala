package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 5 (SURVEY.md §2.4):
  *
  *  - q108: point-in-time (temporal) dimension lookup — the consumption
  *    side of q87's SCD2 build: each probe (key, as-of time) joins to
  *    the ONE dimension version whose validity interval covers it, with
  *    delete-closed gaps correctly yielding no match. The plan is an
  *    equi-join on the key with the interval bounds as a residual
  *    condition — at scale the shuffle keys on `k` alone and the ≤3
  *    versions per key evaluate as a residual filter, never a range
  *    explosion. Intervals are disjoint by construction, so the join is
  *    1:≤1 (no fanout).
  *  - q109: single-source weighted shortest paths (Bellman-Ford
  *    relaxation to a fixpoint) over the corridor-sparsified nation
  *    trade graph, with deterministic integer edge weights — the
  *    weighted complement of q81's hop distances, via
  *    `operators.BfsHops.weighted`. Exact integer arithmetic; the
  *    DuckDB oracle replays |V|−1 = 24 unrolled relaxation rounds
  *    (generated CTE chain), which provably reaches the same unique
  *    fixpoint the iterative side converges to.
  *  - q110: MAD robust outlier detection — per-group median absolute
  *    deviation with a 4.4478·MAD (≈3σ) threshold; exact medians over
  *    integer-valued quantities, so the whole chain replays bit-for-bit.
  */
object Analytics9 {
  import Tables.t

  /** Corridor trade-graph edges with a deterministic symmetric integer
    * weight (shared by the q109 query and its oracle text).
    */
  private val EdgeWeightSql = "1 + (a * 7 + b * 3) % 5"
  private val BfIters = 24 // |V|−1 for the 25-nation graph
  // mid-corridor source: connected at every SF (node 0 has no corridor
  // edges at sf0.001), while the far component stays honestly NULL
  private val BfSource = 12L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q108_temporal_join" -> ((spark, dir) => {
      val versions = Analytics6.scd2Versions(spark, dir)
      val probes = versions.select(col("k")).distinct()
        .withColumn("t", col("k") % 4)
      probes.alias("p").join(versions.alias("v"),
          col("p.k") === col("v.k") &&
            col("v.valid_from") <= col("p.t") &&
            (col("v.valid_to").isNull || col("p.t") < col("v.valid_to")),
          "left")
        .select(col("p.k").as("k"), col("p.t").as("t"),
          col("v.status").as("status"), col("v.price").as("price"),
          col("v.status").isNotNull.as("matched"))
        .orderBy("k")
    }),

    // MAD robust outliers: median absolute deviation per group — the
    // robust complement of q99's mean/σ z-scores (one wild day can't
    // inflate its own threshold). l_quantity is integer-valued, so both
    // medians (and every |x−med| deviation) are exact in double and the
    // 4.4478·MAD (≈3σ) threshold compare replays bit-for-bit. Two
    // bounded aggregations + two 3-row broadcast joins — no windows.
    "q110_mad_outliers" -> ((spark, dir) => {
      val li = t(spark, dir, "lineitem")
        .select(col("l_returnflag"), col("l_quantity").cast("double").as("q"))
      val med = li.groupBy("l_returnflag").agg(median(col("q")).as("med"))
      val dev = li.join(broadcast(med), "l_returnflag")
        .withColumn("adev", abs(col("q") - col("med")))
      val mad = dev.groupBy("l_returnflag")
        .agg(median(col("adev")).as("mad"), min(col("med")).as("med"),
          count(lit(1)).as("n"))
      dev.join(broadcast(mad.select(col("l_returnflag"),
          col("mad").as("mad_v"))), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(count_if(col("adev") > col("mad_v") * lit(4.4478))
          .as("n_outliers"))
        .join(mad, "l_returnflag")
        .select(col("l_returnflag"), col("n"), col("med"), col("mad"),
          col("n_outliers"),
          round(col("n_outliers").cast("double") / col("n"), 6)
            .as("outlier_frac"))
        .orderBy("l_returnflag")
    }),

    "q109_weighted_paths" -> ((spark, dir) => {
      val raw = t(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(t(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey")),
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
        // symmetric deterministic weight from the canonical endpoint pair
        .withColumn("w", expr(EdgeWeightSql))
      val dist = graft.operators.BfsHops
        .weighted(raw, "a", "b", "w", source = BfSource, undirected = true)
      t(spark, dir, "nation")
        .join(broadcast(dist), col("n_nationkey") === col("node"), "left")
        .select(col("n_name"), col("dist").as("cost"))
        .orderBy("n_name")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q108_temporal_join" ->
      s"""WITH ${Analytics6.Scd2VersionsSql},
         |probes AS (
         |  SELECT DISTINCT k, k % 4 AS t FROM versions)
         |SELECT p.k, CAST(p.t AS BIGINT) AS t, v.status, v.price,
         |  v.status IS NOT NULL AS matched
         |FROM probes p LEFT JOIN versions v
         |  ON p.k = v.k AND v.valid_from <= p.t
         |  AND (v.valid_to IS NULL OR p.t < v.valid_to)
         |ORDER BY p.k""".stripMargin,

    "q110_mad_outliers" ->
      """WITH li AS (
        |  SELECT l_returnflag AS f, CAST(l_quantity AS DOUBLE) AS q
        |  FROM lineitem),
        |med AS (SELECT f, median(q) AS med FROM li GROUP BY f),
        |dev AS (
        |  SELECT li.f, q, med, abs(q - med) AS adev
        |  FROM li JOIN med USING (f)),
        |mad AS (
        |  SELECT f, median(adev) AS mad, min(med) AS med,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM dev GROUP BY f),
        |outl AS (
        |  SELECT dev.f, CAST(count(*) FILTER (
        |      WHERE adev > mad * CAST(4.4478 AS DOUBLE)) AS BIGINT)
        |    AS n_outliers
        |  FROM dev JOIN mad ON dev.f = mad.f GROUP BY dev.f)
        |SELECT mad.f AS l_returnflag, n, med, mad, n_outliers,
        |  round(CAST(n_outliers AS DOUBLE) / n, 6) AS outlier_frac
        |FROM mad JOIN outl ON mad.f = outl.f
        |ORDER BY l_returnflag""".stripMargin,

    "q109_weighted_paths" -> {
      // |V|−1 unrolled Bellman-Ford rounds: d_i(n) = min(d_{i-1}(n),
      // min over in-edges of d_{i-1}(pred) + w) — reaches the unique
      // fixpoint the iterative Spark side converges to.
      // AS MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and
      // each round references the previous one twice — unmaterialized,
      // the expansion (and the base-table scan count) grows 2^rounds.
      val rounds = (1 to BfIters).map { i =>
        s"""d$i AS MATERIALIZED (
           |  SELECT p.node,
           |    CASE WHEN o.od IS NULL THEN p.d
           |         WHEN p.d IS NULL THEN o.od
           |         ELSE least(p.d, o.od) END AS d
           |  FROM d${i - 1} p LEFT JOIN (
           |    SELECT e.dst AS node, min(p2.d + e.w) AS od
           |    FROM d${i - 1} p2 JOIN edges e ON p2.node = e.src
           |    WHERE p2.d IS NOT NULL GROUP BY e.dst) o
           |  ON p.node = o.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH raw AS MATERIALIZED (
         |  SELECT DISTINCT least(s_nationkey, c_nationkey) AS a,
         |    greatest(s_nationkey, c_nationkey) AS b
         |  FROM lineitem
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN customer ON o_custkey = c_custkey
         |  WHERE s_nationkey <> c_nationkey
         |    AND abs(s_nationkey - c_nationkey) <= 2),
         |edges AS MATERIALIZED (
         |  SELECT a AS src, b AS dst, $EdgeWeightSql AS w FROM raw
         |  UNION ALL SELECT b, a, $EdgeWeightSql FROM raw),
         |nodes AS (
         |  SELECT DISTINCT src AS node FROM edges
         |  UNION SELECT dst FROM edges
         |  UNION SELECT $BfSource),
         |d0 AS MATERIALIZED (
         |  SELECT node, CASE WHEN node = $BfSource THEN CAST(0 AS BIGINT)
         |    ELSE CAST(NULL AS BIGINT) END AS d FROM nodes),
         |$rounds
         |SELECT n_name, d$BfIters.d AS cost
         |FROM nation LEFT JOIN d$BfIters ON n_nationkey = node
         |ORDER BY n_name""".stripMargin
    },
  )
}
