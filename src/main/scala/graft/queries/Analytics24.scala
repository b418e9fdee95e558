package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 27 (SURVEY.md §2.4):
  *
  *  - q143: one-way ANOVA F-test — does market segment explain order
  *    value? Completes the inference family (chi² q95, KS q72, A/B z
  *    q88, MI q132): per-group Σx and Σx² in exact decimal cents, the
  *    between-group term Σ s_g²/n_g rounded →DECIMAL per group before
  *    the cross-group sum (float aggregation order is not guaranteed,
  *    even over 5 rows), one identical float chain for F at the end.
  *  - d27: dedup-family consistency audit — the invariant that makes
  *    d4 → d8 → d12 a coherent story: every d4 candidate pair must
  *    land inside ONE d8 connected component (violations ≡ 0), plus
  *    the cluster-size histogram. Spark composes the existing query
  *    functions; the oracle embeds both queries' SQL as
  *    subquery-CTEs, so the invariant is checked end to end in BOTH
  *    engines.
  */
object Analytics24 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q143_anova_f" -> ((spark, dir) => {
      val cells = t(spark, dir, "orders")
        .join(t(spark, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("segment"),
          (col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("decimal(18,0)").as("cents"))
      val grp = cells.groupBy("segment")
        .agg(count(lit(1)).as("n_g"),
          sum(col("cents")).cast("decimal(38,0)").as("s_g"),
          sum((col("cents") * col("cents")).cast("decimal(38,0)"))
            .cast("decimal(38,0)").as("ss_g"))
      // per-group float terms round →DECIMAL before the cross-group sum
      val agg = grp.agg(count(lit(1)).as("k"),
        sum(col("n_g")).as("n"),
        sum(col("s_g")).cast("decimal(38,0)").as("s"),
        sum(col("ss_g")).cast("decimal(38,0)").as("ss"),
        sum(round(col("s_g").cast("double") * col("s_g").cast("double") /
          col("n_g"), 6).cast("decimal(38,6)")).as("ssb_raw"))
      agg.select(col("k"), col("n"),
          round((
            (col("ssb_raw").cast("double") -
              col("s").cast("double") * col("s").cast("double") / col("n"))
              / (col("k") - 1)) / (
            (col("ss").cast("double") - col("ssb_raw").cast("double"))
              / (col("n") - col("k"))), 6).as("f_stat"))
    }),

    "d27_cluster_consistency" -> ((spark, dir) => {
      // One d4 execution feeds BOTH the pair list and the components
      // (invoking d8 here would re-run the whole minhash pipeline —
      // measured 2× cost in the bench before this was inlined)
      val pairs = graft.queries.TextOps.queries("d4_minhash_pairs")(
        spark, dir).select(col("a_id"), col("b_id"))
        .localCheckpoint(true)
      val clusters = graft.operators.ConnectedComponents
        .labels(pairs, "a_id", "b_id")
        .select(col("node").as("doc_id"),
          col("component").as("cluster_keeper"))
        // checkpoint once: the summary needs two grains and clusters
        // feeds both the join and the histogram — without the barrier
        // the whole minhash pipeline re-executes per consumer, and
        // persist would keep the full lineage in the result plan
        // (258 census exchanges for a 4s query)
        .localCheckpoint(true)
      val ka = clusters.select(col("doc_id").as("a_id"),
        col("cluster_keeper").as("keep_a"))
      val kb = clusters.select(col("doc_id").as("b_id"),
        col("cluster_keeper").as("keep_b"))
      val joined = pairs.join(ka, "a_id").join(kb, "b_id")
        .localCheckpoint(true)
      val summary = joined.agg(count(lit(1)).as("n"))
        .select(lit("pairs").as("metric"), lit(0L).as("size"), col("n"))
        .unionByName(joined.agg(
          count_if(col("keep_a") =!= col("keep_b")).as("n"))
          .select(lit("violations").as("metric"), lit(0L).as("size"),
            col("n")))
      val hist = clusters.groupBy("cluster_keeper")
        .agg(count(lit(1)).as("sz"))
        .groupBy(col("sz").as("size"))
        .agg(count(lit(1)).as("n"))
        .select(lit("size_hist").as("metric"), col("size"), col("n"))
      summary.unionByName(hist).orderBy("metric", "size")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q143_anova_f" ->
      """WITH cells AS (
        |  SELECT c_mktsegment AS segment,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS DECIMAL(18,0)) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |grp AS (
        |  SELECT segment, CAST(count(*) AS BIGINT) AS n_g,
        |    CAST(sum(cents) AS DECIMAL(38,0)) AS s_g,
        |    CAST(sum(CAST(cents * cents AS DECIMAL(38,0)))
        |      AS DECIMAL(38,0)) AS ss_g
        |  FROM cells GROUP BY 1),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(n_g) AS BIGINT) AS n,
        |    CAST(sum(s_g) AS DECIMAL(38,0)) AS s,
        |    CAST(sum(ss_g) AS DECIMAL(38,0)) AS ss,
        |    sum(CAST(round(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)
        |      / n_g, 6) AS DECIMAL(38,6))) AS ssb_raw
        |  FROM grp)
        |SELECT k, n,
        |  round((
        |    (CAST(ssb_raw AS DOUBLE) -
        |      CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
        |      / (k - 1)) / (
        |    (CAST(ss AS DOUBLE) - CAST(ssb_raw AS DOUBLE))
        |      / (n - k)), 6) AS f_stat
        |FROM agg""".stripMargin,

    "d27_cluster_consistency" -> {
      val d4 = graft.queries.TextOps.oracleSql("d4_minhash_pairs")
      val d8 = graft.queries.TextOps.oracleSql("d8_dedup_clusters")
      s"""WITH pairs AS (SELECT a_id, b_id FROM ($d4)),
         |clusters AS (SELECT * FROM ($d8)),
         |joined AS (
         |  SELECT pairs.a_id, pairs.b_id,
         |    ca.cluster_keeper AS keep_a, cb.cluster_keeper AS keep_b
         |  FROM pairs
         |  JOIN clusters ca ON pairs.a_id = ca.doc_id
         |  JOIN clusters cb ON pairs.b_id = cb.doc_id),
         |summary AS (
         |  SELECT 'pairs' AS metric, CAST(0 AS BIGINT) AS size,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM joined
         |  UNION ALL
         |  SELECT 'violations', CAST(0 AS BIGINT),
         |    CAST(count(*) FILTER (WHERE keep_a <> keep_b) AS BIGINT)
         |  FROM joined),
         |hist AS (
         |  SELECT 'size_hist' AS metric, CAST(sz AS BIGINT) AS size,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM (SELECT cluster_keeper, count(*) AS sz
         |        FROM clusters GROUP BY 1)
         |  GROUP BY 2)
         |SELECT metric, size, n FROM summary
         |UNION ALL
         |SELECT metric, size, n FROM hist
         |ORDER BY metric, size""".stripMargin
    },
  )
}
