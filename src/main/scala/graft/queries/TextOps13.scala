package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 24 (SURVEY.md §2.4):
  *
  *  - q139: monthly PSI drift series — q120's population-stability
  *    index tracked over time: every 1996 shipping month scored
  *    against the full-1995 reference distribution on the same
  *    20-bin spine (Laplace-smoothed, per-bin terms rounded→DECIMAL
  *    before each month's sum). One counts pass; months × bins stays
  *    calendar-bounded. This is the drift DASHBOARD, where q120 is
  *    the single gate.
  *  - s14: embedding-hygiene QA — the vector-data gate before any
  *    training run: per label, vector counts, zero-dimension counts,
  *    mean norm, and norm OUTLIERS beyond 2σ — with the outlier
  *    predicate evaluated in EXACT decimals ((n·x − S1)² >
  *    4·(n·S2 − S1²), the q123 n-scaling device lifted to variance),
  *    so both engines flag the identical set. Norms accumulate in the
  *    same sequential order as DuckDB's list_dot_product (the
  *    CosineSim parity precedent); per-label stats broadcast back
  *    onto one corpus pass.
  */
object TextOps13 {
  import Tables.t

  private val PsiBins = 20
  private val PsiWidth = 5000

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q139_monthly_psi_drift" -> ((spark, dir) => {
      val li = t(spark, dir, "lineitem")
        .select(
          least(lit(PsiBins - 1L),
            expr(s"CAST(floor(l_extendedprice / $PsiWidth) AS BIGINT)"))
            .as("bin"),
          year(col("l_shipdate")).as("yr"),
          month(col("l_shipdate")).as("mo"))
        .filter(col("yr").isin(1995, 1996))
      val ref = li.filter(col("yr") === 1995)
        .groupBy("bin").agg(count(lit(1)).as("cnt_ref"))
      val cur = li.filter(col("yr") === 1996)
        .groupBy("mo", "bin").agg(count(lit(1)).as("cnt_cur"))
      val spine = spark.range(PsiBins).select(col("id").as("bin"))
        .crossJoin(spark.range(1, 13).select(col("id").as("mo")))
      val binned = spine
        .join(ref, Seq("bin"), "left")
        .join(cur, Seq("mo", "bin"), "left")
        .select(col("mo"), col("bin"),
          coalesce(col("cnt_ref"), lit(0L)).as("cnt_ref"),
          coalesce(col("cnt_cur"), lit(0L)).as("cnt_cur"))
      val nRef = ref.agg(sum(col("cnt_ref")).as("n_ref"))
      val nCur = binned.groupBy("mo").agg(sum(col("cnt_cur")).as("n_cur"))
      binned
        .join(broadcast(nCur), "mo").crossJoin(broadcast(nRef))
        .withColumn("pa", (col("cnt_ref") + 1).cast("double") /
          (col("n_ref") + PsiBins))
        .withColumn("pb", (col("cnt_cur") + 1).cast("double") /
          (col("n_cur") + PsiBins))
        .withColumn("psi_term",
          round((col("pa") - col("pb")) * log(col("pa") / col("pb")), 9))
        .groupBy("mo")
        .agg(max(col("n_cur")).as("n_cur"),
          sum(col("psi_term").cast("decimal(18,9)")).cast("double")
            .as("psi"))
        .orderBy("mo")
    }),

    "s14_vector_qa" -> ((spark, dir) => {
      val e = t(spark, dir, "embeddings").filter(col("embedding").isNotNull)
        .select(col("vec_id"), col("label"),
          graft.functions.VectorOps.toDouble(col("embedding")).as("emb"))
        .withColumn("x", round(graft.functions.VectorOps.norm(col("emb")), 6)
          .cast("decimal(9,6)"))
        .withColumn("n_zero",
          size(filter(col("emb"), v => v === 0.0)).cast("long"))
      val stats = e.groupBy("label")
        .agg(count(lit(1)).cast("decimal(8,0)").as("n"),
          sum(col("x")).cast("decimal(16,6)").as("s1"),
          sum((col("x") * col("x")).cast("decimal(28,12)"))
            .cast("decimal(20,12)").as("s2"),
          sum(col("n_zero")).as("zero_dims"))
      // exact-decimal outlier predicate: (n·x − S1)² > 4·(n·S2 − S1²)
      val flagged = e.join(broadcast(stats), "label")
        .withColumn("lhs", expr(
          "CAST((CAST(n * x AS DECIMAL(18,6)) - s1) AS DECIMAL(19,6))"))
        .withColumn("is_outlier", expr(
          "CAST(lhs * lhs AS DECIMAL(38,12)) > " +
            "CAST(4 * (CAST(n * s2 AS DECIMAL(29,12)) - " +
            "CAST(s1 * s1 AS DECIMAL(33,12))) AS DECIMAL(38,12))"))
      flagged.groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
          max(col("zero_dims")).as("zero_dims"),
          count_if(col("is_outlier")).as("n_outliers"),
          round(max(col("s1")).cast("double") /
            count(lit(1)), 6).as("mean_norm"))
        .select(col("label"), col("n_vecs"), col("zero_dims"),
          col("n_outliers"), col("mean_norm"))
        .orderBy("label")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q139_monthly_psi_drift" ->
      s"""WITH li AS (
         |  SELECT least(${PsiBins - 1},
         |      CAST(floor(l_extendedprice / $PsiWidth) AS BIGINT)) AS bin,
         |    year(l_shipdate) AS yr, month(l_shipdate) AS mo
         |  FROM lineitem WHERE year(l_shipdate) IN (1995, 1996)),
         |ref AS (
         |  SELECT bin, CAST(count(*) AS BIGINT) AS cnt_ref
         |  FROM li WHERE yr = 1995 GROUP BY 1),
         |cur AS (
         |  SELECT mo, bin, CAST(count(*) AS BIGINT) AS cnt_cur
         |  FROM li WHERE yr = 1996 GROUP BY 1, 2),
         |spine AS (
         |  SELECT CAST(b.range AS BIGINT) AS bin,
         |    CAST(m.range AS BIGINT) AS mo
         |  FROM range($PsiBins) b CROSS JOIN range(1, 13) m),
         |binned AS (
         |  SELECT spine.mo, spine.bin,
         |    coalesce(cnt_ref, 0) AS cnt_ref,
         |    coalesce(cnt_cur, 0) AS cnt_cur
         |  FROM spine
         |  LEFT JOIN ref ON spine.bin = ref.bin
         |  LEFT JOIN cur ON spine.mo = cur.mo AND spine.bin = cur.bin),
         |nr AS (SELECT CAST(sum(cnt_ref) AS BIGINT) AS n_ref FROM ref),
         |nc AS (SELECT mo, CAST(sum(cnt_cur) AS BIGINT) AS n_cur
         |       FROM binned GROUP BY mo),
         |terms AS (
         |  SELECT binned.mo, n_cur,
         |    round((CAST(cnt_ref + 1 AS DOUBLE) / (n_ref + $PsiBins)
         |      - CAST(cnt_cur + 1 AS DOUBLE) / (n_cur + $PsiBins))
         |      * ln((CAST(cnt_ref + 1 AS DOUBLE) / (n_ref + $PsiBins))
         |        / (CAST(cnt_cur + 1 AS DOUBLE) / (n_cur + $PsiBins))), 9)
         |      AS psi_term
         |  FROM binned JOIN nc ON binned.mo = nc.mo CROSS JOIN nr)
         |SELECT mo, max(n_cur) AS n_cur,
         |  CAST(sum(CAST(psi_term AS DECIMAL(18,9))) AS DOUBLE) AS psi
         |FROM terms GROUP BY mo ORDER BY mo""".stripMargin,

    "s14_vector_qa" ->
      """WITH e AS (
        |  SELECT vec_id, label,
        |    list_transform(embedding, v -> CAST(v AS DOUBLE)) AS emb
        |  FROM embeddings WHERE embedding IS NOT NULL),
        |x AS (
        |  SELECT vec_id, label,
        |    CAST(round(sqrt(list_dot_product(emb, emb)), 6)
        |      AS DECIMAL(9,6)) AS x,
        |    CAST(len(list_filter(emb, v -> v = 0.0)) AS BIGINT) AS n_zero
        |  FROM e),
        |stats AS (
        |  SELECT label, CAST(count(*) AS DECIMAL(8,0)) AS n,
        |    CAST(sum(x) AS DECIMAL(16,6)) AS s1,
        |    CAST(sum(CAST(x * x AS DECIMAL(28,12))) AS DECIMAL(20,12))
        |      AS s2,
        |    CAST(sum(n_zero) AS BIGINT) AS zero_dims
        |  FROM x GROUP BY 1),
        |flagged AS (
        |  SELECT x.label,
        |    CAST(CAST(x.x * n AS DECIMAL(18,6)) - s1 AS DECIMAL(19,6))
        |      AS lhs,
        |    n, s1, s2
        |  FROM x JOIN stats ON x.label = stats.label),
        |marked AS (
        |  SELECT label,
        |    CAST(lhs * lhs AS DECIMAL(38,12)) >
        |      CAST(4 * (CAST(n * s2 AS DECIMAL(29,12)) -
        |        CAST(s1 * s1 AS DECIMAL(33,12))) AS DECIMAL(38,12))
        |      AS is_outlier
        |  FROM flagged)
        |SELECT stats.label, CAST(stats.n AS BIGINT) AS n_vecs, zero_dims,
        |  (SELECT CAST(count(*) FILTER (WHERE is_outlier) AS BIGINT)
        |   FROM marked WHERE marked.label = stats.label) AS n_outliers,
        |  round(CAST(s1 AS DOUBLE) / CAST(n AS BIGINT), 6) AS mean_norm
        |FROM stats ORDER BY label""".stripMargin,
  )
}
