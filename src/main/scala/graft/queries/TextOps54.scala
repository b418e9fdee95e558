package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 108 dedup methods (SURVEY.md §2.4):
  *
  *  - d50: sorted-neighborhood dedup (SNM) — the third classic blocking
  *    family next to LSH (d4/d10) and prefix filtering (d11): sort the
  *    corpus by a cheap key (first three tokens), compare each record
  *    only against its w−1 = 4 successors in sort order. The global
  *    position comes from [[graft.operators.GlobalPrefixSum]] (range
  *    exchange + per-slice windows — never the single-task empty-
  *    PARTITION window), and the neighbor join is a banded equi-join:
  *    the right side probes its own and the previous 4-wide rank
  *    bucket, so each row meets a bounded candidate set — one shuffle,
  *    no corpus self-join. Candidates are verified with exact distinct-
  *    token Jaccard.
  */
object TextOps54 {
  import Tables.t

  /** Shared per-token probability SQL for t50 — rendered once to both
    * engines so every ln/sqrt evaluates in identical order. Terms are
    * rounded to DECIMAL(18,12) BEFORE the sum: the only
    * engine-sensitive ops (libm ln) differ by at most 1 ulp on values
    * < 1, far below the rounding grain, and the DECIMAL sum is
    * order-free.
    */
  private val pExpr = "(CAST(ca + 1 AS DOUBLE)) / (CAST(na + v AS DOUBLE)) AS p"
  private val qExpr = "(CAST(cb + 1 AS DOUBLE)) / (CAST(nb + v AS DOUBLE)) AS q"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Distribution-divergence suite between the two corpus halves
    // (doc_id parity): add-1-smoothed unigram distributions compared by
    // KL both ways, Jensen–Shannon, Hellinger, and total variation in
    // ONE pass over the per-token joint counts. The drift-metric
    // complement of q72 (KS) and q120 (PSI).
    "t50_divergence" -> ((spark, dir) => {
      val cnt = t(spark, dir, "documents")
        .filter(col("text").isNotNull)
        .select((col("doc_id") % 2).as("side"),
          explode(split(col("text"), " ")).as("token"))
        .groupBy("token")
        .agg(count_if(col("side") === 0).as("ca"),
          count_if(col("side") === 1).as("cb"))
      val scalars = cnt.agg(sum(col("ca")).as("na"),
        sum(col("cb")).as("nb"), count(lit(1)).as("v"))
      cnt.crossJoin(broadcast(scalars))
        .selectExpr("ca", "cb", "na", "nb", "v", pExpr, qExpr)
        .selectExpr("na", "nb", "v",
          "CAST(round(p * ln(p / q), 12) AS DECIMAL(18,12)) AS klab_t",
          "CAST(round(q * ln(q / p), 12) AS DECIMAL(18,12)) AS klba_t",
          "CAST(round(0.5 * p * ln(p / ((p + q) / 2)) " +
            "+ 0.5 * q * ln(q / ((p + q) / 2)), 12) AS DECIMAL(18,12))" +
            " AS js_t",
          "CAST(round((sqrt(p) - sqrt(q)) * (sqrt(p) - sqrt(q)), 12) " +
            "AS DECIMAL(18,12)) AS hel_t",
          "CAST(round(abs(p - q), 12) AS DECIMAL(18,12)) AS tv_t")
        .groupBy("na", "nb", "v")
        .agg(sum(col("klab_t")).as("skl"), sum(col("klba_t")).as("slk"),
          sum(col("js_t")).as("sjs"), sum(col("hel_t")).as("shel"),
          sum(col("tv_t")).as("stv"))
        .select(col("v").as("vocab"), col("na"), col("nb"),
          round(col("skl").cast("double"), 6).as("kl_ab"),
          round(col("slk").cast("double"), 6).as("kl_ba"),
          round(col("sjs").cast("double"), 6).as("js"),
          round(sqrt(col("shel").cast("double") / 2), 6).as("hellinger"),
          round(col("stv").cast("double") / 2, 6).as("tv"))
    }),

    "d50_sorted_neighborhood" -> ((spark, dir) => {
      val docs = t(spark, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          expr("array_join(slice(split(text, ' '), 1, 3), ' ')").as("k"),
          // hashed token sets for the window-pair jaccard (see
          // d2/PPJoin: 8x over string elements, 2^-62 collision caveat)
          graft.functions.Md5PackArr(
            expr("array_distinct(split(text, ' '))")).as("toks"))
      val ranked = graft.operators.GlobalPrefixSum
        .withRunningTotalBy(docs.withColumn("one", lit(1L)),
          struct(col("k"), col("doc_id")), "one", "rnk")
        .select(col("doc_id"), col("toks"), col("rnk"),
          ((col("rnk") - 1) / 4).cast("long").as("bkt"))
        .localCheckpoint(true) // feeds both sides of the band join
      val left = ranked.select(col("doc_id").as("a_id"),
        col("toks").as("ta"), col("rnk").as("ra"), col("bkt"))
      // each right row probes its own and the preceding bucket — every
      // in-window pair (distance 1..4) lands in exactly one equi-bucket
      val right = ranked
        .select(col("doc_id").as("b_id"), col("toks").as("tb"),
          col("rnk").as("rb"),
          explode(array(col("bkt"), col("bkt") - 1)).as("bkt"))
      left.join(right, "bkt")
        .filter(col("rb") - col("ra") >= 1 && col("rb") - col("ra") <= 4)
        .select(col("a_id"), col("b_id"),
          (col("rb") - col("ra")).as("rank_dist"),
          round(size(array_intersect(col("ta"), col("tb"))).cast("double")
            / (size(col("ta")) + size(col("tb"))
              - size(array_intersect(col("ta"), col("tb"))))
              .cast("double"), 6)
            .as("jaccard"))
        .withColumn("is_match", col("jaccard") >= 0.5)
        .orderBy("a_id", "b_id")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "t50_divergence" ->
      s"""WITH tok AS (
         |  SELECT doc_id % 2 AS side,
         |    unnest(string_split(text, ' ')) AS token
         |  FROM documents WHERE text IS NOT NULL),
         |cnt AS (
         |  SELECT token,
         |    CAST(count(*) FILTER (side = 0) AS BIGINT) AS ca,
         |    CAST(count(*) FILTER (side = 1) AS BIGINT) AS cb
         |  FROM tok GROUP BY token),
         |sc AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
         |              CAST(sum(cb) AS BIGINT) AS nb,
         |              CAST(count(*) AS BIGINT) AS v FROM cnt),
         |pq AS (
         |  SELECT na, nb, v, $pExpr, $qExpr
         |  FROM cnt CROSS JOIN sc),
         |terms AS (
         |  SELECT na, nb, v,
         |    CAST(round(p * ln(p / q), 12) AS DECIMAL(18,12)) AS klab_t,
         |    CAST(round(q * ln(q / p), 12) AS DECIMAL(18,12)) AS klba_t,
         |    CAST(round(0.5 * p * ln(p / ((p + q) / 2))
         |      + 0.5 * q * ln(q / ((p + q) / 2)), 12) AS DECIMAL(18,12))
         |      AS js_t,
         |    CAST(round((sqrt(p) - sqrt(q)) * (sqrt(p) - sqrt(q)), 12)
         |      AS DECIMAL(18,12)) AS hel_t,
         |    CAST(round(abs(p - q), 12) AS DECIMAL(18,12)) AS tv_t
         |  FROM pq)
         |SELECT v AS vocab, na, nb,
         |  round(CAST(sum(klab_t) AS DOUBLE), 6) AS kl_ab,
         |  round(CAST(sum(klba_t) AS DOUBLE), 6) AS kl_ba,
         |  round(CAST(sum(js_t) AS DOUBLE), 6) AS js,
         |  round(sqrt(CAST(sum(hel_t) AS DOUBLE) / 2), 6) AS hellinger,
         |  round(CAST(sum(tv_t) AS DOUBLE) / 2, 6) AS tv
         |FROM terms GROUP BY na, nb, v""".stripMargin,

    "d50_sorted_neighborhood" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    array_to_string(list_slice(string_split(text, ' '), 1, 3), ' ')
        |      AS k,
        |    list_distinct(string_split(text, ' ')) AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |r AS MATERIALIZED (
        |  SELECT doc_id, toks,
        |    CAST(row_number() OVER (ORDER BY k, doc_id) AS BIGINT) AS rnk
        |  FROM d)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  b.rnk - a.rnk AS rank_dist,
        |  round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |    / CAST(len(list_distinct(list_concat(a.toks, b.toks)))
        |        AS DOUBLE), 6) AS jaccard,
        |  round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |    / CAST(len(list_distinct(list_concat(a.toks, b.toks)))
        |        AS DOUBLE), 6) >= 0.5 AS is_match
        |FROM r a JOIN r b ON b.rnk - a.rnk BETWEEN 1 AND 4
        |ORDER BY a_id, b_id""".stripMargin,
  )
}
