package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 25 (SURVEY.md §2.4):
  *
  *  - q140: cohort LTV triangle — q76's retention matrix upgraded to
  *    revenue: customers cohorted by first-order month; each (cohort,
  *    age-in-months) cell carries active-customer counts and exact
  *    decimal revenue, and cumulative LTV runs per cohort through a
  *    calendar-bounded keyed window. The acquisition-economics view
  *    every growth team reads.
  *  - t28: Heaps'-law vocabulary growth — the corpus-scaling
  *    diagnostic next to t11's Zipf slope: checkpoint thresholds are
  *    RANK-SELECTED doc ids (the q136 device — no dense-id
  *    assumption), vocabulary-so-far counts come from each term's
  *    min-doc (one groupBy, no distinct-per-checkpoint rescans), and
  *    the log-log fit V ≈ K·N^β uses the t11 decimal least-squares
  *    device.
  */
object Analytics22 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q140_cohort_ltv" -> ((spark, dir) => {
      val o = t(spark, dir, "orders")
        .select(col("o_custkey"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
            .as("ym"),
          col("o_totalprice").cast("decimal(18,2)").as("rev"))
      val cohorts = o.groupBy("o_custkey").agg(min(col("ym")).as("cohort_ym"))
      val cells = o.join(cohorts, "o_custkey")
        .groupBy(col("cohort_ym"), (col("ym") - col("cohort_ym")).as("age"))
        .agg(countDistinct(col("o_custkey")).as("n_active"),
          sum(col("rev")).as("rev"))
      // per-cohort cumulative window: partitions are calendar-bounded
      cells
        .withColumn("cum_rev", sum(col("rev")).over(
          Window.partitionBy("cohort_ym").orderBy("age")))
        .select(col("cohort_ym"), col("age"), col("n_active"),
          col("rev").cast("double").as("rev"),
          col("cum_rev").cast("double").as("cum_rev"))
        .orderBy("cohort_ym", "age")
    }),

    "t28_heaps_law" -> ((spark, dir) => {
      val docs = t(spark, dir, "documents").filter(col("text").isNotNull)
      val occurrences = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      val firstDoc = occurrences.groupBy("term")
        .agg(min(col("doc_id")).as("first_doc"))
      // rank-selected checkpoint thresholds — robust to sparse ids
      val ids = docs.select(col("doc_id"))
      val ranked = graft.operators.GlobalPrefixSum.withRunningTotalBy(
        ids.withColumn("one", lit(1L)), col("doc_id"), "one", "rnk")
      val targets = ids.agg(count(lit(1)).as("n_docs"))
        .select(explode(expr(
          "transform(sequence(1, 10), k -> named_struct('k', CAST(k AS " +
            "BIGINT), 'target', (k * n_docs) div 10))")).as("t"))
        .select(col("t.k").as("k"), col("t.target").as("target"))
      val thresholds = ranked
        .join(broadcast(targets), col("rnk") === col("target"))
        .select(col("k"), col("doc_id").as("thr"))
      val points = occurrences.crossJoin(broadcast(thresholds))
        .groupBy("k", "thr")
        .agg(count_if(col("doc_id") <= col("thr")).as("n_tokens"))
        .join(firstDoc.crossJoin(broadcast(thresholds))
          .groupBy(col("k").as("k2"))
          .agg(count_if(col("first_doc") <= col("thr")).as("vocab")),
          col("k") === col("k2"))
        .select(col("k"), col("n_tokens"), col("vocab"),
          round(log(col("n_tokens").cast("double")), 8)
            .cast("decimal(12,8)").as("x"),
          round(log(col("vocab").cast("double")), 8)
            .cast("decimal(12,8)").as("y"))
      points.agg(count(lit(1)).as("n_points"),
          max(when(col("k") === 10, col("n_tokens"))).as("tokens_full"),
          max(when(col("k") === 10, col("vocab"))).as("vocab_full"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum((col("x") * col("y")).cast("decimal(25,16)")).as("sxy"),
          sum((col("x") * col("x")).cast("decimal(25,16)")).as("sxx"))
        .select(col("n_points"), col("tokens_full"), col("vocab_full"),
          round(
            (col("n_points").cast("double") * col("sxy").cast("double")
              - col("sx").cast("double") * col("sy").cast("double")) /
              (col("n_points").cast("double") * col("sxx").cast("double")
                - col("sx").cast("double") * col("sx").cast("double")), 6)
            .as("heaps_beta"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q140_cohort_ltv" ->
      """WITH o AS (
        |  SELECT o_custkey,
        |    year(o_orderdate) * 12 + month(o_orderdate) AS ym,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS rev
        |  FROM orders),
        |cohorts AS (
        |  SELECT o_custkey, min(ym) AS cohort_ym FROM o GROUP BY 1),
        |cells AS (
        |  SELECT cohort_ym, ym - cohort_ym AS age,
        |    CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_active,
        |    sum(rev) AS rev
        |  FROM o JOIN cohorts ON o.o_custkey = cohorts.o_custkey
        |  GROUP BY 1, 2)
        |SELECT cohort_ym, age, n_active,
        |  CAST(CAST(rev AS DECIMAL(18,2)) AS DOUBLE) AS rev,
        |  CAST(CAST(sum(rev) OVER (PARTITION BY cohort_ym ORDER BY age)
        |    AS DECIMAL(18,2)) AS DOUBLE) AS cum_rev
        |FROM cells ORDER BY cohort_ym, age""".stripMargin,

    "t28_heaps_law" ->
      """WITH docs AS (
        |  SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
        |occ AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM docs),
        |fd AS (SELECT term, min(doc_id) AS first_doc FROM occ GROUP BY 1),
        |ranked AS (
        |  SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rnk
        |  FROM docs),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM docs),
        |targets AS (
        |  SELECT CAST(r.range AS BIGINT) AS k,
        |    (CAST(r.range AS BIGINT) * n_docs) // 10 AS target
        |  FROM range(1, 11) r CROSS JOIN nd),
        |thresholds AS (
        |  SELECT k, doc_id AS thr
        |  FROM ranked JOIN targets ON rnk = target),
        |tk AS (
        |  SELECT k, thr,
        |    CAST(count(*) FILTER (WHERE doc_id <= thr) AS BIGINT)
        |      AS n_tokens
        |  FROM occ CROSS JOIN thresholds GROUP BY 1, 2),
        |vb AS (
        |  SELECT k, CAST(count(*) FILTER (WHERE first_doc <= thr)
        |    AS BIGINT) AS vocab
        |  FROM fd CROSS JOIN thresholds GROUP BY 1),
        |points AS (
        |  SELECT tk.k, n_tokens, vocab,
        |    CAST(round(ln(CAST(n_tokens AS DOUBLE)), 8) AS DECIMAL(12,8))
        |      AS x,
        |    CAST(round(ln(CAST(vocab AS DOUBLE)), 8) AS DECIMAL(12,8))
        |      AS y
        |  FROM tk JOIN vb ON tk.k = vb.k),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_points,
        |    max(CASE WHEN k = 10 THEN n_tokens END) AS tokens_full,
        |    max(CASE WHEN k = 10 THEN vocab END) AS vocab_full,
        |    sum(x) AS sx, sum(y) AS sy,
        |    sum(CAST(CAST(x AS DECIMAL(19,8)) * y AS DECIMAL(25,16)))
        |      AS sxy,
        |    sum(CAST(CAST(x AS DECIMAL(19,8)) * x AS DECIMAL(25,16)))
        |      AS sxx
        |  FROM points)
        |SELECT n_points, tokens_full, vocab_full,
        |  round(
        |    (CAST(n_points AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |    (CAST(n_points AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS heaps_beta
        |FROM m""".stripMargin,
  )
}
