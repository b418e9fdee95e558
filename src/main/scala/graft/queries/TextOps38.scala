package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 75 retrieval ops (SURVEY.md §2.4):
  *
  *  - s26: pseudo-relevance-feedback (Rocchio-style) query expansion —
  *    the second-pass retrieval trick production search ships: run the
  *    base BM25 query (s21's exact machinery), harvest the 3 most
  *    frequent informative terms (len ≥ 4, not already in the query)
  *    from the top-5 documents, re-score with the expanded term set at
  *    half weight, and return the reranked top-10. Every per-term
  *    partial rounds to 8dp DECIMAL before the per-doc sum (order-free
  *    in both engines); expansion-term selection is deterministic by
  *    (count desc, term). The tf/df frames build once and serve both
  *    passes — the second pass adds joins, not another corpus scan.
  */
object TextOps38 {
  import Tables.t

  private val Terms = Seq("spark", "join", "window")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s26_prf_expansion" -> ((spark, dir) => {
      val docs = t(spark, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .select(col("doc_id"), size(col("tk")).as("dl"), col("tk"))
      val stats = docs.agg(count(lit(1)).as("n_docs"),
        sum(col("dl").cast("long")).as("tot_tokens"))
      val tf = docs
        .select(col("doc_id"), col("dl"), explode(col("tk")).as("tok"))
        .groupBy("doc_id", "dl", "tok")
        .agg(count(lit(1)).as("tf"))
      def bm25Partial(idf: org.apache.spark.sql.Column) =
        round(idf * col("tf").cast("double") * 2.2
          / (col("tf").cast("double") + lit(1.2) * (lit(0.25)
            + lit(0.75) * (col("dl").cast("long") * col("n_docs"))
              .cast("double") / col("tot_tokens").cast("double"))), 8)
          .cast("decimal(20,8)")
      def idfOf(tfSubset: DataFrame): DataFrame =
        tfSubset.groupBy("tok").agg(countDistinct(col("doc_id")).as("df"))
          .crossJoin(broadcast(stats))
          .select(col("tok").as("i_tok"), col("n_docs"), col("tot_tokens"),
            round(log(lit(1.0)
              + (col("n_docs").cast("double") - col("df").cast("double")
                + 0.5) / (col("df").cast("double") + 0.5)), 8).as("idf"))
      // pass 1: base query, s21 semantics
      val baseTf = tf.filter(col("tok").isin(Terms: _*))
      val baseScored = baseTf.join(broadcast(idfOf(baseTf)),
          col("tok") === col("i_tok"))
        .select(col("doc_id"), bm25Partial(col("idf")).as("s"))
        .groupBy("doc_id").agg(sum(col("s")).as("sum_s"))
        .select(col("doc_id"), round(col("sum_s").cast("double"), 6)
          .as("bm25"))
      val w0 = Window.orderBy(col("bm25").desc, col("doc_id"))
      val top5 = baseScored.withColumn("r", row_number().over(w0))
        .filter(col("r") <= 5).select(col("doc_id").as("fb_doc"))
      // expansion: 3 most frequent informative terms in the top-5 docs
      val expTerms = tf
        .join(broadcast(top5), col("doc_id") === col("fb_doc"))
        .filter(!col("tok").isin(Terms: _*) && length(col("tok")) >= 4)
        .groupBy("tok").agg(sum(col("tf")).as("cnt"))
      val w1 = Window.orderBy(col("cnt").desc, col("tok"))
      val exp3 = expTerms.withColumn("r", row_number().over(w1))
        .filter(col("r") <= 3)
        .select(col("tok").as("q_tok"), lit(BigDecimal("0.5")).as("wt"))
      val qTerms = {
        import spark.implicits._
        Terms.toDF("q_tok")
          .select(col("q_tok"), lit(BigDecimal("1.0")).as("wt"))
          .unionByName(exp3)
      }
      // pass 2: weighted BM25 over the expanded set
      val expTf = tf.join(broadcast(qTerms), col("tok") === col("q_tok"))
      val scored = expTf
        .join(broadcast(idfOf(expTf.select("doc_id", "dl", "tok", "tf"))),
          col("tok") === col("i_tok"))
        .select(col("doc_id"),
          (col("wt").cast("decimal(10,4)") * bm25Partial(col("idf")))
            .cast("decimal(24,12)").as("s"))
        .groupBy("doc_id")
        .agg(sum(col("s")).as("sum_s"), count(lit(1)).as("n_terms"))
      val w2 = Window.orderBy(col("score").desc, col("doc_id"))
      scored
        .select(col("doc_id"), round(col("sum_s").cast("double"), 6)
          .as("score"), col("n_terms"))
        .withColumn("rank", row_number().over(w2))
        .filter(col("rank") <= 10)
        .orderBy("rank")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "s26_prf_expansion" -> {
      val termList = Terms.map(t => s"'$t'").mkString(", ")
      s"""WITH docs AS (
         |  SELECT doc_id, string_split(text, ' ') AS tk,
         |    len(string_split(text, ' ')) AS dl
         |  FROM documents WHERE text IS NOT NULL),
         |stats AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(dl) AS BIGINT) AS tot_tokens FROM docs),
         |tf AS (
         |  SELECT doc_id, dl, tok, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, dl, unnest(tk) AS tok FROM docs)
         |  GROUP BY 1, 2, 3),
         |base_tf AS (SELECT * FROM tf WHERE tok IN ($termList)),
         |base_idf AS (
         |  SELECT tok, n_docs, tot_tokens,
         |    round(ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE)
         |      + 0.5) / (CAST(df AS DOUBLE) + 0.5)), 8) AS idf
         |  FROM (SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
         |        FROM base_tf GROUP BY 1) CROSS JOIN stats),
         |base_scored AS (
         |  SELECT doc_id, round(CAST(sum(s) AS DOUBLE), 6) AS bm25
         |  FROM (
         |    SELECT doc_id,
         |      CAST(round(idf * CAST(tf AS DOUBLE) * 2.2
         |        / (CAST(tf AS DOUBLE) + 1.2 * (0.25
         |          + 0.75 * CAST(dl * n_docs AS DOUBLE)
         |            / CAST(tot_tokens AS DOUBLE))), 8)
         |        AS DECIMAL(20,8)) AS s
         |    FROM base_tf JOIN base_idf USING (tok))
         |  GROUP BY doc_id),
         |top5 AS (
         |  SELECT doc_id AS fb_doc FROM (
         |    SELECT doc_id, row_number() OVER (
         |      ORDER BY bm25 DESC, doc_id) AS r FROM base_scored)
         |  WHERE r <= 5),
         |exp3 AS (
         |  SELECT tok AS q_tok, CAST(0.5 AS DECIMAL(10,4)) AS wt FROM (
         |    SELECT tok, row_number() OVER (ORDER BY cnt DESC, tok) AS r
         |    FROM (
         |      SELECT tok, CAST(sum(tf) AS BIGINT) AS cnt
         |      FROM tf JOIN top5 ON tf.doc_id = top5.fb_doc
         |      WHERE tok NOT IN ($termList) AND length(tok) >= 4
         |      GROUP BY 1))
         |  WHERE r <= 3),
         |qterms AS (
         |  SELECT unnest([$termList]) AS q_tok,
         |    CAST(1.0 AS DECIMAL(10,4)) AS wt
         |  UNION ALL SELECT q_tok, wt FROM exp3),
         |exp_tf AS (
         |  SELECT tf.* , wt FROM tf JOIN qterms ON tf.tok = qterms.q_tok),
         |exp_idf AS (
         |  SELECT tok, n_docs, tot_tokens,
         |    round(ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE)
         |      + 0.5) / (CAST(df AS DOUBLE) + 0.5)), 8) AS idf
         |  FROM (SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
         |        FROM exp_tf GROUP BY 1) CROSS JOIN stats),
         |scored AS (
         |  SELECT doc_id,
         |    CAST(sum(CAST(wt * CAST(round(idf * CAST(tf AS DOUBLE) * 2.2
         |      / (CAST(tf AS DOUBLE) + 1.2 * (0.25
         |        + 0.75 * CAST(dl * n_docs AS DOUBLE)
         |          / CAST(tot_tokens AS DOUBLE))), 8)
         |      AS DECIMAL(20,8)) AS DECIMAL(24,12))) AS DECIMAL(38,12))
         |      AS sum_s,
         |    CAST(count(*) AS BIGINT) AS n_terms
         |  FROM exp_tf JOIN exp_idf USING (tok)
         |  GROUP BY doc_id)
         |SELECT doc_id, round(CAST(sum_s AS DOUBLE), 6) AS score, n_terms,
         |  CAST(rank AS INTEGER) AS rank
         |FROM (
         |  SELECT *, row_number() OVER (ORDER BY
         |    round(CAST(sum_s AS DOUBLE), 6) DESC, doc_id) AS rank
         |  FROM scored)
         |WHERE rank <= 10 ORDER BY rank""".stripMargin
    },
  )
}
