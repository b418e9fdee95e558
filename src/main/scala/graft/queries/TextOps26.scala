package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 51 (SURVEY.md §2.4):
  *
  *  - s21: BM25 ranked retrieval — the canonical lexical ranking
  *    function (k1 = 1.2, b = 0.75) for a fixed 3-term query, the
  *    sparse complement of the s-family's dense retrieval. tf/dl/df
  *    counts are exact integers; idf's ln() runs only on the 3 bounded
  *    per-term df values; each per-term partial rounds to 8dp into
  *    DECIMAL before the per-doc sum, so the 3-way addition is
  *    order-free in both engines. Top-20 by (score, doc_id).
  *  - t32: KV-prefix-cache savings — how many prompt tokens an
  *    inference server's prefix cache would skip if the corpus were
  *    replayed: documents sharing an identical 64-token prefix pay the
  *    prefix cost once, every repeat is cached. Exact md5 prefix
  *    groups (one shuffle), savings = (n−1)·prefix_len per group. The
  *    serving-side dual of d30's storage chunk dedup.
  */
object TextOps26 {
  import Tables.t

  private val Terms = Seq("spark", "join", "window")
  private val PrefixLen = 64

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s21_bm25" -> ((spark, dir) => {
      val docs = t(spark, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .select(col("doc_id"), col("tk"), size(col("tk")).as("dl"))
      val stats = docs.agg(count(lit(1)).as("n_docs"),
        sum(col("dl").cast("long")).as("tot_tokens"))
      val tok = docs.select(col("doc_id"), col("dl"),
          explode(col("tk")).as("tok"))
        .filter(col("tok").isin(Terms: _*))
      val tf = tok.groupBy("doc_id", "dl", "tok")
        .agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("tok").agg(countDistinct(col("doc_id")).as("df"))
      val idf = df.crossJoin(broadcast(stats))
        .select(col("tok"), col("n_docs"), col("tot_tokens"),
          round(log(lit(1.0)
            + (col("n_docs").cast("double") - col("df").cast("double")
              + 0.5) / (col("df").cast("double") + 0.5)), 8).as("idf"))
      val scored = tf.join(broadcast(idf), "tok")
        .select(col("doc_id"),
          round(col("idf") * col("tf").cast("double") * 2.2
            / (col("tf").cast("double") + lit(1.2) * (lit(0.25)
              + lit(0.75) * (col("dl").cast("long") * col("n_docs"))
                .cast("double") / col("tot_tokens").cast("double"))), 8)
            .cast("decimal(20,8)").as("s"))
      scored.groupBy("doc_id")
        .agg(sum(col("s")).as("sum_s"))
        .select(col("doc_id"),
          round(col("sum_s").cast("double"), 6).as("bm25"))
        .orderBy(col("bm25").desc, col("doc_id"))
        .limit(20)
    }),

    "t32_prefix_cache_savings" -> ((spark, dir) => {
      val d = t(spark, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          least(size(split(col("text"), " ")), lit(PrefixLen))
            .cast("long").as("plen"),
          md5(concat_ws(" ",
            slice(split(col("text"), " "), 1, PrefixLen))).as("pfx"))
      d.groupBy("pfx")
        .agg(count(lit(1)).as("n_docs"),
          min(col("plen")).as("prefix_len"))
        .filter(col("n_docs") >= 2)
        .select(col("pfx"), col("n_docs"), col("prefix_len"),
          ((col("n_docs") - 1) * col("prefix_len")).as("saved_tokens"))
        .orderBy(col("saved_tokens").desc, col("pfx"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "s21_bm25" -> {
      val termList = Terms.map(t => s"'$t'").mkString(", ")
      s"""WITH docs AS (
         |  SELECT doc_id, string_split(text, ' ') AS tk,
         |    len(string_split(text, ' ')) AS dl
         |  FROM documents WHERE text IS NOT NULL),
         |stats AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(dl) AS BIGINT) AS tot_tokens FROM docs),
         |tok AS (
         |  SELECT doc_id, dl, unnest(tk) AS tok FROM docs),
         |tf AS (
         |  SELECT doc_id, dl, tok, CAST(count(*) AS BIGINT) AS tf
         |  FROM tok WHERE tok IN ($termList) GROUP BY 1, 2, 3),
         |df AS (
         |  SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
         |  FROM tf GROUP BY 1),
         |idf AS (
         |  SELECT tok, n_docs, tot_tokens,
         |    round(ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE)
         |      + 0.5) / (CAST(df AS DOUBLE) + 0.5)), 8) AS idf
         |  FROM df CROSS JOIN stats),
         |scored AS (
         |  SELECT doc_id,
         |    CAST(round(idf * CAST(tf AS DOUBLE) * 2.2
         |      / (CAST(tf AS DOUBLE) + 1.2 * (0.25
         |        + 0.75 * CAST(dl * n_docs AS DOUBLE)
         |          / CAST(tot_tokens AS DOUBLE))), 8)
         |      AS DECIMAL(20,8)) AS s
         |  FROM tf JOIN idf USING (tok))
         |SELECT doc_id, round(CAST(sum(s) AS DOUBLE), 6) AS bm25
         |FROM scored GROUP BY doc_id
         |ORDER BY bm25 DESC, doc_id
         |LIMIT 20""".stripMargin
    },

    "t32_prefix_cache_savings" ->
      s"""WITH d AS (
         |  SELECT doc_id,
         |    CAST(least(len(string_split(text, ' ')), $PrefixLen)
         |      AS BIGINT) AS plen,
         |    md5(array_to_string(list_slice(string_split(text, ' '),
         |      1, $PrefixLen), ' ')) AS pfx
         |  FROM documents WHERE text IS NOT NULL)
         |SELECT pfx, CAST(count(*) AS BIGINT) AS n_docs,
         |  min(plen) AS prefix_len,
         |  (CAST(count(*) AS BIGINT) - 1) * min(plen) AS saved_tokens
         |FROM d GROUP BY pfx HAVING count(*) >= 2
         |ORDER BY saved_tokens DESC, pfx""".stripMargin,
  )
}
