package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 132 (SURVEY.md §2.4 dedup):
  *
  *  - d51: IDF-weighted Jaccard near-dup pairs — plain Jaccard (d2)
  *    treats "the" and a rare term as equal evidence; weighting each
  *    token by smoothed IDF ln((N+1)/(df+1)) makes overlap on rare
  *    vocabulary dominate, the weighting production dedup pipelines
  *    apply before thresholding. Same bounded blocking as d2
  *    (doc_id < 200, same-language pairs) so the quadratic step stays
  *    block-sized; weights are vocabulary-bounded and broadcast; the
  *    pair intersection is a token equi-join + exact DECIMAL(18,9)
  *    sum (ln rounded ONCE per token), so both engines see identical
  *    weighted sums and the ratio is a single double at the end.
  */
object TextOps59 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d51_idf_weighted_jaccard" -> ((spark, dir) => {
      val toks = t(spark, dir, "documents")
        .filter(col("doc_id") < 200 && col("text").isNotNull)
        .select(col("doc_id"), col("lang"),
          explode(array_distinct(split(col("text"), " "))).as("tok"))
      val nd = toks.select("doc_id").distinct()
        .agg(count(lit(1)).as("nd"))
      val w = toks.groupBy("tok").agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(nd))
        .select(col("tok"), expr(
          """cast(round(ln(cast(nd + 1 as double) / (df + 1)), 9)
            |  as decimal(18,9))""".stripMargin).as("w"))
      val tw = toks.join(broadcast(w), "tok")
      val docw = tw.groupBy("doc_id", "lang").agg(sum(col("w")).as("wt"))
      val inter = tw.select(col("doc_id").as("a_id"), col("lang"),
          col("tok"), col("w"))
        .join(tw.select(col("doc_id").as("b_id"),
          col("lang").as("b_lang"), col("tok").as("b_tok")),
          col("tok") === col("b_tok") && col("lang") === col("b_lang")
            && col("a_id") < col("b_id"))
        .groupBy("a_id", "b_id").agg(sum(col("w")).as("wi"))
      inter
        .join(docw.select(col("doc_id").as("a_id"), col("wt").as("wa")),
          "a_id")
        .join(docw.select(col("doc_id").as("b_id"), col("wt").as("wb")),
          "b_id")
        .withColumn("wj", expr(
          "cast(wi as double) / cast(wa + wb - wi as double)"))
        .filter(col("wj") >= 0.6)
        .select(col("a_id"), col("b_id"), round(col("wj"), 6).as("wjaccard"))
        .orderBy("a_id", "b_id")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "d51_idf_weighted_jaccard" -> """
      WITH toks AS (
        SELECT doc_id, lang,
          unnest(list_distinct(string_split(text, ' '))) AS tok
        FROM documents WHERE doc_id < 200 AND text IS NOT NULL),
      nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS nd FROM toks),
      w AS (
        SELECT tok,
          CAST(round(ln(CAST(nd + 1 AS DOUBLE) / (df + 1)), 9)
            AS DECIMAL(18,9)) AS w
        FROM (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM toks
              GROUP BY tok) d
        CROSS JOIN nd),
      tw AS (SELECT toks.doc_id, toks.lang, toks.tok, w.w
             FROM toks JOIN w ON toks.tok = w.tok),
      docw AS (SELECT doc_id, lang, sum(w) AS wt FROM tw
               GROUP BY doc_id, lang),
      inter AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id, sum(a.w) AS wi
        FROM tw a JOIN tw b
          ON a.tok = b.tok AND a.lang = b.lang AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT a_id, b_id,
        round(CAST(wi AS DOUBLE) / CAST(wa.wt + wb.wt - wi AS DOUBLE), 6)
          AS wjaccard
      FROM inter
      JOIN docw wa ON inter.a_id = wa.doc_id
      JOIN docw wb ON inter.b_id = wb.doc_id
      WHERE CAST(wi AS DOUBLE) / CAST(wa.wt + wb.wt - wi AS DOUBLE) >= 0.6
      ORDER BY a_id, b_id""",
  )
}
