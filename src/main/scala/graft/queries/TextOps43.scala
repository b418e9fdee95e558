package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 83 text ops (SURVEY.md §2.4):
  *
  *  - t42: token burstiness — the variance-to-mean ratio of the gaps
  *    between occurrences of the corpus's top token, per document: a
  *    token scattered uniformly scores near 0, a bursty token (all
  *    hits clustered) scores high — the dispersion feature behind
  *    content-word vs function-word classification. Positions come
  *    from one posexplode filtered to the (broadcast, one-row) top
  *    token; gaps/moments are exact integers per doc, the VMR is one
  *    float division at the end. Docs with < 3 occurrences carry a
  *    NULL vmr (gap variance needs ≥ 2 gaps).
  */
object TextOps43 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t42_token_burstiness" -> ((spark, dir) => {
      val tok = t(spark, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "term")))
      val top = tok.groupBy("term").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("term")).limit(1)
        .select(col("term").as("top_term"))
      val hits = tok.join(broadcast(top), col("term") === col("top_term"))
      // gap moments from position moments: gaps g_i = p_i − p_{i−1};
      // Σg = p_max − p_min is exact; for the variance we need Σg² —
      // that one needs the actual gaps, so lag over the per-doc hits
      // (bounded by per-doc occurrence count)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("pos")
      val gaps = hits
        .withColumn("prev", lag(col("pos"), 1).over(w))
        .filter(col("prev").isNotNull)
        .select(col("doc_id"), (col("pos") - col("prev")).as("gp"))
      gaps.groupBy("doc_id")
        .agg(count(lit(1)).as("n_gaps"),
          sum(col("gp")).cast("long").as("s"),
          sum(col("gp") * col("gp")).cast("long").as("ss"))
        .withColumn("vmr",
          when(col("n_gaps") >= 2,
            round((col("ss").cast("double")
              - col("s").cast("double") * col("s").cast("double")
                / col("n_gaps").cast("double"))
              / (col("n_gaps").cast("double") - 1)
              / (col("s").cast("double") / col("n_gaps").cast("double")), 6)))
        .select("doc_id", "n_gaps", "s", "vmr")
        .orderBy("doc_id")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "t42_token_burstiness" ->
      """WITH tok AS (
        |  SELECT doc_id, p.term AS term, CAST(p.pos AS BIGINT) AS pos
        |  FROM (
        |    SELECT doc_id, unnest(list_transform(range(len(tk)),
        |      i -> struct_pack(term := tk[i+1], pos := i))) AS p
        |    FROM (SELECT doc_id, string_split(text, ' ') AS tk
        |          FROM documents WHERE text IS NOT NULL))),
        |top AS (
        |  SELECT term AS top_term FROM (
        |    SELECT term, count(*) AS cnt FROM tok GROUP BY 1
        |    ORDER BY cnt DESC, term LIMIT 1)),
        |hits AS (
        |  SELECT doc_id, pos FROM tok JOIN top ON term = top_term),
        |gaps AS (
        |  SELECT doc_id, pos - lag(pos) OVER (
        |    PARTITION BY doc_id ORDER BY pos) AS gp
        |  FROM hits),
        |m AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_gaps,
        |    CAST(sum(gp) AS BIGINT) AS s,
        |    CAST(sum(gp * gp) AS BIGINT) AS ss
        |  FROM gaps WHERE gp IS NOT NULL GROUP BY 1)
        |SELECT doc_id, n_gaps, s,
        |  CASE WHEN n_gaps >= 2 THEN
        |    round((CAST(ss AS DOUBLE)
        |      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
        |        / CAST(n_gaps AS DOUBLE))
        |      / (CAST(n_gaps AS DOUBLE) - 1)
        |      / (CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE)), 6)
        |  END AS vmr
        |FROM m ORDER BY doc_id""".stripMargin,
  )
}
