package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 17 (SURVEY.md §2.4):
  *
  *  - d25: sparse TF-IDF cosine near-dup pairs — the WEIGHTED-vector
  *    member of the dedup family (d2 Jaccard / d4 MinHash / d11 prefix
  *    filter are set-based; d6/d20 are dense-embedding): documents as
  *    tf·idf sparse vectors, pair dot products accumulated over the
  *    token-keyed [[graft.operators.BucketedPairs]] walk (df-capped
  *    tokens — degenerate stopword buckets are dropped whole, the
  *    standard sparse-join prune, and the similarity space is defined
  *    over the SAME pruned vocabulary on both engines). Every float
  *    product (w², wa·wb) rounds →DECIMAL before ANY re-aggregation,
  *    so dot products and norms are order-free exact; the final
  *    cosine is one identical float expression per pair.
  */
object TextOps12 {
  import Tables.t

  private val DfCap = 50
  private val CosMin = 0.3

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d25_tfidf_cosine_pairs" -> ((spark, dir) => {
      val tok = t(spark, dir, "documents").filter(col("text").isNotNull)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val nDocs = t(spark, dir, "documents").filter(col("text").isNotNull)
        .select(count(lit(1)).as("n_docs"))
      val df = tok.groupBy("term").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2 && col("df") <= DfCap)
      // weights live only on the pruned vocabulary; each float step is
      // a single expression replayed identically by the oracle
      val w = tok.join(df, "term").crossJoin(broadcast(nDocs))
        .select(col("doc_id"), col("term"),
          (col("tf").cast("double") *
            log(col("n_docs").cast("double") / col("df"))).as("w"))
      val norms = w.groupBy("doc_id")
        .agg(sqrt(sum(round(col("w") * col("w"), 12)
          .cast("decimal(28,12)")).cast("double")).as("norm"))
      val dots = graft.operators.BucketedPairs.pairs(w, Seq("term"),
          struct(col("doc_id").as("id"), col("w").as("wt")), DfCap)
        .select(col("x.id").as("a_id"), col("y.id").as("b_id"),
          round(col("x.wt") * col("y.wt"), 12).cast("decimal(28,12)")
            .as("prod"))
        .groupBy("a_id", "b_id")
        .agg(sum(col("prod")).as("dot"), count(lit(1)).as("n_shared"))
      dots
        .join(norms.select(col("doc_id").as("a_id"),
          col("norm").as("a_norm")), Seq("a_id"))
        .join(norms.select(col("doc_id").as("b_id"),
          col("norm").as("b_norm")), Seq("b_id"))
        .select(col("a_id"), col("b_id"), col("n_shared"),
          round(col("dot").cast("double") /
            (col("a_norm") * col("b_norm")), 6).as("cos"))
        .filter(col("cos") >= CosMin)
        .orderBy("a_id", "b_id")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "d25_tfidf_cosine_pairs" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
         |  FROM documents WHERE text IS NOT NULL),
         |tf AS (
         |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
         |  FROM tok GROUP BY 1, 2),
         |nd AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
         |  WHERE text IS NOT NULL),
         |df AS (
         |  SELECT term, CAST(count(*) AS BIGINT) AS df
         |  FROM tf GROUP BY 1 HAVING count(*) BETWEEN 2 AND $DfCap),
         |w AS (
         |  SELECT doc_id, term,
         |    CAST(tf AS DOUBLE) * ln(CAST(n_docs AS DOUBLE) / df) AS w
         |  FROM tf JOIN df USING (term) CROSS JOIN nd),
         |norms AS (
         |  SELECT doc_id,
         |    sqrt(CAST(sum(CAST(round(w * w, 12) AS DECIMAL(28,12)))
         |      AS DOUBLE)) AS norm
         |  FROM w GROUP BY 1),
         |bb AS (
         |  SELECT term FROM w
         |  GROUP BY 1 HAVING count(*) BETWEEN 2 AND $DfCap),
         |mem AS (SELECT w.* FROM w JOIN bb USING (term)),
         |dots AS (
         |  SELECT m1.doc_id AS a_id, m2.doc_id AS b_id,
         |    sum(CAST(round(m1.w * m2.w, 12) AS DECIMAL(28,12))) AS dot,
         |    CAST(count(*) AS BIGINT) AS n_shared
         |  FROM mem m1 JOIN mem m2
         |    ON m1.term = m2.term AND m1.doc_id < m2.doc_id
         |  GROUP BY 1, 2)
         |SELECT a_id, b_id, n_shared,
         |  round(CAST(dot AS DOUBLE) / (na.norm * nb.norm), 6) AS cos
         |FROM dots
         |JOIN norms na ON a_id = na.doc_id
         |JOIN norms nb ON b_id = nb.doc_id
         |WHERE round(CAST(dot AS DOUBLE) / (na.norm * nb.norm), 6)
         |  >= $CosMin
         |ORDER BY a_id, b_id""".stripMargin,
  )
}
