package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 32 (SURVEY.md §2.4):
  *
  *  - q152: two-sample Cramér–von Mises — the omnibus distribution-
  *    equality test that weights the WHOLE EDF gap, completing the
  *    drift family (KS q72 takes the max gap, PSI q120 buckets first,
  *    chi² q95 needs categories). Computed tie-correctly over distinct
  *    values: one GlobalPrefixSum scan per sample EDF (range-
  *    partitioned — no single-task sort), the per-value EDF gap
  *    m·cumA − n·cumB stays exact DECIMAL (long would overflow at
  *    ~1e12 rows), and each value's term is one identical float chain
  *    rounded →DECIMAL(38,12) before the cross-value sum (float sum
  *    order across partitions is unspecified — the q112 rule).
  *  - s16: filtered vector search — top-k under a metadata predicate,
  *    the retrieval shape RAG stacks run constantly. The predicate
  *    prunes candidates BEFORE any cosine is computed (filter-then-
  *    score; score-then-filter would pay the full scan and can return
  *    < k rows from a top-k buffer). Exact brute force over the pruned
  *    set is the oracle-checkable baseline; at scale the same predicate
  *    composes with the s2/s3 bucketed variants unchanged.
  */
object Analytics29 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q152_cvm_test" -> ((spark, dir) => {
      val g = t(spark, dir, "orders")
        .select((col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("decimal(18,0)").as("cents"),
          (col("o_orderpriority") === "1-URGENT").as("pos"))
        .groupBy("cents")
        .agg(count_if(col("pos")).as("a_s"),
          count_if(!col("pos")).as("b_s"),
          count(lit(1)).as("n_s"))
      // both EDFs accumulate in ONE range-partitioned scan
      val withB = graft.operators.GlobalPrefixSum.withRunningTotalsBy(
        g, col("cents"), Seq("a_s" -> "cum_a", "b_s" -> "cum_b"))
      val nm = g.agg(sum(col("a_s")).as("n"), sum(col("b_s")).as("m"))
      val terms = withB.crossJoin(broadcast(nm))
        .withColumn("d",
          (col("m").cast("decimal(20,0)") * col("cum_a") -
            col("n").cast("decimal(20,0)") * col("cum_b"))
            .cast("decimal(38,0)"))
        .withColumn("term",
          round(col("n_s").cast("double") *
            (col("d").cast("double") * col("d").cast("double")) /
            (((col("n") + col("m")).cast("double") *
              (col("n") + col("m")).cast("double")) *
              col("n").cast("double") * col("m").cast("double")), 12)
            .cast("decimal(38,12)"))
      terms.groupBy(col("n"), col("m"))
        .agg(sum(col("term")).cast("decimal(38,12)").as("t_sum"))
        .select(col("n"), col("m"),
          round(col("t_sum").cast("double"), 6).as("cvm_t"))
    }),

    "s16_filtered_ann" -> ((spark, dir) => {
      val e = t(spark, dir, "embeddings")
      val probes = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"))
      // metadata predicate prunes candidates BEFORE any scoring
      val cands = e.filter(col("label") % 2 === 0)
        .select(col("vec_id").as("cand_id"), col("embedding").as("c_emb"))
      val scored = probes.join(cands, col("probe_id") =!= col("cand_id"))
        .select(col("probe_id"), col("cand_id"),
          round(graft.functions.VectorOps.cosine(
            col("p_emb"), col("c_emb")), 6).as("cos"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("probe_id")
        .orderBy(col("cos").desc, col("cand_id"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .orderBy("probe_id", "rank")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q152_cvm_test" ->
      """WITH g AS (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS DECIMAL(18,0)) AS cents,
        |    CAST(count(*) FILTER (WHERE o_orderpriority = '1-URGENT')
        |      AS BIGINT) AS a_s,
        |    CAST(count(*) FILTER (WHERE o_orderpriority <> '1-URGENT')
        |      AS BIGINT) AS b_s,
        |    CAST(count(*) AS BIGINT) AS n_s
        |  FROM orders GROUP BY 1),
        |cum AS (
        |  SELECT n_s, a_s, b_s,
        |    sum(a_s) OVER (ORDER BY cents) AS cum_a,
        |    sum(b_s) OVER (ORDER BY cents) AS cum_b
        |  FROM g),
        |nm AS (
        |  SELECT CAST(sum(a_s) AS BIGINT) AS n,
        |    CAST(sum(b_s) AS BIGINT) AS m
        |  FROM g),
        |terms AS (
        |  SELECT n, m,
        |    CAST(round(CAST(n_s AS DOUBLE) *
        |      (CAST(CAST(m AS HUGEINT) * cum_a - CAST(n AS HUGEINT)
        |         * cum_b AS DOUBLE)
        |       * CAST(CAST(m AS HUGEINT) * cum_a - CAST(n AS HUGEINT)
        |         * cum_b AS DOUBLE)) /
        |      ((CAST(n + m AS DOUBLE) * CAST(n + m AS DOUBLE))
        |        * CAST(n AS DOUBLE) * CAST(m AS DOUBLE)), 12)
        |      AS DECIMAL(38,12)) AS term
        |  FROM cum, nm)
        |SELECT n, m,
        |  round(CAST(CAST(sum(term) AS DECIMAL(38,12)) AS DOUBLE), 6)
        |    AS cvm_t
        |FROM terms GROUP BY 1, 2""".stripMargin,

    "s16_filtered_ann" ->
      """WITH e AS (SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |  FROM embeddings),
        |scored AS (
        |  SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
        |    round(list_dot_product(p.emb, c.emb) /
        |      (sqrt(list_dot_product(p.emb, p.emb))
        |        * sqrt(list_dot_product(c.emb, c.emb))), 6) AS cos
        |  FROM e p JOIN e c ON p.vec_id < 10 AND p.vec_id <> c.vec_id
        |    AND c.label % 2 = 0)
        |SELECT probe_id, cand_id, cos, rank FROM (
        |  SELECT probe_id, cand_id, cos,
        |    CAST(row_number() OVER (PARTITION BY probe_id
        |      ORDER BY cos DESC, cand_id) AS INTEGER) AS rank
        |  FROM scored)
        |WHERE rank <= 5 ORDER BY probe_id, rank""".stripMargin,
  )
}
