package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 45 (dedup family, SURVEY.md §2.4):
  *
  *  - d32: LSH recall against exact ground truth — the dedup-quality
  *    evaluation s4 performs for ANN: d11's prefix-filtering join is
  *    the EXACT Jaccard-≥0.5 pair set (completeness-proved against
  *    brute force), d4 is the banded-LSH approximation at the same
  *    threshold over the same shingles, so their overlap measures how
  *    many true near-dup pairs the bands recover. Verified d4 pairs
  *    can never be false positives (the exact-Jaccard verify step
  *    gates them) — the lsh_only count asserts that invariant end to
  *    end in BOTH engines. The report costs the two pipelines it
  *    evaluates plus a semi-join on the tiny pair frames.
  */
object TextOps22 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d32_lsh_recall" -> ((spark, dir) => {
      // Each leg runs exactly ONCE: persist + the three counts below
      // are the only executions, and the report is three SCALARS — so
      // it collapses to a driver-local one-row frame (constant-size
      // collect), the legs unpersist before returning, and the final
      // plan carries zero replayed pipeline lineage. (The previous
      // shape re-aggregated the persisted frames inside the result
      // plan: correct, but the result's lineage replayed both
      // pipelines in every plan walk, and ~5s of re-agg overhead
      // survived at sf0.1.)
      val exact = TextOps2.queries("d11_prefix_filter_pairs")(spark, dir)
        .select(col("a_id"), col("b_id")).persist()
      val lsh = TextOps.queries("d4_minhash_pairs")(spark, dir)
        .select(col("a_id"), col("b_id")).persist()
      val nExact = exact.count()
      val nLsh = lsh.count()
      val nMatched =
        exact.join(lsh, Seq("a_id", "b_id"), "left_semi").count()
      exact.unpersist(false)
      lsh.unpersist(false)
      import spark.implicits._
      Seq((nExact, nLsh, nMatched)).toDF("n_exact", "n_lsh", "n_matched")
        .select(col("n_exact"), col("n_lsh"), col("n_matched"),
          (col("n_exact") - col("n_matched")).as("n_missed"),
          (col("n_lsh") - col("n_matched")).as("n_lsh_only"),
          round(col("n_matched").cast("double") /
            col("n_exact").cast("double"), 6).as("recall"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "d32_lsh_recall" -> {
      val d11 = TextOps2.oracleSql("d11_prefix_filter_pairs")
      val d4 = TextOps.oracleSql("d4_minhash_pairs")
      s"""WITH exact AS (SELECT a_id, b_id FROM ($d11)),
         |lsh AS (SELECT a_id, b_id FROM ($d4)),
         |matched AS (
         |  SELECT a_id, b_id FROM exact
         |  INTERSECT
         |  SELECT a_id, b_id FROM lsh),
         |c AS (
         |  SELECT
         |    (SELECT CAST(count(*) AS BIGINT) FROM exact) AS n_exact,
         |    (SELECT CAST(count(*) AS BIGINT) FROM lsh) AS n_lsh,
         |    (SELECT CAST(count(*) AS BIGINT) FROM matched) AS n_matched)
         |SELECT n_exact, n_lsh, n_matched,
         |  n_exact - n_matched AS n_missed,
         |  n_lsh - n_matched AS n_lsh_only,
         |  round(CAST(n_matched AS DOUBLE) / CAST(n_exact AS DOUBLE), 6)
         |    AS recall
         |FROM c""".stripMargin
    },
  )
}
