package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 additions, batch 80 (SURVEY.md §2.4) — split hygiene,
  * part 2:
  *
  *  - d62: CLUSTER-AWARE train/val/test split — the FIX for the
  *    leakage d34 measures. d34 assigns splits per document and counts
  *    how many near-duplicate pairs straddle split boundaries (train
  *    contamination of eval sets); here the split key is the dedup
  *    CLUSTER representative (connected components over the d4
  *    MinHash pairs, singletons represent themselves), so every
  *    near-dup pair lands in one split BY CONSTRUCTION. The output
  *    carries the proof: the same pair-straddle audit d34 runs now
  *    returns zero, pinned as `n_leaky_pairs` = 0 and a `leak_free`
  *    boolean next to the per-split census (docs, clusters, tokens).
  *
  *    Scale shape: components come from the O(diameter)
  *    min-label-propagation operator (checkpointed, no driver
  *    iteration over rows); split assignment is one md5 of the
  *    representative — map-only after the label join; the audit is a
  *    pair-keyed join, no broadcast of doc-grain maps.
  */
object TextOps80 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d62_cluster_split" -> ((spark, dir) => {
      val pairs = TextOps.queries("d4_minhash_pairs")(spark, dir)
        .select(col("a_id"), col("b_id")).persist()
      pairs.count() // labels + the leak audit both read it (d4 lesson)
      val labels = graft.operators.ConnectedComponents
        .labels(pairs, "a_id", "b_id")
        .select(col("node").as("doc_id"), col("component"))
      val docs = t(spark, dir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
      val asg = docs.join(labels, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("rep"),
          col("n_tok"))
      val m = pmod(graft.functions.Md5Pack(col("rep").cast("string")),
        lit(10))
      val sp = asg.withColumn("split",
        when(m < 8, "train").when(m === 8, "val").otherwise("test"))
        .persist()
      sp.count()
      val leak = pairs
        .join(sp.select(col("doc_id").as("a_id"),
          col("split").as("split_a")), "a_id")
        .join(sp.select(col("doc_id").as("b_id"),
          col("split").as("split_b")), "b_id")
        .agg(count_if(col("split_a") =!= col("split_b"))
          .as("n_leaky_pairs"))
      sp.groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("rep")).as("n_clusters"),
          sum(col("n_tok")).as("n_tokens"))
        .crossJoin(broadcast(leak))
        .withColumn("leak_free", col("n_leaky_pairs") === 0)
        .orderBy("split")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    // d8's transitive closure re-derived at top level (DuckDB cannot
    // nest WITH RECURSIVE inside a materialized CTE), d4's pairs
    // supply the audit; singletons fall back to themselves
    "d62_cluster_split" -> {
      val d4 = TextOps.oracleSql("d4_minhash_pairs")
      s"""WITH RECURSIVE
         |pairs AS MATERIALIZED (SELECT a_id, b_id FROM ($d4) t0),
         |edges AS (
         |  SELECT a_id AS src, b_id AS dst FROM pairs
         |  UNION SELECT b_id, a_id FROM pairs),
         |cnodes AS (SELECT DISTINCT src AS node FROM edges),
         |reach AS (
         |  SELECT node AS src, node AS dst FROM cnodes
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |clusters AS (
         |  SELECT src AS doc_id, min(dst) AS cluster_keeper
         |  FROM reach GROUP BY src),
         |docs AS (
         |  SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
         |  FROM documents),
         |sp AS (
         |  SELECT doc_id, rep, n_tok,
         |    CASE WHEN m < 8 THEN 'train' WHEN m = 8 THEN 'val'
         |      ELSE 'test' END AS split
         |  FROM (
         |    SELECT d.doc_id,
         |      coalesce(c.cluster_keeper, d.doc_id) AS rep, d.n_tok,
         |      ${Tables.duckMd5Pack(
        "CAST(coalesce(c.cluster_keeper, d.doc_id) AS VARCHAR)")} % 10
         |        AS m
         |    FROM docs d LEFT JOIN clusters c USING (doc_id))),
         |leak AS (
         |  SELECT CAST(count(*) FILTER (sa.split <> sb.split)
         |    AS BIGINT) AS n_leaky_pairs
         |  FROM pairs
         |  JOIN sp sa ON a_id = sa.doc_id
         |  JOIN sp sb ON b_id = sb.doc_id)
         |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(DISTINCT rep) AS BIGINT) AS n_clusters,
         |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         |  n_leaky_pairs, n_leaky_pairs = 0 AS leak_free
         |FROM sp, leak
         |GROUP BY split, n_leaky_pairs
         |ORDER BY split""".stripMargin
    },
  )
}
