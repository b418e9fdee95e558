package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 additions, batch 72 (SURVEY.md §2.4):
  *
  *  - d57: quality-aware dedup retention — d12 keeps each near-dup
  *    cluster's MIN-ID document; a production corpus keeps its BEST:
  *    the keeper is the cluster argmax of (n_chars, then doc_id as the
  *    deterministic tiebreak), computed with one min(struct) aggregate
  *    over the connected-component labels — no window, no second
  *    shuffle. The report compares the two policies: how many clusters
  *    change keeper, and how much document mass the quality policy
  *    rescues.
  */
object TextOps72 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d57_quality_keeper" -> ((spark, dir) => {
      val pairs = TextOps.queries("d4_minhash_pairs")(spark, dir)
        .select(col("a_id"), col("b_id"))
      val labels = graft.operators.ConnectedComponents
        .labels(pairs, "a_id", "b_id")
        .localCheckpoint(true)
      val docs = t(spark, dir, "documents")
        .select(col("doc_id"), col("n_chars"))
      val members = labels.select(col("node"), col("component").as("label"))
        .join(docs, col("node") === col("doc_id"))
      val keepers = members.groupBy("label")
        .agg(count(lit(1)).as("cluster_size"),
          min(col("doc_id")).as("minid_keeper"),
          // argmax quality via min over (-quality, id): deterministic,
          // bounded state, no window
          min(struct((-col("n_chars")).as("nq"), col("doc_id").as("id")))
            .as("best"),
          sum(col("n_chars")).as("cluster_chars"),
          max(col("n_chars")).as("best_chars"),
          min(col("n_chars")).as("worst_chars"))
      keepers.select(col("label"), col("cluster_size"),
          col("minid_keeper"), col("best.id").as("quality_keeper"),
          (col("minid_keeper") =!= col("best.id")).as("keeper_changed"),
          (col("best_chars") - col("worst_chars")).as("quality_spread"))
        .orderBy("label")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "d57_quality_keeper" -> {
      val d4 = TextOps.oracleSql("d4_minhash_pairs")
      // connected components replay: tiny clusters (near-dup pairs are
      // sparse), so the oracle's recursive CTE closes in few steps.
      // DuckDB's min_by cannot order by a tuple (parity notes), so the
      // argmax is a packed integer key: (2^24 - n_chars)*2^31 + doc_id
      // is monotone in (-n_chars, doc_id) for n_chars < 2^24 and
      // doc_id < 2^31 — min of the key IS the quality keeper
      s"""WITH RECURSIVE pairs AS MATERIALIZED ($d4),
         |edges AS (
         |  SELECT a_id AS u, b_id AS v FROM pairs
         |  UNION SELECT b_id, a_id FROM pairs),
         |nodes AS (SELECT DISTINCT u AS node FROM edges),
         |reach AS (
         |  SELECT node, node AS peer FROM nodes
         |  UNION
         |  SELECT r.node, e.v FROM reach r JOIN edges e ON r.peer = e.u),
         |lab AS (
         |  SELECT node, min(peer) AS label FROM reach GROUP BY node),
         |members AS (
         |  SELECT lab.label, d.doc_id, d.n_chars
         |  FROM lab JOIN documents d ON lab.node = d.doc_id)
         |SELECT label, CAST(count(*) AS BIGINT) AS cluster_size,
         |  min(doc_id) AS minid_keeper,
         |  CAST(min((16777216 - n_chars) * 2147483648 + doc_id)
         |    % 2147483648 AS BIGINT) AS quality_keeper,
         |  min(doc_id) <> CAST(min((16777216 - n_chars) * 2147483648
         |    + doc_id) % 2147483648 AS BIGINT) AS keeper_changed,
         |  CAST(max(n_chars) - min(n_chars) AS BIGINT) AS quality_spread
         |FROM members GROUP BY label ORDER BY label""".stripMargin
    },
  )
}
