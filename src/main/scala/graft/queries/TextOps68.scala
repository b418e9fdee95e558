package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 additions, batch 68 (SURVEY.md §2.4):
  *
  *  - d54: per-host document budget — the CommonCrawl-style curation
  *    cap ("no host contributes more than N documents, keep its best"):
  *    hosts are md5-bucketed sub-sources, the keep rank is a
  *    host-partitioned window (WindowGroupLimit ships at most N rows
  *    per host per map partition — no global sort), and the report
  *    rolls kept/total mass per host. The classic long-tail corpus
  *    shaper, one shuffle on host.
  *  - s36: maximal-marginal-relevance re-ranking — the diversity-aware
  *    second stage after retrieval: from a bounded top-10 cosine
  *    shortlist, greedily select 5 documents maximizing
  *    λ·rel − (1−λ)·max-sim-to-selected (λ = 0.7). Every greedy round
  *    runs on the ≤10-row shortlist frame (broadcast joins, bounded
  *    min-k argmax); cosines are rounded ONCE into integer micro-units
  *    and the MMR objective is the exact Long 7·rel6 − 3·sim6, so both
  *    engines pick identical winners with no round(double) half-boundary
  *    anywhere — the q263 unrolled-greedy device applied to retrieval
  *    diversity.
  */
object TextOps68 {
  import Tables.t

  private val HostBuckets = 8
  private val HostCap = 50
  private val Shortlist = 10
  private val MmrRounds = 5

  private def cosine(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.cosineSim(a, b)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d54_host_budget" -> ((spark, dir) => {
      val docs = t(spark, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"), col("source"), col("n_chars"),
          concat(col("source"), lit("_"),
            (graft.functions.Md5Pack(col("doc_id").cast("string"))
              % HostBuckets).cast("string")).as("host"))
      val w = Window.partitionBy("host")
        .orderBy(col("n_chars").desc, col("doc_id"))
      docs.withColumn("rk", row_number().over(w))
        .groupBy("host")
        .agg(count(lit(1)).as("n_docs"),
          count_if(col("rk") <= HostCap).as("n_kept"),
          sum(col("n_chars")).as("total_chars"),
          sum(when(col("rk") <= HostCap, col("n_chars"))
            .otherwise(0L)).as("kept_chars"))
        .select(col("host"), col("n_docs"), col("n_kept"),
          col("total_chars"), col("kept_chars"),
          round(col("kept_chars").cast("double") /
            col("total_chars").cast("double"), 6).as("kept_share"))
        .orderBy("host")
    }),

    "s36_mmr_rerank" -> ((spark, dir) => {
      val e = t(spark, dir, "embeddings")
        .filter(col("embedding").isNotNull)
        .select(col("vec_id"),
          graft.functions.VectorOps.toDouble(col("embedding")).as("emb"))
      val probe = e.filter(col("vec_id") === 0)
        .select(col("emb").as("p_emb"))
      // cosines round ONCE into integer micro-units: every later
      // comparison is exact Long arithmetic (7·rel6 − 3·sim6), so no
      // engine ever rounds a rational double onto a half boundary
      val rel = e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(probe))
        .select(col("vec_id").as("cand_id"), col("emb"),
          round(round(cosine(col("p_emb"), col("emb")), 6) * 1e6)
            .cast("long").as("rel6"))
      val shortIds = rel
        .agg(graft.functions.TopKAgg.minK(
          struct((-col("rel6")).as("neg"), col("cand_id").as("id")),
          Shortlist).as("w"))
        .select(explode(col("w.id")).as("cand_id"))
      // the ≤10-row working frame every greedy round runs against
      val cand = rel.join(broadcast(shortIds), "cand_id")
        .localCheckpoint(true)
      var selected: DataFrame = null
      var out: DataFrame = null
      for (r <- 1 to MmrRounds) {
        val remaining =
          if (selected == null) cand
          else cand.join(broadcast(selected.select(col("sel_id"))),
            col("cand_id") === col("sel_id"), "left_anti")
        val scored =
          if (selected == null)
            remaining.withColumn("maxsim6", lit(0L))
          else remaining
            .crossJoin(broadcast(
              selected.select(col("sel_id"), col("sel_emb"))))
            .select(col("cand_id"), col("emb"), col("rel6"),
              round(round(cosine(col("emb"), col("sel_emb")), 6) * 1e6)
                .cast("long").as("s6"))
            .groupBy("cand_id", "emb", "rel6")
            .agg(max(col("s6")).as("maxsim6"))
        val pick = scored
          .select(col("cand_id"), col("emb"), col("rel6"), col("maxsim6"),
            (lit(7L) * col("rel6") - lit(3L) * col("maxsim6")).as("mmr7"))
          .agg(graft.functions.TopKAgg.minK(
            struct((-col("mmr7")).as("neg"), col("cand_id").as("id"),
              col("rel6").as("r"), col("maxsim6").as("m")), 1).as("w"))
          .select(get(col("w"), lit(0)).as("w0"))
          .select(col("w0")("id").as("sel_id"),
            (col("w0")("r").cast("double") * 1e-6).as("rel"),
            (col("w0")("m").cast("double") * 1e-6).as("maxsim"),
            ((-col("w0")("neg")).cast("double") * 1e-7).as("mmr"))
          .filter(col("sel_id").isNotNull)
        val pickFull = pick
          .join(cand.select(col("cand_id").as("sel_id"),
            col("emb").as("sel_emb")), "sel_id")
          .localCheckpoint(true)
        selected =
          if (selected == null) pickFull
          else selected.union(pickFull)
        val row = pick.select(lit(r).as("round"),
          col("sel_id").as("cand_id"), col("rel"), col("maxsim"),
          col("mmr"))
        out = if (out == null) row else out.union(row)
      }
      out.orderBy("round")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "d54_host_budget" -> {
      val hostExpr = "concat(source, '_', CAST(" +
        Tables.duckMd5Pack("CAST(doc_id AS VARCHAR)") +
        s" % $HostBuckets AS VARCHAR))"
      s"""WITH docs AS (
         |  SELECT doc_id, n_chars, $hostExpr AS host
         |  FROM documents WHERE text IS NOT NULL),
         |ranked AS (
         |  SELECT host, n_chars,
         |    row_number() OVER (PARTITION BY host
         |      ORDER BY n_chars DESC, doc_id) AS rk
         |  FROM docs)
         |SELECT host, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(*) FILTER (rk <= $HostCap) AS BIGINT) AS n_kept,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
         |  CAST(coalesce(sum(n_chars) FILTER (rk <= $HostCap), 0)
         |    AS BIGINT) AS kept_chars,
         |  round(CAST(coalesce(sum(n_chars) FILTER (rk <= $HostCap), 0)
         |      AS DOUBLE) / CAST(sum(n_chars) AS DOUBLE), 6)
         |    AS kept_share
         |FROM ranked GROUP BY host ORDER BY host""".stripMargin
    },

    "s36_mmr_rerank" -> {
      val rounds = (1 to MmrRounds).map { r =>
        val prev = (1 until r).map(i => s"SELECT sel_id FROM pick$i")
          .mkString(" UNION ALL ")
        val maxsim =
          if (r == 1) "CAST(0 AS BIGINT)"
          else
            s"""(SELECT max(CAST(round(round(
               |    list_dot_product(c.emb, s.emb) /
               |    (sqrt(list_dot_product(c.emb, c.emb))
               |      * sqrt(list_dot_product(s.emb, s.emb))), 6)
               |    * 1000000) AS BIGINT))
               | FROM cand s WHERE s.cand_id IN ($prev))""".stripMargin
        val anti =
          if (r == 1) ""
          else s"WHERE c.cand_id NOT IN ($prev)"
        s"""pick$r AS MATERIALIZED (
           |  SELECT cand_id AS sel_id, rel6, maxsim6,
           |    7 * rel6 - 3 * maxsim6 AS mmr7
           |  FROM (
           |    SELECT c.cand_id, c.rel6, $maxsim AS maxsim6
           |    FROM cand c $anti)
           |  ORDER BY 7 * rel6 - 3 * maxsim6 DESC, cand_id
           |  LIMIT 1)""".stripMargin
      }.mkString(",\n")
      val rows = (1 to MmrRounds).map { r =>
        s"SELECT $r AS round, sel_id AS cand_id, " +
          "CAST(rel6 AS DOUBLE) * 1e-6 AS rel, " +
          "CAST(maxsim6 AS DOUBLE) * 1e-6 AS maxsim, " +
          s"CAST(mmr7 AS DOUBLE) * 1e-7 AS mmr FROM pick$r"
      }.mkString("\nUNION ALL\n")
      s"""WITH e AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |p AS (SELECT emb AS p_emb FROM e WHERE vec_id = 0),
         |rel AS (
         |  SELECT e.vec_id AS cand_id, e.emb,
         |    CAST(round(round(list_dot_product(p.p_emb, e.emb) /
         |      (sqrt(list_dot_product(p.p_emb, p.p_emb))
         |        * sqrt(list_dot_product(e.emb, e.emb))), 6)
         |      * 1000000) AS BIGINT) AS rel6
         |  FROM e CROSS JOIN p WHERE e.vec_id <> 0),
         |cand AS MATERIALIZED (
         |  SELECT cand_id, emb, rel6 FROM rel
         |  ORDER BY rel6 DESC, cand_id LIMIT $Shortlist),
         |$rounds
         |$rows
         |ORDER BY round""".stripMargin
    },
  )
}
