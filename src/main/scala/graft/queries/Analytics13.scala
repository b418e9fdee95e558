package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 13 (SURVEY.md §2.4):
  *
  *  - q121: HITS hubs/authorities — the second graph-centrality
  *    fixpoint next to q64's PageRank, on the customer↔supplier
  *    bipartite graph (edge weight = lineitem count). Two unnormalized
  *    power iterations stay in exact integers — every sum routes
  *    through DECIMAL(38,0) (the PageRank ANSI-overflow lesson), so
  *    both engines replay bit-identically with ~1e38 headroom. Edge
  *    building is the co-partitioned fact-fact join; score joins
  *    shuffle on their natural keys (supplier/customer cardinality
  *    scales with the corpus — broadcasting them would be the 100 TB
  *    mistake); only the 20 survivors broadcast into the name lookup.
  *  - q122: deadline-windowed funnel — q61's funnel with real
  *    conversion semantics: each step must land within 24 h of the
  *    previous one (first-touch per step, min-aggregation per user —
  *    never a per-user sort). Average conversion hours re-aggregate
  *    through the round→DECIMAL device.
  *  - m13: modality-coverage audit — the pairing gate before any
  *    text+vector (CLIP-style) training run: per-source counts of
  *    documents with text, with embeddings, fully paired, plus the
  *    orphan-embedding row. One full-outer join on the id, one pass.
  */
object Analytics13 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q121_hits" -> ((spark, dir) => {
      val edges = t(spark, dir, "lineitem")
        .join(t(spark, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("c"), col("l_suppkey").as("s"))
        .agg(count(lit(1)).cast("decimal(38,0)").as("w"))
      // h0 = 1 ⇒ a1(s) = Σ_c w; h1(c) = Σ_s w·a1; a2(s) = Σ_c w·h1
      val a1 = edges.groupBy("s").agg(sum(col("w")).as("a1"))
      val h1 = edges.join(a1, "s").groupBy("c")
        .agg(sum(col("w") * col("a1")).cast("decimal(38,0)").as("h1"))
      val a2 = edges.join(h1, "c").groupBy("s")
        .agg(sum(col("w") * col("h1")).cast("decimal(38,0)").as("a2"))
      val top = a2.join(a1, "s")
        .groupBy()
        .agg(graft.functions.TopKAgg.minK(
          struct((-col("a2")).as("nega"), col("s").as("sk"),
            col("a1").as("a1v")), 20).as("w"))
        .select(explode(col("w")).as("m"))
        .select(col("m.sk").as("sk"), (-col("m.nega")).as("authority2"),
          col("m.a1v").as("authority1"))
      t(spark, dir, "supplier")
        .join(broadcast(top), col("s_suppkey") === col("sk"))
        // scores stay exact DECIMAL through the iterations; the final
        // select presents DOUBLE (identical correctly-rounded bits in
        // both engines — decimals must not reach a dumped column)
        .select(col("s_suppkey"), col("s_name"),
          col("authority1").cast("double").as("authority1"),
          col("authority2").cast("double").as("authority2"))
        .orderBy(col("authority2").desc, col("s_suppkey"))
    }),

    "q122_windowed_funnel" -> ((spark, dir) => {
      val e = t(spark, dir, "events")
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("v_ts"))
      val c = e.filter(col("event_type") === "click")
        .join(v, "user_id")
        .filter(col("ts") >= col("v_ts") &&
          col("ts") <= col("v_ts") + expr("INTERVAL 24 HOURS"))
        .groupBy("user_id")
        .agg(min(col("ts")).as("c_ts"), min(col("v_ts")).as("v_ts"))
      val p = e.filter(col("event_type") === "purchase")
        .join(c, "user_id")
        .filter(col("ts") >= col("c_ts") &&
          col("ts") <= col("c_ts") + expr("INTERVAL 24 HOURS"))
        .groupBy("user_id")
        .agg(min(col("ts")).as("p_ts"), min(col("v_ts")).as("v_ts"))
      val hours = (unix_micros(col("p_ts")) - unix_micros(col("v_ts"))) /
        lit(3600000000.0)
      v.agg(count(lit(1)).as("n_viewed"))
        .crossJoin(c.agg(count(lit(1)).as("n_clicked_24h")))
        .crossJoin(p.agg(count(lit(1)).as("n_purchased_24h"),
          round(sum(round(hours, 6).cast("decimal(18,6)")).cast("double") /
            count(lit(1)), 6).as("avg_funnel_hours")))
        .withColumn("click_rate", round(col("n_clicked_24h").cast("double") /
          col("n_viewed"), 6))
        .withColumn("purchase_rate",
          round(col("n_purchased_24h").cast("double") /
            col("n_viewed"), 6))
    }),

    "m13_modality_coverage" -> ((spark, dir) => {
      val docs = t(spark, dir, "documents")
        .select(col("doc_id"), col("source"),
          col("text").isNotNull.as("has_text"))
      val emb = t(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding").isNotNull.as("has_emb"))
      docs.join(emb, col("doc_id") === col("vec_id"), "full_outer")
        .select(coalesce(col("source"), lit("_orphan_embedding"))
            .as("source"),
          coalesce(col("has_text"), lit(false)).as("has_text"),
          coalesce(col("has_emb"), lit(false)).as("has_emb"),
          col("doc_id").isNotNull.as("is_doc"))
        .groupBy("source")
        .agg(count_if(col("is_doc")).as("n_docs"),
          count_if(col("has_text")).as("n_with_text"),
          count_if(col("is_doc") && col("has_emb")).as("n_with_embedding"),
          count_if(col("has_text") && col("has_emb")).as("n_paired"),
          count_if(!col("is_doc")).as("n_orphan_embeddings"))
        .withColumn("pair_frac",
          round(col("n_paired").cast("double") /
            greatest(col("n_docs"), lit(1L)), 6))
        .orderBy("source")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q121_hits" ->
      """WITH edges AS (
        |  SELECT o_custkey AS c, l_suppkey AS s,
        |    CAST(count(*) AS DECIMAL(38,0)) AS w
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |a1 AS (
        |  SELECT s, CAST(sum(w) AS DECIMAL(38,0)) AS a1
        |  FROM edges GROUP BY s),
        |h1 AS (
        |  SELECT c, CAST(sum(w * a1) AS DECIMAL(38,0)) AS h1
        |  FROM edges JOIN a1 USING (s) GROUP BY c),
        |a2 AS (
        |  SELECT s, CAST(sum(w * h1) AS DECIMAL(38,0)) AS a2
        |  FROM edges JOIN h1 USING (c) GROUP BY s),
        |top AS (
        |  SELECT s, a2, a1 FROM (
        |    SELECT a2.s, a2.a2, a1.a1, row_number() OVER (
        |      ORDER BY a2.a2 DESC, a2.s) AS rn
        |    FROM a2 JOIN a1 USING (s)) WHERE rn <= 20)
        |SELECT s_suppkey, s_name, CAST(a1 AS DOUBLE) AS authority1,
        |  CAST(a2 AS DOUBLE) AS authority2
        |FROM supplier JOIN top ON s_suppkey = top.s
        |ORDER BY authority2 DESC, s_suppkey""".stripMargin,

    "q122_windowed_funnel" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS v_ts FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS c_ts, min(v.v_ts) AS v_ts
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts >= v.v_ts
        |    AND e.ts <= v.v_ts + INTERVAL 24 HOUR
        |  GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS p_ts, min(c.v_ts) AS v_ts
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
        |    AND e.ts <= c.c_ts + INTERVAL 24 HOUR
        |  GROUP BY e.user_id),
        |agg AS (
        |  SELECT
        |    (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_viewed,
        |    (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_clicked_24h,
        |    (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_purchased_24h,
        |    (SELECT round(CAST(sum(CAST(round(
        |        (epoch_us(p_ts) - epoch_us(v_ts)) / 3600000000.0, 6)
        |        AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
        |      FROM p) AS avg_funnel_hours)
        |SELECT n_viewed, n_clicked_24h, n_purchased_24h, avg_funnel_hours,
        |  round(CAST(n_clicked_24h AS DOUBLE) / n_viewed, 6) AS click_rate,
        |  round(CAST(n_purchased_24h AS DOUBLE) / n_viewed, 6)
        |    AS purchase_rate
        |FROM agg""".stripMargin,

    "m13_modality_coverage" ->
      """WITH j AS (
        |  SELECT coalesce(d.source, '_orphan_embedding') AS source,
        |    coalesce(d.text IS NOT NULL, false) AS has_text,
        |    coalesce(e.embedding IS NOT NULL, false) AS has_emb,
        |    d.doc_id IS NOT NULL AS is_doc
        |  FROM documents d FULL OUTER JOIN embeddings e
        |    ON d.doc_id = e.vec_id)
        |SELECT source,
        |  CAST(count(*) FILTER (WHERE is_doc) AS BIGINT) AS n_docs,
        |  CAST(count(*) FILTER (WHERE has_text) AS BIGINT) AS n_with_text,
        |  CAST(count(*) FILTER (WHERE is_doc AND has_emb) AS BIGINT)
        |    AS n_with_embedding,
        |  CAST(count(*) FILTER (WHERE has_text AND has_emb) AS BIGINT)
        |    AS n_paired,
        |  CAST(count(*) FILTER (WHERE NOT is_doc) AS BIGINT)
        |    AS n_orphan_embeddings,
        |  round(CAST(count(*) FILTER (WHERE has_text AND has_emb) AS DOUBLE)
        |    / greatest(count(*) FILTER (WHERE is_doc), 1), 6) AS pair_frac
        |FROM j GROUP BY source ORDER BY source""".stripMargin,
  )
}
