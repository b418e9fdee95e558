package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Round-8 additions, batch 79 (SURVEY.md §2.4) — graph-based ANN:
  *
  *  - s38: NN-DESCENT k-NN GRAPH construction — the fourth ANN family
  *    next to SRP-LSH (s2), IVF (s3) and PQ (s5), and the one that
  *    builds the all-nodes neighbor graph (the HNSW/NN-Descent
  *    ingredient) instead of answering per-probe queries. Faithful to
  *    the algorithm: the graph INITIALIZES with deterministic
  *    pseudo-random neighbors (each node draws 8 md5-derived slot
  *    keys; nodes own the slot of their own id hash — a pure
  *    equi-join, no dense global index and no global window), takes
  *    top-5 by cosine, then runs ONE NN-Descent round: candidates =
  *    neighbors-of-neighbors over the UNDIRECTED graph (B0 plus its
  *    reverse — the "general" neighborhood of the paper), rescored,
  *    top-5 again. Recall is audited on a fixed 50-probe panel
  *    against exact brute force, and the output pins that the round
  *    IMPROVED recall — the convergence property that makes
  *    NN-Descent work.
  *
  *    Scale shape: slot init is an equi-join keyed on the slot hash
  *    (expected one owner per slot); the wedge join is keyed on the
  *    middle node with per-node degree bounded by 2k, so candidates
  *    are O(n·(2k)²) — never a cross join; top-k runs in per-node
  *    windows; the exact audit is probe-panel-bounded (50 × n), not
  *    n². All cosines round to 6dp with id tie-breaks, so DuckDB
  *    replays bit-exactly.
  */
object TextOps79 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s38_nn_descent" -> ((spark, dir) => {
      val e = t(spark, dir, "embeddings")
        .filter(col("embedding").isNotNull)
        .select(col("vec_id"), col("embedding"))
      val n = e.count() // one scalar: the slot-space size
      def score(pairs: DataFrame): DataFrame = pairs
        .join(e.select(col("vec_id").as("u"), col("embedding").as("ue")),
          "u")
        .join(e.select(col("vec_id").as("v"), col("embedding").as("ve")),
          "v")
        .select(col("u"), col("v"),
          round(VectorOps.cosine(col("ue"), col("ve")), 6).as("cos"))
      def top5(scored: DataFrame): DataFrame = {
        val w = Window.partitionBy("u").orderBy(col("cos").desc,
          col("v").asc)
        scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5).select("u", "v")
      }
      // random init: node owns slot md5(id); each node draws 8 slots
      val slots = e.select(col("vec_id").as("v"),
        pmod(graft.functions.Md5Pack(
          concat(lit("nnd_"), col("vec_id"))), lit(n)).as("slot"))
      val draws = e.select(col("vec_id").as("u"),
          explode(expr("sequence(1, 8)")).as("j"))
        .select(col("u"), pmod(graft.functions.Md5Pack(
          concat_ws("_", lit("nnd"), col("u"), col("j"))),
          lit(n)).as("slot"))
      val init = draws.join(slots, "slot")
        .filter(col("u") =!= col("v")).select("u", "v").distinct()
      val b0 = top5(score(init)).persist()
      b0.count() // b0 feeds three branches; materialize once (d4 lesson)
      // one NN-Descent round over the undirected neighborhood
      val g = b0.unionAll(b0.select(col("v").as("u"), col("u").as("v")))
        .distinct()
      val cand = g.as("g1").join(g.as("g2"), col("g1.v") === col("g2.u"))
        .select(col("g1.u").as("u"), col("g2.v").as("v"))
        .filter(col("u") =!= col("v"))
        .unionAll(b0).distinct()
      val b1 = top5(score(cand)).persist()
      b1.count()
      // exact ground truth on the fixed probe panel
      val probes = e.filter(col("vec_id") < 50)
        .select(col("vec_id").as("u"), col("embedding").as("ue"))
      val exact = top5(probes
        .join(e.select(col("vec_id").as("v"), col("embedding").as("ve")),
          col("u") =!= col("v"))
        .select(col("u"), col("v"),
          round(VectorOps.cosine(col("ue"), col("ve")), 6).as("cos")))
        .persist()
      exact.count()
      val possible = exact.agg(count(lit(1)).as("possible"))
      val h0 = b0.intersect(exact).agg(count(lit(1)).as("hits_init"))
      val h1 = b1.intersect(exact).agg(count(lit(1)).as("hits_round1"))
      h0.crossJoin(broadcast(h1)).crossJoin(broadcast(possible))
        .select(lit(n).as("n_nodes"), col("possible"),
          col("hits_init"), col("hits_round1"),
          (col("hits_init") / col("possible")).as("init_recall"),
          (col("hits_round1") / col("possible")).as("round1_recall"),
          (col("hits_round1") >= col("hits_init")).as("improved"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    // the same init draws, top-5 windows, wedge expansion and probe
    // audit; Tables.duckMd5Pack replays the 62-bit hash bit-exactly
    "s38_nn_descent" -> {
      val slotOwn = Tables.duckMd5Pack("'nnd_' || CAST(vec_id AS VARCHAR)")
      val slotDraw = Tables.duckMd5Pack(
        "'nnd_' || CAST(u AS VARCHAR) || '_' || CAST(j AS VARCHAR)")
      s"""WITH e AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |nn AS (SELECT count(*) AS n FROM e),
         |slots AS (
         |  SELECT vec_id AS v, $slotOwn % nn.n AS slot FROM e, nn),
         |draws AS (
         |  SELECT u, $slotDraw % nn.n AS slot FROM (
         |    SELECT vec_id AS u, unnest(range(1, 9)) AS j FROM e), nn),
         |init AS (
         |  SELECT DISTINCT u, v FROM draws JOIN slots USING (slot)
         |  WHERE u <> v),
         |s0 AS (
         |  SELECT i.u, i.v,
         |    round(list_dot_product(a.emb, b.emb) /
         |      (sqrt(list_dot_product(a.emb, a.emb))
         |        * sqrt(list_dot_product(b.emb, b.emb))), 6) AS cos
         |  FROM init i JOIN e a ON a.vec_id = i.u
         |  JOIN e b ON b.vec_id = i.v),
         |b0 AS (
         |  SELECT u, v FROM (
         |    SELECT u, v, row_number() OVER (PARTITION BY u
         |      ORDER BY cos DESC, v) AS rank FROM s0)
         |  WHERE rank <= 5),
         |g AS (
         |  SELECT u, v FROM b0 UNION SELECT v AS u, u AS v FROM b0),
         |cand AS (
         |  SELECT DISTINCT u, v FROM (
         |    SELECT g1.u AS u, g2.v AS v
         |    FROM g g1 JOIN g g2 ON g1.v = g2.u
         |    WHERE g1.u <> g2.v
         |    UNION ALL SELECT u, v FROM b0)),
         |s1 AS (
         |  SELECT c.u, c.v,
         |    round(list_dot_product(a.emb, b.emb) /
         |      (sqrt(list_dot_product(a.emb, a.emb))
         |        * sqrt(list_dot_product(b.emb, b.emb))), 6) AS cos
         |  FROM cand c JOIN e a ON a.vec_id = c.u
         |  JOIN e b ON b.vec_id = c.v),
         |b1 AS (
         |  SELECT u, v FROM (
         |    SELECT u, v, row_number() OVER (PARTITION BY u
         |      ORDER BY cos DESC, v) AS rank FROM s1)
         |  WHERE rank <= 5),
         |se AS (
         |  SELECT p.vec_id AS u, c.vec_id AS v,
         |    round(list_dot_product(p.emb, c.emb) /
         |      (sqrt(list_dot_product(p.emb, p.emb))
         |        * sqrt(list_dot_product(c.emb, c.emb))), 6) AS cos
         |  FROM e p JOIN e c ON p.vec_id < 50 AND p.vec_id <> c.vec_id),
         |ex AS (
         |  SELECT u, v FROM (
         |    SELECT u, v, row_number() OVER (PARTITION BY u
         |      ORDER BY cos DESC, v) AS rank FROM se)
         |  WHERE rank <= 5),
         |hits AS (
         |  SELECT
         |    (SELECT count(*) FROM (SELECT * FROM b0 INTERSECT
         |      SELECT * FROM ex)) AS hits_init,
         |    (SELECT count(*) FROM (SELECT * FROM b1 INTERSECT
         |      SELECT * FROM ex)) AS hits_round1,
         |    (SELECT count(*) FROM ex) AS possible)
         |SELECT CAST(nn.n AS BIGINT) AS n_nodes,
         |  CAST(possible AS BIGINT) AS possible,
         |  CAST(hits_init AS BIGINT) AS hits_init,
         |  CAST(hits_round1 AS BIGINT) AS hits_round1,
         |  hits_init / possible AS init_recall,
         |  hits_round1 / possible AS round1_recall,
         |  hits_round1 >= hits_init AS improved
         |FROM hits, nn""".stripMargin
    },
  )
}
