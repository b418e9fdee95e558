package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Round-11 additions, batch 90 (SURVEY.md §2.4) — incremental ANN
  * maintenance:
  *
  *  - s44: INCREMENTAL GRAPH INSERT. The growing-corpus reality at
  *    100 TB: new vectors arrive after the k-NN graph converged, and a
  *    full NN-Descent rebuild per batch is unaffordable. The insert
  *    path seeds each new node through a COARSE ROUTING layer (the
  *    s41 device: score against a small deterministic center set,
  *    keep the top-3 centers plus their graph neighbors), takes top-5,
  *    then runs ONE LOCAL refinement round confined to the touched
  *    neighborhoods (new nodes' wedges through the merged graph) —
  *    never revisiting the untouched 90% of the graph. Recall on the
  *    new-node panel is audited against exact brute force AND against
  *    the recall a FULL one-round rebuild achieves; the output pins
  *    that refinement improved the seeds and that incremental recall
  *    is within 0.15 of the rebuild (in practice it matches or beats
  *    it — coarse seeding starts closer than random init).
  *
  *    Scale shape: seed scoring is |new| × |centers| with a broadcast
  *    center set; every wedge join is keyed on the middle node with
  *    degree ≤ 2k; the exact audit is panel-bounded. The full rebuild
  *    leg exists ONLY as the audit baseline.
  */
object TextOps90 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s44_incremental_graph_insert" -> ((spark, dir) => {
      val e = t(spark, dir, "embeddings")
        .filter(col("embedding").isNotNull)
        .select(col("vec_id"), col("embedding"))
      val base = e.filter(col("vec_id") % 10 =!= 0)
      val fresh = e.filter(col("vec_id") % 10 === 0)
      val nBase = base.count()
      val nAll = e.count()
      def score(pairs: DataFrame): DataFrame = pairs
        .join(e.select(col("vec_id").as("u"), col("embedding").as("ue")),
          "u")
        .join(e.select(col("vec_id").as("v"), col("embedding").as("ve")),
          "v")
        .select(col("u"), col("v"),
          round(VectorOps.cosine(col("ue"), col("ve")), 6).as("cos"))
      def topK(scored: DataFrame, k: Int): DataFrame = {
        val w = Window.partitionBy("u").orderBy(col("cos").desc,
          col("v").asc)
        scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= k).select("u", "v")
      }
      // the s38 one-round NN-Descent build, parameterized by node set
      def nnd(nodes: DataFrame, n: Long): DataFrame = {
        val slots = nodes.select(col("vec_id").as("v"),
          pmod(graft.functions.Md5Pack(
            concat(lit("nnd_"), col("vec_id"))), lit(n)).as("slot"))
        val draws = nodes.select(col("vec_id").as("u"),
            explode(expr("sequence(1, 8)")).as("j"))
          .select(col("u"), pmod(graft.functions.Md5Pack(
            concat_ws("_", lit("nnd"), col("u"), col("j"))),
            lit(n)).as("slot"))
        val init = draws.join(slots, "slot")
          .filter(col("u") =!= col("v")).select("u", "v").distinct()
        val b0 = topK(score(init), 5)
        val g = b0.unionAll(b0.select(col("v").as("u"), col("u").as("v")))
          .distinct()
        val cand = g.as("g1").join(g.as("g2"),
            col("g1.v") === col("g2.u"))
          .select(col("g1.u").as("u"), col("g2.v").as("v"))
          .filter(col("u") =!= col("v")).unionAll(b0).distinct()
        topK(score(cand), 5)
      }
      // eager localCheckpoint (the d19/d27 lesson): each leg executes
      // ONCE and its lineage collapses to a checkpoint scan, so the
      // final audit plan costs exactly its legs instead of re-counting
      // the whole build per reference
      val bBase = nnd(base, nBase).localCheckpoint(true)
      // coarse routing layer: a deterministic ~1/7 slice of the base
      val centers = base.filter(col("vec_id") % 7 === 1)
        .select(col("vec_id").as("v"))
      val seeds = topK(score(fresh.select(col("vec_id").as("u"))
        .crossJoin(broadcast(centers))), 3)
      // seed candidates: the routed centers plus their graph neighbors
      val seedCands = seeds.unionAll(
        seeds.join(bBase.select(col("u").as("v"), col("v").as("w")), "v")
          .select(col("u"), col("w").as("v")))
        .filter(col("u") =!= col("v")).distinct()
      val newEdges = topK(score(seedCands), 5).localCheckpoint(true)
      // ONE local refinement round over the touched neighborhoods
      val g2 = bBase.unionAll(newEdges)
        .unionAll(newEdges.select(col("v").as("u"), col("u").as("v")))
        .distinct()
      val refineCand = newEdges.select("u").distinct()
        .join(g2, "u").select(col("u"), col("v").as("x"))
        .join(g2.select(col("u").as("x"), col("v").as("y")), "x")
        .select(col("u"), col("y").as("v"))
        .filter(col("u") =!= col("v"))
        .unionAll(newEdges).distinct()
      val incFresh = topK(score(refineCand), 5).localCheckpoint(true)
      // the audit baseline: a FULL one-round rebuild over base+fresh
      val bFull = nnd(e, nAll).filter(col("u") % 10 === 0)
        .localCheckpoint(true)
      // exact ground truth on the whole new-node panel
      val exact = topK(fresh
        .select(col("vec_id").as("u"), col("embedding").as("ue"))
        .join(e.select(col("vec_id").as("v"), col("embedding").as("ve")),
          col("u") =!= col("v"))
        .select(col("u"), col("v"),
          round(VectorOps.cosine(col("ue"), col("ve")), 6).as("cos")), 5)
        .localCheckpoint(true)
      val possible = exact.agg(count(lit(1)).as("possible"))
      val hSeed = newEdges.intersect(exact)
        .agg(count(lit(1)).as("hits_seed"))
      val hInc = incFresh.intersect(exact)
        .agg(count(lit(1)).as("hits_inc"))
      val hFull = bFull.intersect(exact)
        .agg(count(lit(1)).as("hits_full"))
      hSeed.crossJoin(broadcast(hInc)).crossJoin(broadcast(hFull))
        .crossJoin(broadcast(possible))
        .select(lit(nBase).as("n_base"), lit(nAll - nBase).as("n_new"),
          col("possible"), col("hits_seed"), col("hits_inc"),
          col("hits_full"),
          (col("hits_seed") / col("possible")).as("seed_recall"),
          (col("hits_inc") / col("possible")).as("inc_recall"),
          (col("hits_full") / col("possible")).as("full_recall"),
          (col("hits_inc") >= col("hits_seed")).as("refinement_improved"),
          ((col("hits_inc") - col("hits_full")) / col("possible") >=
            -0.15).as("recall_close_to_rebuild"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "s44_incremental_graph_insert" -> {
      def md5own(prefix: String) =
        Tables.duckMd5Pack(s"'${prefix}_' || CAST(vec_id AS VARCHAR)")
      val md5draw = Tables.duckMd5Pack(
        "'nnd_' || CAST(u AS VARCHAR) || '_' || CAST(j AS VARCHAR)")
      def cosExpr(a: String, b: String) =
        s"""round(list_dot_product($a.emb, $b.emb) /
           |  (sqrt(list_dot_product($a.emb, $a.emb))
           |    * sqrt(list_dot_product($b.emb, $b.emb))), 6)""".stripMargin
      // the one-round NN-Descent build as reusable CTE text, over a
      // node-set CTE `<ns>` with slot space `<n>` (a scalar CTE)
      def nndSql(tag: String, ns: String, n: String) =
        s"""slots_$tag AS (
           |  SELECT vec_id AS v, ${md5own("nnd")} % $n.n AS slot
           |  FROM $ns, $n),
           |draws_$tag AS (
           |  SELECT u, $md5draw % $n.n AS slot FROM (
           |    SELECT vec_id AS u, unnest(range(1, 9)) AS j FROM $ns), $n),
           |init_$tag AS (
           |  SELECT DISTINCT u, v FROM draws_$tag JOIN slots_$tag
           |  USING (slot) WHERE u <> v),
           |s0_$tag AS (
           |  SELECT i.u, i.v, ${cosExpr("a", "b")} AS cos
           |  FROM init_$tag i JOIN e a ON a.vec_id = i.u
           |  JOIN e b ON b.vec_id = i.v),
           |b0_$tag AS (
           |  SELECT u, v FROM (
           |    SELECT u, v, row_number() OVER (PARTITION BY u
           |      ORDER BY cos DESC, v) AS rank FROM s0_$tag)
           |  WHERE rank <= 5),
           |g_$tag AS (
           |  SELECT u, v FROM b0_$tag
           |  UNION SELECT v AS u, u AS v FROM b0_$tag),
           |cand_$tag AS (
           |  SELECT DISTINCT u, v FROM (
           |    SELECT g1.u AS u, g2.v AS v
           |    FROM g_$tag g1 JOIN g_$tag g2 ON g1.v = g2.u
           |    WHERE g1.u <> g2.v
           |    UNION ALL SELECT u, v FROM b0_$tag)),
           |s1_$tag AS (
           |  SELECT c.u, c.v, ${cosExpr("a", "b")} AS cos
           |  FROM cand_$tag c JOIN e a ON a.vec_id = c.u
           |  JOIN e b ON b.vec_id = c.v),
           |b1_$tag AS (
           |  SELECT u, v FROM (
           |    SELECT u, v, row_number() OVER (PARTITION BY u
           |      ORDER BY cos DESC, v) AS rank FROM s1_$tag)
           |  WHERE rank <= 5)""".stripMargin
      s"""WITH e AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |base AS (SELECT * FROM e WHERE vec_id % 10 <> 0),
         |fresh AS (SELECT * FROM e WHERE vec_id % 10 = 0),
         |nb AS (SELECT count(*) AS n FROM base),
         |na AS (SELECT count(*) AS n FROM e),
         |${nndSql("base", "base", "nb")},
         |${nndSql("full", "e", "na")},
         |centers AS (SELECT vec_id AS v FROM base WHERE vec_id % 7 = 1),
         |seed_sc AS (
         |  SELECT f.vec_id AS u, c.v, ${cosExpr("a", "b")} AS cos
         |  FROM fresh f CROSS JOIN centers c
         |  JOIN e a ON a.vec_id = f.vec_id JOIN e b ON b.vec_id = c.v),
         |seeds AS (
         |  SELECT u, v FROM (
         |    SELECT u, v, row_number() OVER (PARTITION BY u
         |      ORDER BY cos DESC, v) AS rank FROM seed_sc)
         |  WHERE rank <= 3),
         |seed_cands AS (
         |  SELECT DISTINCT u, v FROM (
         |    SELECT u, v FROM seeds
         |    UNION ALL
         |    SELECT s.u, bb.v FROM seeds s
         |    JOIN b1_base bb ON bb.u = s.v)
         |  WHERE u <> v),
         |seed_s AS (
         |  SELECT c.u, c.v, ${cosExpr("a", "b")} AS cos
         |  FROM seed_cands c JOIN e a ON a.vec_id = c.u
         |  JOIN e b ON b.vec_id = c.v),
         |new_edges AS (
         |  SELECT u, v FROM (
         |    SELECT u, v, row_number() OVER (PARTITION BY u
         |      ORDER BY cos DESC, v) AS rank FROM seed_s)
         |  WHERE rank <= 5),
         |g2 AS (
         |  SELECT u, v FROM b1_base
         |  UNION SELECT u, v FROM new_edges
         |  UNION SELECT v AS u, u AS v FROM new_edges),
         |refine_cand AS (
         |  SELECT DISTINCT u, v FROM (
         |    SELECT a.u, b.v FROM g2 a JOIN g2 b ON a.v = b.u
         |    WHERE a.u IN (SELECT DISTINCT u FROM new_edges)
         |      AND a.u <> b.v
         |    UNION ALL SELECT u, v FROM new_edges)),
         |ref_s AS (
         |  SELECT c.u, c.v, ${cosExpr("a", "b")} AS cos
         |  FROM refine_cand c JOIN e a ON a.vec_id = c.u
         |  JOIN e b ON b.vec_id = c.v),
         |inc_fresh AS (
         |  SELECT u, v FROM (
         |    SELECT u, v, row_number() OVER (PARTITION BY u
         |      ORDER BY cos DESC, v) AS rank FROM ref_s)
         |  WHERE rank <= 5),
         |full_fresh AS (SELECT u, v FROM b1_full WHERE u % 10 = 0),
         |se AS (
         |  SELECT p.vec_id AS u, c.vec_id AS v,
         |    ${cosExpr("p", "c")} AS cos
         |  FROM fresh p JOIN e c ON p.vec_id <> c.vec_id),
         |ex AS (
         |  SELECT u, v FROM (
         |    SELECT u, v, row_number() OVER (PARTITION BY u
         |      ORDER BY cos DESC, v) AS rank FROM se)
         |  WHERE rank <= 5),
         |hits AS (
         |  SELECT
         |    (SELECT count(*) FROM (SELECT * FROM new_edges INTERSECT
         |      SELECT * FROM ex)) AS hits_seed,
         |    (SELECT count(*) FROM (SELECT * FROM inc_fresh INTERSECT
         |      SELECT * FROM ex)) AS hits_inc,
         |    (SELECT count(*) FROM (SELECT * FROM full_fresh INTERSECT
         |      SELECT * FROM ex)) AS hits_full,
         |    (SELECT count(*) FROM ex) AS possible)
         |SELECT CAST(nb.n AS BIGINT) AS n_base,
         |  CAST(na.n - nb.n AS BIGINT) AS n_new,
         |  CAST(possible AS BIGINT) AS possible,
         |  CAST(hits_seed AS BIGINT) AS hits_seed,
         |  CAST(hits_inc AS BIGINT) AS hits_inc,
         |  CAST(hits_full AS BIGINT) AS hits_full,
         |  hits_seed / possible AS seed_recall,
         |  hits_inc / possible AS inc_recall,
         |  hits_full / possible AS full_recall,
         |  hits_inc >= hits_seed AS refinement_improved,
         |  (hits_inc - hits_full) / possible >= -0.15
         |    AS recall_close_to_rebuild
         |FROM hits, nb, na""".stripMargin
    },
  )
}
