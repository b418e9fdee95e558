package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Round-12 additions, batch 91 (SURVEY.md §2.4) — constant-size ANN
  * routing:
  *
  *  - s45: CENTROID-ROUTED INCREMENTAL INSERT. s44 proved the
  *    incremental insert path but routed new vectors through a
  *    `vec_id % 7` corpus slice — a broadcast that grows LINEARLY
  *    with the corpus. This variant swaps in the s19 persisted-index
  *    device: k=16 IVF centroids over the base corpus (deterministic
  *    Md5Pack sample + one decimal-mean Lloyd step), each mapped to
  *    its MEDOID entry node (the owned base vector closest to it —
  *    centroids are means, not corpus nodes, and the graph needs node
  *    entries). A new vector scores the 16 centroids, routes to the
  *    top-3 medoids, expands their graph neighborhoods, and runs the
  *    same single local refinement round as s44. The broadcast is
  *    O(k) at ANY corpus size. The audit pins recall on the IDENTICAL
  *    new-node panel within the same 0.15 bound of a full one-round
  *    rebuild that s44 uses.
  *
  * Scale shape: routing is |new| x 16 against literal centroid
  * arrays (map-only); medoid selection is one bounded window over the
  * owned lists; everything downstream is the s44 wedge algebra.
  */
object TextOps91 {
  import Tables.t
  import TextOps83.{emb, score, topK, undirected, descend, exactPanel,
    cosSql, duckInit, duckRound, duckExact, Rounds, Ef, Hops, K, Probes}

  private val EntryK = 8

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s45_centroid_routed_insert" -> ((spark, dir) => {
      import spark.implicits._
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
      val bBase = nnd(base, nBase).localCheckpoint(true)
      // CONSTANT-SIZE routing layer: 16 IVF centroids over the base
      // (the s19 index construction — deterministic, DuckDB-replayable)
      val cent = graft.operators.AnnIvf.buildCentroids(
        base, "vec_id", "embedding", nCentroids = 16, lloydIters = 1)
      val centDf = cent.map { case (id, emb) =>
        (id.asInstanceOf[Long], emb.toSeq) }.toSeq
        .toDF("centroid_id", "c_emb")
      // medoid entry node per centroid: the owned base vector closest
      // to the centroid mean (ties break on vec_id)
      val owned = graft.operators.AnnIvf.assign(
        base, cent, "vec_id", "embedding", nearest = 1)
      val wMed = Window.partitionBy("centroid_id")
        .orderBy(col("cm").desc, col("vec_id").asc)
      val medoids = owned
        .join(base.select(col("vec_id"), col("embedding")), "vec_id")
        .join(broadcast(centDf), "centroid_id")
        .select(col("centroid_id"), col("vec_id"),
          round(VectorOps.cosine(col("embedding"), col("c_emb")), 6)
            .as("cm"))
        .withColumn("rk", row_number().over(wMed))
        .filter(col("rk") === 1)
        .select(col("centroid_id"), col("vec_id").as("v"))
      // route each new vector to its top-3 centroids' medoids
      val routed = graft.operators.AnnIvf.assign(
        fresh, cent, "vec_id", "embedding", nearest = 3)
      val seeds = routed.join(broadcast(medoids), "centroid_id")
        .select(col("vec_id").as("u"), col("v"))
        .filter(col("u") =!= col("v")).distinct()
      // from here on: exactly the s44 insert path
      val seedCands = seeds.unionAll(
        seeds.join(bBase.select(col("u").as("v"), col("v").as("w")), "v")
          .select(col("u"), col("w").as("v")))
        .filter(col("u") =!= col("v")).distinct()
      val newEdges = topK(score(seedCands), 5).localCheckpoint(true)
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
      val bFull = nnd(e, nAll).filter(col("u") % 10 === 0)
        .localCheckpoint(true)
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
          lit(16L).as("n_centers"),
          col("possible"), col("hits_seed"), col("hits_inc"),
          col("hits_full"),
          (col("hits_seed") / col("possible")).as("seed_recall"),
          (col("hits_inc") / col("possible")).as("inc_recall"),
          (col("hits_full") / col("possible")).as("full_recall"),
          (col("hits_inc") >= col("hits_seed")).as("refinement_improved"),
          ((col("hits_inc") - col("hits_full")) / col("possible") >=
            -0.15).as("recall_close_to_rebuild"))
    }),
    // s46: the s41 hierarchical search with its routing layer made
    // CONSTANT-SIZE — 16 IVF centroid medoids replace the vec_id % 16
    // corpus slice (n/16 nodes, linear in the corpus). Routing cost
    // per probe drops from O(n/16) to O(16) at ANY corpus size; the
    // walk, graph, ef, hop budget and probe panel are IDENTICAL to
    // s41, and the audit pins centroid-routed recall within 0.15 of
    // the same walk from md5-random entries.
    "s46_centroid_routed_search" -> ((spark, dir) => {
      import spark.implicits._
      val e = emb(spark, dir)
      val n = e.count()
      val graph =
        undirected(descend(spark, e, n, Rounds).last).localCheckpoint(true)
      // constant-size routing layer: 16 IVF centroids -> medoid nodes
      val cent = graft.operators.AnnIvf.buildCentroids(
        e, "vec_id", "embedding", nCentroids = 16, lloydIters = 1)
      val centDf = cent.map { case (id, em) =>
        (id.asInstanceOf[Long], em.toSeq) }.toSeq
        .toDF("centroid_id", "c_emb")
      val owned = graft.operators.AnnIvf.assign(
        e, cent, "vec_id", "embedding", nearest = 1)
      val wMed = Window.partitionBy("centroid_id")
        .orderBy(col("cm").desc, col("vec_id").asc)
      val medoids = owned
        .join(e.select(col("vec_id"), col("embedding")), "vec_id")
        .join(broadcast(centDf), "centroid_id")
        .select(col("centroid_id"), col("vec_id"),
          round(VectorOps.cosine(col("embedding"), col("c_emb")), 6)
            .as("cm"))
        .withColumn("rk", row_number().over(wMed))
        .filter(col("rk") === 1)
        .select(col("vec_id").as("v")).distinct()
      val probeIds = e.filter(col("vec_id") < Probes)
        .select(col("vec_id").as("u"))
      val routed = medoids.crossJoin(broadcast(probeIds))
        .filter(col("u") =!= col("v"))
      val entries = topK(EntryK)(score(e)(routed))
      // the s39/s41 walk, verbatim, from the centroid-routed entries
      def walk(start: DataFrame): DataFrame =
        (1 to Hops).foldLeft(
          topK(Ef)(score(e)(start)).localCheckpoint(true)) { (f, _) =>
          val nb = f.as("f").join(graph.as("g"), col("f.v") === col("g.u"))
            .select(col("f.u").as("u"), col("g.v").as("v"))
            .unionAll(f).distinct()
          topK(Ef)(score(e)(nb)).localCheckpoint(true)
        }
      val answer = topK(K)(
        score(e)(walk(entries)).filter(col("u") =!= col("v")))
      // baseline: the SAME walk from md5-random entries (s39)
      val slots = e.select(col("vec_id").as("v"),
        pmod(graft.functions.Md5Pack(
          concat(lit("nnd_"), col("vec_id"))), lit(n)).as("slot"))
      val randomEntries = e.filter(col("vec_id") < Probes)
        .select(col("vec_id").as("u"),
          explode(expr("sequence(1, 8)")).as("j"))
        .select(col("u"), pmod(graft.functions.Md5Pack(
          concat_ws("_", lit("s39"), col("u"), col("j"))),
          lit(n)).as("slot"))
        .join(slots, "slot").select("u", "v").distinct()
      val answerRandom = topK(K)(
        score(e)(walk(randomEntries)).filter(col("u") =!= col("v")))
      val exact = exactPanel(e).persist()
      exact.count()
      val possible = exact.agg(count(lit(1)).as("possible"))
      val hits = answer.intersect(exact)
        .agg(count(lit(1)).as("hits_routed"))
      val hitsR = answerRandom.intersect(exact)
        .agg(count(lit(1)).as("hits_random"))
      hits.crossJoin(broadcast(hitsR)).crossJoin(broadcast(possible))
        .select(lit(n).as("n_nodes"), lit(16L).as("n_centers"),
          col("possible"), col("hits_routed"),
          (col("hits_routed") / col("possible")).as("recall_routed"),
          col("hits_random"),
          (col("hits_random") / col("possible")).as("recall_random"),
          ((col("hits_routed") - col("hits_random")) / col("possible")
            >= -0.15).as("routing_close_to_random"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "s45_centroid_routed_insert" -> {
      def md5own(prefix: String) =
        Tables.duckMd5Pack(s"'${prefix}_' || CAST(vec_id AS VARCHAR)")
      val md5draw = Tables.duckMd5Pack(
        "'nnd_' || CAST(u AS VARCHAR) || '_' || CAST(j AS VARCHAR)")
      def cosExpr(a: String, b: String) =
        s"""round(list_dot_product($a.emb, $b.emb) /
           |  (sqrt(list_dot_product($a.emb, $a.emb))
           |    * sqrt(list_dot_product($b.emb, $b.emb))), 6)""".stripMargin
      def cosOf(a: String, b: String) =
        s"""list_dot_product($a, $b) /
           |      (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))""".stripMargin
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
         |cent AS (
         |  SELECT vec_id AS centroid_id, emb AS c_emb
         |  FROM base
         |  ORDER BY ${Tables.duckMd5Pack("CAST(vec_id AS VARCHAR)")}
         |  LIMIT 16),
         |assigned0 AS (
         |  SELECT v.vec_id, c.centroid_id,
         |    row_number() OVER (PARTITION BY v.vec_id
         |      ORDER BY ${cosOf("v.emb", "c.c_emb")} DESC,
         |        c.centroid_id) AS rn
         |  FROM base v CROSS JOIN cent c),
         |memc AS (
         |  SELECT a.centroid_id,
         |    unnest(range(1, len(v.emb) + 1)) AS pos,
         |    unnest(v.emb) AS comp
         |  FROM assigned0 a JOIN base v ON a.vec_id = v.vec_id
         |  WHERE a.rn = 1),
         |refined AS (
         |  SELECT centroid_id, pos,
         |    round(CAST(sum(CAST(comp AS DECIMAL(25,10))) AS DOUBLE)
         |      / count(*), 6) AS m
         |  FROM memc GROUP BY centroid_id, pos),
         |rcent AS (
         |  SELECT centroid_id, list(m ORDER BY pos) AS c_emb
         |  FROM refined GROUP BY centroid_id),
         |owned AS (
         |  SELECT vec_id, centroid_id FROM (
         |    SELECT v.vec_id, c.centroid_id,
         |      row_number() OVER (PARTITION BY v.vec_id
         |        ORDER BY ${cosOf("v.emb", "c.c_emb")} DESC,
         |          c.centroid_id) AS rn
         |    FROM base v CROSS JOIN rcent c)
         |  WHERE rn = 1),
         |medoids AS (
         |  SELECT centroid_id, vec_id AS v FROM (
         |    SELECT o.centroid_id, o.vec_id,
         |      row_number() OVER (PARTITION BY o.centroid_id
         |        ORDER BY round(${cosOf("b.emb", "c.c_emb")}, 6) DESC,
         |          o.vec_id) AS rk
         |    FROM owned o JOIN base b ON b.vec_id = o.vec_id
         |    JOIN rcent c ON c.centroid_id = o.centroid_id)
         |  WHERE rk = 1),
         |routed AS (
         |  SELECT vec_id, centroid_id FROM (
         |    SELECT f.vec_id, c.centroid_id,
         |      row_number() OVER (PARTITION BY f.vec_id
         |        ORDER BY ${cosOf("f.emb", "c.c_emb")} DESC,
         |          c.centroid_id) AS rn
         |    FROM fresh f CROSS JOIN rcent c)
         |  WHERE rn <= 3),
         |seeds AS (
         |  SELECT DISTINCT r.vec_id AS u, m.v
         |  FROM routed r JOIN medoids m USING (centroid_id)
         |  WHERE r.vec_id <> m.v),
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
         |  CAST(16 AS BIGINT) AS n_centers,
         |  CAST(possible AS BIGINT) AS possible,
         |  CAST(hits_seed AS BIGINT) AS hits_seed,
         |  CAST(hits_inc AS BIGINT) AS hits_inc,
         |  CAST(hits_full AS BIGINT) AS hits_full,
         |  CAST(hits_seed AS DOUBLE) / possible AS seed_recall,
         |  CAST(hits_inc AS DOUBLE) / possible AS inc_recall,
         |  CAST(hits_full AS DOUBLE) / possible AS full_recall,
         |  hits_inc >= hits_seed AS refinement_improved,
         |  (CAST(hits_inc AS DOUBLE) - hits_full) / possible >= -0.15
         |    AS recall_close_to_rebuild
         |FROM hits, nb, na""".stripMargin
    },

    "s46_centroid_routed_search" -> {
      val rounds = (1 to Rounds).map(duckRound).mkString(",\n")
      val entryDraw = Tables.duckMd5Pack(
        "'s39_' || CAST(u AS VARCHAR) || '_' || CAST(j AS VARCHAR)")
      // cosine of a corpus row against a centroid mean (no precomputed
      // norm on the centroid side)
      def cosVC(v: String, c: String) =
        s"""list_dot_product($v.emb, $c.c_emb) /
           |      ($v.nrm * sqrt(list_dot_product($c.c_emb, $c.c_emb)))""".stripMargin
      def hops(prefix: String) = (1 to Hops).map { h =>
        s"""${prefix}n$h AS (
           |  SELECT DISTINCT u, v FROM (
           |    SELECT f.u AS u, g.v AS v
           |    FROM ${prefix}f${h - 1} f JOIN gs g ON f.v = g.u
           |    UNION ALL SELECT u, v FROM ${prefix}f${h - 1})),
           |${prefix}sn$h AS (
           |  SELECT c.u, c.v, ${cosSql("a", "b")} AS cos
           |  FROM ${prefix}n$h c JOIN e a ON a.vec_id = c.u
           |  JOIN e b ON b.vec_id = c.v),
           |${prefix}f$h AS MATERIALIZED (
           |  SELECT u, v FROM (
           |    SELECT u, v, row_number() OVER (PARTITION BY u
           |      ORDER BY cos DESC, v) AS rank FROM ${prefix}sn$h)
           |  WHERE rank <= $Ef)""".stripMargin
      }.mkString(",\n")
      s"""WITH $duckInit,
         |$rounds,
         |gs AS MATERIALIZED (
         |  SELECT u, v FROM b$Rounds
         |  UNION SELECT v AS u, u AS v FROM b$Rounds),
         |probes AS (SELECT vec_id AS u FROM e WHERE vec_id < $Probes),
         |cent AS (
         |  SELECT vec_id AS centroid_id, emb AS c_emb
         |  FROM e
         |  ORDER BY ${Tables.duckMd5Pack("CAST(vec_id AS VARCHAR)")}
         |  LIMIT 16),
         |assigned0 AS (
         |  SELECT v.vec_id, c.centroid_id,
         |    row_number() OVER (PARTITION BY v.vec_id
         |      ORDER BY ${cosVC("v", "c")} DESC, c.centroid_id) AS rn
         |  FROM e v CROSS JOIN cent c),
         |memc AS (
         |  SELECT a.centroid_id,
         |    unnest(range(1, len(v.emb) + 1)) AS pos,
         |    unnest(v.emb) AS comp
         |  FROM assigned0 a JOIN e v ON a.vec_id = v.vec_id
         |  WHERE a.rn = 1),
         |refined AS (
         |  SELECT centroid_id, pos,
         |    round(CAST(sum(CAST(comp AS DECIMAL(25,10))) AS DOUBLE)
         |      / count(*), 6) AS m
         |  FROM memc GROUP BY centroid_id, pos),
         |rcent AS (
         |  SELECT centroid_id, list(m ORDER BY pos) AS c_emb
         |  FROM refined GROUP BY centroid_id),
         |owned AS (
         |  SELECT vec_id, centroid_id FROM (
         |    SELECT v.vec_id, c.centroid_id,
         |      row_number() OVER (PARTITION BY v.vec_id
         |        ORDER BY ${cosVC("v", "c")} DESC, c.centroid_id) AS rn
         |    FROM e v CROSS JOIN rcent c)
         |  WHERE rn = 1),
         |up AS (
         |  SELECT DISTINCT v FROM (
         |    SELECT centroid_id, vec_id AS v FROM (
         |      SELECT o.centroid_id, o.vec_id,
         |        row_number() OVER (PARTITION BY o.centroid_id
         |          ORDER BY round(${cosVC("b", "c")}, 6) DESC,
         |            o.vec_id) AS rk
         |      FROM owned o JOIN e b ON b.vec_id = o.vec_id
         |      JOIN rcent c ON c.centroid_id = o.centroid_id)
         |    WHERE rk = 1)),
         |routeds AS (
         |  SELECT p.u, c.v, ${cosSql("a", "b")} AS cos
         |  FROM probes p CROSS JOIN up c
         |  JOIN e a ON a.vec_id = p.u JOIN e b ON b.vec_id = c.v
         |  WHERE p.u <> c.v),
         |ent AS (
         |  SELECT u, v, cos FROM (
         |    SELECT u, v, cos, row_number() OVER (PARTITION BY u
         |      ORDER BY cos DESC, v) AS rank FROM routeds)
         |  WHERE rank <= $EntryK),
         |hf0 AS MATERIALIZED (
         |  SELECT u, v FROM (
         |    SELECT u, v, row_number() OVER (PARTITION BY u
         |      ORDER BY cos DESC, v) AS rank FROM ent)
         |  WHERE rank <= $Ef),
         |${hops("h")},
         |hans AS (
         |  SELECT u, v FROM (
         |    SELECT c.u, c.v, row_number() OVER (PARTITION BY c.u
         |      ORDER BY ${cosSql("a", "b")} DESC, c.v) AS rank
         |    FROM hf$Hops c JOIN e a ON a.vec_id = c.u
         |    JOIN e b ON b.vec_id = c.v WHERE c.u <> c.v)
         |  WHERE rank <= $K),
         |rent AS (
         |  SELECT DISTINCT d.u, s.v
         |  FROM (SELECT u, $entryDraw % nn.n AS slot FROM (
         |          SELECT vec_id AS u, unnest(range(1, 9)) AS j
         |          FROM e WHERE vec_id < $Probes), nn) d
         |  JOIN slots s USING (slot)),
         |rsent AS (
         |  SELECT c.u, c.v, ${cosSql("a", "b")} AS cos
         |  FROM rent c JOIN e a ON a.vec_id = c.u
         |  JOIN e b ON b.vec_id = c.v),
         |rf0 AS MATERIALIZED (
         |  SELECT u, v FROM (
         |    SELECT u, v, row_number() OVER (PARTITION BY u
         |      ORDER BY cos DESC, v) AS rank FROM rsent)
         |  WHERE rank <= $Ef),
         |${hops("r")},
         |rans AS (
         |  SELECT u, v FROM (
         |    SELECT c.u, c.v, row_number() OVER (PARTITION BY c.u
         |      ORDER BY ${cosSql("a", "b")} DESC, c.v) AS rank
         |    FROM rf$Hops c JOIN e a ON a.vec_id = c.u
         |    JOIN e b ON b.vec_id = c.v WHERE c.u <> c.v)
         |  WHERE rank <= $K),
         |$duckExact
         |SELECT
         |  (SELECT n FROM nn) AS n_nodes,
         |  CAST(16 AS BIGINT) AS n_centers,
         |  (SELECT count(*) FROM ex) AS possible,
         |  (SELECT count(*) FROM (SELECT u, v FROM hans
         |     INTERSECT SELECT u, v FROM ex)) AS hits_routed,
         |  CAST((SELECT count(*) FROM (SELECT u, v FROM hans
         |     INTERSECT SELECT u, v FROM ex)) AS DOUBLE)
         |    / (SELECT count(*) FROM ex) AS recall_routed,
         |  (SELECT count(*) FROM (SELECT u, v FROM rans
         |     INTERSECT SELECT u, v FROM ex)) AS hits_random,
         |  CAST((SELECT count(*) FROM (SELECT u, v FROM rans
         |     INTERSECT SELECT u, v FROM ex)) AS DOUBLE)
         |    / (SELECT count(*) FROM ex) AS recall_random,
         |  (CAST((SELECT count(*) FROM (SELECT u, v FROM hans
         |     INTERSECT SELECT u, v FROM ex)) AS DOUBLE)
         |   - (SELECT count(*) FROM (SELECT u, v FROM rans
         |     INTERSECT SELECT u, v FROM ex)))
         |    / (SELECT count(*) FROM ex) >= -0.15
         |    AS routing_close_to_random""".stripMargin
    },
  )
}
