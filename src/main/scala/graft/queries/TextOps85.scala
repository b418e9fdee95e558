package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 additions, batch 85 (SURVEY.md §2.4) — graph ANN, part 3:
  *
  *  - s40: FILTERED GRAPH SEARCH — predicate-constrained ANN over the
  *    s38b NN-Descent graph (the filtered-HNSW discipline): the greedy
  *    expansion runs UNFILTERED — filtered-out nodes still route the
  *    walk, because severing them fragments the graph exactly where
  *    the filter is selective — and the predicate applies only to the
  *    returned candidates, with recall audited against the exact
  *    FILTER-THEN-RANK panel (the post-filter ground truth s37 uses
  *    for the IVF family). Also reports the unfiltered s39 recall from
  *    the identical graph so the filter's cost is visible in one row.
  *
  *    Scale shape: identical to s39 — every hop is a keyed join
  *    bounded O(probes · ef · 2k); the filter is one broadcast-joined
  *    label lookup on the final frontier, not a scan.
  */
object TextOps85 {
  import TextOps83._

  /** The candidate-side predicate: even label. */
  private val FilterSql = "label % 2 = 0"

  private def labels(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "embeddings")
      .filter(col("embedding").isNotNull)
      .select(col("vec_id").as("v"), col("label"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s40_filtered_graph_search" -> ((spark, dir) => {
      val e = emb(spark, dir)
      val n = e.count()
      val graph =
        undirected(descend(spark, e, n, Rounds).last).localCheckpoint(true)
      val slots = e.select(col("vec_id").as("v"),
        pmod(graft.functions.Md5Pack(
          concat(lit("nnd_"), col("vec_id"))), lit(n)).as("slot"))
      val entries = e.filter(col("vec_id") < Probes)
        .select(col("vec_id").as("u"),
          explode(expr("sequence(1, 8)")).as("j"))
        .select(col("u"), pmod(graft.functions.Md5Pack(
          concat_ws("_", lit("s39"), col("u"), col("j"))),
          lit(n)).as("slot"))
        .join(slots, "slot").select("u", "v").distinct()
      // identical walk to s39 (same entries, same hops, same ef): the
      // filter must not reroute the expansion
      val frontier = (1 to Hops).foldLeft(
        topK(Ef)(score(e)(entries)).localCheckpoint(true)) { (f, _) =>
        val nb = f.as("f").join(graph.as("g"), col("f.v") === col("g.u"))
          .select(col("f.u").as("u"), col("g.v").as("v"))
          .unionAll(f).distinct()
        topK(Ef)(score(e)(nb)).localCheckpoint(true)
      }.persist()
      val lab = labels(spark, dir)
      val scored = score(e)(frontier).filter(col("u") =!= col("v"))
        .persist()
      val answerAll = topK(K)(scored)
      val answerFiltered = topK(K)(
        scored.join(broadcast(lab.filter(expr(FilterSql)).select("v")),
          "v"))
      // exact ground truths: plain panel, and the FILTER-THEN-RANK
      // panel (all probes, candidates restricted to the predicate)
      val exactAll = exactPanel(e).persist()
      exactAll.count()
      val filteredCands = e.join(broadcast(lab.filter(expr(FilterSql))
        .select(col("v").as("vec_id"))), Seq("vec_id"), "left_semi")
      val exactFiltered = topK(K)(e.filter(col("vec_id") < Probes)
          .select(col("vec_id").as("u"), col("embedding").as("ue"))
          .join(filteredCands.select(col("vec_id").as("v"),
            col("embedding").as("ve")), col("u") =!= col("v"))
          .select(col("u"), col("v"),
            round(graft.functions.VectorOps.cosine(
              col("ue"), col("ve")), 6).as("cos")))
        .persist()
      exactFiltered.count()
      def audit(ans: DataFrame, exact: DataFrame, tag: String) =
        ans.select("u", "v").intersect(exact)
          .agg(count(lit(1)).as(s"hits_$tag"))
          .crossJoin(broadcast(
            exact.agg(count(lit(1)).as(s"possible_$tag"))))
      audit(answerFiltered, exactFiltered, "filtered")
        .crossJoin(broadcast(audit(answerAll, exactAll, "all")))
        .select(lit(n).as("n_nodes"),
          col("possible_filtered"), col("hits_filtered"),
          (col("hits_filtered") / col("possible_filtered"))
            .as("recall_filtered"),
          col("possible_all"), col("hits_all"),
          (col("hits_all") / col("possible_all")).as("recall_all"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "s40_filtered_graph_search" -> {
      val rounds = (1 to Rounds).map(duckRound).mkString(",\n")
      val entryDraw = Tables.duckMd5Pack(
        "'s39_' || CAST(u AS VARCHAR) || '_' || CAST(j AS VARCHAR)")
      val hops = (1 to Hops).map { h =>
        s"""n$h AS (
           |  SELECT DISTINCT u, v FROM (
           |    SELECT f.u AS u, g.v AS v
           |    FROM f${h - 1} f JOIN gs g ON f.v = g.u
           |    UNION ALL SELECT u, v FROM f${h - 1})),
           |sn$h AS (
           |  SELECT c.u, c.v, ${cosSql("a", "b")} AS cos
           |  FROM n$h c JOIN e a ON a.vec_id = c.u
           |  JOIN e b ON b.vec_id = c.v),
           |f$h AS MATERIALIZED (
           |  SELECT u, v FROM (
           |    SELECT u, v, row_number() OVER (PARTITION BY u
           |      ORDER BY cos DESC, v) AS rank FROM sn$h)
           |  WHERE rank <= $Ef)""".stripMargin
      }.mkString(",\n")
      s"""WITH $duckInit,
         |$rounds,
         |gs AS MATERIALIZED (
         |  SELECT u, v FROM b$Rounds
         |  UNION SELECT v AS u, u AS v FROM b$Rounds),
         |lab AS (
         |  SELECT vec_id AS v, label FROM embeddings
         |  WHERE embedding IS NOT NULL),
         |entries AS (
         |  SELECT DISTINCT d.u, s.v FROM (
         |    SELECT u, $entryDraw % nn.n AS slot FROM (
         |      SELECT vec_id AS u, unnest(range(1, 9)) AS j FROM e
         |      WHERE vec_id < $Probes), nn) d
         |  JOIN slots s USING (slot)),
         |sf0 AS (
         |  SELECT c.u, c.v, ${cosSql("a", "b")} AS cos
         |  FROM entries c JOIN e a ON a.vec_id = c.u
         |  JOIN e b ON b.vec_id = c.v),
         |f0 AS MATERIALIZED (
         |  SELECT u, v FROM (
         |    SELECT u, v, row_number() OVER (PARTITION BY u
         |      ORDER BY cos DESC, v) AS rank FROM sf0)
         |  WHERE rank <= $Ef),
         |$hops,
         |sfin AS MATERIALIZED (
         |  SELECT c.u, c.v, ${cosSql("a", "b")} AS cos
         |  FROM f$Hops c JOIN e a ON a.vec_id = c.u
         |  JOIN e b ON b.vec_id = c.v
         |  WHERE c.u <> c.v),
         |ans_all AS (
         |  SELECT u, v FROM (
         |    SELECT u, v, row_number() OVER (PARTITION BY u
         |      ORDER BY cos DESC, v) AS rank FROM sfin)
         |  WHERE rank <= $K),
         |ans_f AS (
         |  SELECT u, v FROM (
         |    SELECT s.u, s.v, row_number() OVER (PARTITION BY s.u
         |      ORDER BY s.cos DESC, s.v) AS rank
         |    FROM sfin s JOIN lab ON lab.v = s.v
         |    WHERE $FilterSql)
         |  WHERE rank <= $K),
         |$duckExact,
         |sef AS (
         |  SELECT p.vec_id AS u, c.vec_id AS v, ${cosSql("p", "c")} AS cos
         |  FROM e p JOIN e c ON p.vec_id < $Probes
         |    AND p.vec_id <> c.vec_id
         |  JOIN lab ON lab.v = c.vec_id WHERE $FilterSql),
         |exf AS MATERIALIZED (
         |  SELECT u, v FROM (
         |    SELECT u, v, row_number() OVER (PARTITION BY u
         |      ORDER BY cos DESC, v) AS rank FROM sef)
         |  WHERE rank <= $K)
         |SELECT CAST(nn.n AS BIGINT) AS n_nodes,
         |  CAST((SELECT count(*) FROM exf) AS BIGINT)
         |    AS possible_filtered,
         |  CAST((SELECT count(*) FROM (
         |    SELECT * FROM ans_f INTERSECT SELECT * FROM exf))
         |    AS BIGINT) AS hits_filtered,
         |  (SELECT count(*) FROM (
         |    SELECT * FROM ans_f INTERSECT SELECT * FROM exf))
         |    / (SELECT count(*) FROM exf) AS recall_filtered,
         |  CAST((SELECT count(*) FROM ex) AS BIGINT) AS possible_all,
         |  CAST((SELECT count(*) FROM (
         |    SELECT * FROM ans_all INTERSECT SELECT * FROM ex))
         |    AS BIGINT) AS hits_all,
         |  (SELECT count(*) FROM (
         |    SELECT * FROM ans_all INTERSECT SELECT * FROM ex))
         |    / (SELECT count(*) FROM ex) AS recall_all
         |FROM nn""".stripMargin
    },
  )
}
