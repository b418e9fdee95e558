package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 56 (SURVEY.md §2.4):
  *
  *  - s22: IVF nprobe tuning curve — recall@5 against the exact s1
  *    ranking for nprobe ∈ {1, 2, 4, 8}, the table that prices the
  *    accuracy/latency dial of the s3 index (s18 does the same for
  *    the two-stage reranker's shortlist width). The centroid index
  *    is built ONCE and searched four times via `searchWith`, so the
  *    sweep costs one build plus four bounded routed searches; the
  *    oracle replays the full build+search per point with routing
  *    depth rn ≤ p.
  *  - t33: cross-language vocabulary overlap matrix — pairwise Jaccard
  *    of per-language vocabularies, the quick contamination signal
  *    for "is this 'French' shard actually English?". The vocab
  *    frames are vocabulary-bounded; the pair frame is |langs|²; all
  *    counts exact until the final Jaccard division.
  */
object TextOps28 {
  import Tables.t

  private val Probes = Seq(1, 2, 4, 8)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s22_nprobe_curve" -> ((spark, dir) => {
      val e = t(spark, dir, "embeddings")
      val probes = e.filter(col("vec_id") < 10)
      val cent = graft.operators.AnnIvf.buildCentroids(
        e, "vec_id", "embedding", nCentroids = 16, lloydIters = 1)
      val exact = TextOps.queries("s1_cosine_topk")(spark, dir)
        .select(col("probe_id"), col("cand_id")).persist()
      val exactN = exact.count()
      val rows = Probes.map { p =>
        val ivf = graft.operators.AnnIvf.searchWith(
            e, probes, "vec_id", "embedding", cent, k = 5, nProbe = p)
          .select(col("probe_id"), col("cand_id"))
        val hits = ivf.join(exact, Seq("probe_id", "cand_id"), "left_semi")
          .count()
        (p, hits, exactN,
          BigDecimal(hits.toDouble / exactN)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      exact.unpersist()
      import spark.implicits._
      rows.toDF("nprobe", "hits", "exact_pairs", "recall")
        .orderBy("nprobe")
    }),

    "t33_vocab_overlap" -> ((spark, dir) => {
      val vocab = t(spark, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
        .distinct()
      val sizes = vocab.groupBy("lang").agg(count(lit(1)).as("v"))
      val inter = vocab
        .join(vocab.select(col("lang").as("lang_b"), col("tok")), "tok")
        .filter(col("lang") < col("lang_b"))
        .groupBy(col("lang").as("lang_a"), col("lang_b"))
        .agg(count(lit(1)).as("n_shared"))
      inter
        .join(broadcast(sizes.select(col("lang").as("lang_a"),
          col("v").as("va"))), "lang_a")
        .join(broadcast(sizes.select(col("lang").as("lang_b"),
          col("v").as("vb"))), "lang_b")
        .select(col("lang_a"), col("lang_b"), col("n_shared"),
          round(col("n_shared").cast("double")
            / (col("va") + col("vb") - col("n_shared")).cast("double"), 6)
            .as("jaccard"))
        .orderBy("lang_a", "lang_b")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "s22_nprobe_curve" -> {
      val cosOf = (a: String, b: String) =>
        s"""list_dot_product($a, $b) /
           |      (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))""".stripMargin
      // full s3-style build+search replay, routing depth parameterized
      def ivfAt(p: Int) =
        s"""  SELECT probe_id, cand_id FROM (
           |    SELECT probe_id, cand_id,
           |      CAST(row_number() OVER (PARTITION BY probe_id
           |        ORDER BY cos DESC, cand_id) AS INTEGER) AS rank
           |    FROM (
           |      SELECT DISTINCT r.probe_id, l.cand_id,
           |        round(${cosOf("r.p_vec", "l.c_vec")}, 6) AS cos
           |      FROM (
           |        SELECT a.vec_id AS probe_id, a.centroid_id, v.emb AS p_vec
           |        FROM assigned a JOIN vecs v ON a.vec_id = v.vec_id
           |        WHERE a.rn <= $p AND a.vec_id < 10) r
           |      JOIN lists l ON r.centroid_id = l.centroid_id
           |      WHERE r.probe_id <> l.cand_id))
           |  WHERE rank <= 5""".stripMargin
      val arms = Probes.map(p =>
        s"""SELECT $p AS nprobe, CAST(count(*) AS BIGINT) AS hits FROM (
           |${ivfAt(p)}) iv
           |JOIN exact ON iv.probe_id = exact.probe_id
           |          AND iv.cand_id = exact.cand_id""".stripMargin)
        .mkString("\n  UNION ALL\n")
      s"""WITH vecs AS MATERIALIZED (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |cent AS MATERIALIZED (
         |  SELECT vec_id AS centroid_id, emb AS c_emb
         |  FROM vecs
         |  ORDER BY ${Tables.duckMd5Pack("CAST(vec_id AS VARCHAR)")} LIMIT 16),
         |assigned0 AS MATERIALIZED (
         |  SELECT v.vec_id, c.centroid_id,
         |    row_number() OVER (PARTITION BY v.vec_id
         |      ORDER BY ${cosOf("v.emb", "c.c_emb")} DESC, c.centroid_id) AS rn
         |  FROM vecs v CROSS JOIN cent c),
         |memc AS (
         |  SELECT a.centroid_id,
         |    unnest(range(1, len(v.emb) + 1)) AS pos,
         |    unnest(v.emb) AS comp
         |  FROM assigned0 a JOIN vecs v ON a.vec_id = v.vec_id
         |  WHERE a.rn = 1),
         |refined AS (
         |  SELECT centroid_id, pos,
         |    round(CAST(sum(CAST(comp AS DECIMAL(25,10))) AS DOUBLE)
         |      / count(*), 6) AS m
         |  FROM memc GROUP BY centroid_id, pos),
         |rcent AS MATERIALIZED (
         |  SELECT centroid_id, list(m ORDER BY pos) AS c_emb
         |  FROM refined GROUP BY centroid_id),
         |assigned AS MATERIALIZED (
         |  SELECT v.vec_id, c.centroid_id,
         |    row_number() OVER (PARTITION BY v.vec_id
         |      ORDER BY ${cosOf("v.emb", "c.c_emb")} DESC, c.centroid_id) AS rn
         |  FROM vecs v CROSS JOIN rcent c),
         |lists AS MATERIALIZED (
         |  SELECT a.vec_id AS cand_id, a.centroid_id, v.emb AS c_vec
         |  FROM assigned a JOIN vecs v ON a.vec_id = v.vec_id
         |  WHERE a.rn = 1),
         |exact AS MATERIALIZED (
         |  SELECT probe_id, cand_id
         |  FROM (${TextOps.oracleSql("s1_cosine_topk")}) t),
         |ex_n AS (SELECT CAST(count(*) AS BIGINT) AS exact_pairs FROM exact),
         |arms AS (
         |  ${arms.replace("\n", "\n  ")})
         |SELECT nprobe, hits, exact_pairs,
         |  round(CAST(hits AS DOUBLE) / CAST(exact_pairs AS DOUBLE), 6)
         |    AS recall
         |FROM arms CROSS JOIN ex_n
         |ORDER BY nprobe""".stripMargin
    },

    "t33_vocab_overlap" ->
      """WITH vocab AS (
        |  SELECT DISTINCT lang, unnest(string_split(text, ' ')) AS tok
        |  FROM documents WHERE text IS NOT NULL),
        |sizes AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS v
        |  FROM vocab GROUP BY 1),
        |inter AS (
        |  SELECT a.lang AS lang_a, b.lang AS lang_b,
        |    CAST(count(*) AS BIGINT) AS n_shared
        |  FROM vocab a JOIN vocab b ON a.tok = b.tok AND a.lang < b.lang
        |  GROUP BY 1, 2)
        |SELECT lang_a, lang_b, n_shared,
        |  round(CAST(n_shared AS DOUBLE)
        |    / CAST(sa.v + sb.v - n_shared AS DOUBLE), 6) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.lang = lang_a
        |JOIN sizes sb ON sb.lang = lang_b
        |ORDER BY lang_a, lang_b""".stripMargin,
  )
}
