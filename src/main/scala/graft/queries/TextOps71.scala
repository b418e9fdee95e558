package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 additions, batch 71 (SURVEY.md §2.4):
  *
  *  - t59: Kneser–Ney bigram perplexity — one rung above t15's
  *    interpolated LM on the smoothing ladder: absolute discounting
  *    (D = 0.75) with the CONTINUATION unigram distribution
  *    (how many contexts a word completes, not how often it occurs) —
  *    the device that makes "Francisco" unlikely outside "San".
  *    p_KN(w2|w1) = max(c(w1,w2) − D, 0)/c(w1)
  *                + D·N1+(w1,·)/c(w1) · N1+(·,w2)/|bigram types|.
  *    Same shape as t15: count frames broadcast to the event stream,
  *    per-event NLL rounded once into DECIMAL, per-doc order-free sums.
  *  - d56: MinHash CONTAINMENT scoring — asymmetric near-dup for
  *    doc-in-doc duplication (quotes, boilerplate embedding, partial
  *    scrapes) where Jaccard under-fires: for d4's candidate pairs,
  *    exact |A∩B|/|A| and |A∩B|/|B| from shingle-set semi-joins,
  *    flagged when containment ≥ 0.8 despite Jaccard < 0.7 — the pairs
  *    a Jaccard-only pipeline would wrongly keep. Bounded to the
  *    candidate pairs; shingle frames shuffle once on the shingle key.
  */
object TextOps71 {
  import Tables.t

  private val D = 0.75

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t59_kneser_ney_nll" -> ((spark, dir) => {
      val tok = t(spark, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), col("pos"), col("col").as("term"))
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val events = tok
        .select(col("doc_id"), col("term").as("w1"),
          lead(col("term"), 1).over(w).as("w2"))
        .filter(col("w2").isNotNull)
      val bi = events.groupBy("w1", "w2").agg(count(lit(1)).as("cnt_b"))
        .localCheckpoint(true) // feeds ctx, fanouts, types, and the join
      val ctx = bi.groupBy("w1").agg(sum(col("cnt_b")).cast("long")
        .as("ctx"), count(lit(1)).as("fanout"))
      val cont = bi.groupBy("w2").agg(count(lit(1)).as("n_ctx"))
      val types = bi.agg(count(lit(1)).as("n_types"))
      val p = greatest(col("cnt_b").cast("double") - lit(D), lit(0.0))
        ./(col("ctx")) +
        lit(D) * col("fanout") / col("ctx") *
          (col("n_ctx").cast("double") / col("n_types"))
      events
        .join(broadcast(bi), Seq("w1", "w2"))
        .join(broadcast(ctx), "w1")
        .join(broadcast(cont), "w2")
        .crossJoin(broadcast(types))
        .withColumn("nll", round(-log(p), 8).cast("decimal(20,8)"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          round(sum(col("nll")).cast("double") / count(lit(1)), 6)
            .as("avg_nll"))
        .orderBy("doc_id")
    }),

    "d56_containment_pairs" -> ((spark, dir) => {
      val pairs = TextOps.queries("d4_minhash_pairs")(spark, dir)
        .select(col("a_id"), col("b_id"))
        .localCheckpoint(true)
      // shingles ride as 8-byte Md5Pack hashes through the distinct,
      // the checkpoint, and both pair-expansion joins (8x cheaper than
      // UTF8String elements, 2^-62 collision caveat — see PPJoin);
      // only counts ever reach the output
      val sh = t(spark, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          explode(graft.functions.Md5PackArr(
            graft.functions.ShinglesOf(split(col("text"), " "), 3)))
            .as("sg"))
        .distinct()
        .localCheckpoint(true) // both sides of the pair expansion
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sg"))
      val inter = pairs
        .join(sh.select(col("doc_id").as("a_id"), col("sg")), "a_id")
        .join(sh.select(col("doc_id").as("b_id"),
          col("sg").as("sg_b")), "b_id")
        .filter(col("sg") === col("sg_b"))
        .groupBy("a_id", "b_id").agg(count(lit(1)).as("n_inter"))
      pairs
        .join(inter, Seq("a_id", "b_id"), "left")
        .withColumn("n_inter", coalesce(col("n_inter"), lit(0L)))
        .join(sizes.select(col("doc_id").as("a_id"),
          col("n_sg").as("n_a")), "a_id")
        .join(sizes.select(col("doc_id").as("b_id"),
          col("n_sg").as("n_b")), "b_id")
        .select(col("a_id"), col("b_id"), col("n_a"), col("n_b"),
          col("n_inter"),
          (col("n_inter").cast("double") /
            (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
            .as("jaccard"),
          (col("n_inter").cast("double") /
            least(col("n_a"), col("n_b")).cast("double"))
            .as("containment"))
        .withColumn("asymmetric_dup",
          col("containment") >= 0.8 && col("jaccard") < 0.7)
        .orderBy("a_id", "b_id")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "t59_kneser_ney_nll" ->
      s"""WITH tok AS (
         |  SELECT doc_id, pos - 1 AS pos, term FROM (
         |    SELECT doc_id,
         |      unnest(string_split(text, ' ')) AS term,
         |      generate_subscripts(string_split(text, ' '), 1) AS pos
         |    FROM documents WHERE text IS NOT NULL)),
         |events AS (
         |  SELECT doc_id, term AS w1,
         |    lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
         |  FROM tok QUALIFY w2 IS NOT NULL),
         |bi AS MATERIALIZED (
         |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS cnt_b
         |  FROM events GROUP BY 1, 2),
         |ctx AS (
         |  SELECT w1, CAST(sum(cnt_b) AS BIGINT) AS ctx,
         |    CAST(count(*) AS BIGINT) AS fanout
         |  FROM bi GROUP BY 1),
         |cont AS (
         |  SELECT w2, CAST(count(*) AS BIGINT) AS n_ctx FROM bi
         |  GROUP BY 1),
         |ty AS (SELECT CAST(count(*) AS BIGINT) AS n_types FROM bi),
         |ev AS (
         |  SELECT e.doc_id,
         |    CAST(round(-ln(
         |      greatest(CAST(cnt_b AS DOUBLE) - $D, 0.0) / ctx
         |      + $D * fanout / ctx
         |        * (CAST(n_ctx AS DOUBLE) / n_types)), 8)
         |      AS DECIMAL(20,8)) AS nll
         |  FROM events e
         |  JOIN bi USING (w1, w2)
         |  JOIN ctx USING (w1)
         |  JOIN cont USING (w2)
         |  CROSS JOIN ty)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  round(CAST(sum(nll) AS DOUBLE) / count(*), 6) AS avg_nll
         |FROM ev GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "d56_containment_pairs" -> {
      val d4 = TextOps.oracleSql("d4_minhash_pairs")
      s"""WITH pairs AS MATERIALIZED ($d4),
         |sh2 AS MATERIALIZED (
         |  SELECT doc_id, list_distinct(list_transform(range(len(tk)-2),
         |    i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3])) AS sh
         |  FROM (SELECT doc_id, string_split(text, ' ') AS tk
         |        FROM documents WHERE text IS NOT NULL))
         |SELECT a_id, b_id,
         |  CAST(len(sa.sh) AS BIGINT) AS n_a,
         |  CAST(len(sb.sh) AS BIGINT) AS n_b,
         |  CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT) AS n_inter,
         |  CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
         |    / CAST(len(sa.sh) + len(sb.sh)
         |      - len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) AS jaccard,
         |  CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
         |    / CAST(least(len(sa.sh), len(sb.sh)) AS DOUBLE)
         |    AS containment,
         |  (CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
         |    / CAST(least(len(sa.sh), len(sb.sh)) AS DOUBLE) >= 0.8
         |   AND CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
         |    / CAST(len(sa.sh) + len(sb.sh)
         |      - len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) < 0.7)
         |    AS asymmetric_dup
         |FROM pairs
         |JOIN sh2 sa ON a_id = sa.doc_id
         |JOIN sh2 sb ON b_id = sb.doc_id
         |ORDER BY a_id, b_id""".stripMargin
    },
  )
}
