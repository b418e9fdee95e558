package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 148 (SURVEY.md §2.4 text):
  *
  *  - t56: Burrows' Delta — the classic stylometric distance between
  *    SOURCES: relative frequencies of the corpus's top-20 words,
  *    z-scored per word across sources, Delta(a,b) = mean |z_a − z_b|.
  *    The attribution primitive for "did these two crawls come from
  *    the same generator?". Corpus-scale work is one token count;
  *    everything after lives on the (sources × 20-word) frame.
  *    Round-once discipline: relative frequencies and z-scores become
  *    decimals before any cross-source arithmetic, so both engines
  *    sum identical values.
  */
object TextOps63 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t56_burrows_delta" -> ((spark, dir) => {
      val toks = t(spark, dir, "documents").filter(col("text").isNotNull)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
      val top = toks.groupBy("w").agg(count(lit(1)).as("cw"))
        .orderBy(col("cw").desc, col("w")).limit(20)
        .select(col("w"))
      val srcTot = toks.groupBy("source").agg(count(lit(1)).as("nt"))
      // frequencies as exact integer parts-per-billion (floor div): the
      // z quotient then carries an IRRATIONAL sqrt factor, so round(z,6)
      // cannot land on a cross-engine half-boundary (rounded rational
      // quotients did, and Spark and DuckDB round double halves
      // differently)
      val f = toks.join(broadcast(top), "w")
        .groupBy("source", "w").agg(count(lit(1)).as("c"))
        .join(srcTot, "source")
        .select(col("source"), col("w"),
          expr("(c * 1000000000L) div nt").as("fppb"))
      val stats = f.groupBy("w").agg(count(lit(1)).as("ns"),
        sum(col("fppb")).as("sf"),
        sum(expr("cast(fppb as decimal(38,0)) * fppb")).as("sff"))
      val z = f.join(broadcast(stats), "w")
        .select(col("source"), col("w"), expr(
          """cast(round((ns * fppb - sf)
            |  * sqrt((ns - 1.0d) / (cast(ns as double)
            |     * (ns * cast(sff as double) - cast(sf as double) * sf))),
            |  6) as decimal(18,6))""".stripMargin).as("z"))
      val pairs = z.select(col("source").as("s_a"), col("w"),
          col("z").as("za"))
        .join(z.select(col("source").as("s_b"), col("w").as("wb"),
          col("z").as("zb")),
          col("w") === col("wb") && col("s_a") < col("s_b"))
        .groupBy("s_a", "s_b")
        .agg(count(lit(1)).as("n_words"), sum(abs(col("za") - col("zb")))
          .as("sdz"))
      // Σ|Δz| is an EXACT 6-dp decimal — emitted as-is (the classic
      // Delta divides by the word count, a constant 20 here; dividing
      // then rounding hit a double half-boundary across engines)
      pairs.select(col("s_a"), col("s_b"), col("n_words"),
          col("sdz").cast("double").as("delta_sum"))
        .orderBy("s_a", "s_b")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "t56_burrows_delta" -> """
      WITH toks AS (
        SELECT source, unnest(string_split(text, ' ')) AS w
        FROM documents WHERE text IS NOT NULL),
      top AS (
        SELECT w FROM (
          SELECT w, CAST(count(*) AS BIGINT) AS cw FROM toks GROUP BY w)
        ORDER BY cw DESC, w LIMIT 20),
      srctot AS (
        SELECT source, CAST(count(*) AS BIGINT) AS nt FROM toks
        GROUP BY source),
      f AS (
        SELECT c.source, c.w, (c.c * 1000000000) // nt AS fppb
        FROM (SELECT source, toks.w, CAST(count(*) AS BIGINT) AS c
              FROM toks JOIN top ON toks.w = top.w
              GROUP BY source, toks.w) c
        JOIN srctot ON c.source = srctot.source),
      stats AS (
        SELECT w, CAST(count(*) AS BIGINT) AS ns,
          CAST(sum(fppb) AS BIGINT) AS sf,
          sum(CAST(fppb AS DECIMAL(38,0)) * fppb) AS sff
        FROM f GROUP BY w),
      z AS (
        SELECT source, f.w,
          CAST(round((ns * fppb - sf)
            * sqrt((ns - 1.0) / (CAST(ns AS DOUBLE)
               * (ns * CAST(sff AS DOUBLE) - CAST(sf AS DOUBLE) * sf))),
            6) AS DECIMAL(18,6)) AS z
        FROM f JOIN stats ON f.w = stats.w)
      SELECT a.source AS s_a, b.source AS s_b,
        CAST(count(*) AS BIGINT) AS n_words,
        CAST(sum(abs(a.z - b.z)) AS DOUBLE) AS delta_sum
      FROM z a JOIN z b ON a.w = b.w AND a.source < b.source
      GROUP BY a.source, b.source
      ORDER BY s_a, s_b""",
  )
}
