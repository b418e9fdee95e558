package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 141 (SURVEY.md §2.4):
  *
  *  - q316: Allen interval-algebra census — each order's fulfillment
  *    interval [orderdate, last shipdate] is compared with the
  *    customer's NEXT order (lag window inside customer-bounded
  *    groups, one shuffle on custkey) and classified into the 13
  *    Allen relations via a canonical CASE (equality cases first).
  *    The temporal-reasoning primitive behind overlap audits — a
  *    corpus-wide profile of how consecutive orders interleave.
  *
  *  - q317: linearly-weighted Cohen's kappa over the q295 raters —
  *    the ordinal-agreement version (the size buckets are ordered, so
  *    off-by-one disagreement should cost half, not all). Weights
  *    2·w ∈ {2,1,0} keep observed agreement integral and expected
  *    agreement in DECIMAL(38,0); kappa is one double at the end.
  */
object Analytics120 {
  import Tables.t

  private val AllenCase = """
    case
      when a_s = b_s and a_e = b_e then 'equals'
      when a_s = b_s and a_e < b_e then 'starts'
      when a_s = b_s and a_e > b_e then 'started_by'
      when a_e = b_e and a_s > b_s then 'finishes'
      when a_e = b_e and a_s < b_s then 'finished_by'
      when a_e = b_s then 'meets'
      when b_e = a_s then 'met_by'
      when a_e < b_s then 'precedes'
      when b_e < a_s then 'preceded_by'
      when a_s < b_s and a_e > b_s and a_e < b_e then 'overlaps'
      when b_s < a_s and b_e > a_s and b_e < a_e then 'overlapped_by'
      when a_s < b_s and a_e > b_e then 'contains'
      else 'during' end"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q316_allen_relations" -> ((spark, dir) => {
      val iv = t(spark, dir, "orders")
        .join(t(spark, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey").as("ck"), col("o_orderkey").as("ok"),
          col("o_orderdate").as("s"))
        .agg(max(col("l_shipdate")).as("e"))
      val w = Window.partitionBy("ck").orderBy(col("s"), col("ok"))
      val pairs = iv
        .withColumn("b_s", lead(col("s"), 1).over(w))
        .withColumn("b_e", lead(col("e"), 1).over(w))
        .filter(col("b_s").isNotNull)
        .select(col("s").as("a_s"), col("e").as("a_e"),
          col("b_s"), col("b_e"))
      pairs.select(expr(AllenCase).as("relation"))
        .groupBy("relation").agg(count(lit(1)).as("n_pairs"))
        .orderBy("relation")
    }),

    "q317_weighted_kappa" -> ((spark, dir) => {
      val base = t(spark, dir, "documents")
        .filter(col("text").isNotNull && col("n_chars").isNotNull)
        .select(
          when(col("n_chars") < 200, 0).when(col("n_chars") < 380, 1)
            .otherwise(2).as("ra"),
          when(size(split(col("text"), " ")) < 35, 0)
            .when(size(split(col("text"), " ")) < 70, 1)
            .otherwise(2).as("rb"))
      val cells = base.groupBy("ra", "rb").agg(count(lit(1)).as("nij"))
      val tot = cells.agg(sum(col("nij")).as("n"),
        sum(col("nij") * (lit(2) - abs(col("ra") - col("rb")))).as("po2"))
      val pe = cells.groupBy("ra").agg(sum(col("nij")).as("ri"))
        .crossJoin(cells.groupBy("rb").agg(sum(col("nij")).as("cj")))
        .agg(sum(expr(
          "cast(ri * cj as decimal(38,0)) * (2 - abs(ra - rb))"))
          .as("pe2"))
      tot.crossJoin(pe).selectExpr("n", "po2",
          """round(po2 / (2.0d * n), 6) as po_w""",
          """round(cast(pe2 as double) / (2.0d * n * n), 6) as pe_w""",
          """round((po2 / (2.0d * n) - cast(pe2 as double) / (2.0d * n * n))
            | / (1.0d - cast(pe2 as double) / (2.0d * n * n)), 6)
            | as kappa_w""".stripMargin)
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q316_allen_relations" -> s"""
      WITH iv AS (
        SELECT o_custkey AS ck, o_orderkey AS ok, o_orderdate AS s,
          max(l_shipdate) AS e
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY 1, 2, 3),
      pairs AS (
        SELECT s AS a_s, e AS a_e,
          lead(s) OVER w AS b_s, lead(e) OVER w AS b_e
        FROM iv
        WINDOW w AS (PARTITION BY ck ORDER BY s, ok))
      SELECT ($AllenCase) AS relation, CAST(count(*) AS BIGINT) AS n_pairs
      FROM pairs WHERE b_s IS NOT NULL
      GROUP BY 1 ORDER BY relation""",

    "q317_weighted_kappa" -> """
      WITH base AS (
        SELECT
          CASE WHEN n_chars < 200 THEN 0 WHEN n_chars < 380 THEN 1
            ELSE 2 END AS ra,
          CASE WHEN len(string_split(text, ' ')) < 35 THEN 0
            WHEN len(string_split(text, ' ')) < 70 THEN 1
            ELSE 2 END AS rb
        FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL),
      cells AS (
        SELECT ra, rb, CAST(count(*) AS BIGINT) AS nij
        FROM base GROUP BY ra, rb),
      tot AS (
        SELECT CAST(sum(nij) AS BIGINT) AS n,
          CAST(sum(nij * (2 - abs(ra - rb))) AS BIGINT) AS po2
        FROM cells),
      pe AS (
        SELECT sum(CAST(ri * cj AS DECIMAL(38,0)) * (2 - abs(r.ra - c.rb)))
          AS pe2
        FROM (SELECT ra, CAST(sum(nij) AS BIGINT) AS ri FROM cells
              GROUP BY ra) r
        CROSS JOIN (SELECT rb, CAST(sum(nij) AS BIGINT) AS cj FROM cells
              GROUP BY rb) c)
      SELECT n, po2,
        round(po2 / (2.0 * n), 6) AS po_w,
        round(CAST(pe2 AS DOUBLE) / (2.0 * n * n), 6) AS pe_w,
        round((po2 / (2.0 * n) - CAST(pe2 AS DOUBLE) / (2.0 * n * n))
          / (1.0 - CAST(pe2 AS DOUBLE) / (2.0 * n * n)), 6) AS kappa_w
      FROM tot CROSS JOIN pe""",
  )
}
