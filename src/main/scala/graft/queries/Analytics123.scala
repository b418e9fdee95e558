package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 145 (SURVEY.md §2.4):
  *
  *  - q322: Benjamini–Hochberg FDR control over 25 per-brand
  *    two-proportion z-tests (brand return rate vs the rest). p-values
  *    need Φ, which neither engine ships — both sides evaluate the
  *    SAME Abramowitz–Stegun 7.1.26 erf polynomial (max err 1.5e-7)
  *    in plain arithmetic, then round once to DECIMAL(18,9), so the
  *    BH ranking is bit-identical. The multiple-testing step ranks 25
  *    rows (brand-bounded window); the corpus-scale work is one
  *    counting aggregate.
  *
  *  - q323: entropy rate of the per-user event-type Markov chain —
  *    H = −Σ_ij (c_ij/c_tot)·log₂(c_ij/c_i). Transition counts come
  *    from one lag window inside user-bounded groups; the 25 cell
  *    terms round once to DECIMAL(18,9) and sum exactly.
  */
object Analytics123 {
  import Tables.t

  private def pTwoSidedSql(z: String): String = StatSql.pTwoSidedSql(z)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q322_fdr_bh" -> ((spark, dir) => {
      val li = t(spark, dir, "lineitem")
        .join(broadcast(t(spark, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_brand").as("brand"),
          (col("l_returnflag") === "R").cast("long").as("r"))
      val per = li.groupBy("brand")
        .agg(count(lit(1)).as("na"), sum(col("r")).as("xa"))
      val tot = per.agg(sum(col("na")).as("n"), sum(col("xa")).as("x"))
      val z = per.crossJoin(broadcast(tot)).withColumn("zval", expr(
        """cast(round(
          |  (xa / cast(na as double) - (x - xa) / cast(n - na as double))
          |  / sqrt((x / cast(n as double)) * (1.0d - x / cast(n as double))
          |    * (1.0d / na + 1.0d / (n - na))), 6)
          |  as decimal(18,6))""".stripMargin))
      val p = z.withColumn("pval", expr(
        s"cast(round(${pTwoSidedSql("cast(zval as double)")}, 9) " +
          "as decimal(18,9))"))
      val ranked = p
        .withColumn("rnk",
          row_number().over(Window.orderBy(col("pval"), col("brand"))))
        .crossJoin(broadcast(per.agg(count(lit(1)).as("m"))))
        .withColumn("bh_cut", expr(
          "cast(round(rnk * 0.10d / m, 9) as decimal(18,9))"))
      // BH: discoveries = rank ≤ max rank with p ≤ rank·q/m
      val kmax = ranked.filter(col("pval") <= col("bh_cut"))
        .agg(coalesce(max(col("rnk")), lit(0)).as("kmax"))
      ranked.crossJoin(broadcast(kmax))
        .select(col("brand"), col("zval").cast("double").as("z"),
          col("pval").cast("double").as("p"), col("rnk"),
          col("bh_cut").cast("double").as("bh_cut"),
          (col("rnk") <= col("kmax")).as("discovered"))
        .orderBy("rnk")
    }),

    "q323_markov_entropy_rate" -> ((spark, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"),
        col("event_id"))
      val trans = Tables.events(spark, dir)
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type").as("s"))
        .withColumn("nxt", lead(col("s"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .groupBy("s", "nxt").agg(count(lit(1)).as("c"))
      val rowTot = trans.groupBy("s").agg(sum(col("c")).as("ci"))
      val tot = trans.agg(sum(col("c")).as("ct"))
      trans.join(broadcast(rowTot), "s").crossJoin(broadcast(tot))
        .select(expr(
          """cast(round(-(c / cast(ct as double))
            |  * log2(c / cast(ci as double)), 9)
            |  as decimal(18,9))""".stripMargin).as("term"))
        .agg(sum(col("term")).as("h"))
        .crossJoin(broadcast(tot))
        .selectExpr("ct as n_transitions",
          "round(cast(h as double), 6) as entropy_rate_bits")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q322_fdr_bh" -> {
      // same polynomial, minus Spark's `d` double-literal suffixes
      val pSql = pTwoSidedSql("CAST(zval AS DOUBLE)")
        .replaceAll("""(\d)d\b""", "$1")
      s"""
      WITH li AS (
        SELECT p_brand AS brand,
          CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS r
        FROM lineitem JOIN part ON l_partkey = p_partkey),
      per AS (
        SELECT brand, CAST(count(*) AS BIGINT) AS na,
          CAST(sum(r) AS BIGINT) AS xa
        FROM li GROUP BY brand),
      tot AS (
        SELECT CAST(sum(na) AS BIGINT) AS n, CAST(sum(xa) AS BIGINT) AS x
        FROM per),
      m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM per),
      z AS (
        SELECT brand,
          CAST(round(
            (xa / CAST(na AS DOUBLE) - (x - xa) / CAST(n - na AS DOUBLE))
            / sqrt((x / CAST(n AS DOUBLE)) * (1.0 - x / CAST(n AS DOUBLE))
              * (1.0 / na + 1.0 / (n - na))), 6) AS DECIMAL(18,6)) AS zval
        FROM per CROSS JOIN tot),
      p AS (
        SELECT brand, zval,
          CAST(round($pSql, 9) AS DECIMAL(18,9)) AS pval
        FROM z),
      ranked AS (
        SELECT brand, zval, pval,
          row_number() OVER (ORDER BY pval, brand) AS rnk,
          CAST(round(row_number() OVER (ORDER BY pval, brand)
            * 0.10 / m, 9) AS DECIMAL(18,9)) AS bh_cut
        FROM p CROSS JOIN m),
      kmax AS (
        SELECT coalesce(max(rnk), 0) AS kmax FROM ranked
        WHERE pval <= bh_cut)
      SELECT brand, CAST(zval AS DOUBLE) AS z, CAST(pval AS DOUBLE) AS p,
        CAST(rnk AS INTEGER) AS rnk, CAST(bh_cut AS DOUBLE) AS bh_cut,
        rnk <= kmax AS discovered
      FROM ranked CROSS JOIN kmax
      ORDER BY rnk"""
    },

    "q323_markov_entropy_rate" -> """
      WITH trans AS (
        SELECT s, nxt, CAST(count(*) AS BIGINT) AS c
        FROM (
          SELECT event_type AS s,
            lead(event_type) OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS nxt
          FROM events) x
        WHERE nxt IS NOT NULL
        GROUP BY s, nxt),
      rowtot AS (SELECT s, CAST(sum(c) AS BIGINT) AS ci FROM trans
                 GROUP BY s),
      tot AS (SELECT CAST(sum(c) AS BIGINT) AS ct FROM trans),
      ent AS (
        SELECT sum(CAST(round(-(c / CAST(ct AS DOUBLE))
            * log2(c / CAST(ci AS DOUBLE)), 9) AS DECIMAL(18,9))) AS h
        FROM trans JOIN rowtot ON trans.s = rowtot.s
        CROSS JOIN tot)
      SELECT ct AS n_transitions,
        round(CAST(h AS DOUBLE), 6) AS entropy_rate_bits
      FROM ent CROSS JOIN tot""",
  )
}
