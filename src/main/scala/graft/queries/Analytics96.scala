package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 113 (SURVEY.md §2.4):
  *
  *  - q269: association rules (apriori support/confidence/lift) over
  *    order "baskets" of part brands — the market-basket classic. The
  *    pair step is a self-join of the order→brand incidence frame ON
  *    THE ORDER KEY: baskets are bounded (≤ 7 lineitems in TPC-H), so
  *    the per-key quadratic stays constant-sized at any corpus scale —
  *    never an item×item cross join. Counts stay exact integers; the
  *    support threshold is an integer cross-multiplication; only the
  *    final confidence/lift ratios are rounded doubles.
  *  - q270: grid-blocked spatial radius join — customers and suppliers
  *    get deterministic md5-derived integer coordinates on a
  *    10000×10000 grid; "suppliers within distance R of each customer"
  *    resolves by bucketing both sides into R-sized cells, exploding
  *    the supplier side to its 3×3 neighbor cells, equi-joining on the
  *    cell id, and verifying with the EXACT integer dx²+dy² ≤ R²
  *    predicate. The 9-cell candidate set bounds each probe regardless
  *    of corpus size — the all-pairs oracle exists only because the
  *    test tables are small.
  */
object Analytics96 {
  import Tables.t

  /** Radius and (equal) grid cell size for q270. */
  private val R = 600L

  /** Deterministic grid coordinate in [0, 10000): md5 of a salted key
    * rendering, reduced by the portable 62-bit pack. Same construction
    * DuckDB replays via [[Tables.duckMd5Pack]].
    */
  private def coord(salt: String, key: org.apache.spark.sql.Column) =
    graft.functions.Md5Pack(concat(lit(salt), key.cast("string"))) % 10000L

  private def duckCoord(salt: String, key: String) =
    s"(${Tables.duckMd5Pack(s"'$salt' || CAST($key AS VARCHAR)")} % 10000)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q269_assoc_rules" -> ((spark, dir) => {
      // Order→brand incidence, deduplicated: one row per (order, brand).
      val bi = t(spark, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey"))
        .join(broadcast(t(spark, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("ok"), col("p_brand").as("brand"))
        .distinct()
        .localCheckpoint(true) // feeds pairs, margins, and the N scan
      val nb = bi.agg(countDistinct(col("ok")).as("n_baskets"))
      val item = bi.groupBy("brand").agg(count(lit(1)).as("cnt"))
      // Canonical co-occurrence pairs via the keyed self-join (bounded
      // per basket), then both rule directions from one pair frame.
      val ab = bi.as("x").join(bi.as("y"),
          col("x.ok") === col("y.ok") && col("x.brand") < col("y.brand"))
        .groupBy(col("x.brand").as("a"), col("y.brand").as("b"))
        .agg(count(lit(1)).as("n_ab"))
      val rules = ab.select(col("a").as("ante"), col("b").as("cons"), col("n_ab"))
        .union(ab.select(col("b"), col("a"), col("n_ab")))
      rules
        .join(broadcast(item.select(col("brand").as("ante"),
          col("cnt").as("n_ante"))), "ante")
        .join(broadcast(item.select(col("brand").as("cons"),
          col("cnt").as("n_cons"))), "cons")
        .crossJoin(broadcast(nb))
        // support >= 2%: exact integers, no float threshold.
        .filter(col("n_ab") * 50 >= col("n_baskets"))
        .select(col("ante"), col("cons"), col("n_ab"),
          round(col("n_ab").cast("double") / col("n_baskets"), 6)
            .as("support"),
          round(col("n_ab").cast("double") / col("n_ante"), 6)
            .as("confidence"),
          round(col("n_ab").cast("double") * col("n_baskets")
            / (col("n_ante").cast("double") * col("n_cons")), 6).as("lift"))
        .orderBy("ante", "cons")
    }),

    "q270_radius_join" -> ((spark, dir) => {
      val cust = t(spark, dir, "customer").select(col("c_custkey"))
        .withColumn("x", coord("pt_x_", col("c_custkey")))
        .withColumn("y", coord("pt_y_", col("c_custkey")))
      val supp = t(spark, dir, "supplier").select(col("s_suppkey"))
        .withColumn("x", coord("pt_x_", col("s_suppkey")))
        .withColumn("y", coord("pt_y_", col("s_suppkey")))
      // Customer probes sit in ONE cell; the supplier build side fans
      // out to its 3×3 neighborhood so every within-R pair shares a
      // cell key. Explode-by-9 on the smaller side, equi-join, exact
      // integer verify — no distance computation outside candidates.
      val probes = cust
        .withColumn("cx", expr(s"x div $R")).withColumn("cy", expr(s"y div $R"))
      val builds = supp
        .select(col("s_suppkey"), col("x").as("sx"), col("y").as("sy"),
          explode(sequence(expr(s"x div $R") - 1, expr(s"x div $R") + 1))
            .as("cx"))
        .select(col("s_suppkey"), col("sx"), col("sy"), col("cx"),
          explode(sequence(expr(s"sy div $R") - 1, expr(s"sy div $R") + 1))
            .as("cy"))
      probes.join(builds, Seq("cx", "cy"))
        .withColumn("dx", col("x") - col("sx"))
        .withColumn("dy", col("y") - col("sy"))
        .filter(col("dx") * col("dx") + col("dy") * col("dy") <= R * R)
        .groupBy("c_custkey")
        .agg(count(lit(1)).as("n_within"),
          min(col("dx") * col("dx") + col("dy") * col("dy")).as("min_d2"))
        .orderBy("c_custkey")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q269_assoc_rules" -> """
      WITH bi AS (
        SELECT DISTINCT l_orderkey AS ok, p_brand AS brand
        FROM lineitem JOIN part ON l_partkey = p_partkey),
      nb AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_baskets FROM bi),
      item AS (
        SELECT brand, CAST(count(*) AS BIGINT) AS cnt FROM bi GROUP BY 1),
      ab AS (
        SELECT x.brand AS a, y.brand AS b, CAST(count(*) AS BIGINT) AS n_ab
        FROM bi x JOIN bi y ON x.ok = y.ok AND x.brand < y.brand
        GROUP BY 1, 2),
      rules AS (
        SELECT a AS ante, b AS cons, n_ab FROM ab
        UNION ALL
        SELECT b AS ante, a AS cons, n_ab FROM ab)
      SELECT ante, cons, n_ab,
        round(CAST(n_ab AS DOUBLE) / n_baskets, 6) AS support,
        round(CAST(n_ab AS DOUBLE) / ia.cnt, 6) AS confidence,
        round(CAST(n_ab AS DOUBLE) * n_baskets
          / (CAST(ia.cnt AS DOUBLE) * ic.cnt), 6) AS lift
      FROM rules
      JOIN item ia ON rules.ante = ia.brand
      JOIN item ic ON rules.cons = ic.brand, nb
      WHERE n_ab * 50 >= n_baskets
      ORDER BY ante, cons""",

    "q270_radius_join" -> s"""
      WITH cust AS (
        SELECT c_custkey,
          ${duckCoord("pt_x_", "c_custkey")} AS x,
          ${duckCoord("pt_y_", "c_custkey")} AS y
        FROM customer),
      supp AS (
        SELECT s_suppkey,
          ${duckCoord("pt_x_", "s_suppkey")} AS sx,
          ${duckCoord("pt_y_", "s_suppkey")} AS sy
        FROM supplier)
      SELECT c_custkey, CAST(count(*) AS BIGINT) AS n_within,
        min((x - sx) * (x - sx) + (y - sy) * (y - sy)) AS min_d2
      FROM cust JOIN supp
        ON (x - sx) * (x - sx) + (y - sy) * (y - sy) <= ${R * R}
      GROUP BY c_custkey
      ORDER BY c_custkey""",
  )
}
