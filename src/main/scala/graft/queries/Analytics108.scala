package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 125 (SURVEY.md §2.4):
  *
  *  - q291: trade gravity model — the econometrics workhorse: regress
  *    ln(flow) on ln(mass_u·mass_v) and ln(d²) over the condensed
  *    nation-pair frame (fact scan collapses to ≤ nations² rows
  *    FIRST). Distances come from the portable md5 grid coordinates
  *    (the q270 construction); the two-regressor OLS solves the 3×3
  *    normal equations in closed form (Cramer's rule) from moments
  *    accumulated with the q267 discipline — cross-products in IEEE
  *    doubles over exact rounded-DECIMAL logs, each term
  *    rounded→DECIMAL(28,9) before the order-free sums — so both
  *    engines see bit-identical matrices; the determinant arithmetic
  *    is identically-rendered double math. Outputs the mass and
  *    distance elasticities, intercept, and R².
  */
object Analytics108 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q291_gravity" -> ((spark, dir) => {
      def coord(salt: String, key: org.apache.spark.sql.Column) =
        graft.functions.Md5Pack(concat(lit(salt), key.cast("string"))) % 10000L
      val flows = t(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(t(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(spark, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(t(spark, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("s_nationkey").as("u"), col("c_nationkey").as("v"))
        .agg(count(lit(1)).as("flow"))
        .filter(col("u") =!= col("v"))
        .localCheckpoint(true) // masses + the pair regression frame
      val mass = flows.select(col("u").as("n"), col("flow"))
        .union(flows.select(col("v"), col("flow")))
        .groupBy("n").agg(sum(col("flow")).as("m"))
      val pts = flows
        .join(broadcast(mass.select(col("n").as("u"), col("m").as("mu"))),
          "u")
        .join(broadcast(mass.select(col("n").as("v"), col("m").as("mv"))),
          "v")
        .withColumn("ux", coord("nat_x_", col("u")))
        .withColumn("uy", coord("nat_y_", col("u")))
        .withColumn("vx", coord("nat_x_", col("v")))
        .withColumn("vy", coord("nat_y_", col("v")))
        .withColumn("d2", greatest(
          (col("ux") - col("vx")) * (col("ux") - col("vx"))
            + (col("uy") - col("vy")) * (col("uy") - col("vy")), lit(1L)))
        .select(
          expr("cast(round(ln(cast(flow as double)), 9) as decimal(18,9))")
            .as("y"),
          expr("""cast(round(ln(cast(mu as double) * mv), 9)
                 |  as decimal(18,9))""".stripMargin).as("lm"),
          expr("cast(round(ln(cast(d2 as double)), 9) as decimal(18,9))")
            .as("ld"))
      def cross(a: String, b: String): org.apache.spark.sql.Column =
        expr(s"cast(round(cast($a as double) * $b, 9) as decimal(28,9))")
      val m = pts.agg(
        count(lit(1)).as("n"),
        sum(col("lm")).as("slm"), sum(col("ld")).as("sld"),
        sum(col("y")).as("sy"),
        sum(cross("lm", "lm")).as("slmlm"),
        sum(cross("lm", "ld")).as("slmld"),
        sum(cross("ld", "ld")).as("sldld"),
        sum(cross("lm", "y")).as("slmy"),
        sum(cross("ld", "y")).as("sldy"),
        sum(cross("y", "y")).as("syy"))
      // Cramer's rule on the 3×3 normal equations, identically-rendered
      // double arithmetic in both engines.
      val det =
        """(cast(n as double) * (cast(slmlm as double) * cast(sldld as double)
          |    - cast(slmld as double) * cast(slmld as double))
          | - cast(slm as double) * (cast(slm as double) * cast(sldld as double)
          |    - cast(slmld as double) * cast(sld as double))
          | + cast(sld as double) * (cast(slm as double) * cast(slmld as double)
          |    - cast(slmlm as double) * cast(sld as double)))""".stripMargin
      val d0 =
        """(cast(sy as double) * (cast(slmlm as double) * cast(sldld as double)
          |    - cast(slmld as double) * cast(slmld as double))
          | - cast(slm as double) * (cast(slmy as double) * cast(sldld as double)
          |    - cast(slmld as double) * cast(sldy as double))
          | + cast(sld as double) * (cast(slmy as double) * cast(slmld as double)
          |    - cast(slmlm as double) * cast(sldy as double)))""".stripMargin
      val d1 =
        """(cast(n as double) * (cast(slmy as double) * cast(sldld as double)
          |    - cast(slmld as double) * cast(sldy as double))
          | - cast(sy as double) * (cast(slm as double) * cast(sldld as double)
          |    - cast(slmld as double) * cast(sld as double))
          | + cast(sld as double) * (cast(slm as double) * cast(sldy as double)
          |    - cast(slmy as double) * cast(sld as double)))""".stripMargin
      val d2c =
        """(cast(n as double) * (cast(slmlm as double) * cast(sldy as double)
          |    - cast(slmy as double) * cast(slmld as double))
          | - cast(slm as double) * (cast(slm as double) * cast(sldy as double)
          |    - cast(slmy as double) * cast(sld as double))
          | + cast(sy as double) * (cast(slm as double) * cast(slmld as double)
          |    - cast(slmlm as double) * cast(sld as double)))""".stripMargin
      m.select(col("n"),
          expr(s"$d0 / $det").as("b0"),
          expr(s"$d1 / $det").as("b1"),
          expr(s"$d2c / $det").as("b2"),
          col("sy"), col("slmy"), col("sldy"), col("syy"))
        .select(col("n"),
          round(col("b1"), 6).as("mass_elasticity"),
          round(col("b2"), 6).as("distance_elasticity"),
          round(col("b0"), 6).as("intercept"),
          round(expr(
            """1.0 - (cast(syy as double)
              |   - (b0 * cast(sy as double) + b1 * cast(slmy as double)
              |      + b2 * cast(sldy as double)))
              | / (cast(syy as double)
              |   - cast(sy as double) * cast(sy as double) / n)"""
              .stripMargin), 6).as("r2"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q291_gravity" -> {
      def coord(salt: String, key: String) =
        s"(${Tables.duckMd5Pack(s"'$salt' || CAST($key AS VARCHAR)")} % 10000)"
      def cross(a: String, b: String) =
        s"CAST(round(CAST($a AS DOUBLE) * $b, 9) AS DECIMAL(28,9))"
      val det =
        """(CAST(n AS DOUBLE) * (CAST(slmlm AS DOUBLE) * CAST(sldld AS DOUBLE)
          |    - CAST(slmld AS DOUBLE) * CAST(slmld AS DOUBLE))
          | - CAST(slm AS DOUBLE) * (CAST(slm AS DOUBLE) * CAST(sldld AS DOUBLE)
          |    - CAST(slmld AS DOUBLE) * CAST(sld AS DOUBLE))
          | + CAST(sld AS DOUBLE) * (CAST(slm AS DOUBLE) * CAST(slmld AS DOUBLE)
          |    - CAST(slmlm AS DOUBLE) * CAST(sld AS DOUBLE)))""".stripMargin
      val d0 =
        """(CAST(sy AS DOUBLE) * (CAST(slmlm AS DOUBLE) * CAST(sldld AS DOUBLE)
          |    - CAST(slmld AS DOUBLE) * CAST(slmld AS DOUBLE))
          | - CAST(slm AS DOUBLE) * (CAST(slmy AS DOUBLE) * CAST(sldld AS DOUBLE)
          |    - CAST(slmld AS DOUBLE) * CAST(sldy AS DOUBLE))
          | + CAST(sld AS DOUBLE) * (CAST(slmy AS DOUBLE) * CAST(slmld AS DOUBLE)
          |    - CAST(slmlm AS DOUBLE) * CAST(sldy AS DOUBLE)))""".stripMargin
      val d1 =
        """(CAST(n AS DOUBLE) * (CAST(slmy AS DOUBLE) * CAST(sldld AS DOUBLE)
          |    - CAST(slmld AS DOUBLE) * CAST(sldy AS DOUBLE))
          | - CAST(sy AS DOUBLE) * (CAST(slm AS DOUBLE) * CAST(sldld AS DOUBLE)
          |    - CAST(slmld AS DOUBLE) * CAST(sld AS DOUBLE))
          | + CAST(sld AS DOUBLE) * (CAST(slm AS DOUBLE) * CAST(sldy AS DOUBLE)
          |    - CAST(slmy AS DOUBLE) * CAST(sld AS DOUBLE)))""".stripMargin
      val d2c =
        """(CAST(n AS DOUBLE) * (CAST(slmlm AS DOUBLE) * CAST(sldy AS DOUBLE)
          |    - CAST(slmy AS DOUBLE) * CAST(slmld AS DOUBLE))
          | - CAST(slm AS DOUBLE) * (CAST(slm AS DOUBLE) * CAST(sldy AS DOUBLE)
          |    - CAST(slmy AS DOUBLE) * CAST(sld AS DOUBLE))
          | + CAST(sy AS DOUBLE) * (CAST(slm AS DOUBLE) * CAST(slmld AS DOUBLE)
          |    - CAST(slmlm AS DOUBLE) * CAST(sld AS DOUBLE)))""".stripMargin
      s"""
      WITH flows AS (
        SELECT s_nationkey AS u, c_nationkey AS v,
          CAST(count(*) AS BIGINT) AS flow
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        WHERE s_nationkey <> c_nationkey
        GROUP BY 1, 2),
      mass AS (
        SELECT n, CAST(sum(flow) AS BIGINT) AS m FROM (
          SELECT u AS n, flow FROM flows
          UNION ALL SELECT v AS n, flow FROM flows)
        GROUP BY n),
      pts AS (
        SELECT
          CAST(round(ln(CAST(flow AS DOUBLE)), 9) AS DECIMAL(18,9)) AS y,
          CAST(round(ln(CAST(mu.m AS DOUBLE) * mv.m), 9)
            AS DECIMAL(18,9)) AS lm,
          CAST(round(ln(CAST(greatest(
            (${coord("nat_x_", "u")} - ${coord("nat_x_", "v")})
              * (${coord("nat_x_", "u")} - ${coord("nat_x_", "v")})
            + (${coord("nat_y_", "u")} - ${coord("nat_y_", "v")})
              * (${coord("nat_y_", "u")} - ${coord("nat_y_", "v")}), 1)
            AS DOUBLE)), 9) AS DECIMAL(18,9)) AS ld
        FROM flows
        JOIN mass mu ON flows.u = mu.n
        JOIN mass mv ON flows.v = mv.n),
      m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
          sum(lm) AS slm, sum(ld) AS sld, sum(y) AS sy,
          sum(${cross("lm", "lm")}) AS slmlm,
          sum(${cross("lm", "ld")}) AS slmld,
          sum(${cross("ld", "ld")}) AS sldld,
          sum(${cross("lm", "y")}) AS slmy,
          sum(${cross("ld", "y")}) AS sldy,
          sum(${cross("y", "y")}) AS syy
        FROM pts),
      sol AS (
        SELECT n, sy, slmy, sldy, syy,
          $d0 / $det AS b0, $d1 / $det AS b1, $d2c / $det AS b2
        FROM m)
      SELECT n,
        round(b1, 6) AS mass_elasticity,
        round(b2, 6) AS distance_elasticity,
        round(b0, 6) AS intercept,
        round(1.0 - (CAST(syy AS DOUBLE)
            - (b0 * CAST(sy AS DOUBLE) + b1 * CAST(slmy AS DOUBLE)
               + b2 * CAST(sldy AS DOUBLE)))
          / (CAST(syy AS DOUBLE)
            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n), 6) AS r2
      FROM sol"""
    },
  )
}
