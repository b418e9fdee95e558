package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 119a (SURVEY.md §2.4):
  *
  *  - q281: item–item collaborative filtering — cosine similarity on
  *    the binary order×brand incidence matrix, the classic recommender
  *    primitive. Co-occurrence counts come from the basket-bounded
  *    order-key self-join (the q269 discipline — never an item×item
  *    cross join over users), sim = cooc/√(cₐ·c_b) in deterministic
  *    IEEE arithmetic over exact integers, and each brand's top-3
  *    neighbors come from the bounded min-k aggregate (sim desc,
  *    neighbor asc tiebreak) — no per-brand sort.
  */
object Analytics102 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q281_item_cf" -> ((spark, dir) => {
      val bi = t(spark, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey"))
        .join(broadcast(t(spark, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("ok"), col("p_brand").as("brand"))
        .distinct()
        .localCheckpoint(true) // margins + the pair self-join
      val item = bi.groupBy("brand").agg(count(lit(1)).as("cnt"))
      val ab = bi.as("x").join(bi.as("y"),
          col("x.ok") === col("y.ok") && col("x.brand") < col("y.brand"))
        .groupBy(col("x.brand").as("a"), col("y.brand").as("b"))
        .agg(count(lit(1)).as("cooc"))
      val sym = ab.select(col("a"), col("b"), col("cooc"))
        .union(ab.select(col("b"), col("a"), col("cooc")))
      val scored = sym
        .join(broadcast(item.select(col("brand").as("a"),
          col("cnt").as("ca"))), "a")
        .join(broadcast(item.select(col("brand").as("b"),
          col("cnt").as("cb"))), "b")
        .select(col("a"), col("b"), col("cooc"),
          (col("cooc").cast("double")
            / sqrt(col("ca").cast("double") * col("cb"))).as("sim"))
      scored.groupBy("a")
        .agg(graft.functions.TopKAgg.minK(
          struct((-col("sim")).as("ns"), col("b"), col("cooc"),
            col("sim")), 3).as("w"))
        .select(col("a").as("brand"),
          posexplode(col("w")).as(Seq("rank0", "p")))
        .select(col("brand"), (col("rank0") + 1).as("rank"),
          col("p")("b").as("neighbor"), col("p")("cooc").as("cooc"),
          round(col("p")("sim"), 6).as("sim"))
        .orderBy("brand", "rank")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q281_item_cf" -> """
      WITH bi AS (
        SELECT DISTINCT l_orderkey AS ok, p_brand AS brand
        FROM lineitem JOIN part ON l_partkey = p_partkey),
      item AS (
        SELECT brand, CAST(count(*) AS BIGINT) AS cnt FROM bi GROUP BY 1),
      ab AS (
        SELECT x.brand AS a, y.brand AS b, CAST(count(*) AS BIGINT) AS cooc
        FROM bi x JOIN bi y ON x.ok = y.ok AND x.brand < y.brand
        GROUP BY 1, 2),
      sym AS (
        SELECT a, b, cooc FROM ab
        UNION ALL SELECT b, a, cooc FROM ab),
      scored AS (
        SELECT a, b, cooc,
          CAST(cooc AS DOUBLE) / sqrt(CAST(ia.cnt AS DOUBLE) * ib.cnt)
            AS sim
        FROM sym
        JOIN item ia ON sym.a = ia.brand
        JOIN item ib ON sym.b = ib.brand),
      ranked AS (
        SELECT a, b, cooc, sim,
          row_number() OVER (PARTITION BY a ORDER BY sim DESC, b) AS rank
        FROM scored)
      SELECT a AS brand, CAST(rank AS INTEGER) AS rank, b AS neighbor,
        cooc, round(sim, 6) AS sim
      FROM ranked WHERE rank <= 3
      ORDER BY brand, rank""",
  )
}
