package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 98 (SURVEY.md §2.4):
  *
  *  - q254: assortment-overlap matrix — pairwise Jaccard similarity of
  *    the part assortments supplied by each nation: |A∩B| comes from a
  *    per-part co-occurrence explode (each part contributes its
  *    nation-pair combinations — bounded by nations-per-part, never a
  *    nation×nation×part cross), |A| and |B| from one distinct count
  *    each, the ratio exact until the final rounding. The category-
  *    management twin of d2's document Jaccard, shaped for the
  *    dimension side.
  */
object Analytics88 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q254_assortment_jaccard" -> ((spark, dir) => {
      val sup = broadcast(t(spark, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey")))
      val np = t(spark, dir, "lineitem")
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .select(col("s_nationkey").as("nk"), col("l_partkey").as("pk"))
        .distinct()
      val sizes = np.groupBy("nk").agg(count(lit(1)).as("sz"))
      val a = np.select(col("nk").as("n1"), col("pk"))
      val b = np.select(col("nk").as("n2"), col("pk"))
      val inter = a.join(b, Seq("pk")).filter(col("n1") < col("n2"))
        .groupBy("n1", "n2").agg(count(lit(1)).as("n_common"))
      inter
        .join(broadcast(sizes.select(col("nk").as("n1"),
          col("sz").as("sz1"))), "n1")
        .join(broadcast(sizes.select(col("nk").as("n2"),
          col("sz").as("sz2"))), "n2")
        .select(col("n1"), col("n2"), col("n_common"), col("sz1"),
          col("sz2"),
          round(col("n_common").cast("double")
            / (col("sz1") + col("sz2") - col("n_common")).cast("double"),
            6).as("jaccard"))
        .orderBy("n1", "n2")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q254_assortment_jaccard" ->
      """WITH np AS (
        |  SELECT DISTINCT s_nationkey AS nk, l_partkey AS pk
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey),
        |sizes AS (SELECT nk, CAST(count(*) AS BIGINT) AS sz
        |          FROM np GROUP BY 1),
        |inter AS (
        |  SELECT a.nk AS n1, b.nk AS n2, CAST(count(*) AS BIGINT)
        |    AS n_common
        |  FROM np a JOIN np b ON a.pk = b.pk AND a.nk < b.nk
        |  GROUP BY 1, 2)
        |SELECT n1, n2, n_common, s1.sz AS sz1, s2.sz AS sz2,
        |  round(CAST(n_common AS DOUBLE)
        |    / (s1.sz + s2.sz - n_common), 6) AS jaccard
        |FROM inter JOIN sizes s1 ON n1 = s1.nk
        |JOIN sizes s2 ON n2 = s2.nk
        |ORDER BY n1, n2""".stripMargin,
  )
}
