package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 116a (SURVEY.md §2.4):
  *
  *  - s32: k-means (Lloyd) over the leading 8 embedding dimensions —
  *    k=4, 3 unrolled iterations, deterministic throughout: inputs
  *    quantize to DECIMAL(12,8) (the s29 discipline), assignment
  *    distances are EXACT decimal arithmetic with a (d², cid) argmin
  *    tiebreak, and each centroid update re-quantizes the mean to
  *    DECIMAL(12,8) so both engines iterate over bit-identical state.
  *    Every step is one broadcast of the k-row centroid frame against
  *    the embedding scan plus one map-side-combinable aggregation —
  *    the textbook distributed Lloyd shape at any corpus size.
  *    Init = the k lowest vec_ids (deterministic seeding).
  */
object TextOps55 {
  import Tables.t

  private val D = 8
  private val K = 4
  private val Iters = 3

  private def xiSql(i: Int): String =
    s"CAST(round(CAST(embedding[$i] AS DOUBLE), 8) AS DECIMAL(12,8))"

  private val d2Sql: String =
    (0 until D).map(i => s"(x_$i - c_$i) * (x_$i - c_$i)").mkString(" + ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s32_kmeans" -> ((spark, dir) => {
      val emb = t(spark, dir, "embeddings")
        .filter(col("embedding").isNotNull)
        .select(col("vec_id") +:
          (0 until D).map(i => expr(xiSql(i)).as(s"x_$i")): _*)
        .localCheckpoint(true) // rescanned once per Lloyd iteration
      var cent: DataFrame = emb.filter(col("vec_id") < K)
        .select(col("vec_id").as("cid") +:
          (0 until D).map(i => col(s"x_$i").as(s"c_$i")): _*)
        .localCheckpoint(true)
      def assign(): DataFrame = {
        val aggs: Seq[Column] =
          Seq(graft.functions.TopKAgg.minK(
            struct(expr(d2Sql).as("d2"), col("cid")), 1).as("w")) ++
            (0 until D).map(i => max(col(s"x_$i")).as(s"x_$i"))
        emb.crossJoin(broadcast(cent))
          .groupBy("vec_id")
          .agg(aggs.head, aggs.tail: _*)
          .select(Seq(col("vec_id"), col("w")(0)("cid").as("cid"),
            col("w")(0)("d2").as("d2")) ++
            (0 until D).map(i => col(s"x_$i")): _*)
      }
      for (_ <- 1 to Iters) {
        val a = assign()
        cent = a.groupBy("cid")
          .agg(count(lit(1)).as("n"),
            (0 until D).map(i => sum(col(s"x_$i")).as(s"s_$i")): _*)
          .select(col("cid") +: (0 until D).map(i => expr(
            s"CAST(round(CAST(s_$i AS DOUBLE) / n, 8) AS DECIMAL(12,8))")
            .as(s"c_$i")): _*)
          .localCheckpoint(true) // k rows; truncates the iteration lineage
      }
      val fin = assign()
      fin.groupBy("cid")
        .agg(count(lit(1)).as("n_points"),
          round(sum(col("d2")).cast("double"), 6).as("inertia"))
        .join(broadcast(cent), "cid")
        .select(Seq(col("cid"), col("n_points"), col("inertia")) ++
          (0 until D).map(i =>
            round(col(s"c_$i").cast("double"), 6).as(s"c_$i")): _*)
        .orderBy("cid")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "s32_kmeans" -> {
      // DuckDB arrays are 1-based; Spark SQL arrays are 0-based.
      def xiDuck(i: Int): String =
        s"CAST(round(CAST(embedding[${i + 1}] AS DOUBLE), 8) AS DECIMAL(12,8))"
      val embCols = (0 until D).map(i => s"${xiDuck(i)} AS x_$i")
        .mkString(", ")
      def assignCte(a: String, c: String): String =
        s"""$a AS MATERIALIZED (
           |  SELECT * FROM (
           |    SELECT emb.*, $c.cid, $d2Sql AS d2,
           |      row_number() OVER (PARTITION BY vec_id
           |        ORDER BY $d2Sql, cid) AS rn
           |    FROM emb CROSS JOIN $c)
           |  WHERE rn = 1)""".stripMargin
      def centCte(c: String, a: String): String = {
        val means = (0 until D).map(i =>
          s"CAST(round(CAST(sum(x_$i) AS DOUBLE) / count(*), 8) " +
            s"AS DECIMAL(12,8)) AS c_$i").mkString(", ")
        s"$c AS MATERIALIZED (SELECT cid, $means FROM $a GROUP BY cid)"
      }
      val steps = (1 to Iters).map { it =>
        assignCte(s"a$it", s"c${it - 1}") + ",\n" +
          centCte(s"c$it", s"a$it")
      }.mkString(",\n")
      s"""
      WITH emb AS MATERIALIZED (
        SELECT vec_id, $embCols
        FROM embeddings WHERE embedding IS NOT NULL),
      c0 AS MATERIALIZED (
        SELECT vec_id AS cid, ${(0 until D)
          .map(i => s"x_$i AS c_$i").mkString(", ")}
        FROM emb WHERE vec_id < $K),
      $steps,
      ${assignCte("afin", s"c$Iters")}
      SELECT afin.cid, CAST(count(*) AS BIGINT) AS n_points,
        round(CAST(sum(d2) AS DOUBLE), 6) AS inertia,
        ${(0 until D)
          .map(i => s"round(CAST(max(c$Iters.c_$i) AS DOUBLE), 6) AS c_$i")
          .mkString(", ")}
      FROM afin JOIN c$Iters ON afin.cid = c$Iters.cid
      GROUP BY afin.cid
      ORDER BY afin.cid"""
    },
  )
}
