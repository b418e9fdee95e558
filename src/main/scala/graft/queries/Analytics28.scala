package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 31 (SURVEY.md §2.4):
  *
  *  - q151: partitioned parquet WRITE + pruned read-back — the one sink
  *    shape the source/sink inventory was still missing (q55 covers
  *    ORC, q141 in-row CSV; this one exercises
  *    `write.partitionBy(...)`). Orders land in one directory per order
  *    year, the read-back filters a single year, and the scan prunes to
  *    that partition (the q51 audit checks pruning on driver-generated
  *    data; this proves the engine's OWN writer lays out prunable
  *    directories). The aggregate replays in the oracle straight from
  *    the unpartitioned table, so the round trip is value-checked, not
  *    just row-counted.
  *  - s15: within-label embedding diversity — the curation metric that
  *    tells corpus builders whether a labeled slice has collapsed to
  *    near-duplicates. The probe set is bounded (vec_id < 100, ≈10 per
  *    label), pairs join label-blocked and broadcast; per-pair cosines
  *    round →DECIMAL(9,6) BEFORE the per-label sum (cross-partition
  *    float sum order is unspecified), so the mean is one float op at
  *    the end. At corpus scale the bounded probe panel is the point:
  *    diversity is estimated from a fixed sample, not all pairs.
  */
object Analytics28 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q151_partitioned_write" -> ((spark, dir) => {
      val scratch = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_q151",
        java.nio.file.Paths.get(dir).getFileName.toString).toString
      t(spark, dir, "orders")
        .withColumn("o_year", year(col("o_orderdate")))
        .write.mode("overwrite").partitionBy("o_year").parquet(scratch)
      spark.read.parquet(scratch)
        .filter(col("o_year") === 1995)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          sum((col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("decimal(18,0)")).cast("long")
            .as("rev_cents"))
        .orderBy("o_orderpriority")
    }),

    "s15_embed_diversity" -> ((spark, dir) => {
      val e = t(spark, dir, "embeddings").filter(col("vec_id") < 100)
      val a = e.select(col("vec_id").as("a_id"), col("label"),
        col("embedding").as("ea"))
      val b = e.select(col("vec_id").as("b_id"), col("label").as("lb"),
        col("embedding").as("eb"))
      val pairs = a.join(broadcast(b),
          col("label") === col("lb") && col("a_id") < col("b_id"))
        .select(col("label"),
          round(graft.functions.VectorOps.cosine(col("ea"), col("eb")), 6)
            .cast("decimal(9,6)").as("cos"))
      pairs.groupBy(col("label"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("cos")).cast("decimal(38,6)").as("sum_cos"))
        .select(col("label"), col("n_pairs"),
          round(col("sum_cos").cast("double") /
            col("n_pairs").cast("double"), 6).as("avg_cos"))
        .orderBy("label")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q151_partitioned_write" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |    AS DECIMAL(18,0))) AS BIGINT) AS rev_cents
        |FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1995
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "s15_embed_diversity" ->
      """WITH e AS (
        |  SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |  FROM embeddings WHERE vec_id < 100),
        |pairs AS (
        |  SELECT a.label,
        |    CAST(round(list_dot_product(a.emb, b.emb) /
        |      (sqrt(list_dot_product(a.emb, a.emb))
        |        * sqrt(list_dot_product(b.emb, b.emb))), 6)
        |      AS DECIMAL(9,6)) AS cos
        |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
        |SELECT label, CAST(count(*) AS BIGINT) AS n_pairs,
        |  round(CAST(CAST(sum(cos) AS DECIMAL(38,6)) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE), 6) AS avg_cos
        |FROM pairs GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
