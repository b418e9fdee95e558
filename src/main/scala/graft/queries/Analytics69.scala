package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 76 (SURVEY.md §2.4):
  *
  *  - q227: parquet schema-evolution read — the mergeSchema path: two
  *    generations of the same dataset land with different columns
  *    (v1 carries `pri`, v2 adds `seg` and drops `pri`); one
  *    mergeSchema read unifies them into the superset schema with
  *    NULLs where a generation lacks the column. The oracle recomputes
  *    the union straight from the source table — a match proves the
  *    file-level merge lossless, NULL-filled, and type-stable. (q68
  *    pins frame-level drift union; this pins the READER-level merge.)
  */
object Analytics69 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q227_merge_schema" -> ((spark, dir) => {
      val c = t(spark, dir, "customer")
      val out = java.nio.file.Files
        .createTempDirectory("graft_mergeschema").toString
      c.filter(col("c_custkey") % 2 === 0)
        .select(col("c_custkey"), col("c_nationkey"),
          col("c_mktsegment").as("seg"))
        .write.mode("overwrite").parquet(s"$out/gen=2")
      c.filter(col("c_custkey") % 2 === 1)
        .select(col("c_custkey"), col("c_nationkey"),
          col("c_acctbal").cast("decimal(18,2)").as("bal"))
        .write.mode("overwrite").parquet(s"$out/gen=1")
      spark.read.option("mergeSchema", "true").parquet(out)
        .select(col("c_custkey"), col("c_nationkey"), col("seg"),
          col("bal").cast("double").as("bal"),
          col("gen").cast("int").as("gen"))
        .orderBy("c_custkey")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q227_merge_schema" ->
      """SELECT c_custkey, c_nationkey,
        |  CASE WHEN c_custkey % 2 = 0 THEN c_mktsegment END AS seg,
        |  CAST(CASE WHEN c_custkey % 2 = 1
        |    THEN CAST(c_acctbal AS DECIMAL(18,2)) END AS DOUBLE) AS bal,
        |  CAST(CASE WHEN c_custkey % 2 = 0 THEN 2 ELSE 1 END AS INTEGER)
        |    AS gen
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,
  )
}
