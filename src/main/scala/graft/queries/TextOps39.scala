package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 76 retrieval ops (SURVEY.md §2.4):
  *
  *  - s27: int8 scalar quantization audit — the 4× vector-memory
  *    compression serving stacks run before anything fancier: each
  *    embedding quantizes to int8 with a per-vector scale
  *    (max|x|/127), and the audit reports the reconstruction RMS
  *    error and the cosine between original and dequantized vector.
  *    Everything is per-row expression work (transform/aggregate HOFs
  *    + the codegen'd CosineSim/L2Sq kernels) — map-only at any
  *    corpus size. round() on the quantized values is the pinned
  *    HALF_UP (q199), so both engines produce identical codes.
  */
object TextOps39 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s27_int8_quantization" -> ((spark, dir) => {
      val xd = graft.functions.VectorOps.toDouble(col("embedding"))
      val e = t(spark, dir, "embeddings")
        .select(col("vec_id"), xd.as("xd"))
        .withColumn("mx", expr("aggregate(xd, 0D, (a, v) -> greatest(a, abs(v)))"))
        .filter(col("mx") > 0)
        .withColumn("scale", col("mx") / 127.0)
        .withColumn("dq", expr(
          "transform(xd, v -> greatest(least(round(v / scale), 127D), -127D) * scale)"))
      e.select(col("vec_id"),
          round(col("scale"), 9).as("scale_r"),
          round(sqrt(graft.functions.GraftFunctions.l2Sq(col("xd"), col("dq"))
            / 64.0), 6).as("rms_err"),
          round(graft.functions.GraftFunctions.cosineSim(col("xd"), col("dq")),
            6).as("cos_orig_dq"))
        .orderBy("vec_id")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "s27_int8_quantization" ->
      """WITH e AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xd
        |  FROM embeddings),
        |m AS (
        |  SELECT vec_id, xd,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(xd, v -> abs(v))), (a, v) -> greatest(a, v))
        |      AS mx
        |  FROM e),
        |q AS (
        |  SELECT vec_id, xd, mx / 127.0 AS scale,
        |    list_transform(xd, v -> greatest(least(round(v / (mx / 127.0)),
        |      127.0), -127.0) * (mx / 127.0)) AS dq
        |  FROM m WHERE mx > 0)
        |SELECT vec_id,
        |  round(scale, 9) AS scale_r,
        |  round(sqrt((list_dot_product(xd, xd)
        |    - 2.0 * list_dot_product(xd, dq)
        |    + list_dot_product(dq, dq)) / 64.0), 6) AS rms_err,
        |  round(list_dot_product(xd, dq)
        |    / (sqrt(list_dot_product(xd, xd))
        |      * sqrt(list_dot_product(dq, dq))), 6) AS cos_orig_dq
        |FROM q ORDER BY vec_id""".stripMargin,
  )
}
