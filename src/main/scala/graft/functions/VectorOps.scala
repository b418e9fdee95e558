package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from Spark's
  * higher-order functions (zip_with/aggregate) so everything stays inside
  * Catalyst — no UDF serialization on the hot path.
  *
  * Fold order is sequential (index 0..n-1), matching DuckDB's
  * list_dot_product for oracle parity.
  */
object VectorOps {

  /** Element-wise promote to double (float math drifts across engines). */
  def toDouble(c: Column): Column = transform(c, x => x.cast("double"))

  def dot(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)

  def norm(x: Column): Column = sqrt(dot(x, x))

  /** Cosine similarity of two float-array columns — the codegen'd one-pass
    * [[CosineSim]] expression (same sequential accumulation order as the
    * HOF formulation [[cosineHof]], so results are bit-identical).
    */
  def cosine(a: Column, b: Column): Column = GraftFunctions.cosineSim(a, b)

  /** Higher-order-function formulation, kept as the reference semantics. */
  def cosineHof(a: Column, b: Column): Column = {
    val (da, db) = (toDouble(a), toDouble(b))
    dot(da, db) / (norm(da) * norm(db))
  }
}
