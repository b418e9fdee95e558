package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for each left row, the single latest right row
  * with the same keys and right.time <= left.time — the point-in-time
  * lookup Spark has no built-in operator for.
  *
  * Implementation is the scalable merge formulation, composed from
  * built-ins (preference (a) of the custom-operator ladder): tag and union
  * both sides, ONE shuffle on the join keys, then a single ordered window
  * pass carrying the last-seen right payload forward to each left row. No
  * range cross-join, no per-key state explosion; skew behaves like any
  * keyed window. At equal timestamps the right row sorts first, so `<=` is
  * inclusive; ties among right rows at the same (key, time) are broken by
  * `rightTiebreak` (highest wins) to keep results deterministic.
  */
object AsOfJoin {

  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      rightTiebreak: Option[String] = None,
      outPrefix: String = "asof_",
  ): DataFrame = {
    val rPayloadCols = (rightPayload :+ rightTime).distinct
    val lPayloadCols = left.columns.toSeq
    rightTiebreak.foreach { tb =>
      import org.apache.spark.sql.types._
      val ok = right.schema(tb).dataType match {
        case ByteType | ShortType | IntegerType | LongType | TimestampType => true
        case _ => false
      }
      require(ok,
        s"rightTiebreak '$tb' must be integral/timestamp for deterministic " +
          s"ordering, got ${right.schema(tb).dataType.catalogString}")
    }
    // Timestamp tiebreaks order by unix_micros, not cast("long"): the cast
    // truncates to whole seconds, which would collide sub-second-distinct
    // right rows and break the 'highest wins' determinism guarantee.
    val tiebreak: Column = rightTiebreak.map { tb =>
      right.schema(tb).dataType match {
        case _: org.apache.spark.sql.types.TimestampType => unix_micros(col(tb))
        case _ => col(tb).cast("long")
      }
    }.getOrElse(lit(0L))

    // A right row with a null time has no defined position on the as-of
    // axis; it must not become anyone's match (nulls sort first and
    // last(ignoreNulls) would otherwise carry its payload forward).
    val rightValid = right.filter(col(rightTime).isNotNull)

    val rSide = rightValid.select(
      keys.map(col) ++ Seq(
        col(rightTime).cast("timestamp").as("_t"),
        lit(0).as("_side"),
        tiebreak.as("_tb"),
        struct(rPayloadCols.map(col): _*).as("_r_payload")): _*)
    val lSide = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).cast("timestamp").as("_t"),
        lit(1).as("_side"),
        lit(0L).as("_tb"),
        lit(null).cast(rSide.schema("_r_payload").dataType).as("_r_payload"),
        struct(lPayloadCols.map(col): _*).as("_l_payload")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), col("_side"), col("_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    rSide.withColumn("_l_payload",
        lit(null).cast(lSide.schema("_l_payload").dataType))
      .unionByName(lSide)
      .withColumn("_match", last(col("_r_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(lPayloadCols.map(c => col(s"_l_payload.$c").as(c)) ++
        rightPayload.map(p => col(s"_match.$p").as(s"$outPrefix$p")) :+
        col(s"_match.$rightTime").as(s"$outPrefix$rightTime"): _*)
  }
}
