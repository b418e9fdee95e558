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

  /** As-of (forward) join: for each left row, the single EARLIEST right
    * row with the same keys and right.time >= left.time — the mirror of
    * [[asofBackward]], same single-shuffle merge formulation, with the
    * window frame looking forward instead of back. At equal timestamps
    * the left row sorts first (so `>=` is inclusive); ties among right
    * rows at the same (key, time) are broken by `rightTiebreak`
    * (LOWEST wins — the mirror of backward's highest-wins, both meaning
    * "the first row the scan direction reaches").
    */
  def asofForward(
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
    val tiebreak: Column = rightTiebreak.map { tb =>
      right.schema(tb).dataType match {
        case _: org.apache.spark.sql.types.TimestampType => unix_micros(col(tb))
        case _ => col(tb).cast("long")
      }
    }.getOrElse(lit(0L))
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

    // left (side 1) sorts BEFORE right (side 0) at equal time, so a right
    // row at exactly left.time is inside the forward-looking frame
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), col("_side").desc, col("_tb"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    rSide.withColumn("_l_payload",
        lit(null).cast(lSide.schema("_l_payload").dataType))
      .unionByName(lSide)
      .withColumn("_match", first(col("_r_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(lPayloadCols.map(c => col(s"_l_payload.$c").as(c)) ++
        rightPayload.map(p => col(s"_match.$p").as(s"$outPrefix$p")) :+
        col(s"_match.$rightTime").as(s"$outPrefix$rightTime"): _*)
  }

  /** Nearest-neighbor as-of: each left row matched to the time-closest
    * right row in EITHER direction; equal distances prefer the backward
    * match (a row exactly at left.time counts as backward with distance
    * zero). Composes the two directional passes — two shuffles on the
    * same keys (AQE reuses the exchange where it can); the direction of
    * the chosen match lands in `<outPrefix>dir` as
    * backward/forward/none.
    */
  def asofNearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      rightTiebreak: Option[String] = None,
      outPrefix: String = "asof_",
  ): DataFrame = {
    val b = asofBackward(left, right, keys, leftTime, rightTime,
      rightPayload, rightTiebreak, "_nb_")
    val f = asofForward(b, right, keys, leftTime, rightTime,
      rightPayload, rightTiebreak, "_nf_")
    val bT = col(s"_nb_$rightTime")
    val fT = col(s"_nf_$rightTime")
    val lT = col(leftTime).cast("timestamp")
    val useB = fT.isNull || (bT.isNotNull &&
      (unix_micros(lT) - unix_micros(bT)) <= (unix_micros(fT) - unix_micros(lT)))
    val outPayload = (rightPayload :+ rightTime).distinct.map { p =>
      when(useB, col(s"_nb_$p")).otherwise(col(s"_nf_$p"))
        .as(s"$outPrefix$p")
    }
    val dir = when(bT.isNull && fT.isNull, lit("none"))
      .when(useB, lit("backward")).otherwise(lit("forward"))
      .as(s"${outPrefix}dir")
    f.select(left.columns.map(col).toSeq ++ outPayload :+ dir: _*)
  }
}
