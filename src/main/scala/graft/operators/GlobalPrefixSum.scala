package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global running total (prefix sum / scan) — the primitive
  * behind corpus layout jobs: sequence packing (token stream offsets),
  * shard manifests (cumulative bytes per output file), curriculum
  * ordering (cumulative quality mass).
  *
  * A naive `SUM(x) OVER (ORDER BY k)` window has an empty PARTITION BY,
  * so Spark plans a SINGLE-task window — the whole corpus sorts through
  * one thread (the q38-style anti-pattern at 100 TB). This operator is
  * the classic two-phase scan instead:
  *
  *  1. range-repartition by the order key (each partition holds a
  *     contiguous key range; range partition ids are ordered),
  *  2. per-partition running totals via a window PARTITIONED by the
  *     range-partition id — every task scans only its own slice,
  *  3. per-partition totals (one row per partition — bounded by the
  *     partition count, not the data) prefix-summed into starting
  *     offsets on the tiny frame and broadcast-joined back.
  *
  * The per-partition-total aggregation reuses the range exchange
  * (ReusedExchange), so the input shuffles exactly once. Equal order
  * keys land in one range partition, preserving the SQL default RANGE
  * frame semantics (ties aggregate together) — identical to the
  * single-window formulation an oracle runs.
  */
object GlobalPrefixSum {

  /** Adds `cumCol` = running total of `valCol` in ascending `orderCol`
    * order (SQL `SUM(valCol) OVER (ORDER BY orderCol)` semantics,
    * default RANGE frame: rows with equal keys share the total).
    *
    * @param partitions scan width; defaults to the session's shuffle
    *                   partition count
    */
  def withRunningTotal(df: DataFrame, orderCol: String, valCol: String,
      cumCol: String, partitions: Int = 0): DataFrame =
    withRunningTotalBy(df, col(orderCol), valCol, cumCol, partitions)

  /** As [[withRunningTotal]] but over an arbitrary order EXPRESSION —
    * e.g. `struct(-score, id)` for a descending-score curriculum order
    * with a unique tiebreak. The expression must totally order the rows
    * (ties share the running total, per RANGE frame semantics).
    */
  def withRunningTotalBy(df: DataFrame, orderExpr: Column, valCol: String,
      cumCol: String, partitions: Int = 0): DataFrame =
    withRunningTotalsBy(df, orderExpr, Seq(valCol -> cumCol), partitions)

  /** As [[withRunningTotalBy]] but accumulating SEVERAL value columns in
    * one scan (`valCols` maps each input column to its running-total
    * output). The range exchange, the per-partition totals frame, and
    * the broadcast offsets are all shared — a two-EDF statistic (e.g.
    * the Cramér–von Mises cum_A/cum_B pair) costs one shuffle instead
    * of one per column, and the plan tree stays flat instead of nesting
    * one scan's lineage inside the next.
    */
  def withRunningTotalsBy(df: DataFrame, orderExpr: Column,
      valCols: Seq[(String, String)], partitions: Int = 0): DataFrame = {
    require(valCols.nonEmpty, "withRunningTotalsBy: no value columns")
    val n =
      if (partitions > 0) partitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // persist + eager count: `ranged` feeds BOTH the totals branch and
    // the main branch. Without the barrier each branch re-executes the
    // repartitionByRange, and RangePartitioner's sampling seed differs
    // per execution (it derives from the RDD id) — the two executions
    // can draw DIFFERENT range boundaries, so the offsets describe a
    // partitioning the main branch doesn't have. Small frames rarely
    // diverge (few candidate boundaries); at ~60k rows the drift is
    // reliably observable. The d4/s12 persist-once pattern pins one
    // materialization for both consumers.
    val ranged = df.withColumn("_gps_key", orderExpr)
      .repartitionByRange(n, col("_gps_key"))
      .withColumn("_gps_pid", spark_partition_id())
      .persist()
    ranged.count()
    // Starting offset per partition: totals are one row per partition
    // (constant-size at any corpus scale), so the offset prefix-walk on
    // the tiny frame — and its broadcast back — never grows with data.
    val sums = valCols.zipWithIndex.map { case ((v, _), i) =>
      sum(col(v)).as(s"_gps_psum_$i")
    }
    val totals = ranged.groupBy("_gps_pid").agg(sums.head, sums.tail: _*)
    val wOff = Window.orderBy("_gps_pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = valCols.indices
      .foldLeft(totals) { (t, i) =>
        t.withColumn(s"_gps_off_$i",
          coalesce(sum(col(s"_gps_psum_$i")).over(wOff), lit(0L)))
      }
      .select(col("_gps_pid") +:
        valCols.indices.map(i => col(s"_gps_off_$i")): _*)
    val wIn = Window.partitionBy("_gps_pid").orderBy("_gps_key")
    val withCums = valCols.zipWithIndex
      .foldLeft(ranged.join(broadcast(offsets), "_gps_pid")) {
        case (d, ((v, c), i)) =>
          d.withColumn(c,
            sum(col(v)).over(wIn) + col(s"_gps_off_$i"))
      }
    withCums.drop("_gps_pid" +: "_gps_key" +:
      valCols.indices.map(i => s"_gps_off_$i"): _*)
  }

  /** Adds `cumCol` = running MAXIMUM of `valCol` in ascending `orderCol`
    * order (`MAX(valCol) OVER (ORDER BY orderCol)` semantics) — the
    * out-of-orderness / high-watermark primitive. Same two-phase scan
    * as [[withRunningTotal]]: range partition, per-partition window max,
    * and the per-partition maxima (one row each) prefix-combined into
    * broadcast starting offsets — never a single-task global window.
    */
  def withRunningMax(df: DataFrame, orderCol: String, valCol: String,
      cumCol: String, partitions: Int = 0): DataFrame = {
    val n =
      if (partitions > 0) partitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df.withColumn("_gps_key", col(orderCol))
      .repartitionByRange(n, col("_gps_key"))
      .withColumn("_gps_pid", spark_partition_id())
      .persist()
    ranged.count() // one materialization for both consumers (see above)
    val totals = ranged.groupBy("_gps_pid")
      .agg(max(col(valCol)).as("_gps_pmax"))
    val wOff = Window.orderBy("_gps_pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("_gps_moff", max(col("_gps_pmax")).over(wOff))
      .select("_gps_pid", "_gps_moff")
    val wIn = Window.partitionBy("_gps_pid").orderBy("_gps_key")
    ranged.join(broadcast(offsets), "_gps_pid")
      .withColumn(cumCol,
        greatest(max(col(valCol)).over(wIn),
          coalesce(col("_gps_moff"), max(col(valCol)).over(wIn))))
      .drop("_gps_pid", "_gps_key", "_gps_moff")
  }
}
