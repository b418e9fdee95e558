package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.{StructField, StructType}

/** The whole-operator extensibility ladder, rung (c): a NATIVE as-of
  * join — custom `LogicalPlan` node, custom `SparkStrategy`, and a
  * custom `SparkPlan` whose distribution/ordering requirements let
  * Catalyst plan the shuffles and sorts — registered through
  * `SparkSessionExtensions` ([[graft.functions.GraftExtensions]]) or
  * `spark.experimental.extraStrategies`.
  *
  * Semantics match [[graft.operators.AsOfJoin.asofBackward]] (the
  * composition-based formulation, ladder rung (a)): for each left row,
  * the single latest right row with equal keys and right.time ≤
  * left.time; right rows with NULL time never match. Right-side ties at
  * the same (key, time) resolve to the row latest in the right child's
  * sort order — callers pin a deterministic tiebreak by pre-sorting the
  * right side on a unique column (the required (keys, time) prefix
  * keeps that sort; EnsureRequirements adds nothing).
  *
  * Execution is a per-partition streaming merge: both children arrive
  * hash-clustered on the keys and sorted by (keys, time) — exactly what
  * `requiredChildDistribution` / `requiredChildOrdering` declare, so
  * EnsureRequirements plans ONE co-partitioning exchange per side and
  * the merge itself is O(left + right) per partition with O(1) state
  * (the last matching right row). No per-key buffering, no range
  * cross-join — the shape that survives a skewed key at 100 TB as well
  * as a sort-merge join does.
  *
  * NULL join keys group together (the merge compares key rows
  * byte-wise, like GROUP BY), unlike SQL equi-join semantics — callers
  * filter null keys when that matters; documented divergence.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTiebreak: Seq[Expression],
) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, tb) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTiebreak: Seq[Expression],
) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

  /** The right side additionally sorts by the caller's tiebreak: at
    * equal (key, time) the merge keeps the LAST row it consumes, so an
    * ascending unique tiebreak makes "highest wins" deterministic.
    */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    (rightKeys.map(SortOrder(_, Ascending)) :+
      SortOrder(rightTime, Ascending)) ++
      rightTiebreak.map(SortOrder(_, Ascending)))

  override def outputPartitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val keyType = StructType(lKeyExprs.map(e =>
      StructField("k", e.dataType, e.nullable)))
    val timeType = StructType(Seq(
      StructField("t", lTimeExpr.dataType, nullable = true)))
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKey = UnsafeProjection.create(lKeyExprs, leftOut)
      val rKey = UnsafeProjection.create(rKeyExprs, rightOut)
      val lTime = UnsafeProjection.create(Seq(lTimeExpr), leftOut)
      val rTime = UnsafeProjection.create(Seq(rTimeExpr), rightOut)
      val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
        .asInstanceOf[Ordering[InternalRow]]
      val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
        .asInstanceOf[Ordering[InternalRow]]
      // Bind against NULLABLE right attrs: BindReferences takes
      // nullability from the INPUT schema, and the no-match path feeds
      // an all-null GenericInternalRow — binding the raw (non-null)
      // right attrs would skip the null check and read garbage zeros.
      val outProj = UnsafeProjection.create(outAttrs,
        leftOut ++ rightOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightOut.length)
      val buffered = rIter.buffered
      // O(1) merge state: the last right row that matched the key being
      // scanned, owned copies (the child iterators reuse their rows).
      var lastKey: UnsafeRow = null
      var lastMatch: UnsafeRow = null
      lIter.map { l =>
        val lk = lKey(l)
        val lt = lTime(l).copy() // survives the rTime buffer reuse below
        var advancing = true
        while (advancing && buffered.hasNext) {
          val r = buffered.head
          val c = keyOrd.compare(rKey(r), lk)
          if (c < 0) {
            buffered.next() // behind every remaining left key: discard
          } else if (c == 0) {
            val rt = rTime(r)
            if (rt.isNullAt(0)) {
              buffered.next() // null-time right rows never match
            } else if (timeOrd.compare(rt, lt) <= 0) {
              val owned = buffered.next().asInstanceOf[UnsafeRow].copy()
              lastMatch = owned
              lastKey = rKey(owned).copy()
            } else {
              advancing = false // future of this key: keep for later rows
            }
          } else {
            advancing = false // right is ahead: no more rows for this key
          }
        }
        val matched = lastMatch != null && lastKey != null &&
          keyOrd.compare(lastKey, lk) == 0 && !lt.isNullAt(0)
        outProj(joined(l, if (matched) lastMatch else nullRight))
      }
    }
  }
}

object AsOfJoinPlan {

  /** Install the strategy into a session at runtime (idempotent) — the
    * route for sessions not built with GraftExtensions.
    */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
  }

  /** Native as-of backward join: every left row + the latest right row
    * with equal `keys` and right `rightTime` ≤ left `leftTime` (right
    * columns NULL when no such row). Column names must not collide
    * across sides — rename the right side first.
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      rightTiebreak: Seq[String] = Nil): DataFrame = {
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "rename right-side columns: output keeps both sides' columns")
    val spark = left.sparkSession
    install(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n"))
    graftbridge.ofRows(spark,
      AsOfJoinNode(lPlan, rPlan,
        keys.map(attr(lPlan, _)), keys.map(k => attr(rPlan, mapped(right, k))),
        attr(lPlan, leftTime), attr(rPlan, rightTime),
        rightTiebreak.map(attr(rPlan, _))))
  }

  /** Right-side key lookup: the caller renamed collision columns, so the
    * right key column is `k` if present, else `right_k` — the rename
    * convention [[asof]] callers use.
    */
  private def mapped(right: DataFrame, k: String): String =
    if (right.columns.contains(k)) k else s"right_$k"
}
