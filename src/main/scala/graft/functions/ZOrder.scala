package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) space-filling-curve utilities for multi-dimensional
  * data clustering — the layout device behind multi-column data skipping
  * at 100 TB (Delta/Iceberg `OPTIMIZE ZORDER BY`, `/root/reference` has
  * no layout story at all: it streams one file end to end).
  *
  * Sorting by an interleaved-bit key keeps rows that are close in BOTH
  * dimensions close in the file order, so per-file min/max envelopes
  * stay tight on BOTH columns and a predicate on either column prunes
  * files — where a linear sort gives tight envelopes on one column and
  * useless full-range envelopes on every other.
  *
  * Everything here is built from builtin bitwise `Column` ops (shifts,
  * masks) — whole-stage-codegen'd, zero shuffle, usable directly inside
  * `repartitionByRange`/`sortWithinPartitions` write pipelines.
  */
object ZOrder {

  /** Spread the low 16 bits of `v` so bit i lands at position 2*i — the
    * classic mask-doubling ladder (public-domain "Interleave bits by
    * Binary Magic Numbers" device), here as a Column expression tree.
    */
  def spread16(v: Column): Column = {
    val m0 = v.bitwiseAND(lit(0xFFFFL))
    val m1 = m0.bitwiseOR(shiftleft(m0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val m2 = m1.bitwiseOR(shiftleft(m1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val m3 = m2.bitwiseOR(shiftleft(m2, 2)).bitwiseAND(lit(0x33333333L))
    m3.bitwiseOR(shiftleft(m3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton code of two unsigned 16-bit coordinates: x takes the even
    * bit positions, y the odd ones. Result fits in 32 bits (LongType).
    */
  def z2(x: Column, y: Column): Column =
    spread16(x.cast("long")).bitwiseOR(shiftleft(spread16(y.cast("long")), 1))

  /** A string's first-6-UTF-8-bytes rank as a non-negative long
    * (48 bits): the value is LEFT-ALIGNED (short strings zero-pad on
    * the right — hex + rpad — so "b" still ranks above "aa"), which
    * makes rank order agree with byte-lexicographic order on the
    * prefix. That is exactly what a ZORDER quantizer needs: strings
    * sharing a 6-byte prefix land in the same cell, and the per-file
    * string zone maps (truncate-and-increment bounds) carry the
    * pruning correctness regardless of rank ties. Built entirely from
    * codegen'd built-ins — no UDF.
    */
  def stringRank48(c: Column): Column =
    conv(rpad(hex(substring(encode(c, "UTF-8"), 1, 6)), 12, "0"),
      16, 10).cast("long")

  /** The same spread ladder as ANSI SQL text (for DuckDB oracles). The
    * operand expression is substituted textually, so keep it short.
    */
  def spreadSql(v: String): String = {
    val s0 = s"(($v) & 65535)"
    val s1 = s"((($s0 | ($s0 << 8)) & 16711935)"    + ")"
    val s2 = s"((($s1 | ($s1 << 4)) & 252645135)"   + ")"
    val s3 = s"((($s2 | ($s2 << 2)) & 858993459)"   + ")"
    s"((($s3 | ($s3 << 1)) & 1431655765)" + ")"
  }

  /** Morton code as SQL text over two column names. */
  def z2Sql(x: String, y: String): String =
    s"(${spreadSql(x)} | (${spreadSql(y)} << 1))"

  /** Spread the low 16 bits of `v` so bit i lands at position 3*i —
    * the dilate-by-3 mask ladder (the public-domain 21-bit variant of
    * the Binary Magic Numbers device; 16 ⊂ 21 bits).
    */
  def spread16by3(v: Column): Column = {
    val m0 = v.bitwiseAND(lit(0xFFFFL))
    val m1 = m0.bitwiseOR(shiftleft(m0, 32))
      .bitwiseAND(lit(0x1f00000000ffffL))
    val m2 = m1.bitwiseOR(shiftleft(m1, 16))
      .bitwiseAND(lit(0x1f0000ff0000ffL))
    val m3 = m2.bitwiseOR(shiftleft(m2, 8))
      .bitwiseAND(lit(0x100f00f00f00f00fL))
    val m4 = m3.bitwiseOR(shiftleft(m3, 4))
      .bitwiseAND(lit(0x10c30c30c30c30c3L))
    m4.bitwiseOR(shiftleft(m4, 2)).bitwiseAND(lit(0x1249249249249249L))
  }

  /** Morton code of three unsigned 16-bit coordinates (48-bit result). */
  def z3(x: Column, y: Column, z: Column): Column =
    spread16by3(x.cast("long"))
      .bitwiseOR(shiftleft(spread16by3(y.cast("long")), 1))
      .bitwiseOR(shiftleft(spread16by3(z.cast("long")), 2))

  /** Reference single-value dilate-by-3 (for tests): bit loop. */
  def z3Ref(x: Int, y: Int, z: Int): Long = {
    var d = 0L
    var i = 0
    while (i < 16) {
      d |= ((x >> i) & 1L) << (3 * i)
      d |= ((y >> i) & 1L) << (3 * i + 1)
      d |= ((z >> i) & 1L) << (3 * i + 2)
      i += 1
    }
    d
  }

  /** Reference single-value interleave (for tests): bit-by-bit loop. */
  def z2Ref(x: Int, y: Int): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** Hilbert curve distance of a 2-D point — strictly better locality
    * than the Z-curve (no diagonal jumps between quadrants), at the
    * cost of a stateful per-level rotation that has no closed bitwise
    * form. Wrapped as a codegen'd [[Hilbert2]] expression: the rotation
    * loop runs fused inside whole-stage codegen instead of as a
    * 12-level Column tree (which would triple in size per level).
    */
  def hilbert2(x: Column, y: Column, bits: Int): Column =
    graftbridge.column(Hilbert2(
      graftbridge.expression(x.cast("long")),
      graftbridge.expression(y.cast("long")), bits))

  /** Reference loop (Wikipedia's public-domain xy2d): per level take
    * the two quadrant bits, add the quadrant's curve offset, and
    * rotate/reflect the frame for the next level.
    */
  def hilbert2Ref(xIn: Long, yIn: Long, bits: Int): Long = {
    var x = xIn
    var y = yIn
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1L - x; y = s - 1L - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** The xy2d loop as `bits` chained SQL CTE levels (for DuckDB
    * oracles): each level folds the quadrant offset into `hd` and
    * rewrites (hx, hy) with the rotation — plain CASE arithmetic, so
    * any engine replays the curve bit-for-bit. `from` must expose
    * columns hx, hy and the passthrough list.
    */
  def hilbertLevelsSql(from: String, bits: Int,
      passthrough: Seq[String]): String = {
    val keep = passthrough.map(c => s"$c, ").mkString
    val levels = (1 to bits).map { k =>
      val s = 1L << (bits - k)
      val prev = if (k == 1) from else s"hl${k - 1}"
      val rx = s"(CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END)"
      val ry = s"(CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END)"
      s"""hl$k AS (
         |  SELECT $keep
         |    hd + ${s * s} * xor(3 * $rx, $ry) AS hd,
         |    CASE WHEN (hy & $s) = 0 THEN
         |      CASE WHEN (hx & $s) > 0 THEN $s - 1 - hy ELSE hy END
         |    ELSE hx END AS hx,
         |    CASE WHEN (hy & $s) = 0 THEN
         |      CASE WHEN (hx & $s) > 0 THEN $s - 1 - hx ELSE hx END
         |    ELSE hy END AS hy
         |  FROM $prev)""".stripMargin
    }
    levels.mkString(",\n")
  }
}

/** Hilbert curve distance as a native codegen'd expression: the
  * per-level rotate/reflect state machine runs as a fused scalar loop
  * inside whole-stage codegen. Inputs are long coordinates in
  * [0, 2^bits); output is the curve distance in [0, 4^bits).
  */
case class Hilbert2(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"bits $bits out of range")

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert2"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (bigint, bigint), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(xv: Any, yv: Any): Any =
    ZOrder.hilbert2Ref(xv.asInstanceOf[Long], yv.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xe, ye) => {
      val x = ctx.freshName("hx")
      val y = ctx.freshName("hy")
      val d = ctx.freshName("hd")
      val s = ctx.freshName("hs")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val t = ctx.freshName("ht")
      s"""
         |long $x = $xe; long $y = $ye; long $d = 0L;
         |for (long $s = 1L << ${bits - 1}; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = $s - 1L - $x; $y = $s - 1L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Hilbert2 =
    copy(left = newLeft, right = newRight)
}
