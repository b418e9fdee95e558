package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

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
}
