package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types._

/** Native int16-LE PCM kernels for the m-family audio operators.
  *
  * The declarative decode (hex → per-sample substring + conv, one
  * GENERATED row per sample) is correct but pays a string slice and a
  * radix parse per sample and explodes the corpus to sample granularity
  * before the window aggregation. These kernels fold the decode and the
  * per-window/per-row reductions into one JVM loop over the raw bytes —
  * the frame that leaves the row is window- or row-granular, orders of
  * magnitude smaller. Semantics are bit-identical to the SQL forms the
  * DuckDB oracles replay (signed little-endian pairs, trailing odd byte
  * ignored, final partial window kept).
  */
object PcmOps {

  @inline private def sampleAt(b: Array[Byte], i: Int): Long = {
    val u = (b(2 * i) & 0xff) | ((b(2 * i + 1) & 0xff) << 8)
    if (u >= 32768) u - 65536L else u.toLong
  }

  /** Per-window sum of squared samples (window = `win` samples, final
    * partial window kept) — the m10/m15 energy frame, one long per
    * window instead of one row per sample.
    */
  def windowEnergies(bytes: Array[Byte], win: Int): ArrayData = {
    val n = bytes.length / 2
    if (n <= 0) return new GenericArrayData(new Array[Any](0))
    val nw = (n + win - 1) / win
    val out = new Array[Any](nw)
    var w = 0
    while (w < nw) {
      var e = 0L
      var i = w * win
      val end = math.min(i + win, n)
      while (i < end) {
        val v = sampleAt(bytes, i)
        e += v * v
        i += 1
      }
      out(w) = e
      w += 1
    }
    new GenericArrayData(out)
  }

  /** Spark's round(double, 6): BigDecimal.valueOf (the Double.toString
    * form, NOT the exact-binary constructor) then HALF_UP — matching
    * RoundBase's Scala BigDecimal(double) semantics exactly.
    */
  private def round6(v: Double): Double =
    JBigDecimal.valueOf(v).setScale(6, RoundingMode.HALF_UP).doubleValue()

  /** The m19 loudness block in one pass: (n_smp, energy_sq, rms, gain,
    * n_would_clip) with rms/gain rounded exactly like Spark's
    * `round(x, 6)` (BigDecimal HALF_UP) and the clip test replaying
    * `abs(v * gain) > 32767.0` in the same double arithmetic.
    */
  def loudness(bytes: Array[Byte]): InternalRow = {
    val n = bytes.length / 2
    var sumSq = 0L
    var i = 0
    while (i < n) {
      val v = sampleAt(bytes, i)
      sumSq += v * v
      i += 1
    }
    if (n == 0 || sumSq == 0L)
      return InternalRow(n.toLong, sumSq, null, null, null)
    val rms = round6(math.sqrt(sumSq.toDouble / n.toDouble))
    val gain = round6(3276.8 / rms)
    var clip = 0L
    i = 0
    while (i < n) {
      if (math.abs(sampleAt(bytes, i).toDouble * gain) > 32767.0) clip += 1
      i += 1
    }
    InternalRow(n.toLong, sumSq, rms, gain, clip)
  }
}

/** binary (int16-LE PCM) → array&lt;long&gt; of per-window Σv². */
case class Pcm16WindowEnergies(child: Expression, win: Int)
    extends UnaryExpression {
  require(win > 0, "window must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pcm16_window_energies"
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    PcmOps.windowEnergies(v.asInstanceOf[Array[Byte]], win)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PcmOps.windowEnergies($c, $win)")

  override protected def withNewChildInternal(c: Expression): Pcm16WindowEnergies =
    copy(child = c)
}

object Pcm16WindowEnergies {
  def apply(bin: Column, win: Int): Column =
    graftbridge.column(
      Pcm16WindowEnergies(graftbridge.expression(bin), win))
}

/** binary (int16-LE PCM) → struct(n_smp, energy_sq, rms, gain,
  * n_would_clip) — the m19 loudness block; rms/gain/n_would_clip are
  * NULL for empty or all-silence rows.
  */
case class Pcm16Loudness(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_smp", LongType, nullable = false),
    StructField("energy_sq", LongType, nullable = false),
    StructField("rms", DoubleType, nullable = true),
    StructField("gain", DoubleType, nullable = true),
    StructField("n_would_clip", LongType, nullable = true)))
  override def prettyName: String = "pcm16_loudness"
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    PcmOps.loudness(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PcmOps.loudness($c)")

  override protected def withNewChildInternal(c: Expression): Pcm16Loudness =
    copy(child = c)
}

object Pcm16Loudness {
  def apply(bin: Column): Column =
    graftbridge.column(Pcm16Loudness(graftbridge.expression(bin)))
}
