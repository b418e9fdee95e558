package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Full (unrestricted) Damerau–Levenshtein edit distance — insert,
  * delete, substitute, and transposition of two ADJACENT characters,
  * where later edits may touch the transposed region (unlike the
  * restricted optimal-string-alignment variant: DL("ca","abc") = 2,
  * OSA would say 3). The record-linkage distance that treats the
  * ubiquitous keyboard transposition ("marhta") as one error instead
  * of two — the d59 Fellegi–Sunter front end's natural comparator.
  *
  * Lowrance–Wagner dynamic program: O(|s|·|t|) time, one (|s|+2)×(|t|+2)
  * int matrix plus a last-seen-position map per alphabet character.
  * Spark's built-in `levenshtein` has no transposition edit; a full-DL
  * comparator otherwise forces a UDF, which blocks whole-stage codegen.
  * This expression stays inside the codegen span: `doGenCode` emits one
  * static call into [[StringDistance.damerau]], the same shape as
  * Spark's own levenshtein (a static UTF8String helper call).
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "damerau_levenshtein"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two string arguments, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override def nullSafeEval(a: Any, b: Any): Any =
    StringDistance.damerau(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.StringDistance.damerau($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

object StringDistance {

  /** Per-thread scratch: flat DP matrix + 128-slot last-seen table.
    * The expression is hot inside blocked similarity joins (millions of
    * pairs per task); reusing the buffers removes a matrix + HashMap
    * allocation per pair. Safe because Spark evaluates a task's rows on
    * one thread.
    */
  private final class Scratch {
    var d: Array[Int] = new Array[Int](0)
    val da = new Array[Int](128)
  }
  private val scratch = new ThreadLocal[Scratch] {
    override def initialValue(): Scratch = new Scratch
  }

  /** Lowrance–Wagner full Damerau–Levenshtein over code points. */
  def damerau(su: UTF8String, tu: UTF8String): Int = {
    val s = su.toString
    val t = tu.toString
    val n = s.length
    val m = t.length
    if (n == 0) return m
    if (m == 0) return n
    var ascii = true
    var k = 0
    while (k < n && ascii) { if (s.charAt(k) >= 128) ascii = false; k += 1 }
    k = 0
    while (k < m && ascii) { if (t.charAt(k) >= 128) ascii = false; k += 1 }
    if (ascii) damerauAscii(s, t) else damerauBoxed(s, t)
  }

  /** Zero-allocation fast path (thread-local scratch, char-indexed
    * last-seen table) — identical recurrence to [[damerauBoxed]].
    */
  private def damerauAscii(s: String, t: String): Int = {
    val n = s.length
    val m = t.length
    val sc = scratch.get()
    val w = m + 2
    val need = (n + 2) * w
    if (sc.d.length < need) sc.d = new Array[Int](need)
    val d = sc.d
    val inf = n + m
    d(0) = inf
    var i = 0
    while (i <= n) { d((i + 1) * w + 1) = i; d((i + 1) * w) = inf; i += 1 }
    var j = 0
    while (j <= m) { d(w + j + 1) = j; d(j + 1) = inf; j += 1 }
    val da = sc.da
    java.util.Arrays.fill(da, 0)
    i = 1
    while (i <= n) {
      var db = 0
      val si = s.charAt(i - 1)
      var row = (i + 1) * w
      var prow = i * w
      j = 1
      while (j <= m) {
        val tj = t.charAt(j - 1)
        val i1 = da(tj)
        val j1 = db
        var cost = 1
        if (si == tj) { db = j; cost = 0 }
        var best = d(prow + j) + cost // substitute / match
        val ins = d(row + j) + 1
        if (ins < best) best = ins
        val del = d(prow + j + 1) + 1
        if (del < best) best = del
        val tra = d(i1 * w + j1) + (i - i1 - 1) + 1 + (j - j1 - 1)
        if (tra < best) best = tra
        d(row + j + 1) = best
        j += 1
      }
      da(si) = i
      i += 1
    }
    d((n + 1) * w + m + 1)
  }

  /** Boxed general path for non-ASCII inputs. */
  private def damerauBoxed(s: String, t: String): Int = {
    val n = s.length
    val m = t.length
    val inf = n + m
    // d is (n+2)x(m+2) with a sentinel border row/col of `inf`
    val d = Array.ofDim[Int](n + 2, m + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= n) { d(i + 1)(1) = i; d(i + 1)(0) = inf; i += 1 }
    var j = 0
    while (j <= m) { d(1)(j + 1) = j; d(0)(j + 1) = inf; j += 1 }
    // last row in s where each character was seen
    val da = new java.util.HashMap[Char, Integer]()
    i = 1
    while (i <= n) {
      var db = 0 // last column in t matched by s(i-1) within this row
      j = 1
      while (j <= m) {
        val i1: Int = { val v = da.get(t.charAt(j - 1)); if (v == null) 0 else v }
        val j1 = db
        val cost = if (s.charAt(i - 1) == t.charAt(j - 1)) { db = j; 0 } else 1
        val subst = d(i)(j) + cost
        val insert = d(i + 1)(j) + 1
        val delete = d(i)(j + 1) + 1
        val transp = d(i1)(j1) + (i - i1 - 1) + 1 + (j - j1 - 1)
        d(i + 1)(j + 1) =
          math.min(math.min(subst, insert), math.min(delete, transp))
        j += 1
      }
      da.put(s.charAt(i - 1), i)
      i += 1
    }
    d(n + 1)(m + 1)
  }

  /** Column wrapper for [[DamerauLevenshtein]]. */
  def damerauLevenshtein(a: Column, b: Column): Column =
    graftbridge.column(DamerauLevenshtein(
      graftbridge.expression(a), graftbridge.expression(b)))
}
