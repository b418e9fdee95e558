package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items sketch: at most k counters per aggregation
  * buffer, map-side combinable, with the classic deterministic guarantee
  * that EVERY item occurring more than N/(k+1) times in the group survives
  * in the final summary (Misra & Gries 1982; mergeability per Agarwal et
  * al., "Mergeable Summaries", PODS 2012).
  *
  * This is the bounded-memory scale path for "find the frequent tokens in
  * a 100 TB corpus whose vocabulary doesn't fit anywhere": an exact
  * `GROUP BY token` keyed on the full vocabulary shuffles one row per
  * DISTINCT token, while this aggregate ships at most k counters per map
  * partition and k per merge. The sketch emits a CANDIDATE list (a
  * superset of the truly frequent items, possibly with under-counts);
  * callers re-join the candidates against the data for exact counts — the
  * final answer is exact and independent of partitioning even though the
  * intermediate summary is not.
  *
  * update() is amortized O(1): a miss with a full buffer decrements every
  * counter by one and drops zeros, but each such sweep destroys k+1 units
  * of count mass (k counters + the arriving item), and total mass added
  * is N, so sweeps cost O(N) over the whole stream.
  *
  * merge() follows the mergeable-summaries recipe: sum counters, then
  * subtract the (k+1)-th largest count from all and keep the strictly
  * positive remainder — at most k counters survive and the error bounds
  * add, preserving the N/(k+1) guarantee across any merge tree.
  */
case class MgSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
) extends org.apache.spark.sql.catalyst.expressions.aggregate
    .TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "mg_candidates"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      buf.get(s) match {
        case Some(c) => buf.update(s, c + 1L)
        case None if buf.size < k => buf.update(s, 1L)
        case None =>
          // Full-buffer miss: the arriving item and one unit of every
          // counter annihilate. filterInPlace drops counters at zero.
          buf.mapValuesInPlace((_, c) => c - 1L)
          buf.filterInPlace((_, c) => c > 0L)
      }
    }
    buf
  }

  override def merge(b1: mutable.HashMap[String, Long],
      b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (s, c) =>
      b1.update(s, b1.getOrElse(s, 0L) + c)
    }
    if (b1.size > k) {
      // (k+1)-th largest count; subtracting it leaves ≤ k positives.
      val cut = b1.values.toArray.sorted(Ordering.Long.reverse).apply(k)
      b1.mapValuesInPlace((_, c) => c - cut)
      b1.filterInPlace((_, c) => c > 0L)
    }
    b1
  }

  /** Candidate items, sorted ascending for a deterministic rendering.
    * Counts are deliberately NOT emitted: they are lower bounds whose
    * exact values depend on the merge tree; only the membership guarantee
    * is portable, and callers must re-count exactly anyway.
    */
  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.keysIterator.toArray.sorted
        .map(s => UTF8String.fromString(s): Any))

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val data = new DataOutputStream(out)
    data.writeInt(buf.size)
    buf.foreach { case (s, c) =>
      val bytes = s.getBytes(StandardCharsets.UTF_8)
      data.writeInt(bytes.length)
      data.write(bytes)
      data.writeLong(c)
    }
    data.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val sb = new Array[Byte](len)
      bb.get(sb)
      buf.update(new String(sb, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MgSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MgSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MgSketch = copy(child = c.head)
}

object MgSketch {
  /** Aggregate Column: Misra–Gries candidate items (array&lt;string&gt;,
    * sorted). Guaranteed to contain every item with frequency &gt;
    * N/(k+1) in the group.
    */
  def candidates(item: Column, k: Int): Column =
    graftbridge.column(
      MgSketch(graftbridge.expression(item), k).toAggregateExpression())
}
