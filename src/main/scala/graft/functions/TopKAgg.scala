package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k largest struct values per group in
  * a size-k min-heap, with map-side partial aggregation.
  *
  * This is the scalable alternative to the window+filter top-k pattern
  * (`row_number over (partition by key order by ...) <= k`): the window
  * sorts and shuffles EVERY row of every partition, while this aggregate
  * ships at most k rows per (group, map partition) into the shuffle —
  * memory and network bounded by k, not by group size. Exactly the shape
  * that matters when one key holds a million rows at 100 TB.
  *
  * The child must be a struct; rows are compared field-by-field in struct
  * order (make the tuple unique for deterministic results). Result: the
  * group's top-k structs, descending — or, with `smallest = true`, the
  * k SMALLEST structs ascending (min-k: e.g. the KMV sketch's k minimum
  * hashes, where a window-rank formulation would sort every distinct
  * value inside one task per group).
  */
case class TopKAgg(
    child: Expression,
    k: Int,
    smallest: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
) extends TypedImperativeAggregate[mutable.PriorityQueue[InternalRow]] {

  require(k > 0, "k must be positive")

  private def structType: StructType = child.dataType.asInstanceOf[StructType]

  @transient private lazy val fieldOrd: Ordering[InternalRow] =
    TypeUtils.getInterpretedOrdering(structType)
      .asInstanceOf[Ordering[InternalRow]]

  // "better" = kept preferentially: larger for top-k, smaller for min-k.
  @transient private lazy val ordering: Ordering[InternalRow] =
    if (smallest) fieldOrd.reverse else fieldOrd

  // Heap head is the WORST of the kept k, evicted first.
  @transient private lazy val heapOrd: Ordering[InternalRow] = ordering.reverse

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def prettyName: String = if (smallest) "min_k" else "top_k"

  override def createAggregationBuffer(): mutable.PriorityQueue[InternalRow] =
    mutable.PriorityQueue.empty[InternalRow](heapOrd)

  /** copyOnInsert: update() hands in a row backed by the scan's reusable
    * buffer, so it must be copied — but only when it actually survives the
    * heap test (copying up front would allocate once per input row; the
    * whole point of the bounded heap is to avoid that). merge() rows are
    * already owned.
    */
  private def insert(buf: mutable.PriorityQueue[InternalRow],
      row: InternalRow, copyOnInsert: Boolean): Unit = {
    def owned = if (copyOnInsert) row.copy() else row
    if (buf.size < k) buf.enqueue(owned)
    else if (ordering.compare(row, buf.head) > 0) {
      buf.dequeue()
      buf.enqueue(owned)
    }
  }

  override def update(buf: mutable.PriorityQueue[InternalRow],
      input: InternalRow): mutable.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[InternalRow], copyOnInsert = true)
    buf
  }

  override def merge(b1: mutable.PriorityQueue[InternalRow],
      b2: mutable.PriorityQueue[InternalRow]): mutable.PriorityQueue[InternalRow] = {
    b2.foreach(insert(b1, _, copyOnInsert = false))
    b1
  }

  override def eval(buf: mutable.PriorityQueue[InternalRow]): Any =
    new GenericArrayData(buf.toArray.sorted(ordering.reverse).map(identity[Any]))

  override def serialize(buf: mutable.PriorityQueue[InternalRow]): Array[Byte] = {
    val proj = UnsafeProjection.create(structType)
    val out = new ByteArrayOutputStream()
    val data = new DataOutputStream(out)
    data.writeInt(buf.size)
    buf.foreach { row =>
      val unsafe = proj(row)
      data.writeInt(unsafe.getSizeInBytes)
      unsafe.writeToStream(data, new Array[Byte](4096))
    }
    data.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[InternalRow] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val size = bb.getInt
      val rowBytes = new Array[Byte](size)
      bb.get(rowBytes)
      val row = new UnsafeRow(structType.length)
      row.pointTo(rowBytes, size)
      buf.enqueue(row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): TopKAgg = copy(child = c.head)
}

object TopKAgg {
  /** Aggregate Column: top-k (descending, field-by-field) struct values. */
  def apply(struct: Column, k: Int): Column =
    graftbridge.column(
      TopKAgg(graftbridge.expression(struct), k).toAggregateExpression())

  /** Aggregate Column: the k smallest struct values, ascending — ships at
    * most k values per map partition (one bounded shuffle, no sort).
    */
  def minK(struct: Column, k: Int): Column =
    graftbridge.column(
      TopKAgg(graftbridge.expression(struct), k, smallest = true)
        .toAggregateExpression())
}
