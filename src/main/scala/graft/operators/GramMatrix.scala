package graft.operators

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types._

/** Distributed Gram matrix (Aᵀ·A) over a column of fixed-dimension
  * integer-quantized vectors — the primitive under PCA, whitening, and
  * linear-probe covariance at corpus scale (the reference engine,
  * `/root/reference/claim_pipeline.py`, has no linear-algebra surface).
  *
  * The naive declarative form — explode every vector into its d(d+1)/2
  * index pairs and groupBy (i, j) — is correct but pays the explode on
  * every row: at 10⁹ vectors × d=64 that is 2×10¹² shuffle-input rows
  * before partial aggregation collapses them. This aggregate instead
  * folds each partition into ONE flat upper-triangle buffer of
  * d(d+1)/2 longs (for d=64: 2080 longs ≈ 16 KB), so the shuffle
  * carries one buffer per map partition regardless of row count — the
  * same "signatures are zero-shuffle per-row folds" discipline as
  * [[graft.functions.TopKAgg]], applied to dense linear algebra.
  *
  * Exactness: inputs are pre-quantized longs (the s27 micro-unit
  * device), so every product and sum is exact integer arithmetic —
  * no float-summation order sensitivity, hence oracle-hashable.
  * Overflow headroom: |q| ≤ 10³ micro-units ⇒ a product ≤ 10⁶ and
  * 2⁶³ admits ~9×10¹² rows per cell before wrap.
  *
  * Result: the flat row-major upper triangle, cell (i ≤ j) at index
  * i·d − i(i−1)/2 + (j − i).
  */
case class GramAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
) extends TypedImperativeAggregate[Array[Long]] {

  require(dim > 0, "dim must be positive")
  private val cells = dim * (dim + 1) / 2

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_matrix"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](cells)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      require(arr.numElements() == dim,
        s"gram_matrix expects dim=$dim vectors, got ${arr.numElements()}")
      val q = arr.toLongArray()
      var i = 0
      var pos = 0
      while (i < dim) {
        val qi = q(i)
        var j = i
        while (j < dim) {
          buffer(pos) += qi * q(j)
          pos += 1
          j += 1
        }
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < cells) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(cells * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(cells)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramAgg =
    copy(child = newChildren.head)
}

object GramMatrix {

  /** Aggregate Column: Gram upper triangle of a long-array vector
    * column (see [[GramAgg]]).
    */
  def gram(vec: Column, dim: Int): Column =
    graftbridge.column(
      GramAgg(graftbridge.expression(vec), dim).toAggregateExpression())
}
