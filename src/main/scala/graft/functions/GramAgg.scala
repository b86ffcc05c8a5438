package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `graft_gram(c)` → `array<bigint>` of length d² — the integer Gram
  * matrix Σᵢ cᵢ·cᵢᵀ of an `array<bigint>` vector column, accumulated in
  * ONE aggregation buffer (row-major: entry (j, k) at index j·d + k).
  *
  * The scale story: the relational form of CᵀC is a self-join of the
  * exploded (vec_id, j, c) table on vec_id — an N·d² row expansion
  * through a join before the (j, k) partial agg (the q_embed_spectrum
  * hot path: ~20M joined rows at sf0.1, d = 64). This aggregate folds
  * each vector's outer product into a d²-long buffer in a tight JVM
  * loop: no explode, no join, no pre-agg shuffle rows — the shuffle
  * carries d² longs per map partition regardless of N, and `merge` is
  * an elementwise add (associative + commutative, so partial
  * aggregation is exact under any merge order; Long addition of the
  * same integers is order-immune, so the result is bit-identical to
  * the relational form and the DuckDB oracle needs no change).
  *
  * The buffer sizes itself from the first vector seen (d is a data
  * property, not an argument); mismatched vector lengths in one group
  * throw rather than silently mis-accumulate.
  */
final case class GramAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.sql}")
  }

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val c = v.asInstanceOf[ArrayData].toLongArray()
    val d = c.length
    val b = if (buf.isEmpty) new Array[Long](d * d) else buf
    require(b.length == d * d,
      s"$prettyName: vector length $d does not match buffer d=${math.sqrt(b.length).toInt}")
    var j = 0
    while (j < d) {
      val cj = c(j)
      val base = j * d
      var k = 0
      while (k < d) {
        b(base + k) += cj * c(k)
        k += 1
      }
      j += 1
    }
    b
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    if (other.isEmpty) return buf
    if (buf.isEmpty) return other
    require(buf.length == other.length, s"$prettyName: buffer size mismatch")
    var i = 0
    while (i < buf.length) {
      buf(i) += other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramAgg =
    copy(child = newChildren(0))
  override def prettyName: String = "graft_gram"
}
