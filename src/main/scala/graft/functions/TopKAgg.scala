package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_topk(key, payload, k)` → the k `(key, payload)` pairs with the
  * largest keys (ties broken by smallest payload), as a sorted
  * `array<struct<key:bigint, payload:string>>`.
  *
  * The scale story is the reason this exists: the idiomatic
  * top-k-per-group (`row_number() OVER (PARTITION BY g ORDER BY key
  * DESC) <= k`) shuffles EVERY row of every group into a per-group sort.
  * This aggregate is partial-agg mergeable — each map task keeps a
  * k-bounded buffer per group and the shuffle carries at most k pairs
  * per (group × map partition), turning a 100 TB window sort into a
  * standard two-phase hash aggregation (planned as ObjectHashAggregate
  * with a partial stage — asserted in `GraftFunctionsSpec`).
  *
  * Determinism: the selection and the output order are total over
  * (key DESC, payload ASC binary), so results are engine-comparable —
  * `q_topk_per_group` oracles it against DuckDB's window form.
  */
final case class TopKAgg(
    keyExpr: Expression,
    payloadExpr: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Long, UTF8String)]] {

  private lazy val k: Int = kExpr.eval(null).asInstanceOf[Int]

  override def children: Seq[Expression] = Seq(keyExpr, payloadExpr, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("payload", StringType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (keyExpr.dataType == LongType && payloadExpr.dataType == StringType &&
      kExpr.dataType == IntegerType && kExpr.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, string, int literal), got " +
        s"(${keyExpr.dataType.sql}, ${payloadExpr.dataType.sql}, ${kExpr.dataType.sql})")

  override def createAggregationBuffer(): ArrayBuffer[(Long, UTF8String)] =
    ArrayBuffer.empty

  /** (key DESC, payload ASC) — `a` strictly better than `b`. */
  private def better(a: (Long, UTF8String), b: (Long, UTF8String)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2.compareTo(b._2) < 0)

  private def insert(
      buf: ArrayBuffer[(Long, UTF8String)],
      key: Long, payload: UTF8String): ArrayBuffer[(Long, UTF8String)] = {
    if (buf.size < k) {
      buf += ((key, payload))
    } else {
      // full: replace the worst element iff the candidate beats it
      var worst = 0
      var i = 1
      while (i < buf.size) {
        if (better(buf(worst), buf(i))) worst = i
        i += 1
      }
      if (better((key, payload), buf(worst))) buf(worst) = (key, payload)
    }
    buf
  }

  override def update(
      buf: ArrayBuffer[(Long, UTF8String)],
      input: InternalRow): ArrayBuffer[(Long, UTF8String)] = {
    val kv = keyExpr.eval(input)
    val pv = payloadExpr.eval(input)
    if (kv == null || pv == null) buf
    // clone: the input row's UTF8String may point into reused buffers
    else insert(buf, kv.asInstanceOf[Long], pv.asInstanceOf[UTF8String].clone())
  }

  override def merge(
      buf: ArrayBuffer[(Long, UTF8String)],
      other: ArrayBuffer[(Long, UTF8String)]): ArrayBuffer[(Long, UTF8String)] = {
    other.foreach { case (kv, pv) => insert(buf, kv, pv) }
    buf
  }

  override def eval(buf: ArrayBuffer[(Long, UTF8String)]): Any = {
    val sorted = buf.sortWith(better)
    new GenericArrayData(sorted.map { case (kv, pv) =>
      new GenericInternalRow(Array[Any](kv, pv))
    }.toArray[Any])
  }

  override def serialize(buf: ArrayBuffer[(Long, UTF8String)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (kv, pv) =>
      out.writeLong(kv)
      val bytes = pv.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, UTF8String)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = ArrayBuffer.empty[(Long, UTF8String)]
    var i = 0
    while (i < n) {
      val kv = in.readLong()
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf += ((kv, UTF8String.fromBytes(b)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(keyExpr = newChildren(0), payloadExpr = newChildren(1), kExpr = newChildren(2))
  override def prettyName: String = "graft_topk"
}
