package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** `graft_hll(hash48, p)` → `struct<est_distinct:double,
  * zero_registers:bigint>` — a HyperLogLog distinct-count aggregate over
  * a PRE-HASHED 48-bit id column (the battery's shared md5-prefix hash,
  * `conv(substring(md5(x),1,12),16,10)`), with `p` bucket bits
  * (m = 2^p registers, p a 4..12 int literal).
  *
  * The scale story: `count(DISTINCT x)` plans an Expand + a distinct
  * shuffle carrying every distinct value; this aggregate's state is a
  * fixed m-byte register array per group — duplicates collapse in the
  * map-side register max, the shuffle carries m bytes per (group × map
  * partition) regardless of cardinality, and `merge` is an elementwise
  * max (associative + commutative, so partial aggregation is exact under
  * any merge order). Planned as ObjectHashAggregate with a partial
  * stage (asserted in `GraftFunctionsSpec`).
  *
  * Determinism (the oracle contract): the register rank is
  * `maxRho - bitLength(h div m)` (rho = leading-zero count + 1 over the
  * `48-p` payload bits), the harmonic-mean denominator is accumulated as
  * an INTEGER `Σ 2^(maxRho - M_j)` (≤ 2^(p + maxRho) < 2^62 — exact, so
  * merge/serialization order cannot perturb a float), and the estimate
  * `alpha·m² / (S / 2^maxRho)` is one IEEE division at the end —
  * bit-identical to the pure-SQL register computation in
  * `q_hll_sketch`'s DuckDB oracle. The ln-based small-range correction
  * is deliberately omitted (not cross-engine exact); `zero_registers`
  * is returned so a caller can apply linear counting themselves.
  */
final case class HllAgg(
    hashExpr: Expression,
    pExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  private lazy val p: Int = pExpr.eval(null).asInstanceOf[Int]
  private lazy val m: Int = 1 << p
  /** rho of an all-zero `48-p`-bit payload: payload width + 1. */
  private lazy val maxRho: Int = 48 - p + 1

  override def children: Seq[Expression] = Seq(hashExpr, pExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("est_distinct", DoubleType, nullable = false),
    StructField("zero_registers", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (hashExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint hash input, got ${hashExpr.dataType.sql}")
    else if (pExpr.dataType != IntegerType || !pExpr.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an int literal for p, got ${pExpr.sql}")
    else {
      val pv = pExpr.eval(null)
      if (pv == null || pv.asInstanceOf[Int] < 4 || pv.asInstanceOf[Int] > 12)
        TypeCheckResult.TypeCheckFailure(s"$prettyName requires 4 <= p <= 12")
      else TypeCheckResult.TypeCheckSuccess
    }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val hv = hashExpr.eval(input)
    if (hv != null) {
      val h = hv.asInstanceOf[Long]
      val bucket = (h & (m - 1)).toInt
      val w = h >>> p
      // rho over the 48-p payload bits: leading zeros + 1; w == 0 → all
      // payload bits zero → maxRho
      val rho = if (w == 0L) maxRho else maxRho - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > buf(bucket)) buf(bucket) = rho.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if (other(i) > buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    var s = 0L
    var zeros = 0L
    var i = 0
    while (i < m) {
      s += 1L << (maxRho - buf(i))
      if (buf(i) == 0) zeros += 1
      i += 1
    }
    val alpha = 0.7213 / (1 + 1.079 / m)
    val num = alpha * m * m * (1L << maxRho).toDouble
    new GenericInternalRow(Array[Any](num / s.toDouble, zeros))
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllAgg =
    copy(hashExpr = newChildren(0), pExpr = newChildren(1))
  override def prettyName: String = "graft_hll"
}
