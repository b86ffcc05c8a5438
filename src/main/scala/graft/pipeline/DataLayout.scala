package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scan-pruning data layout for the 100 TB tier.
  *
  * At cluster scale the cheapest scan is the one that never happens:
  * Iceberg (and every parquet reader) keeps per-file / per-row-group
  * min-max statistics and skips whole files whose range cannot match a
  * predicate. Those statistics only prune when the WRITE clusters rows so
  * each file covers a narrow slice of the key space — which is exactly
  * `repartitionByRange` + `sortWithinPartitions` at write time:
  *
  *  - [[writeRangeClustered]] gives disjoint per-file ranges on the
  *    leading key → point/range predicates on it touch O(1) of the files;
  *  - [[writeZOrdered]] interleaves the bits of TWO keys (Morton/Z-order)
  *    so each file covers a small rectangle of the (a, b) plane and
  *    predicates on EITHER dimension prune — the layout trick behind
  *    `OPTIMIZE ZORDER BY` in lakehouse engines.
  *
  * Both are one linear range-shuffle (the range partitioner samples
  * boundaries first — no global sort), and neither stores a layout
  * column: the Z-key is a pure bit-arithmetic Column recomputed on both
  * sides of the exchange, codegen'd, never materialized in the table.
  * `DataLayoutSpec` quantifies the effect on real parquet footers.
  */
object DataLayout {

  /** Spread the low 16 bits of `c` to the even bit positions (classic
    * Morton magic-number dilation, as pure Column arithmetic).
    */
  def spreadBits(c: Column): Column = {
    var x = c.cast("long").bitwiseAND(lit(0xFFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x33333333L))
    x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Z-order (Morton) key of two non-negative 16-bit values: bits of `a`
    * on even positions, bits of `b` on odd — locality in the key is
    * locality in BOTH dimensions.
    */
  def zKey(a: Column, b: Column): Column =
    spreadBits(a).bitwiseOR(shiftleft(spreadBits(b), 1))

  /** Rescale `c` from `[lo, hi]` to the 16-bit domain [[zKey]] expects.
    * Production layouts derive lo/hi from table-level stats (one tiny
    * agg, or the catalog's column stats — never a collect of data rows).
    */
  def to16Bit(c: Column, lo: Double, hi: Double): Column = {
    val span = math.max(hi - lo, 1e-300)
    least(lit(65535L), greatest(lit(0L),
      floor((c.cast("double") - lit(lo)) / lit(span) * 65535.0).cast("long")))
  }

  /** Write `df` as `n` files with disjoint per-file ranges on `keys`
    * (lexicographic): range-shuffle + in-partition sort, one file per
    * range. Predicates on the leading key then prune to the few files
    * whose footer range matches.
    */
  def writeRangeClustered(df: DataFrame, path: String, n: Int, keys: Column*): Unit =
    df.repartitionByRange(n, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode("overwrite").parquet(path)

  /** Write `df` Z-ordered on `(a, b)` (both already in the 16-bit
    * domain — see [[to16Bit]]): each of the `n` files covers a compact
    * rectangle of the plane, so single-dimension predicates on either
    * column prune files too.
    */
  def writeZOrdered(df: DataFrame, path: String, n: Int, a: Column, b: Column): Unit =
    df.repartitionByRange(n, zKey(a, b))
      .sortWithinPartitions(zKey(a, b))
      .write.mode("overwrite").parquet(path)
}
