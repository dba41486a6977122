package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Multi-dimensional data-layout operators: Z-order (Morton) clustering
  * so ONE sort order serves range predicates on SEVERAL columns.
  *
  * Why this matters at 100 TB: parquet/file pruning works off per-file
  * min/max bounds. A single-column sort gives tight bounds on that
  * column only — every other dimension spans its full range in every
  * file, so a predicate on it prunes nothing. Interleaving the bits of
  * two dimensions into one sort key tiles the (x, y) plane with
  * near-square cells: each written chunk gets a bounded extent in BOTH
  * dimensions, and a range query on either one touches O(√chunks)
  * instead of all of them. This is the OPTIMIZE ZORDER layout step of
  * lakehouse engines, as a plain deterministic column + sort.
  *
  * Everything is integer bit arithmetic on the Column DSL — codegen'd,
  * engine-portable (the oracle recomputes z-values bit-for-bit), no UDF.
  */
object Layout {

  /** Morton/Z-value of two nonnegative integral columns: bit i of `x`
    * lands at position 2i, bit i of `y` at 2i+1. Monotone within each
    * dimension when the other is fixed; `bits` bounds the domain
    * (values must sit in [0, 2^bits)) and 2·bits ≤ 62 keeps the result
    * in a positive long. The bit planes are disjoint, so summing the
    * shifted bits IS their union.
    */
  def zValue2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31]: $bits")
    val xl = x.cast(LongType)
    val yl = y.cast(LongType)
    (0 until bits).map { i =>
      shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Cluster a relation by the Z-value of two dimensions for writing:
    * range-repartition on the z key (sampled range exchange — a global
    * order WITHOUT a single-partition sort) plus an in-partition sort,
    * so each output task writes one tight z-contiguous tile. Follow
    * with a partitioned/bucketed write; downstream scans prune on both
    * dimensions' min/max (LayoutSpec reads the scan metrics of a
    * banded query over the written files to prove the row groups are
    * actually skipped). `numPartitions` sizes the output files — the
    * knob that matches tiles to the target row-group size in a real
    * write; default leaves it to spark.sql.shuffle.partitions.
    */
  def zOrderBy(df: DataFrame, x: Column, y: Column, bits: Int,
               zCol: String = "z_value",
               numPartitions: Option[Int] = None): DataFrame = {
    val z = df.withColumn(zCol, zValue2(x, y, bits))
    numPartitions.fold(z.repartitionByRange(col(zCol)))(
        n => z.repartitionByRange(n, col(zCol)))
      .sortWithinPartitions(col(zCol))
  }
}
