package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton curve) data clustering — multi-dimensional data skipping
  * on plain parquet.
  *
  * A table sorted on ONE column prunes scans only for predicates on that
  * column; a 2-D box filter `(a BETWEEN .. AND b BETWEEN ..)` over a layout
  * sorted by `a` still reads every row group that matches `a` regardless of
  * `b`. Interleaving the bits of both columns (the Morton / Z-order curve)
  * makes rows that are close in BOTH dimensions land in the same row
  * groups, so parquet's per-row-group min/max statistics prune on both
  * predicates at once — the OPTIMIZE ZORDER layout of table formats,
  * re-expressed on plain files. No reader cooperation is needed: pruning
  * happens inside the stock parquet scan via column statistics.
  *
  * Scale shape: the z-key is a pure scalar projection (codegen'd bit ops,
  * no UDF); the layout write is ONE range shuffle on the key (the same
  * cost any sorted-write pays), and query-side cost strictly drops.
  */
object ZOrder {

  /** Morton interleave of two non-negative integer columns, `bits` low
    * bits each → one long (a's bit i → position 2i, b's bit i → 2i+1).
    * Built from shiftleft/and/or primitives so whole-stage codegen fuses
    * the whole computation; values are masked to `bits` bits first (the
    * caller buckets/normalizes dimensions into that range). */
  def morton2(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val am = a.cast("long").bitwiseAND(lit((1L << bits) - 1))
    val bm = b.cast("long").bitwiseAND(lit((1L << bits) - 1))
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(am, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(bm, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Write `df` as parquet clustered on the z-order of (`colA`, `colB`):
    * range-partition into `nFiles` contiguous z-ranges, sort within each,
    * so every file covers a compact (a, b) rectangle and its parquet
    * min/max stats are tight on BOTH columns. The z-key is partitioning
    * metadata only — it is not written to the files. */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      colA: String,
      colB: String,
      bits: Int = 16,
      nFiles: Int = 32): Unit = {
    val z = morton2(col(colA), col(colB), bits)
    df.repartitionByRange(nFiles, z)
      .sortWithinPartitions(z)
      .write.mode("overwrite").parquet(path)
  }
}
