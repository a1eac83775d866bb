package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Physical-layout helpers: orderings that make file-level statistics
  * (zone maps, parquet row-group min/max) selective on MORE than one
  * column at once.
  *
  * A range sort on column A gives perfect file pruning on A and none on B;
  * interleaving the bits of A and B (Morton / z-order curve) gives both
  * columns locality ∝ √(files) — the standard multi-dimensional data-
  * skipping layout (what Delta's OPTIMIZE ZORDER BY computes). Combined
  * with [[VersionedTable]]'s `statsCols`, a snapshot laid out by z-value
  * prunes range probes on either dimension.
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative integer
    * columns: bit j of `a` lands at position 2j, bit j of `b` at 2j+1.
    * Caller pre-bins values into [0, 2^bits) — rank- or range-binning, or
    * raw values when already bounded; out-of-range high bits are ignored
    * (masked), negatives are a caller error. bits ≤ 31 keeps the result
    * in a positive long. Pure static shifts, so the whole expression stays
    * inside whole-stage codegen.
    */
  def zOrder2(a: Column, b: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).map { j =>
      val abit = shiftleft(shiftright(a.cast("long"), j).bitwiseAND(lit(1L)),
        2 * j)
      val bbit = shiftleft(shiftright(b.cast("long"), j).bitwiseAND(lit(1L)),
        2 * j + 1)
      abit.bitwiseOR(bbit)
    }.reduce(_.bitwiseOR(_))
  }
}
