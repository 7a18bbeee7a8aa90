package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) encoding — the multi-dimensional clustering key
  * behind data-skipping layouts (Delta/Iceberg OPTIMIZE ZORDER,
  * Databricks' liquid clustering ancestry): interleaving the bits of
  * two dimension keys makes rows close in EITHER dimension land close
  * in the sort, so parquet min/max row-group stats prune selective
  * filters on BOTH columns from one physical ordering. A 100 TB fact
  * laid out by `morton2(a, b)` answers `a = x` and `b = y` scans with
  * bounded file touches where a single-column sort prunes only its
  * own column.
  *
  * The encoding is the classic mask-and-shift bit spread, built
  * entirely from Spark's bitwise Column primitives — a pure,
  * codegen'd expression tree (no UDF), reproducible in any engine's
  * integer SQL, which is what the q109 oracle does.
  */
object ZOrder {

  /** Spread the low 16 bits of `v` so bit i lands at position 2·i
    * (0x0000bbbb → 0b0a0b0a0b…): 4 mask-shift rounds.
    */
  def spread16(v: Column): Column = {
    val s0 = v.bitwiseOR(shiftleft(v, 8)).bitwiseAND(lit(0x00FF00FFL))
    val s1 = s0.bitwiseOR(shiftleft(s0, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val s2 = s1.bitwiseOR(shiftleft(s1, 2)).bitwiseAND(lit(0x33333333L))
    s2.bitwiseOR(shiftleft(s2, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton code of two dimension keys (each masked to 16 bits —
    * callers bucket wider domains first, e.g. `pmod(hash(col), 65536)`;
    * rank-based bucketing preserves locality better for skewed
    * domains). `x` occupies even bits, `y` odd bits.
    */
  def morton2(x: Column, y: Column): Column =
    spread16(x.cast("long").bitwiseAND(lit(0xFFFFL)))
      .bitwiseOR(
        shiftleft(spread16(y.cast("long").bitwiseAND(lit(0xFFFFL))), 1))
}
