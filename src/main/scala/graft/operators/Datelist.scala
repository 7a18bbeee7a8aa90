package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bitmask-encoded activity time series — the reference's
  * `datelist_int` (`tables/user_datelist_int.sql:1-6`, built in
  * `lecture-lab/generate_datelist.sql:12-19`, analyzed with BIT_COUNT +
  * AND masks in `anaylze_datelist.sql:20-31`; `1 << day_idx` variant in
  * `2-fact-data-modeling/homework/assignmnet_2.sql:139-167`).
  *
  * One BIGINT carries up to 64 days of presence — the densest possible
  * activity encoding: monthly-active checks become `mask != 0`, weekly
  * become a constant AND, and n-day actives a `bit_count`. At 100 TB
  * this replaces an exploded (user, day) table with one long per user.
  */
object Datelist {

  /** Fold an ARRAY<DATE> into a bitmask: bit i set ⇔ anchor+i days is
    * present. Dates outside [anchor, anchor+63] are ignored.
    */
  def encode(dates: Column, anchor: Column): Column =
    aggregate(
      transform(dates, d => {
        val idx = datediff(d, anchor)
        when(idx.between(0, 63),
          call_function("shiftleft", lit(1L), idx)).otherwise(lit(0L))
      }),
      lit(0L),
      (acc, x) => acc.bitwiseOR(x))

  /** Aggregate form of encode: OR the per-row day bit straight into
    * the mask. bit_or is idempotent, so duplicate (user, day) events
    * need no DISTINCT pass, and the partial/final split keeps the
    * combine map-side — one codegen'd hash aggregate instead of a
    * collect_set array plus an interpreted per-element fold.
    */
  def encodeAgg(day: Column, anchor: Column): Column = {
    val idx = datediff(day, anchor)
    bit_or(when(idx.between(0, 63),
      call_function("shiftleft", lit(1L), idx)).otherwise(lit(0L)))
  }

  /** Decode a bitmask back to ARRAY<DATE> (inverse of encode). */
  def decode(mask: Column, anchor: Column, nDays: Int = 64): Column =
    filter(
      transform(sequence(lit(0), lit(nDays - 1)),
        i => when(mask.bitwiseAND(
            call_function("shiftleft", lit(1L), i)) =!= 0,
          date_add(anchor, i))),
      d => d.isNotNull)

  /** Number of active days = POPCOUNT (reference BIT_COUNT). */
  def activeDays(mask: Column): Column = bit_count(mask).cast("int")

  /** A mask with bits [from, from+n) set, e.g. the "last 7 days ending
    * at day endIdx" check of `anaylze_datelist.sql:25-31`.
    */
  def windowMask(from: Int, n: Int): Long = ((1L << n) - 1L) << from

  /** Active at least once in the window — mask AND window != 0. */
  def activeInWindow(mask: Column, from: Int, n: Int): Column =
    mask.bitwiseAND(lit(windowMask(from, n))) =!= 0

  /** The reference's datelist is BIT(32) (`user_datelist_int.sql:1-6`)
    * rolled daily — `datelist_int << 1 | active` with bits past 32
    * silently falling off — so it always holds exactly the trailing
    * 32 days. This engine's BIGINT mask holds a FIXED 64-day window
    * [anchor, anchor+63] instead: twice the reach, but the anchor
    * must move explicitly. Width parity lives here.
    */
  val RefWidthDays: Int = 32

  /** All-ones mask of the lowest `width` bits (width 64 = full long). */
  def widthMask(width: Int): Long =
    if (width >= 64) -1L else (1L << width) - 1L

  /** Move the anchor forward `days` days and keep only a `width`-day
    * window — the explicit-anchor mirror of the reference's BIT(32)
    * wraparound: the `days` OLDEST bits roll off exactly as the
    * reference's daily `<< 1` drops its oldest bit, and `width` caps
    * the window exactly as BIT(32) caps the reference's. With
    * `width = RefWidthDays` a mask re-anchored to (today − 31) is
    * bit-for-bit the reference's trailing-32-day state.
    *
    * `shiftrightunsigned`, never `shiftright`: bit 63 (day
    * anchor+63) makes the mask a negative long, and an arithmetic
    * shift would 1-fill the vacated high bits — phantom active days.
    *
    * @param days non-negative anchor advance; ≥ 64 clears the mask
    *             (the whole window rolled off)
    */
  def reanchor(mask: Column, days: Column, width: Int = 64): Column =
    when(days >= 64, lit(0L))
      .otherwise(call_function("shiftrightunsigned", mask, days))
      .bitwiseAND(lit(widthMask(width)))

  /** Trim a 64-day mask to the reference's BIT(32) width in place
    * (keep days [anchor, anchor+31], drop the rest). */
  def trimToRefWidth(mask: Column): Column =
    mask.bitwiseAND(lit(widthMask(RefWidthDays)))
}
