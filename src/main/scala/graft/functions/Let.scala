package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** A let-binding for Catalyst expression trees.
  *
  * Why it exists: higher-order-function lambdas re-evaluate their body
  * on every invocation, and CollapseProject counts *syntactic*
  * references — an expensive subexpression referenced once inside a
  * lambda gets inlined by the optimizer and then recomputed per
  * element at runtime (k×bands× for MinHash, 60× for SimHash bits).
  * Projection-staging can't prevent that inlining.
  *
  * `Let(value)(body)` forces single evaluation: the value becomes the
  * ARGUMENT of a one-element `transform` (HOF arguments evaluate
  * exactly once per row), and the body sees it as a lambda variable —
  * a bound value whose re-reads are free.
  */
object Let {
  def apply(value: Column)(body: Column => Column): Column =
    element_at(transform(array(value), v => body(v)), 1)

  /** Bind several independently-expensive values at once. */
  def apply(v1: Column, v2: Column)(body: (Column, Column) => Column)
      : Column =
    Let(v1)(a => Let(v2)(b => body(a, b)))
}
