package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.plans.Md5PrefixLong

/** Deterministic pseudo-random permutation via a balanced Feistel
  * network (Luby–Rackoff; the cycle-free way to "shuffle" a dataset):
  * a Feistel network over 2·`halfBits`-bit values is a BIJECTION of
  * [0, 2^(2·halfBits)) whatever the round function is, so mapping
  * every row id through it yields a collision-free pseudo-random key
  * — a reproducible global training-data shuffle computed PER ROW
  * with no state, no sort-by-rand() nondeterminism, and no Spark
  * shuffle for the permutation itself (ordering/bucketing by the key
  * is the consumer's choice). The round function is the repo-standard
  * 60-bit md5 prefix ([[graft.plans.Md5PrefixLong]]) reduced mod
  * 2^halfBits, so any engine replays the exact permutation.
  *
  * Why not ORDER BY rand(seed): per-partition rand is
  * partitioning-dependent in Spark (task retries and splits move
  * values), ties are possible, and no other engine reproduces the
  * sequence. The Feistel key is a pure column expression — stable
  * under repartitioning, retries, and engines.
  */
object Feistel {

  /** The permuted key for `id` ∈ [0, 2^(2·halfBits)). 4 rounds (the
    * Luby–Rackoff strong-PRP count); `salt` picks the permutation.
    * Inputs outside the domain FAIL LOUDLY (raise_error): the Feistel
    * halves mask to 2·halfBits bits, so a wider id would silently
    * collide with an in-domain one — and an engine-side mask with an
    * unmasked oracle replay diverges exactly there. Callers with
    * wider ids raise halfBits.
    */
  def key(id: Column, halfBits: Int = 16, rounds: Int = 4,
      salt: String = "graft"): Column = {
    require(halfBits >= 1 && halfBits <= 30,
      s"halfBits must be 1..30, got $halfBits")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val mask = (1L << halfBits) - 1L
    var l = shiftright(id.cast("long"), halfBits).bitwiseAND(lit(mask))
    var r = id.cast("long").bitwiseAND(lit(mask))
    (1 to rounds).foreach { rd =>
      val f = pmod(
        Md5PrefixLong(concat(lit(s"$salt:$rd:"), r.cast("string"))),
        lit(mask + 1L))
      val nl = r
      val nr = l.bitwiseXOR(f)
      l = nl
      r = nr
    }
    // domain gate AFTER the (cheap, masked) rounds: CaseWhen evaluates
    // lazily per row, so in-domain rows never touch the error branch
    val dom = 1L << (2 * halfBits)
    when(id.cast("long").between(0L, dom - 1L),
        shiftleft(l, halfBits) + r)
      .otherwise(raise_error(format_string(
        s"Feistel.key: id %d outside [0, $dom) — raise halfBits",
        id.cast("long"))))
  }
}
