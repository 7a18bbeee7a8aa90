package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k aggregator: per group, keep the k largest
  * (score, id) pairs.
  *
  * The window alternative — `row_number() OVER (PARTITION BY g ORDER
  * BY score DESC) <= k` — must SORT every group in full. This
  * aggregator carries a k-bounded buffer through partial aggregation,
  * so a 10-billion-row group costs O(n·log k) map-side and ships only
  * k rows per partition across the exchange — the right top-k-per-group
  * shape at 100 TB.
  *
  * Ordering is total: by score desc, then id asc — ties are
  * deterministic (the reference's nondeterministic-dedup lesson,
  * `assignment_2_feedback.md`).
  */
class TopK(k: Int) extends Aggregator[(Double, Long), Seq[(Double, Long)],
    Seq[(Double, Long)]] {

  private def ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] {
      case (score, id) => (-score, id)
    }

  override def zero: Seq[(Double, Long)] = Seq.empty

  override def reduce(buf: Seq[(Double, Long)], row: (Double, Long))
      : Seq[(Double, Long)] =
    ((buf :+ row).sorted(ord)).take(k)

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)])
      : Seq[(Double, Long)] =
    ((a ++ b).sorted(ord)).take(k)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] =
    buf.sorted(ord)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = bufferEncoder
}

object TopK {
  /** DataFrame-API column: `top_k(score, id)` usable in groupBy.agg. */
  def topK(k: Int)(score: Column, id: Column): Column =
    udaf(new TopK(k), org.apache.spark.sql.Encoders
      .tuple(Encoders.scalaDouble, Encoders.scalaLong))
      .apply(score, id)
}
