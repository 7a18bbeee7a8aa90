package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Next-fit sequence packing over BOUNDED shards — the materializing
  * counterpart of q174's concat-and-chunk accounting. q174 slices a
  * concatenated token stream at fixed boundaries (documents may span
  * sequences); here documents are ATOMIC: each goes into the current
  * training sequence if it fits within `cap` tokens, else opens a new
  * sequence — the packing discipline pipelines use when attention must
  * never cross a document boundary.
  *
  * Next-fit is a non-associative left fold (each decision depends on
  * the running remainder), so it cannot be a window prefix-sum like
  * q174. Packing a whole 100 TB corpus sequentially is equally
  * impossible — and no real pipeline wants it: packing is always done
  * within bounded output shards (a training file), and shards pack
  * independently. That bound is what makes the fold an EXPRESSION
  * rather than an operator: with ≤ `shardSize` documents per shard,
  * the per-shard doc list collects into one row and the fold runs as a
  * codegen'd higher-order `aggregate` — one shuffle to group the
  * shard, zero UDFs, zero driver state, every shard folding in
  * parallel wherever its row lands.
  */
object Packing {

  /** Per-shard next-fit bin fills.
    *
    * @param docs     one row per document
    * @param shardCol bounded-cardinality shard key (≤ ~thousands of
    *                 docs per shard — the per-shard list must fit in a
    *                 row)
    * @param orderCol total order within the shard (the stream order
    *                 the packer sees)
    * @param nCol     token count, non-negative long
    * @param cap      sequence capacity in tokens; a document longer
    *                 than `cap` occupies a bin alone (an overflow bin
    *                 — flag, don't split: splitting is q174's regime)
    * @return shard, n_docs, total_tokens, fills (bin loads in packing
    *         order)
    */
  def nextFitFills(docs: DataFrame, shardCol: String, orderCol: String,
      nCol: String, cap: Long): DataFrame = {
    val fold = (acc: Column, n: Column) =>
      when(size(acc) > 0 && element_at(acc, -1) + n <= cap,
        concat(slice(acc, lit(1), size(acc) - 1),
          array(element_at(acc, -1) + n)))
        .otherwise(concat(acc, array(n)))
    docs
      .groupBy(col(shardCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(nCol)).as("total_tokens"),
        // array_sort on structs orders by leading field = orderCol
        array_sort(collect_list(struct(col(orderCol), col(nCol))))
          .as("_ds"))
      .withColumn("fills",
        aggregate(transform(col("_ds"), s => s(nCol)),
          lit(Array.empty[Long]), fold))
      .drop("_ds")
  }

  /** Packing metrics from [[nextFitFills]]: sequences used, pad waste
    * across full bins, overflow documents, and an order-sensitive
    * checksum (Σ position·fill) pinning the exact fold trajectory —
    * two shards with the same fills multiset but different packing
    * order cannot collide.
    */
  def nextFitStats(docs: DataFrame, shardCol: String, orderCol: String,
      nCol: String, cap: Long): DataFrame =
    nextFitFills(docs, shardCol, orderCol, nCol, cap)
      .select(col(shardCol), col("n_docs"), col("total_tokens"),
        size(col("fills")).cast("long").as("n_seqs"),
        aggregate(col("fills"), lit(0L),
          (a, f) => a + greatest(lit(0L), lit(cap) - f)).as("pad_tokens"),
        aggregate(col("fills"), lit(0L),
          (a, f) => a + when(f > cap, 1L).otherwise(0L))
          .as("n_overflow"),
        aggregate(
          zip_with(col("fills"),
            sequence(lit(1L), size(col("fills")).cast("long")),
            (f, i) => f * i),
          lit(0L), (a, x) => a + x).as("fill_checksum"))
}
