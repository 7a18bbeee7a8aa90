package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{IncrementalAgg, Similarity}

/** Second-half round-6 additions: MIN/MAX-aware CDC retraction (the
  * keyed-recompute variant q225's algebraic operator refuses by
  * design) and the full distributed Lloyd's k-means fit (q139 ran a
  * single update step; q227 runs the whole loop with the same
  * fixed-point determinism choreography).
  */
object Extended12 {

  /** CDC-delete maintenance of a view that carries MIN/MAX partials
    * ([[IncrementalAgg.retractWithRecompute]]): per-customer order
    * count / spend / max / min with the urgent-order batch retracted.
    * SUM/COUNT subtract algebraically; extremes are re-derived from
    * post-delete history for ONLY the keys the batch touches — the
    * delete batch's key set broadcasts into the history scan as a
    * semi-join, so at 100 TB untouched keys never rescan and the
    * recompute aggregates only the touched keys' rows. The oracle
    * aggregates the post-delete rows directly; hash equality proves
    * the subtract-plus-keyed-recompute reconstruction, including that
    * untouched keys' pass-through extremes equal a fresh aggregate.
    */
  val q226_retract_minmax: Q = Q(
    "q226_retract_minmax",
    """SELECT o_custkey, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS total_spend,
      |  CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS max_price,
      |  CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS min_price
      |FROM orders WHERE o_orderpriority <> '1-URGENT'
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    import graft.functions.Exact._
    val orders = Tables.load(spark, dir, "orders")
    def partials(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          sum(money($"o_totalprice")).as("_spend"),
          max(money($"o_totalprice")).as("max_price"),
          min(money($"o_totalprice")).as("min_price"))
    val remaining = orders
      .filter($"o_orderpriority" =!= "1-URGENT")
      .select($"o_custkey",
        money($"o_totalprice").as("max_price"),
        money($"o_totalprice").as("min_price"))
    IncrementalAgg.retractWithRecompute(
        partials(orders),
        partials(orders.filter($"o_orderpriority" === "1-URGENT")),
        remaining,
        keys = Seq("o_custkey"),
        sumCols = Seq("n_orders", "_spend"),
        countCol = "n_orders",
        maxCols = Seq("max_price"),
        minCols = Seq("min_price"))
      .select($"o_custkey", $"n_orders",
        $"_spend".cast("double").as("total_spend"),
        $"max_price".cast("double").as("max_price"),
        $"min_price".cast("double").as("min_price"))
      .orderBy($"o_custkey")
  }

  private val KmeansK = 8
  private val KmeansRounds = 3
  private val Dims = 64

  /** The DuckDB oracle unrolls the Lloyd's loop as chained CTEs (the
    * round count is a compile-time constant, so no recursion is
    * needed — unlike the BPE oracles' single-row-list recursion,
    * every round here is plain relational SQL). Per round: cosine
    * scores with sequential list_reduce folds (matching VectorDot's
    * left-to-right summation bit-for-bit), argmax by (cos DESC,
    * centroid_id), then the fixed-point centroid update — q139's
    * exactness choreography, iterated.
    */
  private def kmeansOracle: String = {
    def dotEE =
      s"""list_reduce(list_transform(range(1, ${Dims + 1}),
         |      i -> CAST(e.embedding[i] AS DOUBLE)
         |        * CAST(e.embedding[i] AS DOUBLE)), (x, y) -> x + y)""".stripMargin
    def dotEC =
      s"""list_reduce(list_transform(range(1, ${Dims + 1}),
         |      i -> CAST(e.embedding[i] AS DOUBLE) * c.ce[i]),
         |      (x, y) -> x + y)""".stripMargin
    def dotCC =
      s"""list_reduce(list_transform(range(1, ${Dims + 1}),
         |      i -> c.ce[i] * c.ce[i]), (x, y) -> x + y)""".stripMargin
    val rounds = (1 to KmeansRounds).map { r =>
      val prev = s"c${r - 1}"
      s"""s$r AS (SELECT e.vec_id, c.centroid_id,
         |    $dotEC
         |    / (sqrt($dotEE) * sqrt($dotCC)) AS cos
         |  FROM embeddings e, $prev c),
         |a$r AS (SELECT vec_id, centroid_id FROM (
         |  SELECT vec_id, centroid_id,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id
         |      ORDER BY cos DESC, centroid_id) AS rn
         |  FROM s$r) t WHERE rn = 1),
         |u$r AS (SELECT a.centroid_id, j.dim,
         |    CAST(FLOOR(CAST(SUM(CAST(FLOOR(
         |        CAST(e.embedding[j.dim + 1] AS DOUBLE) * 1000000)
         |      AS BIGINT)) AS DOUBLE) / COUNT(*)) AS BIGINT)
         |      AS comp_fp,
         |    COUNT(*) AS n_members
         |  FROM a$r a JOIN embeddings e USING (vec_id)
         |  CROSS JOIN (SELECT unnest(generate_series(0, ${Dims - 1}))
         |    AS dim) j
         |  GROUP BY 1, 2),
         |c$r AS (SELECT centroid_id,
         |    list(CAST(comp_fp AS DOUBLE) / 1000000.0 ORDER BY dim)
         |      AS ce
         |  FROM u$r GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH c0 AS (SELECT vec_id AS centroid_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ce
       |  FROM embeddings WHERE vec_id < $KmeansK),
       |$rounds
       |SELECT centroid_id, dim, comp_fp, n_members
       |FROM u$KmeansRounds ORDER BY 1, 2""".stripMargin
  }

  /** Full distributed k-means ([[Similarity.kmeansFit]]): 3 Lloyd
    * rounds over the embedding corpus, k=8 seeds. Each round is one
    * broadcast-assignment pass plus one (centroid, dim) shuffle; the
    * driver holds exactly k·d fixed-point components between rounds.
    * The clustering step that feeds SemDeDup (q182) and IVF (q48/q63)
    * — here the centroids are LEARNED rather than given.
    */
  val q227_kmeans_fit: Q = Q("q227_kmeans_fit", kmeansOracle) {
    (spark, dir) =>
    import spark.implicits._
    Similarity.kmeansFit(
        Tables.loadParallel(spark, dir, "embeddings")
          .select($"vec_id", $"embedding"),
        k = KmeansK, rounds = KmeansRounds)
      .orderBy($"centroid_id", $"dim")
  }

  val all: Seq[Q] = Seq(q226_retract_minmax, q227_kmeans_fit)
}
