package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Diversity-coreset selection over int-code embedding vectors — the
  * "pick k maximally-spread exemplars" data-selection primitive
  * (deduplication's dual: instead of dropping the redundant, keep the
  * extreme). Greedy farthest-point traversal = the classic
  * 2-approximation to the k-center objective (Gonzalez 1985), in the
  * repo's exact-integer geometry ([[ClusterEval.int8Codes]] squared
  * L2), so every selection decision is a deterministic integer
  * comparison both engines replay identically.
  *
  * Reference anchor: the curriculum's vector labs
  * (`3-spark-fundamentals` similarity homework); coreset selection is
  * the training-data extension (the seed-picking step of
  * SemDeDup-style curation and kmeans++-like inits).
  */
object Coreset {

  /** Greedy k-center: seed = smallest id, then k−1 rounds of "add the
    * point farthest from the selected set" (ties to the smaller id).
    *
    * `idCol` must be UNIQUE: the seed pick and the per-round
    * exclusion are both keyed by id, so a duplicated id would make
    * the seed nondeterministic and silently shrink the candidate pool
    * (every row sharing a picked id drops out). Enforced with one
    * up-front aggregate — loud failure beats a quietly wrong coreset,
    * and the guard costs one map-side-combined pass before a loop
    * that scans the corpus k times anyway.
    *
    * Scale shape: the selected set is ≤ k code vectors, shipped into
    * each round as a broadcast LITERAL; the per-point min-distance is
    * an in-row fold (nested higher-order functions, no UDF) and the
    * round's argmax is one TakeOrderedAndProject(1) — so each round
    * is ONE corpus scan with O(k·dim) work per row and O(1) rows
    * moved, and the driver holds exactly k rows total (the bounded-
    * collect pattern). k rounds = k scans; no checkpoint — re-reading
    * the parquet beats pinning a corpus in memory (the quantize is
    * in-row and cheap). A billion-row corpus never shuffles at all.
    *
    * @param vecs     (idCol, codesCol) — codes as array<long>
    *                 ([[ClusterEval.int8Codes]] output or any exact
    *                 integer embedding)
    * @param k        exemplars to select (bounded driver state: k
    *                 code vectors — keep ≤ ~thousands)
    * @return k rows `step (1-based), vec_id, sel_d2` — the point's
    *         squared distance to the already-selected set at the
    *         moment it was picked (the non-increasing "radius
    *         sequence"; step 1 = 0 by convention). Fewer than k rows
    *         when the input has fewer than k points.
    */
  def kCenterGreedy(vecs: DataFrame, idCol: String, codesCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = vecs.sparkSession
    import spark.implicits._
    val pts = vecs.select(col(idCol).cast("long").as("id"),
      col(codesCol).as("codes"))
    val dup = pts.groupBy(col("id")).agg(count(lit(1)).as("_n"))
      .filter(col("_n") > 1).select(col("id")).head(1)
    require(dup.isEmpty,
      s"kCenterGreedy: '$idCol' must be unique, but id " +
        s"${dup.headOption.map(_.get(0)).orNull} appears more than " +
        "once — duplicate ids make the seed pick nondeterministic " +
        "and silently shrink the candidate pool")
    val seed = pts.orderBy(col("id")).limit(1)
      .as[(Long, Seq[Long])].collect()
    if (seed.isEmpty) {
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("step",
            org.apache.spark.sql.types.IntegerType, nullable = false),
          org.apache.spark.sql.types.StructField("vec_id",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("sel_d2",
            org.apache.spark.sql.types.LongType, nullable = false))))
    }
    val picked = scala.collection.mutable.ArrayBuffer(
      (1, seed(0)._1, 0L, seed(0)._2))
    while (picked.size < k) {
      val sel = typedLit(picked.map(_._4).toSeq)
      val next = pts
        .filter(!col("id").isInCollection(picked.map(_._2)))
        .select(col("id"), col("codes"),
          array_min(transform(sel,
            s => ClusterEval.sqDist(col("codes"), s))).as("md"))
        .orderBy(col("md").desc, col("id"))
        .limit(1)
        .as[(Long, Seq[Long], Long)].collect()
      if (next.isEmpty) {
        return picked.toSeq
          .map { case (s, i, d, _) => (s, i, d) }
          .toDF("step", "vec_id", "sel_d2")
      }
      picked += ((picked.size + 1, next(0)._1, next(0)._3, next(0)._2))
    }
    picked.toSeq.map { case (s, i, d, _) => (s, i, d) }
      .toDF("step", "vec_id", "sel_d2")
  }
}
