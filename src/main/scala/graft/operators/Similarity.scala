package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (ARRAY<FLOAT>).
  *
  * Baseline: brute-force cosine top-k — queries broadcast, candidates
  * streamed, score is a per-row zip_with/aggregate fold (sequential,
  * deterministic, codegen'd; no UDF). Scale path: IVF — assign every
  * vector to its nearest centroid once, then probe only matching cells
  * at query time (candidate set shrinks by the cell count), plus an
  * LSH signed-random-projection bucketing.
  */
object Similarity {

  /** Σ aᵢ·bᵢ via the native codegen'd [[graft.plans.VectorDot]]
    * expression — a primitive float loop in generated code, summed
    * left-to-right (bit-identical to a sequential fold, so oracle
    * parity holds).
    */
  def dot(a: Column, b: Column): Column = graft.plans.VectorDot(a, b)

  /** The composable fold form (interpreted HOF) — kept as the
    * reference semantics VectorDot is property-tested against.
    */
  def dotFold(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * candidates (self excluded), ties broken by candidate id.
    *
    * @param queries    (qid, qvec)
    * @param candidates (cid, cvec)
    */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame,
      k: Int): DataFrame = {
    // norms hoisted per side: one fold per row instead of three per
    // pair — at q queries × n candidates that's 2(q+n) folds replacing
    // 2qn of them
    val q = queries.withColumn("_qnorm", norm(col("qvec")))
    val c = candidates.withColumn("_cnorm", norm(col("cvec")))
    val scored = q
      .crossJoin(c)
      .filter(col("qid") =!= col("cid"))
      .withColumn("cos",
        dot(col("qvec"), col("cvec")) / (col("_qnorm") * col("_cnorm")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("cid"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"), col("cos"))
  }

  /** Hard-negative mining: for each query, the k highest-cosine
    * candidates whose label DIFFERS from the query's (ties → lowest
    * candidate id) — the contrastive-training counterpart of
    * [[bruteForceTopK]]'s self-exclusion. Same scale shape: broadcast
    * the (small) query side, stream candidates, hoist norms so each
    * pair costs one fold.
    *
    * @param queries    (qid, qlabel, qvec)
    * @param candidates (cid, clabel, cvec)
    */
  def hardNegatives(queries: DataFrame, candidates: DataFrame,
      k: Int): DataFrame = {
    // broadcast() made EXPLICIT (r11 verdict nit): the scaladoc's
    // scale contract is "small query side replicated, candidates
    // stream" — leaving it to Catalyst's size estimate would let a
    // stats misestimate silently flip this into a CartesianProduct
    val q = broadcast(queries.withColumn("_qnorm", norm(col("qvec"))))
    val c = candidates.withColumn("_cnorm", norm(col("cvec")))
    val scored = q
      .crossJoin(c)
      .filter(col("qlabel") =!= col("clabel"))
      .withColumn("cos",
        dot(col("qvec"), col("cvec")) / (col("_qnorm") * col("_cnorm")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("cid"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"), col("cos"))
  }

  /** IVF cell assignment: each vector goes to its highest-cosine
    * centroid (ties → lowest centroid id). Centroids are broadcast; the
    * scan is embarrassingly parallel.
    *
    * @param vectors   (vec_id, embedding)
    * @param centroids (centroid_id, centroid)
    */
  def ivfAssign(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    // NOTE (round-12 measurement): rewriting this argmax as
    // max(struct(cos, -centroid_id)) — "aggregate before you
    // shuffle" — was tried and REVERTED: a struct-typed aggregation
    // buffer disqualifies HashAggregateExec (primitive-only mutable
    // buffers), so the plan fell back to ObjectHashAggregate with
    // sort-based spill at 128 keys/partition, and q48/q305/q227
    // measured 1.7–5× SLOWER solo than this window form. The
    // row_number window keeps codegen'd UnsafeRow sorting end to end.
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("centroid_id"))
    vectors
      .withColumn("_vnorm", norm(col("embedding")))
      .crossJoin(broadcast(
        centroids.withColumn("_cnorm", norm(col("centroid")))))
      .withColumn("cos", dot(col("embedding"), col("centroid")) /
        (col("_vnorm") * col("_cnorm")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("centroid_id"), col("cos"))
  }

  /** The SemDeDup assignment stage: every vector joined back to its
    * [[ivfAssign]] cell with its norm hoisted, localCheckpointed ONCE
    * (both pair sides read it; re-deriving would re-run the centroid
    * scan twice). Exposed so the plan guard can drive the real pair
    * stage against real inputs.
    *
    * @return (vec_id, centroid_id, embedding, _n), checkpointed
    */
  def semDedupAssignment(vectors: DataFrame, centroids: DataFrame)
      : DataFrame =
    ivfAssign(vectors, centroids)
      .select(col("vec_id"), col("centroid_id"))
      .join(vectors.select(col("vec_id"), col("embedding")), "vec_id")
      .withColumn("_n", norm(col("embedding")))
      .localCheckpoint()

  /** The SemDeDup pair stage, exposed as its own seam so the plan
    * guard (PlanShapeSpec) can pin its shape directly: verified
    * within-cluster duplicate pairs at cosine ≥ τ over a checkpointed
    * (vec_id, centroid_id, embedding, _n) assignment — an equi-join
    * on centroid_id ONLY (never cross-cluster all-pairs), norms
    * hoisted per side so each candidate pair costs one codegen'd
    * [[dot]] fold.
    *
    * @return (u, v) with u < v — each verified duplicate pair once
    */
  def semDedupPairs(sided: DataFrame, cosThreshold: Double)
      : DataFrame = {
    val a = sided.select(col("centroid_id"), col("vec_id").as("id_a"),
      col("embedding").as("va"), col("_n").as("na"))
    val b = sided.select(col("centroid_id"), col("vec_id").as("id_b"),
      col("embedding").as("vb"), col("_n").as("nb"))
    a.join(b, Seq("centroid_id"))
      .filter(col("id_a") < col("id_b"))
      .filter(dot(col("va"), col("vb")) / (col("na") * col("nb")) >=
        cosThreshold)
      .select(col("id_a").as("u"), col("id_b").as("v"))
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, "SemDeDup:
    * Data-efficient learning at web-scale through semantic
    * deduplication"): cluster-assign every vector ([[ivfAssign]],
    * centroids broadcast), find near-dup pairs ONLY within each
    * cluster ([[semDedupPairs]] — equi-join on centroid_id, never
    * cross-cluster all-pairs), close the verified pairs into
    * components ([[Graph.connectedComponents]], the q88 machinery),
    * and keep exactly ONE representative per component: its minimum
    * vec_id. Component-exact per the paper — a chain a–b–c where
    * cos(a,b) and cos(b,c) pass but cos(a,c) doesn't keeps exactly
    * {a} (the pre-r11 one-hop drop rule dropped both b and c, leaving
    * a component with a kept member whose own kept-neighbor was
    * dropped).
    *
    * Scale shape: within-cluster pair cost is Σ c² over cluster
    * sizes — the knob is the centroid count, exactly the SemDeDup
    * recipe (more cells → smaller c). The assignment is computed ONCE
    * and localCheckpointed (both pair sides read it; re-deriving
    * would re-run the centroid scan twice), the pair join shuffles on
    * centroid_id only — vectors never ride an all-pairs or
    * cross-cluster exchange — and the component closure runs in the
    * id space (pairs only, no vectors), hybrid driver/distributed
    * per [[Graph.connectedComponents]]'s bounded-solve discipline.
    *
    * @param vectors      (vec_id, embedding)
    * @param centroids    (centroid_id, centroid) — bounded, broadcast
    * @param cosThreshold within-cluster pairs at cosine ≥ this are
    *                     duplicates
    * @return one row per input vector: (vec_id, centroid_id, kept)
    */
  def semDedup(vectors: DataFrame, centroids: DataFrame,
      cosThreshold: Double): DataFrame = {
    val sided = semDedupAssignment(vectors, centroids)
    // min-label closure: comps = (id, comp); a vector is the kept
    // representative iff it IS its component's min label (vectors in
    // no pair have no comps row and stay kept)
    val comps = Graph.connectedComponents(
      semDedupPairs(sided, cosThreshold))
    sided.select(col("vec_id"), col("centroid_id"))
      .join(comps, col("vec_id") === col("id"), "left")
      .select(col("vec_id"), col("centroid_id"),
        (col("comp").isNull || col("comp") === col("vec_id"))
          .as("kept"))
  }

  /** Full Lloyd's k-means fit: `rounds` iterations of cosine
    * assignment ([[ivfAssign]]) + centroid update, seeded from the
    * vectors with `vec_id < k`.
    *
    * Each round is one distributed pass: centroids (k·d values)
    * broadcast into the assignment scan, then ONE shuffle of
    * (centroid, dim) partials for the update — the corpus is
    * localCheckpointed once and never re-read from storage. Between
    * rounds the driver collects exactly k·d fixed-point components
    * (bounded, corpus-independent — the same O(1)-per-round
    * discipline as Bpe.learn), so a 100 TB corpus costs `rounds`
    * map-side-heavy passes and nothing else.
    *
    * Determinism across engines and retries: the update step sums
    * floor(v·10⁶) micro-units as longs and takes FLOOR of the IEEE
    * double quotient (see q139's rationale), so round-r centroids are
    * bit-identical everywhere; assignments tie-break by centroid_id.
    * Clusters that lose all members are dropped (deterministically,
    * mirrored by the oracle).
    *
    * @param vectors (vec_id, embedding)
    * @return (centroid_id, dim, comp_fp, n_members) for the final
    *         round — comp_fp is the centroid component in 10⁻⁶ units
    */
  def kmeansFit(vectors: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val spark = vectors.sparkSession
    import spark.implicits._
    val emb = vectors.select(col("vec_id"), col("embedding"))
      .localCheckpoint()
    def update(cents: DataFrame): DataFrame =
      ivfAssign(emb, cents)
        .select(col("vec_id"), col("centroid_id"))
        .join(emb, "vec_id")
        .select(col("centroid_id"),
          posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy(col("centroid_id"), col("dim"))
        .agg(sum(floor(col("v").cast("double") * 1000000)).as("s"),
          count(lit(1)).as("n_members"))
        // FLOOR of the double quotient, not DIV — sums can be
        // negative and DuckDB's // floors while Spark's DIV truncates
        .select(col("centroid_id"), col("dim"),
          floor(col("s").cast("double") / col("n_members"))
            .as("comp_fp"),
          col("n_members"))
    var cents = emb.filter(col("vec_id") < k)
      .select(col("vec_id").as("centroid_id"),
        col("embedding").as("centroid"))
    var out = update(cents)
    for (_ <- 2 to rounds) {
      // k·d fixed-point components — the only driver state per round
      val comps = out.select("centroid_id", "dim", "comp_fp").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      val next = comps.groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (cid, ds) =>
          (cid, ds.sortBy(_._2).map(_._3.toDouble / 1000000.0).toSeq)
        }
      cents = next.toDF("centroid_id", "centroid")
      out = update(cents)
    }
    out
  }

  /** Top-nprobe centroids per query vector — the IVF probe list.
    *
    * @param queries   (qid, qvec)
    * @param centroids (centroid_id, centroid)
    */
  def ivfProbes(queries: DataFrame, centroids: DataFrame, nprobe: Int)
      : DataFrame = {
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("centroid_id"))
    queries
      .withColumn("_qnorm", norm(col("qvec")))
      .crossJoin(broadcast(
        centroids.withColumn("_cnorm", norm(col("centroid")))))
      .withColumn("cos", dot(col("qvec"), col("centroid")) /
        (col("_qnorm") * col("_cnorm")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= nprobe)
      .select(col("qid"), col("centroid_id"))
  }

  /** Full IVF ANN search: assign every vector to its cell once (the
    * index build), probe each query's nprobe nearest cells, score only
    * the vectors living there, keep the top-k. The candidate set
    * shrinks by ~nprobe/ncells versus brute force — this is the 100 TB
    * path: the assignment is the big partitioned table (bucket it by
    * centroid_id on disk), queries and probe lists broadcast, and the
    * expensive cosine fold runs on the reduced candidate set only.
    *
    * @param vectors   (vec_id, embedding) — the corpus
    * @param centroids (centroid_id, centroid)
    * @param queries   (qid, qvec)
    * @return (qid, rank, cid, cos), rank 1..k per query
    */
  def ivfSearch(vectors: DataFrame, centroids: DataFrame,
      queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val assign = ivfAssign(vectors, centroids)
      .select(col("vec_id"), col("centroid_id"))
    val probes = ivfProbes(queries, centroids, nprobe)
    val cand = assign.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"))
    // norms hoisted per side, as in bruteForceTopK
    val v = vectors.withColumn("_vnorm", norm(col("embedding")))
    val q = queries.withColumn("_qnorm", norm(col("qvec")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id"))
    cand
      .join(v, Seq("vec_id"))
      .join(broadcast(q), Seq("qid"))
      .withColumn("cos", dot(col("qvec"), col("embedding")) /
        (col("_qnorm") * col("_vnorm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id").as("cid"), col("cos"))
  }

  /** Signed-random-projection LSH bucket id: sign bit per hyperplane,
    * planes supplied as a literal array-of-arrays (generated once,
    * broadcast as part of the plan — never recomputed per row).
    */
  def srpBucket(vec: Column, planes: Seq[Seq[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      when(dot(vec, typedlit(p)) > 0,
        call_function("shiftleft", lit(1L), lit(i))).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** SRP-LSH bucketed ANN search: vectors and queries hash to a
    * sign-pattern bucket (one bit per hyperplane), candidates are the
    * same-bucket pairs, and only those pay the exact cosine re-rank.
    * Expected candidate set shrinks by ~2^planes versus brute force.
    *
    * The planes are index metadata — a handful of vectors, passed as
    * literals and compiled into the row scan (no join, no recompute
    * per row). At 100 TB: bucket the corpus table by `_bucket` on
    * disk, broadcast the (tiny) bucketed query side, and the probe
    * only touches matching buckets. Note the recall trade: a single
    * bucket probe misses near-neighbors across a hyperplane; probe
    * Hamming-adjacent buckets to buy recall (the IVF variant's
    * nprobe knob plays the same role).
    *
    * @param vectors (vec_id, embedding) — the corpus
    * @param queries (qid, qvec)
    * @param planes  hyperplanes (e.g. sampled corpus vectors or
    *                [[planes]])
    */
  def srpSearch(vectors: DataFrame, queries: DataFrame,
      planes: Seq[Seq[Double]], k: Int): DataFrame = {
    val v = vectors
      .withColumn("_bucket", srpBucket(col("embedding"), planes))
      .withColumn("_vnorm", norm(col("embedding")))
    val q = queries
      .withColumn("_bucket", srpBucket(col("qvec"), planes))
      .withColumn("_qnorm", norm(col("qvec")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id"))
    v.join(broadcast(q), Seq("_bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", dot(col("qvec"), col("embedding")) /
        (col("_qnorm") * col("_vnorm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id").as("cid"), col("cos"))
  }

  /** kNN label-consistency audit — mislabeled-example mining, the
    * data-quality gate run before a labeled corpus trains anything:
    * each vector's k nearest neighbors vote with their labels, and a
    * vector whose neighborhood disagrees with its own label is a
    * suspect (noisy label, outlier, or leaked class).
    *
    * Neighbors come from the vector's own SRP bucket (the q70 index),
    * so the all-vs-all search is a bucket-keyed EQUI self-join — one
    * shuffle per side, never a cross join; plane count bounds the
    * expected bucket size (≈ n/2^planes), which at 100 TB is the knob
    * that keeps per-bucket candidate generation quadratic only in a
    * bounded bucket. The top-k cut is a rank window per vector
    * (WindowGroupLimit pushes the partial top-k below the shuffle);
    * cosine ties break on neighbor id, and the fold is the
    * bit-deterministic [[graft.plans.VectorDot]], so the selected
    * neighbor set is engine-exact.
    *
    * @param vectors (vec_id, embedding, label)
    * @return per SCORED vector (≥1 same-bucket neighbor):
    *         vec_id, label, n_nb (≤ k), n_agree
    */
  def labelConsistency(vectors: DataFrame, planes: Seq[Seq[Double]],
      k: Int): DataFrame = {
    val v = vectors
      .withColumn("_bucket", srpBucket(col("embedding"), planes))
      .withColumn("_n", norm(col("embedding")))
      // a zero vector has no direction: its cosine is 0/0 = NaN, and
      // NaN sorts GREATER than every double, so it would rank FIRST
      // in the cos-desc top-k and silently displace real neighbors —
      // drop degenerate vectors from both sides of the audit
      .filter(col("_n") > 0d)
    val nb = v.select(col("_bucket"), col("vec_id").as("nb_id"),
      col("embedding").as("nb_emb"), col("label").as("nb_label"),
      col("_n").as("_nbn"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("nb_id"))
    v.join(nb, Seq("_bucket"))
      .filter(col("vec_id") =!= col("nb_id"))
      .withColumn("cos",
        dot(col("embedding"), col("nb_emb")) / (col("_n") * col("_nbn")))
      .withColumn("_rank", row_number().over(w))
      .filter(col("_rank") <= k)
      .groupBy(col("vec_id"), col("label"))
      .agg(count(lit(1)).as("n_nb"),
        count(when(col("nb_label") === col("label"), 1)).as("n_agree"))
  }

  /** Deterministic pseudo-random hyperplanes (seeded). */
  def planes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** LSH-bucketed ANN: histogram of bucket occupancy — the telemetry
    * that sizes the probe set.
    */
  def srpBucketHistogram(vectors: DataFrame, nPlanes: Int, dim: Int)
      : DataFrame =
    vectors
      .withColumn("bucket", srpBucket(col("embedding"),
        planes(nPlanes, dim)))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_vectors"))
}
