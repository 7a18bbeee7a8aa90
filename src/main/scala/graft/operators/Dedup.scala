package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deduplication operators for training-data pipelines: exact
  * (fingerprint group-by), MinHash+LSH banding, SimHash, and n-gram
  * Jaccard verification.
  *
  * Scale design: signatures (fingerprint, minhash, bands, simhash) are
  * ALL per-row Catalyst expression trees — zero shuffles to compute
  * over 100 TB. The only exchanges are the final group-bys on
  * hash/bucket keys, which reduce to (key, count/min) pairs with
  * map-side partial aggregation. Candidate verification touches only
  * LSH-bucket collisions, never the full O(n²) pair space.
  */
object Dedup {

  /** Exact dedup: keep the lowest-id row per normalized-text
    * fingerprint (reference A9/W2 dedup patterns, made total-ordered).
    */
  def exactDedup(df: DataFrame, textCol: String, idCol: String)
      : DataFrame =
    df.withColumn("_fp", TextFunctions.fingerprint(col(textCol)))
      .groupBy(col("_fp"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .drop("_fp")

  /** MinHash signature over a shingle-set column: k independent hash
    * functions realized as md5("<i>:" + shingle) with per-row
    * array_min — deterministic across engines, no shuffle.
    */
  def minhashSignature(shingleSet: Column, k: Int = 16): Column =
    graft.functions.Let(shingleSet) { sh =>
      transform(sequence(lit(0), lit(k - 1)),
        i => array_min(transform(sh,
          s => md5(concat(i.cast("string"), lit(":"), s)))))
    }

  /** LSH band keys: the signature sliced into `bands` groups of
    * `rowsPerBand`, each hashed to one bucket key.
    */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int)
      : Column =
    graft.functions.Let(signature) { sig =>
      transform(sequence(lit(0), lit(bands - 1)),
        b => md5(array_join(
          slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)), ",")))
    }

  /** Stage shingles → signature → band keys as separate projections.
    * Inlining them would re-evaluate the tokenize+shingle subtree once
    * per minhash lambda (k×) and again per band (CollapseProject keeps
    * non-cheap multi-referenced projections separate) — staging turns
    * an O(k·|bands|) blow-up into one evaluation each.
    */
  private def withBandKeys(df: DataFrame, textCol: String, k: Int,
      bands: Int): DataFrame =
    df.withColumn("_toks", TextFunctions.lowerTokens(col(textCol)))
      .withColumn("_sh", TextFunctions.shinglesOfTokens(col("_toks")))
      .withColumn("_sig", minhashSignature(col("_sh"), k))
      .withColumn("_bands", lshBandKeys(col("_sig"), bands, k / bands))

  /** Per-band LSH bucket summary: buckets and collision counts — the
    * candidate-generation telemetry of a near-dup pipeline.
    */
  def lshBandSummary(df: DataFrame, textCol: String,
      k: Int = 16, bands: Int = 4): DataFrame = {
    withBandKeys(df, textCol, k, bands)
      .select(posexplode(col("_bands")).as(Seq("band_id", "band_hash")))
      .groupBy(col("band_id"))
      .agg(
        countDistinct(col("band_hash")).as("n_buckets"),
        (count(lit(1)) - countDistinct(col("band_hash")))
          .as("n_collisions"))
  }

  /** LSH candidate pairs: ids colliding in at least one band. */
  def lshCandidatePairs(df: DataFrame, textCol: String, idCol: String,
      k: Int = 16, bands: Int = 4): DataFrame = {
    val exploded = withBandKeys(df, textCol, k, bands)
      .select(col(idCol).as("id"), explode(col("_bands")).as("band_hash"))
    val a = exploded.as("a")
    val b = exploded.as("b")
    a.join(b, col("a.band_hash") === col("b.band_hash") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Word n-gram Jaccard similarity between two shingle-set columns.
    * |A∪B| = |A|+|B|−|A∩B|, so one intersect pass suffices (the inputs
    * are already distinct sets).
    */
  def jaccard(shinglesA: Column, shinglesB: Column): Column = {
    val inter = size(array_intersect(shinglesA, shinglesB))
    val union = size(shinglesA) + size(shinglesB) - inter
    when(union === 0, 0.0)
      .otherwise(inter.cast("double") / union.cast("double"))
  }

  /** Jaccard over PRE-SORTED distinct shingle arrays, scored by the
    * codegen'd merge-walk [[graft.plans.SortedIntersectCount]] — the
    * hot-loop form for verify stages that score millions of candidate
    * pairs (sort each document's shingles once, not per pair).
    */
  def jaccardSorted(sortedA: Column, sortedB: Column): Column = {
    val inter = graft.plans.SortedIntersectCount(sortedA, sortedB)
    val union = size(sortedA) + size(sortedB) - inter
    when(union === 0, 0.0)
      .otherwise(inter.cast("double") / union.cast("double"))
  }

  /** 60-bit SimHash over the token multiset: per-token md5-derived
    * 60-bit hash, per-bit ±1 majority vote, folded entirely inside one
    * expression (no shuffle).
    */
  def simhash(text: Column): Column = {
    val toks = TextFunctions.lowerTokens(text)
    // hash each token ONCE (its own transform pass) — were the md5
    // inlined into the vote lambda, interpreted evaluation would
    // recompute it for each of the 60 bit positions
    val hashes = transform(toks,
      t => conv(substring(md5(t), 1, 15), 16, 10).cast("long"))
    val votes = aggregate(
      hashes,
      array_repeat(lit(0), 60),
      (acc, hv) =>
        zip_with(acc, sequence(lit(0), lit(59)), (a, j) =>
          a + when(call_function("shiftright", hv, j)
            .bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)))
    aggregate(
      zip_with(votes, sequence(lit(0), lit(59)), (s, j) =>
        when(s > 0, call_function("shiftleft", lit(1L), j))
          .otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Hamming distance between two SimHash values — the near-dup
    * predicate (`dist <= threshold`).
    */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("int")
}
