package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.{Feistel, TextFunctions}
import graft.operators.Sampling

/** Round-8 tranche IX: the training-order layer — what turns a curated
  * corpus into a SCHEDULE. Deterministic global shuffle (a Feistel
  * permutation: bijective pseudo-random keys computed per row — no
  * sort-by-rand() nondeterminism, no state), the mixture-weight
  * interleave (the q275 DoReMi ppm weights made executable as an
  * emission order with the Bresenham drift bound), and the shard
  * manifest (per-shard counts/tokens/key-checksum — the artifact a
  * 1000-executor training job actually consumes).
  *
  * Reference anchor: the curriculum's batch-pipeline homework; these
  * are the reproducible-training-order extensions on top.
  */
object Extended23 {

  /** The 4-round Feistel chain over 16-bit halves as DuckDB CTEs
    * f0..f4 (doc_id ∈ [0, 2^32) — the synthetic ids are far below),
    * mirroring [[graft.functions.Feistel.key]] bit for bit: round
    * function = 60-bit md5 prefix of "graft:&lt;round&gt;:&lt;R&gt;"
    * mod 2^16, XOR into the left half, swap.
    */
  private def feistelCtes: String = {
    val rounds = (1 to 4).map { rd =>
      s"""f$rd AS (SELECT doc_id, r AS l,
        |  xor(l, ('0x' || substr(md5('graft:$rd:' || r::VARCHAR),
        |    1, 15))::BIGINT % 65536) AS r FROM f${rd - 1})""".stripMargin
    }.mkString(",\n")
    s"""f0 AS (SELECT doc_id, doc_id // 65536 AS l,
      |  doc_id % 65536 AS r FROM documents),
      |$rounds,
      |fk AS (SELECT doc_id, l * 65536 + r AS fkey FROM f4)""".stripMargin
  }

  /** Deterministic global shuffle ([[Feistel.key]]): every doc mapped
    * through a 4-round Feistel permutation of [0, 2^32) — bijective
    * whatever the round function, so keys are collision-free and the
    * induced order is a reproducible pseudo-random shuffle computed
    * per row. `shard = key mod 16` gives the balanced bucketing a
    * training job reads. The permutation costs ZERO Spark shuffle —
    * it rides the scan projection.
    */
  val q281_feistel_shuffle: Q = Q(
    "q281_feistel_shuffle",
    s"""WITH $feistelCtes
      |SELECT doc_id, fkey, fkey % 16 AS shard FROM fk
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    // plain load, NOT loadParallel: a pure projection needs no
    // repartition — the only exchange in the plan is the output sort
    Tables.load(spark, dir, "documents")
      .select($"doc_id",
        Feistel.key($"doc_id", halfBits = 16, rounds = 4,
          salt = "graft").as("fkey"))
      .select($"doc_id", $"fkey", pmod($"fkey", lit(16L)).as("shard"))
      .orderBy($"doc_id")
  }

  /** Mixture-schedule interleave ([[Sampling.interleaveSchedule]]):
    * per-source ppm shares (largest-remainder apportionment of doc
    * counts — Σ = 10⁶ identically) turned into an emission order via
    * the midpoint rule `pos = (2k−1)·10⁶ div (2·w_ppm)`; any prefix
    * of the (pos, source, k) order holds T·w/10⁶ ± 1 items per
    * source. First 200 slots shipped (TakeOrdered — the full order is
    * the consumer's sort).
    */
  val q282_interleave_schedule: Q = Q(
    "q282_interleave_schedule",
    """WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS mass
      |  FROM documents GROUP BY 1),
      |t AS (SELECT CAST(SUM(mass) AS BIGINT) AS tot FROM c),
      |q AS (SELECT source, mass, (1000000 * mass) // tot AS fl,
      |    (1000000 * mass) % tot AS rem FROM c CROSS JOIN t),
      |r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, source)
      |    AS rk FROM q),
      |e AS (SELECT CAST(1000000 - SUM(fl) AS BIGINT) AS ex FROM q),
      |w AS (SELECT source, CAST(fl + CASE WHEN rk <= (SELECT ex
      |    FROM e) THEN 1 ELSE 0 END AS BIGINT) AS w_ppm FROM r),
      |d AS (SELECT doc_id, source, ROW_NUMBER() OVER
      |    (PARTITION BY source ORDER BY doc_id) AS k FROM documents),
      |s AS (SELECT d.doc_id, d.source, CAST(d.k AS BIGINT) AS k,
      |    ((2 * d.k - 1) * 1000000) // (2 * w.w_ppm) AS pos
      |  FROM d JOIN w USING (source) WHERE w.w_ppm > 0)
      |SELECT pos, source, k, doc_id FROM s
      |ORDER BY pos, source, k LIMIT 200""".stripMargin) {
    (spark, dir) =>
    import spark.implicits._
    val docs = Tables.loadParallel(spark, dir, "documents")
    val counts = docs.groupBy($"source")
      .agg(count(lit(1)).cast("long").as("mass"))
    val weights = Sampling.allocateLargestRemainder(
        counts, Seq("source"), "mass", budget = 1000000L)
      .select($"source", $"n_alloc".as("w_ppm"))
    Sampling.interleaveSchedule(
        docs.select($"source", $"doc_id"), "source", "doc_id", weights)
      .select($"pos", $"source", $"k", $"doc_id")
      .orderBy($"pos", $"source", $"k").limit(200)
  }

  /** Shard manifest: the artifact a training job consumes — per
    * Feistel shard: doc count, token total, and an order-free
    * `bit_xor` checksum of the member keys (verifiable in any engine,
    * in any read order). One scan, one keyed aggregate; the manifest
    * is shard-bounded (16 rows).
    */
  val q283_shard_manifest: Q = Q(
    "q283_shard_manifest",
    s"""WITH $feistelCtes,
      |n AS (SELECT doc_id, CAST(len(string_split_regex(lower(text),
      |    '\\s+')) AS BIGINT) AS nt FROM documents)
      |SELECT fkey % 16 AS shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(nt) AS BIGINT) AS n_tokens,
      |  CAST(bit_xor(fkey) AS BIGINT) AS key_xor
      |FROM fk JOIN n USING (doc_id)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.loadParallel(spark, dir, "documents")
      .select(
        pmod(Feistel.key($"doc_id"), lit(16L)).as("shard"),
        size(TextFunctions.lowerTokens($"text")).cast("long").as("nt"),
        Feistel.key($"doc_id").as("fkey"))
      .groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"),
        sum($"nt").as("n_tokens"),
        expr("bit_xor(fkey)").as("key_xor"))
      .orderBy($"shard")
  }

  val all: Seq[Q] = Seq(q281_feistel_shuffle, q282_interleave_schedule,
    q283_shard_manifest)
}
