package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions
import graft.operators.{Decontam, Dedup, ExactSubstr, Similarity}

/** Round-11 tranche: the end-to-end curation composition — the
  * "100 TB pipeline" story in ONE oracle-checked artifact. q307 chains
  * the now-complete dedup/curation ladder over `documents`:
  *
  *   raw → exact fingerprint dedup (q43's rule) → exact-substring
  *   coverage gate (q287's spans: drop docs that are mostly verbatim
  *   copies) → MinHash+LSH near-dup dedup (q78) → SemDeDup semantic
  *   dedup (q305, component-exact) → benchmark n-gram decontamination
  *   on the train split (q306) → per-source token-budget packing (q75)
  *
  * and asserts the per-stage survivor COUNT and survivor-id CHECKSUM,
  * so any inter-stage keep-list/schema mismatch (wrong id side kept,
  * a filter applied to the wrong survivor set, a stage silently
  * re-reading the raw corpus) breaks the hash — stage by stage, not
  * just at the end. Exact-substring runs BEFORE MinHash so both
  * fuzzy stages do real work on this corpus: the verbatim-copy docs
  * carry ≥50% duplicated spans (the substring gate's prey), while the
  * shuffled/reworded near-dups have high Jaccard but no long
  * contiguous run (MinHash's prey).
  *
  * Reference anchor: the curriculum's dedup + splitting labs
  * (`2-fact-data-modeling` dedup homework, `assignment_3_spark.py`
  * splits); the composition itself is the training-data north star.
  */
object Extended31 {

  // stage thresholds — the operators' established defaults where one
  // exists (substring spans k8/L16 = q287, gate = spans covering HALF
  // the tokens; minhash jaccard 0.8/k16/b4 = q78; semdedup tau 0.30 =
  // q305; decontam 13-gram dirty run >= 13 = q306; pack rule = q75
  // at a budget of 500 tokens/source so the greedy cut bites on the
  // post-dedup corpus)
  private[queries] val MinhashSeedsSql = graft.operators.Dedup.MinhashSeeds
    .take(16).zipWithIndex.map { case (s, i) => s"($i, $s::BIGINT)" }
    .mkString(", ")

  val q307_curation_e2e: Q = Q(
    "q307_curation_e2e",
    s"""WITH RECURSIVE
      |fp AS (SELECT doc_id,
      |    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS f
      |  FROM documents),
      |s1 AS (SELECT MIN(doc_id) AS doc_id FROM fp GROUP BY f),
      |t2 AS (SELECT d.doc_id,
      |    string_split_regex(lower(d.text), '\\s+') AS tk
      |  FROM documents d JOIN s1 USING (doc_id)),
      |g2 AS (SELECT doc_id, tk,
      |    unnest(range(1, greatest(len(tk) - 7, 0) + 1)) AS i FROM t2),
      |occ2 AS (SELECT doc_id, i - 1 AS pos,
      |    ('0x' || substr(md5(array_to_string(tk[i:i+7], ' ')), 1, 15))
      |      ::BIGINT AS hv FROM g2),
      |m2 AS (SELECT a.doc_id AS da, b.doc_id AS db, a.pos AS pa, b.pos AS pb
      |  FROM occ2 a JOIN occ2 b ON a.hv = b.hv AND a.doc_id < b.doc_id),
      |r2 AS (SELECT da, db, pa - pb AS diag, pb,
      |    pb - ROW_NUMBER() OVER (PARTITION BY da, db, pa - pb
      |      ORDER BY pb) AS grp FROM m2),
      |runs2 AS (SELECT da, db, diag, grp, MIN(pb) AS s,
      |    COUNT(*) + 7 AS len FROM r2 GROUP BY 1, 2, 3, 4),
      |marks2 AS (SELECT DISTINCT db AS doc_id, s, len FROM runs2
      |  WHERE len >= 16),
      |o2 AS (SELECT doc_id, s, s + len AS e,
      |    MAX(s + len) OVER (PARTITION BY doc_id ORDER BY s, s + len
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS maxe
      |  FROM marks2),
      |isl2 AS (SELECT doc_id, s, e,
      |    SUM(CASE WHEN maxe IS NULL OR s > maxe THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY doc_id ORDER BY s, e) AS island
      |  FROM o2),
      |sp2 AS (SELECT doc_id, island, MIN(s) AS s, MAX(e) AS e
      |  FROM isl2 GROUP BY 1, 2),
      |cov2 AS (SELECT doc_id, SUM(e - s) AS dup FROM sp2 GROUP BY 1),
      |s2 AS (SELECT t.doc_id FROM t2 t LEFT JOIN cov2 c USING (doc_id)
      |  WHERE COALESCE(c.dup, 0) * 2 < len(t.tk)),
      |d2 AS (SELECT d.doc_id, d.text FROM documents d JOIN s2 USING (doc_id)),
      |sh3 AS (SELECT doc_id, list_distinct(list_transform(
      |    range(1, greatest(len(string_split_regex(lower(text), '\\s+')) - 2, 1) + 1),
      |    i -> array_to_string(string_split_regex(lower(text), '\\s+')[i:i+2], ' ')))
      |    AS sh FROM d2),
      |h3 AS (SELECT doc_id, ('0x' || substr(md5(x), 1, 15))::BIGINT AS hv
      |  FROM (SELECT doc_id, unnest(sh) AS x FROM sh3 WHERE len(sh) > 0) t),
      |seeds(i, seed) AS (VALUES $MinhashSeedsSql),
      |sig3 AS (SELECT doc_id, i, CAST(MIN(xor(hv, seed)) AS VARCHAR) AS mh
      |  FROM h3 CROSS JOIN seeds GROUP BY doc_id, i),
      |band3 AS (SELECT doc_id,
      |    md5(string_agg(mh, ',' ORDER BY i)) AS band_hash
      |  FROM sig3 GROUP BY doc_id, i // 4),
      |cand3 AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM band3 a JOIN band3 b
      |    ON a.band_hash = b.band_hash AND a.doc_id < b.doc_id),
      |drop3 AS (SELECT DISTINCT id_b FROM cand3
      |  JOIN sh3 sa ON cand3.id_a = sa.doc_id
      |  JOIN sh3 sb ON cand3.id_b = sb.doc_id
      |  WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
      |      / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
      |      >= 0.8),
      |s3 AS (SELECT doc_id FROM d2
      |  WHERE doc_id NOT IN (SELECT id_b FROM drop3)),
      |c4 AS (SELECT vec_id AS centroid_id, embedding AS ce
      |  FROM embeddings WHERE vec_id < 8),
      |e4 AS (SELECT e.vec_id, e.embedding FROM embeddings e
      |  JOIN s3 ON e.vec_id = s3.doc_id),
      |scored4 AS (SELECT vec_id, centroid_id,
      |    list_reduce(list_transform(range(1, 65),
      |      i -> CAST(embedding[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)), (x, y) -> x + y)
      |    / (sqrt(list_reduce(list_transform(range(1, 65),
      |        i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), (x, y) -> x + y))
      |     * sqrt(list_reduce(list_transform(range(1, 65),
      |        i -> CAST(ce[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)), (x, y) -> x + y)))
      |    AS cos
      |  FROM e4, c4),
      |assign4 AS (SELECT vec_id, centroid_id FROM (
      |  SELECT vec_id, centroid_id,
      |    ROW_NUMBER() OVER (PARTITION BY vec_id
      |      ORDER BY cos DESC, centroid_id) AS rn
      |  FROM scored4) t WHERE rn = 1),
      |sided4 AS (SELECT a.vec_id, a.centroid_id, e.embedding,
      |    sqrt(list_reduce(list_transform(range(1, 65),
      |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
      |      (x, y) -> x + y)) AS nrm
      |  FROM assign4 a JOIN e4 e USING (vec_id)),
      |pairs4 AS (SELECT x.vec_id AS u, y.vec_id AS v
      |  FROM sided4 x JOIN sided4 y
      |    ON x.centroid_id = y.centroid_id AND x.vec_id < y.vec_id
      |  WHERE list_reduce(list_transform(range(1, 65),
      |      i -> CAST(x.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE)),
      |      (a, b) -> a + b) / (x.nrm * y.nrm) >= 0.30),
      |sym4 AS (SELECT u AS a, v AS b FROM pairs4
      |  UNION ALL SELECT v, u FROM pairs4),
      |reach4(id, lab) AS (
      |  SELECT DISTINCT a, a FROM sym4
      |  UNION
      |  SELECT s.b, r.lab FROM reach4 r JOIN sym4 s ON r.id = s.a),
      |cc4 AS (SELECT id, MIN(lab) AS comp FROM reach4 GROUP BY id),
      |s4 AS (SELECT s.vec_id AS doc_id FROM sided4 s
      |  LEFT JOIN cc4 k ON s.vec_id = k.id
      |  WHERE k.comp IS NULL OR k.comp = s.vec_id),
      |t5 AS (SELECT d.doc_id,
      |    string_split_regex(lower(d.text), '\\s+') AS tk
      |  FROM documents d JOIN s4 USING (doc_id)
      |  WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 90),
      |tb AS (SELECT string_split_regex(lower(text), '\\s+') AS tk
      |  FROM documents
      |  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 >= 95),
      |g5 AS (SELECT doc_id, tk,
      |    unnest(range(1, greatest(len(tk) - 12, 0) + 1)) AS i FROM t5),
      |occ5 AS (SELECT doc_id, i - 1 AS pos,
      |    ('0x' || substr(md5(array_to_string(tk[i:i+12], ' ')), 1, 15))
      |      ::BIGINT AS hv FROM g5),
      |gb AS (SELECT tk,
      |    unnest(range(1, greatest(len(tk) - 12, 0) + 1)) AS i FROM tb),
      |bench5 AS (SELECT DISTINCT
      |    ('0x' || substr(md5(array_to_string(tk[i:i+12], ' ')), 1, 15))
      |      ::BIGINT AS hv FROM gb),
      |hit5 AS (SELECT o.doc_id, o.pos FROM occ5 o JOIN bench5 b USING (hv)),
      |r5 AS (SELECT doc_id,
      |    pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
      |      AS grp FROM hit5),
      |dirty5 AS (SELECT DISTINCT doc_id FROM
      |  (SELECT doc_id, grp, COUNT(*) AS cnt FROM r5 GROUP BY 1, 2)
      |  WHERE cnt >= 13),
      |s5 AS (SELECT doc_id FROM t5
      |  WHERE doc_id NOT IN (SELECT doc_id FROM dirty5)),
      |d6 AS (SELECT d.doc_id, d.source,
      |    string_split_regex(lower(d.text), '\\s+') AS tk
      |  FROM documents d JOIN s5 USING (doc_id)),
      |q6 AS (SELECT doc_id, source, len(tk) AS nt,
      |    CAST(len(list_filter(tk,
      |      w -> list_contains(['the','a','of','and','to','in','is','for','on','with'], w))) AS DOUBLE)
      |      / len(tk) AS quality FROM d6),
      |w6 AS (SELECT *, SUM(nt) OVER (PARTITION BY source
      |    ORDER BY quality DESC, doc_id ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM q6),
      |s6 AS (SELECT doc_id FROM w6 WHERE cum <= 500),
      |st AS (
      |  SELECT '0_raw' AS stage, COUNT(*) AS n, COALESCE(SUM(doc_id), 0) AS ck FROM documents
      |  UNION ALL SELECT '1_exact', COUNT(*), COALESCE(SUM(doc_id), 0) FROM s1
      |  UNION ALL SELECT '2_exactsubstr', COUNT(*), COALESCE(SUM(doc_id), 0) FROM s2
      |  UNION ALL SELECT '3_minhash', COUNT(*), COALESCE(SUM(doc_id), 0) FROM s3
      |  UNION ALL SELECT '4_semdedup', COUNT(*), COALESCE(SUM(doc_id), 0) FROM s4
      |  UNION ALL SELECT '5_decontam', COUNT(*), COALESCE(SUM(doc_id), 0) FROM s5
      |  UNION ALL SELECT '6_pack', COUNT(*), COALESCE(SUM(doc_id), 0) FROM s6)
      |SELECT stage, CAST(n AS BIGINT) AS n_survivors,
      |  CAST(ck AS BIGINT) AS id_checksum
      |FROM st ORDER BY stage""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    // round-12 measurement note: checkpointing ONE shared docs DF for
    // all six stages was tried and REVERTED — the per-stage
    // scan+repartition lineage costs nothing measurable at sf0.1
    // (solo 7.12 s before vs 7.26 s with the checkpoint), and at
    // corpus scale re-scans with column pruning beat materializing
    // the text column into executor storage. Stages take `docs` as a
    // parameter now (one place to change if that trade ever flips).
    val docs = docsOf(spark, dir)
    // the composite always runs every stage FRESH (never the bench
    // derivatives' memo — the oracle-checked artifact must be
    // self-contained)
    //
    // r13, guide §2.6: the decontamination stage's benchmark gram set
    // (the held-out test split of the RAW corpus) is the one stage
    // input independent of the whole survivor chain — build and
    // materialize it on a background thread while stages 1-4 run,
    // instead of serializing it into stage 5's checkpoint job. Still
    // computed fresh per invocation; only the SCHEDULE overlaps.
    val benchGrams = graft.core.Par.bg {
      graft.operators.Decontam.benchGramsOf(
        docs.filter(TextFunctions.datasetSplit($"doc_id") === "test"),
        "doc_id", "text", n = 13).localCheckpoint()
    }
    val s1 = stage1(spark, dir, docs)
    val s2 = stage2(spark, dir, s1, docs)
    val s3 = stage3(spark, dir, s2, docs)
    val s4 = stage4(spark, dir, s3)
    val s5 = stage5(spark, dir, s4, docs, Some(benchGrams()))
    val s6 = stage6(spark, dir, s5, docs)
    Seq(
      census("0_raw", docs.select($"doc_id")),
      census("1_exact", s1), census("2_exactsubstr", s2),
      census("3_minhash", s3), census("4_semdedup", s4),
      census("5_decontam", s5), census("6_pack", s6))
      .reduce(_ unionByName _)
      .orderBy($"stage")
  }

  // ---- the ladder stages, factored so q307 composes them fresh and
  // the q307a–f bench derivatives can time each one in isolation ----

  private def docsOf(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Tables.loadParallel(spark, dir, "documents")

  /** stage 1 — exact dedup: keep the min doc_id per fingerprint
    * (q43's key); a map-side-combined group-by, never a window.
    * Checkpointed: every later stage count + stage 2 read it.
    */
  private def stage1(spark: org.apache.spark.sql.SparkSession,
      dir: String,
      docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    docs
      .select($"doc_id", TextFunctions.fingerprint($"text").as("_fp"))
      .groupBy($"_fp").agg(min($"doc_id").as("doc_id"))
      .select($"doc_id")
      .localCheckpoint()
  }

  /** stage 2 — exact-substring coverage gate (q287's spans): drop
    * any survivor whose merged >=16-token cross-doc duplicate spans
    * cover at least HALF its tokens (the verbatim-copy docs).
    */
  private def stage2(spark: org.apache.spark.sql.SparkSession,
      dir: String, s1: org.apache.spark.sql.DataFrame,
      docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val d1 = docs.join(s1, "doc_id")
    val cov = ExactSubstr.dupSpans(d1, "doc_id", "text",
        k = 8, minTokens = 16)
      .groupBy($"doc".as("doc_id")).agg(sum($"len").as("_dup"))
    d1.select($"doc_id",
        size(TextFunctions.lowerTokens($"text")).as("_n"))
      .join(cov, Seq("doc_id"), "left")
      .filter(coalesce($"_dup", lit(0L)) * 2 < $"_n")
      .select($"doc_id")
      .localCheckpoint()
  }

  /** stage 3 — MinHash+LSH near-dup dedup over the substring-gate
    * survivors (q78's operator: banded candidates → Jaccard >= 0.8
    * verify — catches the reworded/shuffled near-dups whose spans
    * the substring gate can't see).
    */
  private def stage3(spark: org.apache.spark.sql.SparkSession,
      dir: String, s2: org.apache.spark.sql.DataFrame,
      docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    Dedup.nearDupDedup(docs.join(s2, "doc_id"),
        "text", "doc_id", jaccardThreshold = 0.8, k = 16, bands = 4)
      .select($"doc_id")
      .localCheckpoint()
  }

  /** stage 4 — SemDeDup over the survivors' embeddings (vec_id =
    * doc_id; q305's operator, component-exact keep lists).
    */
  private def stage4(spark: org.apache.spark.sql.SparkSession,
      dir: String, s3: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val emb = Tables.loadParallel(spark, dir, "embeddings")
    val centroids = emb.filter($"vec_id" < 8)
      .select($"vec_id".as("centroid_id"), $"embedding".as("centroid"))
    Similarity.semDedup(
        emb.join(s3, $"vec_id" === $"doc_id")
          .select($"vec_id", $"embedding"),
        centroids, cosThreshold = 0.30)
      .filter($"kept")
      .select($"vec_id".as("doc_id"))
      .localCheckpoint()
  }

  /** stage 5 — decontamination (q306's audit): the TRAIN-split
    * survivors, minus any doc with a >=13-gram colliding run against
    * the ORIGINAL corpus's held-out test split (the benchmark is
    * external to the dedup chain).
    */
  private def stage5(spark: org.apache.spark.sql.SparkSession,
      dir: String, s4: org.apache.spark.sql.DataFrame,
      docs: org.apache.spark.sql.DataFrame,
      benchGrams: Option[org.apache.spark.sql.DataFrame] = None)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val train = docs.join(s4, "doc_id")
      .filter(TextFunctions.datasetSplit($"doc_id") === "train")
    // the benchmark gram set is chain-independent: the composite
    // prefetches it on a background thread (guide §2.6) and passes it
    // in; the q307e derivative keeps building it inline so its bench
    // label still carries the full stage cost (attribution contract)
    val grams = benchGrams.getOrElse(Decontam.benchGramsOf(
      docs.filter(TextFunctions.datasetSplit($"doc_id") === "test"),
      "doc_id", "text", n = 13))
    val dirty = Decontam.ngramAuditGrams(train, grams,
        "doc_id", "text", n = 13)
      .filter($"longest_run" >= 13)
      .select($"doc_id")
    train.select($"doc_id")
      .join(dirty, Seq("doc_id"), "left_anti")
      .localCheckpoint()
  }

  /** stage 6 — per-source token-budget packing (q75's greedy rule:
    * stopword-ratio quality desc, doc_id tie-break, cum <= 500).
    * NOT checkpointed — it is the ladder's lazy tail.
    */
  private def stage6(spark: org.apache.spark.sql.SparkSession,
      dir: String, s5: org.apache.spark.sql.DataFrame,
      docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val q = docs.join(s5, "doc_id")
      .withColumn("_ltoks", TextFunctions.lowerTokens($"text"))
      .select($"doc_id", $"source", size($"_ltoks").as("_nt"),
        (size(filter($"_ltoks",
            w => w.isin(TextFunctions.EnStopwords: _*)))
          .cast("double") / size($"_ltoks")).as("_q"))
    val w = Window.partitionBy($"source")
      .orderBy($"_q".desc, $"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    q.withColumn("_cum", sum($"_nt").over(w))
      .filter($"_cum" <= 500)
      .select($"doc_id")
  }

  /** census: count + id checksum, so the exact survivor SET of a
    * stage is hash-pinned, not just its size.
    */
  private def census(stage: String,
      ids: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, count, lit, sum}
    ids.agg(count(lit(1)).as("n_survivors"),
        coalesce(sum(org.apache.spark.sql.functions.col("doc_id")),
          lit(0L)).as("id_checksum"))
      .select(lit(stage).as("stage"),
        org.apache.spark.sql.functions.col("n_survivors"),
        org.apache.spark.sql.functions.col("id_checksum"))
  }

  // ---- bench-only per-stage derivatives (q307a–f): the q240a/b
  // memo pattern. Each derivative recomputes ITS stage fresh every
  // call and memoizes the result; its input comes from the memo,
  // which the alphabetically-earlier derivative repopulated moments
  // before (Bench runs labels in name order within a pass). So the
  // median of q307<x> is that stage's own cost, sum(a..f) ≈ the
  // composite, and a regression in the 6.9 s composite is
  // attributable to a stage from the driver artifact alone.
  // BENCH_ONLY_DERIVATIVES in drift_check ties each label to its
  // oracle-checked composite (q307).

  private val stageCache = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession, String, Int),
      org.apache.spark.sql.DataFrame]

  private def cachedStage(spark: org.apache.spark.sql.SparkSession,
      dir: String, k: Int): org.apache.spark.sql.DataFrame =
    stageCache.getOrElse((spark, dir, k), freshStage(spark, dir, k))

  private def freshStage(spark: org.apache.spark.sql.SparkSession,
      dir: String, k: Int): org.apache.spark.sql.DataFrame = {
    // derivatives keep the per-stage docsOf lineage (NOT the
    // composite's shared checkpoint) so each label still carries its
    // own load cost — the attribution contract
    val out = k match {
      case 1 => stage1(spark, dir, docsOf(spark, dir))
      case 2 => stage2(spark, dir, cachedStage(spark, dir, 1),
        docsOf(spark, dir))
      case 3 => stage3(spark, dir, cachedStage(spark, dir, 2),
        docsOf(spark, dir))
      case 4 => stage4(spark, dir, cachedStage(spark, dir, 3))
      case 5 => stage5(spark, dir, cachedStage(spark, dir, 4),
        docsOf(spark, dir))
      case _ => stage6(spark, dir, cachedStage(spark, dir, 5),
        docsOf(spark, dir))
    }
    stageCache((spark, dir, k)) = out
    out
  }

  private def stageBench(label: String, k: Int)(
      spark: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame =
    census(label, freshStage(spark, dir, k))

  def exactBench(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    stageBench("1_exact", 1)(spark, dir)
  def substrBench(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    stageBench("2_exactsubstr", 2)(spark, dir)
  def minhashBench(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    stageBench("3_minhash", 3)(spark, dir)
  def semdedupBench(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    stageBench("4_semdedup", 4)(spark, dir)
  def decontamBench(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    stageBench("5_decontam", 5)(spark, dir)
  def packBench(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val out = stageBench("6_pack", 6)(spark, dir)
    // f is the ladder's last derivative (labels run in name order per
    // pass): drop the memo now so the checkpointed stage outputs stop
    // pinning executor storage for the ~300 queries that run after
    // (r12 verdict #3). The DataFrame just built holds its own strong
    // refs to the checkpoint RDDs it reads — clearing the map only
    // releases the blocks once the bench drops the DF and the
    // ContextCleaner collects them. The next pass's q307a repopulates
    // from scratch (each derivative recomputes ITS stage fresh).
    stageCache.clear()
    out
  }

  val all: Seq[Q] = Seq(q307_curation_e2e)
}
