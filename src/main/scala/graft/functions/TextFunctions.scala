package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis functions for large-scale training-data pipelines:
  * tokenization, token counting, quality signals, language-ID,
  * fingerprinting, shingling. Everything here is a pure Catalyst
  * expression tree (codegen-friendly, no UDFs, no shuffles) so it
  * composes into whole-stage codegen over a 100 TB scan.
  */
object TextFunctions {

  /** Whitespace tokens (keeps leading/trailing empties exactly like
    * `String.split(re, -1)`, matching DuckDB's string_split_regex).
    */
  def tokens(text: Column): Column = split(text, "\\s+")

  def lowerTokens(text: Column): Column = split(lower(text), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: alphanumeric runs + individual punctuation,
    * the standard pre-tokenizer split.
    */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"))

  /** Punctuation-character count (quality signal). */
  def punctCount(text: Column): Column =
    regexp_count(text, lit("[^A-Za-z0-9\\s]"))

  val EnStopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")

  /** Number of tokens drawn from a stopword lexicon. */
  def stopwordCount(text: Column, lexicon: Seq[String] = EnStopwords)
      : Column =
    size(filter(lowerTokens(text), w => w.isin(lexicon: _*)))

  // Language-ID marker lexicons (tiny on purpose: the classic
  // stopword-profile heuristic).
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht"),
    "es" -> Seq("el", "los", "de", "es", "una", "que"),
    "fr" -> Seq("le", "les", "et", "est", "une", "dans"))

  /** n-gram/stopword-profile language ID: CJK codepoints short-circuit
    * to zh; otherwise the marker lexicon with the most hits wins, ties
    * broken in declaration order (en > de > es > fr).
    */
  def languageId(text: Column): Column =
    Let(lowerTokens(text)) { toks =>
      Let(array(LangMarkers.map { case (_, lex) =>
        size(filter(toks, w => w.isin(lex: _*)))
      }: _*)) { scores =>
        val Seq(en, de, es, fr) =
          (1 to 4).map(i => element_at(scores, i))
        when(regexp_count(text, lit("[\\x{4e00}-\\x{9fff}]")) > 0, "zh")
          .when(en >= de && en >= es && en >= fr, "en")
          .when(de >= es && de >= fr, "de")
          .when(es >= fr, "es")
          .otherwise("fr")
      }
    }

  /** Document fingerprint: md5 over the whitespace-normalized,
    * lowercased text — the exact-dedup key. 128-bit hex, so collisions
    * at 100 TB (~10¹¹ docs) stay ≪ 1.
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Overlapping token-window chunks (the LLM-ingest unit): windows of
    * `size` tokens advancing by `size - overlap`, from a pre-staged
    * token array (see shinglesOfTokens for why staging matters). The
    * final partial window is kept.
    */
  def chunksOfTokens(toks: Column, chunkSize: Int, overlap: Int): Column = {
    require(overlap < chunkSize,
      "overlap must be smaller than the chunk size")
    val step = chunkSize - overlap
    // number of windows: ceil(max(n - overlap, 1) / step)
    val n = greatest(size(toks) - overlap, lit(1))
    val nChunks = ceil(n.cast("double") / step).cast("int")
    transform(sequence(lit(0), nChunks - 1),
      i => array_join(slice(toks, i * step + 1, lit(chunkSize)), " "))
  }

  /** Redact email-ish and long-digit-run spans (the cleaning pass a
    * crawl corpus gets before training).
    */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(text,
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
      "\\d{6,}", "<NUM>")

  /** Deterministic train/val/test assignment from a stable id: md5
    * bucket in [0,100) → 90/5/5. Hash-based (never random()) so the
    * split is reproducible and stable under reprocessing.
    */
  def datasetSplit(id: Column): Column = {
    val bucket = graft.plans.Md5PrefixLong(id.cast("string"), 8) % 100
    when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
  }

  /** Distinct word n-gram shingles from an ALREADY-STAGED token array
    * column (default 3), the MinHash/Jaccard unit. Returns an empty
    * array for texts shorter than n words.
    *
    * `toks` must be a plain column reference, not an expression:
    * higher-order-function lambdas are interpreted and re-evaluate
    * non-attribute children once per element, so an inlined
    * split(text) here would re-tokenize the document for every
    * shingle. Stage tokens with `withColumn` first (see
    * Dedup.withBandKeys).
    */
  /** Sorted distinct shingle array straight from text — computed by
    * the single-pass [[graft.plans.SortedShinglesExpr]] kernel (the
    * q157 profile showed shingle STAGING dominating the similarity
    * pipeline; one tight loop replaces per-window interpreted
    * slice+join lambdas). Property-tested ≡ [[sortedShinglesFold]].
    */
  def sortedShingles(text: Column, n: Int = 3): Column =
    graft.plans.SortedShinglesExpr(text, n)

  /** The composable HOF formulation — reference semantics the kernel
    * is property-tested against, with the tokenizer [[Let]]-bound so
    * it evaluates ONCE per row no matter how the optimizer collapses
    * projections. Staging tokens in a `withColumn` is NOT enough:
    * CollapseProject inlines the split back into every reference
    * inside the shingle `when`/`transform`, and interpreted HOF
    * lambdas then re-run the regex per element — measured 4× slower
    * on the corpus staging (see PLANS.md, expression-level hot
    * paths).
    */
  def sortedShinglesFold(text: Column, n: Int = 3): Column =
    org.apache.spark.sql.functions.array_sort(
      Let(lowerTokens(text))(toks => shinglesOfTokens(toks, n)))

  def shinglesOfTokens(toks: Column, n: Int = 3): Column =
    when(size(toks) >= n,
      array_distinct(
        transform(sequence(lit(0), size(toks) - n),
          i => array_join(slice(toks, i + 1, lit(n)), " "))))
      .otherwise(array().cast("array<string>"))

  /** Convenience form over raw text — fine for fixtures and small
    * inputs; hot paths must stage tokens and call shinglesOfTokens.
    */
  def shingles(text: Column, n: Int = 3): Column =
    shinglesOfTokens(lowerTokens(text), n)

  /** POSITIONAL word n-gram shingles: one entry per starting token
    * position, in document order and NOT deduplicated — the
    * longest-duplicate-span unit (element i covers tokens i..i+n−1),
    * where [[sortedShingles]] is the set-similarity unit. Empty array
    * for texts shorter than n words. Same [[Let]] staging as
    * [[sortedShinglesFold]]: the tokenizer evaluates once per row even
    * after CollapseProject inlines the projection.
    */
  def positionalShingles(text: Column, n: Int): Column =
    Let(lowerTokens(text))(toks =>
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => array_join(slice(toks, i + 1, lit(n)), " ")))
        .otherwise(array().cast("array<string>")))
}
