package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftbridge.Bridge
import graft.operators.Dedup

/** SQL registration for the engine's custom Catalyst expressions, so
  * `spark.sql` users get them too:
  *
  *   vector_dot(a, b)              — codegen'd float/double dot product
  *   sorted_intersect_count(a, b)  — merge-walk |A ∩ B| (sorted sets)
  *   minhash_sig(shingles)         — one-hash MinHash signature (k=16)
  *   md5_prefix_long(s)            — 60-bit md5-prefix hash of a string
  *   md5_prefix_longs(arr)         — the same, element-wise over an array
  *   simhash_sig(tokens)           — 64-bit SimHash of a token array
  *   sorted_shingles(text, n)      — distinct sorted n-token shingle
  *                                   strings (n a literal int)
  *   char_bigrams(s)               — code-point character bigram array
  *   multi_contains_count(s, arr)  — distinct blocklist patterns
  *                                   contained (one Aho–Corasick walk;
  *                                   arr a literal ARRAY<STRING>)
  *   unicode_normalize(s, form)    — UAX #15 normalization (form a
  *                                   literal 'NFC'/'NFD'/'NFKC'/'NFKD')
  *
  * plus the t-digest aggregates (`graft.functions.TDigest`, δ=100 and
  * the p50/p95 probes fixed at registration — `spark.udf.register`
  * binds an Aggregator instance, not a parameterized builder):
  *
  *   tdigest_p50_p95(v)                  — array(p50, p95) estimates
  *   tdigest_sketch(v)                   — the mergeable centroid state
  *   tdigest_merge_p50_p95(means, ws)    — union quantiles over sketches
  *
  * and the count-min aggregates (`graft.functions.CountMin`, width
  * fixed at the 512 default — same instance-binding note):
  *
  *   countmin_sketch(item)               — flattened 4×512 counter grid
  *   countmin_merge(sk)                  — exact union grid (linearity)
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    import org.apache.spark.sql.{functions => F, Encoders}
    import graft.functions.TDigest
    spark.udf.register("tdigest_p50_p95",
      F.udaf(new TDigest.QuantilesAgg(100, Seq(0.5, 0.95)),
        Encoders.scalaDouble))
    spark.udf.register("tdigest_sketch",
      F.udaf(new TDigest.SketchAgg(100), Encoders.scalaDouble))
    spark.udf.register("tdigest_merge_p50_p95",
      F.udaf(new TDigest.MergeAgg(100, Seq(0.5, 0.95)),
        Encoders.product[TDigest.Sketch]))
    spark.udf.register("countmin_sketch",
      F.udaf(new graft.functions.CountMinSketch(
        graft.functions.CountMin.DefaultWidth), Encoders.STRING))
    spark.udf.register("countmin_merge",
      F.udaf(new graft.functions.CountMinMerge(
        graft.functions.CountMin.DefaultWidth),
        org.apache.spark.sql.catalyst.encoders
          .ExpressionEncoder[Seq[Long]]()))
    Bridge.registerFunction(spark, "vector_dot",
      exprs => VectorDot(exprs(0), exprs(1)))
    Bridge.registerFunction(spark, "sorted_intersect_count",
      exprs => SortedIntersectCount(exprs(0), exprs(1)))
    Bridge.registerFunction(spark, "minhash_sig",
      exprs => MinHashSig(exprs.head, Dedup.MinhashSeeds))
    Bridge.registerFunction(spark, "md5_prefix_long",
      exprs => Md5PrefixLong(exprs.head, 15))
    Bridge.registerFunction(spark, "md5_prefix_longs",
      exprs => Md5PrefixLongs(exprs.head, 15))
    Bridge.registerFunction(spark, "simhash_sig",
      exprs => SimHashSig(exprs.head))
    Bridge.registerFunction(spark, "sorted_shingles", exprs =>
      SortedShinglesExpr(exprs(0), exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(n, _) =>
          n.toString.toInt
        case other => throw new IllegalArgumentException(
          s"sorted_shingles n must be a literal int, got $other")
      }))
    Bridge.registerFunction(spark, "char_bigrams",
      exprs => CharBigrams(exprs.head))
    Bridge.registerFunction(spark, "multi_contains_count", exprs => {
      import org.apache.spark.sql.catalyst.util.ArrayData
      import org.apache.spark.sql.types.{ArrayType, StringType}
      val pats = exprs(1) match {
        case e if e.foldable && (e.dataType match {
          case ArrayType(StringType, _) => true
          case _ => false
        }) =>
          val ad = e.eval().asInstanceOf[ArrayData]
          require(ad != null, "multi_contains_count: NULL pattern array")
          (0 until ad.numElements()).map { i =>
            require(!ad.isNullAt(i),
              "multi_contains_count: NULL pattern element")
            ad.getUTF8String(i).toString
          }
        case other => throw new IllegalArgumentException(
          "multi_contains_count patterns must be a foldable " +
            s"ARRAY<STRING> literal (the automaton builds once per " +
            s"plan), got $other")
      }
      MultiContainsCount(exprs(0), pats)
    })
    Bridge.registerFunction(spark, "unicode_normalize", exprs =>
      UnicodeNormalize(exprs(0), exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions
          .Literal(f, org.apache.spark.sql.types.StringType) if f != null =>
          f.toString
        case other => throw new IllegalArgumentException(
          s"unicode_normalize form must be a literal string, got $other")
      }))
    Bridge.registerFunction(spark, "window_energies", exprs => {
      def litInt(e: org.apache.spark.sql.catalyst.expressions.Expression,
          what: String): Int = e match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v, _)
          if v != null => v.toString.toInt
        case other => throw new IllegalArgumentException(
          s"window_energies $what must be a literal int, got $other")
      }
      WindowEnergiesExpr(exprs(0), litInt(exprs(1), "windowLen"),
        litInt(exprs(2), "hop"))
    })
  }
}
