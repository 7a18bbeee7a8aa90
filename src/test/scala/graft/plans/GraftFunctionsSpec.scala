package graft.plans

import graft.SparkSpec

class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("custom expressions are callable from SQL") {
    GraftFunctions.register(spark)
    Seq((Seq(1f, 2f), Seq(3f, 4f), Seq("a", "b"), Seq("b", "c")))
      .toDF("va", "vb", "sa", "sb")
      .createOrReplaceTempView("gf")
    val row = spark.sql(
      """SELECT vector_dot(va, vb) AS d,
        |       sorted_intersect_count(sa, sb) AS c,
        |       size(minhash_sig(sa)) AS k,
        |       md5_prefix_long(sa[0]) AS h
        |FROM gf""".stripMargin).head()
    assert(row.getDouble(0) == 11.0)
    assert(row.getInt(1) == 1)
    assert(row.getInt(2) == 16)
    assert(row.getLong(3) ==
      java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex("a")
          .substring(0, 15), 16))
  }

  test("round-6/7 expressions are callable from SQL and agree with " +
    "their Column-side kernels") {
    GraftFunctions.register(spark)
    Seq((Seq("a", "b", "c"), "abca"))
      .toDF("toks", "s")
      .createOrReplaceTempView("gf2")
    val row = spark.sql(
      """SELECT md5_prefix_longs(toks) AS hs,
        |       simhash_sig(toks) AS sh,
        |       sorted_shingles('a b c', 2) AS sg,
        |       char_bigrams(s) AS bg
        |FROM gf2""".stripMargin).head()
    // element-wise md5_prefix_longs == scalar md5_prefix_long per token
    val perTok = spark.sql(
      "SELECT md5_prefix_long('a') AS a, md5_prefix_long('b') AS b, " +
        "md5_prefix_long('c') AS c FROM gf2").head()
    assert(row.getSeq[Long](0) ==
      Seq(perTok.getLong(0), perTok.getLong(1), perTok.getLong(2)))
    // simhash: deterministic, equal to the Column-path expression
    val colSide = Seq(Seq("a", "b", "c")).toDF("toks")
      .select(SimHashSig($"toks").as("sh"))
      .head().getLong(0)
    assert(row.getLong(1) == colSide)
    // distinct sorted 2-shingles of "a b c"
    assert(row.getSeq[String](2) == Seq("a b", "b c"))
    // char bigrams of "abca": ab, bc, ca
    assert(row.getSeq[String](3) == Seq("ab", "bc", "ca"))
  }

  test("multi_contains_count is callable from SQL with a literal " +
    "pattern array and agrees with the Column-side automaton") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      """SELECT multi_contains_count('the big bad batch',
        |         array('big', 'bad b', 'nope', 'batch')) AS n
        |""".stripMargin).head().getLong(0)
    assert(got == 3L)
    val colSide = Seq("the big bad batch").toDF("s")
      .select(MultiContainsCount($"s",
        Seq("big", "bad b", "nope", "batch")).as("n"))
      .head().getLong(0)
    assert(colSide == 3L)
    // a non-literal pattern array is rejected loudly at plan time
    val e = intercept[Exception] {
      spark.sql("SELECT multi_contains_count('x', array(s)) " +
        "FROM (SELECT 'a' AS s)").collect()
    }
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(chain.contains("foldable"), s"wanted the literal-array " +
      s"contract error, got: $chain")
  }

  test("t-digest aggregates are callable from SQL: direct and " +
    "sketch->merge routes agree with the Column-side kernels") {
    GraftFunctions.register(spark)
    spark.range(0, 3000)
      .selectExpr("id % 3 AS b",
        "CAST((id * 2654435761) % 10000 AS DOUBLE) AS v")
      .createOrReplaceTempView("gf3")
    val direct = spark.sql(
      "SELECT tdigest_p50_p95(v) AS est FROM gf3").head().getSeq[Double](0)
    val merged = spark.sql(
      """SELECT tdigest_merge_p50_p95(sk.means, sk.weights) AS est
        |FROM (SELECT tdigest_sketch(v) AS sk FROM gf3 GROUP BY b)
        |""".stripMargin).head().getSeq[Double](0)
    // both estimates land inside the exact ±0.03/±0.06 rank envelopes
    val sorted = spark.sql("SELECT v FROM gf3 ORDER BY v")
      .collect().map(_.getDouble(0))
    def env(q: Double, eps: Double): (Double, Double) = {
      val n = sorted.length
      (sorted(math.max(0, math.floor((q - eps) * n).toInt - 1)),
        sorted(math.min(n - 1, math.ceil((q + eps) * n).toInt + 1)))
    }
    Seq((direct, 0.03), (merged, 0.06)).foreach { case (est, eps) =>
      val (lo50, hi50) = env(0.5, eps)
      val (lo95, hi95) = env(0.95, eps)
      assert(est(0) >= lo50 && est(0) <= hi50, s"p50 $est eps=$eps")
      assert(est(1) >= lo95 && est(1) <= hi95, s"p95 $est eps=$eps")
    }
  }

  test("count-min SQL aggregates match the Scala reference and merge " +
    "linearly") {
    GraftFunctions.register(spark)
    import graft.functions.CountMin
    val items = Seq.tabulate(200)(i => (i % 3, s"tok${i % 7}"))
    items.toDF("b", "w").createOrReplaceTempView("gf4")
    val direct = spark.sql("SELECT countmin_sketch(w) AS sk FROM gf4")
      .head().getSeq[Long](0).toArray
    val merged = spark.sql(
      """SELECT countmin_merge(sk) AS sk
        |FROM (SELECT countmin_sketch(w) AS sk FROM gf4 GROUP BY b)
        |""".stripMargin).head().getSeq[Long](0).toArray
    val ref = items.foldLeft(
      new Array[Long](CountMin.Depth * CountMin.DefaultWidth)) {
      case (g, (_, w)) =>
        val h = CountMin.buckets(w, CountMin.DefaultWidth)
        (0 until CountMin.Depth).foreach(j =>
          g(j * CountMin.DefaultWidth + h(j)) += 1L)
        g
    }
    assert(direct.sameElements(ref))
    assert(merged.sameElements(ref))
    assert(CountMin.estimate(ref, "tok0", CountMin.DefaultWidth) >=
      items.count(_._2 == "tok0"))
  }

  test("unicode_normalize is callable from SQL with a literal form " +
    "and rejects a non-literal one") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      "SELECT unicode_normalize('a\u0301', 'NFC') AS c, " +
        "unicode_normalize('\u00e1', 'NFD') AS d").head()
    assert(row.getString(0) == "\u00e1")
    assert(row.getString(1) == "a\u0301")
    intercept[Exception] {
      spark.sql("SELECT unicode_normalize('x', concat('NF', 'C'))")
        .head()
    }
  }

  test("window_energies is callable from SQL with literal window/hop " +
    "and agrees with the Column-side kernel") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      "SELECT window_energies(array(1L, 2L, 3L, 4L, 5L), 3, 2) AS e")
      .head()
    // windows: [1,2,3]=14, [3,4,5]=50, [5]=25 (trailing partial)
    assert(row.getSeq[Long](0) == Seq(14L, 50L, 25L))
    intercept[Exception] {
      spark.sql(
        "SELECT window_energies(array(1L), 1 + 2, 2)").head()
    }
  }
}
