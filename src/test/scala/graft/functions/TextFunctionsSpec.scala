package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("token counts: whitespace vs BPE-ish") {
    val df = Seq("hello world, how's it going?").toDF("text")
    val row = df.select(
      TextFunctions.tokenCount($"text"),
      TextFunctions.bpeTokenCount($"text")).head()
    assert(row.getInt(0) == 5)
    // hello | world | , | how | ' | s | it | going | ?
    assert(row.getInt(1) == 9)
  }

  test("language id distinguishes real-language text") {
    val df = Seq(
      ("the cat sat on a mat and it is happy", "en"),
      ("der hund und die katze das ist nicht gut", "de"),
      ("el perro y los gatos de la casa es una historia", "es"),
      ("le chien et les chats est une belle histoire dans le parc", "fr"),
      ("你好世界", "zh"))
      .toDF("text", "expected")
    val bad = df
      .withColumn("got", TextFunctions.languageId($"text"))
      .filter($"got" =!= $"expected")
    assert(bad.count() == 0, bad.collect().mkString(","))
  }

  test("fingerprint normalizes case and whitespace") {
    val df = Seq(
      ("Hello   World", "hello world"),
      ("  hello\tworld ", "hello world")).toDF("a", "b")
    val bad = df.filter(
      TextFunctions.fingerprint($"a") =!= TextFunctions.fingerprint($"b"))
    assert(bad.count() == 0)
  }

  test("chunking: overlapping windows, partial tail kept") {
    val toks = (1 to 10).map(i => s"w$i")
    val got = Seq(Tuple1(toks)).toDF("toks")
      .select(TextFunctions.chunksOfTokens($"toks", 4, 2))
      .as[Seq[String]].head()
    assert(got == Seq(
      "w1 w2 w3 w4", "w3 w4 w5 w6", "w5 w6 w7 w8", "w7 w8 w9 w10"))
    val short = Seq(Tuple1(Seq("a", "b"))).toDF("toks")
      .select(TextFunctions.chunksOfTokens($"toks", 4, 2))
      .as[Seq[String]].head()
    assert(short == Seq("a b"))
  }

  test("redaction replaces emails and long digit runs") {
    val got = Seq("mail me at bob.smith+x@example.org or call 12345678")
      .toDF("text").select(TextFunctions.redact($"text")).as[String].head()
    assert(got == "mail me at <EMAIL> or call <NUM>")
    val untouched = Seq("plain text 123").toDF("text")
      .select(TextFunctions.redact($"text")).as[String].head()
    assert(untouched == "plain text 123")
  }

  test("dataset split is deterministic and roughly 90/5/5") {
    val df = (0L until 2000L).toDF("id")
    val counts = df.groupBy(TextFunctions.datasetSplit($"id").as("s"))
      .count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > 1700 && counts("train") < 1900, counts)
    val again = df.groupBy(TextFunctions.datasetSplit($"id").as("s"))
      .count().as[(String, Long)].collect().toMap
    assert(counts == again)
  }

  test("shingles: distinct word trigrams; short text yields empty") {
    val got = Seq("a b c d b c d").toDF("text")
      .select(TextFunctions.shingles($"text")).as[Seq[String]].head()
    assert(got.sorted == Seq("a b c", "b c d", "c d b", "d b c").sorted)
    val short = Seq("a b").toDF("text")
      .select(TextFunctions.shingles($"text")).as[Seq[String]].head()
    assert(short.isEmpty)
  }
}
