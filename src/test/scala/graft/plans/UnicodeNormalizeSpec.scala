package graft.plans

import java.text.Normalizer
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The expression must agree with `java.text.Normalizer` (the UAX #15
  * reference the JDK ships) through the DISTRIBUTED path, stay inside
  * whole-stage codegen, and satisfy the normalization laws the
  * cleaning pipeline relies on: idempotence, NFC∘NFD = NFC, and
  * identity on already-normalized (in particular ASCII) text — the
  * fast path that makes it free on a mostly-clean corpus.
  */
class UnicodeNormalizeSpec extends SparkSpec {
  import spark.implicits._

  // decomposed, precomposed, mixed, non-composing (digit + mark),
  // multi-mark stacks, compatibility forms (fi ligature, superscript 2)
  // -- all via explicit escapes so source encoding can never blur them
  private val samples = Seq(
    "",
    "plain ascii text",
    "a\u0301e\u0301",            // decomposed a/e + combining acute
    "\u00e1\u00e9",              // precomposed same
    "mixed \u00e1 and a\u0301 forms",
    "1\u0301",                    // no precomposition exists
    "o\u0308\u0301",             // stacked marks
    "\ufb01nal \u00b2",          // NFKC-only changes
    "s\u0323\u0307")             // canonical-ordering case

  test("all four forms ≡ java.text.Normalizer via the distributed path") {
    val df = samples.toDF("s").repartition(3)
    Seq("NFC", "NFD", "NFKC", "NFKD").foreach { form =>
      val got = df.select($"s",
        UnicodeNormalize($"s", form).as("n")).collect()
      got.foreach { r =>
        val want = Normalizer.normalize(r.getString(0),
          Normalizer.Form.valueOf(form))
        assert(r.getString(1) == want,
          s"$form(${r.getString(0)}) = ${r.getString(1)}, want $want")
      }
    }
  }

  test("laws: idempotent, NFC∘NFD = NFC, ASCII identity, null stays null") {
    val df = samples.toDF("s")
    val rows = df.select(
      UnicodeNormalize(UnicodeNormalize($"s", "NFC"), "NFC").as("a"),
      UnicodeNormalize($"s", "NFC").as("b"),
      UnicodeNormalize(UnicodeNormalize($"s", "NFD"), "NFC").as("c"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(0) == r.getString(1), "NFC must be idempotent")
      assert(r.getString(2) == r.getString(1), "NFC(NFD(s)) must equal NFC(s)")
    }
    val ascii = Seq("just ascii", "").toDF("s")
      .select(($"s" === UnicodeNormalize($"s", "NFC")).as("eq"))
      .collect()
    assert(ascii.forall(_.getBoolean(0)), "ASCII must map to itself")
    val n = Seq(Option.empty[String]).toDF("s")
      .select(UnicodeNormalize($"s", "NFC").as("n")).collect()
    assert(n(0).isNullAt(0), "NULL input must stay NULL")
  }

  test("compiles into whole-stage codegen (no fallback, no UDF)") {
    val p = spark.range(16)
      .select(UnicodeNormalize($"id".cast("string"), "NFC").as("n"))
      .queryExecution.executedPlan.toString
    assert(p.contains("*(1) Project") || p.contains("*(1)"),
      s"expected a whole-stage-codegen'd Project, got:\n$p")
    assert(p.contains("unicode_normalize"), "expression must be native")
  }

  test("rejects non-string input and unknown forms loudly") {
    intercept[Exception] {
      spark.range(1).select(UnicodeNormalize($"id", "NFC")).collect()
    }
    intercept[IllegalArgumentException] {
      UnicodeNormalize(lit("x"), "NFX")
    }
  }
}
