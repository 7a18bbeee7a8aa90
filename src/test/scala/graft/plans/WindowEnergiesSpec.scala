package graft.plans

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck: the native [[WindowEnergiesExpr]] kernel ≡ the
  * composable HOF reference
  * ([[graft.operators.Multimodal.windowEnergiesFold]]) for random
  * sample arrays, window/hop shapes, and partitionings — including
  * the empty array, single sample, exact-multiple and mid-window
  * lengths, and negative sample values (energy squares them away).
  */
object WindowEnergiesSpec extends Properties("WindowEnergies") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._
  import graft.operators.Multimodal

  private val genIn: Gen[(List[Seq[Long]], Int, Int)] = for {
    win <- Gen.chooseNum(1, 9)
    hop <- Gen.chooseNum(1, 9)
    rows <- Gen.nonEmptyListOf(for {
      n <- Gen.chooseNum(0, 40)
      vs <- Gen.listOfN(n, Gen.chooseNum(-200L, 200L))
    } yield vs: Seq[Long])
  } yield (rows, win, hop)

  property("native kernel == HOF fold reference, any window/hop, " +
    "any partitioning") =
    forAll(genIn) { case (rows, win, hop) =>
      val df = rows.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("id", "samples").repartition(3)
      val both = df.select($"id",
          Multimodal.windowEnergies($"samples", win, hop).as("native"),
          Multimodal.windowEnergiesFold($"samples", win, hop).as("ref"))
        .as[(Long, Seq[Long], Seq[Long])].collect()
      both.forall { case (_, n, r) => n == r }
    }

  property("overflow error surface matches the ANSI Column fold: " +
    "BOTH forms throw SparkArithmeticException (r11 ADVICE — the " +
    "kernel used to throw bare java.lang.ArithmeticException)") =
    forAll(Gen.const(())) { _ =>
      val df = Seq((1L, Seq(Long.MaxValue, Long.MaxValue)))
        .toDF("id", "samples")
      def surface(c: org.apache.spark.sql.Column): String =
        try {
          df.select(c).collect(); "no-error"
        } catch {
          case e: Throwable =>
            // unwrap Spark's task-failure wrapping to the root cause
            Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
              .toSeq.last.getClass.getName
        }
      val native = surface(Multimodal.windowEnergies($"samples", 4, 2))
      val fold = surface(Multimodal.windowEnergiesFold($"samples", 4, 2))
      native == "org.apache.spark.SparkArithmeticException" &&
        native == fold
    }

  property("sequential law: energies are exact Σ s² over " +
    "[w*hop, min(w*hop+win, n))") =
    forAll(genIn) { case (rows, win, hop) =>
      val df = rows.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("id", "samples")
      val got = df.select($"id",
          Multimodal.windowEnergies($"samples", win, hop).as("e"))
        .as[(Long, Seq[Long])].collect().toMap
      rows.zipWithIndex.forall { case (s, i) =>
        val expect =
          if (s.isEmpty) Seq.empty[Long]
          else (0 to (s.size - 1) / hop).map { w =>
            s.slice(w * hop, math.min(w * hop + win, s.size))
              .map(v => v * v).sum
          }
        got(i.toLong) == expect
      }
    }
}
