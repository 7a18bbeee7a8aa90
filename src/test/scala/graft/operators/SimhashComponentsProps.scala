package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck: the signature-space group assembly
  * ([[Dedup.simhashComponents]] — distinct sigs → banded verify → sig
  * CC → star-forest expansion) produces components IDENTICAL to the
  * doc-space pair formulation
  * (`connectedComponents(simhashNearDupPairs(…))` plus singletons) —
  * the equivalence the pair-free path is sold on — plus the
  * structural laws: every input doc appears exactly once, labels are
  * component minima drawn from the id set, and identical texts always
  * land in one group.
  */
object SimhashComponentsProps extends Properties("SimhashComponents") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  // tiny vocab + short docs ⇒ signature collisions and near-misses
  // are common, exercising same-sig collapse, verified edges, AND
  // candidates rejected by the Hamming check
  private val vocab =
    Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")

  private val docsGen: Gen[(List[(Long, String)], Int)] = for {
    nDocs <- Gen.chooseNum(2, 12)
    texts <- Gen.listOfN(nDocs, for {
      nWords <- Gen.chooseNum(1, 5)
      ws <- Gen.listOfN(nWords, Gen.oneOf(vocab))
    } yield ws.mkString(" "))
    maxDist <- Gen.chooseNum(1, 3)
  } yield (texts.zipWithIndex.map { case (t, i) => (i.toLong, t) },
    maxDist)

  property("simhashComponents == pair-formulation CC + singletons") =
    forAll(docsGen) { case (docs, maxDist) =>
      val df = docs.toDF("doc_id", "text").repartition(3)
      val got = Dedup.simhashComponents(df, "text", "doc_id",
          maxDist = maxDist, bands = 4)
        .as[(Long, Long)].collect().toMap
      val pairs = Dedup.simhashNearDupPairs(df, "text", "doc_id",
          maxDist = maxDist, bands = 4)
        .select($"id_a".as("u"), $"id_b".as("v"))
      val paired = Graph.connectedComponents(pairs)
        .as[(Long, Long)].collect().toMap
      val expect = docs.map { case (id, _) =>
        id -> paired.getOrElse(id, id)
      }.toMap
      got == expect
    }

  property("every doc appears once; labels are component minima " +
    "from the id set") =
    forAll(docsGen) { case (docs, maxDist) =>
      val df = docs.toDF("doc_id", "text").repartition(2)
      val got = Dedup.simhashComponents(df, "text", "doc_id",
          maxDist = maxDist, bands = 4)
        .as[(Long, Long)].collect()
      val ids = docs.map(_._1).toSet
      got.length == docs.size &&
        got.map(_._1).toSet == ids &&
        got.forall { case (_, c) => ids.contains(c) } &&
        got.groupBy(_._2).forall { case (c, members) =>
          members.map(_._1).min == c
        }
    }

  property("identical texts always share a component") =
    forAll(docsGen) { case (docs, maxDist) =>
      val dup = docs ++ docs.map { case (id, t) =>
        (id + docs.size, t)
      }
      val got = Dedup.simhashComponents(
          dup.toDF("doc_id", "text").repartition(3),
          "text", "doc_id", maxDist = maxDist, bands = 4)
        .as[(Long, Long)].collect().toMap
      docs.forall { case (id, _) =>
        got(id) == got(id + docs.size)
      }
    }
}
