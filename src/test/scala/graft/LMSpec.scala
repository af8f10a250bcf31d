package graft

import org.apache.spark.sql.functions._

/** Properties of the LM-family operators the cell-exact oracles can't
  * express — here, that the Naive Bayes classifier actually LEARNS: its
  * training accuracy must clear the majority-class baseline by a wide
  * margin (the bar a trivially-collapsed model — see the rejected
  * perceptron note in ops/Clustering.scala — cannot pass).
  */
class LMSpec extends SparkSpec {
  import spark.implicits._

  test("Naive Bayes beats the majority-class baseline decisively") {
    val out = SparkEntry.queries("q_naive_bayes_lang")(spark, sfDir)
      .select("lang", "pred", "correct").collect()
    val acc = out.map(_.getInt(2)).sum.toDouble / out.length
    val majority = out.groupBy(_.getString(0)).map(_._2.length).max.toDouble / out.length
    assert(acc >= majority + 0.15,
      s"NB accuracy $acc does not clear majority baseline $majority by 0.15")
    // every class must actually be predicted somewhere — a collapsed
    // model predicting one class can't satisfy this on this corpus
    val langs = out.map(_.getString(0)).distinct.toSet
    val preds = out.map(_.getString(1)).distinct.toSet
    assert(langs.subsetOf(preds), s"classes never predicted: ${langs -- preds}")
  }

  test("NB scores are permutation-stable: partitioning does not change predictions") {
    val docs = Tables.documents(spark, sfDir)
    val a = ops.LM.naiveBayesLang(docs).collect().toSeq
    val b = ops.LM.naiveBayesLang(docs.repartition(13)).collect().toSeq
    assert(a === b, "NB output depends on physical partitioning")
  }

  test("Kneser-Ney is a proper distribution: per-context mass sums to exactly 1") {
    // From the EXACT rationals (re-derived from the same counts the query
    // emits): sum over observed continuations of (4c2-3)/(4c1c) plus
    // lambda * [continuation mass of ALL words] must equal 1, because
    // sum_w2 Ncont(w2) = Nt by construction. BigInt arithmetic - no
    // tolerance.
    val c2 = ops.LM.kneserNeyFrom(Tables.documents(spark, sfDir))
      .select("w1", "c2").collect()
      .groupBy(_.getString(0)).map { case (w1, rs) =>
        (w1, rs.map(_.getLong(1)))
      }
    val rows = ops.LM.kneserNeyFrom(Tables.documents(spark, sfDir))
      .groupBy("w2").count().collect() // Ncont per w2 re-derivation
    val nt = BigInt(rows.map(_.getLong(1)).sum)
    // per context: observed mass num/den with den = 4*c1c*nt
    c2.take(200).foreach { case (w1, cs) =>
      val c1c = BigInt(cs.sum)
      val n1p = BigInt(cs.length)
      val den = 4 * c1c * nt
      // observed discounted mass + lambda * (sum over ALL w2 of Ncont/Nt):
      // sum_obs (4c2-3)*nt + 3*n1p*nt  ==  den  must hold exactly
      val obs = cs.map(c => (4 * BigInt(c) - 3) * nt).sum
      val lam = 3 * n1p * nt
      assert(obs + lam === den,
        s"context '$w1': KN mass ${obs + lam} != $den")
    }
  }
}
