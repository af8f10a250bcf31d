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
}
