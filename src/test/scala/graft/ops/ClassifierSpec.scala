package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ClassifierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("qualityFeatures: hand-computed integer features") {
    // "The cat and the cat!!" -> toks [the, cat, and, the, cat!!]
    // n_tokens=5, tot=3+3+3+3+5=17, stops {the,and,the}=3, uniq=4
    // chars=21, digits=0, punct=2 ('!','!')
    val df = Seq((1L, "The cat and the cat!!")).toDF("doc_id", "text")
    val f = Classifier.qualityFeatures(df, col("doc_id"), col("text"))
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    assert(f == ((1L, 5L, 17L * 1000 / 5, 3L * 1000 / 5, 4L * 1000 / 5,
      0L, 2L * 1000 / 21)))
  }

  test("qualityFeatures: empty and whitespace-only docs yield zeros, no division error") {
    val df = Seq((1L, ""), (2L, "   \t  ")).toDF("doc_id", "text")
    val f = Classifier.qualityFeatures(df, col("doc_id"), col("text"))
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(f(0) == ((1L, 0L, 0L, 0L, 0L, 0L, 0L)))
    assert(f(1) == ((2L, 0L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("qualityClassify: prose clears the gate, symbol soup does not") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and it is a fine day for this"),
      (2L, "@@@@ #### $$$$ %%%% ^^^^ &&&& **** (((( )))) ____ ++++ 0192837465")
    ).toDF("doc_id", "text")
    val got = Classifier.qualityClassify(df, col("doc_id"), col("text"))
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(got(0)._3, s"prose should pass, scored ${got(0)._2}")
    assert(!got(1)._3, s"symbol soup should fail, scored ${got(1)._2}")
  }

  test("linearScore: custom weights and bias apply exactly") {
    val df = Seq((1L, "aa bb aa")).toDF("doc_id", "text")
    // n_tokens=3, uniq_fp = 2*1000/3 = 666
    val got = Classifier.linearScore(
        Classifier.qualityFeatures(df, col("doc_id"), col("text")),
        weights = Seq("uniq_fp" -> 3L), bias = -1998L)
      .as[(Long, Long, Boolean)].collect().head
    assert(got == ((1L, 666L * 3 - 1998, true)))
  }

  test("the scoring plan is one narrow pass: no exchange at all") {
    val df = Seq((1L, "some text here")).toDF("doc_id", "text")
    val plan = Classifier.qualityClassify(df, col("doc_id"), col("text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"quality gate should not shuffle:\n$plan")
  }
}
