package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the custom generator expression `ngrams_gen`
  * (graft.functions.NGramsGen): hand-computed emission, the size<n edge,
  * and exact equivalence with the transform(sequence(...)) idiom it
  * replaces in hot paths.
  */
class NGramsGenSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("ngrams_gen: hand-computed shingles, 1-based positions") {
    Seq((1L, "a b c d"), (2L, "x y"), (3L, "solo"))
      .toDF("doc_id", "text")
      .select($"doc_id", split($"text", " ").as("ts"))
      .createOrReplaceTempView("ngs_docs")
    val got = spark.sql(
      """SELECT doc_id, pos, gram
        |FROM ngs_docs LATERAL VIEW ngrams_gen(ts, 3) g AS pos, gram
        |ORDER BY doc_id, pos""".stripMargin)
      .as[(Long, Int, String)].collect().toSeq
    assert(got == Seq((1L, 1, "a b c"), (1L, 2, "b c d")),
      "docs shorter than n must emit nothing")
  }

  test("ngrams_gen: n=1 degenerates to posexplode of the tokens") {
    Seq((1L, "p q r")).toDF("doc_id", "text")
      .select($"doc_id", split($"text", " ").as("ts"))
      .createOrReplaceTempView("ngs_one")
    val got = spark.sql(
      "SELECT pos, gram FROM ngs_one LATERAL VIEW ngrams_gen(ts, 1) g AS pos, gram ORDER BY pos")
      .as[(Int, String)].collect().toSeq
    assert(got == Seq((1, "p"), (2, "q"), (3, "r")))
  }

  test("ngrams_gen equals the transform(sequence) idiom over the real corpus") {
    val d = Tables.t(spark, sf, "documents")
      .select($"doc_id", split($"text", " ").as("ts"))
    d.createOrReplaceTempView("ngs_corpus")
    val gen = spark.sql(
      """SELECT doc_id, pos, gram
        |FROM ngs_corpus LATERAL VIEW ngrams_gen(ts, 3) g AS pos, gram""".stripMargin)
    val idiom = d.filter(size($"ts") >= 3)
      .select($"doc_id", posexplode(expr(
        "transform(sequence(1, size(ts) - 2), " +
          "i -> concat_ws(' ', slice(ts, i, 3)))")))
      .select($"doc_id", ($"pos" + 1).as("pos"), $"col".as("gram"))
    assert(gen.exceptAll(idiom).count() == 0L && idiom.exceptAll(gen).count() == 0L)
    assert(gen.count() > 0L)
  }

  test("ngrams_gen skips null elements like concat_ws (never emits a null gram)") {
    val got = spark.sql(
      "SELECT pos, gram FROM (SELECT array('a', CAST(NULL AS STRING), 'b') AS ts) " +
        "LATERAL VIEW ngrams_gen(ts, 2) g AS pos, gram ORDER BY pos")
      .as[(Int, String)].collect().toSeq
    // concat_ws semantics: the null token vanishes from the gram text
    assert(got == Seq((1, "a"), (2, "b")))
    assert(got.forall(_._2 != null), "schema declares gram non-null")
  }

  test("ngrams_gen rejects a non-constant n as an ANALYSIS error, not a raw throw") {
    Seq((1L, "a b c")).toDF("doc_id", "text")
      .select($"doc_id", split($"text", " ").as("ts"), size($"ts").as("k"))
      .createOrReplaceTempView("ngs_bad")
    // a per-row n (column reference) must fail through checkInputDataTypes
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT * FROM ngs_bad LATERAL VIEW ngrams_gen(ts, k) g AS pos, gram")
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal"))
    // so must a non-positive n — also an AnalysisException, never IAE
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT * FROM ngs_bad LATERAL VIEW ngrams_gen(ts, 0) g AS pos, gram")
        .collect()
    }
    assert(e2.getMessage.toLowerCase.contains("positive"))
  }

  test("ngrams_gen: a foldable n that THROWS under ANSI is still an analysis error") {
    // `CAST('x' AS INT)` and `pmod(1, 0)` are foldable IntegerType; under
    // ANSI their evaluation raises. The check must catch that and fail
    // through checkInputDataTypes — never let a SparkArithmeticException /
    // cast error escape the analyzer raw.
    Seq((1L, "a b c")).toDF("doc_id", "text")
      .select($"doc_id", split($"text", " ").as("ts"))
      .createOrReplaceTempView("ngs_ansi")
    val prev = spark.conf.get("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(
          "SELECT * FROM ngs_ansi LATERAL VIEW ngrams_gen(ts, CAST('x' AS INT)) g AS pos, gram")
          .collect()
      }
      assert(e.getMessage.toLowerCase.contains("constant"))
      val e2 = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(
          "SELECT * FROM ngs_ansi LATERAL VIEW ngrams_gen(ts, pmod(1, 0)) g AS pos, gram")
          .collect()
      }
      assert(e2 != null)
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("ngrams_gen accepts a constant-foldable non-literal n (1 + 2)") {
    Seq((1L, "a b c d")).toDF("doc_id", "text")
      .select($"doc_id", split($"text", " ").as("ts"))
      .createOrReplaceTempView("ngs_fold")
    val got = spark.sql(
      "SELECT pos, gram FROM ngs_fold LATERAL VIEW ngrams_gen(ts, 1 + 2) g AS pos, gram ORDER BY pos")
      .as[(Int, String)].collect().toSeq
    assert(got == Seq((1, "a b c"), (2, "b c d")),
      "a foldable n must behave exactly like the folded literal")
  }
}
