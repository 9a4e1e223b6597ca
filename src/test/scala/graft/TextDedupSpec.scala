package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextDedup

class TextDedupSpec extends AnyFunSuite {
  import TestSpark._

  lazy val docs = Tables.t(spark, sf, "documents")

  test("exact dedup: survivors partition the corpus") {
    val out = TextDedup.exact(docs).collect()
    assert(out.map(_.getAs[Long]("n_copies")).sum == docs.count())
  }

  test("tokenMasks fails loudly when the vocabulary exceeds 63 tokens") {
    import spark.implicits._
    val wide = Seq((1L, (0 until 80).map(i => s"tok$i").mkString(" ")))
      .toDF("doc_id", "text")
    val ex = intercept[Exception] { TextDedup.tokenMasks(wide).collect() }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("|vocab| <= 63")))
  }

  test("jaccard pairs: values within (0.9, 1], pairs ordered a<b") {
    val rows = TextDedup.jaccardPairs(docs, 0.9).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val j = r.getAs[Double]("jacc")
      assert(j >= 0.9 && j <= 1.0)
      assert(r.getAs[Long]("a_id") < r.getAs[Long]("b_id"))
    }
  }

  test("minhash LSH candidates ⊇ true near-dup pairs (recall) and verified output equals exact") {
    val exact = TextDedup.jaccardPairs(docs, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = TextDedup.minhashNearDups(docs, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact) // banding at 32x4 recalls everything at s>=0.9 here
  }

  test("simhash: banded pairs equal brute-force pairs (pigeonhole exactness)") {
    // NB: iterate a Seq, not a Map — a for-yield over a Map of tuples
    // collapses pairs by key and silently drops most of them
    val sig = TextDedup.simhashSignatures(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val brute = (for {
      (a, sa) <- sig; (b, sb) <- sig if a < b
      if java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (a, b)).toSet
    val banded = TextDedup.simhashNearDups(docs, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == brute)
  }
}
