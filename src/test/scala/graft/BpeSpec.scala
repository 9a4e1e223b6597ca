package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

class BpeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // Driver-side reference BPE (Sennrich-style, greedy left-to-right
  // non-overlapping apply, winner by count desc then pair asc) — the law
  // the distributed trainer must match exactly.
  private def refTrain(freqs: Map[String, Long], n: Int): Seq[(Int, String, String, Long)] = {
    var words = freqs.toVector.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var r = 0
    var done = false
    while (r < n && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- words; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      if (counts.isEmpty) done = true
      else {
        val ((a, b), c) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((r, a, b, c))
        words = words.map { case (syms, f) =>
          val nb = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) { nb += a + b; i += 2 }
            else { nb += syms(i); i += 1 }
          }
          (nb.result(), f)
        }
        r += 1
      }
    }
    out.result()
  }

  test("train matches the driver-side reference on the classic BPE fixture") {
    val docs = Seq(
      (1L, ("low " * 5).trim),
      (2L, ("lower " * 2).trim),
      (3L, ("newest " * 6).trim),
      (4L, ("widest " * 3).trim)).toDF("doc_id", "text")
    val freqs = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    assert(Bpe.train(docs, 6) == refTrain(freqs, 6))
  }

  test("train matches the reference on real corpus word frequencies") {
    val d = Tables.t(spark, sf, "documents")
    val freqs = Bpe.wordFreqs(d).as[(String, Long)].collect().toMap
    assert(Bpe.train(d, 4) == refTrain(freqs, 4))
  }

  test("train stops early when no pairs remain (single-char vocab)") {
    val docs = Seq((1L, "a b a b a")).toDF("doc_id", "text")
    // only merge possible would need 2+ symbols per word; all words are 1 char
    assert(Bpe.train(docs, 3) == Seq.empty)
  }

  test("encode applies the trained merge table like the reference") {
    val docs = Seq(
      (1L, ("low " * 5).trim),
      (2L, ("lower " * 2).trim),
      (3L, ("newest " * 6).trim),
      (4L, ("widest " * 3).trim)).toDF("doc_id", "text")
    val merges = Bpe.train(docs, 5).map { case (_, a, b, _) => (a, b) }
    def refApply(w: String): Vector[String] =
      merges.foldLeft(w.map(_.toString).toVector) { case (syms, (a, b)) =>
        val nb = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) { nb += a + b; i += 2 }
          else { nb += syms(i); i += 1 }
        }
        nb.result()
      }
    val got = Bpe.encode(docs, merges)
      .select($"doc_id", $"text", $"bpe_tokens", $"n_bpe_tokens")
      .as[(Long, String, Seq[String], Long)].collect()
    for ((_, text, toks, n) <- got) {
      val want = text.split(" ").toVector.flatMap(refApply)
      assert(toks.toVector == want)
      assert(n == want.length.toLong)
    }
  }

  test("merge application is greedy left-to-right non-overlapping") {
    // "aaaa" with merge (a,a): greedy gives [aa, aa], not [a, aa, a]
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val m = Bpe.train(docs, 2)
    // round 0: (a,a) count 3 (three adjacent positions); round 1: (aa,aa) count 1
    assert(m == Seq((0, "a", "a", 3L), (1, "aa", "aa", 1L)))
  }
}
