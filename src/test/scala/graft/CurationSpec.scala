package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation
import graft.queries.TrainingData

class CurationSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def mkDocs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "lang", "text")

  // ---- tokenDiversity ---------------------------------------------------

  test("tokenDiversity: exact Simpson on crafted docs; single-token docs excluded") {
    val docs = mkDocs(
      (1L, "en", "a a b"),     // counts {a:2,b:1} → 2/(3·2) = 1/3
      (2L, "en", "a b c"),     // all distinct → 0
      (3L, "en", "a a a a"),   // one type → 1
      (4L, "en", "solo"))      // N=1: no pair domain → excluded
    val got = Curation.tokenDiversity(docs)
      .select($"doc_id", $"n_tok", $"n_distinct", $"rep_pairs", $"simpson")
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 3L, 2L, 2L, 2.0 / 6.0),
      (2L, 3L, 3L, 0L, 0.0),
      (3L, 4L, 1L, 12L, 1.0)))
  }

  // ---- redactPii ----------------------------------------------------------

  test("redactPii: ordered rules, per-class counts, masked text carries no residue") {
    val rows = Seq(
      (1L, "reach me at jane.doe+x@mail.example.com or 10.0.0.1"),
      // 32-hex LOCAL PART: the email rule must eat it before the hexkey rule
      (2L, "aaaabbbbccccddddeeeeffff00001111@x.io"),
      (3L, "call +1-415-555-0000 key deadbeefdeadbeefdeadbeefdeadbeef"),
      (4L, "two ips 1.2.3.4 and 255.255.255.255 no more pii")
    ).toDF("doc_id", "t")
    val got = Curation.redactPii(rows, "t")
      .select($"doc_id", $"n_email", $"n_ipv4", $"n_phone", $"n_hexkey", $"masked")
      .as[(Long, Long, Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 1L, 1L, 0L, 0L, "reach me at <email> or <ip>"),
      (2L, 1L, 0L, 0L, 0L, "<email>"),
      (3L, 0L, 0L, 1L, 1L, "call <phone> key <key>"),
      (4L, 0L, 2L, 0L, 0L, "two ips <ip> and <ip> no more pii")))
    // idempotence: a second redaction pass over the masked text finds nothing
    val again = Curation.redactPii(
      got.toDF("doc_id", "a", "b", "c", "d", "t").select($"doc_id", $"t"), "t")
      .agg(sum($"n_email" + $"n_ipv4" + $"n_phone" + $"n_hexkey"))
      .head().getLong(0)
    assert(again == 0L)
  }

  // ---- lengthBuckets ----------------------------------------------------

  test("lengthBuckets: buckets are ceil-multiples, token mass conserved, waste exact") {
    val docs = mkDocs(
      (1L, "en", (1 to 3).map(i => s"a$i").mkString(" ")),   // 3 tok → bucket 64
      (2L, "en", (1 to 64).map(i => s"b$i").mkString(" ")),  // 64 tok → bucket 64
      (3L, "en", (1 to 65).map(i => s"c$i").mkString(" ")))  // 65 tok → bucket 128
    val got = Curation.lengthBuckets(docs, 64)
      .select($"bucket", $"n_seqs", $"total_tokens", $"padding_waste")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((64L, 2L, 67L, 61L), (128L, 1L, 65L, 63L)))
    // conservation: Σ total_tokens over buckets = corpus token count
    assert(got.map(_._3).sum == 3L + 64L + 65L)
    // waste is non-negative and below one bucket per sequence
    got.foreach { case (b, n, _, w) => assert(w >= 0 && w < b * n) }
  }

  // ---- deconExcise ------------------------------------------------------

  test("deconExcise: only probe-shared 8-gram positions are removed; accounting closes") {
    val corpus = mkDocs(
      (1L, "en", ((1 to 8).map(i => s"m$i") ++ (1 to 8).map(i => s"c$i")).mkString(" ")),
      (2L, "en", (1 to 12).map(i => s"z$i").mkString(" ")))   // untouched
      .select($"doc_id", $"text")
    val probe = mkDocs(
      (97L, "en", ((1 to 8).map(i => s"m$i") ++ Seq("tail")).mkString(" ")))
      .select($"doc_id", $"text")
    val got = Curation.deconExcise(corpus, probe, 8)
      .select($"doc_id", $"n_tokens_kept", $"n_tokens_removed", $"cleaned_fp")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // doc 1: probe shares exactly the m1..m8 8-gram (and "m2..tail" spans
    // don't exist in corpus) → 8 tokens removed, c1..c8 kept
    assert(got.map(t => (t._1, t._2, t._3)) == Seq((1L, 8L, 8L), (2L, 12L, 0L)))
    def h31Of(s: String): Long = spark.range(1)
      .select(graft.functions.TextFns.h31(lit(s))).head().getLong(0)
    assert(got(0)._4 == h31Of((1 to 8).map(i => s"c$i").mkString(" ")))
    assert(got(1)._4 == h31Of((1 to 12).map(i => s"z$i").mkString(" ")))
  }

  test("deconExcise: overlapping matched grams excise their union, fully-covered doc empties") {
    // probe = the doc itself → every k-gram matches → everything removed
    val corpus = mkDocs((1L, "en", (1 to 10).map(i => s"t$i").mkString(" ")))
      .select($"doc_id", $"text")
    val got = Curation.deconExcise(corpus, corpus, 8)
      .select($"n_tokens_kept", $"n_tokens_removed").as[(Long, Long)].head()
    assert(got == ((0L, 10L)))
  }

  // ---- curriculumOrder --------------------------------------------------

  test("curriculumOrder: equal-count tiers ordered easy→hard, positions a permutation") {
    // 40 docs with strictly decreasing quality (longer = higher score here)
    val docs = (1 to 40).map { i =>
      (i.toLong, "en", (1 to (101 - i)).map(j => s"w${i}_$j").mkString(" "))
    }.toDF("doc_id", "lang", "text").select($"doc_id", $"text")
    val got = Curation.curriculumOrder(docs, tiers = 4)
      .select($"doc_id", $"tier", $"pos").as[(Long, Long, Long)].collect().toSeq
    assert(got.map(_._3).sorted == (1L to 40L))
    val byTier = got.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byTier.keySet == Set(0L, 1L, 2L, 3L) && byTier.values.forall(_.size == 10))
    // score here decreases with doc_id, so tier 0 = ids 1..10, tier 3 = 31..40
    assert(byTier(0L) == (1L to 10L).toSet && byTier(3L) == (31L to 40L).toSet)
    // positions are contiguous per tier in tier order
    val posByTier = got.groupBy(_._2).view.mapValues(_.map(_._3)).toMap
    assert((0L to 3L).forall(t => posByTier(t).max == (t + 1) * 10))
  }

  // ---- spanCorruptionPlan -----------------------------------------------

  test("spanCorruptionPlan: block arithmetic exact, partition-independent, rate plausible") {
    val docs = mkDocs(
      (1L, "en", (1 to 25).map(i => s"a$i").mkString(" ")),  // 3 blocks: 10,10,5
      (2L, "en", "one two three"))                            // 1 block of 3
      .select($"doc_id", $"text")
    val got = Curation.spanCorruptionPlan(docs, blockTokens = 10, maskPct = 15)
      .select($"doc_id", $"n_blocks", $"n_masked", $"n_masked_tokens", $"masked_fp")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got.map(t => (t._1, t._2)) == Seq((1L, 3L), (2L, 1L)))
    got.foreach { case (_, nb, nm, nmt, _) =>
      assert(nm <= nb && nmt <= nm * 10)
    }
    // deterministic under repartitioning
    val again = Curation.spanCorruptionPlan(docs.repartition(7), 10, 15)
      .select($"doc_id", $"n_blocks", $"n_masked", $"n_masked_tokens", $"masked_fp")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(again == got)
    // corpus-level: the gate fires at roughly maskPct (binomial, wide band)
    val corpus = Tables.t(spark, TestSpark.sf, "documents")
    val rate = Curation.spanCorruptionPlan(corpus, 10, 15)
      .agg(sum($"n_masked").cast("double") / sum($"n_blocks")).head().getDouble(0)
    assert(rate > 0.05 && rate < 0.30, s"mask rate $rate implausible for 15%")
  }

  // ---- segmentExcise ----------------------------------------------------

  test("segmentExcise: agrees with segmentDedup's token accounting; full-dup docs come back empty") {
    val docs = mkDocs(
      (1L, "en", (1 to 16).map(i => s"t$i").mkString(" ")),  // 2 spans, all first
      (2L, "en", (1 to 16).map(i => s"t$i").mkString(" ")),  // exact dup → empty
      (3L, "en", ((1 to 8).map(i => s"t$i") ++ (1 to 8).map(i => s"u$i")).mkString(" ")))
      .select($"doc_id", $"text")                             // span1 dup of doc1's, span2 novel
    val ex = Curation.segmentExcise(docs, 8)
      .select($"doc_id", $"n_tokens_kept", $"cleaned_fp")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val dd = Curation.segmentDedup(docs, 8)
      .select($"doc_id", $"n_tokens_kept").as[(Long, Long)].collect().toMap
    assert(ex.map(t => t._1 -> t._2).toMap == dd)
    assert(ex.map(_._2) == Seq(16L, 0L, 8L))
    // doc 2's reconstruction is the empty string; doc 3 keeps only u1..u8
    def h31Of(s: String): Long = spark.range(1)
      .select(graft.functions.TextFns.h31(lit(s))).head().getLong(0)
    assert(ex(1)._3 == h31Of(""))
    assert(ex(2)._3 == h31Of((1 to 8).map(i => s"u$i").mkString(" ")))
  }

  // ---- curationFunnel ---------------------------------------------------

  test("curationFunnel: stages monotone, dedup keeps first id, quota caps per source") {
    val docs = Seq(
      (1L, "s1", "alpha beta gamma delta epsilon zeta"), // passes gate
      (2L, "s1", "alpha beta gamma delta epsilon zeta"), // exact dup of 1 → dropped at dedup
      (3L, "s1", "a a a a a a"),                          // ttr = 1/6 < 0.3 → gated out
      (4L, "s1", "one two"),                              // n_tok = 2 < 5 → gated out
      (5L, "s2", "p q r s t u v w"),                      // passes
      (6L, "s2", "h i j k l m n o"))                      // passes
      .toDF("doc_id", "source", "text")
    val got = Curation.curationFunnel(docs, minTok = 5L, minTtr = 0.3, quotaK = 1)
      .select($"source", $"n_docs", $"n_gated", $"n_unique", $"n_kept", $"tokens_kept")
      .as[(String, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val s1 = got.find(_._1 == "s1").get
    assert(s1._2 == 4 && s1._3 == 2 && s1._4 == 1 && s1._5 == 1 && s1._6 == 6)
    val s2 = got.find(_._1 == "s2").get
    assert(s2._2 == 2 && s2._3 == 2 && s2._4 == 2 && s2._5 == 1 && s2._6 == 8) // quota=1 cuts one
    // funnel is monotone at every stage
    got.foreach { case (_, a, b, c, d, _) => assert(a >= b && b >= c && c >= d) }
  }

  // ---- mixturePlan ------------------------------------------------------

  test("mixturePlan: uniform quota, rate capped at 1, deficit only when undersized") {
    val docs = Seq(
      (1L, "big", (1 to 100).map(i => s"a$i").mkString(" ")),  // 100 tok
      (2L, "small", "x y z"))                                   // 3 tok
      .toDF("doc_id", "source", "text")
    // total=103, budget=floor(103·0.5)=51, quota=51//2=25
    val got = Curation.mixturePlan(docs, 0.5)
      .select($"source", $"n_tokens", $"quota_tokens", $"rate", $"planned_tokens", $"deficit")
      .as[(String, Long, Long, Double, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      ("big", 100L, 25L, 0.25, 25L, 0L),
      ("small", 3L, 25L, 1.0, 3L, 22L)))
  }

  // ---- overlapChunks ----------------------------------------------------

  test("overlapChunks: full coverage, fixed overlap, short-tail and 1-chunk docs") {
    val docs = mkDocs(
      (1L, "en", (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tok
      (2L, "en", (1 to 4).map(i => s"u$i").mkString(" ")),  // 4 tok = C → 1 chunk
      (3L, "en", "solo"),                                    // 1 tok
      (4L, "en", (1 to 9).map(i => s"v$i").mkString(" ")))   // 9 tok: last start=4 covers to 9
    val got = Curation.overlapChunks(docs, chunkTokens = 4, stride = 2)
      .orderBy($"doc_id", $"chunk_idx")
      .select($"doc_id", $"chunk_idx", $"n_in_chunk")
      .as[(Long, Long, Long)].collect().toSeq
    // doc 1 (n=10): starts 0,2,4,6 → ceil((10-4)/2)=3 → idx 0..3, last covers 6..10
    assert(got.filter(_._1 == 1L) == Seq((1L, 0L, 4L), (1L, 1L, 4L), (1L, 2L, 4L), (1L, 3L, 4L)))
    assert(got.filter(_._1 == 2L) == Seq((2L, 0L, 4L)))
    assert(got.filter(_._1 == 3L) == Seq((3L, 0L, 1L)))
    // doc 4 (n=9): ceil((9-4)/2)=3 → idx 0..3, last starts at 6 → 3 tokens
    assert(got.filter(_._1 == 4L) == Seq((4L, 0L, 4L), (4L, 1L, 4L), (4L, 2L, 4L), (4L, 3L, 3L)))
    // coverage: union of [i·s, i·s + n_in_chunk) tiles [0, n) for every doc
    got.groupBy(_._1).foreach { case (_, cs) =>
      val covered = cs.flatMap { case (_, i, len) => (i * 2) until (i * 2 + len) }.toSet
      val n = cs.map { case (_, i, len) => i * 2 + len }.max
      assert(covered == (0L until n).toSet)
    }
  }

  test("overlapChunks: identical chunks share fp; chunk fp differs across content") {
    val docs = mkDocs(
      (1L, "en", "a b c d e f"),
      (2L, "en", "a b c d x y")) // first chunk (4 tok @ stride 4) identical? no — same
    val got = Curation.overlapChunks(docs, chunkTokens = 4, stride = 4)
      .select($"doc_id", $"chunk_idx", $"fp").as[(Long, Long, Long)].collect()
    val byDoc = got.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    assert(byDoc(1L).head == byDoc(2L).head)  // both start "a b c d"
    assert(byDoc(1L)(1) != byDoc(2L)(1))      // "e f" vs "x y"
  }

  // ---- bloomDecontaminate -----------------------------------------------

  test("bloomDecontaminate: no false negatives, deterministic under repartition") {
    val corpus = mkDocs((1 to 200).map(i => (i.toLong, "en", s"doc number $i")): _*)
    val probes = mkDocs((1 to 50).map(i => (1000L + i, "en", s"doc number ${i * 4}")): _*)
    val flagged = Curation.bloomDecontaminate(corpus, probes, "text", 1000L, 0.03)
      .select($"doc_id", $"bloom_hit").as[(Long, Boolean)].collect().toMap
    // every true member (texts "doc number 4k", k=1..50) must be flagged
    (1 to 50).map(_ * 4).filter(_ <= 200).foreach(i => assert(flagged(i.toLong)))
    val flagged2 = Curation.bloomDecontaminate(corpus.repartition(7),
        probes.repartition(5), "text", 1000L, 0.03)
      .select($"doc_id", $"bloom_hit").as[(Long, Boolean)].collect().toMap
    assert(flagged == flagged2) // bitmap is order/partitioning-independent
  }

  // ---- decontaminate ----------------------------------------------------

  test("decontaminate: flags docs sharing a verbatim k-gram with a probe") {
    val corpus = mkDocs(
      (1L, "en", "the quick brown fox jumps over the lazy dog"),
      (2L, "en", "completely unrelated words here nothing shared at all"),
      (3L, "en", "prefix quick brown fox suffix tokens"))
    val probes = mkDocs((100L, "en", "a quick brown fox appears"))
    val got = Curation.decontaminate(corpus, probes, 3)
      .orderBy($"doc_id").as[(Long, Long, Long)].collect().toSeq
    // "quick brown fox" is the only shared 3-gram
    assert(got == Seq((1L, 100L, 1L), (3L, 100L, 1L)))
  }

  test("decontaminate: probe side is broadcast (corpus never shuffles to match)") {
    val d = Tables.t(spark, sf, "documents")
    val plan = Curation.decontaminate(
      d.filter($"doc_id" % 97 =!= 0), d.filter($"doc_id" % 97 === 0), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  // ---- packChunks -------------------------------------------------------

  test("packChunks: token conservation, full chunks, partitioning independence") {
    val docs = Tables.t(spark, sf, "documents")
    val cap = TrainingData.ChunkCapacity
    val packed = Curation.packChunks(docs, cap)
      .orderBy($"lang", $"chunk_id")
      .as[(String, Long, Long, Long)].collect().toSeq

    // conservation: per lang, chunk tokens sum to the lang's total tokens
    val totals = docs.select($"lang", size(split($"text", " ")).cast("long").as("n"))
      .groupBy($"lang").agg(sum($"n").as("t")).as[(String, Long)].collect().toMap
    val packedTotals = packed.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    assert(packedTotals == totals)

    // every chunk but each lang's last holds exactly `cap` tokens
    packed.groupBy(_._1).foreach { case (_, chunks) =>
      val last = chunks.map(_._2).max
      chunks.filter(_._2 != last).foreach { c => assert(c._4 == cap, s"chunk $c") }
      // chunk ids are dense from 0
      assert(chunks.map(_._2).sorted == (0L to last))
    }

    // deterministic under a different physical partitioning
    val re = Curation.packChunks(docs.repartition(7), cap)
      .orderBy($"lang", $"chunk_id").as[(String, Long, Long, Long)].collect().toSeq
    assert(re == packed)
  }

  test("packChunks: a doc longer than capacity spans multiple chunks") {
    val docs = mkDocs((1L, "en", Seq.fill(10)("w").mkString(" ")))
    val got = Curation.packChunks(docs, 4)
      .orderBy($"chunk_id").as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("en", 0L, 1L, 4L), ("en", 1L, 1L, 4L), ("en", 2L, 1L, 2L)))
  }

  // ---- boilerplateNgrams ------------------------------------------------

  test("boilerplateNgrams: counts distinct-document frequency of k-grams") {
    val docs = mkDocs(
      (1L, "en", "all rights reserved footer text"),
      (2L, "en", "other content all rights reserved"),
      (3L, "en", "all rights reserved all rights reserved"), // repeat inside one doc counts once
      (4L, "en", "no shared trigrams in here"))
    val got = Curation.boilerplateNgrams(docs, 3, 3L)
      .as[(String, Long)].collect().toMap
    assert(got == Map("all rights reserved" -> 3L))
  }

  // ---- fuzzyPairs -------------------------------------------------------

  test("fuzzyPairs: finds typo-level dupes inside a block, respects the cap") {
    val docs = mkDocs(
      (1L, "en", "the quick brown fox jumps over the lazy dog"),
      (2L, "en", "the quick brown fox jumps ovre the lzay dog"), // 4 edits, same block
      (3L, "en", "the quick brown cat sits on a warm mat today"), // same block, too far
      (4L, "en", "a different opening entirely fox jumps over")) // different block
      .select($"doc_id", $"text")
    val got = Curation.fuzzyPairs(docs, 3, 0.2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 4L)))
  }

  test("fuzzyPairs: maxBlockDf drops hot blocks, keeps the rest") {
    val docs = mkDocs(
      (1L, "en", "common intro here then something unique alpha beta"),
      (2L, "en", "common intro here then something unique alpha betb"),
      (3L, "en", "common intro here then anything else some words"),
      (4L, "en", "rare opening block with matching tail content x"),
      (5L, "en", "rare opening block with matching tail content y"))
      .select($"doc_id", $"text")
    val uncapped = Curation.fuzzyPairs(docs, 3, 0.2)
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2)).toSet
    assert(uncapped.contains((1L, 2L)) && uncapped.contains((4L, 5L)))
    // cap 2: the 3-doc "common intro here" block is dropped, rare block kept
    val capped = Curation.fuzzyPairs(docs, 3, 0.2, maxBlockDf = Some(2L))
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2)).toSet
    assert(capped == Set((4L, 5L)))
  }

  test("fuzzyPairsWinnowed: recalls head-corrupted near-dups the prefix block misses") {
    val tail = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = mkDocs(
      (1L, "en", s"one two three $tail"),
      (2L, "en", s"uno dos tres $tail"), // head corrupted: different prefix block
      (3L, "en", "pfx pfy pfz abc"),     // prefix-only pair: too short for winnow
      (4L, "en", "pfx pfy pfz xyz"),     // 3 edits <= floor(0.2*15)
      (5L, "en", "totally unrelated content with nothing shared anywhere at all"))
      .select($"doc_id", $"text")
    val prefixOnly = Curation.fuzzyPairs(docs, 3, 0.2)
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2)).toSet
    val winnowed = Curation.fuzzyPairsWinnowed(docs, 3, 0.2, 3, 4)
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2)).toSet
    // the head-corrupted pair shares a 10-token run -> a winnow fp, but not
    // the 3-token prefix: prefix blocking recall < 1, winnowed recall = 1
    assert(prefixOnly == Set((3L, 4L)))
    assert(winnowed == Set((1L, 2L), (3L, 4L)))
  }

  test("fuzzyPairsWinnowed: superset of fuzzyPairs on the corpus, same dist values") {
    val d = Tables.t(spark, sf, "documents")
    val prefix = Curation.fuzzyPairs(d, 3, 0.2)
      .as[(Long, Long, Long)].collect().toSet
    val winnowed = Curation.fuzzyPairsWinnowed(d, 3, 0.2, 3, 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(prefix.subsetOf(winnowed), s"missing: ${prefix.diff(winnowed)}")
    // the scored form's hot-key cap: lossless on this corpus (a true pair
    // is lost only if EVERY shared key is hot — fuzzy dups share many)
    val capped = Curation.fuzzyPairsWinnowed(d, 3, 0.2, 3, 4,
      maxKeyDf = Some(TrainingData.FuzzyMaxKeyDf))
      .as[(Long, Long, Long)].collect().toSet
    assert(capped == winnowed)
  }

  // ---- winnow -----------------------------------------------------------

  test("winnow: docs sharing a long run share a fingerprint, wherever it sits") {
    val run = "alpha beta gamma delta epsilon zeta" // 6 tokens = k+window-1
    val docs = mkDocs(
      (1L, "en", s"$run completely different tail content here"),
      (2L, "en", s"unrelated front matter words $run"),
      (3L, "en", "no overlap with anything else at all whatsoever"))
      .select($"doc_id", $"text")
    val fps = Curation.winnow(docs, 3, 4)
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    // guarantee: any shared >= k+window-1 token run yields a shared fp
    assert((fps(1L) & fps(2L)).nonEmpty)
    assert((fps(1L) & fps(3L)).isEmpty)
  }

  test("winnow: too-short docs select nothing; duplicates collapse") {
    val docs = mkDocs(
      (1L, "en", "just five small tokens here"), // 5 < k+window-1 = 6
      (2L, "en", "same same same same same same same same")) // one distinct fp
      .select($"doc_id", $"text")
    val fps = Curation.winnow(docs, 3, 4).as[(Long, Long)].collect().toSeq
    assert(!fps.exists(_._1 == 1L))
    assert(fps.count(_._1 == 2L) == 1)
  }

  // ---- shardAssign ------------------------------------------------------

  test("shardAssign: conservation, round-robin balance, hierarchical == global-window law") {
    val rnd = new scala.util.Random(13)
    val docs = mkDocs((1L to 200L).map { i =>
      (i, "en", (1 to (1 + rnd.nextInt(30))).map(j => s"w$j").mkString(" "))
    }: _*)
    val S = 7
    val got = Curation.shardAssign(docs.repartition(5), S)
      .orderBy($"shard").as[(Long, Long, Long)].collect().toSeq
    // every shard hit; doc counts differ by at most 1 (round-robin deal)
    assert(got.map(_._1) == (0L until S.toLong))
    val counts = got.map(_._2)
    assert(counts.max - counts.min <= 1)
    assert(counts.sum == 200L)
    // token conservation
    val totalTok = docs.select(sum(size(split($"text", " ")).cast("long")))
      .as[Long].head()
    assert(got.map(_._3).sum == totalTok)
    // law: hierarchical rank == the single-task global row_number form
    val wGlobal = org.apache.spark.sql.expressions.Window
      .orderBy(size(split($"text", " ")).cast("long").desc, $"doc_id")
    val ref = docs
      .withColumn("rn", row_number().over(wGlobal).cast("long"))
      .withColumn("shard", ($"rn" - 1) % S)
      .groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split($"text", " ")).cast("long")).as("total_tokens"))
      .orderBy($"shard").as[(Long, Long, Long)].collect().toSeq
    assert(got == ref)
    // partitioning independence
    val re = Curation.shardAssign(docs.repartition(11), S)
      .orderBy($"shard").as[(Long, Long, Long)].collect().toSeq
    assert(got == re)
  }

  // ---- edge cases -------------------------------------------------------

  test("edge cases: empty inputs flow through every curation operator") {
    val empty = mkDocs().select($"doc_id", $"lang", $"text")
    val emptyDt = empty.select($"doc_id", $"text")
    assert(Curation.decontaminate(empty, empty, 3).count() == 0)
    assert(Curation.boilerplateNgrams(empty, 3, 1L).count() == 0)
    assert(Curation.packChunks(empty, 16).count() == 0)
    assert(Curation.shardAssign(empty, 4).count() == 0)
    assert(Curation.fuzzyPairs(emptyDt, 3, 0.2).count() == 0)
    assert(Curation.winnow(emptyDt, 3, 4).count() == 0)
    assert(Curation.segmentDedup(emptyDt, 8).count() == 0)
    assert(Curation.segmentDedupIncremental(emptyDt, emptyDt, 8).count() == 0)
    assert(Curation.rebalanceByLang(empty, 8.0).count() == 0)
    assert(Curation.retrieveTopK(emptyDt, emptyDt, 5, 0.2).count() == 0)
    // empty on ONE side only
    val one = mkDocs((1L, "en", "a b c d e f g h")).select($"doc_id", $"text")
    assert(Curation.segmentDedupIncremental(emptyDt, one, 8).count() == 1)
    assert(Curation.retrieveTopK(one, emptyDt, 5, 1.0).count() == 0)
    assert(Curation.retrieveTopK(emptyDt, one, 5, 1.0).count() == 0)
  }

  // ---- segmentDedup -----------------------------------------------------

  test("segmentDedup: first occurrence survives, later copies counted as dups") {
    // doc 1 owns the span; doc 2 repeats it as its FIRST segment and adds
    // a distinct tail; doc 3 is entirely distinct
    val shared = "a b c d e f g h" // exactly one 8-token segment
    val d = mkDocs(
      (1L, "en", shared),
      (2L, "en", s"$shared i j k l m n o p"),
      (3L, "en", "q r s t u v w x"))
      .select($"doc_id", $"text")
    val got = Curation.segmentDedup(d, 8).orderBy($"doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 0L, 8L),   // keeps its only segment
      (2L, 2L, 1L, 8L),   // first segment is a dup of doc 1's; tail kept
      (3L, 1L, 0L, 8L)))
  }

  test("segmentDedup: token bookkeeping and partitioning independence on the corpus") {
    val d = Tables.t(spark, sf, "documents")
    val k = graft.queries.CorpusQueries.SegTokens
    val out = Curation.segmentDedup(d, k).orderBy($"doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // every doc appears once; n_segs = ceil(n_tok / k); kept + dropped
    // tokens never exceed the doc's tokens, kept > 0 only if some segment
    // is globally first (at least one doc keeps everything)
    val toks = d.select($"doc_id", size(split($"text", " ")).cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(out.map(_._1) == out.map(_._1).distinct && out.size == toks.size)
    out.foreach { case (id, nSegs, nDup, kept) =>
      assert(nSegs == (toks(id) + k - 1) / k)
      assert(nDup <= nSegs && kept <= toks(id))
    }
    assert(out.exists { case (id, _, nDup, kept) => nDup == 0 && kept == toks(id) })
    // identical under a different partitioning (first-occurrence rule is a
    // total order, not an arrival order)
    val re = Curation.segmentDedup(d.repartition(13), k).orderBy($"doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(re == out)
  }

  test("segmentDedupIncremental: doc_id-ordered folds reproduce the batch answer") {
    val d = Tables.t(spark, sf, "documents").select($"doc_id", $"text")
    val k = graft.queries.CorpusQueries.SegTokens
    val batch = Curation.segmentDedup(d, k).orderBy($"doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // three arrival-order batches by doc_id range
    val cuts = Seq(0L, 160L, 330L, Long.MaxValue)
    val folded = (0 until 3).flatMap { i =>
      val existing = d.filter($"doc_id" < cuts(i))
      val batchDocs = d.filter($"doc_id" >= cuts(i) && $"doc_id" < cuts(i + 1))
      Curation.segmentDedupIncremental(existing, batchDocs, k)
        .as[(Long, Long, Long, Long)].collect().toSeq
    }.sortBy(_._1)
    assert(folded == batch)
    // and a span first seen in batch 1 is a dup when re-seen in batch 2
    val a = mkDocs((1L, "en", "a b c d e f g h")).select($"doc_id", $"text")
    val b = mkDocs((2L, "en", "a b c d e f g h")).select($"doc_id", $"text")
    val inc = Curation.segmentDedupIncremental(a, b, 8)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(inc == Seq((2L, 1L, 1L, 0L)))
  }

  test("segmentDedup: a pathologically hot span (5k copies) has no join fanout") {
    // 5,000 identical docs: every span hash is shared by all of them. The
    // firsts side still holds ONE row per distinct span, so the join's
    // output equals its input instance count — completes in suite time
    // with the right answer (structurally no hot-key blowup).
    val hot = spark.range(5000)
      .selectExpr("id AS doc_id", "'a b c d e f g h i j' AS text")
    val out = Curation.segmentDedup(hot, 8)
    assert(out.count() == 5000)
    val agg = out.agg(sum($"n_dup_segs"), sum($"n_tokens_kept")).first()
    // 2 spans/doc × 5000 docs; only doc 0's two spans survive
    assert(agg.getLong(0) == 9998L && agg.getLong(1) == 10L)
  }

  // ---- rebalanceByLang --------------------------------------------------

  test("rebalanceByLang: head language downsampled, tail kept, deterministic") {
    val d = Tables.t(spark, sf, "documents")
    val out = Curation.rebalanceByLang(d, 8.0).orderBy($"lang")
      .as[(String, Long, Long, Long)].collect().toSeq
    val counts = d.groupBy($"lang").count().as[(String, Long)].collect().toMap
    out.foreach { case (lang, n, rateU, sel) =>
      assert(n == counts(lang))
      assert(rateU == math.min(1000000L, math.floor(8.0 / math.sqrt(n.toDouble) * 1e6).toLong))
      assert(sel <= n)
      // selection rate lands near the declared rate (hash-uniformity)
      if (rateU < 1000000L) assert(math.abs(sel.toDouble / n - rateU / 1e6) < 0.15)
      else assert(sel == n)
    }
    // the head language's realized rate is strictly below the smallest tail rate
    val byN = out.sortBy(-_._2)
    assert(byN.head._3 <= byN.last._3)
    // content-hash selection: independent of partitioning
    val re = Curation.rebalanceByLang(d.repartition(7), 8.0).orderBy($"lang")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(re == out)
  }

  // ---- retrieveTopK -----------------------------------------------------

  test("retrieveTopK: near-copy of the query ranks first; k respected; stopword terms ignored") {
    val corpus = mkDocs(
      (1L, "en", "alpha beta gamma delta epsilon zeta eta theta"), // near-copy of q
      (2L, "en", "alpha beta gamma completely different tail here now"), // shares prefix
      (3L, "en", "nothing in common with the query at all"),
      (4L, "en", "stop stop stop stop stop stop stop stop")) // no shared terms
      .select($"doc_id", $"text")
    val q = mkDocs((100L, "en", "alpha beta gamma delta epsilon zeta eta iota"))
      .select($"doc_id", $"text")
    val got = Curation.retrieveTopK(corpus, q, 2, 1.0, termK = 3)
      .orderBy($"rn").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.size == 2)
    assert(got.head._3 == 1L) // most shared 3-grams, rarest terms
    assert(got(1)._3 == 2L)
    assert(got.head._4 > got(1)._4)
    // df cap: with maxDfFrac tiny every term is a stopword -> empty result
    assert(Curation.retrieveTopK(corpus, q, 2, 0.0, termK = 3).count() == 0)
  }

  test("retrieveTopK: probe vocabulary is broadcast (corpus never shuffles to match)") {
    val d = Tables.t(spark, sf, "documents")
    val plan = Curation.retrieveTopK(
      d.filter($"doc_id" % 97 =!= 0), d.filter($"doc_id" % 97 === 0), 5, 0.2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  // ---- leakFreeSplit ----------------------------------------------------

  test("leakFreeSplit: no near-dup pair straddles the split (full corpus)") {
    val d = Tables.t(spark, sf, "documents")
    val split = Curation.leakFreeSplit(d, 0.9, 200)
      .as[(Long, Long, String)].collect().toSeq
    // total: one row per doc, split in {train, test}, both sides populated
    assert(split.size == d.count())
    assert(split.forall(s => s._3 == "train" || s._3 == "test"))
    assert(split.exists(_._3 == "test") && split.exists(_._3 == "train"))
    val side = split.map(s => s._1 -> s._3).toMap
    // the law: every exact Jaccard >= 0.9 pair lands on ONE side
    val pairs = graft.operators.TextDedup.jaccardPairs(d, 0.9)
      .select($"a_id", $"b_id").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(side(a) == side(b), s"pair ($a,$b) straddles: ${side(a)} vs ${side(b)}")
    }
    // cluster-level selection: every member carries its cluster's split
    val byCluster = split.groupBy(_._2)
    byCluster.foreach { case (c, members) =>
      assert(members.map(_._3).distinct.size == 1, s"cluster $c mixed")
    }
    // deterministic across partitionings
    val re = Curation.leakFreeSplit(d.repartition(11), 0.9, 200)
      .as[(Long, Long, String)].collect().toSeq.sortBy(_._1)
    assert(re == split.sortBy(_._1))
  }

  // ---- quantizeInt8 -----------------------------------------------------

  test("quantizeInt8: codes bounded, reconstruction error within half a step") {
    val e = Tables.t(spark, sf, "embeddings")
    val q = Curation.quantizeInt8(e)
    // max reconstruction error of symmetric half-up rounding is scale/2;
    // in 1e-6 units: floor(maxAbs/127/2 * 1e6). Verify against per-vector scale.
    val joined = q.join(
      e.select($"vec_id",
        expr("aggregate(cast(embedding as array<double>), cast(0.0 as double)," +
          " (m, x) -> greatest(m, abs(x))) / 127.0").as("scale")), "vec_id")
      .select($"vec_id", $"max_err_units", (expr("floor(scale / 2 * 1e6)") + 1).as("bound"))
      .as[(Long, Long, Long)].collect()
    joined.foreach { case (id, err, bound) => assert(err <= bound, s"vec $id") }
    assert(joined.length == e.count())
  }

  test("quantizeInt8: all-zero vector short-circuits (scale 0 never divides)") {
    val df = Seq((1L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
                 (2L, Array(0.5f, -0.25f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val r = Curation.quantizeInt8(df).orderBy($"vec_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(r.head == ((1L, 0L, 0L))) // zero vector: exact answer, no NaN
    assert(r(1)._1 == 2L && r(1)._2 != 0L) // non-degenerate rows unaffected
  }

  test("quantizeInt8: exact on a hand-computed vector") {
    val df = Seq((1L, Array(1.0f, -0.5f, 0.25f, 0.0f))).toDF("vec_id", "embedding")
    val r = Curation.quantizeInt8(df).as[(Long, Long, Long)].collect().head
    // scale = 1/127; q = [127, -63 (floor(-63.5+0.5)), 32 (floor(31.75+0.5)), 0]
    // checksum = 1*127 + 2*(-63) + 3*32 + 4*0 = 97
    assert(r._1 == 1L && r._2 == 97L)
    // max err is the -0.5 element, exactly at the half step: scale/2 =
    // 1/254 = 0.003937007..., units = 3937
    assert(r._3 == 3937L)
  }

  // ---- duplicationWeights ----------------------------------------------

  test("duplicationWeights: singletons weigh 1e6, clusters split theirs, every doc covered") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("doc_id")
    // cluster {1,2,3} labeled 1; cluster {5,6} labeled 5; 4 and 7 singleton
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L))
      .toDF("doc_id", "cluster_id")
    val got = Curation.duplicationWeights(docs, labels)
      .orderBy($"doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 3L, 333333L), (2L, 1L, 3L, 333333L), (3L, 1L, 3L, 333333L),
      (4L, 4L, 1L, 1000000L), (5L, 5L, 2L, 500000L), (6L, 5L, 2L, 500000L),
      (7L, 7L, 1L, 1000000L)))
    // cluster-sum law: Σ weight_ppm over a cluster ∈ (1e6 − |cluster|, 1e6]
    got.groupBy(_._2).foreach { case (_, ms) =>
      val s = ms.map(_._4).sum
      assert(s <= 1000000L && s > 1000000L - ms.length, s"cluster sum $s")
    }
  }

  test("duplicationWeights: corpus run — coverage and bounds on real near-dup labels") {
    val d = Tables.t(spark, sf, "documents")
    val labels = graft.operators.TextDedup.nearDupClusters(d, 0.9)
    val w = Curation.duplicationWeights(d, labels)
    assert(w.count() == d.count()) // every doc weighted exactly once
    assert(w.filter($"weight_ppm" < 1L || $"weight_ppm" > 1000000L).count() == 0L)
    // singletons (docs in no pair) keep full weight
    assert(w.filter($"cluster_size" === 1L && $"weight_ppm" =!= 1000000L).count() == 0L)
  }

  // ---- sourceQuota ------------------------------------------------------

  test("sourceQuota: two-phase ≡ single-window; cap respected; under-quota sources pass whole") {
    val rows = (1L to 300L).map(i => (i, s"src${i % 3}", s"text $i")) ++
      Seq((1000L, "tiny", "a"), (1001L, "tiny", "b"))
    val docs = rows.toDF("doc_id", "source", "text")
    val two = Curation.sourceQuota(docs, 20, salts = 4)
    val one = Curation.sourceQuotaWindowed(docs, 20)
    assert(two.exceptAll(one).count() == 0L && one.exceptAll(two).count() == 0L)
    val perSrc = two.groupBy($"source").agg(count(lit(1)).as("n"), max($"rn").as("mx"))
      .as[(String, Long, Long)].collect().map { case (s, n, m) => (s, (n, m)) }.toMap
    assert(perSrc("src0") == ((20L, 20L)) && perSrc("src1") == ((20L, 20L)))
    assert(perSrc("tiny") == ((2L, 2L))) // under quota: all kept
  }

  test("sourceQuota: exact under adversarial salts (k > salt-group sizes both ways)") {
    // salts=8 over 10 docs in one source: many salt groups tiny; k=5 must
    // still return the global 5 best by (pri, doc_id)
    val docs = (1L to 10L).map(i => (i, "s", "x")).toDF("doc_id", "source", "text")
    val two = Curation.sourceQuota(docs, 5, salts = 8)
    val one = Curation.sourceQuotaWindowed(docs, 5)
    assert(two.exceptAll(one).count() == 0L && one.exceptAll(two).count() == 0L)
    assert(two.count() == 5L)
  }

  // ---- cdcChunks --------------------------------------------------------

  test("cdcChunks: identical docs share everything, disjoint docs nothing; tokens conserved") {
    val words = (1 to 60).map(i => s"w$i").mkString(" ")
    val other = (1 to 60).map(i => s"z$i").mkString(" ")
    val docs = Seq((1L, words), (2L, words), (3L, other)).toDF("doc_id", "text")
    val got = Curation.cdcChunks(docs, 4, 8)
      .orderBy($"doc_id").as[(Long, Long, Long, Long, Long, Long)].collect()
    got.foreach { case (_, _, nTok, _, _, _) => assert(nTok == 60L) }
    // docs 1 and 2 are byte-identical → identical chunking, 100% shared
    assert(got(0)._6 == 1000000L && got(1)._6 == 1000000L)
    assert(got(2)._4 == 0L && got(2)._6 == 0L, "disjoint doc must share nothing")
  }

  test("cdcChunks: boundaries re-synchronize after an insertion (the fixed-block failure case)") {
    val passage = (1 to 80).map(i => s"p$i").mkString(" ")
    val docs = Seq(
      (1L, passage),
      (2L, (1 to 7).map(i => s"noise$i").mkString(" ") + " " + passage))
      .toDF("doc_id", "text")
    val cdc = Curation.cdcChunks(docs, 4, 8)
      .orderBy($"doc_id").as[(Long, Long, Long, Long, Long, Long)].collect()
    // a 7-token insertion de-phases every fixed block, but CDC boundaries
    // depend only on local content: most of the shared passage must still
    // chunk identically in both docs
    assert(cdc(0)._5 >= 40L,
      s"shared passage must survive the shift: only ${cdc(0)._5}/80 tokens shared")
    assert(cdc(1)._5 >= 40L)
    val fixed = Curation.segmentDedup(docs, 8)
      .orderBy($"doc_id").select($"n_dup_segs").as[Long].collect()
    assert(fixed.sum == 0L,
      "fixed 8-token blocks must all de-phase under a 7-token shift (the contrast)")
  }
}
