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
    * Requires |vocab| <= 63, enforced by a plan-level raise_error on any
    * bit index > 62 (bit 63 would hit the sign bit and Spark's shiftleft
    * wraps shift counts mod 64, silently colliding masks) — the test
    * corpora have ~31 distinct tokens. At real scale the dictionary doesn't
    * fit a Long and the MinHash path below replaces this; the bitmask form
    * exists because it makes set-Jaccard exact, cheap (two popcounts), and
    * oracle-replicable. */
  def tokenMasks(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"), explode(tokenSet(col("text"))).as("tok"))
    // Dense bit numbering via a single-row sorted collect + posexplode: the
    // dictionary is tiny BY CONTRACT (guard below), so one reducer is the
    // right plan and avoids an unpartitioned-Window sort. The guard fails
    // the job rather than silently wrapping shift counts past bit 62.
    val vocab = tok.select(col("tok")).distinct()
      .agg(sort_array(collect_list(col("tok"))).as("toks"))
      .select(posexplode(when(size(col("toks")) <= 63, col("toks"))
        .otherwise(raise_error(concat(
          lit("tokenMasks requires |vocab| <= 63 distinct tokens; saw "),
          size(col("toks")).cast(StringType))))).as(Seq("bit", "tok")))
      .select(col("tok"), col("bit").cast(LongType))
    // tiny dictionary → broadcast join; the explode/join never shuffles docs
    tok.join(broadcast(vocab), "tok")
      .groupBy(col("doc_id"))
      .agg(sum(expr("shiftleft(cast(1 as bigint), cast(bit as int))")).as("mask"),
           count(lit(1)).as("n_tokens"))
  }

  /** Exact set-Jaccard of two token bitmasks (two popcounts + a divide). */
  private def maskJaccard(aMask: org.apache.spark.sql.Column,
                          bMask: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    bit_count(aMask.bitwiseAND(bMask)).cast(DoubleType) /
      bit_count(aMask.bitwiseOR(bMask)).cast(DoubleType)

  /** All pairs (a<b) with set-Jaccard >= threshold, exact via bitmasks. */
  def jaccardPairs(docs: DataFrame, threshold: Double): DataFrame = {
    val m = tokenMasks(docs)
    val a = m.select(col("doc_id").as("a_id"), col("mask").as("a_mask"))
    val b = m.select(col("doc_id").as("b_id"), col("mask").as("b_mask"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("jacc", maskJaccard(col("a_mask"), col("b_mask")))
      .filter(col("jacc") >= threshold)
      .select(col("a_id"), col("b_id"), col("jacc"))
  }

  // ---- word n-gram (shingle) Jaccard ----------------------------------

  /** Distinct word n-gram (shingle) set per doc: one row per (doc_id,
    * shingle). explode positions then element_at (codegen) — docs with
    * fewer than n tokens contribute no shingles. */
  def shingles(docs: DataFrame, n: Int): DataFrame = {
    // fallback registration so the operator works in sessions built
    // without the GraftExtensions config (the CosineUnits contract)
    graft.functions.TextFns.explodeShingles(
        docs.select(col("doc_id"), tokens(col("text")).as("ts")), "ts", n,
        gramCol = "shingle")
      .select(col("doc_id"), col("shingle"))
      .distinct()
  }

  /** All pairs (a<b) with n-gram-set Jaccard >= threshold — EXACT, via an
    * inverted-index intersection count: join docs on shared shingles,
    * count matches per pair, |A∩B| / (|A|+|B|-|A∩B|). Order-sensitive
    * near-duplication (unlike the token-set form): reordering tokens
    * changes the shingle set.
    *
    * Scale shape: the shingle join is a shuffle on shingle — cost
    * Σ_s freq(s)², so hot shingles are the skew risk; identical texts are
    * collapsed first (they alias whole clusters into every shingle), and
    * `maxShingleDf` (the stop-shingle frequency cap) bounds the worst key:
    * shingles with document frequency above the cap are dropped from
    * CANDIDATE generation only — candidates are then re-verified with an
    * exact intersection count over the FULL posting lists, so reported
    * jacc values never change. A true pair is missed only if EVERY shared
    * shingle is capped: at jacc ≥ t the pair shares ≥ t/(1+t) of its
    * shingle union (≥ 44% at t=0.8), so a cap above the corpus's
    * boilerplate band cannot lose it — asserted capped ≡ uncapped in
    * TextDedupSpec. */
  def ngramJaccardPairs(docs: DataFrame, n: Int, threshold: Double,
                        maxShingleDf: Option[Long] = None): DataFrame = {
    val hashed = docs.select(col("doc_id"), col("text"), sha2(col("text"), 256).as("h"))
    val reps = hashed.groupBy(col("h")).agg(min(col("doc_id")).as("rep_id"))
    // read by both expansion sides + intra: materialize once (same
    // reasoning as minhashNearDups.members / the shingle table below).
    // reps is O(distinct content) — never hint-broadcast; AQE converts the
    // shuffle join to a broadcast at runtime when the frame is actually
    // small, and degrades to a plain shuffle join at corpus scale.
    val members = hashed.select(col("doc_id"), col("h"))
      .join(reps, "h").select(col("doc_id"), col("rep_id"))
      .localCheckpoint(true)
    val repDocs = hashed.join(reps, hashed("doc_id") === reps("rep_id"))
      .select(col("doc_id"), col("text"))
    // the distinct shingle table feeds three consumers (sizes + both join
    // sides): materialize once, same reasoning as minhashNearDups.members
    val sh = shingles(repDocs, n).localCheckpoint(true)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("nsh"))
    val inter = maxShingleDf match {
      case None =>
        sh.select(col("shingle"), col("doc_id").as("ra"))
          .join(sh.select(col("shingle"), col("doc_id").as("rb")), "shingle")
          .filter(col("ra") < col("rb"))
          .groupBy(col("ra"), col("rb")).agg(count(lit(1)).as("c"))
      case Some(cap) =>
        // stop-shingle path: the hot-shingle set is at most |postings|/cap
        // rows — usually the tiny zipf head, but not BOUNDED, so the
        // anti-join carries no broadcast hint either (AQE broadcasts it at
        // runtime when it is in fact small); exact re-verify over full
        // posting lists restores true intersections
        val hot = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
          .filter(col("df") > cap).select(col("shingle"))
        val cold = sh.join(hot, Seq("shingle"), "left_anti")
        val cand = cold.select(col("shingle"), col("doc_id").as("ra"))
          .join(cold.select(col("shingle"), col("doc_id").as("rb")), "shingle")
          .filter(col("ra") < col("rb"))
          .select(col("ra"), col("rb")).distinct()
        cand.join(sh.select(col("doc_id").as("ra"), col("shingle")), "ra")
          .join(sh.select(col("doc_id").as("rb"), col("shingle")), Seq("rb", "shingle"))
          .groupBy(col("ra"), col("rb")).agg(count(lit(1)).as("c"))
    }
    // sizes is O(distinct docs) and repPairs is O(near-dup pairs): both are
    // unbounded at corpus scale (a 100 TB crawl has 1e8–1e9 true near-dup
    // pairs, past any executor broadcast limit), so none of these joins is
    // hint-broadcast — AQE upgrades them at runtime when genuinely small
    val repPairs = inter
      .join(sizes.select(col("doc_id").as("ra"), col("nsh").as("na")), "ra")
      .join(sizes.select(col("doc_id").as("rb"), col("nsh").as("nb")), "rb")
      .withColumn("jacc", col("c").cast(DoubleType) / (col("na") + col("nb") - col("c")))
      .filter(col("jacc") >= threshold)
      .select(col("ra"), col("rb"), col("jacc"))
    val cross = members.select(col("doc_id").as("da"), col("rep_id").as("ra"))
      .join(repPairs, "ra")
      .join(members.select(col("doc_id").as("db"), col("rep_id").as("rb")), "rb")
      .select(least(col("da"), col("db")).as("a_id"),
              greatest(col("da"), col("db")).as("b_id"), col("jacc"))
    val intra = members.select(col("doc_id").as("a_id"), col("rep_id"))
      .join(members.select(col("doc_id").as("b_id"), col("rep_id")), "rep_id")
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), lit(1.0).as("jacc"))
    cross.unionByName(intra) // identical texts are Jaccard-1 by definition
  }

  // ---- asymmetric containment (sub-document duplication) ---------------

  /** Directed containment pairs: C(a→b) = |Sₐ ∩ S_b| / |Sₐ| over word
    * n-gram shingle sets — "most of doc A's shingles appear in doc B".
    * The asymmetric measure catches SUB-document duplication (a short doc
    * quoted/embedded inside a long one) that symmetric Jaccard
    * structurally cannot: a 20-shingle doc fully contained in a
    * 2000-shingle doc has Jaccard 0.01 but containment 1.0. Emits BOTH
    * directions (a_id, b_id, cont) with cont ≥ threshold, a_id ≠ b_id.
    *
    * Same scale scaffolding as [[ngramJaccardPairs]]: identical texts
    * collapse to a representative before the quadratic stage (the
    * intersection join runs on distinct content only), intersections are
    * computed once per unordered rep pair and projected into both
    * directions, and `maxShingleDf` offers the same stop-shingle
    * candidate cap (candidates from cold shingles, exact re-verify over
    * full posting lists — reported containments are exact; only pairs
    * sharing NOTHING but hot shingles are missed). */
  def containmentPairs(docs: DataFrame, n: Int, threshold: Double,
                       maxShingleDf: Option[Long] = None): DataFrame = {
    val hashed = docs.select(col("doc_id"), col("text"), sha2(col("text"), 256).as("h"))
    val reps = hashed.groupBy(col("h")).agg(min(col("doc_id")).as("rep_id"))
    // reps/sizes/repPairs are O(distinct docs) / O(near-dup pairs): no
    // broadcast hints anywhere on them (same discipline as
    // [[ngramJaccardPairs]]) — AQE upgrades at runtime when actually small
    val members = hashed.select(col("doc_id"), col("h"))
      .join(reps, "h").select(col("doc_id"), col("rep_id"))
      .localCheckpoint(true)
    val repDocs = hashed.join(reps, hashed("doc_id") === reps("rep_id"))
      .select(col("doc_id"), col("text"))
    val sh = shingles(repDocs, n).localCheckpoint(true)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("nsh"))
    val interHalf = maxShingleDf match {
      case None =>
        sh.select(col("shingle"), col("doc_id").as("ra"))
          .join(sh.select(col("shingle"), col("doc_id").as("rb")), "shingle")
          .filter(col("ra") < col("rb"))
          .groupBy(col("ra"), col("rb")).agg(count(lit(1)).as("c"))
      case Some(cap) =>
        val hot = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
          .filter(col("df") > cap).select(col("shingle"))
        val cold = sh.join(hot, Seq("shingle"), "left_anti")
        val cand = cold.select(col("shingle"), col("doc_id").as("ra"))
          .join(cold.select(col("shingle"), col("doc_id").as("rb")), "shingle")
          .filter(col("ra") < col("rb"))
          .select(col("ra"), col("rb")).distinct()
        cand.join(sh.select(col("doc_id").as("ra"), col("shingle")), "ra")
          .join(sh.select(col("doc_id").as("rb"), col("shingle")), Seq("rb", "shingle"))
          .groupBy(col("ra"), col("rb")).agg(count(lit(1)).as("c"))
    }
    val both = interHalf
      .join(sizes.select(col("doc_id").as("ra"), col("nsh").as("na")), "ra")
      .join(sizes.select(col("doc_id").as("rb"), col("nsh").as("nb")), "rb")
    val repPairs = both
      .select(col("ra"), col("rb"), (col("c").cast(DoubleType) / col("na")).as("cont"))
      .unionByName(both.select(col("rb").as("ra"), col("ra").as("rb"),
        (col("c").cast(DoubleType) / col("nb")).as("cont")))
      .filter(col("cont") >= threshold)
    val cross = members.select(col("doc_id").as("a_id"), col("rep_id").as("ra"))
      .join(repPairs, "ra")
      .join(members.select(col("doc_id").as("b_id"), col("rep_id").as("rb")), "rb")
      .select(col("a_id"), col("b_id"), col("cont"))
    val intra = members.select(col("doc_id").as("a_id"), col("rep_id"))
      .join(members.select(col("doc_id").as("b_id"), col("rep_id")), "rep_id")
      .filter(col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"), lit(1.0).as("cont"))
    cross.unionByName(intra) // identical texts contain each other fully
  }

  // ---- MinHash + banded LSH -------------------------------------------

  /** Fixed permutation family (a_i*h + b_i) mod P31, deterministically
    * generated (LCG, seed 42) so signatures are reproducible run-to-run.
    *
    * Banding at 32 bands × 8 rows: collision S-curve threshold
    * (1/32)^(1/8) ≈ 0.65, miss-prob at s=0.9 is (1-0.9^8)^32 ≈ 1.2e-8.
    * The longer rows-per-band matter on self-similar corpora: with r=4 the
    * threshold sits at 0.42 and a corpus where most pairs are ≥0.5-similar
    * floods candidate generation (measured 8× more raw candidate rows). */
  val NumPerms = 256
  val NumBands = 32
  private val lcg = {
    var state = 42L
    () => { state = (state * 6364136223846793005L + 1442695040888963407L) & Long.MaxValue; state }
  }
  val permA: Array[Long] = Array.fill(NumPerms)(lcg() % (P31 - 1) + 1)
  val permB: Array[Long] = Array.fill(NumPerms)(lcg() % P31)

  /** doc_id, sig: array<bigint> of NumPerms MinHash values.
    *
    * Two formulation choices that matter at scale:
    *   - explode(tokens) + ONE hash aggregation with NumPerms codegen'd
    *     min() columns — higher-order lambdas evaluate interpreted (~10µs
    *     per call) while the agg form is whole-stage-codegen'd with
    *     map-side partial mins; the only shuffle is on doc_id, linear;
    *   - the per-token hash is xxhash64 (native, codegen'd) rather than an
    *     md5-hex round-trip: signatures are Spark-internal — the oracle
    *     checks the exact-Jaccard RESULT, never the signatures — so no
    *     cross-engine hash replication is needed here. */
  def minhashSignatures(docs: DataFrame): DataFrame = {
    val th = docs.select(col("doc_id"), explode(tokenSet(col("text"))).as("tok"))
      .select(col("doc_id"), pmod(xxhash64(col("tok")), lit(P31)).as("h"))
    val mins = (0 until NumPerms).map(i =>
      min(expr(s"(${permA(i)}L * h + ${permB(i)}L) % $P31")).as(s"m$i"))
    th.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until NumPerms).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** One row per (doc, band): a 64-bit key hashing (band index, band slice
    * of the signature), with `carry` columns riding along. explode-then-
    * compute keeps slice+hash in whole-stage codegen (a transform() lambda
    * would evaluate interpreted), and the long key replaces a ~170-char
    * string band key in the self-join shuffle. */
  private[operators] def bandKeys(sigs: DataFrame, carry: Seq[String]): DataFrame = {
    val rows = NumPerms / NumBands
    sigs.select(col("doc_id") +: carry.map(col) :+ col("sig") :+
        explode(expr(s"sequence(0, ${NumBands - 1})")).as("band"): _*)
      .select(col("doc_id") +: carry.map(col) :+
        expr(s"xxhash64(band, cast(slice(sig, band * $rows + 1, $rows) as string))").as("key"): _*)
  }

  /** LSH candidate pairs, deduplicated (inspection API — the mining path
    * below verifies inside the band join instead of materializing these). */
  def minhashCandidates(docs: DataFrame): DataFrame = {
    val bands = bandKeys(minhashSignatures(docs), Nil)
    val l = bands.select(col("key"), col("doc_id").as("a_id"))
    val r = bands.select(col("key"), col("doc_id").as("b_id"))
    l.join(r, Seq("key")).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
  }

  /** MinHash-LSH near-dup mining with exact verification.
    *
    * Corpora with heavy duplication put thousands of docs with IDENTICAL
    * token sets into the same LSH bucket, making the band self-join
    * quadratic in cluster size (observed: 450s at sf0.1). So the pipeline
    * collapses identical sets first — the production shape at any scale:
    *   1. group docs by token set (one representative per distinct set);
    *   2. signatures + banding + verification over distinct sets only;
    *   3. expand set-level pairs back to doc pairs (cross-group via the
    *      verified pairs, intra-group pairs are Jaccard-1 by construction).
    * LSH cost becomes linear in DISTINCT content, and the quadratic part
    * only materializes the true answer (the near-dup pairs themselves).
    *
    * Verification happens INSIDE the band self-join's stage: each banded
    * row carries its set bitmask, so the jacc filter (two popcounts) runs
    * in the join's codegen and sub-threshold candidates — the bulk, since
    * the 32×8 S-curve admits pairs from ~0.65 similarity up — die before
    * any shuffle, dedup, or follow-up join. Only true pairs reach the
    * distinct() (at band multiplicity), measured 3.4× faster than
    * verify-after-dedup at sf0.1. */
  /** One representative signature (+ bitmask) per distinct token set. */
  private def repSignatures(docs: DataFrame, groups: DataFrame): DataFrame = {
    // repDocs is O(distinct content) — plain join, AQE decides broadcast
    val repDocs = docs.join(
      groups.select(col("rep"), col("mask")), docs("doc_id") === col("rep"))
    minhashSignatures(repDocs.select(col("doc_id"), col("text")))
      .join(repDocs.select(col("doc_id"), col("mask")), "doc_id")
  }

  /** Band self-join + in-join exact verification over rep signatures that
    * carry their set bitmask; returns distinct (a_mask, b_mask, jacc).
    * With `probeMasks` set, only bands of those masks sit on the LEFT side
    * (the incremental probe); pairs are then mask-normalized because a
    * probe-probe pair collides in both directions. */
  private[graft] def minhashVerifiedRepPairs(sigsWithMask: DataFrame, threshold: Double,
                                             probeMasks: Option[DataFrame] = None): DataFrame = {
    // both sides of the self-join read the banded table: materialize once,
    // or the signature pipeline upstream executes once per side
    val bands = bandKeys(sigsWithMask, Seq("mask")).localCheckpoint(true)
    // probeMasks is bounded by the incremental contract (distinct masks of
    // ONE new batch, never corpus-sized) — the only hinted broadcast here
    val lBands = probeMasks.fold(bands)(pm => bands.join(broadcast(pm), "mask"))
    val l = lBands.select(col("key"), col("doc_id").as("a_id"), col("mask").as("a_mask"))
    val r = bands.select(col("key"), col("doc_id").as("b_id"), col("mask").as("b_mask"))
    val pairFilter =
      if (probeMasks.isDefined) col("a_id") =!= col("b_id") else col("a_id") < col("b_id")
    l.join(r, Seq("key")).filter(pairFilter)
      .withColumn("jacc", maskJaccard(col("a_mask"), col("b_mask")))
      .filter(col("jacc") >= threshold)
      .select(least(col("a_mask"), col("b_mask")).as("a_mask"),
              greatest(col("a_mask"), col("b_mask")).as("b_mask"), col("jacc"))
      .distinct() // only true pairs left, at band multiplicity
  }

  /** Expand verified rep-level pairs back to doc-level pairs via the
    * member table (doc_id, mask). repPairs is O(near-dup pairs) — the
    * answer itself — so it never carries a broadcast hint: at crawl scale
    * it is 1e8+ rows, far past executor broadcast limits. AQE broadcasts
    * it at runtime when it measures small. */
  private def expandCross(members: DataFrame, repPairs: DataFrame): DataFrame =
    members.select(col("doc_id").as("da"), col("mask").as("a_mask"))
      .join(repPairs, "a_mask")
      .join(members.select(col("doc_id").as("db"), col("mask").as("b_mask")), "b_mask")
      .select(least(col("da"), col("db")).as("a_id"),
              greatest(col("da"), col("db")).as("b_id"), col("jacc"))

  def minhashNearDups(docs: DataFrame, threshold: Double): DataFrame = {
    // members is read by 4 downstream branches (grouping, both sides of the
    // expansion, intra pairs): materialize once. localCheckpoint = executor-
    // local blocks + truncated lineage — right for single-job mining; a
    // long-lived cluster pipeline would persist/checkpoint durably instead.
    val members = tokenMasks(docs).select(col("doc_id"), col("mask"))
      .localCheckpoint(true)
    val groups = members.groupBy(col("mask")).agg(min(col("doc_id")).as("rep"))
    val repPairs = minhashVerifiedRepPairs(repSignatures(docs, groups), threshold)
    val intra = members.select(col("doc_id").as("a_id"), col("mask"))
      .join(members.select(col("doc_id").as("b_id"), col("mask")), "mask")
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), lit(1.0).as("jacc"))
    // intra pairs are jacc=1.0 ≥ any valid threshold
    expandCross(members, repPairs).unionByName(intra)
  }

  /** MinHash-LSH near-dup mining with NO vocabulary bound — the form that
    * runs when the dictionary outgrows [[tokenMasks]]' 63-bit bitmask
    * (i.e., every real corpus; the mask form stays the test-scale fast
    * path whose in-join popcount verify is cheapest, and the oracle
    * cross-checks them equal on corpora where both apply).
    *
    * Differences from [[minhashNearDups]]:
    *   - set identity = sha256 of the sorted distinct-token list
    *     (unbounded, collision-free for practical purposes) instead of the
    *     vocab bitmask;
    *   - verification happens AFTER candidate dedup, by fetching the two
    *     reps' token arrays and intersecting (`array_intersect` in
    *     codegen) — candidates can't be verified in-join without carrying
    *     token arrays through the ×NumBands explode, so the trade is: the
    *     band join shuffles only (key, id) pairs, and exact verification
    *     touches each DISTINCT candidate pair once. Same
    *     candidates-then-verify shape, linear in distinct content.
    */
  def minhashNearDupsUnbounded(docs: DataFrame, threshold: Double): DataFrame = {
    val (members, groups, verified) = unboundedRepPairs(docs, threshold)
    // rep pair -> setid pair -> doc-level expansion (+ intra jacc=1 pairs).
    // EVERY join here is a plain (shuffle) join: groups/members are
    // O(distinct corpus) and the verified pair set is O(near-dup pairs) —
    // at the 100 TB scale this operator exists for, NONE of them is
    // broadcast-small (a crawl's true near-dup pair set alone is 1e8–1e9
    // rows). AQE converts any of these joins to a broadcast at runtime
    // when the measured side is small, so test scale loses nothing.
    val m = members.select(col("doc_id"), col("setid"))
    val g = groups.select(col("rep"), col("setid"))
    val repPairs = verified
      .join(g.select(col("rep").as("ra"), col("setid").as("a_set")), "ra")
      .join(g.select(col("rep").as("rb"), col("setid").as("b_set")), "rb")
      .select(col("a_set"), col("b_set"), col("jacc"))
    val cross = m.select(col("doc_id").as("da"), col("setid").as("a_set"))
      .join(repPairs, "a_set")
      .join(m.select(col("doc_id").as("db"), col("setid").as("b_set")), "b_set")
      .select(least(col("da"), col("db")).as("a_id"),
              greatest(col("da"), col("db")).as("b_id"), col("jacc"))
    val intra = m.select(col("doc_id").as("a_id"), col("setid"))
      .join(m.select(col("doc_id").as("b_id"), col("setid")), "setid")
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), lit(1.0).as("jacc"))
    cross.unionByName(intra)
  }

  /** The unbounded set identity: (doc_id, setid = sha256 of the sorted
    * distinct-token list, toks = that list). Shared by the in-memory
    * unbounded family and the persisted [[LshIndex]] — both sides of the
    * stored-index-equals-fresh-mining law derive identity from this one
    * definition. */
  private[operators] def setMembers(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), array_sort(tokenSet(col("text"))).as("toks"))
      .withColumn("setid", sha2(concat_ws(" ", col("toks")), 256))
      .select(col("doc_id"), col("setid"), col("toks"))

  /** Shared machinery of the unbounded-vocab family: identical-set collapse
    * (sha256 set identity), signatures + banding over reps only, and the
    * band join with the sound in-join size-ratio prefilter, then exact
    * verification once per distinct candidate pair.
    *
    * With `probeIds` set (the incremental form), only bands of setid
    * groups CONTAINING a probe doc sit on the left side of the band join
    * — join work ∝ the probe batch's collisions, never the corpus's —
    * and pairs are rep-normalized because a probe-probe pair collides in
    * both directions (the same probe restriction as
    * [[minhashVerifiedRepPairs]], on set identity instead of masks).
    * probeIds is batch-bounded by the incremental contract (one ingest
    * batch, never corpus-sized), so its broadcasts are legitimate hints.
    *
    * Returns (members(doc_id, setid, toks) — checkpointed,
    *          groups(setid, rep, grp_n) — checkpointed,
    *          verified(ra, rb, jacc) rep-level pairs with ra < rb).
    * The size lookup joined into the signatures is a plain (shuffle) join:
    * it is O(distinct corpus), deliberately never broadcast. */
  private def unboundedRepPairs(docs: DataFrame, threshold: Double,
                                probeIds: Option[DataFrame] = None
                               ): (DataFrame, DataFrame, DataFrame) = {
    val members = setMembers(docs).localCheckpoint(true)
    // read by the rep-doc join, the rep→setid mapping, and (clusters path)
    // the label expansion: materialize once
    val groups = members.groupBy(col("setid"))
      .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("grp_n"))
      .localCheckpoint(true)
    val repToks = members.join(
      groups.select(col("rep")), members("doc_id") === col("rep"))
      .select(col("doc_id"), col("toks"))
    val sigs = minhashSignatures(
      docs.join(groups.select(col("rep")), docs("doc_id") === col("rep"))
        .select(col("doc_id"), col("text")))
      .join(repToks.select(col("doc_id"),
        size(col("toks")).cast(LongType).as("n")), "doc_id")
    // set SIZE rides each band row: jacc >= t forces |A|/|B| >= t
    // (|A∩B| <= min <= jacc·union <= ... ⇒ min/max >= t), so the in-join
    // size-ratio filter is SOUND — it kills mid-similarity candidates
    // before they reach the distinct/fetch shuffle, recovering part of
    // the mask form's verify-in-join economics without any vocab bound.
    val bands = bandKeys(sigs, Seq("n")).localCheckpoint(true)
    // probe restriction: reps of probe-containing groups only on the left
    val lBands = probeIds.fold(bands) { ids =>
      val probeReps = groups
        .join(broadcast(members.join(broadcast(ids.select(col("doc_id"))), "doc_id")
          .select(col("setid")).distinct()), "setid")
        .select(col("rep").as("doc_id"))
      bands.join(broadcast(probeReps), "doc_id")
    }
    val pairFilter =
      if (probeIds.isDefined) col("ra") =!= col("rb") else col("ra") < col("rb")
    val cand = lBands.select(col("key"), col("doc_id").as("ra"), col("n").as("na"))
      .join(bands.select(col("key"), col("doc_id").as("rb"), col("n").as("nb")), Seq("key"))
      .filter(pairFilter)
      .filter(least(col("na"), col("nb")).cast(DoubleType) >=
        lit(threshold) * greatest(col("na"), col("nb")).cast(DoubleType))
      .select(least(col("ra"), col("rb")).as("ra"),
              greatest(col("ra"), col("rb")).as("rb")).distinct()
    val verified = cand
      .join(repToks.select(col("doc_id").as("ra"), col("toks").as("a_toks")), "ra")
      .join(repToks.select(col("doc_id").as("rb"), col("toks").as("b_toks")), "rb")
      .withColumn("inter", size(array_intersect(col("a_toks"), col("b_toks"))).cast(DoubleType))
      .withColumn("jacc", col("inter") /
        (size(col("a_toks")) + size(col("b_toks")) - col("inter")))
      .filter(col("jacc") >= threshold)
      .select(col("ra"), col("rb"), col("jacc"))
    (members, groups, verified)
  }

  // ---- dedup clusters (connected components) ---------------------------

  /** Connected components over near-dup pairs: every document in a
    * transitively-connected near-dup cluster maps to the cluster's
    * smallest id (the survivor). This is the dedup ACTION that pair
    * mining feeds — keep cluster_id == doc_id, drop the rest.
    *
    * Algorithm: per-partition union-find + graph contraction (the
    * MapReduce connected-components shape, cf. Kiveris et al., "Connected
    * Components in MapReduce and Beyond"). Each superstep runs union-find
    * inside every partition (mapPartitions — genuine per-partition
    * imperative logic, memory bounded by partition size), merges the
    * per-partition roots by min, contracts every edge through that
    * mapping, and drops self-loops. The graph shrinks by roughly the
    * partition-local structure per superstep, so 2–3 supersteps finish
    * real near-dup graphs regardless of chain diameter — where one-hop
    * min-label propagation needed diameter rounds (measured: 8 rounds /
    * ~80 AQE jobs → 2 supersteps / ~10 jobs on the sf0.1 graph, whose
    * 0.9-threshold chains are NOT near-cliques). Labels compose across
    * supersteps and are exact component minima at termination —
    * deterministic and partitioning-independent. Each superstep
    * materializes via localCheckpoint: iterating over unbounded lineage
    * would replay all prior supersteps and overflow the planner. */
  def dedupClusters(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    // checkpoint edges FIRST — the input plan (often a whole LSH mining
    // pipeline) must execute exactly once
    var edges = pairs
      .select(least(col("a_id"), col("b_id")).cast(LongType).as("a"),
              greatest(col("a_id"), col("b_id")).cast(LongType).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint(false) // lazy: the count() below materializes it (one job, not two)
    // per-superstep min-root maps; labels are composed ONCE at the end
    // (updating a labels table every superstep would cost an extra
    // materialization per round). The first map covers every node — each
    // edge endpoint enters its partition's union-find — so it doubles as
    // the initial label table.
    val maps = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var nEdges = edges.count()
    var iter = 0
    // Partition budget for the union-find: ~1M edges per task (a HashMap of
    // ≤2M nodes, bounded memory). Sizing partitions to the LIVE edge count
    // matters doubly: a graph that fits one task resolves in a single
    // superstep (the whole graph is in one union-find), and later
    // supersteps — where contraction has shrunk the graph by orders of
    // magnitude — stop paying 32 near-empty tasks plus their scheduling.
    // Results are partitioning-independent (exact component minima), so
    // this is purely a physical choice; coalesce is narrow (no shuffle).
    val EdgesPerTask = 1000000L
    // cap at the cluster's parallelism rather than the frame's current
    // partition count: reading the latter (.rdd.getNumPartitions) forces a
    // plan conversion every superstep. coalesce above the current count is
    // a no-op, so the cap only ever narrows; coalesce is narrow (no shuffle).
    val maxPar = math.max(1L, spark.sparkContext.defaultParallelism.toLong)
    def sized(df: DataFrame, n: Long): DataFrame =
      df.coalesce(math.max(1L,
        math.min(maxPar, (n + EdgesPerTask - 1) / EdgesPerTask)).toInt)
    while (nEdges > 0 && iter < maxIters) {
      // union-find within each partition: node -> min id of its local set
      val local = sized(edges, nEdges).as[(Long, Long)].mapPartitions { it =>
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var c = x
          while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        it.foreach { case (a, b) =>
          val ra = find(a); val rb = find(b)
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
          parent.getOrElseUpdate(a, find(a)); parent.getOrElseUpdate(b, find(b))
        }
        parent.keys.toArray.iterator.map(k => (k, find(k)))
      }.toDF("id", "root")
      // a node split across partitions gets the min of its local roots;
      // contraction below re-links whatever this min-merge leaves apart
      val m = local.groupBy(col("id")).agg(min(col("root")).as("root"))
        .localCheckpoint(false) // lazy: the contraction join materializes it
      maps += m
      edges = edges
        .join(m.select(col("id").as("a"), col("root").as("ra")), "a")
        .join(m.select(col("id").as("b"), col("root").as("rb")), "b")
        .filter(col("ra") =!= col("rb"))
        .select(least(col("ra"), col("rb")).as("a"), greatest(col("ra"), col("rb")).as("b"))
        .distinct()
        .localCheckpoint(false) // lazy: the count() below materializes it
      nEdges = edges.count()
      iter += 1
    }
    maps.headOption match {
      case None =>
        pairs.select(col("a_id").as("doc_id"), col("a_id").as("cluster_id")).limit(0)
      case Some(first) =>
        var labels = first.select(col("id"), col("root").as("label"))
        for (m <- maps.drop(1))
          labels = labels
            .join(m.select(col("id").as("label"), col("root")), Seq("label"), "left")
            .select(col("id"), coalesce(col("root"), col("label")).as("label"))
        labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
    }
  }

  /** Near-dup clusters over a corpus, collapse-first: components are
    * computed on the REP graph (one node per distinct token set, edges =
    * verified rep pairs) and expanded to members afterward — the label
    * propagation iterates over ~|distinct sets| edges instead of the full
    * doc-pair blowup (docs in an identical-set group are one component by
    * construction, label = the group's rep = its min doc_id). Output:
    * (doc_id, cluster_id) for every doc belonging to some near-dup pair;
    * cluster_id is the cluster's minimum doc_id (the survivor). Equals
    * dedupClusters(jaccardPairs(docs, t)) — asserted in TextDedupSpec.
    *
    * Pair generation is the LSH path ([[minhashVerifiedRepPairs]]): band-
    * bucket shuffle over rep signatures with in-join verification — linear
    * in distinct content, the same machinery [[minhashNearDups]] mines
    * with. The all-pairs bitmask join this replaced survives only as the
    * spec's oracle ([[jaccardPairs]]). */
  def nearDupClusters(docs: DataFrame, threshold: Double): DataFrame = {
    val members = tokenMasks(docs).select(col("doc_id"), col("mask")).localCheckpoint(true)
    val groups = members.groupBy(col("mask"))
      .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("grp_n"))
      .localCheckpoint(true)
    // verified (a_mask, b_mask) pairs are the TRUE near-dup rep pairs —
    // O(near-dup pairs), unbounded at corpus scale, so no broadcast hint
    // (AQE decides at runtime); materialized once: several downstream
    // actions would otherwise each re-run the signature+banding pipeline
    val verified = minhashVerifiedRepPairs(repSignatures(docs, groups), threshold)
      .localCheckpoint(true)
    val m = groups.select(col("rep"), col("mask"))
    val repPairs = m.select(col("mask").as("a_mask"), col("rep").as("ra"))
      .join(verified, "a_mask")
      .join(m.select(col("mask").as("b_mask"), col("rep").as("rb")), "b_mask")
      .select(least(col("ra"), col("rb")).as("a_id"),
              greatest(col("ra"), col("rb")).as("b_id"))
    val repLabels = dedupClusters(repPairs) // doc_id (= rep), cluster_id
    // reps with edges carry their propagated label; edge-less groups of
    // size >= 2 are their own cluster (intra jacc=1 pairs at doc level)
    val labeled = groups
      .join(repLabels.select(col("doc_id").as("rep"), col("cluster_id")), Seq("rep"), "left")
      .filter(col("cluster_id").isNotNull || col("grp_n") >= 2)
      .select(col("mask"), coalesce(col("cluster_id"), col("rep")).as("cluster_id"))
    members.join(labeled, "mask")
      .select(col("doc_id"), col("cluster_id"))
  }

  /** Vocabulary-unbounded dedup clusters: connected components over the
    * REP graph — one node per distinct token set (sha256 identity, no
    * dictionary bound), edges = the unbounded miner's verified rep pairs —
    * expanded to members afterward, exactly mirroring [[nearDupClusters]]
    * with setid in place of mask. The union-find input is ~|distinct sets|
    * edges, never the doc-pair blowup: on a heavily-duplicated corpus the
    * doc-level pair set is quadratic in cluster sizes while the rep graph
    * stays linear in distinct content (identical-set groups are one
    * component by construction — label = the group's rep = its min
    * doc_id). Laws: ≡ [[nearDupClusters]] where both apply, and ≡
    * dedupClusters over the doc-level pairs (TextDedupSpec). */
  def nearDupClustersUnbounded(docs: DataFrame, threshold: Double): DataFrame = {
    val (members, groups, verified) = unboundedRepPairs(docs, threshold)
    // verified pairs already carry rep doc_ids (sigs run over reps), so
    // they ARE the rep-graph edges; checkpointed inside dedupClusters
    val repLabels = dedupClusters(verified.select(col("ra").as("a_id"), col("rb").as("b_id")))
    // reps with edges carry their propagated label; edge-less groups of
    // size >= 2 are their own cluster (intra jacc=1 pairs at doc level)
    val labeled = groups
      .join(repLabels.select(col("doc_id").as("rep"), col("cluster_id")), Seq("rep"), "left")
      .filter(col("cluster_id").isNotNull || col("grp_n") >= 2)
      .select(col("setid"), coalesce(col("cluster_id"), col("rep")).as("cluster_id"))
    members.select(col("doc_id"), col("setid")).join(labeled, "setid")
      .select(col("doc_id"), col("cluster_id"))
  }

  // ---- incremental near-dup mining ------------------------------------

  /** Incremental MinHash near-dup mining: emit only the pairs that involve
    * at least one NEW document, against an existing corpus plus the new
    * batch itself. Processing a corpus in arrival order through this
    * function yields exactly the batch answer — each pair surfaces when
    * its later member arrives (asserted as a law in TextDedupSpec).
    *
    * This is the production dedup-append shape (the LSH analogue of
    * [[graft.operators.DedupAppend]]): the band self-join degenerates to a
    * PROBE — only bands of groups containing a new doc sit on the left
    * side, so join work is proportional to the new batch's collisions, not
    * the corpus's. The stored-index form of this shape is [[LshIndex]]
    * (on the unbounded set identity — the vocab this mask path is bounded
    * to never needs a store); this from-docs form recomputes the right
    * side per call and is the test-scale fast path.
    *
    * Masks are vocab-dependent, so bitmasks are computed over the union
    * vocabulary per call; Jaccard is set-based, so values are unaffected
    * by vocabulary growth across calls. */
  def minhashNearDupsIncremental(existingDocs: DataFrame, newDocs: DataFrame,
                                 threshold: Double): DataFrame = {
    val all = existingDocs.select(col("doc_id"), col("text"))
      .unionByName(newDocs.select(col("doc_id"), col("text")))
    // newIds is batch-bounded (the incremental contract: one ingest batch,
    // never corpus-sized), so its broadcasts below are legitimate hints
    val newIds = newDocs.select(col("doc_id"))
    val members = tokenMasks(all).select(col("doc_id"), col("mask")).localCheckpoint(true)
    val newMembers = members.join(broadcast(newIds), "doc_id")
    val groups = members.groupBy(col("mask")).agg(min(col("doc_id")).as("rep"))
    // probe: only new-containing groups on the left; full corpus on the right
    val repPairs = minhashVerifiedRepPairs(repSignatures(all, groups), threshold,
      probeMasks = Some(newMembers.select(col("mask")).distinct()))
    val intra = members.select(col("doc_id").as("a_id"), col("mask"))
      .join(newMembers.select(col("doc_id").as("b_id"), col("mask")), "mask")
      .filter(col("a_id") =!= col("b_id"))
      .select(least(col("a_id"), col("b_id")).as("a_id"),
              greatest(col("a_id"), col("b_id")).as("b_id"), lit(1.0).as("jacc"))
    // drop old-old doc pairs (reported when their later member arrived):
    // one flagged pass — two semi-join branches would execute the whole
    // expand+verify chain once per branch and need a second distinct
    val pairs = expandCross(members, repPairs).unionByName(intra).distinct()
    val aNew = broadcast(newIds.select(col("doc_id").as("a_id"), lit(1).as("a_new")))
    val bNew = broadcast(newIds.select(col("doc_id").as("b_id"), lit(1).as("b_new")))
    pairs.join(aNew, Seq("a_id"), "left").join(bNew, Seq("b_id"), "left")
      .filter(col("a_new").isNotNull || col("b_new").isNotNull)
      .select(col("a_id"), col("b_id"), col("jacc"))
  }

  /** Incremental dedup-cluster maintenance: fold a new batch into existing
    * (doc_id, cluster_id) labels WITHOUT recomputing old components. New
    * pairs come from the probe-side-restricted incremental miner (join
    * work ∝ the batch's collisions); old clusters enter the component
    * computation as STAR edges (doc → its label), so the contraction input
    * is O(labeled docs + new pairs), not the historical pair set. Folding
    * batches in arrival order reproduces the batch answer exactly —
    * components of star(labels) ∪ newPairs equal components of the full
    * pair union, and labels stay cluster minima (law in TextDedupSpec).
    *
    * This completes the production story next to [[minhashNearDupsIncremental]]:
    * mining was incremental, now the dedup ACTION is too — a 100 TB corpus
    * appends a batch, reprices only the touched clusters, and never
    * re-mines history. */
  def nearDupClustersIncremental(existingLabels: DataFrame, existingDocs: DataFrame,
                                 newDocs: DataFrame, threshold: Double): DataFrame =
    foldLabels(existingLabels,
      minhashNearDupsIncremental(existingDocs, newDocs, threshold))

  /** Star-edge label fold shared by both incremental cluster maintainers:
    * old clusters enter the component computation as STAR edges (doc →
    * its label) so the contraction input is O(labeled docs + new pairs),
    * never the historical pair set. */
  private def foldLabels(existingLabels: DataFrame, newPairs: DataFrame): DataFrame = {
    val starEdges = existingLabels.filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as("a_id"), col("cluster_id").as("b_id"))
    // singleton clusters (label == id) re-enter via self-pair semantics:
    // dedupClusters keeps every node that appears in some edge, and a
    // previously-labeled doc always appears in its star edge unless it was
    // its own cluster AND alone — re-add those as explicit self-identities
    val singletons = existingLabels.filter(col("doc_id") === col("cluster_id"))
      .select(col("doc_id"), col("cluster_id"))
    val propagated = dedupClusters(
      starEdges.unionByName(newPairs.select(col("a_id"), col("b_id"))))
    // a self-labeled cluster head not touched by any edge keeps its label
    val untouchedHeads = singletons
      .join(propagated.select(col("doc_id")), Seq("doc_id"), "left_anti")
    propagated.unionByName(untouchedHeads)
  }

  /** [[minhashNearDupsIncremental]] with NO vocabulary bound — the form a
    * real-vocabulary ingest runs (the mask twin refuses past 63 distinct
    * tokens; this one never refuses). Set identity is the sha256 of the
    * sorted distinct-token list ([[minhashNearDupsUnbounded]]'s algebra),
    * and the band self-join degenerates to the same PROBE: only bands of
    * setid groups containing a new doc sit on the left side, so join work
    * is proportional to the new batch's collisions, not the corpus's.
    * Verification fetches the two reps' token arrays once per distinct
    * candidate pair (`array_intersect` in codegen) — the unbounded
    * family's candidates-then-verify trade.
    *
    * Emits only pairs involving at least one NEW document; folding a
    * corpus through this function in arrival order yields exactly
    * [[minhashNearDupsUnbounded]]'s batch answer — each pair surfaces
    * when its later member arrives (law in TextDedupSpec, streamed form
    * in StreamingIngestSpec; the scored gate runs at vocab > 63 where the
    * mask family refuses). At scale the right side (members, rep token
    * arrays, band keys of the existing corpus) lives in the PERSISTED
    * index of [[LshIndex]] and is probed, not recomputed —
    * signatures are deterministic, so the stored form equals what this
    * from-docs form derives. */
  def minhashNearDupsIncrementalUnbounded(existingDocs: DataFrame, newDocs: DataFrame,
                                          threshold: Double): DataFrame = {
    val all = existingDocs.select(col("doc_id"), col("text"))
      .unionByName(newDocs.select(col("doc_id"), col("text")))
    // newIds is batch-bounded (the incremental contract), so the
    // broadcasts below are legitimate hints — same as the mask twin
    val newIds = newDocs.select(col("doc_id"))
    val (members, groups, verified) =
      unboundedRepPairs(all, threshold, probeIds = Some(newIds))
    val m = members.select(col("doc_id"), col("setid"))
    val g = groups.select(col("rep"), col("setid"))
    val newMembers = m.join(broadcast(newIds), "doc_id")
    val repPairs = verified
      .join(g.select(col("rep").as("ra"), col("setid").as("a_set")), "ra")
      .join(g.select(col("rep").as("rb"), col("setid").as("b_set")), "rb")
      .select(col("a_set"), col("b_set"), col("jacc"))
    val cross = m.select(col("doc_id").as("da"), col("setid").as("a_set"))
      .join(repPairs, "a_set")
      .join(m.select(col("doc_id").as("db"), col("setid").as("b_set")), "b_set")
      .select(least(col("da"), col("db")).as("a_id"),
              greatest(col("da"), col("db")).as("b_id"), col("jacc"))
    val intra = m.select(col("doc_id").as("a_id"), col("setid"))
      .join(newMembers.select(col("doc_id").as("b_id"), col("setid")), "setid")
      .filter(col("a_id") =!= col("b_id"))
      .select(least(col("a_id"), col("b_id")).as("a_id"),
              greatest(col("a_id"), col("b_id")).as("b_id"), lit(1.0).as("jacc"))
    // drop old-old doc pairs (reported when their later member arrived):
    // one flagged pass, same shape as the mask twin
    val pairs = cross.unionByName(intra).distinct()
    val aNew = broadcast(newIds.select(col("doc_id").as("a_id"), lit(1).as("a_new")))
    val bNew = broadcast(newIds.select(col("doc_id").as("b_id"), lit(1).as("b_new")))
    pairs.join(aNew, Seq("a_id"), "left").join(bNew, Seq("b_id"), "left")
      .filter(col("a_new").isNotNull || col("b_new").isNotNull)
      .select(col("a_id"), col("b_id"), col("jacc"))
  }

  /** [[nearDupClustersIncremental]] with NO vocabulary bound: fold a new
    * batch into existing (doc_id, cluster_id) labels via the unbounded
    * probe miner plus the same star-edge propagation — the incremental
    * dedup ACTION at real vocabulary. Folding batches in arrival order
    * reproduces [[nearDupClustersUnbounded]]'s batch answer exactly
    * (law in TextDedupSpec; the scored gate runs at vocab > 63). */
  def nearDupClustersIncrementalUnbounded(existingLabels: DataFrame,
                                          existingDocs: DataFrame,
                                          newDocs: DataFrame,
                                          threshold: Double): DataFrame =
    foldLabels(existingLabels,
      minhashNearDupsIncrementalUnbounded(existingDocs, newDocs, threshold))

  // ---- SimHash + banded LSH -------------------------------------------

  val SimBits = 60
  val SimBands = 4 // 15 bits/band; pigeonhole: distance <= 3 ⇒ ≥1 band equal

  /** 60-bit SimHash over the distinct-token set (unit weights).
    * Same explode+codegen-agg formulation as [[minhashSignatures]] (60
    * per-bit sums in one hash agg) — the nested lambda form was ~50×
    * slower because higher-order functions evaluate interpreted. */
  def simhashSignatures(docs: DataFrame): DataFrame = {
    val th = docs.select(col("doc_id"), explode(expr(
      s"transform(array_distinct(split(text, ' ')), " +
        s"t -> cast(conv(substr(md5(t), 1, 15), 16, 10) as bigint))")).as("h"))
    val aggs = count(lit(1)).as("n") +:
      (0 until SimBits).map(j => sum(expr(s"(h >> $j) & 1")).as(s"s$j"))
    val simhash = expr((0 until SimBits)
      .map(j => s"if(2 * s$j > n, ${1L << j}L, 0L)").mkString(" + "))
    th.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"), simhash.as("simhash"))
  }

  /** Pairs within `maxDist` Hamming distance. Banded LSH with
    * SimBands > maxDist gives EXACT recall (pigeonhole), so this is both
    * the scale path and oracle-checkable. Identical signatures are
    * collapsed before banding (same cluster-blowup reasoning as
    * [[minhashNearDups]]): banding runs over distinct signatures, then
    * signature-level pairs expand back to doc pairs. */
  def simhashNearDups(docs: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist < SimBands, "pigeonhole guarantee needs maxDist < SimBands")
    // consumed by 4 branches (banding, both expansion sides, intra pairs):
    // materialize once — same reasoning as minhashNearDups.members
    val sig = simhashSignatures(docs).localCheckpoint(true) // doc_id, simhash
    val distinctSigs = sig.select(col("simhash")).distinct()
    val bandBits = SimBits / SimBands
    // explode-then-compute (codegen) rather than a transform() lambda
    // (interpreted); hamming-filter INSIDE the join stage so far pairs
    // that merely share one 15-bit band die before the distinct's shuffle
    val bands = distinctSigs
      .select(col("simhash"), explode(expr(s"sequence(0, ${SimBands - 1})")).as("band"))
      .select(col("simhash"), col("band"),
        expr(s"shiftright(simhash, band * $bandBits) & ${(1L << bandBits) - 1}").as("key"))
    val l = bands.select(col("band"), col("key"), col("simhash").as("a_sh"))
    val r = bands.select(col("band"), col("key"), col("simhash").as("b_sh"))
    val sigPairs = l.join(r, Seq("band", "key")).filter(col("a_sh") < col("b_sh"))
      .withColumn("hamming", bit_count(col("a_sh").bitwiseXOR(col("b_sh"))).cast(LongType))
      .filter(col("hamming") <= maxDist)
      .select(col("a_sh"), col("b_sh"), col("hamming")).distinct()
    // sigPairs is O(near-dup signature pairs) — same no-hint discipline as
    // the MinHash family; AQE broadcasts at runtime when actually small
    val cross = sig.select(col("doc_id").as("da"), col("simhash").as("a_sh"))
      .join(sigPairs, "a_sh")
      .join(sig.select(col("doc_id").as("db"), col("simhash").as("b_sh")), "b_sh")
      .select(least(col("da"), col("db")).as("a_id"),
              greatest(col("da"), col("db")).as("b_id"), col("hamming"))
    val intra = sig.select(col("doc_id").as("a_id"), col("simhash"))
      .join(sig.select(col("doc_id").as("b_id"), col("simhash")), "simhash")
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), lit(0L).as("hamming"))
    cross.unionByName(intra)
  }
}
